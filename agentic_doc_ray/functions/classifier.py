"""fastText-style linear text classifier — the model-scoring stage of a
training-data pipeline (quality/language filters in CCNet, RefinedWeb,
FineWeb are exactly this shape: hashed bag-of-n-gram features through a
linear model, scored over every document).

Two streaming passes, exact integer arithmetic end to end:

1. **Train** — per-batch hashed unigram+bigram count histograms per
   class (vectorized: RE2 word explode, crc32 over the batch's DISTINCT
   tokens via dictionary-encode, ``np.bincount`` per class), one tiny
   groupby whose exchange moves at most ``2*(_DIM+1)`` rows per batch
   regardless of corpus size. The driver holds two ``_DIM``-wide int64
   sum vectors (kilobytes) — never rows.
2. **Score** — the integer weight vector broadcasts once via ``ray.put``;
   each batch scores with one exact int64 scatter-add per document.

Classifier: class-centroid difference. With per-class feature-count sums
``S_c`` and doc counts ``N_c``, the mean-difference score of a doc with
hashed count vector ``x`` is ``dot(S1/N1 - S0/N0, x)``; we cross-multiply
by ``N0*N1 > 0`` to stay in integers: ``score = dot(N0*S1 - N1*S0, x)``.
Sign-equivalent, exact, and batching-independent (integer sums commute),
so the single-process replica is bit-equal. At real scale the trained
weights would be normalized to float once (the int64 cross-product needs
``N_c * corpus_tokens < 2^63``); the integer form is what makes the
correctness gate exact.

Reference analogue: the quality/language scoring stages the reference's
extraction feeds into downstream; no counterpart file — public fastText
(Joulin et al. 2016) hashing-trick design.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_DIM = 4096  # hashed feature space (shared by unigrams and bigrams)

SCORE_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("score", pa.int64()), ("pred", pa.string())]
)


def _hash_strings(arr: pa.Array) -> np.ndarray:
    """crc32 % _DIM per string, computed once per DISTINCT value."""
    d = arr.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    codes = d.indices.to_numpy(zero_copy_only=False)
    hu = np.fromiter(
        (zlib.crc32(u.encode()) % _DIM for u in uniq),
        dtype=np.int64,
        count=len(uniq),
    )
    return hu[codes]


def _occurrences(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_row, feature) pairs for every unigram and bigram occurrence.

    Returns (occ_doc_row, occ_feature, nonempty_row_index) where
    ``occ_doc_row`` indexes rows of ``batch``.
    """
    from agentic_doc_ray.functions.text import _regex_trim

    trimmed = _regex_trim(batch.column("text"))
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    nonempty = pc.not_equal(trimmed, "")
    toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(nonempty.to_numpy(zero_copy_only=False))
    n = len(flat)
    if not n:
        e = np.zeros(0, np.int64)
        return e, e, idx

    j_uni = _hash_strings(flat)
    occ_doc = idx[parents]
    occ_feat = j_uni
    if n >= 2:
        same = parents[:-1] == parents[1:]
        if same.any():
            joined = pc.binary_join_element_wise(
                flat.slice(0, n - 1), flat.slice(1), " "
            ).filter(pa.array(same))
            j_bi = _hash_strings(joined)
            occ_doc = np.concatenate([occ_doc, idx[parents[:-1][same]]])
            occ_feat = np.concatenate([occ_feat, j_bi])
    return occ_doc, occ_feat, idx


def _train_partial(batch: pa.Table, label_col: str, positive: str) -> pa.Table:
    """Per-batch (label, j, n) partial counts; j = -1 rows carry the
    per-class DOC counts (every doc has a label, empty or not)."""
    occ_doc, occ_feat, _ = _occurrences(batch)
    y = pc.equal(batch.column(label_col), positive).to_numpy(
        zero_copy_only=False
    )
    labels, feats, counts = [], [], []
    for c, mask_val in ((0, False), (1, True)):
        sel = y[occ_doc] == mask_val if len(occ_doc) else np.zeros(0, bool)
        hist = np.bincount(occ_feat[sel], minlength=_DIM)
        nz = np.flatnonzero(hist)
        labels.append(np.full(len(nz) + 1, c, np.int8))
        feats.append(np.concatenate([nz, [-1]]).astype(np.int64))
        counts.append(
            np.concatenate([hist[nz], [int((y == mask_val).sum())]]).astype(
                np.int64
            )
        )
    return pa.Table.from_arrays(
        [
            pa.array(np.concatenate(labels), pa.int8()),
            pa.array(np.concatenate(feats), pa.int64()),
            pa.array(np.concatenate(counts), pa.int64()),
        ],
        names=["label", "j", "n"],
    )


def _weights(sums: pa.Table) -> np.ndarray:
    """(label, j, n) totals -> the int64 cross-multiplied weight vector."""
    lab = sums.column("label").to_numpy(zero_copy_only=False)
    j = sums.column("j").to_numpy(zero_copy_only=False)
    n = sums.column("n").to_numpy(zero_copy_only=False)
    S = np.zeros((2, _DIM), np.int64)
    N = np.zeros(2, np.int64)
    doc_rows = j == -1
    for c in (0, 1):
        sel = (lab == c) & ~doc_rows
        S[c, j[sel]] = n[sel]
        N[c] = n[doc_rows & (lab == c)].sum()
    return N[0] * S[1] - N[1] * S[0]


def _score_batch(
    batch: pa.Table, w: np.ndarray, positive: str, negative: str
) -> pa.Table:
    occ_doc, occ_feat, _ = _occurrences(batch)
    score = np.zeros(batch.num_rows, np.int64)
    if len(occ_doc):
        np.add.at(score, occ_doc, w[occ_feat])  # exact int64 scatter-add
    pred = np.where(score > 0, positive, negative)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id").cast(pa.int64()),
            pa.array(score, pa.int64()),
            pa.array(pred, pa.string()),
        ],
        schema=SCORE_SCHEMA,
    )


def train_classifier(
    docs: "ray.data.Dataset", label_col: str = "lang", positive: str = "en"
) -> np.ndarray:
    """Distributed centroid training -> the int64 weight vector."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    np_ = shuffle_partitions(4)
    rows = (
        docs.map_batches(
            lambda b: _train_partial(b, label_col, positive),
            batch_format="pyarrow",
        )
        .groupby(["label", "j"], num_partitions=np_)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # <= 2*(_DIM+1) rows — fixed by _DIM, never by corpus size
    sums = pa.Table.from_pylist(
        rows, schema=pa.schema([("label", pa.int8()), ("j", pa.int64()), ("n", pa.int64())])
    )
    return _weights(sums)


def quality_classifier(
    docs: "ray.data.Dataset",
    label_col: str = "lang",
    positive: str = "en",
    negative: str = "other",
) -> "ray.data.Dataset":
    """Train on the corpus, then score every document (the standard
    self-supervised quality-filter loop). Returns (doc_id, score, pred);
    ``score > 0`` means nearer the positive-class centroid."""
    import ray as _ray

    w = train_classifier(docs, label_col, positive)
    wref = _ray.put(w)

    def score(batch: pa.Table, *, _w=wref) -> pa.Table:
        cache = score.__dict__
        if "w" not in cache:
            cache["w"] = _ray.get(_w)
        return _score_batch(batch, cache["w"], positive, negative)

    return docs.map_batches(score, batch_format="pyarrow")


def classifier_gated_sample(
    docs: "ray.data.Dataset",
    rates: dict[str, int] | None = None,
    label_col: str = "lang",
    positive: str = "en",
    negative: str = "other",
) -> "ray.data.Dataset":
    """Score-then-sample — the standard quality-filter loop (CCNet /
    FineWeb shape): train the centroid classifier, score every document,
    then keep ~rates[pred]/1000 of each PREDICTED class by the same
    deterministic md5 per-mille rule as ``sampling.mixture_sample``
    (upsample predicted-quality docs, heavily downsample the rest).

    Shape: training's one fixed-size count exchange, then a single
    streaming scan — scoring, hashing and the rate filter fuse into one
    map_batches; no extra pass over the corpus and no shuffle. No RNG
    state: rerun-stable on any partitioning, SQL-reproducible
    row-for-row."""
    import hashlib

    import ray as _ray

    rates = rates or {positive: 900, negative: 250}
    w = train_classifier(docs, label_col, positive)
    wref = _ray.put(w)

    def score_and_gate(batch: pa.Table, *, _w=wref) -> pa.Table:
        cache = score_and_gate.__dict__
        if "w" not in cache:
            cache["w"] = _ray.get(_w)
        scored = _score_batch(batch, cache["w"], positive, negative)
        from agentic_doc_ray.functions._digest import md5_per_mille

        pm = md5_per_mille(scored.column("doc_id"))
        thr = np.where(
            pc.equal(scored.column("pred"), positive).to_numpy(
                zero_copy_only=False
            ),
            rates.get(positive, 0),
            rates.get(negative, 0),
        )
        return scored.filter(pa.array(pm < thr))

    return docs.map_batches(score_and_gate, batch_format="pyarrow")


def quality_classifier_oracle(
    docs_tbl: pa.Table,
    label_col: str = "lang",
    positive: str = "en",
    negative: str = "other",
) -> pa.Table:
    """Single-process replica: the same partial/weight/score functions on
    the whole corpus as one batch — bit-equal because every training sum
    is an exact integer and scoring is per-doc."""
    return _score_batch(
        docs_tbl,
        _weights(_train_partial(docs_tbl, label_col, positive)),
        positive,
        negative,
    )
