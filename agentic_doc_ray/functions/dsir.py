"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023).

Per-document importance weight for selecting pretraining data that looks
like a TARGET domain: under hashed bag-of-n-gram unigram models of the
target subset and the raw corpus, each document's log importance ratio is

    log w(x) = sum_over_feature_occurrences ( log p_target[f] - log p_raw[f] )

with add-one smoothing over the hashed feature space. Documents with a
high ratio resemble the target; a downstream sampler (e.g.
``sampling.mixture_sample``-style hash gating or Gumbel top-k) resamples
by these weights — this operator produces the weights.

Shape: the SAME two-pass plumbing as ``classifier.quality_classifier``
(which this module reuses): per-batch hashed-count histograms per side
move through one fixed-size exchange (<= 2·(dim+1) rows per batch,
bounded by the feature space, never the corpus), the integer micro-nat
log-ratio vector broadcasts once, and scoring is a vectorized int64
scatter-add per batch. Per-feature log ratios round to integer
MICRO-NATS before per-doc summation, so results are batching-independent
and the single-process replica is bit-equal (same rule as the bigram
LM's micro-bits).

Reference analogue: none (public method; Xie et al., "Data Selection
for Language Models via Importance Resampling", NeurIPS 2023).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.functions.classifier import (
    _DIM,
    _occurrences,
    _train_partial,
)

_MICRO = 1_000_000  # nats -> integer micro-nats, rounded per FEATURE

DSIR_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_feats", pa.int64()),
        ("log_ratio_micro", pa.int64()),
    ]
)


def _log_ratio_vector(sums: pa.Table) -> np.ndarray:
    """(label, j, n) totals -> int64 micro-nat log-ratio vector.

    label 1 = target side, label 0 = raw side (the raw side counts the
    WHOLE corpus, so the target is never out-of-distribution of it).
    Add-one smoothing keeps every feature finite."""
    lab = sums.column("label").to_numpy(zero_copy_only=False)
    j = sums.column("j").to_numpy(zero_copy_only=False)
    n = sums.column("n").to_numpy(zero_copy_only=False)
    C = np.zeros((2, _DIM), np.int64)
    tot = np.zeros(2, np.int64)
    feat_rows = j >= 0
    for c in (0, 1):
        sel = (lab == c) & feat_rows
        C[c, j[sel]] = n[sel]
        tot[c] = C[c].sum()
    logp = lambda c: np.log(  # noqa: E731
        (C[c] + 1).astype(np.float64)
    ) - np.log(float(tot[c] + _DIM))
    return np.round((logp(1) - logp(0)) * _MICRO).astype(np.int64)


def _dsir_partial(batch: pa.Table, label_col: str, target: str) -> pa.Table:
    """Target-side counts ride label 1; the raw side (label 0) counts
    EVERY document. One tokenization pass: the classifier partial already
    holds both per-class histograms, and raw = class0 + class1 summed per
    feature — re-running ``_occurrences`` would double the dominant cost
    of the training pass for identical numbers."""
    t_part = _train_partial(batch, label_col, target)
    t_only = t_part.filter(
        pc.equal(t_part.column("label"), pa.scalar(1, pa.int8()))
    )
    raw = (
        t_part.select(["j", "n"])
        .group_by("j")
        .aggregate([("n", "sum")])
        .rename_columns(["j", "n"])
    )  # sums the two class histograms; j=-1 rows sum to batch.num_rows
    raw = raw.add_column(
        0, "label", pa.array(np.zeros(raw.num_rows, np.int8))
    )
    return pa.concat_tables([t_only, raw])


def _dsir_score_batch(batch: pa.Table, w: np.ndarray) -> pa.Table:
    occ_doc, occ_feat, _ = _occurrences(batch)
    score = np.zeros(batch.num_rows, np.int64)
    nf = np.zeros(batch.num_rows, np.int64)
    if len(occ_doc):
        np.add.at(score, occ_doc, w[occ_feat])
        np.add.at(nf, occ_doc, 1)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id").cast(pa.int64()),
            pa.array(nf),
            pa.array(score),
        ],
        schema=DSIR_SCHEMA,
    )


def _dsir_sums(docs_or_tbl, label_col: str, target: str, distributed: bool):
    if not distributed:
        return _dsir_partial(docs_or_tbl, label_col, target)
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    np_ = shuffle_partitions(4)
    rows = (
        docs_or_tbl.map_batches(
            lambda b: _dsir_partial(b, label_col, target),
            batch_format="pyarrow",
        )
        .groupby(["label", "j"], num_partitions=np_)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # <= 2*(_DIM+1) rows, fixed by the feature space
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("label", pa.int8()), ("j", pa.int64()), ("n", pa.int64())]
        ),
    )


def dsir_weights(
    docs: "ray.data.Dataset", label_col: str = "lang", target: str = "en"
) -> "ray.data.Dataset":
    """(doc_id, n_feats, log_ratio_micro) for every document; the target
    distribution is the ``label_col == target`` subset, the raw
    distribution is the whole corpus."""
    import ray as _ray

    w = _log_ratio_vector(_dsir_sums(docs, label_col, target, True))
    wref = _ray.put(w)

    def score(batch: pa.Table, *, _w=wref) -> pa.Table:
        cache = score.__dict__
        if "w" not in cache:
            cache["w"] = _ray.get(_w)
        return _dsir_score_batch(batch, cache["w"])

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_weights_oracle(
    docs_tbl: pa.Table, label_col: str = "lang", target: str = "en"
) -> pa.Table:
    """Single-process replica: the same partial/ratio/score functions on
    the whole corpus as one batch — bit-equal because count sums are
    exact integers and per-feature log ratios round BEFORE summation."""
    sums = _dsir_sums(docs_tbl, label_col, target, False)
    sums = (
        sums.group_by(["label", "j"]).aggregate([("n", "sum")])
    ).rename_columns(["label", "j", "n"])
    return _dsir_score_batch(docs_tbl, _log_ratio_vector(sums))


SELECT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("gumbel_key_micro", pa.int64())]
)


def _gumbel_key_batch(scored: pa.Table, seed: int) -> pa.Table:
    """Importance weights -> Gumbel top-k sampling keys (Xie et al. §2.2:
    top-k of weight + Gumbel noise samples WITHOUT replacement
    proportionally to exp(weight)).

    Deterministic: u derives from md5(doc_id, seed) (52-bit mantissa in
    (0,1)), key = log_ratio_micro + round(-1e6·ln(-ln u)). The float ln
    is computed by the same numpy code in the replica, so bit-equality
    holds; u is never 0 or 1 (mantissa+1 over 2^52+2)."""
    import hashlib

    ids = scored.column("doc_id").to_pylist()
    m = np.array(
        [
            int.from_bytes(
                hashlib.md5(f"{d}:{seed}".encode()).digest()[:8], "big"
            )
            >> 12
            for d in ids
        ],
        dtype=np.int64,
    )
    u = (m.astype(np.float64) + 1.0) / float((1 << 52) + 2)
    g = np.round(-np.log(-np.log(u)) * _MICRO).astype(np.int64)
    key = scored.column("log_ratio_micro").to_numpy(zero_copy_only=False) + g
    return pa.Table.from_arrays(
        [scored.column("doc_id"), pa.array(key)], schema=SELECT_SCHEMA
    )


def _topk(t: pa.Table, k: int) -> pa.Table:
    idx = pc.sort_indices(
        t, sort_keys=[("gumbel_key_micro", "descending"), ("doc_id", "ascending")]
    )
    return t.take(idx.slice(0, k))


def dsir_select(
    docs: "ray.data.Dataset",
    k: int = 100,
    label_col: str = "lang",
    target: str = "en",
    seed: int = 17,
) -> "ray.data.Dataset":
    """DSIR selection: the k documents sampled without replacement
    proportionally to exp(importance weight), via deterministic Gumbel
    top-k. One count exchange (the weights), one streaming scoring pass
    with per-batch local top-k partials (k rows per block move, never
    the corpus), one tiny final merge."""
    scored = dsir_weights(docs, label_col, target)

    def local_topk(batch: pa.Table) -> pa.Table:
        return _topk(_gumbel_key_batch(batch, seed), k)

    return (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(lambda t: _topk(t, k), batch_format="pyarrow")
    )


def dsir_select_oracle(
    docs_tbl: pa.Table,
    k: int = 100,
    label_col: str = "lang",
    target: str = "en",
    seed: int = 17,
) -> pa.Table:
    """Single-process replica: same weights, same Gumbel keys, one
    global top-k — bit-equal (local-top-k partials are a lossless
    mergeable summary for a global top-k)."""
    return _topk(
        _gumbel_key_batch(dsir_weights_oracle(docs_tbl, label_col, target), seed),
        k,
    )
