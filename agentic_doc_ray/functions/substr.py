"""Exact repeated-substring span detection (substring-dedup style).

Finds every maximal span covered by length-L substrings that occur at
two or more (doc, position) sites across the corpus — the marking stage
of exact substring deduplication for training data (cf. Lee et al.,
"Deduplicating Training Data Makes Language Models Better", which uses a
suffix array; a suffix array is a single-machine structure, so the
distributed formulation here is three bounded passes instead):

  A. rolling 61-bit Mersenne hashes of every L-gram (vectorized over the
     Arrow string buffer — zero copy, no per-row Python), per-batch
     ``np.unique`` partial counts, coarse-bucket groupby: hashes with
     global count >= 2 become the CANDIDATE set (small: bounded by the
     amount of actual duplication, not corpus size);
  B. a second streaming pass re-hashes, keeps only candidate positions,
     and ships the REAL grams for exactly those positions into a tiny
     groupby(gram) that discards hash collisions — approximation bounds
     the work, never the answer (same contract as heavy hitters);
  C. verified (doc, pos) marks merge into maximal spans per doc with one
     64-ary bucketed exchange and a vectorized island pass.

Positions are 1-based character offsets (== byte offsets: the engine
requires ASCII text here and raises otherwise), so the DuckDB
``substr``-based oracle compares exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from agentic_doc_ray.context import shuffle_partitions
from agentic_doc_ray.functions.text import (
    _FP_BASE,
    _FP_MOD,
    _mod61,
    _mulmod61,
    _prefix_halves,
    _segment_modsum,
)

_TWO32 = np.uint64((1 << 32) % _FP_MOD)
_N_BUCKETS = 32

_pow_cache: dict[int, np.ndarray] = {}


def _powers(base: int, n: int) -> np.ndarray:
    """base^0..base^(n-1) mod 2^61-1, grown-on-demand per-process cache."""
    cur = _pow_cache.get(base)
    if cur is None or len(cur) < n:
        size = max(n, 4096, 0 if cur is None else 2 * len(cur))
        p, acc = [], 1
        for _ in range(size):
            p.append(acc)
            acc = (acc * base) % _FP_MOD
        cur = np.array(p, dtype=np.uint64)
        _pow_cache[base] = cur
    return cur


def _gram_hashes(texts: pa.Array, L: int):
    """Canonical (content-only) hash of every L-gram in a batch of docs.

    Returns (hashes, doc_idx, local_pos_0based, buffer, doc_offsets); all
    arrays are windows that lie entirely inside one document. Works on the
    Arrow string buffer directly: bytes are chars (ASCII enforced).
    """
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offsets[0] : offsets[-1]
    ]
    offsets = offsets - offsets[0]
    if buf.size and buf.max() > 127:
        raise ValueError("repeated_substring_spans requires ASCII text")
    n = buf.size
    if n < L:
        e = np.array([], dtype=np.int64)
        return e.astype(np.uint64), e, e, buf, offsets
    bpow = _powers(_FP_BASE, n + 1)
    binv = pow(_FP_BASE, _FP_MOD - 2, _FP_MOD)
    ipow = _powers(binv, n + 1)
    # U[j] = c[j] * B^(n-1-j); split prefix sums carry exact uint64 math
    u = _mulmod61(buf.astype(np.uint64), bpow[n - 1 :: -1].copy())
    cs_hi, cs_lo = _prefix_halves(u)
    i = np.arange(0, n - L + 1, dtype=np.int64)
    w_raw = _segment_modsum(cs_hi, cs_lo, i, i + L)  # hash * B^(n-i-L)
    h = _mulmod61(w_raw, ipow[n - i - L])  # canonical, batch-independent
    # windows must not cross document boundaries
    doc_idx = np.searchsorted(offsets[1:], i, side="right")
    valid = (i + L) <= offsets[doc_idx + 1]
    i, h, doc_idx = i[valid], h[valid], doc_idx[valid]
    return h, doc_idx, i - offsets[doc_idx], buf, offsets


def repeated_substring_spans(
    docs: "ray.data.Dataset", L: int = 50
) -> "ray.data.Dataset":
    """(doc_id, span_start, span_end): maximal 1-based inclusive spans of
    text covered by L-grams occurring >= 2 times corpus-wide. Exact."""
    from agentic_doc_ray.functions._exchange import (
        int_key_sentinels,
        str_key_sentinels,
    )

    # --- pass A: candidate hashes (count >= 2 globally) -------------------
    def hash_counts(batch: pa.Table) -> pa.Table:
        h, _, _, _, _ = _gram_hashes(batch.column("text"), L)
        uniq, cnt = np.unique(h, return_counts=True)
        bucket = (uniq & np.uint64(_N_BUCKETS - 1)).astype(np.int32)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(bucket),
                "h": pa.array(uniq.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def dups_in_bucket(group: pa.Table) -> pa.Table:
        g = group.select(["h", "n"]).group_by("h").aggregate([("n", "sum")])
        return g.filter(pc.greater_equal(g.column("n_sum"), 2)).select(["h"])

    # standard covering sentinels (_exchange.py): a corpus where every doc
    # is shorter than L emits zero hash rows, and a single bucket=-1 row
    # would keep only ONE partition non-empty — any other empty partition
    # still crashes. The n=0 fill never survives the count>=2 filter.
    _cnt_schema = pa.schema(
        [("bucket", pa.int32()), ("h", pa.int64()), ("n", pa.int64())]
    )
    dup_rows = (
        docs.map_batches(hash_counts, batch_format="pyarrow")
        .union(int_key_sentinels(_cnt_schema, "bucket", fill={"h": 0, "n": 0}))
        .groupby("bucket", num_partitions=shuffle_partitions())
        .map_groups(dups_in_bucket, batch_format="pyarrow")
        .take_all()
    )
    dup_sorted = np.sort(np.array([r["h"] for r in dup_rows], dtype=np.int64))
    if len(dup_sorted) == 0:
        # empty-input short-circuit: Ray's hash shuffle crashes on a
        # zero-row exchange (same guard as the extraction pipeline)
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "span_start": pa.array([], pa.int64()),
                    "span_end": pa.array([], pa.int64()),
                }
            )
        )
    dup_ref = ray.put(dup_sorted)

    # --- pass B: ship real grams for candidate positions only -------------
    gram_schema = pa.schema(
        [("gram", pa.string()), ("doc_id", pa.int64()), ("pos", pa.int64())]
    )

    def candidate_grams(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        h, doc_idx, local_pos, buf, offsets = _gram_hashes(batch.column("text"), L)
        mark = np.isin(h.astype(np.int64), dups, assume_unique=False)
        doc_idx, local_pos = doc_idx[mark], local_pos[mark]
        starts = offsets[doc_idx] + local_pos
        grams = [buf[s : s + L].tobytes().decode("ascii") for s in starts]
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return pa.Table.from_arrays(
            [
                pa.array(grams, pa.string()),
                pa.array(ids[doc_idx], pa.int64()),
                pa.array(local_pos + 1, pa.int64()),  # 1-based, matches substr()
            ],
            schema=gram_schema,
        )

    def verify_gram(group: pa.Table) -> pa.Table:
        # singleton groups are hash collisions — and each exchange sentinel
        # (unique NUL-prefixed gram) forms one, so both drop here
        if group.num_rows < 2:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        return group.select(["doc_id", "pos"])

    # candidate_grams emits EMPTY blocks for batches with no candidate
    # positions; sentinels keep every gram partition non-empty (the
    # empty-first-block schema-broadcast race, _exchange.py)
    marks = (
        docs.map_batches(candidate_grams, batch_format="pyarrow")
        .union(str_key_sentinels(gram_schema, "gram", fill={"doc_id": -1, "pos": -1}))
        .groupby("gram", num_partitions=shuffle_partitions())
        .map_groups(verify_gram, batch_format="pyarrow")
    )

    # --- pass C: merge marks into maximal spans per doc -------------------
    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(batch.column("doc_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return batch.append_column("bucket", b)

    def spans_bucket(group):
        import pandas as pd

        g = group[group["doc_id"] >= 0]  # drop exchange sentinels
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "span_start": pd.Series([], dtype="int64"),
                    "span_end": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["doc_id", "pos"]).reset_index(drop=True)
        brk = (g["doc_id"].ne(g["doc_id"].shift())) | (
            g["pos"] > g["pos"].shift() + (L - 1)
        )
        island = brk.cumsum()
        out = g.groupby(island).agg(
            doc_id=("doc_id", "first"),
            span_start=("pos", "min"),
            span_end=("pos", "max"),
        )
        out["span_end"] = out["span_end"] + (L - 1)
        return out.reset_index(drop=True)[["doc_id", "span_start", "span_end"]]

    # marks is map_groups output (empty partition blocks are routine) —
    # same empty-first-block guard for the span-merge exchange
    marks_schema = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()), ("bucket", pa.int32())]
    )
    return (
        marks.map_batches(add_bucket, batch_format="pyarrow")
        .union(int_key_sentinels(marks_schema, "bucket", fill={"doc_id": -1, "pos": 1}))
        .groupby("bucket", num_partitions=shuffle_partitions())
        .map_groups(spans_bucket, batch_format="pandas")
    )


def substring_dup_stats(
    docs: "ray.data.Dataset", L: int = 50
) -> "ray.data.Dataset":
    """Per-document duplicated-character totals — the dedup FILTER stage
    that consumes ``repeated_substring_spans``: (doc_id, dup_chars,
    n_chars, dup_per_mille) for every document (0 for clean ones).

    Spans are disjoint per doc by construction, so dup_chars is a plain
    sum of span lengths. The span table is small (bounded by actual
    duplication), so it broadcasts; documents stream through untouched.
    """
    spans = repeated_substring_spans(docs, L).take_all()
    dup_chars: dict[int, int] = {}
    for r in spans:
        dup_chars[r["doc_id"]] = dup_chars.get(r["doc_id"], 0) + (
            r["span_end"] - r["span_start"] + 1
        )
    keys = np.array(sorted(dup_chars), dtype=np.int64)
    vals = np.array([dup_chars[k] for k in keys], dtype=np.int64)
    dup_ref = ray.put((keys, vals))

    def stats(batch: pa.Table) -> pa.Table:
        keys_, vals_ = ray.get(dup_ref)
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n_chars = pc.utf8_length(batch.column("text")).cast(pa.int64())
        # vectorized probe of the (small) duplicated-doc table
        if len(keys_):
            idx = np.minimum(np.searchsorted(keys_, ids), len(keys_) - 1)
            dups = np.where(keys_[idx] == ids, vals_[idx], 0)
        else:
            dups = np.zeros(len(ids), dtype=np.int64)
        nc = n_chars.combine_chunks().to_numpy(zero_copy_only=False)
        per_mille = dups * 1000 // np.maximum(nc, 1)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids),
                "dup_chars": pa.array(dups),
                "n_chars": n_chars,
                "dup_per_mille": pa.array(per_mille),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")
