"""Exact set-similarity self-join via the AllPairs/PPJoin prefix filter.

The exact-recall counterpart of the MinHash-LSH route (Bayardo et al.
2007 "Scaling Up All Pairs Similarity Search"; Xiao et al. PPJoin):
under ANY fixed global ordering of the shingle universe, two sets with
Jaccard >= t MUST share an element inside their "prefixes" — the first
|X| - ceil(t*|X|) + 1 elements of each set in that order (if the
prefixes were disjoint, the overlap could not reach the ceil(t*|X|)
that J >= t forces). So candidate generation only indexes ~(1-t) of
each document's shingles, recall is EXACTLY 1.0 by theorem (not by the
LSH band-probability argument), and the exact verify removes the false
candidates. The global order here is the shingle hash value itself
(``np.unique`` output is already sorted; df-ascending order would prune
harder but needs a df pass — documented trade).

Plan shape:
  1. prefix rows ``(bucket, gram, doc_id, size)`` — one row per PREFIX
     shingle only (~(1-t)|doc| + 1 rows per doc);
  2. one gram-bucket exchange: docs sharing a prefix gram pair up
     in-bucket (size-ratio prefilter |A|/|B| >= t applied before the
     pair is ever emitted), duplicates dropped per bucket;
  3. one key-only pair exchange for the global dedupe;
  4. exact verify via ``dedup.jaccard_verify_pairs`` — distributed
     (broadcast under the explicit pair bound, doc-keyed attach
     exchanges above it; same shape as verified_dedup_pairs).

Skew note: a prefix gram shared by m docs generates O(m^2) candidate
pairs — on natural text the prefix grams are each doc's RAREST-hashing
shingles, so m stays small; a pathological shared-boilerplate corpus
should run exact/near dedup first (same caveat as the fuzzy join).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import partitions_for
from agentic_doc_ray.functions._exchange import int_key_sentinels
from agentic_doc_ray.functions.dedup import (
    char_shingles,
    jaccard_verify_pairs,
)

_N_BUCKETS = 64

_PRE_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("gram", pa.int64()),
        ("doc_id", pa.string()),
        ("size", pa.int64()),
        ("side", pa.string()),
    ]
)
_CAND_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("doc_a", pa.string()),
        ("doc_b", pa.string()),
        ("side", pa.string()),
    ]
)


def exact_jaccard_join(
    docs: "ray.data.Dataset", threshold: float = 0.8
) -> "ray.data.Dataset":
    """All pairs with char-shingle Jaccard >= ``threshold``, exact in
    both directions (recall by the prefix-filter theorem, precision by
    the verify pass). Output (doc_a < doc_b, jaccard)."""
    n_rows = docs.count()
    np_ = partitions_for(n_rows)

    def prefix_rows(batch: pa.Table) -> pa.Table:
        ids = [str(x) for x in batch.column("doc_id").to_pylist()]
        texts = batch.column("text").to_pylist()
        out_g: list[np.ndarray] = []
        out_id: list[str] = []
        out_sz: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            grams = char_shingles(t)  # unique, ascending = the global order
            sz = len(grams)
            plen = sz - math.ceil(threshold * sz) + 1
            pre = grams[:plen]
            out_g.append(pre)
            out_id.extend([i] * len(pre))
            out_sz.append(np.full(len(pre), sz, np.int64))
        if not out_g:
            return _PRE_SCHEMA.empty_table()
        g = np.concatenate(out_g)
        return pa.Table.from_arrays(
            [
                pa.array((g % np.uint64(_N_BUCKETS)).astype(np.int32)),
                pa.array(g.view(np.int64), pa.int64()),
                pa.array(out_id, pa.string()),
                pa.array(np.concatenate(out_sz), pa.int64()),
                pa.array(["p"] * len(g), pa.string()),
            ],
            schema=_PRE_SCHEMA,
        )

    def candidates(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        if g.num_rows == 0:
            return _CAND_SCHEMA.empty_table()
        df = g.select(["gram", "doc_id", "size"]).to_pandas()
        df = df[df.duplicated("gram", keep=False)]
        if not len(df):
            return _CAND_SCHEMA.empty_table()
        df = df.sort_values(["gram", "doc_id"], kind="stable")
        gr = df["gram"].to_numpy()
        ids = df["doc_id"].to_numpy(dtype=object)
        szs = df["size"].to_numpy()
        starts = np.flatnonzero(np.r_[True, gr[1:] != gr[:-1]])
        lens = np.diff(np.r_[starts, len(gr)])
        ia: list[np.ndarray] = []
        ib: list[np.ndarray] = []
        two = starts[lens == 2]
        if len(two):
            # size-ratio prefilter: J >= t is impossible unless
            # min(|A|,|B|) >= t * max(|A|,|B|)
            sa, sb = szs[two], szs[two + 1]
            ok = np.minimum(sa, sb) >= threshold * np.maximum(sa, sb)
            ia.append(ids[two][ok])
            ib.append(ids[two + 1][ok])
        for s0, m in zip(starts[lens > 2], lens[lens > 2]):
            iu, ju = np.triu_indices(m, k=1)
            sa, sb = szs[s0 + iu], szs[s0 + ju]
            ok = np.minimum(sa, sb) >= threshold * np.maximum(sa, sb)
            ia.append(ids[s0 + iu][ok])
            ib.append(ids[s0 + ju][ok])
        if not ia:
            return _CAND_SCHEMA.empty_table()
        a = np.concatenate(ia)
        b = np.concatenate(ib)
        same = a == b  # one doc's two coincident prefix grams cannot pair
        a, b = a[~same], b[~same]
        import pandas as pd

        key = pd.MultiIndex.from_arrays([a, b])
        keep = ~key.duplicated()
        a, b = a[keep], b[keep]
        import pandas as _pd

        pb = (_pd.util.hash_array(a + "|" + b) % _N_BUCKETS).astype(np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(pb),
                pa.array(a, pa.string()),
                pa.array(b, pa.string()),
                pa.array(["c"] * len(a), pa.string()),
            ],
            schema=_CAND_SCHEMA,
        )

    def dedupe(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        if g.num_rows == 0:
            return pa.schema(
                [("doc_a", pa.string()), ("doc_b", pa.string())]
            ).empty_table()
        return (
            g.select(["doc_a", "doc_b"]).group_by(["doc_a", "doc_b"]).aggregate([])
        )

    cands = (
        docs.map_batches(prefix_rows, batch_format="pyarrow")
        .union(int_key_sentinels(_PRE_SCHEMA, "bucket", fill={"side": "s"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(candidates, batch_format="pyarrow")
        .union(int_key_sentinels(_CAND_SCHEMA, "bucket", fill={"side": "s"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(dedupe, batch_format="pyarrow")
    )

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("jaccard"), threshold))

    # distributed verify (broadcast under the pair bound, attach exchanges
    # above it) — candidates never reach the driver
    return jaccard_verify_pairs(docs, cands, np_).map_batches(
        keep, batch_format="pyarrow"
    )
