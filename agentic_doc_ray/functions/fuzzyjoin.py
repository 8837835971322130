"""Fuzzy string self-join (edit distance <= 1) — record-linkage style.

FastSS / deletion-neighborhood candidate generation (Bocek et al. 2007):
every string emits its own hash plus one hash per single-character
deletion variant; two strings within edit distance 1 ALWAYS share a
variant (ed=0 -> the string itself; substitution at i -> both i-deletion
variants match; insertion/deletion -> the shorter string equals one
deletion variant of the longer), so recall is exactly 1.0 by
construction and hash collisions only ever ADD candidates — the exact
verify pass removes them. The classic use: near-identical entity names /
URLs / titles across a crawl (one-keystroke typos, OCR single-char
errors).

Plan shape (2 exchanges, both slim):
  1. variant rows ``(bucket, vhash int64, id, text)`` — ~(len+1) rows per
     string, keyed by the VARIANT HASH so each candidate group lands in
     one task; variant text itself never ships (the verify uses the
     original strings, so a collision cannot create a false pair);
  2. per-group all-pairs -> VERIFIED in place (vectorized fixed-width
     char gather, see ``_verify_ed1``) -> surviving ``(bucket, id_a,
     id_b, dist)`` key rows meet in one pair-keyed exchange that drops
     the duplicates a pair picks up by sharing several variants.

Skew note (documented, not silent): a group of m IDENTICAL strings is a
true m-clique — every pair is a correct answer, so the quadratic output
is inherent to the query, not an artifact; for corpora with heavy exact
duplication run exact dedup first and fuzzy-join the survivors. Long
strings multiply variant-row count by their length — for documents use
the substring/minhash families instead; this operator is for NAME-sized
keys (entity linkage).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import partitions_for
from agentic_doc_ray.functions._exchange import int_key_sentinels

_N_BUCKETS = 64

_VAR_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("vhash", pa.int64()),
        ("id", pa.int64()),
        ("text", pa.string()),
        ("side", pa.string()),
    ]
)
_PAIR_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("id_a", pa.int64()),
        ("id_b", pa.int64()),
        ("dist", pa.int64()),
        ("side", pa.string()),
    ]
)
_OUT_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("dist", pa.int64())]
)


def _hash64(strings: np.ndarray) -> np.ndarray:
    """Deterministic string->int64 (pandas siphash, fixed default key —
    stable across processes; same primitive as graph._bucket_of)."""
    return pd.util.hash_array(strings).astype(np.int64)


def _variant_rows(ids: np.ndarray, texts: np.ndarray) -> pa.Table:
    """(len+1) deletion-neighborhood variant hashes per string."""
    out_ids: list[np.ndarray] = []
    out_hash: list[np.ndarray] = []
    out_text: list[np.ndarray] = []
    # the string itself
    out_ids.append(ids)
    out_hash.append(_hash64(texts))
    out_text.append(texts)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    max_len = int(lens.max()) if len(lens) else 0
    for i in range(max_len):
        mask = lens > i
        if not mask.any():
            break
        sub = texts[mask]
        variants = np.array([t[:i] + t[i + 1 :] for t in sub], dtype=object)
        out_ids.append(ids[mask])
        out_hash.append(_hash64(variants))
        out_text.append(sub)
    vid = np.concatenate(out_ids)
    vh = np.concatenate(out_hash)
    vt = np.concatenate(out_text)
    n = len(vid)
    return pa.Table.from_arrays(
        [
            pa.array((vh % _N_BUCKETS).astype(np.int32), pa.int32()),
            pa.array(vh, pa.int64()),
            pa.array(vid, pa.int64()),
            pa.array(vt.astype(object), pa.string()),
            pa.array(["v"] * n, pa.string()),
        ],
        schema=_VAR_SCHEMA,
    )


def _verify_ed1(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized exact edit-distance-<=1 verdict per pair: -1 = no,
    else the distance (0 or 1). Equal lengths -> hamming <= 1; lengths
    differing by 1 -> one-char-deletion alignment via a per-row shifted
    gather. No DP needed because the bound is 1."""
    n = len(a)
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(x) for x in a], dtype=np.int64)
    lb = np.array([len(x) for x in b], dtype=np.int64)
    out = np.full(n, -1, dtype=np.int64)
    width = int(max(la.max(), lb.max(), 1))
    # UCS4 fixed-width view: character-level comparison, unicode-correct
    A = np.frombuffer(
        np.array(a, dtype=f"U{width}").tobytes(), dtype=np.uint32
    ).reshape(n, width)
    B = np.frombuffer(
        np.array(b, dtype=f"U{width}").tobytes(), dtype=np.uint32
    ).reshape(n, width)

    eq = la == lb
    if eq.any():
        ham = (A[eq] != B[eq]).sum(axis=1)
        v = np.where(ham <= 1, ham, -1)
        out[eq] = v
    diff = np.abs(la - lb) == 1
    if diff.any():
        idxs = np.nonzero(diff)[0]
        # orient: L = longer, S = shorter
        swap = lb[idxs] > la[idxs]
        L = np.where(swap[:, None], B[idxs], A[idxs])
        S = np.where(swap[:, None], A[idxs], B[idxs])
        ls = np.where(swap, la[idxs], lb[idxs])  # shorter length
        mism = L[:, :width] != S[:, :width]
        # first mismatch position (rows with no mismatch in the padded
        # view differ only by the trailing char -> j = shorter length)
        any_m = mism.any(axis=1)
        j = np.where(any_m, mism.argmax(axis=1), ls)
        # compare L with position j removed against S
        cols = np.arange(width - 1)[None, :]
        gather = cols + (cols >= j[:, None])
        Ldel = np.take_along_axis(L, gather, axis=1)
        ok = (Ldel == S[:, : width - 1]).all(axis=1)
        out[idxs] = np.where(ok, 1, -1)
    return out


def fuzzy_pairs(
    ds: "ray.data.Dataset", id_col: str, text_col: str
) -> "ray.data.Dataset":
    """All pairs (id_a < id_b) of rows whose ``text_col`` values are
    within edit distance 1, with the exact distance (see module doc)."""
    n_rows = ds.count()
    np_ = partitions_for(n_rows)

    def variants(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = np.asarray(
            batch.column(text_col).to_pandas(), dtype=object
        )
        return _variant_rows(ids, texts)

    def candidate_verify(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        if g.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        df = g.select(["vhash", "id", "text"]).to_pandas()
        # variant hashes are mostly singletons — keep only collision
        # groups BEFORE any per-group work (vectorized duplicated mask)
        df = df[df.duplicated("vhash", keep=False)]
        if not len(df):
            return _PAIR_SCHEMA.empty_table()
        df = df.sort_values(["vhash", "id"], kind="stable")
        vh = df["vhash"].to_numpy()
        ids_all = df["id"].to_numpy()
        txt_all = df["text"].to_numpy()
        starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]])
        lens = np.diff(np.r_[starts, len(vh)])
        ia: list[np.ndarray] = []
        ib: list[np.ndarray] = []
        ta: list[np.ndarray] = []
        tb: list[np.ndarray] = []
        # size-2 groups (the overwhelming majority) pair vectorized
        two = starts[lens == 2]
        if len(two):
            ia.append(ids_all[two])
            ib.append(ids_all[two + 1])
            ta.append(txt_all[two])
            tb.append(txt_all[two + 1])
        # larger groups (rare): per-group triu — bounded by true-dup mass
        for s0, m in zip(starts[lens > 2], lens[lens > 2]):
            iu, ju = np.triu_indices(m, k=1)
            ia.append(ids_all[s0 + iu])
            ib.append(ids_all[s0 + ju])
            ta.append(txt_all[s0 + iu])
            tb.append(txt_all[s0 + ju])
        if not ia:
            return _PAIR_SCHEMA.empty_table()
        id_a = np.concatenate(ia)
        id_b = np.concatenate(ib)
        t_a = np.concatenate(ta)
        t_b = np.concatenate(tb)
        # a pair of DIFFERENT ids can repeat within the group set (several
        # shared variants) — drop local dupes before the (cheap) verify
        key = pd.MultiIndex.from_arrays([id_a, id_b])
        # id_a == id_b happens when one string's two DIFFERENT deletions
        # coincide ("gamma" -> "gama" twice) — not a pair
        keep = ~key.duplicated() & (id_a != id_b)
        id_a, id_b, t_a, t_b = id_a[keep], id_b[keep], t_a[keep], t_b[keep]
        dist = _verify_ed1(t_a, t_b)
        ok = dist >= 0
        id_a, id_b, dist = id_a[ok], id_b[ok], dist[ok]
        pbucket = ((id_a * 1000003 + id_b) % _N_BUCKETS).astype(np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(pbucket, pa.int32()),
                pa.array(id_a, pa.int64()),
                pa.array(id_b, pa.int64()),
                pa.array(dist, pa.int64()),
                pa.array(["p"] * len(id_a), pa.string()),
            ],
            schema=_PAIR_SCHEMA,
        )

    def dedupe(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        if g.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        t = (
            g.select(["id_a", "id_b", "dist"])
            .group_by(["id_a", "id_b"])
            .aggregate([("dist", "min")])  # rows are identical; min = the value
        )
        return pa.Table.from_arrays(
            [
                t.column("id_a").combine_chunks(),
                t.column("id_b").combine_chunks(),
                t.column("dist_min").combine_chunks(),
            ],
            schema=_OUT_SCHEMA,
        )

    return (
        ds.map_batches(variants, batch_format="pyarrow")
        .union(int_key_sentinels(_VAR_SCHEMA, "bucket", fill={"side": "s"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(candidate_verify, batch_format="pyarrow")
        .union(int_key_sentinels(_PAIR_SCHEMA, "bucket", fill={"side": "s"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(dedupe, batch_format="pyarrow")
    )


def fuzzy_pairs_oracle(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Independent brute-force all-pairs Levenshtein (full DP — shares
    nothing with the candidate/verify path)."""
    ids = t.column(id_col).to_pylist()
    texts = [str(x) for x in t.column(text_col).to_pylist()]

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = []
    order = np.argsort(ids)
    for x in range(len(order)):
        for y in range(x + 1, len(order)):
            i, j = order[x], order[y]
            if abs(len(texts[i]) - len(texts[j])) > 1:
                continue
            d = lev(texts[i], texts[j])
            if d <= 1:
                rows.append((int(ids[i]), int(ids[j]), d))
    rows.sort()
    return pa.table(
        {
            "id_a": pa.array([r[0] for r in rows], pa.int64()),
            "id_b": pa.array([r[1] for r in rows], pa.int64()),
            "dist": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def entity_clusters(
    ds: "ray.data.Dataset", id_col: str, text_col: str
) -> "ray.data.Dataset":
    """Entity resolution end stage: cluster rows whose strings sit within
    edit distance 1 of each other TRANSITIVELY (fuzzy_pairs -> connected
    components -> per-row cluster label = min member id; singletons label
    themselves). The record-linkage counterpart of near_dedup_keep.

    The CC label table is bounded by the fuzzy-pair mass, so it rides to
    the labeling scan as a driver-side dict (same candidate-bounded
    pattern as jaccard_verify); the entity rows themselves never
    shuffle beyond fuzzy_pairs' own two slim exchanges. Ids are
    zero-padded to 19 digits inside CC so its min-STRING component
    convention coincides with numeric min."""
    from agentic_doc_ray.functions.graph import connected_components

    pairs = fuzzy_pairs(ds, id_col, text_col)

    def pad(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_a": pa.array(np.char.zfill(a.astype("U19"), 19)),
                "doc_b": pa.array(np.char.zfill(b.astype("U19"), 19)),
            }
        )

    labels = connected_components(
        pairs.map_batches(pad, batch_format="pyarrow")
    ).take_all()  # pair-bounded (see docstring)
    lab = {int(r["doc_id"]): int(r["component"]) for r in labels}

    def assign(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch.column(id_col).to_pandas()
        cluster = ids.map(lab).fillna(ids).astype("int64")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(cluster.to_numpy(), pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
