"""Mergeable sketches: HyperLogLog approximate count-distinct.

The at-scale aggregation pattern for distinct counts: each batch emits ONE
serialized sketch per group (register-max arrays are mergeable and
commutative), a tiny groupby merges them, and the estimate is computed
once at the end — the shuffle moves kilobytes regardless of input size,
vs the exact pair-dedup path (analytics.distinct_users) which shuffles
one row per distinct value.

Standard HLL (Flajolet et al.): m=2^p registers, register j keeps the max
leading-zero rank of hashes routed to it; estimate = alpha*m^2 / sum(2^-M)
with small-range linear counting correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

P = 12  # 4096 registers -> ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of int64 values (splitmix64)."""
    x = values.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit_length of a uint64 array via shift/mask (float64 log2
    rounds up for values just below a power of two — ADVICE r1)."""
    bl = np.zeros(len(x), dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >> np.uint64(shift)
        has = m > 0
        bl[has] += shift
        v = np.where(has, m, v)
    bl[x > 0] += 1
    return bl


def _registers(values: np.ndarray) -> np.ndarray:
    """(M,) uint8 register array for a batch of int64 values."""
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)  # pad low bits
    # rank = leading zeros of `rest` + 1, via exact bit_length
    bl = _bit_length_u64(rest)
    rank = (64 - bl + 1).astype(np.uint8)
    regs = np.zeros(M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def estimate(regs: np.ndarray) -> float:
    """HLL estimate with linear-counting small-range correction."""
    s = np.sum(np.power(2.0, -regs.astype(np.float64)))
    e = _ALPHA * M * M / s
    zeros = int(np.sum(regs == 0))
    if e <= 2.5 * M and zeros:
        e = M * np.log(M / zeros)
    return float(e)


def exact_quantiles(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: float = 100.0,
) -> pa.Table:
    """Exact percentiles per group via DISTRIBUTION COMPRESSION.

    Values are scaled to exact integers (round(x*scale)); each batch emits
    (group, value, count) partials — one row per distinct value per batch —
    and the merged distribution (bounded by value cardinality, NOT row
    count) yields exact ``quantile_disc`` semantics: the smallest value
    whose cumulative count reaches ceil(q*n). The shuffle-free alternative
    to a full sort for quantile metrics at scale; the merged distribution
    is kilobytes for bounded-cardinality metrics columns.
    """

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.round(
            pc.multiply(batch.column(value_col), pa.scalar(scale))
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column(group_col), cents], names=["g", "v"]
        )
        g = t.group_by(["g", "v"]).aggregate([("v", "count")])
        return g.rename_columns(["g", "v", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    # merge the (group, value) distribution on the driver — bounded by
    # distinct-value cardinality, independent of input row count
    dist: dict[str, dict[int, int]] = {}
    for r in parts:
        dist.setdefault(r["g"], {})
        dist[r["g"]][r["v"]] = dist[r["g"]].get(r["v"], 0) + r["n"]
    rows: dict[str, list] = {"g": []}
    for q in quantiles:
        rows[f"p{int(q * 100)}"] = []
    for g in sorted(dist):
        vals = np.array(sorted(dist[g]), dtype=np.int64)
        cnts = np.array([dist[g][v] for v in vals], dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        rows["g"].append(g)
        for q in quantiles:
            target = max(1, int(np.ceil(q * n)))
            idx = int(np.searchsorted(cum, target))
            rows[f"p{int(q * 100)}"].append(float(vals[idx]) / scale)
    t = pa.Table.from_pydict(rows)
    return t.rename_columns([group_col] + [f"p{int(q * 100)}" for q in quantiles])


def filter_above_group_median(sf_dir: str) -> "ray.data.Dataset":
    """Documents at or above their language's median length.

    Sketch-then-filter composition: ``exact_quantiles`` reduces the
    dataset to a per-group threshold table (one row per language, exact
    ``quantile_disc`` semantics), the thresholds broadcast via ``ray.put``,
    and a second streaming pass filters vectorized — no shuffle touches
    the document rows at all.
    """
    import pyarrow.compute as pc

    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    q = exact_quantiles(ds, "lang", "n_chars", quantiles=(0.5,), scale=1.0)
    med = {
        r["lang"]: int(r["p50"]) for r in q.to_pylist()
    }
    med_ref = ray.put(med)

    def flt(batch: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        # vectorized probe: dictionary-encode the group key (a handful of
        # distinct values), map only the DICTIONARY through the lookup,
        # then gather per row at C speed
        enc = batch.column("lang").combine_chunks().dictionary_encode()
        dict_thresh = np.array(
            [m[v] for v in enc.dictionary.to_pylist()], dtype=np.int64
        )
        thresh = pa.array(dict_thresh[np.asarray(enc.indices)])
        keep = pc.greater_equal(batch.column("n_chars").combine_chunks(), thresh)
        return batch.filter(keep).select(["doc_id", "lang", "n_chars"])

    return ds.map_batches(flt, batch_format="pyarrow")


def _hll_partial(batch: pa.Table, group_col: str, value_col: str) -> pa.Table:
        # Vectorized grouping: dictionary-encode the key, argsort-split the
        # value array at group boundaries (no per-row Python dict).
        enc = batch.column(group_col).combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices)
        uniq = enc.dictionary.to_pylist()
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        sv = vals[order]
        boundaries = np.flatnonzero(np.diff(sc)) + 1
        starts = np.concatenate(([0], boundaries)) if len(sc) else np.array([], int)
        ends = np.concatenate((boundaries, [len(sc)])) if len(sc) else np.array([], int)
        out_g, out_r = [], []
        for s, e in zip(starts, ends):
            out_g.append(uniq[sc[s]])
            out_r.append(_registers(sv[s:e]).tobytes())
        return pa.Table.from_pydict(
            {"g": out_g, "regs": out_r},
            schema=pa.schema([("g", pa.string()), ("regs", pa.binary())]),
        )

def _hll_finalize(partial_rows: list[dict], group_col: str) -> pa.Table:
    """Merge (group, registers) partials (element-wise max — commutative,
    so batching-independent) and estimate once per group."""
    merged: dict[str, np.ndarray] = {}
    for r in partial_rows:
        regs = np.frombuffer(r["regs"], dtype=np.uint8)
        cur = merged.get(r["g"])
        merged[r["g"]] = regs if cur is None else np.maximum(cur, regs)
    rows = {
        "g": sorted(merged),
        "approx_distinct": [int(round(estimate(merged[g]))) for g in sorted(merged)],
    }
    return pa.Table.from_pydict(
        rows,
        schema=pa.schema([("g", pa.string()), ("approx_distinct", pa.int64())]),
    ).rename_columns([group_col, "approx_distinct"])


def hll_distinct(
    ds: "ray.data.Dataset", group_col: str, value_col: str
) -> pa.Table:
    """Approximate distinct ``value_col`` per ``group_col``.

    Per batch: one (group, registers) row per group present. Merge:
    element-wise max of registers — done on the driver because the total
    sketch volume is (n_groups x 4 KiB), independent of input size.

    DETERMINISTIC: the register merge is a commutative max, so the result
    is independent of batching/block order — ``hll_distinct_oracle`` (the
    same partial on the whole table as one batch) is bit-equal.
    """
    partials = ds.map_batches(
        lambda b: _hll_partial(b, group_col, value_col), batch_format="pyarrow"
    ).take_all()
    return _hll_finalize(partials, group_col)


def hll_distinct_oracle(
    tbl: pa.Table, group_col: str, value_col: str
) -> pa.Table:
    """Single-process replica of ``hll_distinct`` — bit-equal by the
    commutativity of the register max-merge."""
    return _hll_finalize(
        _hll_partial(tbl, group_col, value_col).to_pylist(), group_col
    )


def _quantile_bounds(dist: dict[int, int], n_bins: int) -> np.ndarray:
    """n_bins-1 bin boundaries from a (value -> count) distribution:
    boundary i = smallest value whose cumulative count reaches
    ceil(i/n_bins * n) — exact quantile_disc, same rule as
    exact_quantiles. Module-level for property tests."""
    vals = np.array(sorted(dist), dtype=np.int64)
    cnts = np.array([dist[v] for v in vals], dtype=np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    if not n:
        return np.zeros(0, np.int64)
    return np.array(
        [
            vals[int(np.searchsorted(cum, max(1, int(np.ceil(i / n_bins * n)))))]
            for i in range(1, n_bins)
        ],
        dtype=np.int64,
    )


def quantile_bins(
    ds: "ray.data.Dataset", value_col: str = "n_chars", n_bins: int = 10
) -> "ray.data.Dataset":
    """Curriculum binning: assign each row its global quantile bin.

    The data-scheduling primitive (shortest-first curricula, length-
    balanced batch mixes): bin k holds rows between the k-th and (k+1)-th
    n-tile of ``value_col``. Same sketch-then-map composition as
    ``filter_above_group_median`` — pass 1 compresses the dataset to a
    (value, count) DISTRIBUTION (one row per distinct integer value per
    batch; driver merge is bounded by value cardinality, never row
    count), the n-1 exact ``quantile_disc`` boundaries broadcast in the
    task closure (a few ints), and pass 2 assigns bins with one
    vectorized ``searchsorted`` per batch. No shuffle touches the rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column(value_col).cast(pa.int64())], names=["v"]
        )
        g = t.group_by("v").aggregate([("v", "count")])
        return g.rename_columns(["v", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    dist: dict[int, int] = {}
    for r in parts:
        dist[r["v"]] = dist.get(r["v"], 0) + r["n"]
    bounds = _quantile_bounds(dist, n_bins)

    def assign(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        # bin = #{boundaries strictly below v} == CASE v<=b1 -> 0, ... ELSE n-1
        b = np.searchsorted(bounds, v, side="left").astype(np.int64)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), batch.column(value_col), pa.array(b, pa.int64())],
            names=["doc_id", value_col, "bin"],
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# estimation. est(x) = min over depth rows of counter[d][h_d(x)] — always an
# OVERestimate (collisions only add), within eps*N with probability
# 1 - (1/2)^depth for width = 2/eps. Counter adds are commutative integer
# sums, so the distributed sketch is bit-equal to a single-process replica
# regardless of batch boundaries.
# ---------------------------------------------------------------------------

CMS_WIDTH = 2048
CMS_DEPTH = 4


def _token_hash_u64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash per DISTINCT token (crc32 of the bytes,
    then splitmix64) — python loop bounded by the batch vocabulary
    (Heaps' law), same cost class as token_commonness's crc pass."""
    import zlib

    h = np.array(
        [zlib.crc32(t.encode("utf-8")) for t in tokens], dtype=np.uint64
    )
    return _hash64(h.astype(np.int64))


def _cms_slots(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(len(h), depth) int64 slot indices: row d uses splitmix64 of
    (token_hash + d * odd_constant)."""
    out = np.empty((len(h), depth), dtype=np.int64)
    for d in range(depth):
        hd = _hash64((h + np.uint64(d) * np.uint64(0xA24BAED4963EE407)).astype(np.int64))
        out[:, d] = (hd % np.uint64(width)).astype(np.int64)
    return out


def _cms_partial_batch(
    batch: pa.Table, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> pa.Table:
    """Whitespace-token counts folded into sketch-slot partials: long
    (row, slot, n) rows for the NONZERO slots this batch touched
    (<= min(width*depth, distinct tokens * depth) rows per batch — the
    top_tokens partial-counts shape, so the merge is a plain hash
    aggregate that tolerates empty partitions; no map_groups)."""
    import pyarrow.compute as pc

    trimmed = pc.replace_substring_regex(
        batch.column("text"), pattern=r"^\s+|\s+$", replacement=""
    )
    nonempty = pc.not_equal(trimmed, "")
    toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    enc = flat.dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    schema = pa.schema(
        [("row", pa.int32()), ("slot", pa.int64()), ("n", pa.int64())]
    )
    if not vocab:
        return schema.empty_table()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    per_tok = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
    slots = _cms_slots(_token_hash_u64(vocab), depth, width)
    rows, ns, ss = [], [], []
    for d in range(depth):
        cnt = np.zeros(width, dtype=np.int64)
        np.add.at(cnt, slots[:, d], per_tok)
        nz = np.flatnonzero(cnt)
        ss.append(nz)
        ns.append(cnt[nz])
        rows.append(np.full(len(nz), d, np.int32))
    return pa.Table.from_arrays(
        [
            pa.array(np.concatenate(rows), pa.int32()),
            pa.array(np.concatenate(ss), pa.int64()),
            pa.array(np.concatenate(ns), pa.int64()),
        ],
        schema=schema,
    )


def cms_token_counts(
    docs: "ray.data.Dataset",
    probes: list[str],
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> pa.Table:
    """Count-Min frequency estimates for ``probes`` over the corpus'
    whitespace tokens: (token, est_count), est = min over depth rows.

    Scale shape: per-batch slot partials -> ONE hash aggregate keyed by
    (row, slot) (output <= depth*width rows TOTAL, independent of corpus
    size) -> the <= depth*width merged rows collect driver-side and the
    probe estimates are a numpy gather. The corpus never shuffles.
    """
    from functools import partial as _part

    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import partitions_for

    merged = (
        docs.map_batches(
            _part(_cms_partial_batch, width=width, depth=depth),
            batch_format="pyarrow",
        )
        # output is bounded by depth*width rows — size the aggregator
        # fleet for THAT, not the corpus (unsized groupbys spawn a
        # default-width fleet whose cold start dominates)
        .groupby(["row", "slot"], num_partitions=partitions_for(depth * width))
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    cms = np.zeros((depth, width), dtype=np.int64)
    for r in merged:
        cms[int(r["row"]), int(r["slot"])] = int(r["n"])
    return _cms_estimate_table(cms, probes, width, depth)


def _cms_estimate_table(
    cms: np.ndarray, probes: list[str], width: int, depth: int
) -> pa.Table:
    slots = _cms_slots(_token_hash_u64(list(probes)), depth, width)
    est = cms[np.arange(depth)[None, :], slots].min(axis=1)
    return pa.Table.from_pydict(
        {"token": list(probes), "est_count": est.astype(np.int64)},
        schema=pa.schema([("token", pa.string()), ("est_count", pa.int64())]),
    )


def cms_token_counts_oracle(
    docs_tbl: pa.Table,
    probes: list[str],
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> pa.Table:
    """Single-process replica (bit-equal: counter adds are commutative
    integer sums, so the sketch is batching-independent)."""
    part = _cms_partial_batch(docs_tbl, width=width, depth=depth)
    cms = np.zeros((depth, width), dtype=np.int64)
    rows = part.column("row").to_numpy(zero_copy_only=False)
    slots = part.column("slot").to_numpy(zero_copy_only=False)
    ns = part.column("n").to_numpy(zero_copy_only=False)
    np.add.at(cms, (rows.astype(np.int64), slots), ns)
    return _cms_estimate_table(cms, probes, width, depth)
