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


def _registers(values: np.ndarray) -> np.ndarray:
    """(M,) uint8 register array for a batch of int64 values."""
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)  # pad low bits
    # rank = leading zeros of `rest` + 1, computed via bit_length
    # bit_length of uint64 via log2 on nonzero values
    bl = np.zeros(len(rest), dtype=np.int64)
    nz = rest > 0
    bl[nz] = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64) + 1
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


def hll_distinct(
    ds: "ray.data.Dataset", group_col: str, value_col: str
) -> pa.Table:
    """Approximate distinct ``value_col`` per ``group_col``.

    Per batch: one (group, registers) row per group present. Merge:
    element-wise max of registers — done on the driver because the total
    sketch volume is (n_groups x 4 KiB), independent of input size.
    """

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        out_g, out_r = [], []
        import collections

        by_g = collections.defaultdict(list)
        for g, v in zip(groups, vals):
            by_g[g].append(v)
        for g, vs in sorted(by_g.items()):
            out_g.append(g)
            out_r.append(_registers(np.asarray(vs, dtype=np.int64)).tobytes())
        return pa.Table.from_pydict(
            {"g": out_g, "regs": out_r},
            schema=pa.schema([("g", pa.string()), ("regs", pa.binary())]),
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged: dict[str, np.ndarray] = {}
    for r in partials:
        regs = np.frombuffer(r["regs"], dtype=np.uint8)
        cur = merged.get(r["g"])
        merged[r["g"]] = regs if cur is None else np.maximum(cur, regs)
    rows = {
        "g": sorted(merged),
        "approx_distinct": [int(round(estimate(merged[g]))) for g in sorted(merged)],
    }
    return pa.Table.from_pydict(rows).rename_columns(
        [group_col, "approx_distinct"]
    )
