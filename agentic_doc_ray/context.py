"""Session-level Ray Data tuning for this engine.

Call ``tune_context()`` once per Ray session (bench, tests, driver entry).
Settings are read at EXECUTION time from the ambient DataContext — they
cannot be scoped per stage — so the engine standardizes on:

  - HASH_SHUFFLE: our groupbys key on low-cardinality int buckets or
    pre-aggregated partials; hash partitioning skips the sort sampling +
    range exchange entirely (measured 1.75s vs 3.0s for the reassembly
    exchange at 680k rows, and it removes the sort's all-to-all barrier).
  - preserve_order off: order is data (offset columns), never block order.
"""

from __future__ import annotations

from ray.data import DataContext
from ray.data.context import ShuffleStrategy


def tune_context(quiet: bool = True) -> DataContext:
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.execution_options.preserve_order = False
    if quiet:
        ctx.enable_progress_bars = False
    return ctx


def shuffle_partitions(requested: int | None = None) -> int:
    """Resolve a groupby's num_partitions: min(requested, cap), where the
    cap is the cluster CPU count (override: $ADR_SHUFFLE_PARTITIONS).

    Each hash-shuffle partition is backed by an aggregator actor; asking for
    more aggregators than CPUs deadlocks a small cluster (measured: np=64 on
    a 4-CPU session never schedules). With no ``requested``, exchanges run
    at the full cap so shuffle width scales with the cluster — sentinel
    coverage (functions/_exchange.py) adapts to whatever this returns.
    """
    import os

    import ray

    env = os.environ.get("ADR_SHUFFLE_PARTITIONS")
    if env:
        cap = max(2, int(env))
    else:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        cap = max(2, cpus)
    return min(requested, cap) if requested else cap


def auto_buckets(
    n_rows: int, target_rows: int = 1 << 18, min_buckets: int = 32
) -> int:
    """Bucket fan-out sized by DATA volume, not a constant (VERDICT r02 #6).

    A fixed bucket count means per-bucket group size — and therefore the
    peak memory of the one map_groups task that joins it — grows linearly
    with input. Sizing by a rows-per-bucket target keeps per-task memory
    flat as SF grows; the bucket count rides through ``shuffle_partitions``
    hash groups, so parallelism is still capped by the cluster while group
    SIZE is capped by the data. Power of two (bucket keys are computed with
    ``bit_wise_and``); uncapped above — 10^12 rows resolves to ~4M buckets,
    which is just a key-space width, not an actor count.
    """
    want = max(min_buckets, -(-max(n_rows, 1) // target_rows))
    return 1 << (want - 1).bit_length()
