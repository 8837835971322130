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
    # Decouple partition COUNT from aggregator-actor COUNT. Ray spawns
    # min(num_partitions, max_hash_shuffle_aggregators) actors per
    # exchange, each reserving num_cpus_per_partition x its partition
    # share; at defaults a 32-partition exchange on a 32-CPU node spawns
    # 32 actors holding HALF the cluster's CPUs — concurrent map stages
    # starve and every execution pays a 32-actor cold start (measured:
    # minhash_dedup 66.8s -> 17.5s when the fleet shrinks). Partitions
    # stay wide (they are the unit of data-parallel semantics and scale
    # with data volume); the FLEET is capped to a fraction of this node's
    # CPUs. On a multi-node cluster, raise via the env override.
    import os

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    env = os.environ.get("ADR_MAX_SHUFFLE_AGGREGATORS")
    ctx.max_hash_shuffle_aggregators = int(env) if env else max(2, cpus // 4)
    # Do NOT raise the per-partition CPU reservation: Ray's local default
    # (0.0625 CPU/partition) keeps fleets nearly free to schedule; a plan
    # with several concurrent exchanges whose fleets reserve real CPU
    # deadlocks — aggregators hold every core while the map stages that
    # feed them can never run (measured: 0.25/partition hung this exact
    # pipeline at 4 exchanges x 8 actors x 1 CPU = all 32 cores).
    if quiet:
        ctx.enable_progress_bars = False
    return ctx


def shuffle_partitions(requested: int | None = None) -> int:
    """Resolve a groupby's num_partitions: min(requested, cap), where the
    cap is the cluster CPU count (override: $ADR_SHUFFLE_PARTITIONS).

    The hard ceiling of 4x CPUs exists because Ray's hash-shuffle
    aggregator fleet reserves ``num_partitions x 0.0625`` CPUs in TOTAL
    per exchange, no matter how small ``max_hash_shuffle_aggregators``
    makes the fleet — Ray multiplies each actor's ``num_cpus`` by the
    partitions-per-aggregator ratio (ray hash_shuffle.py:982-990). Two
    concurrent np=64 exchanges therefore reserve 8 full CPUs; on an
    8-CPU session that is EVERY core, the map stages feeding the
    exchanges can never schedule, and the plan hangs silently (measured:
    minhash at ADR_SHUFFLE_PARTITIONS=64 under the 8-CPU driver gate).
    np <= 4x CPUs keeps two in-flight exchanges' reservations <= half the
    cluster. With no ``requested``, exchanges run at the full cap so
    shuffle width scales with the cluster — sentinel coverage
    (functions/_exchange.py) adapts to whatever this returns.
    """
    import os

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    env = os.environ.get("ADR_SHUFFLE_PARTITIONS")
    if env:
        ceiling = 4 * cpus
        cap = max(2, int(env))
        if cap > ceiling:
            import logging

            logging.getLogger(__name__).warning(
                "ADR_SHUFFLE_PARTITIONS=%s exceeds the deadlock-safe ceiling "
                "%d (4x %d CPUs): each exchange's aggregator fleet reserves "
                "np/16 CPUs regardless of fleet size; clamping.",
                env,
                ceiling,
                cpus,
            )
            cap = ceiling
    else:
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


def partitions_for(n_rows: int, target_rows: int = 1 << 16) -> int:
    """Exchange width sized by DATA volume, capped by the cluster.

    Complements ``auto_buckets`` (which sizes the KEY SPACE so per-group
    memory stays flat): this sizes the PARTITION COUNT of one exchange so
    small inputs do not pay the per-partition finalize latency of the full
    cluster-wide cap. Measured on the 32-CPU sandbox (joins at sf0.1,
    ~600k rows): np=8 -> 4.5-5.0 s, np=16 -> 5.8 s, np=32 -> 8.5-9.0 s —
    each extra hash partition costs real latency per exchange, flat fleet
    or not. ceil(rows / 64k) partitions recovers the np=8-class time at
    this scale and still saturates ``shuffle_partitions()``'s cap (and
    therefore scales with the cluster) once the input exceeds
    ~64k x CPUs rows — at 10^12 rows every exchange runs at full width.
    """
    return shuffle_partitions(max(2, -(-max(n_rows, 1) // target_rows)))


def scalar_agg(ds, col: str, how: str = "sum"):
    """One scalar (sum/min/max) of a Dataset column WITHOUT the aggregate
    fleet: ``Dataset.sum/min/max`` each plan a full hash-aggregate
    (200-partition fleet spawn, ~0.8 s of fixed cost at ANY input size).
    A per-block partial + driver fold is exact for these associative
    aggregates and costs one map-only pass. Returns None on an empty
    dataset (mirrors Dataset.sum's null)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    fn = {"sum": pc.sum, "min": pc.min, "max": pc.max}[how]

    def part(b: "pa.Table") -> "pa.Table":
        typ = b.schema.field(col).type
        if b.num_rows == 0:
            return pa.table({"v": pa.array([], typ)})
        return pa.table({"v": pa.array([fn(b.column(col)).as_py()], typ)})

    rows = ds.map_batches(part, batch_format="pyarrow").take_all()
    vals = [r["v"] for r in rows if r["v"] is not None]
    if not vals:
        return None
    if how == "sum":
        return sum(vals)
    return min(vals) if how == "min" else max(vals)
