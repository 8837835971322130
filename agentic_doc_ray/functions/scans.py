"""Distributed ordered scans over the event log.

Two scan shapes a streaming-style pipeline needs that Ray Data has no
primitive for:

  - a GLOBAL prefix scan (running max over a total arrival order) —
    implemented as range-partition -> per-partition extrema (tiny) ->
    driver-side exclusive prefix over the partition summaries (one value
    per partition, independent of row count) -> vectorized within-partition
    scan seeded with the partition's prefix;
  - a PARTITIONED scan (cumulative aggregates per user) — no global
    coordination at all: coarse-bucket the shuffle key (user_id % 64, the
    sessionize pattern) and run one vectorized sorted pass per bucket.

Both are exact and deterministic: order is data ((arrival_ts, event_id) /
(user_id, ts, event_id)), never block order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from agentic_doc_ray.context import partitions_for, shuffle_partitions

# Deterministic out-of-order arrival simulation: the synthetic event log is
# perfectly time-ordered by event_id, so a watermark operator would never
# see a late event. Jitter each event's ARRIVAL (not its event time) by a
# content-keyed 0..599 s offset — the same expression the SQL oracle uses.
_JITTER_MULT = 2654435761  # Knuth multiplicative hash constant
_JITTER_MOD = 600


def _arrival_ts(batch: pa.Table) -> pa.Array:
    ids = batch.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
    jitter_us = ((ids * _JITTER_MULT) % _JITTER_MOD) * 1_000_000
    return pc.add(batch.column("ts"), pa.array(jitter_us.astype("timedelta64[us]")))


def late_events(sf_dir: str, lateness_minutes: int = 5) -> "ray.data.Dataset":
    """Watermark-based late-event detection via a distributed prefix scan.

    The watermark before an event is the max EVENT time over all STRICTLY
    earlier ARRIVALS (order: arrival_ts, event_id). An event is late when
    ``watermark - ts > lateness``. Plan:

      1. one pass computes per-arrival-day partial maxima (<= 31 tiny rows
         per batch; the driver merge is per-partition summaries, not data);
      2. driver takes the exclusive prefix max across day partitions;
      3. one groupby(day) exchange; each group sorts by (arrival_ts,
         event_id) and runs a vectorized exclusive cummax seeded with its
         partition prefix.

    Day partitions are a RANGE partition of the scan order, so the prefix
    seed is exact; at 10^12 rows the day key would be (day, hour) or
    finer — the summary table stays O(partitions).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )
    n_rows = ds.count()  # metadata-only
    if n_rows == 0:  # zero-row shuffle guard
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "event_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "watermark_ts": pa.array([], pa.timestamp("us")),
                    "is_late": pa.array([], pa.bool_()),
                }
            )
        )

    def with_keys(batch: pa.Table) -> pa.Table:
        arrival = _arrival_ts(batch)
        day = pc.cast(
            pc.days_between(
                pa.scalar(np.datetime64("1970-01-01", "us")), arrival
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [batch.column("event_id"), batch.column("ts"), arrival, day],
            names=["event_id", "ts", "arrival_ts", "day"],
        )

    keyed = ds.map_batches(with_keys, batch_format="pyarrow")

    # Pass 1: per-day max event-time. Partial per batch, merged on the
    # driver — bounded by the number of day partitions, not rows.
    def day_max(batch: pa.Table) -> pa.Table:
        g = batch.select(["day", "ts"]).group_by("day").aggregate([("ts", "max")])
        return g.rename_columns(["day", "max_ts"])

    summaries = keyed.map_batches(day_max, batch_format="pyarrow").take_all()
    per_day: dict[int, np.datetime64] = {}
    for r in summaries:
        t = np.datetime64(r["max_ts"], "us")
        if r["day"] not in per_day or t > per_day[r["day"]]:
            per_day[r["day"]] = t
    days = sorted(per_day)
    prefix: dict[int, np.datetime64 | None] = {}
    running: np.datetime64 | None = None
    for d in days:
        prefix[d] = running  # exclusive: max over all PRIOR days
        running = per_day[d] if running is None else max(running, per_day[d])
    prefix_ref = ray.put(prefix)
    late_us = lateness_minutes * 60 * 1_000_000

    def scan_day(group: pa.Table) -> pa.Table:
        seed_map = ray.get(prefix_ref)
        order = pc.sort_indices(
            group,
            sort_keys=[("arrival_ts", "ascending"), ("event_id", "ascending")],
        )
        g = group.take(order)
        ts = g.column("ts").combine_chunks().to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        # exclusive running max within the partition
        inc = np.maximum.accumulate(ts_us)
        excl = np.empty_like(inc)
        excl[0] = np.iinfo(np.int64).min
        excl[1:] = inc[:-1]
        seed = seed_map.get(int(g.column("day")[0].as_py()))
        if seed is not None:
            excl = np.maximum(excl, seed.astype("datetime64[us]").astype(np.int64))
        has_wm = excl != np.iinfo(np.int64).min
        late = has_wm & ((excl - ts_us) > late_us)
        wm = pa.array(
            np.where(has_wm, excl, 0).astype("datetime64[us]"),
            mask=~has_wm,
        )
        return pa.Table.from_arrays(
            [g.column("event_id"), g.column("ts"), wm, pa.array(late)],
            names=["event_id", "ts", "watermark_ts", "is_late"],
        )

    return keyed.groupby("day", num_partitions=partitions_for(n_rows)).map_groups(
        scan_day, batch_format="pyarrow"
    )


def on_time_hourly(sf_dir: str, lateness_minutes: int = 5) -> "ray.data.Dataset":
    """Watermark-filtered tumbling window: hourly event counts + exact
    integer-cents sums over ON-TIME events only (late ones — as judged by
    the arrival-order watermark of ``late_events`` — are dropped, the
    standard streaming-engine semantics for closed windows).

    Composition, not new machinery: the prefix-scan output feeds the same
    vectorized window partial-aggregation as ``events_hourly``; the join
    back to event values rides the scan's own exchange (values are carried
    through the scan columns).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type", "value"]
    )
    n_rows = ds.count()  # metadata-only
    n_rows = ds.count()  # metadata-only
    if n_rows == 0:  # zero-row shuffle guard
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "window_start": pa.array([], pa.timestamp("us")),
                    "event_type": pa.array([], pa.string()),
                    "sum_value": pa.array([], pa.float64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        )

    def with_keys(batch: pa.Table) -> pa.Table:
        arrival = _arrival_ts(batch)
        day = pc.cast(
            pc.days_between(
                pa.scalar(np.datetime64("1970-01-01", "us")), arrival
            ),
            pa.int32(),
        )
        cents = pc.round(pc.multiply(batch.column("value"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        return pa.Table.from_arrays(
            [
                batch.column("event_id"), batch.column("ts"), arrival, day,
                batch.column("event_type"), cents,
            ],
            names=["event_id", "ts", "arrival_ts", "day", "event_type", "cents"],
        )

    keyed = ds.map_batches(with_keys, batch_format="pyarrow")

    def day_max(batch: pa.Table) -> pa.Table:
        g = batch.select(["day", "ts"]).group_by("day").aggregate([("ts", "max")])
        return g.rename_columns(["day", "max_ts"])

    summaries = keyed.map_batches(day_max, batch_format="pyarrow").take_all()
    per_day: dict[int, np.datetime64] = {}
    for r in summaries:
        t = np.datetime64(r["max_ts"], "us")
        if r["day"] not in per_day or t > per_day[r["day"]]:
            per_day[r["day"]] = t
    prefix: dict[int, np.datetime64 | None] = {}
    running: np.datetime64 | None = None
    for d in sorted(per_day):
        prefix[d] = running
        running = per_day[d] if running is None else max(running, per_day[d])
    prefix_ref = ray.put(prefix)
    late_us = lateness_minutes * 60 * 1_000_000

    def window_partial(group: pa.Table) -> pa.Table:
        seed_map = ray.get(prefix_ref)
        order = pc.sort_indices(
            group,
            sort_keys=[("arrival_ts", "ascending"), ("event_id", "ascending")],
        )
        g = group.take(order)
        ts = g.column("ts").combine_chunks().to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        inc = np.maximum.accumulate(ts_us)
        excl = np.empty_like(inc)
        excl[0] = np.iinfo(np.int64).min
        excl[1:] = inc[:-1]
        seed = seed_map.get(int(g.column("day")[0].as_py()))
        if seed is not None:
            excl = np.maximum(excl, seed.astype("datetime64[us]").astype(np.int64))
        on_time = ~((excl != np.iinfo(np.int64).min) & ((excl - ts_us) > late_us))
        f = g.filter(pa.array(on_time))
        hour = pc.floor_temporal(f.column("ts"), unit="hour")
        t = pa.Table.from_arrays(
            [hour, f.column("event_type"), f.column("cents")],
            names=["window_start", "event_type", "cents"],
        )
        agg = t.group_by(["window_start", "event_type"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return agg.rename_columns(
            ["window_start", "event_type", "cents", "n_events"]
        )

    from ray.data.aggregate import Sum

    partials = keyed.groupby(
        "day", num_partitions=partitions_for(n_rows)
    ).map_groups(window_partial, batch_format="pyarrow")
    agg = partials.groupby(
        ["window_start", "event_type"], num_partitions=shuffle_partitions(4)
    ).aggregate(
        Sum("cents", alias_name="cents"), Sum("n_events", alias_name="n_events")
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("window_start"),
                b.column("event_type"),
                pc.divide(b.column("cents").cast(pa.float64()), 100.0),
                b.column("n_events"),
            ],
            names=["window_start", "event_type", "sum_value", "n_events"],
        ),
        batch_format="pyarrow",
    )


def global_rank(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Dense global ranking of documents by (n_chars, doc_id) WITHOUT a
    global sort: value-range partition the key, count per partition (tiny
    summary), exclusive prefix-sum the counts on the driver, then rank
    within each partition as offset + local sorted index.

    The exchange is ONE range-partitioned groupby; driver state is one
    integer per partition. At 10^12 rows this is how you assign stable
    global ids / ranks — Ray's ``sort()`` would range-partition anyway but
    then materialize a totally ordered dataset nobody asked for.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    n_rows = ds.count()  # metadata-only
    if n_rows == 0:  # zero-row shuffle guard
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "global_rank": pa.array([], pa.int64()),
                }
            )
        )

    # key range for the value-range partition: one tiny metadata pass
    # (parquet column stats would serve at scale; min/max here)
    mm = ds.map_batches(
        lambda b: pa.Table.from_pydict(
            {"lo": [pc.min(b.column("n_chars")).as_py()],
             "hi": [pc.max(b.column("n_chars")).as_py()]}
        ),
        batch_format="pyarrow",
    ).take_all()
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.divide(
                pc.subtract(batch.column("n_chars"), pa.scalar(lo, pa.int64())),
                pa.scalar(width, pa.int64()),
            ),
            pa.int32(),
        )
        return batch.append_column("bucket", b)

    keyed = ds.map_batches(with_bucket, batch_format="pyarrow")

    counts = keyed.map_batches(
        lambda b: b.select(["bucket"]).group_by("bucket").aggregate(
            [("bucket", "count")]
        ).rename_columns(["bucket", "n"]),
        batch_format="pyarrow",
    ).take_all()
    per_bucket: dict[int, int] = {}
    for r in counts:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n"]
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(per_bucket):
        offsets[b] = acc  # ranks preceding this bucket
        acc += per_bucket[b]
    off_ref = ray.put(offsets)

    def rank_bucket(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        order = pc.sort_indices(
            group, sort_keys=[("n_chars", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        base = offs[int(g.column("bucket")[0].as_py())]
        rank = pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64) + base)
        return pa.Table.from_arrays(
            [g.column("doc_id"), g.column("n_chars"), rank],
            names=["doc_id", "n_chars", "global_rank"],
        )

    return keyed.groupby("bucket", num_partitions=partitions_for(n_rows)).map_groups(
        rank_bucket, batch_format="pyarrow"
    )


# Fibonacci-hash multiplier (2^64/phi, the splitmix64 increment): one
# wrap-mod-2^64 multiply gives a uniform, seedable permutation key. DuckDB
# reproduces it exactly with HUGEINT arithmetic (% 2^64), so the shuffle
# order is oracle-checkable bit for bit.
_SHUF_MULT = 11400714819323198485


def _shuffle_hash(doc_ids: pa.Array, seed: int) -> np.ndarray:
    # seed is mixed BEFORE the multiply — an additive post-multiply seed
    # would shift every key equally and leave the order unchanged
    ids = doc_ids.to_numpy(zero_copy_only=False).astype(np.uint64)
    return (ids + np.uint64(seed)) * np.uint64(_SHUF_MULT)


def shuffle_positions(
    sf_dir: str, seed: int = 42, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Deterministic GLOBAL shuffle positions without a global shuffle:
    assign every document its 0-based position in a seeded uniform random
    permutation (what a pretraining run needs before packing/sharding, so
    a re-run — or a resumed run — reads the corpus in the identical order).

    Order key is ``h = (doc_id * 2^64/phi + seed) mod 2^64`` (ties broken
    by doc_id); position = dense rank of (h, doc_id). Same machinery as
    ``global_rank`` but the hash is uniform on [0, 2^64), so the range
    partition is just the top 6 bits — no min/max pass at all:

      1. bucket = h >> 58 (64 equal hash ranges — balanced by uniformity,
         no sampling needed);
      2. per-bucket counts, partial-aggregated per batch, merged on the
         driver (<= n_buckets integers, independent of row count);
      3. ONE groupby(bucket) exchange; each group sorts locally by
         (h, doc_id) and emits offset + local index.

    At 10^12 rows: driver state stays at one int per bucket (use
    h >> 50 for ~16k buckets); rows move through exactly one exchange.
    """
    shift = 64 - int(np.log2(n_buckets))
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    n_rows = ds.count()  # metadata-only
    if n_rows == 0:  # zero-row shuffle guard
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shuffle_pos": pa.array([], pa.int64()),
                }
            )
        )

    def with_key(batch: pa.Table) -> pa.Table:
        h = _shuffle_hash(batch.column("doc_id").combine_chunks(), seed)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(h, pa.uint64()),
                pa.array((h >> shift).astype(np.int32)),
            ],
            names=["doc_id", "h", "bucket"],
        )

    keyed = ds.map_batches(with_key, batch_format="pyarrow")

    counts = keyed.map_batches(
        lambda b: b.select(["bucket"]).group_by("bucket").aggregate(
            [("bucket", "count")]
        ).rename_columns(["bucket", "n"]),
        batch_format="pyarrow",
    ).take_all()
    per_bucket: dict[int, int] = {}
    for r in counts:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n"]
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b]
    off_ref = ray.put(offsets)

    def pos_bucket(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        base = offs[int(g.column("bucket")[0].as_py())]
        pos = pa.array(np.arange(g.num_rows, dtype=np.int64) + base)
        return pa.Table.from_arrays(
            [g.column("doc_id"), pos], names=["doc_id", "shuffle_pos"]
        )

    return keyed.groupby("bucket", num_partitions=partitions_for(n_rows)).map_groups(
        pos_bucket, batch_format="pyarrow"
    )


def revenue_gini(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """EXACT Gini coefficient of per-customer order revenue — the
    concentration/skew diagnostic (how head-heavy is the key
    distribution this engine must shuffle): with customer revenues
    sorted ascending, ``G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))``
    for 1-based ranks i. All integer math; output is one row of the
    exact moments plus the floor per-mille coefficient. Ties in revenue
    are rank-ordered by custkey, which cannot change ``sum(i*x_i)``
    (equal x under rank permutation), so the statistic is deterministic
    without being tie-sensitive.

    Shape is the ``global_rank`` machinery ending in a SCALAR, not a
    ranked table: per-customer cents via one aggregate exchange, a
    min/max pass for the value-range partition, per-bucket local sort +
    ``(base + i) * x`` partials, and a driver merge of one 3-int row per
    bucket — computed with Python ints, so nothing overflows at any
    scale. Rows cross exactly two exchanges; nothing customer-sized
    reaches the driver."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        return (
            pa.Table.from_arrays(
                [batch.column("o_custkey"), cents], names=["o_custkey", "c"]
            )
            .group_by("o_custkey")
            .aggregate([("c", "sum")])
            .rename_columns(["o_custkey", "c"])
        )

    per_cust = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey", num_partitions=shuffle_partitions())
        .aggregate(Sum("c", alias_name="cents"))
        .materialize()  # consumed twice (min/max pass + ranked pass)
    )

    mm = per_cust.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "lo": [pc.min(b.column("cents")).as_py()],
                "hi": [pc.max(b.column("cents")).as_py()],
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    empty = pa.table(
        {
            "n": pa.array([], pa.int64()),
            "sum_cents": pa.array([], pa.int64()),
            "weighted_rank_sum": pa.array([], pa.int64()),
            "gini_num": pa.array([], pa.int64()),
            "gini_den": pa.array([], pa.int64()),
            "gini_per_mille": pa.array([], pa.int64()),
        }
    )
    if not mm:
        return ray.data.from_arrow(empty)
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.divide(
                pc.subtract(batch.column("cents"), pa.scalar(lo, pa.int64())),
                pa.scalar(width, pa.int64()),
            ),
            pa.int32(),
        )
        return batch.append_column("bucket", b)

    keyed = per_cust.map_batches(with_bucket, batch_format="pyarrow")

    counts = keyed.map_batches(
        lambda b: b.select(["bucket"])
        .group_by("bucket")
        .aggregate([("bucket", "count")])
        .rename_columns(["bucket", "n"]),
        batch_format="pyarrow",
    ).take_all()
    per_bucket: dict[int, int] = {}
    for r in counts:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n"]
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b]
    n_total = acc
    off_ref = ray.put(offsets)

    part_schema = pa.schema(
        [("b", pa.int64()), ("sx", pa.int64()), ("wsum", pa.int64())]
    )

    def gini_bucket(group: pa.Table) -> pa.Table:
        # sentinel rows (o_custkey = -1) guard the exchange against
        # Ray's empty-first-block schema race: per_cust is aggregate
        # output, whose finalizers can emit empty blocks
        g0 = group.filter(pc.greater_equal(group.column("o_custkey"), 0))
        if g0.num_rows == 0:
            return part_schema.empty_table()
        offs = ray.get(off_ref)
        order = pc.sort_indices(
            g0,
            sort_keys=[("cents", "ascending"), ("o_custkey", "ascending")],
        )
        g = g0.take(order)
        base = offs[int(g.column("bucket")[0].as_py())]
        x = g.column("cents").to_numpy(zero_copy_only=False)
        ranks = np.arange(1, len(x) + 1, dtype=np.int64) + base
        return pa.Table.from_pylist(
            [
                {
                    "b": int(g.column("bucket")[0].as_py()),
                    "sx": int(x.sum()),
                    # Python-int fold of the int64 partial keeps this
                    # exact; per-bucket ranks*x stays under 2^63 for any
                    # realistic bucket (documented: resplit buckets if
                    # rank*cents*rows approaches 2^63)
                    "wsum": int((ranks * x).sum()),
                }
            ],
            schema=part_schema,
        )

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    keyed_schema = pa.schema(
        [("o_custkey", pa.int64()), ("cents", pa.int64()), ("bucket", pa.int32())]
    )
    parts = (
        keyed.union(
            int_key_sentinels(
                keyed_schema, "bucket", fill={"o_custkey": -1, "cents": 0}
            )
        )
        .groupby("bucket", num_partitions=shuffle_partitions())
        .map_groups(gini_bucket, batch_format="pyarrow")
        .take_all()
    )
    sum_cents = sum(int(r["sx"]) for r in parts)
    wsum = sum(int(r["wsum"]) for r in parts)
    n = n_total
    gini_num = 2 * wsum - (n + 1) * sum_cents
    gini_den = n * sum_cents
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "sum_cents": pa.array([sum_cents], pa.int64()),
                "weighted_rank_sum": pa.array([wsum], pa.int64()),
                "gini_num": pa.array([gini_num], pa.int64()),
                "gini_den": pa.array([gini_den], pa.int64()),
                "gini_per_mille": pa.array(
                    [1000 * gini_num // gini_den if gini_den else 0], pa.int64()
                ),
            }
        )
    )


_US_PER_DAY = 86_400_000_000


def zorder_layout(
    sf_dir: str, bits: int = 8, rows_per_file: int = 8192, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Z-order (Morton-curve) data layout over orders — the lakehouse
    ``OPTIMIZE ZORDER BY (o_custkey, o_orderdate)`` primitive: interleave
    the low ``bits`` bits of customer key and epoch-day so rows close in
    BOTH dimensions land in the same output file, making every downstream
    read with a customer OR date predicate prune most files (the
    multi-dimensional analogue of the hive partitioning in
    ``partitioned_parquet``; reference has no storage layout surface).

    Exact and deterministic: ``zkey`` is a pure bit interleave (custkey
    bit i -> position 2i, day bit i -> 2i+1), the global position is the
    dense rank of ``(zkey, o_orderkey)``, and ``file_id = pos //
    rows_per_file`` — all integer math, mirrored bit-for-bit in the SQL
    oracle.

    Shape is the ``global_rank`` machinery minus its min/max pass: zkey
    lives in ``[0, 4^bits)`` by construction, so the range partition is
    just the top bucket bits. Per-bucket counts fold from per-batch
    partials (<= n_buckets integers on the driver), then ONE
    ``groupby(bucket)`` exchange sorts each value range locally and
    assigns ``offset + local index``. At 10^12 rows: one exchange, one
    tiny driver table — Ray's ``sort()`` would range-partition anyway and
    then materialize a total order nobody needs.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    n_rows = ds.count()  # metadata-only
    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "zkey": pa.array([], pa.int64()),
            "file_id": pa.array([], pa.int64()),
        }
    )
    if n_rows == 0:  # zero-row shuffle guard
        return ray.data.from_arrow(empty)

    shift = max(0, 2 * bits - int(np.log2(n_buckets)))

    def with_zkey(batch: pa.Table) -> pa.Table:
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        days = (
            batch.column("o_orderdate")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // _US_PER_DAY
        )
        z = np.zeros(len(cust), np.int64)
        for i in range(bits):
            z |= ((cust >> i) & 1) << (2 * i)
            z |= ((days >> i) & 1) << (2 * i + 1)
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "zkey": pa.array(z, pa.int64()),
                "bucket": pa.array((z >> shift).astype(np.int32)),
            }
        )

    keyed = ds.map_batches(with_zkey, batch_format="pyarrow")

    counts = keyed.map_batches(
        lambda b: b.select(["bucket"])
        .group_by("bucket")
        .aggregate([("bucket", "count")])
        .rename_columns(["bucket", "n"]),
        batch_format="pyarrow",
    ).take_all()
    per_bucket: dict[int, int] = {}
    for r in counts:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n"]
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b]
    off_ref = ray.put(offsets)

    def layout_bucket(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        order = pc.sort_indices(
            group, sort_keys=[("zkey", "ascending"), ("o_orderkey", "ascending")]
        )
        g = group.take(order)
        base = offs[int(g.column("bucket")[0].as_py())]
        pos = np.arange(g.num_rows, dtype=np.int64) + base
        return pa.Table.from_arrays(
            [
                g.column("o_orderkey"),
                g.column("zkey"),
                pa.array(pos // rows_per_file),
            ],
            names=["o_orderkey", "zkey", "file_id"],
        )

    return keyed.groupby("bucket", num_partitions=partitions_for(n_rows)).map_groups(
        layout_bucket, batch_format="pyarrow"
    )


def user_cumulative_spend(sf_dir: str) -> "ray.data.Dataset":
    """Per-user running purchase totals: for every purchase event, the
    user's cumulative purchase count and spend up to and including it
    (order: ts, event_id). A partitioned scan — shuffle on user_id % 64
    (64-ary key regardless of user count) and ONE vectorized sorted
    cumsum per bucket; exact integer cents inside."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )

    def purchases(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch.column("event_type"), "purchase"))
        cents = pc.round(pc.multiply(f.column("value"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        bucket = pc.cast(
            pc.bit_wise_and(f.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [f.column("event_id"), f.column("user_id"), f.column("ts"), cents, bucket],
            names=["event_id", "user_id", "ts", "cents", "bucket"],
        )

    def scan_bucket(group):
        import pandas as pd

        if group.empty or "event_id" not in group.columns:
            # Ray hands empty shuffle blocks over as schema-less frames
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "n_purchases": pd.Series([], dtype="int64"),
                    "cum_spend": pd.Series([], dtype="float64"),
                }
            )
        g = group[group["event_id"] >= 0]  # drop the sentinel
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        grp = g.groupby("user_id", sort=False)
        g["n_purchases"] = grp.cumcount() + 1
        g["cum_spend"] = grp["cents"].cumsum() / 100.0
        return g[["event_id", "user_id", "ts", "n_purchases", "cum_spend"]]

    # sentinel rows: the purchases FILTER can empty individual blocks (or
    # the whole stream), and an empty first block loses Ray's hash-shuffle
    # schema broadcast (see functions/_exchange.py) — one dropped sentinel
    # per bucket value keeps EVERY partition non-empty
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    sentinel = int_key_sentinels(
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("cents", pa.int64()),
                ("bucket", pa.int32()),
            ]
        ),
        "bucket",
        fill={"event_id": -1, "user_id": -1, "cents": 0},
    )
    return (
        ds.map_batches(purchases, batch_format="pyarrow")
        .union(sentinel)
        .groupby("bucket", num_partitions=partitions_for(ds.count()))
        .map_groups(scan_bucket, batch_format="pandas")
    )


def token_budget_select(
    sf_dir: str, budget_tokens: int = 12_000, n_buckets: int = 32
) -> "ray.data.Dataset":
    """Select documents best-first until a token budget is exhausted — the
    "take the top N tokens of the corpus" step of a curated-pretraining
    mix (DoReMi/FineWeb-style budget selection). Docs are consumed in
    global quality order (n_chars DESC, doc_id ASC); a doc is kept iff the
    running whitespace-token total INCLUDING it stays <= budget_tokens.

    Same distributed-prefix-scan shape as ``global_rank`` — no global
    sort: value-range partition the quality key (descending buckets),
    per-bucket token sums are a tiny driver summary, exclusive prefix over
    bucket summaries seeds one vectorized sorted cumsum per bucket. ONE
    range-partitioned exchange; driver state is one integer per partition.
    Buckets whose seed already exceeds the budget emit nothing without
    touching their rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    empty = pa.Table.from_pydict(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "cum_tokens": pa.array([], pa.int64()),
        }
    )
    n_rows = ds.count()  # metadata-only
    if n_rows == 0:  # zero-row shuffle guard
        return ray.data.from_arrow(empty)

    from agentic_doc_ray.functions.text import _token_count

    # quality-key range: one tiny metadata pass (parquet column stats
    # would serve at scale; min/max here)
    mm = ds.map_batches(
        lambda b: pa.Table.from_pydict(
            {"lo": [pc.min(b.column("n_chars")).as_py()],
             "hi": [pc.max(b.column("n_chars")).as_py()]}
        ),
        batch_format="pyarrow",
    ).take_all()
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def with_key(batch: pa.Table) -> pa.Table:
        # bucket ascending == quality descending, so bucket order IS scan
        # order; token counts computed once here, carried as a column
        b = pc.cast(
            pc.divide(
                pc.subtract(pa.scalar(hi, pa.int64()), batch.column("n_chars")),
                pa.scalar(width, pa.int64()),
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("n_chars"),
                _token_count(batch.column("text")),
                b,
            ],
            names=["doc_id", "n_chars", "n_tokens", "bucket"],
        )

    keyed = ds.map_batches(with_key, batch_format="pyarrow").materialize()

    # per-bucket token totals -> driver (n_buckets integers), exclusive
    # prefix in scan order
    sums = keyed.map_batches(
        lambda b: b.select(["bucket", "n_tokens"])
        .group_by("bucket")
        .aggregate([("n_tokens", "sum")])
        .rename_columns(["bucket", "t"]),
        batch_format="pyarrow",
    ).take_all()
    per_bucket: dict[int, int] = {}
    for r in sums:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["t"]
    seeds: dict[int, int] = {}
    acc = 0
    for b in sorted(per_bucket):
        seeds[b] = acc  # tokens consumed by all better buckets
        acc += per_bucket[b]
    seeds_ref = ray.put(seeds)

    def scan_bucket(group: pa.Table) -> pa.Table:
        seed = ray.get(seeds_ref)[int(group.column("bucket")[0].as_py())]
        if seed >= budget_tokens:  # budget already gone before this bucket
            return empty
        order = pc.sort_indices(
            group,
            sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")],
        )
        g = group.take(order)
        cum = seed + np.cumsum(
            g.column("n_tokens").to_numpy(zero_copy_only=False)
        )
        kept = g.filter(pa.array(cum <= budget_tokens))
        return pa.Table.from_arrays(
            [
                kept.column("doc_id"),
                kept.column("n_chars"),
                kept.column("n_tokens"),
                pa.array(cum[cum <= budget_tokens], pa.int64()),
            ],
            names=["doc_id", "n_chars", "n_tokens", "cum_tokens"],
        )

    return keyed.groupby("bucket", num_partitions=partitions_for(n_rows)).map_groups(
        scan_bucket, batch_format="pyarrow"
    )


def source_capped_select(
    sf_dir: str, cap_tokens: int = 800, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Domain-balanced corpus selection: within EVERY source, keep docs
    best-first (n_chars DESC, doc_id ASC) while the source's running
    whitespace-token total stays <= cap_tokens — the standard "cap the
    over-represented domains" step of a crawl mixture (CCNet/RefinedWeb
    practice), combining domain balancing with quality ordering.

    ONE exchange keyed on hash(source): each bucket runs a vectorized
    segmented cumsum over its sources (sort by (source, n_chars DESC,
    doc_id), cumulative sums reset at source boundaries). Only
    (doc_id, source, 2 ints) rows shuffle, never text. Partitioning
    assumption: one SOURCE's selected-prefix candidates fit one task —
    true when cap_tokens bounds the interesting prefix; a pathological
    mega-source still ships all its key rows, in which case pre-truncate
    per batch to the per-batch cap prefix first (not needed here)."""
    import zlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source", "n_chars"],
    )
    empty = pa.Table.from_pydict(
        {
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "cum_source_tokens": pa.array([], pa.int64()),
        }
    )
    n_rows = ds.count()  # metadata-only
    if n_rows == 0:  # zero-row shuffle guard
        return ray.data.from_arrow(empty)

    from agentic_doc_ray.functions.text import _token_count

    def with_key(batch: pa.Table) -> pa.Table:
        # hash only the batch's UNIQUE sources (dictionary-encode), then
        # scatter — no per-row Python
        enc = batch.column("source").combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        ub = np.array(
            [zlib.crc32(u.encode()) % n_buckets for u in uniq], np.int32
        )
        bucket = pa.array(
            ub[enc.indices.to_numpy(zero_copy_only=False)], pa.int32()
        )
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("source"),
                batch.column("n_chars"),
                _token_count(batch.column("text")),
                bucket,
            ],
            names=["doc_id", "source", "n_chars", "n_tokens", "bucket"],
        )

    def scan_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("source", "ascending"),
                ("n_chars", "descending"),
                ("doc_id", "ascending"),
            ],
        )
        g = group.take(order)
        toks = g.column("n_tokens").to_numpy(zero_copy_only=False)
        src = g.column("source").to_numpy(zero_copy_only=False)
        cs = np.cumsum(toks)
        starts = np.ones(len(src), dtype=bool)
        starts[1:] = src[1:] != src[:-1]
        seg = np.cumsum(starts) - 1
        base = (cs[starts] - toks[starts])[seg]  # cumsum before each segment
        cum = cs - base
        keep = cum <= cap_tokens
        kept = g.filter(pa.array(keep))
        return pa.Table.from_arrays(
            [
                kept.column("doc_id"),
                kept.column("source"),
                kept.column("n_tokens"),
                pa.array(cum[keep], pa.int64()),
            ],
            names=["doc_id", "source", "n_tokens", "cum_source_tokens"],
        )

    return (
        ds.map_batches(with_key, batch_format="pyarrow")
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(scan_bucket, batch_format="pyarrow")
    )


def shard_manifest(
    sf_dir: str,
    shard_size: int = 64,
    seed: int = 42,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per-shard export manifest for a seeded-shuffle training-data write:
    docs take their ``shuffle_positions`` order, consecutive runs of
    ``shard_size`` positions form a shard, and each shard's row reports
    (shard_id, n_docs, n_tokens) — what a resumable shard writer records
    before emitting files, and what a loader checks against.

    Same single-exchange machinery as ``shuffle_positions`` (uniform
    Fibonacci-hash key, bucket = top bits, driver prefix over <=n_buckets
    counts) with token counts carried through the exchange; the per-shard
    rollup is per-batch partial sums + one tiny groupby(shard_id) — shard
    rows, never docs, hit the second exchange."""
    shift = 64 - int(np.log2(n_buckets))
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_rows = ds.count()  # metadata-only
    if n_rows == 0:  # zero-row shuffle guard
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "shard_id": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        )

    from ray.data.aggregate import Sum

    from agentic_doc_ray.functions.text import _token_count

    def with_key(batch: pa.Table) -> pa.Table:
        h = _shuffle_hash(batch.column("doc_id").combine_chunks(), seed)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                _token_count(batch.column("text")),
                pa.array(h, pa.uint64()),
                pa.array((h >> shift).astype(np.int32)),
            ],
            names=["doc_id", "n_tokens", "h", "bucket"],
        )

    keyed = ds.map_batches(with_key, batch_format="pyarrow").materialize()

    counts = keyed.map_batches(
        lambda b: b.select(["bucket"]).group_by("bucket").aggregate(
            [("bucket", "count")]
        ).rename_columns(["bucket", "n"]),
        batch_format="pyarrow",
    ).take_all()
    per_bucket: dict[int, int] = {}
    for r in counts:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n"]
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b]
    off_ref = ray.put(offsets)

    def shard_partials(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        base = offs[int(g.column("bucket")[0].as_py())]
        pos = np.arange(g.num_rows, dtype=np.int64) + base
        shard = pos // shard_size
        t = pa.Table.from_arrays(
            [
                pa.array(shard),
                pa.array(np.ones(g.num_rows, np.int64)),
                g.column("n_tokens"),
            ],
            names=["shard_id", "n_docs", "n_tokens"],
        )
        # partial rollup before the exchange: a bucket spans whole shards
        # except at its two edges, so this emits ~n_rows/shard_size rows
        return (
            t.group_by("shard_id")
            .aggregate([("n_docs", "sum"), ("n_tokens", "sum")])
            .rename_columns(["shard_id", "n_docs", "n_tokens"])
        )

    partials = keyed.groupby(
        "bucket", num_partitions=partitions_for(n_rows)
    ).map_groups(shard_partials, batch_format="pyarrow")
    merged = partials.groupby(
        "shard_id", num_partitions=shuffle_partitions(4)
    ).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
    )
    return merged


def crawl_schedule(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Politeness-interleaved fetch schedule: a total order over the
    corpus in which two documents from the SAME source are always at
    least ``n_sources`` positions apart — the classic crawl-frontier
    round-robin (one outstanding request per host, maximal cross-host
    parallelism at any prefix of the schedule).

    position = rank_within_source * n_sources + source_index, with
    rank_within_source assigned by the SAME range-partition + driver
    prefix-sum machinery as ``global_rank`` — generalized to a per-
    (bucket, source) count matrix (buckets x sources integers on the
    driver, tiny because source cardinality is the domain count), so no
    per-source shuffle ever happens and per-task memory is one doc-id
    range slice regardless of how large a single domain is. ONE
    range-keyed exchange; the source list itself is a kilobyte distinct
    collect."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    n_rows = ds.count()  # metadata-only
    if n_rows == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "position": pa.array([], pa.int64()),
                }
            )
        )

    mm = ds.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "lo": [pc.min(b.column("doc_id")).as_py()],
                "hi": [pc.max(b.column("doc_id")).as_py()],
                "src": [b.column("source").unique().to_pylist()],
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    sources = sorted({s for r in mm for s in r["src"]})
    sidx = {s: i for i, s in enumerate(sources)}
    n_src = len(sources)
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.divide(
                pc.subtract(batch.column("doc_id"), pa.scalar(lo, pa.int64())),
                pa.scalar(width, pa.int64()),
            ),
            pa.int32(),
        )
        return batch.append_column("bucket", b)

    keyed = ds.map_batches(with_bucket, batch_format="pyarrow")

    counts = keyed.map_batches(
        lambda b: b.select(["bucket", "source"])
        .group_by(["bucket", "source"])
        .aggregate([("source", "count")])
        .rename_columns(["bucket", "source", "n"]),
        batch_format="pyarrow",
    ).take_all()
    per: dict[tuple[int, str], int] = {}
    for r in counts:
        k = (int(r["bucket"]), r["source"])
        per[k] = per.get(k, 0) + int(r["n"])
    # exclusive prefix per source across doc-id-range buckets
    offsets: dict[tuple[int, str], int] = {}
    acc: dict[str, int] = {s: 0 for s in sources}
    for b, s in sorted(per):
        offsets[(b, s)] = acc[s]
        acc[s] += per[(b, s)]
    off_ref = ray.put(offsets)

    def schedule_bucket(group: pa.Table) -> pa.Table:
        import pandas as pd

        offs = ray.get(off_ref)
        df = group.to_pandas().sort_values("doc_id", kind="stable")
        bucket = int(df["bucket"].iloc[0])
        local = df.groupby("source", sort=False).cumcount().to_numpy()
        base = df["source"].map(
            lambda s: offs.get((bucket, s), 0)
        ).to_numpy(np.int64)
        srci = df["source"].map(sidx).to_numpy(np.int64)
        pos = (local + base) * n_src + srci
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "source": pa.array(
                    df["source"].to_numpy(dtype=object), pa.string()
                ),
                "position": pa.array(pos, pa.int64()),
            }
        )

    return keyed.groupby("bucket", num_partitions=partitions_for(n_rows)).map_groups(
        schedule_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# per-group percent_rank without a global sort
# ---------------------------------------------------------------------------

_SPR_JOIN_SCHEMA = pa.schema(
    [
        ("cbucket", pa.int32()),
        ("custkey", pa.int64()),
        ("side", pa.string()),
        ("o_orderkey", pa.int64()),
        ("cents", pa.int64()),
        ("segment", pa.string()),
    ]
)
_SPR_OUT = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("c_mktsegment", pa.string()),
        ("cents", pa.int64()),
        ("pr_ppm", pa.int64()),
    ]
)


def segment_percent_rank(sf_dir: str, n_vbuckets: int = 32) -> "ray.data.Dataset":
    """SQL ``percent_rank() OVER (PARTITION BY segment ORDER BY price)``
    at scale — every order's price percentile WITHIN its market segment,
    as exact integer ppm ``10^6·(rank−1)//(n_seg−1)`` with SQL RANK tie
    semantics (ties share the first row's rank).

    Why not ``sort()``: a window function is a global sort per partition;
    this runs the ``global_rank`` recipe PER GROUP instead — value-range
    buckets composed with the group key, per-bucket counts (tiny summary)
    prefix-summed on the driver, ranks assigned bucket-locally. Ties
    can't straddle buckets because the bucket is a function of the value.

    Exchanges: one custkey join (segment attach, keys only) + one
    (segment, value-range) groupby. Driver state: one integer per
    (segment, bucket) — segments are a bounded dimension."""
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    n_rows = orders.count()
    np_ = partitions_for(n_rows)

    def order_rows(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").cast(pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(ck, pa.scalar(63, pa.int64())), pa.int32()),
                ck,
                pa.array(["o"] * batch.num_rows, pa.string()),
                batch.column("o_orderkey").cast(pa.int64()),
                cents,
                pa.array([""] * batch.num_rows, pa.string()),
            ],
            schema=_SPR_JOIN_SCHEMA,
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64())
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(ck, pa.scalar(63, pa.int64())), pa.int32()),
                ck,
                pa.array(["c"] * n, pa.string()),
                pa.array(np.zeros(n, np.int64)),
                pa.array(np.zeros(n, np.int64)),
                batch.column("c_mktsegment"),
            ],
            schema=_SPR_JOIN_SCHEMA,
        )

    seg_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("segment", pa.string()),
            ("cents", pa.int64()),
        ]
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        is_c = pc.equal(g.column("side"), "c")
        cust = g.filter(is_c)
        orow = g.filter(pc.invert(is_c))
        if cust.num_rows == 0 or orow.num_rows == 0:
            return seg_schema.empty_table()
        c_keys = cust.column("custkey").to_numpy(zero_copy_only=False)
        c_seg = np.asarray(cust.column("segment").to_pylist(), dtype=object)
        order = np.argsort(c_keys)
        c_keys, c_seg = c_keys[order], c_seg[order]
        o_keys = orow.column("custkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(c_keys, o_keys), 0, len(c_keys) - 1)
        hit = c_keys[pos] == o_keys
        kept = orow.filter(pa.array(hit))
        return pa.Table.from_arrays(
            [
                kept.column("o_orderkey"),
                pa.array(c_seg[pos[hit]], pa.string()),
                kept.column("cents"),
            ],
            schema=seg_schema,
        )

    seg_orders = (
        orders.map_batches(order_rows, batch_format="pyarrow")
        .union(customer.map_batches(cust_rows, batch_format="pyarrow"))
        .union(
            int_key_sentinels(
                _SPR_JOIN_SCHEMA, "cbucket", fill={"custkey": -1, "side": "s"}
            )
        )
        .groupby("cbucket", num_partitions=np_)
        .map_groups(join_bucket, batch_format="pyarrow")
        .materialize()  # consumed 3x: min/max pass, count pass, rank pass
    )

    mm = seg_orders.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "lo": [pc.min(b.column("cents")).as_py()],
                "hi": [pc.max(b.column("cents")).as_py()],
            }
        )
        if b.num_rows
        else pa.Table.from_pydict({"lo": [None], "hi": [None]}),
        batch_format="pyarrow",
    ).take_all()
    los = [r["lo"] for r in mm if r["lo"] is not None]
    if not los:
        return ray.data.from_arrow(_SPR_OUT.empty_table())
    lo = min(los)
    hi = max(r["hi"] for r in mm if r["hi"] is not None)
    width = max(1, (hi - lo + n_vbuckets) // n_vbuckets)

    rk_schema = pa.schema(
        [
            ("rbucket", pa.string()),
            ("o_orderkey", pa.int64()),
            ("segment", pa.string()),
            ("cents", pa.int64()),
            ("vb", pa.int64()),
        ]
    )

    def with_vbucket(batch: pa.Table) -> pa.Table:
        vb = pc.divide(
            pc.subtract(batch.column("cents"), pa.scalar(lo, pa.int64())),
            pa.scalar(width, pa.int64()),
        )
        rb = pc.binary_join_element_wise(
            batch.column("segment"), pc.cast(vb, pa.string()), "\x1f"
        )
        return pa.Table.from_arrays(
            [rb, batch.column("o_orderkey"), batch.column("segment"),
             batch.column("cents"), vb],
            schema=rk_schema,
        )

    keyed = seg_orders.map_batches(with_vbucket, batch_format="pyarrow")

    counts: dict[tuple[str, int], int] = {}
    for r in keyed.map_batches(
        lambda b: b.select(["segment", "vb"])
        .group_by(["segment", "vb"])
        .aggregate([("vb", "count")])
        .rename_columns(["segment", "vb", "n"]),
        batch_format="pyarrow",
    ).take_all():
        k = (r["segment"], int(r["vb"]))
        counts[k] = counts.get(k, 0) + int(r["n"])
    offsets: dict[tuple[str, int], int] = {}
    seg_totals: dict[str, int] = {}
    for seg, vb in sorted(counts):
        offsets[(seg, vb)] = seg_totals.get(seg, 0)
        seg_totals[seg] = seg_totals.get(seg, 0) + counts[(seg, vb)]
    off_ref = ray.put((offsets, seg_totals))

    from agentic_doc_ray.functions._exchange import str_key_sentinels

    def rank_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("o_orderkey"), 0))
        if g.num_rows == 0:
            return _SPR_OUT.empty_table()
        offs, totals = ray.get(off_ref)
        order = pc.sort_indices(
            g, sort_keys=[("cents", "ascending"), ("o_orderkey", "ascending")]
        )
        g = g.take(order)
        seg = g.column("segment")[0].as_py()
        base = offs[(seg, int(g.column("vb")[0].as_py()))]
        n_seg = totals[seg]
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        # SQL RANK tie semantics: first row index of each distinct value
        first = np.concatenate(([True], cents[1:] != cents[:-1]))
        rank = np.arange(g.num_rows, dtype=np.int64)
        rank = np.maximum.accumulate(np.where(first, rank, np.int64(-1)))
        rank = rank + base + 1
        pr = (
            1_000_000 * (rank - 1) // max(n_seg - 1, 1)
            if n_seg > 1
            else np.zeros(g.num_rows, np.int64)
        )
        return pa.Table.from_arrays(
            [
                g.column("o_orderkey"),
                g.column("segment"),
                g.column("cents"),
                pa.array(np.asarray(pr, np.int64), pa.int64()),
            ],
            schema=_SPR_OUT,
        )

    return (
        keyed.union(
            str_key_sentinels(rk_schema, "rbucket", fill={"o_orderkey": -1, "vb": 0})
        )
        .groupby("rbucket", num_partitions=np_)
        .map_groups(rank_bucket, batch_format="pyarrow")
    )
