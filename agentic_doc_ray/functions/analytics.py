"""Relational/analytic operators exercising the engine's wide-operation
patterns with exact SQL oracles: partial pre-aggregation before groupby,
broadcast hash join, and tumbling-window aggregation over an event log.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def lineitem_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-shaped aggregate with per-batch partial aggregation.

    The shuffle moves one partial row per (flag,status) per batch instead of
    600k lineitem rows — the canonical pre-aggregate pattern.
    """
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        # Sum exact scaled integers: float summation is order-dependent, so a
        # distributed sum can never hash-match a sequential oracle sum.
        # Scale by 1e4 (the product of two 2-decimal columns is an exact
        # 4-decimal quantity) so round() never lands on a .5 tie — ties are
        # where numpy half-even and DuckDB half-away diverge.
        rev_cents = pc.round(pc.multiply(revenue, pa.scalar(10000.0))).cast(pa.int64())
        t = pa.Table.from_arrays(
            [
                batch.column("l_returnflag"),
                batch.column("l_linestatus"),
                batch.column("l_quantity"),
                rev_cents,
            ],
            names=["l_returnflag", "l_linestatus", "l_quantity", "rev_cents"],
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("rev_cents", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "rev_cents", "n_rows"]
        )

    from agentic_doc_ray.context import shuffle_partitions as _cap

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(
        ["l_returnflag", "l_linestatus"], num_partitions=_cap(4)
    ).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("rev_cents", alias_name="rev_cents"),
        Sum("n_rows", alias_name="n_rows"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        rev = pc.divide(batch.column("rev_cents").cast(pa.float64()), 10000.0)
        return pa.Table.from_arrays(
            [
                batch.column("l_returnflag"),
                batch.column("l_linestatus"),
                batch.column("sum_qty"),
                rev,
                batch.column("n_rows"),
            ],
            names=["l_returnflag", "l_linestatus", "sum_qty", "sum_revenue", "n_rows"],
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def orders_by_segment(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Per-segment order totals via a bucketed custkey exchange.

    Customer is NOT a bounded dimension (it scales with SF — 15M rows at
    sf100), so it is never collected on the driver (VERDICT r02 #4): both
    sides ship keyed by ``c_custkey & (n_buckets-1)``, orders pre-aggregated
    per (batch, custkey), and each bucket group joins custkey -> segment
    with Arrow ``Table.join``, emitting per-segment partials. A final tiny
    groupby on segment merges them. Inner-join semantics: orders whose
    custkey has no customer row are dropped (matches the SQL oracle)."""
    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("custkey", pa.int64()),
            ("side", pa.string()),
            ("segment", pa.string()),
            ("cents", pa.int64()),
            ("n", pa.int64()),
        ]
    )
    n_rows = orders.count()  # metadata-only
    if n_rows == 0:  # zero-row shuffle guard
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "total_price": pa.array([], pa.float64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        )

    def _bucket(key) -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    def tag_customer(batch: pa.Table) -> pa.Table:
        key = batch.column("c_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["c"] * batch.num_rows, pa.string()),
                batch.column("c_mktsegment"),
                pa.nulls(batch.num_rows, pa.int64()),
                pa.nulls(batch.num_rows, pa.int64()),
            ],
            schema=ex_schema,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("o_custkey"), cents], names=["custkey", "cents"]
        )
        g = t.group_by("custkey").aggregate([("cents", "sum"), ("cents", "count")])
        key = g.column("custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * g.num_rows, pa.string()),
                pa.nulls(g.num_rows, pa.string()),
                g.column("cents_sum"),
                g.column("cents_count").cast(pa.int64()),
            ],
            schema=ex_schema,
        )

    def seg_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_cust = pc.equal(g.column("side"), "c")
        cust = (
            g.filter(is_cust)
            .select(["custkey", "segment"])
            .rename_columns(["custkey", "c_mktsegment"])
        )
        ords = g.filter(pc.invert(is_cust)).select(["custkey", "cents", "n"])
        if cust.num_rows == 0 or ords.num_rows == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "cents": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        m = ords.join(cust, keys="custkey", join_type="inner")
        out = m.group_by("c_mktsegment").aggregate(
            [("cents", "sum"), ("n", "sum")]
        )
        return out.rename_columns(["c_mktsegment", "cents", "n_orders"])

    unioned = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(customer.map_batches(tag_customer, batch_format="pyarrow"))
        .union(int_key_sentinels(ex_schema, "bucket", fill={"side": "sent"}))
    )
    from agentic_doc_ray.context import partitions_for as _pfor

    partials = unioned.groupby("bucket", num_partitions=_pfor(n_rows)).map_groups(
        seg_bucket, batch_format="pyarrow"
    )
    agg = partials.groupby(
        "c_mktsegment", num_partitions=_cap(4)
    ).aggregate(
        Sum("cents", alias_name="cents"),
        Sum("n_orders", alias_name="n_orders"),
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("c_mktsegment"),
                pc.divide(b.column("cents").cast(pa.float64()), 100.0),
                b.column("n_orders"),
            ],
            names=["c_mktsegment", "total_price", "n_orders"],
        ),
        batch_format="pyarrow",
    )


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour window aggregate per event_type (pre-aggregated).

    Ray Data has no event-time windows; the window key is computed
    vectorized (ts floored to the hour) and aggregated like any other key —
    the documented pattern for stream-shaped workloads.
    """
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        cents = pc.round(
            pc.multiply(batch.column("value"), pa.scalar(100.0))
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [hour, batch.column("event_type"), cents, batch.column("value")],
            names=["window_start", "event_type", "cents", "value"],
        )
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("cents", "sum"), ("cents", "count"), ("value", "min"), ("value", "max")]
        )
        return g.rename_columns(
            ["window_start", "event_type", "cents", "n_events", "min_value", "max_value"]
        )

    from agentic_doc_ray.context import shuffle_partitions as _cap

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(
        ["window_start", "event_type"], num_partitions=_cap(8)
    ).aggregate(
        Sum("cents", alias_name="cents"),
        Sum("n_events", alias_name="n_events"),
        Min("min_value", alias_name="min_value"),
        Max("max_value", alias_name="max_value"),
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("window_start"),
                b.column("event_type"),
                pc.divide(b.column("cents").cast(pa.float64()), 100.0),
                b.column("n_events"),
                b.column("min_value"),
                b.column("max_value"),
            ],
            names=[
                "window_start", "event_type", "sum_value", "n_events",
                "min_value", "max_value",
            ],
        ),
        batch_format="pyarrow",
    )


def events_sliding(sf_dir: str) -> "ray.data.Dataset":
    """Sliding 1-hour windows advancing every 15 minutes, per event_type.

    Each event belongs to exactly 4 windows: w = bucket15(ts) - k*15min for
    k in 0..3. The window assignment is computed vectorized and exploded
    in-batch, then pre-aggregated exactly like the tumbling case — no
    watermark machinery needed for a bounded log.
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        base = pc.floor_temporal(batch.column("ts"), multiple=15, unit="minute")
        cents = pc.round(
            pc.multiply(batch.column("value"), pa.scalar(100.0))
        ).cast(pa.int64())
        tables = []
        for k in range(4):
            # arrow only accepts us-resolution timedelta scalars
            w = pc.subtract(
                base, pa.scalar(np.timedelta64(15 * k * 60_000_000, "us"))
            )
            tables.append(
                pa.Table.from_arrays(
                    [w, batch.column("event_type"), cents],
                    names=["window_start", "event_type", "cents"],
                )
            )
        t = pa.concat_tables(tables)
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(["window_start", "event_type", "cents", "n_events"])

    from agentic_doc_ray.context import shuffle_partitions as _cap

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(
        ["window_start", "event_type"], num_partitions=_cap(8)
    ).aggregate(
        Sum("cents", alias_name="cents"),
        Sum("n_events", alias_name="n_events"),
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


def purchase_prior_view(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: for each purchase, the user's most recent STRICTLY prior
    view event. Shuffles on a COARSE bucket (user_id % 64, like sessionize)
    and runs ONE vectorized ``merge_asof(by="user_id")`` per bucket — never
    a per-user Python call, and the shuffle key cardinality is 64 regardless
    of user count. Purchases with no prior view are dropped (inner as-of
    semantics, matching DuckDB's ASOF JOIN oracle)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return batch.append_column("bucket", b)

    def asof(group):
        import pandas as pd

        p = group[group["event_type"] == "purchase"].sort_values("ts")
        v = group[group["event_type"] == "view"].sort_values("ts")
        if p.empty or v.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "prior_view_ts"]
            ).astype({"event_id": "int64", "user_id": "int64"})
        m = pd.merge_asof(
            p[["event_id", "user_id", "ts"]],
            v[["user_id", "ts"]].assign(prior_view_ts=v["ts"]),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        return m.dropna(subset=["prior_view_ts"])[
            ["event_id", "user_id", "ts", "prior_view_ts"]
        ]

    from agentic_doc_ray.context import shuffle_partitions as _cap

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=_cap(8))
        .map_groups(asof, batch_format="pandas")
    )


def purchase_sessions(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """INTERVAL join: each purchase event joined to the session interval
    [session_start, session_end] that contains it.

    Generic point-in-interval join shape: intervals (the sessionize
    output) and points are tagged, bucketed on the same coarse user key
    (user_id % 64), and each bucket runs ONE vectorized ``merge_asof`` on
    the interval start (backward, by user) followed by an end-bound
    filter — never a per-user or per-interval Python loop. Session
    intervals per user are disjoint, so each point matches at most once.
    """
    sessions = sessionize(sf_dir, gap_minutes=gap_minutes)
    events = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_rows = events.count()  # metadata-only; sizes the exchange width

    def tag_points(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch.column("event_type"), "purchase"))
        bucket = pc.cast(
            pc.bit_wise_and(f.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                bucket,
                pa.array(["point"] * n, pa.string()),
                f.column("user_id"),
                f.column("event_id"),
                f.column("ts"),
                pa.nulls(n, pa.timestamp("us")),
                pa.nulls(n, pa.timestamp("us")),
            ],
            names=["bucket", "side", "user_id", "event_id", "ts", "session_start", "session_end"],
        )

    def tag_intervals(batch: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                bucket,
                pa.array(["ivl"] * n, pa.string()),
                batch.column("user_id"),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.timestamp("us")),
                batch.column("session_start").cast(pa.timestamp("us")),
                batch.column("session_end").cast(pa.timestamp("us")),
            ],
            names=["bucket", "side", "user_id", "event_id", "ts", "session_start", "session_end"],
        )

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    _tag_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("side", pa.string()),
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("session_start", pa.timestamp("us")),
            ("session_end", pa.timestamp("us")),
        ]
    )
    # tag_points filters (a batch with no purchases emits a zero-row block)
    # and sessionize's map_groups re-emits empty partitions — exactly the
    # empty-first-block + empty-partition shape _exchange.py documents
    unioned = (
        events.map_batches(tag_points, batch_format="pyarrow")
        .union(sessions.map_batches(tag_intervals, batch_format="pyarrow"))
        .union(int_key_sentinels(_tag_schema, "bucket", fill={"side": "sent"}))
    )

    def join_bucket(group):
        import pandas as pd

        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
            }
        )
        if "side" not in group.columns:  # schema-less empty frame
            return empty
        group = group[group["side"] != "sent"]
        pts = group[group["side"] == "point"][["event_id", "user_id", "ts"]]
        ivl = group[group["side"] == "ivl"][
            ["user_id", "session_start", "session_end"]
        ]
        if pts.empty or ivl.empty:
            return empty
        m = pd.merge_asof(
            pts.sort_values("ts"),
            ivl.sort_values("session_start").rename(
                columns={"session_start": "_start"}
            ),
            left_on="ts",
            right_on="_start",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m[m["ts"] <= m["session_end"]].rename(columns={"_start": "session_start"})
        return m[["event_id", "user_id", "ts", "session_start", "session_end"]]

    from agentic_doc_ray.context import partitions_for as _pfor

    return unioned.groupby("bucket", num_partitions=_pfor(n_rows)).map_groups(
        join_bucket, batch_format="pandas"
    )


def distinct_users(sf_dir: str) -> "ray.data.Dataset":
    """Exact count-distinct per event_type via two-level dedup: each batch
    emits its distinct (event_type, user_id) pairs, a pair-groupby dedupes
    globally, then a tiny count per type — the exact-distinct pattern that
    shuffles unique pairs, never raw events."""
    from agentic_doc_ray.context import shuffle_partitions as _cap

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate([])
        b = pc.cast(
            pc.bit_wise_and(g["user_id"], pa.scalar(31, pa.int64())), pa.int32()
        )
        return g.append_column("bucket", b)

    def count_bucket(group: pa.Table) -> pa.Table:
        # distinct pairs within the bucket (Arrow C-speed), then per-type count
        d = group.select(["event_type", "user_id"]).group_by(
            ["event_type", "user_id"]
        ).aggregate([])
        g = d.group_by("event_type").aggregate([("user_id", "count")])
        return g.rename_columns(["event_type", "n_users"])

    from ray.data.aggregate import Sum

    counts = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "bucket", num_partitions=_cap(8)
    ).map_groups(count_bucket, batch_format="pyarrow")
    return counts.groupby(
        "event_type", num_partitions=_cap(2)
    ).aggregate(Sum("n_users", alias_name="n_users"))


def sessionize(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Session windows per user: events within gap_minutes belong to one
    session. groupby(user).map_groups over ts-sorted groups — the
    streaming-shaped pattern from the guide."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    # Coarse-bucket the shuffle (user_id % B) and sessionize ALL users of a
    # bucket in one vectorized pandas pass — per-user map_groups spends more
    # time in per-group overhead than in windowing (same lesson as the
    # reassembly merge).
    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return batch.append_column("bucket", b)

    def sessions(group):
        import numpy as np
        import pandas as pd

        g = group.sort_values(["user_id", "ts"]).reset_index(drop=True)
        g["cents"] = np.round(g["value"] * 100.0).astype("int64")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        sess = (new_user | gap).cumsum()
        out = g.groupby(sess).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "count"),
            cents=("cents", "sum"),  # exact int sum (see events_hourly)
        )
        out["sum_value"] = out.pop("cents") / 100.0
        return out.reset_index(drop=True)[
            ["user_id", "session_start", "session_end", "n_events", "sum_value"]
        ]

    from agentic_doc_ray.context import shuffle_partitions as _cap

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=_cap(8))
        .map_groups(sessions, batch_format="pandas")
    )


def funnel_counts(sf_dir: str) -> "ray.data.Dataset":
    """Ordered-funnel analysis: how many users progressed view -> click ->
    purchase, each stage STRICTLY after the previous one (the classic
    product-analytics sequence query; ref has no counterpart — this is an
    engine capability for event-log corpora).

    Shape: one exchange on a coarse user bucket (user_id % 64, the
    sessionize pattern) — a user's whole history co-locates, then each
    bucket computes the per-user first-time chain with three vectorized
    groupby-min passes (no per-user Python). Only (stage, n_users)
    partials leave the buckets; the final stage groupby moves <=
    3 rows x buckets.
    """
    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    stages = ["view", "click", "purchase"]

    tag_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_type", pa.string()),
        ]
    )

    def tag(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.is_in(batch.column("event_type"), value_set=pa.array(stages)))
        bucket = pc.cast(
            pc.bit_wise_and(f.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [bucket, f.column("user_id"), f.column("ts").cast(pa.timestamp("us")), f.column("event_type")],
            schema=tag_schema,
        )

    def funnel_bucket(group: pa.Table) -> pa.Table:
        # drop sentinels (user_id=-1), then chain three groupby-mins:
        # t1 = first view; t2 = first click after t1; t3 = first purchase
        # after t2 — all vectorized pandas merges, never a per-user loop.
        g = group.filter(pc.greater_equal(group.column("user_id"), 0)).to_pandas()
        cur = None
        counts = []
        for stage in stages:
            ev = g[g["event_type"] == stage][["user_id", "ts"]]
            if cur is not None:
                ev = ev.merge(cur, on="user_id")
                ev = ev[ev["ts"] > ev["prev"]]
            cur = ev.groupby("user_id", as_index=False)["ts"].min().rename(
                columns={"ts": "prev"}
            )
            counts.append(len(cur))
        return pa.Table.from_pydict(
            {
                "stage": pa.array(
                    ["1_view", "2_view_click", "3_view_click_purchase"], pa.string()
                ),
                "n_users": pa.array(counts, pa.int64()),
            }
        )

    partials = (
        ds.map_batches(tag, batch_format="pyarrow")
        # event_type filter can empty blocks -> empty-first-block guard;
        # sentinel user_id=-1 rows are dropped in funnel_bucket
        .union(int_key_sentinels(tag_schema, "bucket", fill={"user_id": -1, "event_type": ""}))
        .groupby("bucket", num_partitions=_cap(8))
        .map_groups(funnel_bucket, batch_format="pyarrow")
    )
    np_ = _cap(4)
    return partials.groupby(
        "stage", num_partitions=np_
    ).aggregate(Sum("n_users", alias_name="n_users"))


def cohort_retention(sf_dir: str) -> "ray.data.Dataset":
    """Weekly cohort retention matrix: (cohort_week, week_offset,
    n_users) — of the users whose FIRST event fell in cohort_week (ISO
    Monday), how many were active again week_offset weeks later. The
    standard growth-analytics rollup; the reference has no counterpart —
    engine capability for event-log corpora.

    Shape: ONE exchange on a coarse user bucket (user_id % 64, the
    sessionize/funnel pattern). Distinct-user counting distributes
    exactly because the bucket key is a function of user_id — buckets
    partition the user set, so per-bucket distinct counts are disjoint
    partials and the final tiny groupby just sums them (no global
    distinct pass, no second shuffle of event rows). Inside a bucket:
    vectorized pandas — distinct (user, week), per-user min week, merge,
    integer week offsets.
    """
    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    tag_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
        ]
    )

    def tag(batch: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [
                bucket.combine_chunks()
                if isinstance(bucket, pa.ChunkedArray)
                else bucket,
                batch.column("user_id").combine_chunks(),
                batch.column("ts").cast(pa.timestamp("us")).combine_chunks(),
            ],
            schema=tag_schema,
        )

    part_schema = pa.schema(
        [
            ("cohort_week", pa.string()),
            ("week_offset", pa.int64()),
            ("n_users", pa.int64()),
        ]
    )

    def retention_bucket(group: pa.Table) -> pa.Table:
        import pandas as pd

        g = group.filter(
            pc.greater_equal(group.column("user_id"), 0)
        ).to_pandas()
        if not len(g):
            return part_schema.empty_table()
        # ISO-Monday week start == DuckDB date_trunc('week', ts)
        g["w"] = g["ts"].dt.normalize() - pd.to_timedelta(
            g["ts"].dt.weekday, unit="D"
        )
        weeks = g[["user_id", "w"]].drop_duplicates()
        firsts = (
            weeks.groupby("user_id", as_index=False)["w"]
            .min()
            .rename(columns={"w": "cohort"})
        )
        j = weeks.merge(firsts, on="user_id")
        j["week_offset"] = ((j["w"] - j["cohort"]).dt.days // 7).astype(
            "int64"
        )
        # one row per (user, week) -> size() IS the bucket-local distinct
        part = j.groupby(["cohort", "week_offset"], as_index=False).size()
        return pa.Table.from_arrays(
            [
                pa.array(
                    part["cohort"].dt.strftime("%Y-%m-%d").tolist(),
                    pa.string(),
                ),
                pa.array(part["week_offset"].to_numpy(), pa.int64()),
                pa.array(part["size"].to_numpy(), pa.int64()),
            ],
            schema=part_schema,
        )

    partials = (
        ds.map_batches(tag, batch_format="pyarrow")
        .union(int_key_sentinels(tag_schema, "bucket", fill={"user_id": -1}))
        .groupby("bucket", num_partitions=_cap(8))
        .map_groups(retention_bucket, batch_format="pyarrow")
    )
    np_ = _cap(4)
    return partials.groupby(
        ["cohort_week", "week_offset"], num_partitions=np_
    ).aggregate(Sum("n_users", alias_name="n_users"))


def user_event_paths(sf_dir: str) -> "ray.data.Dataset":
    """Per-user ordered event-path string (distributed ``string_agg(...
    ORDER BY ts, event_id)``): the ordered-collect operator behind
    clickstream/session-sequence mining.

    Shape: one exchange on a coarse user bucket (``user_id % 64`` — the
    sessionize/funnel pattern, bounded key cardinality regardless of user
    count); inside each bucket everything is Arrow kernels — ``sort_by``
    on (user_id, ts, event_id), a single-threaded grouped ``list``
    aggregation (scan order == sort order), and ``pc.binary_join`` to fold
    each user's list into one string. No per-user Python call anywhere.
    Output is one row per user; a user's history is co-located by the
    bucket exchange, never split across partitions.
    """
    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    tag_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
        ]
    )

    def tag(batch: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [
                bucket,
                batch.column("user_id"),
                batch.column("ts").cast(pa.timestamp("us")),
                batch.column("event_id"),
                batch.column("event_type"),
            ],
            schema=tag_schema,
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("path", pa.string()),
            ("n_events", pa.int64()),
        ]
    )

    def paths_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("user_id"), 0))
        if g.num_rows == 0:
            return out_schema.empty_table()
        t = g.sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        # use_threads=False pins the grouped `list` aggregation to scan
        # order, so each user's list is exactly the (ts, event_id) order
        agg = pa.TableGroupBy(t, "user_id", use_threads=False).aggregate(
            [("event_type", "list")]
        )
        lists = agg.column("event_type_list").combine_chunks()
        return pa.Table.from_arrays(
            [
                agg.column("user_id").combine_chunks().cast(pa.int64()),
                pc.binary_join(lists, ">"),
                pc.list_value_length(lists).cast(pa.int64()),
            ],
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        # empty-first-block guard; sentinel user_id=-1 rows dropped above
        .union(
            int_key_sentinels(
                tag_schema, "bucket", fill={"user_id": -1, "event_type": ""}
            )
        )
        .groupby("bucket", num_partitions=_cap(8))
        .map_groups(paths_bucket, batch_format="pyarrow")
    )


def order_priority_status_rollup(sf_dir: str) -> "ray.data.Dataset":
    """Multi-level ROLLUP aggregate — exact revenue cents + order counts at
    (priority, status), (priority, ALL) and (ALL, ALL) levels in ONE pass.

    The rollup levels are derived per batch from the level-0 partial (a
    few rows), so the shuffle moves three tiny partial tables per batch
    and the input is scanned once — the partial-aggregation pattern
    extended to grouping sets. Exact integer cents keep sums
    order-independent and hash-matchable against DuckDB's GROUP BY ROLLUP.
    """
    from agentic_doc_ray.context import shuffle_partitions as _cap

    ds = _read(
        sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    rollup_schema = pa.schema(
        [
            ("priority", pa.string()),
            ("status", pa.string()),
            ("cents", pa.int64()),
            ("n_orders", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return rollup_schema.empty_table()
        cents = pc.round(
            pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [
                batch.column("o_orderpriority"),
                batch.column("o_orderstatus"),
                cents,
            ],
            names=["priority", "status", "cents"],
        )
        lvl0 = t.group_by(["priority", "status"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        lvl0 = lvl0.rename_columns(["priority", "status", "cents", "n_orders"])
        lvl1 = (
            lvl0.group_by("priority")
            .aggregate([("cents", "sum"), ("n_orders", "sum")])
            .rename_columns(["priority", "cents", "n_orders"])
        )
        lvl1 = lvl1.add_column(
            1, "status", pa.array(["ALL"] * lvl1.num_rows, pa.string())
        )
        lvl2 = pa.Table.from_pydict(
            {
                "priority": pa.array(["ALL"], pa.string()),
                "status": pa.array(["ALL"], pa.string()),
                "cents": pa.array(
                    [int(pc.sum(lvl0.column("cents")).as_py())], pa.int64()
                ),
                "n_orders": pa.array(
                    [int(pc.sum(lvl0.column("n_orders")).as_py())], pa.int64()
                ),
            }
        )
        cols = ["priority", "status", "cents", "n_orders"]
        return pa.concat_tables(
            [lvl0.select(cols), lvl1.select(cols), lvl2.select(cols)]
        )

    np_ = _cap(4)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["priority", "status"], num_partitions=np_)
        .aggregate(
            Sum("cents", alias_name="cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(sf_dir: str) -> "ray.data.Dataset":
    """Long -> wide pivot: one row per user with a count column per event
    type (conditional aggregation — the fixed-column pivot a feature
    pipeline feeds to a model).

    Per batch, each event type becomes a 0/1 mask column and ONE Arrow
    group_by emits per-user partial counts; the global groupby then moves
    at most one row per user per batch. No row ever carries its event
    payload through the shuffle.
    """
    from agentic_doc_ray.context import shuffle_partitions as _cap

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        cols = [batch.column("user_id")]
        names = ["user_id"]
        for et in _EVENT_TYPES:
            cols.append(
                pc.equal(batch.column("event_type"), pa.scalar(et)).cast(
                    pa.int64()
                )
            )
            names.append(f"n_{et}")
        t = pa.Table.from_arrays(cols, names=names)
        g = t.group_by("user_id").aggregate(
            [(f"n_{et}", "sum") for et in _EVENT_TYPES]
        )
        return g.rename_columns(["user_id"] + [f"n_{et}" for et in _EVENT_TYPES])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id", num_partitions=_cap(8))
        .aggregate(
            *[Sum(f"n_{et}", alias_name=f"n_{et}") for et in _EVENT_TYPES]
        )
    )


def event_value_histogram(sf_dir: str, bin_cents: int = 1000) -> "ray.data.Dataset":
    """Fixed-width histogram over ``events.value`` with EXACT integer bin
    edges: cents = round(value*100), bin = cents // bin_cents — integer
    arithmetic end-to-end, so bin membership is order- and float-safe and
    the result hash-matches SQL exactly.

    Per-batch partials reduce each batch to one row per occupied bin;
    the groupby moves a bounded-cardinality table regardless of row count.
    """
    from agentic_doc_ray.context import shuffle_partitions as _cap

    ds = _read(sf_dir, "events", ["value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(batch.column("value"), pa.scalar(100.0))
        ).cast(pa.int64())
        bins = np.asarray(cents) // bin_cents
        t = pa.Table.from_arrays([pa.array(bins, pa.int64())], names=["bin"])
        g = t.group_by("bin").aggregate([("bin", "count")])
        return g.rename_columns(["bin", "n_events"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin", num_partitions=_cap(4))
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


def priority_revenue_share(sf_dir: str) -> pa.Table:
    """Percent-of-total: each priority's share of exact total revenue
    cents. Two-phase: streamed partial aggregation collapses the input to
    one row per priority (5 rows on the driver — constant, not
    data-sized), then the share divides exact int64 cents in float64 —
    bit-identical to SQL's ``cents / sum(cents) OVER ()`` on the same
    ints.
    """
    from agentic_doc_ray.context import shuffle_partitions as _cap

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("o_orderpriority"), cents],
            names=["priority", "cents"],
        )
        g = t.group_by("priority").aggregate([("cents", "sum")])
        return g.rename_columns(["priority", "cents"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("priority", num_partitions=_cap(4))
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("priority")
        .reset_index(drop=True)
    )
    total = int(agg["cents"].sum())
    return pa.Table.from_pydict(
        {
            "priority": pa.array(agg["priority"], pa.string()),
            "cents": pa.array(agg["cents"].astype("int64"), pa.int64()),
            "share": pa.array(
                (agg["cents"].astype("int64") / total).astype("float64"),
                pa.float64(),
            ),
        }
    )


def pruned_revenue_scan(
    sf_dir: str,
    date_from: str = "1997-01-01",
    date_to: str = "1997-07-01",
) -> "ray.data.Dataset":
    """Revenue per returnflag for one shipdate window, with the predicate
    pushed INTO the parquet read (``read_parquet(filter=...)``): PyArrow
    prunes row groups by their min/max statistics, so on a date-sorted
    100-TB lineitem only the window's row groups leave storage — the
    "prune at the read" rule as an explicit, oracle-checked operator
    (every other query here pushes ``columns=``; this one also pushes
    the row filter). Downstream: per-batch integer-cents partials and a
    3-row groupby — exchange payload is O(flags), not O(rows).
    """
    import numpy as np
    import pyarrow.dataset as pads

    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    lo = pads.field("l_shipdate") >= pa.scalar(np.datetime64(date_from, "us"))
    hi = pads.field("l_shipdate") < pa.scalar(np.datetime64(date_to, "us"))
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_discount"],
        filter=lo & hi,
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(
                pc.multiply(
                    batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                ),
                pa.scalar(10000.0),
            )
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("l_returnflag"), cents], names=["l_returnflag", "cents"]
        )
        return (
            t.group_by("l_returnflag")
            .aggregate([("cents", "sum")])
            .rename_columns(["l_returnflag", "cents"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag", num_partitions=shuffle_partitions(2))
        .aggregate(Sum("cents", alias_name="cents"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("l_returnflag"),
                pc.divide(b.column("cents").cast(pa.float64()), 10000.0),
            ],
            names=["l_returnflag", "revenue"],
        ),
        batch_format="pyarrow",
    )


def event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Per-user next-event Markov transition counts: for every user's
    event history ordered by (ts, event_id), how often does event type A
    immediately precede event type B — the first-order behavioral model
    behind next-action prediction and anomaly scoring on clickstreams
    (the reference has no counterpart; engine capability for event-log
    corpora).

    Shape: ONE exchange on a coarse user bucket (user_id % 64, the
    sessionize/funnel pattern) co-locates each user's history; inside a
    bucket a single vectorized pandas pass (sort + shift + same-user
    mask) counts the bucket's (prev, next) pairs, so only
    |event_type|^2 partial rows per bucket leave for the tiny final
    groupby. Adjacent pairs never cross buckets because the bucket key
    is a function of user_id alone."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    tag_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
        ]
    )

    def tag(batch: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [
                bucket,
                batch.column("user_id"),
                batch.column("ts"),
                batch.column("event_id"),
                batch.column("event_type"),
            ],
            schema=tag_schema,
        )

    part_schema = pa.schema(
        [
            ("prev_event", pa.string()),
            ("next_event", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def transitions_bucket(group: pa.Table) -> pa.Table:
        import pandas as pd

        g = group.filter(pc.greater_equal(group.column("user_id"), 0))
        if g.num_rows == 0:
            return part_schema.empty_table()
        df = (
            g.select(["user_id", "ts", "event_id", "event_type"])
            .to_pandas()
            .sort_values(["user_id", "ts", "event_id"])
        )
        same_user = df["user_id"].eq(df["user_id"].shift())
        prev_type = df["event_type"].shift()
        pairs = (
            pd.DataFrame(
                {
                    "prev_event": prev_type[same_user],
                    "next_event": df["event_type"][same_user],
                }
            )
            .groupby(["prev_event", "next_event"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(pairs, schema=part_schema, preserve_index=False)

    partials = (
        ds.map_batches(tag, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                tag_schema, "bucket", fill={"user_id": -1, "event_type": ""}
            )
        )
        .groupby("bucket", num_partitions=_cap(8))
        .map_groups(transitions_bucket, batch_format="pyarrow")
    )
    return partials.groupby(
        ["prev_event", "next_event"], num_partitions=_cap(4)
    ).aggregate(Sum("n", alias_name="n_pairs"))


_BASKET_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("l_orderkey", pa.int64()),
        ("l_partkey", pa.int64()),
    ]
)


def copurchase_pairs(
    sf_dir: str, k: int = 100, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Market-basket co-purchase support counts — the first pass of
    A-Priori frequent-itemset mining and the co-visitation matrix behind
    "bought together" recommendation: for every unordered pair of parts
    appearing on the SAME order, in how many orders do they co-occur;
    deterministic (support DESC, part_a, part_b) top-k.

    Shape: in-batch distinct (order, part) first, then ONE
    ``hash(l_orderkey)`` bucket exchange co-locates each order's basket
    (pairs never cross orders, so the bucket key is a function of the
    order alone); inside a bucket the degree-class-matrix pair generator
    from the triangle pipeline (``graph._wedge_pairs``) emits every
    basket's pairs with no per-order Python loop, and per-bucket partial
    counts mean the final pair ``groupby`` sees one row per distinct pair
    per bucket. Baskets are small (TPC-H ≤ 7 lines; retail ~10s), so the
    per-bucket pair blowup is bounded by ``max_basket^2/2`` per order."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import partitions_for, shuffle_partitions
    from agentic_doc_ray.functions._exchange import int_key_sentinels
    from agentic_doc_ray.functions.graph import _wedge_pairs

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    np_ = partitions_for(ds.count())

    def tag(batch: pa.Table) -> pa.Table:
        # in-batch distinct before the exchange
        t = (
            batch.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        bucket = pc.cast(
            pc.bit_wise_and(
                t.column("l_orderkey"), pa.scalar(n_buckets - 1, pa.int64())
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [bucket, t.column("l_orderkey"), t.column("l_partkey")],
            schema=_BASKET_SCHEMA,
        )

    part_schema = pa.schema(
        [
            ("pbucket", pa.int32()),
            ("part_a", pa.int64()),
            ("part_b", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def pairs_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("l_orderkey"), 0))
        if g.num_rows == 0:
            return part_schema.empty_table()
        # global distinct within the bucket (an order's lines can span
        # input batches), then sorted runs feed the pair generator
        g = (
            g.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        order = pc.sort_indices(
            g,
            sort_keys=[("l_orderkey", "ascending"), ("l_partkey", "ascending")],
        )
        g = g.take(order)
        apex = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        nb = g.column("l_partkey").to_numpy(zero_copy_only=False)
        x, y, _ = _wedge_pairs(apex, nb)
        if len(x) == 0:
            return part_schema.empty_table()
        t = pa.table(
            {"part_a": pa.array(x, pa.int64()), "part_b": pa.array(y, pa.int64())}
        )
        t = (
            t.group_by(["part_a", "part_b"])
            .aggregate([("part_a", "count")])
            .rename_columns(["part_a", "part_b", "n"])
        )
        # route every copy of a pair to one merge bucket (a pure function
        # of the pair), so the merge's local top-k is globally correct
        pb = pc.cast(
            pc.bit_wise_and(
                pc.bit_wise_xor(
                    t.column("part_a"),
                    pc.multiply(t.column("part_b"), pa.scalar(0x9E3779B9, pa.int64())),
                ),
                pa.scalar(63, pa.int64()),
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [pb, t.column("part_a"), t.column("part_b"), t.column("n").cast(pa.int64())],
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("part_a", pa.int64()), ("part_b", pa.int64()), ("support", pa.int64())]
    )

    def merge_bucket(group: pa.Table) -> pa.Table:
        # Arrow-vectorized sum per pair (Ray's per-group hash aggregate
        # costs ~60us/distinct group; 1.2M distinct pairs at sf0.1 made
        # that path the 20s hot spot), then the IN-BUCKET top-k: the
        # deterministic total order (support desc, a, b) distributes over
        # pair-disjoint buckets, so the global merge sees <= 64*k rows
        g = group.filter(pc.greater_equal(group.column("part_a"), 0))
        if g.num_rows == 0:
            return out_schema.empty_table()
        agg = (
            g.select(["part_a", "part_b", "n"])
            .group_by(["part_a", "part_b"])
            .aggregate([("n", "sum")])
            .rename_columns(["part_a", "part_b", "support"])
        )
        order = pc.sort_indices(
            agg,
            sort_keys=[
                ("support", "descending"),
                ("part_a", "ascending"),
                ("part_b", "ascending"),
            ],
        )
        return agg.take(order[: min(k, len(order))]).cast(out_schema)

    topk_parts = (
        ds.map_batches(tag, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                _BASKET_SCHEMA, "bucket", fill={"l_orderkey": -1, "l_partkey": -1}
            )
        )
        .groupby("bucket", num_partitions=np_)
        .map_groups(pairs_bucket, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                part_schema, "pbucket", fill={"part_a": -1, "part_b": -1, "n": 0}
            )
        )
        .groupby("pbucket", num_partitions=shuffle_partitions(8))
        .map_groups(merge_bucket, batch_format="pyarrow")
    )
    return topk_parts.sort(
        ["support", "part_a", "part_b"], descending=[True, False, False]
    ).limit(k)


def _daily_order_cents(sf_dir: str) -> "tuple[np.ndarray, np.ndarray]":
    """Exact (day_num, cents) daily revenue rollup, sorted by day —
    per-batch partials through one tiny exchange, collected bounded by
    DISTINCT DAYS (independent of row count). Shared by the
    moving-average and change-point scans."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            batch.column("o_orderdate").cast(pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        return (
            pa.Table.from_arrays([day, cents], names=["day_num", "c"])
            .group_by("day_num")
            .aggregate([("c", "sum")])
            .rename_columns(["day_num", "c"])
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day_num", num_partitions=shuffle_partitions(4))
        .aggregate(Sum("c", alias_name="day_cents"))
        .take_all()
    )
    daily.sort(key=lambda r: r["day_num"])
    days = np.array([r["day_num"] for r in daily], dtype=np.int64)
    cents = np.array([r["day_cents"] for r in daily], dtype=np.int64)
    return days, cents


def revenue_changepoint(sf_dir: str) -> "ray.data.Dataset":
    """Exact CUSUM change-point of the daily-revenue series: the day that
    maximizes ``|n*CS_i - i*S_n|`` (the cross-multiplied deviation of the
    running sum from a uniform-rate line — n^2 x the classic CUSUM
    statistic, so no division and no floats), earliest day on ties. The
    did-the-distribution-shift gate on any monitored stream (crawl
    volume, revenue, error rates).

    Same sketch-then-finish shape as ``revenue_moving_avg``: rows fold to
    the per-day table through one tiny exchange; the scan over ~2.4k days
    runs in Python ints on the driver — exact at any scale."""
    days, cents = _daily_order_cents(sf_dir)
    empty = pa.table(
        {
            "split_day_num": pa.array([], pa.int64()),
            "d_value": pa.array([], pa.int64()),
            "n_days": pa.array([], pa.int64()),
            "total_cents": pa.array([], pa.int64()),
        }
    )
    if len(days) == 0:
        return ray.data.from_arrow(empty)
    n = len(days)
    s_n = int(cents.sum())
    best_day, best_d, cs = None, None, 0
    for i in range(n):  # ~2.4k iterations of Python-int math: driver-scale
        cs += int(cents[i])
        d = n * cs - (i + 1) * s_n
        if best_d is None or abs(d) > abs(best_d):
            best_day, best_d = int(days[i]), d
    return ray.data.from_arrow(
        pa.table(
            {
                "split_day_num": pa.array([best_day], pa.int64()),
                "d_value": pa.array([best_d], pa.int64()),
                "n_days": pa.array([n], pa.int64()),
                "total_cents": pa.array([s_n], pa.int64()),
            }
        )
    )


def revenue_moving_avg(sf_dir: str, window_days: int = 7) -> "ray.data.Dataset":
    """Trailing ``window_days``-row moving average of daily order revenue
    in exact integer cents — the smoothed-demand curve behind forecast
    dashboards, computed sketch-then-scan: per-batch (day, cents)
    partials, ONE tiny ``groupby(day)`` exchange, then the rollup —
    bounded by the number of DISTINCT DAYS (~2.4k for seven years,
    independent of row count) — finishes on the driver with one exact
    int64 cumsum. The window is over existing days in day order (ROWS,
    not RANGE — matching the SQL oracle's ``ROWS BETWEEN n PRECEDING``).

    ``avg_cents`` is floor integer division of the window sum by the
    window row count. int64 cumsum overflows only past ~9e16 total cents
    (a quadrillion dollars) — asserted, not assumed."""
    days, cents = _daily_order_cents(sf_dir)
    total = int(cents.sum())
    assert total < (1 << 62), "cumsum overflow guard"
    cs = np.concatenate(([0], np.cumsum(cents)))
    idx = np.arange(len(days), dtype=np.int64)
    lo = np.maximum(0, idx - (window_days - 1))
    win_cents = cs[idx + 1] - cs[lo]
    win_days = idx + 1 - lo
    return ray.data.from_arrow(
        pa.table(
            {
                "day_num": pa.array(days),
                "day_cents": pa.array(cents),
                "win_cents": pa.array(win_cents),
                "win_days": pa.array(win_days),
                "avg_cents": pa.array(win_cents // win_days),
            }
        )
    )


_SCD2_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("event_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
    ]
)


def scd2_history(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Slowly-changing-dimension type-2 history builder over the event
    change stream — the lakehouse dimension-table pattern (Kimball SCD2,
    Delta/Iceberg MERGE's historical sibling): every event opens a
    validity interval ``[valid_from, valid_to)`` on its user's timeline;
    ``valid_to`` is the next event's timestamp (NULL for the current
    row), ``version`` is the 1-based position in (ts, event_id) order.

    ONE exchange on a coarse user bucket (the sessionize/transitions
    pattern — intervals never cross users, so the bucket key is a
    function of user_id alone); inside a bucket a single vectorized
    sort + shift computes every user's lead timestamps. Value is carried
    as exact integer cents."""
    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"]
    )
    np_ = partitions_for(ds.count())

    def tag(batch: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.bit_wise_and(
                batch.column("user_id"), pa.scalar(n_buckets - 1, pa.int64())
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [
                bucket,
                batch.column("user_id"),
                batch.column("ts"),
                batch.column("event_id"),
                batch.column("event_type"),
                batch.column("value"),
            ],
            schema=_SCD2_SCHEMA,
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("version", pa.int64()),
            ("valid_from", pa.timestamp("us")),
            ("valid_to", pa.timestamp("us")),
            ("event_type", pa.string()),
            ("value_cents", pa.int64()),
        ]
    )

    def history_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("user_id"), 0))
        if g.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = g.take(order)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(uid)
        # version: 1-based rank within each user run
        starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        version = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate((starts, [n])))
        ) + 1
        # lead(ts) within user: next row's ts unless the user changes
        lead = np.empty(n, np.int64)
        lead[:-1] = ts[1:]
        lead[-1] = 0
        last_of_user = np.concatenate((uid[1:] != uid[:-1], [True]))
        valid_to = pc.if_else(
            pa.array(last_of_user),
            pa.nulls(n, pa.timestamp("us")),
            pa.array(lead, pa.int64()).cast(pa.timestamp("us")),
        )
        cents = pc.cast(
            pc.round(pc.multiply(g.column("value"), pa.scalar(100.0))), pa.int64()
        )
        return pa.Table.from_arrays(
            [
                g.column("user_id"),
                pa.array(version),
                g.column("ts"),
                valid_to,
                g.column("event_type"),
                cents,
            ],
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                _SCD2_SCHEMA, "bucket", fill={"user_id": -1, "event_type": ""}
            )
        )
        .groupby("bucket", num_partitions=np_)
        .map_groups(history_bucket, batch_format="pyarrow")
    )


def qty_discount_covariance(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-group covariance moments of (quantity, discount) by
    return flag — the do-big-discounts-move-volume signal, computed as
    EXACT integers: per flag, ``n``, ``sum_q`` (integral quantities),
    ``sum_d`` (discount in whole percent points — the data lives on the
    0.01 grid), ``sum_qd``, and the covariance numerator
    ``cov_num = n*sum_qd - sum_q*sum_d`` (``n^2 * covariance``; the
    caller divides, or compares sign/ratio exactly).

    Shape is the cheapest possible: per-batch integer partials (one row
    per flag per batch) -> a 3-row ``groupby`` -> the numerator computed
    on the driver-scale result with PYTHON ints, so the cross-multiply
    cannot overflow int64 even at 10^12 rows (the per-batch int64
    partials are safe: q <= 50, d <= 10, so sum_qd grows at <= 500/row).
    No exchange carries more than |flags| x blocks rows.
    """
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(batch.column("l_quantity")), pa.int64())
        d = pc.cast(
            pc.round(pc.multiply(batch.column("l_discount"), pa.scalar(100.0))),
            pa.int64(),
        )
        t = pa.Table.from_arrays(
            [
                batch.column("l_returnflag"),
                q,
                d,
                pc.multiply(q, d),
                pa.array(np.ones(batch.num_rows, np.int64)),
            ],
            names=["l_returnflag", "q", "d", "qd", "one"],
        )
        return (
            t.group_by("l_returnflag")
            .aggregate(
                [("q", "sum"), ("d", "sum"), ("qd", "sum"), ("one", "sum")]
            )
            .rename_columns(["l_returnflag", "q", "d", "qd", "one"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag", num_partitions=shuffle_partitions(2))
        .aggregate(
            Sum("q", alias_name="sum_q"),
            Sum("d", alias_name="sum_d"),
            Sum("qd", alias_name="sum_qd"),
            Sum("one", alias_name="n"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()  # <= |flags| rows: driver-scale math
        for r in rows:
            # Python ints: exact at any scale (int64 would overflow the
            # cross-multiply around 10^9 rows/group)
            r["cov_num"] = int(r["n"]) * int(r["sum_qd"]) - int(r["sum_q"]) * int(
                r["sum_d"]
            )
        out = pa.Table.from_pylist(rows)
        return out.select(
            ["l_returnflag", "n", "sum_q", "sum_d", "sum_qd", "cov_num"]
        ).cast(
            pa.schema(
                [
                    ("l_returnflag", pa.string()),
                    ("n", pa.int64()),
                    ("sum_q", pa.int64()),
                    ("sum_d", pa.int64()),
                    ("sum_qd", pa.int64()),
                    ("cov_num", pa.int64()),
                ]
            )
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def forecast_revenue(
    sf_dir: str,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> "ray.data.Dataset":
    """TPC-H Q6 shape: forecast-revenue-change scan — ONE summary row of
    ``sum(l_extendedprice * l_discount)`` over a shipdate year for lines
    with a small discount and quantity (ref parity: the reference's
    "aggregate everything" scans are per-document; this is the relational
    analogue at corpus scale).

    The cheapest possible plan shape: the date window is pushed INTO the
    parquet read (row-group pruning, as ``pruned_revenue_scan``), the
    discount/quantity predicate and exact integer-cents products run
    vectorized per batch, and only ONE partial row per batch reaches the
    single-task fold — no hash exchange at all. Discount bounds compare
    against the same float64 literals DuckDB parses, so the predicate is
    bit-identical on both sides; cents are exact 4-decimal integers
    (price × discount is a 4-decimal quantity).
    """
    import pyarrow.dataset as pads

    lo = pads.field("l_shipdate") >= pa.scalar(np.datetime64(date_from, "us"))
    hi = pads.field("l_shipdate") < pa.scalar(np.datetime64(date_to, "us"))
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
        filter=lo & hi,
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc = batch.column("l_discount")
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(disc, pa.scalar(disc_lo)),
                pc.less_equal(disc, pa.scalar(disc_hi)),
            ),
            pc.less(batch.column("l_quantity"), pa.scalar(max_qty)),
        )
        t = batch.filter(keep)
        cents = pc.round(
            pc.multiply(
                pc.multiply(t.column("l_extendedprice"), t.column("l_discount")),
                pa.scalar(10000.0),
            )
        ).cast(pa.int64())
        return pa.table(
            {
                "cents": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        cents = pc.sum(batch.column("cents")).as_py() or 0
        n = pc.sum(batch.column("n")).as_py() or 0
        return pa.table(
            {
                "forecast_cents": pa.array([cents], pa.int64()),
                "forecast_revenue": pa.array([cents / 10000.0], pa.float64()),
                "n_lines": pa.array([n], pa.int64()),
            }
        )

    # batch partials are one row each; fold them in one tiny task
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# exact second-moment statistics: 3-sigma outliers and OLS trend
# ---------------------------------------------------------------------------


def _cents(col) -> "pa.Array":
    c = pc.round(pc.multiply(col, pa.scalar(100.0))).cast(pa.int64())
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def event_outliers(sf_dir: str) -> "ray.data.Dataset":
    """Events whose value exceeds their event-type group's mean + 3
    standard deviations — the classic heavy-tail anomaly flag, EXACT.

    The test  x > mean + 3*sigma  is evaluated with zero divisions or
    roots via cross-multiplication:  (x*n - S) > 0  and  (x*n - S)^2 >
    9*(n*Q - S^2)  where S = sum(cents), Q = sum(cents^2), x in exact
    integer cents. Q can overflow int64 at crawl scale, so per-batch
    partials carry Q SPLIT into three int64 accumulators (hi^2, hi*lo,
    lo^2 of the 16-bit limb split) that recombine into one exact Python
    int per GROUP — O(groups) unbounded integers, never per row. The
    per-row inequality runs vectorized in float64 with a certified
    margin (float error at these magnitudes is orders below the 1e12
    margin) and only margin-ambiguous rows — none in practice —
    re-check in exact Python ints. Sketch-then-filter shape: ONE tiny
    stats exchange (<= groups x batches partial rows), the event rows
    themselves never shuffle.

    Scale note: group count is the event_type cardinality; the
    driver-side stats table is |event_type| rows regardless of SF.
    """
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("value")).to_numpy()
        hi, lo = cents >> 16, cents & 0xFFFF
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": np.ones(len(cents), np.int64),
                "s": cents,
                "qhh": hi * hi,
                "qhl": hi * lo,
                "qll": lo * lo,
            }
        )
        return (
            t.group_by("event_type")
            .aggregate(
                [("n", "sum"), ("s", "sum"), ("qhh", "sum"), ("qhl", "sum"), ("qll", "sum")]
            )
            .rename_columns(["event_type", "n", "s", "qhh", "qhl", "qll"])
        )

    stats_rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("qhh", alias_name="qhh"),
            Sum("qhl", alias_name="qhl"),
            Sum("qll", alias_name="qll"),
        )
        .take_all()
    )
    # exact Q recombination: O(groups) Python ints (the only unbounded-width
    # arithmetic, never per row)
    stats = {
        r["event_type"]: (
            int(r["n"]),
            int(r["s"]),
            (int(r["qhh"]) << 32) + (int(r["qhl"]) << 17) + int(r["qll"]),
        )
        for r in stats_rows
    }

    def flag(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cents = _cents(batch.column("value")).to_numpy()
        types = batch.column("event_type").to_pandas()
        n = types.map({k: v[0] for k, v in stats.items()}).to_numpy(np.int64)
        s = types.map({k: v[1] for k, v in stats.items()}).to_numpy(np.int64)
        q = types.map({k: float(v[2]) for k, v in stats.items()}).to_numpy(
            np.float64
        )
        types = types.to_numpy(dtype=object)
        lhs_i = cents * n - s  # int64-exact
        lhs = lhs_i.astype(np.float64) ** 2
        rhs = n.astype(np.float64) * q - s.astype(np.float64) ** 2
        rhs *= 9.0
        keep = (lhs_i > 0) & (lhs > rhs + 1e12)
        ambiguous = (lhs_i > 0) & ~keep & (lhs > rhs - 1e12)
        if ambiguous.any():
            for i in np.nonzero(ambiguous)[0]:
                ni, si, qi = stats[types[i]]
                li = int(cents[i]) * ni - si
                keep[i] = li > 0 and li * li > 9 * (ni * qi - si * si)
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": out.column("event_id"),
                "event_type": out.column("event_type"),
                "cents": _cents(out.column("value")),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def revenue_trend(sf_dir: str) -> "ray.data.Dataset":
    """Per-priority OLS slope of DAILY order revenue over time — the
    drift/trend detector for monitoring pipelines, exact to the last bit.

    Two stages: (1) one (priority, day) hash aggregate rolls order cents
    up to daily revenue (day = epoch day of o_orderdate, rebased by a
    FIXED 9000-day offset to keep every downstream product inside
    int64); (2) per-batch regression partials (n, sum x, sum y, sum xy,
    sum x^2) finish in a tiny per-priority aggregate, and the driver
    computes slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) per group in exact
    Python ints (O(groups) big-int ops), emitting floor(num * 1e6 / den)
    micro-cents-per-day. Int64 bound: daily cents ~1e7 at sf0.01 and |x|
    <= ~1600, so every PARTIAL fits int64 through ~sf10; the final
    products are Python ints, overflow-free at any scale.
    """
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def daily_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("o_totalprice"))
        days = pc.subtract(
            pc.divide(
                batch.column("o_orderdate").cast(pa.int64()),
                pa.scalar(86_400_000_000, pa.int64()),
            ),
            pa.scalar(9000, pa.int64()),
        )
        t = pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "x": days.combine_chunks() if isinstance(days, pa.ChunkedArray) else days,
                "y": cents,
            }
        )
        return (
            t.group_by(["o_orderpriority", "x"])
            .aggregate([("y", "sum")])
            .rename_columns(["o_orderpriority", "x", "y"])
        )

    from agentic_doc_ray.context import shuffle_partitions

    daily = (
        ds.map_batches(daily_partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "x"], num_partitions=shuffle_partitions(4))
        .aggregate(Sum("y", alias_name="y"))
    )

    def reg_partial(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "n": np.ones(len(x), np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return (
            t.group_by("o_orderpriority")
            .aggregate(
                [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum"), ("sxx", "sum")]
            )
            .rename_columns(["o_orderpriority", "n", "sx", "sy", "sxy", "sxx"])
        )

    rows = (
        daily.map_batches(reg_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
        .take_all()
    )
    out_rows = []
    for r in sorted(rows, key=lambda r: r["o_orderpriority"]):
        n, sx, sy, sxy, sxx = (
            int(r["n"]), int(r["sx"]), int(r["sy"]), int(r["sxy"]), int(r["sxx"])
        )
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx  # > 0 whenever the group spans > 1 day
        # single-day group: slope undefined -> 0 (documented degenerate case)
        slope_micro = (num * 1_000_000) // den if den else 0
        out_rows.append(
            {"o_orderpriority": r["o_orderpriority"], "n_days": n, "slope_micro": slope_micro}
        )
    return ray.data.from_arrow(
        pa.Table.from_pylist(
            out_rows,
            schema=pa.schema(
                [
                    ("o_orderpriority", pa.string()),
                    ("n_days", pa.int64()),
                    ("slope_micro", pa.int64()),
                ]
            ),
        )
    )


# ---------------------------------------------------------------------------
# Pareto front (2-D skyline)
# ---------------------------------------------------------------------------

_SKYLINE_SCHEMA = pa.schema(
    [
        ("p_partkey", pa.int64()),
        ("p_retailprice", pa.float64()),
        ("p_size", pa.int64()),
    ]
)


def _local_skyline(batch: pa.Table) -> pa.Table:
    """Non-dominated rows of ONE batch: minimize p_retailprice, maximize
    p_size. A row is dominated iff some row is <= on price AND >= on size
    with at least one strict; rows tied on BOTH dims all survive together.

    Vectorized: per distinct price, only the max-size rows can survive;
    across prices (ascending), a price level survives iff its max size
    STRICTLY exceeds the running max over all cheaper levels (an equal
    size at a cheaper price dominates strictly on price)."""
    if batch.num_rows == 0:
        return _SKYLINE_SCHEMA.empty_table()
    price = batch.column("p_retailprice").to_numpy(zero_copy_only=False)
    size = batch.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
    uprice, inv = np.unique(price, return_inverse=True)
    max_at = np.full(len(uprice), np.iinfo(np.int64).min, np.int64)
    np.maximum.at(max_at, inv, size)
    # running strict prefix max over cheaper price levels
    prefix = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(max_at)[:-1])
    )
    level_ok = max_at > prefix
    keep = level_ok[inv] & (size == max_at[inv])
    return pa.Table.from_arrays(
        [
            batch.column("p_partkey").filter(pa.array(keep)).cast(pa.int64()),
            batch.column("p_retailprice").filter(pa.array(keep)),
            batch.column("p_size").filter(pa.array(keep)).cast(pa.int64()),
        ],
        schema=_SKYLINE_SCHEMA,
    )


def pareto_front(sf_dir: str) -> "ray.data.Dataset":
    """Distributed 2-D skyline over part: the parts no other part beats on
    both (cheaper-or-equal price, larger-or-equal size, one strict) — the
    classic multi-criteria shortlist query.

    Scale shape: the skyline operator is IDEMPOTENT under composition
    (a globally dominated row is dominated inside any subset containing
    its dominator), so each batch first reduces to its LOCAL skyline —
    expected O(distinct prices at the frontier) rows, a massive data cut
    — and one single-group exchange merges the partials with the same
    kernel. The merge group is bounded by sum-of-partial-skylines (tiny
    for non-adversarial data; worst case — every row on the global front
    — is output-sized, which no exact skyline can beat)."""
    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
    partials = part.map_batches(_local_skyline, batch_format="pyarrow")

    ex_schema = _SKYLINE_SCHEMA.insert(0, pa.field("bucket", pa.int32()))

    def tag(batch: pa.Table) -> pa.Table:
        return batch.add_column(
            0, "bucket", pa.array([0] * batch.num_rows, pa.int32())
        )

    def merge(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("p_partkey"), 0))
        return _local_skyline(g)

    return (
        partials.map_batches(tag, batch_format="pyarrow")
        .union(int_key_sentinels(ex_schema, "bucket", fill={"p_partkey": -1}))
        .groupby("bucket", num_partitions=_cap(2))
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# per-user latest-state rollup (survivorship / golden record)
# ---------------------------------------------------------------------------

_STATE_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("last_ts_us", pa.int64()),
        ("last_event_id", pa.int64()),
        ("last_value_cents", pa.int64()),
    ]
)


def _state_partial(batch: pa.Table) -> pa.Table:
    """Per-batch argmax: for each (user, event_type), the row with max
    (ts, event_id) — a valid partial because argmax distributes over
    unions."""
    ts = batch.column("ts").cast(pa.int64())
    cents = pc.cast(
        pc.round(pc.multiply(batch.column("value"), pa.scalar(100.0))), pa.int64()
    )
    t = pa.Table.from_arrays(
        [
            batch.column("user_id").cast(pa.int64()),
            batch.column("event_type"),
            ts,
            batch.column("event_id").cast(pa.int64()),
            cents,
        ],
        names=["user_id", "event_type", "last_ts_us", "last_event_id", "last_value_cents"],
    )
    order = pc.sort_indices(
        t,
        sort_keys=[
            ("user_id", "ascending"),
            ("event_type", "ascending"),
            ("last_ts_us", "descending"),
            ("last_event_id", "descending"),
        ],
    )
    t = t.take(order)
    uid = t.column("user_id").to_numpy(zero_copy_only=False)
    et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
    first = np.concatenate(
        ([True], (uid[1:] != uid[:-1]) | (et[1:] != et[:-1]))
    ) if len(uid) else np.zeros(0, bool)
    t = t.filter(pa.array(first))
    bucket = pc.cast(
        pc.bit_wise_and(t.column("user_id"), pa.scalar(63, pa.int64())),
        pa.int32(),
    )
    return pa.Table.from_arrays(
        [bucket] + [t.column(c) for c in t.column_names], schema=_STATE_SCHEMA
    )


def user_latest_state(sf_dir: str) -> "ray.data.Dataset":
    """Survivorship rollup (the 'golden record' read every CDP / feature
    store serves): per (user, event_type), the value of the LATEST event
    — max ts, event_id tie-break. Output (user_id, event_type,
    last_ts_us, last_event_id, last_value_cents).

    Scale shape: per-batch vectorized argmax partials (one row per
    (user, type) per batch) through ONE user-bucketed exchange; each
    bucket re-runs the same argmax — argmax distributes over unions, so
    the merge is the partial. Raw events never shuffle."""
    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    np_ = partitions_for(ds.count())

    def merge(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("user_id"), 0))
        if g.num_rows == 0:
            return _STATE_SCHEMA.remove(0).empty_table()
        t = g.select(
            ["user_id", "event_type", "last_ts_us", "last_event_id", "last_value_cents"]
        )
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("event_type", "ascending"),
                ("last_ts_us", "descending"),
                ("last_event_id", "descending"),
            ],
        )
        t = t.take(order)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        first = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (et[1:] != et[:-1]))
        )
        return t.filter(pa.array(first))

    return (
        ds.map_batches(_state_partial, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                _STATE_SCHEMA,
                "bucket",
                fill={"user_id": -1, "event_type": "", "last_ts_us": 0,
                      "last_event_id": 0, "last_value_cents": 0},
            )
        )
        .groupby("bucket", num_partitions=np_)
        .map_groups(merge, batch_format="pyarrow")
    )


def group_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Per-group EXACT quantiles (p50/p90/p99 of event value cents per
    event_type) — the latency-percentile shape at scale, sketch-free and
    bit-exact.

    Quantile definition: the element at 0-based index floor((n-1)*p) of
    the ascending values — computed from the VALUE DISTRIBUTION, never
    the rows: per-batch (event_type, cents) count partials collapse each
    batch to its occupied values, one hash aggregate bounds the exchange
    by distinct (group, value) pairs (cents domains are bounded — ~50k
    distinct for a bounded price field — regardless of row count), and a
    group-keyed fold walks each group's sorted distribution with integer
    cumulative counts. floor((n-1)*p) uses integer num/den arithmetic,
    so the SQL oracle (list_sort + 1-based index) is exact.
    """
    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import str_key_sentinels

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(batch.column("value"), pa.scalar(100.0))
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("event_type"), cents], names=["event_type", "cents"]
        )
        g = t.group_by(["event_type", "cents"]).aggregate([("cents", "count")])
        return g.rename_columns(["event_type", "cents", "n"])

    dist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"], num_partitions=_cap(8))
        .aggregate(Sum("n", alias_name="n"))
    )

    dist_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("cents", pa.int64()),
            ("n", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("p50_cents", pa.int64()),
            ("p90_cents", pa.int64()),
            ("p99_cents", pa.int64()),
        ]
    )

    def fold_group(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("cents"), pa.scalar(-1)))
        if g.num_rows == 0:
            return out_schema.empty_table()
        rows = []
        import pandas as pd

        df = g.to_pandas()
        for etype, sub in df.groupby("event_type"):
            sub = sub.sort_values("cents")
            cents = sub["cents"].to_numpy()
            cnt = sub["n"].to_numpy()
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            qs = []
            for num, den in ((1, 2), (9, 10), (99, 100)):
                idx = (n - 1) * num // den  # 0-based exact
                qs.append(int(cents[np.searchsorted(cum, idx + 1)]))
            rows.append(
                {
                    "event_type": etype,
                    "n": n,
                    "p50_cents": qs[0],
                    "p90_cents": qs[1],
                    "p99_cents": qs[2],
                }
            )
        return pa.Table.from_pylist(rows, schema=out_schema)

    def rekey(batch: pa.Table) -> pa.Table:
        return batch.select(["event_type", "cents", "n"]).cast(dist_schema)

    return (
        dist.map_batches(rekey, batch_format="pyarrow")
        .union(str_key_sentinels(dist_schema, "event_type", fill={"cents": -1, "n": 0}))
        .groupby("event_type", num_partitions=_cap(4))
        .map_groups(fold_group, batch_format="pyarrow")
    )


def _basket_triples(apex: np.ndarray, nb: np.ndarray):
    """Vectorized per-basket TRIPLE generation (sorted (apex, item)
    input): baskets bucketed by size d, each size class stacked into an
    (m, d) matrix, one combination-index gather emits every C(d,3)
    triple of the class — no per-basket Python. Mirrors
    ``graph._wedge_pairs``'s degree-class trick one order higher."""
    from itertools import combinations

    if len(apex) == 0:
        e = np.array([], dtype=np.int64)
        return e, e, e
    uniq, starts, counts = np.unique(apex, return_index=True, return_counts=True)
    xs, ys, zs = [], [], []
    for d in np.unique(counts):
        if d < 3:
            continue
        sel = counts == d
        st = starts[sel]
        mat = nb[st[:, None] + np.arange(int(d))[None, :]]
        combos = np.array(list(combinations(range(int(d)), 3)), dtype=np.int64)
        xs.append(mat[:, combos[:, 0]].ravel())
        ys.append(mat[:, combos[:, 1]].ravel())
        zs.append(mat[:, combos[:, 2]].ravel())
    if not xs:
        e = np.array([], dtype=np.int64)
        return e, e, e
    return np.concatenate(xs), np.concatenate(ys), np.concatenate(zs)


def copurchase_triples(
    sf_dir: str, min_support: int = 2, n_buckets: int = 64
) -> "ray.data.Dataset":
    """A-Priori pass 2 (Agrawal & Srikant 1994): frequent part TRIPLES at
    ``min_support``, with candidate generation pruned by the frequent
    PAIRS — by monotonicity (a frequent triple's sub-pairs are frequent)
    the pruning provably never changes the result, it only bounds the
    work, so the SQL oracle is the plain triple HAVING count.

    Shape: pass 1 reuses the basket exchange to produce the frequent-pair
    set (threshold-bounded by A-Priori's own guarantee — at min_support 2
    and sf0.01 that is 3.4k of 112k pairs; size logged), broadcast once
    as encoded ``a*2^32 + b`` keys (partkey < 2^32 by contract); pass 2
    re-runs the basket exchange, generates each basket's triples through
    the size-class matrices and keeps only candidates whose three
    sub-pairs are all frequent BEFORE any counting; per-bucket partials,
    one triple-keyed merge, HAVING >= min_support, deterministic
    (support DESC, x, y, z) order.
    """
    import logging

    import ray as _ray
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    np_ = partitions_for(ds.count())

    def tag(batch: pa.Table) -> pa.Table:
        t = (
            batch.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        bucket = pc.cast(
            pc.bit_wise_and(
                t.column("l_orderkey"), pa.scalar(n_buckets - 1, pa.int64())
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [bucket, t.column("l_orderkey"), t.column("l_partkey")],
            schema=_BASKET_SCHEMA,
        )

    baskets = (
        ds.map_batches(tag, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                _BASKET_SCHEMA, "bucket", fill={"l_orderkey": -1, "l_partkey": -1}
            )
        )
        .groupby("bucket", num_partitions=np_)
    )

    pair_schema = pa.schema(
        [("pbucket", pa.int32()), ("pair", pa.int64()), ("n", pa.int64())]
    )

    def _sorted_baskets(group: pa.Table):
        g = group.filter(pc.greater_equal(group.column("l_orderkey"), 0))
        if g.num_rows == 0:
            return None, None
        g = (
            g.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        order = pc.sort_indices(
            g,
            sort_keys=[("l_orderkey", "ascending"), ("l_partkey", "ascending")],
        )
        g = g.take(order)
        return (
            g.column("l_orderkey").to_numpy(zero_copy_only=False),
            g.column("l_partkey").to_numpy(zero_copy_only=False),
        )

    def pair_counts(group: pa.Table) -> pa.Table:
        from agentic_doc_ray.functions.graph import _wedge_pairs

        apex, nb = _sorted_baskets(group)
        if apex is None:
            return pair_schema.empty_table()
        x, y, _ = _wedge_pairs(apex, nb)
        if len(x) == 0:
            return pair_schema.empty_table()
        t = pa.table({"pair": pa.array((x << 32) | y, pa.int64())})
        g = t.group_by("pair").aggregate([("pair", "count")])
        g = g.rename_columns(["pair", "n"])
        pb = pc.cast(
            pc.bit_wise_and(
                pc.multiply(g.column("pair"), pa.scalar(0x9E3779B9, pa.int64())),
                pa.scalar(63, pa.int64()),
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [pb, g.column("pair"), g.column("n").cast(pa.int64())],
            schema=pair_schema,
        )

    # pass 1: frequent pairs — per-bucket Arrow merge + HAVING instead of
    # Ray's per-group hash aggregate (~60us/distinct group; the sf0.1
    # 1.2M-pair table made that path a 25 s hot spot)
    def merge_pairs(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("pair"), 0))
        if g.num_rows == 0:
            return pa.schema([("pair", pa.int64())]).empty_table()
        agg = (
            g.select(["pair", "n"])
            .group_by("pair")
            .aggregate([("n", "sum")])
            .rename_columns(["pair", "n"])
        )
        return agg.filter(
            pc.greater_equal(agg.column("n"), pa.scalar(min_support, pa.int64()))
        ).select(["pair"])

    blocks = [
        b
        for b in _ray.get(
            baskets.map_groups(pair_counts, batch_format="pyarrow")
            .union(
                int_key_sentinels(
                    pair_schema, "pbucket", fill={"pair": -1, "n": 0}
                )
            )
            .groupby("pbucket", num_partitions=np_)
            .map_groups(merge_pairs, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if b.num_rows
    ]
    freq_pairs = (
        pa.concat_tables(blocks).column("pair").to_numpy(zero_copy_only=False)
        if blocks
        else np.array([], dtype=np.int64)
    )
    freq_pairs = np.sort(freq_pairs)
    logging.getLogger(__name__).info(
        "copurchase_triples: %d frequent pairs at min_support=%d",
        len(freq_pairs), min_support,
    )
    fp_ref = _ray.put(freq_pairs)

    tri_schema = pa.schema(
        [
            ("tbucket", pa.int32()),
            ("x", pa.int64()),
            ("y", pa.int64()),
            ("z", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def triple_counts(group: pa.Table, *, _fp=fp_ref) -> pa.Table:
        apex, nb = _sorted_baskets(group)
        if apex is None:
            return tri_schema.empty_table()
        cache = triple_counts.__dict__
        if "fp" not in cache:
            cache["fp"] = _ray.get(_fp)
        fp = cache["fp"]
        x, y, z = _basket_triples(apex, nb)
        if len(x) == 0:
            return tri_schema.empty_table()
        # A-Priori candidate pruning: all three sub-pairs frequent
        ok = (
            np.isin((x << 32) | y, fp)
            & np.isin((x << 32) | z, fp)
            & np.isin((y << 32) | z, fp)
        )
        x, y, z = x[ok], y[ok], z[ok]
        if len(x) == 0:
            return tri_schema.empty_table()
        t = pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "z": pa.array(z, pa.int64()),
            }
        )
        g = t.group_by(["x", "y", "z"]).aggregate([("x", "count")])
        g = g.rename_columns(["x", "y", "z", "n"])
        tb = pc.cast(
            pc.bit_wise_and(
                pc.bit_wise_xor(
                    pc.bit_wise_xor(
                        g.column("x"),
                        pc.multiply(g.column("y"), pa.scalar(0x9E3779B9, pa.int64())),
                    ),
                    pc.multiply(g.column("z"), pa.scalar(0x85EBCA6B, pa.int64())),
                ),
                pa.scalar(63, pa.int64()),
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [tb, g.column("x"), g.column("y"), g.column("z"), g.column("n").cast(pa.int64())],
            schema=tri_schema,
        )

    out_schema = pa.schema(
        [
            ("part_a", pa.int64()),
            ("part_b", pa.int64()),
            ("part_c", pa.int64()),
            ("support", pa.int64()),
        ]
    )

    def merge_triples(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("x"), 0))
        if g.num_rows == 0:
            return out_schema.empty_table()
        agg = (
            g.select(["x", "y", "z", "n"])
            .group_by(["x", "y", "z"])
            .aggregate([("n", "sum")])
            .rename_columns(["part_a", "part_b", "part_c", "support"])
        )
        agg = agg.filter(
            pc.greater_equal(agg.column("support"), pa.scalar(min_support, pa.int64()))
        )
        return agg.cast(out_schema)

    baskets2 = (
        ds.map_batches(tag, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                _BASKET_SCHEMA, "bucket", fill={"l_orderkey": -1, "l_partkey": -1}
            )
        )
        .groupby("bucket", num_partitions=np_)
    )
    return (
        baskets2.map_groups(triple_counts, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                tri_schema, "tbucket", fill={"x": -1, "y": -1, "z": -1, "n": 0}
            )
        )
        .groupby("tbucket", num_partitions=np_)
        .map_groups(merge_triples, batch_format="pyarrow")
    )


_CONV_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("user_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("is_view", pa.int64()),
    ]
)


def conversion_lags(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Per-user view→purchase conversion lag in whole seconds (the
    funnel-latency input; feed ``group_quantiles``-style folds for p50
    time-to-convert): fv = the user's first 'view', fp = the first
    'purchase' at or after fv; emit (user_id, lag_sec) for users with
    both. Exact integer microsecond arithmetic, floor seconds.

    Shape: one user-bucket exchange of (user, ts, is_view) key rows
    (only view/purchase events ship — the filter is why the exchange is
    sentinel-guarded); each bucket resolves first-view/first-purchase
    with vectorized pandas min-merges. Events are user-bounded per
    bucket; nothing collects on the driver."""
    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    np_ = partitions_for(ds.count())

    def tag(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, "view"), pc.equal(et, "purchase"))
        f = batch.filter(keep)
        ts_us = f.column("ts").cast(pa.int64())
        is_view = pc.cast(pc.equal(f.column("event_type"), "view"), pa.int64())
        bucket = pc.cast(
            pc.bit_wise_and(
                f.column("user_id"), pa.scalar(n_buckets - 1, pa.int64())
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [bucket, f.column("user_id"), ts_us, is_view], schema=_CONV_SCHEMA
        )

    out_schema = pa.schema([("user_id", pa.int64()), ("lag_sec", pa.int64())])

    def fold(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("user_id"), 0))
        if g.num_rows == 0:
            return out_schema.empty_table()
        df = g.select(["user_id", "ts_us", "is_view"]).to_pandas()
        fv = (
            df[df["is_view"] == 1]
            .groupby("user_id")["ts_us"]
            .min()
            .rename("fv")
        )
        p = df[df["is_view"] == 0].merge(fv, on="user_id")
        p = p[p["ts_us"] >= p["fv"]]
        if p.empty:
            return out_schema.empty_table()
        fp = p.groupby("user_id").agg(fp=("ts_us", "min"), fv=("fv", "min"))
        lag = (fp["fp"] - fp["fv"]) // 1_000_000
        return pa.Table.from_arrays(
            [
                pa.array(fp.index.to_numpy().astype(np.int64)),
                pa.array(lag.to_numpy().astype(np.int64)),
            ],
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                _CONV_SCHEMA, "bucket", fill={"user_id": -1, "ts_us": 0, "is_view": 0}
            )
        )
        .groupby("bucket", num_partitions=np_)
        .map_groups(fold, batch_format="pyarrow")
    )


_US_PER_DAY = 86_400_000_000


def rolling_active_users(sf_dir: str) -> "ray.data.Dataset":
    """DAU / trailing-7-day WAU / stickiness per day — the product
    engagement rollup, exact: distinct (day, user) activity expands x7
    into (window_day, user) rows; stickiness_ppm = 10^6 * dau // wau.
    Output days are the days with activity (dau > 0); early days carry
    partial (shorter) trailing windows, same as the SQL.

    Scale shape (the house bucket-then-Arrow-merge pattern — Ray groupby
    keys must be bounded dimensions, never entity ids): one user-hash
    bucket exchange co-locates each user's activity; the (day, user)
    distinct, the x7 window expand, AND the windowed distinct all run
    as C-speed Arrow group_bys INSIDE the bucket (a user's window rows
    live in its bucket by construction), so the only aggregate keyed
    exchange is the final day-keyed count merge — bounded by the date
    range, not by users."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    part_schema = pa.schema(
        [("ubucket", pa.int32()), ("day", pa.int64()), ("user_id", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            batch.column("ts").cast(pa.int64()),
            pa.scalar(_US_PER_DAY, pa.int64()),
        )
        t = pa.Table.from_arrays(
            [day, batch.column("user_id")], names=["day", "user_id"]
        )
        g = t.group_by(["day", "user_id"]).aggregate([])
        ub = pc.cast(
            pc.bit_wise_and(g.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [ub, g.column("day").cast(pa.int64()), g.column("user_id")],
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("day", pa.int64()), ("n_dau", pa.int64()), ("n_wau", pa.int64())]
    )

    def bucket_counts(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("user_id"), 0))
        if g.num_rows == 0:
            return out_schema.empty_table()
        du = g.select(["day", "user_id"]).group_by(["day", "user_id"]).aggregate([])
        dau = du.group_by("day").aggregate([("day", "count")])
        day = du.column("day").to_numpy(zero_copy_only=False)
        user = du.column("user_id").to_numpy(zero_copy_only=False)
        wt = pa.table(
            {
                "day": (day[:, None] + np.arange(7)[None, :]).ravel(),
                "user_id": np.repeat(user, 7),
            }
        )
        wau = (
            wt.group_by(["day", "user_id"])
            .aggregate([])
            .group_by("day")
            .aggregate([("day", "count")])
        )
        z_d = pa.array(np.zeros(dau.num_rows, np.int64))
        z_w = pa.array(np.zeros(wau.num_rows, np.int64))
        return pa.concat_tables(
            [
                pa.Table.from_arrays(
                    [
                        dau.column("day").cast(pa.int64()),
                        dau.column("day_count").cast(pa.int64()),
                        z_d,
                    ],
                    schema=out_schema,
                ),
                pa.Table.from_arrays(
                    [
                        wau.column("day").cast(pa.int64()),
                        z_w,
                        wau.column("day_count").cast(pa.int64()),
                    ],
                    schema=out_schema,
                ),
            ]
        )

    per_day = (
        ds.map_batches(partial, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                part_schema, "ubucket", fill={"day": -1, "user_id": -1}
            )
        )
        .groupby("ubucket", num_partitions=partitions_for(ds.count()))
        .map_groups(bucket_counts, batch_format="pyarrow")
        .groupby("day", num_partitions=_cap(4))
        .aggregate(Sum("n_dau", alias_name="dau"), Sum("n_wau", alias_name="wau"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch.column("dau"), 0))
        dau_v = b.column("dau").to_numpy(zero_copy_only=False).astype(np.int64)
        wau_v = b.column("wau").to_numpy(zero_copy_only=False).astype(np.int64)
        stick = 1_000_000 * dau_v // np.maximum(wau_v, 1)
        return pa.Table.from_arrays(
            [
                b.column("day").combine_chunks().cast(pa.int64()),
                pa.array(dau_v),
                pa.array(wau_v),
                pa.array(stick.astype(np.int64)),
            ],
            names=["day", "dau", "wau", "stickiness_ppm"],
        )

    return per_day.map_batches(finish, batch_format="pyarrow")


def daily_new_users(sf_dir: str) -> "ray.data.Dataset":
    """Per day: active users vs FIRST-SEEN (new) users — the growth /
    retention attribution split. Exact integers.

    Scale shape: one user-hash bucket exchange co-locates each user's
    distinct activity; the per-user first-seen min runs as an Arrow
    group_by INSIDE the bucket, so the only aggregate-keyed exchange is
    the final day-keyed count merge (bounded by the date range)."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    part_schema = pa.schema(
        [("ubucket", pa.int32()), ("day", pa.int64()), ("user_id", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            batch.column("ts").cast(pa.int64()),
            pa.scalar(_US_PER_DAY, pa.int64()),
        )
        t = pa.Table.from_arrays(
            [day, batch.column("user_id")], names=["day", "user_id"]
        )
        g = t.group_by(["day", "user_id"]).aggregate([])
        ub = pc.cast(
            pc.bit_wise_and(g.column("user_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [ub, g.column("day").cast(pa.int64()), g.column("user_id")],
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("day", pa.int64()), ("n_active", pa.int64()), ("n_new", pa.int64())]
    )

    def bucket_counts(group: pa.Table) -> pa.Table:
        # users are co-located in their bucket, so the per-user first-seen
        # min is exact in-bucket — no user-keyed Ray aggregate (the house
        # rule: Ray groupby keys are bounded dimensions, never entity ids)
        g = group.filter(pc.greater_equal(group.column("user_id"), 0))
        if g.num_rows == 0:
            return out_schema.empty_table()
        du = g.select(["day", "user_id"]).group_by(["day", "user_id"]).aggregate([])
        active = du.group_by("day").aggregate([("day", "count")])
        first = du.group_by("user_id").aggregate([("day", "min")])
        new = first.group_by("day_min").aggregate([("day_min", "count")])
        z_a = pa.array(np.zeros(active.num_rows, np.int64))
        z_n = pa.array(np.zeros(new.num_rows, np.int64))
        return pa.concat_tables(
            [
                pa.Table.from_arrays(
                    [
                        active.column("day").cast(pa.int64()),
                        active.column("day_count").cast(pa.int64()),
                        z_a,
                    ],
                    schema=out_schema,
                ),
                pa.Table.from_arrays(
                    [
                        new.column("day_min").cast(pa.int64()),
                        z_n,
                        new.column("day_min_count").cast(pa.int64()),
                    ],
                    schema=out_schema,
                ),
            ]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                part_schema, "ubucket", fill={"day": -1, "user_id": -1}
            )
        )
        .groupby("ubucket", num_partitions=partitions_for(ds.count()))
        .map_groups(bucket_counts, batch_format="pyarrow")
        .groupby("day", num_partitions=_cap(4))
        .aggregate(
            Sum("n_active", alias_name="n_active"),
            Sum("n_new", alias_name="n_new"),
        )
    )


def rfm_segments(sf_dir: str) -> "ray.data.Dataset":
    """RFM customer segmentation (recency / frequency / monetary) with
    EXACT integer tercile bins: per customer, days since last order
    (vs the global max order date), order count, revenue cents; each
    metric bins 0/1/2 by the exact tercile thresholds of its customer
    distribution — threshold = the element at floor((n-1)/3) and
    floor(2(n-1)/3) of the sorted values, bin boundaries inclusive
    (v <= t). Deterministic and SQL-mirrorable (list_sort index).

    Scale: per-batch custkey partials -> one custkey aggregate; the
    tercile thresholds come from VALUE DISTRIBUTIONS (recency in days
    <= date range, frequency small ints, monetary floored to DOLLARS so
    the distinct domain is price-bounded) collected as (metric, value,
    count) rows — never customer rows; bins attach in a final scan."""
    from ray.data.aggregate import Max, Sum

    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.context import shuffle_partitions as _cap

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    part_schema = pa.schema(
        [
            ("cbucket", pa.int32()),
            ("custkey", pa.int64()),
            ("last_us", pa.int64()),
            ("n_orders", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        us = batch.column("o_orderdate").cast(pa.int64())
        cents = pc.round(
            pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("o_custkey"), us, cents],
            names=["custkey", "us", "cents"],
        )
        g = t.group_by("custkey").aggregate(
            [("us", "max"), ("custkey", "count"), ("cents", "sum")]
        )
        g = g.rename_columns(["custkey", "last_us", "n_orders", "cents"])
        cb = pc.cast(
            pc.bit_wise_and(g.column("custkey"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [
                cb,
                g.column("custkey").cast(pa.int64()),
                g.column("last_us").cast(pa.int64()),
                g.column("n_orders").cast(pa.int64()),
                g.column("cents").cast(pa.int64()),
            ],
            schema=part_schema,
        )

    cust_schema = pa.schema(
        [
            ("custkey", pa.int64()),
            ("last_us", pa.int64()),
            ("frequency", pa.int64()),
            ("monetary_cents", pa.int64()),
        ]
    )

    def merge_bucket(group: pa.Table) -> pa.Table:
        # in-bucket Arrow merge instead of a custkey-keyed Ray hash
        # aggregate (~60us/distinct group; the house bucket pattern)
        g = group.filter(pc.greater_equal(group.column("custkey"), 0))
        if g.num_rows == 0:
            return cust_schema.empty_table()
        m = g.group_by("custkey").aggregate(
            [("last_us", "max"), ("n_orders", "sum"), ("cents", "sum")]
        )
        return m.rename_columns(
            ["custkey", "last_us", "frequency", "monetary_cents"]
        ).cast(cust_schema)

    per_cust = (
        ds.map_batches(partial, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                part_schema,
                "cbucket",
                fill={"custkey": -1, "last_us": 0, "n_orders": 0, "cents": 0},
            )
        )
        .groupby("cbucket", num_partitions=partitions_for(ds.count()))
        .map_groups(merge_bucket, batch_format="pyarrow")
        .materialize()
    )

    from agentic_doc_ray.context import scalar_agg

    max_us = int(scalar_agg(per_cust, "last_us", "max"))

    def metric_dist(batch: pa.Table) -> pa.Table:
        rec = pc.divide(
            pc.subtract(pa.scalar(max_us, pa.int64()), batch.column("last_us")),
            pa.scalar(_US_PER_DAY, pa.int64()),
        )
        dollars = pc.divide(batch.column("monetary_cents"), pa.scalar(100, pa.int64()))
        parts = []
        for mid, col in (
            (0, rec),
            (1, batch.column("frequency").combine_chunks()),
            (2, dollars),
        ):
            t = pa.table({"v": col})
            g = t.group_by("v").aggregate([("v", "count")])
            g = g.rename_columns(["v", "n"])
            parts.append(
                pa.Table.from_arrays(
                    [
                        pa.array(
                            np.full(g.num_rows, mid, np.int64)
                        ),
                        g.column("v").combine_chunks().cast(pa.int64()),
                        g.column("n").cast(pa.int64()),
                    ],
                    names=["metric", "v", "n"],
                )
            )
        return pa.concat_tables(parts)

    dist_rows = (
        per_cust.map_batches(metric_dist, batch_format="pyarrow")
        .groupby(["metric", "v"], num_partitions=_cap(4))
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    thresholds: dict[int, tuple[int, int]] = {}
    for mid in (0, 1, 2):
        rows = sorted((r["v"], r["n"]) for r in dist_rows if r["metric"] == mid)
        vals = np.array([v for v, _ in rows], dtype=np.int64)
        cum = np.cumsum(np.array([n for _, n in rows], dtype=np.int64))
        n = int(cum[-1])
        t1 = int(vals[np.searchsorted(cum, (n - 1) // 3 + 1)])
        t2 = int(vals[np.searchsorted(cum, 2 * (n - 1) // 3 + 1)])
        thresholds[mid] = (t1, t2)

    def finish(batch: pa.Table) -> pa.Table:
        rec = pc.divide(
            pc.subtract(pa.scalar(max_us, pa.int64()), batch.column("last_us")),
            pa.scalar(_US_PER_DAY, pa.int64()),
        ).to_numpy(zero_copy_only=False)
        freq = batch.column("frequency").to_numpy(zero_copy_only=False)
        cents = batch.column("monetary_cents").to_numpy(zero_copy_only=False)
        dollars = cents // 100

        def bins(v, mid):
            t1, t2 = thresholds[mid]
            return np.where(v <= t1, 0, np.where(v <= t2, 1, 2)).astype(np.int64)

        return pa.Table.from_arrays(
            [
                batch.column("custkey").combine_chunks().cast(pa.int64()),
                pa.array(rec.astype(np.int64)),
                pa.array(freq.astype(np.int64)),
                pa.array(cents.astype(np.int64)),
                pa.array(bins(rec, 0)),
                pa.array(bins(freq, 1)),
                pa.array(bins(dollars, 2)),
            ],
            names=[
                "custkey", "recency_days", "frequency", "monetary_cents",
                "r_bin", "f_bin", "m_bin",
            ],
        )

    return per_cust.map_batches(finish, batch_format="pyarrow")


def order_total_audit(sf_dir: str) -> "ray.data.Dataset":
    """Fact-consistency reconciliation (the lakehouse audit join): per
    order, the header total vs the sum of its line extended prices, in
    exact integer cents — the table a warehouse diffs after every load.
    Lineitem collapses to per-batch (orderkey, cents) partials before
    its exchange; the header attaches through the generic bucketed
    hash_join (both sides scale with orders — no broadcast); orders with
    no lines reconcile against 0 via the left join."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.functions.join_api import hash_join

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    part_schema = pa.schema(
        [("obucket", pa.int32()), ("o_orderkey", pa.int64()), ("c", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(batch.column("l_extendedprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("l_orderkey"), cents], names=["o_orderkey", "c"]
        )
        g = t.group_by("o_orderkey").aggregate([("c", "sum")])
        g = g.rename_columns(["o_orderkey", "c"])
        ob = pc.cast(
            pc.bit_wise_and(g.column("o_orderkey"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [ob, g.column("o_orderkey"), g.column("c").cast(pa.int64())],
            schema=part_schema,
        )

    def merge_bucket(group: pa.Table) -> pa.Table:
        # in-bucket Arrow merge instead of Ray's per-group hash aggregate
        # (~60us/distinct group across ~60k orderkeys at sf0.1)
        g = group.filter(pc.greater_equal(group.column("o_orderkey"), 0))
        if g.num_rows == 0:
            return pa.schema(
                [("o_orderkey", pa.int64()), ("line_cents", pa.int64())]
            ).empty_table()
        return (
            g.select(["o_orderkey", "c"])
            .group_by("o_orderkey")
            .aggregate([("c", "sum")])
            .rename_columns(["o_orderkey", "line_cents"])
        )

    line_sums = (
        li.map_batches(partial, batch_format="pyarrow")
        .union(
            int_key_sentinels(part_schema, "obucket", fill={"o_orderkey": -1, "c": 0})
        )
        .groupby("obucket", num_partitions=partitions_for(li.count()))
        .map_groups(merge_bucket, batch_format="pyarrow")
    )

    def header(batch: pa.Table) -> pa.Table:
        total = pc.round(
            pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        return pa.Table.from_arrays(
            [batch.column("o_orderkey"), total],
            names=["o_orderkey", "total_cents"],
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        header, batch_format="pyarrow"
    )
    joined = hash_join(orders, line_sums, left_on="o_orderkey", how="left")

    def finish(batch: pa.Table) -> pa.Table:
        lc = pc.coalesce(
            batch.column("line_cents").combine_chunks().cast(pa.int64()),
            pa.scalar(0, pa.int64()),
        )
        total = batch.column("total_cents").combine_chunks().cast(pa.int64())
        return pa.Table.from_arrays(
            [
                batch.column("o_orderkey").combine_chunks().cast(pa.int64()),
                total,
                lc,
                pc.subtract(total, lc),
            ],
            names=["o_orderkey", "total_cents", "line_cents", "diff_cents"],
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def length_outliers_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Per-source 3-sigma doc-length outliers (template-farm / truncation
    detector), EXACT integers via the cross-multiplied test
    (x*n - S)^2 > 9*(n*Q - S^2): per-source (n, S, Q) moment partials
    fold through one tiny exchange, thresholds finish in Python ints on
    the source-bounded rows (n*Q exceeds int64 on crawl-scale sources —
    the event_outliers limb machinery is the documented fallback), and
    the flagging scan re-reads documents with the kilobyte moment dict
    in its closure. Rows never shuffle (sketch-then-filter)."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions as _cap

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def moments(batch: pa.Table) -> pa.Table:
        x = batch.column("n_chars").cast(pa.int64())
        t = pa.Table.from_arrays(
            [
                batch.column("source"),
                x,
                pc.multiply(x, x),
            ],
            names=["source", "s", "q"],
        )
        g = t.group_by("source").aggregate(
            [("s", "count"), ("s", "sum"), ("q", "sum")]
        )
        return g.rename_columns(["source", "n", "s", "q"])

    rows = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("source", num_partitions=_cap(4))
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("q", alias_name="q"),
        )
        .take_all()
    )
    # Python-int moments per source: (n, S, 9*(n*Q - S^2))
    m = {
        r["source"]: (int(r["n"]), int(r["s"]), 9 * (int(r["n"]) * int(r["q"]) - int(r["s"]) ** 2))
        for r in rows
    }

    def flag(batch: pa.Table) -> pa.Table:
        src_arr = np.asarray(batch.column("source").to_pylist(), dtype=object)
        x = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.zeros(len(x), dtype=np.int64)
        for s in np.unique(src_arr):  # loop over SOURCES, not rows
            n, S, rhs = m[s]
            mask = src_arr == s
            xv = x[mask]
            bound = max(n * int(xv.max(initial=0)), S)
            if bound < 3_000_000_000:  # (x*n - S)^2 < 2^63: int64-safe
                if rhs >= 1 << 63:
                    continue  # every int64-safe lhs < 2^63 <= rhs: no flags
                lhs = (xv * n - S) ** 2
                out[mask] = (lhs > rhs).astype(np.int64)
            else:  # bounded exact fallback (crawl-scale sources)
                out[mask] = np.fromiter(
                    (1 if (int(v) * n - S) ** 2 > rhs else 0 for v in xv),
                    dtype=np.int64,
                    count=len(xv),
                )
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("source"),
                batch.column("n_chars").cast(pa.int64()),
                pa.array(out),
            ],
            names=["doc_id", "source", "n_chars", "is_outlier"],
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def activity_concentration(sf_dir: str) -> "ray.data.Dataset":
    """Event-volume concentration: what share of events the HEAVY users
    (per-user count >= the 90th-percentile count) generate — the
    workload-skew headline number next to the per-key Gini. Exact:
    threshold = the element at 0-based index floor((n_users-1)*9/10) of
    the ascending per-user counts; one summary row
    (n_users, n_events, threshold, n_heavy_users, heavy_events,
    heavy_share_ppm).

    Shape: per-batch user-count partials -> one user aggregate; the
    threshold and the rollup come from the COUNT DISTRIBUTION (distinct
    per-user-count values — a tiny domain), never user rows."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.context import shuffle_partitions as _cap

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("user_id").aggregate([("user_id", "count")])
        return g.rename_columns(["user_id", "n"])

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id", num_partitions=partitions_for(ds.count()))
        .aggregate(Sum("n", alias_name="n"))
    )

    def dist(batch: pa.Table) -> pa.Table:
        g = batch.select(["n"]).group_by("n").aggregate([("n", "count")])
        return g.rename_columns(["v", "cnt"])

    rows = (
        per_user.map_batches(dist, batch_format="pyarrow")
        .groupby("v", num_partitions=_cap(4))
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    rows = sorted((int(r["v"]), int(r["cnt"])) for r in rows)
    vals = np.array([v for v, _ in rows], dtype=np.int64)
    cnts = np.array([c for _, c in rows], dtype=np.int64)
    cum = np.cumsum(cnts)
    n_users = int(cum[-1])
    n_events = int((vals * cnts).sum())
    t = int(vals[np.searchsorted(cum, (n_users - 1) * 9 // 10 + 1)])
    heavy_mask = vals >= t
    n_heavy = int(cnts[heavy_mask].sum())
    heavy_events = int((vals[heavy_mask] * cnts[heavy_mask]).sum())
    return ray.data.from_arrow(
        pa.table(
            {
                "n_users": pa.array([n_users], pa.int64()),
                "n_events": pa.array([n_events], pa.int64()),
                "threshold": pa.array([t], pa.int64()),
                "n_heavy_users": pa.array([n_heavy], pa.int64()),
                "heavy_events": pa.array([heavy_events], pa.int64()),
                "heavy_share_ppm": pa.array(
                    [1_000_000 * heavy_events // max(n_events, 1)], pa.int64()
                ),
            }
        )
    )


def order_gap_quantiles(sf_dir: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Repeat-purchase cadence: exact p50/p90/p99 of the gaps (whole
    days) between a customer's CONSECUTIVE orders — the retention /
    reorder-cycle metric. One row out.

    Shape: (custkey, day) key rows through one sentinel-guarded
    customer-bucket exchange; per bucket, a vectorized sort+diff emits
    GAP-DISTRIBUTION partials (one row per distinct gap per bucket —
    the day-domain bounds the exchange, not order rows); the exact
    quantile indices floor((n-1)*p) resolve on the driver over the
    merged distribution."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import partitions_for
    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    np_ = partitions_for(ds.count())

    gap_schema = pa.schema(
        [("bucket", pa.int32()), ("custkey", pa.int64()), ("day", pa.int64())]
    )

    def tag(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            batch.column("o_orderdate").cast(pa.int64()),
            pa.scalar(_US_PER_DAY, pa.int64()),
        )
        bucket = pc.cast(
            pc.bit_wise_and(
                batch.column("o_custkey"), pa.scalar(n_buckets - 1, pa.int64())
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [bucket, batch.column("o_custkey"), day.cast(pa.int64())],
            schema=gap_schema,
        )

    def gaps_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("custkey"), 0))
        empty = pa.schema([("gap", pa.int64()), ("n", pa.int64())]).empty_table()
        if g.num_rows == 0:
            return empty
        cust = g.column("custkey").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, cust))
        c, d = cust[order], day[order]
        same = c[1:] == c[:-1]
        gaps = (d[1:] - d[:-1])[same]
        if len(gaps) == 0:
            return empty
        t = pa.table({"gap": pa.array(gaps.astype(np.int64))})
        out = t.group_by("gap").aggregate([("gap", "count")])
        return out.rename_columns(["gap", "n"])

    rows = (
        ds.map_batches(tag, batch_format="pyarrow")
        .union(int_key_sentinels(gap_schema, "bucket", fill={"custkey": -1, "day": 0}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(gaps_bucket, batch_format="pyarrow")
        .groupby("gap", num_partitions=_cap(4))
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    rows = sorted((int(r["gap"]), int(r["n"])) for r in rows)
    vals = np.array([v for v, _ in rows], dtype=np.int64)
    cum = np.cumsum(np.array([n for _, n in rows], dtype=np.int64))
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_gaps": pa.array([0], pa.int64()),
                    "p50_days": pa.array([0], pa.int64()),
                    "p90_days": pa.array([0], pa.int64()),
                    "p99_days": pa.array([0], pa.int64()),
                }
            )
        )
    qs = [
        int(vals[np.searchsorted(cum, (n - 1) * num // den + 1)])
        for num, den in ((1, 2), (9, 10), (99, 100))
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "n_gaps": pa.array([n], pa.int64()),
                "p50_days": pa.array([qs[0]], pa.int64()),
                "p90_days": pa.array([qs[1]], pa.int64()),
                "p99_days": pa.array([qs[2]], pa.int64()),
            }
        )
    )
