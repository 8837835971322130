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
from ray.data.aggregate import Count, Max, Min, Sum


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
        t = batch.append_column("revenue", revenue)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("revenue", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_revenue", "n_rows"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_revenue", alias_name="sum_revenue"),
        Sum("n_rows", alias_name="n_rows"),
    )


def orders_by_segment(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast hash join: customer (small side) is ray.put once and looked
    up per batch — no shuffle join for a dimension table."""
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .to_pandas()
        .set_index("c_custkey")["c_mktsegment"]
        .to_dict()
    )
    cust_ref = ray.put(cust)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join_partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(cust_ref)
        keys = batch.column("o_custkey").to_pylist()
        seg = pa.array([lookup.get(k, "UNKNOWN") for k in keys])
        t = pa.Table.from_arrays(
            [seg, batch.column("o_totalprice")], names=["c_mktsegment", "o_totalprice"]
        )
        g = t.group_by("c_mktsegment").aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")]
        )
        return g.rename_columns(["c_mktsegment", "total_price", "n_orders"])

    partials = orders.map_batches(join_partial, batch_format="pyarrow")
    return partials.groupby("c_mktsegment").aggregate(
        Sum("total_price", alias_name="total_price"),
        Sum("n_orders", alias_name="n_orders"),
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
        t = pa.Table.from_arrays(
            [hour, batch.column("event_type"), batch.column("value")],
            names=["window_start", "event_type", "value"],
        )
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count"), ("value", "min"), ("value", "max")]
        )
        return g.rename_columns(
            ["window_start", "event_type", "sum_value", "n_events", "min_value", "max_value"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_events", alias_name="n_events"),
        Min("min_value", alias_name="min_value"),
        Max("max_value", alias_name="max_value"),
    )


def sessionize(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Session windows per user: events within gap_minutes belong to one
    session. groupby(user).map_groups over ts-sorted groups — the
    streaming-shaped pattern from the guide."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def sessions(group):
        import pandas as pd

        g = group.sort_values("ts")
        gap = (g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)).cumsum()
        out = g.groupby(gap).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "count"),
            sum_value=("value", "sum"),
        )
        out["user_id"] = g["user_id"].iloc[0]
        return out.reset_index(drop=True)[
            ["user_id", "session_start", "session_end", "n_events", "sum_value"]
        ]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
