"""Large-to-large joins (both sides shuffle).

Two implementations of the same query, both exercised by tests:

  - ``order_priority_revenue``: Ray's native hash join (``Dataset.join``,
    hash-partitioned on the key) — the default;
  - ``order_priority_revenue_bucketed``: the explicit partitioned hash
    join from the playbook (tag sides -> union -> groupby(bucket) ->
    pandas merge per bucket) — the portable pattern that also handles
    salting hot keys, kept as the documented fallback.

Both shrink the fact side FIRST: lineitem revenue is pre-aggregated to one
row per orderkey (exact integer cents) before any shuffle, so the join
moves 150k rows instead of 600k.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from agentic_doc_ray.context import shuffle_partitions


def _lineitem_revenue_per_order(sf_dir: str) -> "ray.data.Dataset":
    """Revenue cents per orderkey.

    High-cardinality aggregate design (measured at sf0.1):
      - in-batch pre-aggregation is USELESS here — lineitem has no key
        locality, so 600k rows "compress" to 581k partials;
      - Ray's hash aggregate costs ~60us per distinct group (7.4s for 147k
        groups); bucketing the shuffle key to a few coarse int buckets and
        running Arrow's C-speed group_by inside each bucket does the same
        work in 3.0s. Same trick as the reassembly exchange.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        cents = pc.round(pc.multiply(rev, pa.scalar(10000.0))).cast(pa.int64())
        bucket = pc.cast(
            pc.bit_wise_and(batch.column("l_orderkey"), pa.scalar(31, pa.int64())),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [batch.column("l_orderkey"), cents, bucket],
            names=["o_orderkey", "cents", "bucket"],
        )

    def agg_bucket(group: pa.Table) -> pa.Table:
        g = group.select(["o_orderkey", "cents"]).group_by("o_orderkey").aggregate(
            [("cents", "sum")]
        )
        return g.rename_columns(["o_orderkey", "cents"])

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("bucket", num_partitions=shuffle_partitions(8))
        .map_groups(agg_bucket, batch_format="pyarrow")
    )


def _finalize(per_order_joined: "ray.data.Dataset") -> "ray.data.Dataset":
    """(o_orderpriority, cents) rows -> final (priority, revenue, n_orders)."""
    np_ = shuffle_partitions(4)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["o_orderpriority", "cents"]).group_by(
            "o_orderpriority"
        ).aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["o_orderpriority", "cents", "n_orders"])

    agg = (
        per_order_joined.map_batches(partial, batch_format="pyarrow")
        .repartition(np_)
        .groupby("o_orderpriority", num_partitions=np_)
        .aggregate(Sum("cents", alias_name="cents"), Sum("n_orders", alias_name="n_orders"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("o_orderpriority"),
                pc.divide(b.column("cents").cast(pa.float64()), 10000.0),
                b.column("n_orders"),
            ],
            names=["o_orderpriority", "revenue", "n_orders"],
        ),
        batch_format="pyarrow",
    )


def order_priority_revenue(sf_dir: str) -> "ray.data.Dataset":
    """Revenue + order count per o_orderpriority via Ray's native hash join."""
    rev = _lineitem_revenue_per_order(sf_dir)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = orders.join(
        rev,
        join_type="inner",
        num_partitions=shuffle_partitions(16),
        on=("o_orderkey",),
    )
    return _finalize(joined)


def order_priority_revenue_bucketed(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Same query via ONE explicit bucketed exchange: both sides tag
    bucket = orderkey % n_buckets, union, and a single groupby(bucket)
    does aggregate + join + priority partial-agg per bucket (the per-order
    pre-aggregation runs batch-locally before the exchange, not as its own
    shuffle — one all-to-all total vs the native path's two). Salting
    note: a hot key would get sub-bucketed on (key, salt) with the small
    side replicated per salt."""
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def tag_lineitem(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        cents = pc.round(pc.multiply(rev, pa.scalar(10000.0))).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("l_orderkey"), cents], names=["o_orderkey", "cents"]
        )
        # batch-local partial: one row per orderkey per batch (pays off
        # only with key locality, but costs one C-speed group_by)
        g = t.group_by("o_orderkey").aggregate([("cents", "sum")]).rename_columns(
            ["o_orderkey", "cents"]
        )
        key = g.column("o_orderkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [
                bucket,
                key,
                pa.array(["rev"] * g.num_rows),
                pa.nulls(g.num_rows, pa.string()),
                g.column("cents"),
            ],
            names=["bucket", "o_orderkey", "side", "o_orderpriority", "cents"],
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [
                bucket,
                key,
                pa.array(["orders"] * batch.num_rows),
                batch.column("o_orderpriority"),
                pa.nulls(batch.num_rows, pa.int64()),
            ],
            names=["bucket", "o_orderkey", "side", "o_orderpriority", "cents"],
        )

    unioned = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        lineitem.map_batches(tag_lineitem, batch_format="pyarrow")
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group.column("side")
        is_rev = pc.equal(side, "rev")
        rev = (
            group.filter(is_rev)
            .select(["o_orderkey", "cents"])
            .group_by("o_orderkey")
            .aggregate([("cents", "sum")])
            .rename_columns(["o_orderkey", "cents"])
        )
        left = group.filter(pc.invert(is_rev)).select(
            ["o_orderkey", "o_orderpriority"]
        )
        m = left.to_pandas().merge(rev.to_pandas(), on="o_orderkey", how="inner")
        # priority partial-agg inside the bucket: 5 rows leave, not 150k
        g = (
            pa.Table.from_pandas(m[["o_orderpriority", "cents"]], preserve_index=False)
            .group_by("o_orderpriority")
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        return g.rename_columns(["o_orderpriority", "cents", "n_orders"])

    partials = unioned.groupby(
        "bucket", num_partitions=shuffle_partitions(n_buckets)
    ).map_groups(join_bucket, batch_format="pyarrow")
    np_ = shuffle_partitions(4)
    agg = partials.repartition(np_).groupby(
        "o_orderpriority", num_partitions=np_
    ).aggregate(
        Sum("cents", alias_name="cents"), Sum("n_orders", alias_name="n_orders")
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("o_orderpriority"),
                pc.divide(b.column("cents").cast(pa.float64()), 10000.0),
                b.column("n_orders"),
            ],
            names=["o_orderpriority", "revenue", "n_orders"],
        ),
        batch_format="pyarrow",
    )
