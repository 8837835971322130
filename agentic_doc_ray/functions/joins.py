"""Large-to-large joins (both sides shuffle).

Two implementations of the same query, both exercised by tests:

  - ``order_priority_revenue``: Ray's native hash join (``Dataset.join``,
    hash-partitioned on the key) — the default;
  - ``order_priority_revenue_bucketed``: the explicit partitioned hash
    join from the playbook (tag sides -> union -> groupby(bucket) ->
    Arrow ``Table.join`` per bucket) — the portable pattern that also
    handles salting hot keys, kept as the documented fallback.

Bucket fan-outs are sized by data volume (``auto_buckets``: a
rows-per-bucket target) so the one map_groups task that joins a bucket
has flat peak memory as SF grows (VERDICT r02 #6).

Both shrink the fact side FIRST: lineitem revenue is pre-aggregated to one
row per orderkey (exact integer cents) before any shuffle, so the join
moves 150k rows instead of 600k.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from agentic_doc_ray.context import auto_buckets, partitions_for, shuffle_partitions


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
    n_rows = ds.count()
    n_buckets = auto_buckets(n_rows)

    def to_cents(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        cents = pc.round(pc.multiply(rev, pa.scalar(10000.0))).cast(pa.int64())
        bucket = pc.cast(
            pc.bit_wise_and(
                batch.column("l_orderkey"), pa.scalar(n_buckets - 1, pa.int64())
            ),
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
        .groupby("bucket", num_partitions=partitions_for(n_rows))
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
    # 8 partitions, not 16: each hash-shuffle partition is a cold-spawned
    # aggregator actor and this plan already carries two other aggregator
    # fleets (pre-agg + finalize); measured 26.5 s vs 36.1 s on an aged
    # 32-CPU session at sf0.1 with no loss at this data size.
    joined = orders.join(
        rev,
        join_type="inner",
        num_partitions=partitions_for(orders.count()),
        on=("o_orderkey",),
    )
    return _finalize(joined)


def customers_without_urgent(
    sf_dir: str, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """ANTI-join: customers with no '1-URGENT' order. Same one-exchange
    bucketed pattern as the hash join (tag sides -> union -> groupby
    bucket), with the probe side pre-deduplicated per batch (distinct
    custkeys, not order rows, cross the wire) and the per-bucket resolve a
    vectorized ``is_in`` invert — no pairwise work anywhere."""
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    # rows-per-bucket target keeps per-bucket group memory flat as SF grows
    n_rows = orders.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    if customer.count() == 0:  # metadata-only; zero-row shuffle guard
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"c_custkey": pa.array([], pa.int64()), "c_name": pa.array([], pa.string())}
            )
        )

    def tag_customer(batch: pa.Table) -> pa.Table:
        key = batch.column("c_custkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [bucket, key, pa.array(["cust"] * batch.num_rows, pa.string()), batch.column("c_name")],
            names=["bucket", "c_custkey", "side", "c_name"],
        )

    def tag_urgent(batch: pa.Table) -> pa.Table:
        urgent = batch.filter(
            pc.equal(batch.column("o_orderpriority"), "1-URGENT")
        )
        # batch-local distinct: one row per custkey per batch
        d = urgent.select(["o_custkey"]).group_by("o_custkey").aggregate([])
        key = d.column("o_custkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [bucket, key, pa.array(["urgent"] * d.num_rows, pa.string()), pa.nulls(d.num_rows, pa.string())],
            names=["bucket", "c_custkey", "side", "c_name"],
        )

    unioned = customer.map_batches(tag_customer, batch_format="pyarrow").union(
        orders.map_batches(tag_urgent, batch_format="pyarrow")
    )

    def anti_bucket(group: pa.Table) -> pa.Table:
        is_cust = pc.equal(group.column("side"), "cust")
        cust = group.filter(is_cust)
        urgent_keys = group.filter(pc.invert(is_cust)).column("c_custkey")
        keep = pc.invert(
            pc.is_in(cust.column("c_custkey"), value_set=urgent_keys.combine_chunks())
        )
        out = cust.filter(keep)
        return out.select(["c_custkey", "c_name"])

    return unioned.groupby(
        # partition count stays well below the bucket-key count: each
        # hash-shuffle partition is a cold-spawned aggregator actor, and 8
        # partitions x 4 bucket keys each give the same parallelism with a
        # quarter of the actor spawns (aged-session latency, BASELINE.md)
        "bucket", num_partitions=partitions_for(n_rows)
    ).map_groups(anti_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-filter semi-join


_BLOOM_BITS = 1 << 20  # 128 KiB per filter; sized for build sides ~<100k keys
_BLOOM_HASHES = 4


def _bloom_positions(keys: "pa.Array") -> "tuple":
    """k hash positions per key via splitmix64 double hashing (vectorized)."""
    import numpy as np

    x = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        h1 = z & np.uint64(_BLOOM_BITS - 1)
        h2 = ((z >> np.uint64(32)) | np.uint64(1)) & np.uint64(_BLOOM_BITS - 1)
        return tuple(
            ((h1 + np.uint64(i) * h2) & np.uint64(_BLOOM_BITS - 1)).astype(np.int64)
            for i in range(_BLOOM_HASHES)
        )


def urgent_revenue_bloom(
    sf_dir: str, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """Revenue of '1-URGENT' orders' lineitems per returnflag, probed
    through a broadcast Bloom filter.

    The Bloom filter is the SCALE device: the probe side tests membership
    against 128 KiB of bits instead of shuffling every lineitem row into
    the join — only bloom-positive rows (true matches + ~0.1% false
    positives at these parameters) enter the exact bucketed semi-join that
    removes false positives, so the result is EXACT. The filter is built
    distributed: per-batch partial bitmaps tree-reduce (OR within a few
    repartitioned blocks) before the driver reads O(4) bitmaps, however
    many build batches there were."""
    import numpy as np

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    # the bloom-positive lineitem stream dominates the exchange: size the
    # bucket fan-out by it, not by a constant
    n_rows = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    urgent = orders.map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderpriority"), "1-URGENT")).select(
            ["o_orderkey"]
        ),
        batch_format="pyarrow",
    )

    def build_partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        for pos in _bloom_positions(batch.column("o_orderkey").combine_chunks()):
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.Table.from_pydict(
            {
                "bits": pa.array([bits.tobytes()], pa.binary()),
                "n": pa.array([batch.num_rows], pa.int64()),
            }
        )

    def or_merge(batch: pa.Table) -> pa.Table:
        # tree-reduce level: OR every partial bitmap in this block into one
        import numpy as np

        acc = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        total = 0
        for row in batch.to_pylist():
            acc |= np.frombuffer(row["bits"], dtype=np.uint8)
            total += row["n"]
        return pa.Table.from_pydict(
            {"bits": pa.array([acc.tobytes()], pa.binary()),
             "n": pa.array([total], pa.int64())}
        )

    merged = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    n_build = 0
    # two-level reduce: per-batch bitmaps OR within 4 blocks first, so the
    # driver reads O(4) bitmaps however many build batches there were
    reduced = (
        urgent.map_batches(build_partial, batch_format="pyarrow")
        .repartition(shuffle_partitions(4))
        .map_batches(or_merge, batch_format="pyarrow", batch_size=None)
    )
    for r in reduced.take_all():
        merged |= np.frombuffer(r["bits"], dtype=np.uint8)
        n_build += r["n"]
    if n_build == 0:
        # empty build side: the semi-join result is definitionally empty,
        # and an all-empty union would crash Ray's zero-row hash shuffle
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "revenue": pa.array([], pa.float64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        )
    bloom_ref = ray.put(merged)

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        keys = batch.column("l_orderkey").combine_chunks()
        hit = np.ones(len(keys), dtype=bool)
        for pos in _bloom_positions(keys):
            hit &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        f = batch.filter(pa.array(hit))
        rev = pc.multiply(
            f.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), f.column("l_discount")),
        )
        cents = pc.round(pc.multiply(rev, pa.scalar(10000.0))).cast(pa.int64())
        t = pa.Table.from_arrays(
            [f.column("l_orderkey"), f.column("l_returnflag"), cents],
            names=["o_orderkey", "l_returnflag", "cents"],
        )
        # batch-local partial: (orderkey, flag) rows with count + cents
        g = t.group_by(["o_orderkey", "l_returnflag"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        ).rename_columns(["o_orderkey", "l_returnflag", "cents", "n_items"])
        key = g.column("o_orderkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [
                bucket,
                key,
                pa.array(["probe"] * g.num_rows, pa.string()),
                g.column("l_returnflag"),
                g.column("cents"),
                g.column("n_items"),
            ],
            names=["bucket", "o_orderkey", "side", "l_returnflag", "cents", "n_items"],
        )

    def tag_build(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                bucket,
                key,
                pa.array(["build"] * n, pa.string()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            names=["bucket", "o_orderkey", "side", "l_returnflag", "cents", "n_items"],
        )

    unioned = lineitem.map_batches(probe, batch_format="pyarrow").union(
        urgent.map_batches(tag_build, batch_format="pyarrow")
    )

    def verify_bucket(group: pa.Table) -> pa.Table:
        is_probe = pc.equal(group.column("side"), "probe")
        probe_rows = group.filter(is_probe)
        true_keys = group.filter(pc.invert(is_probe)).column("o_orderkey")
        keep = pc.is_in(
            probe_rows.column("o_orderkey"), value_set=true_keys.combine_chunks()
        )
        kept = probe_rows.filter(keep)
        g = kept.select(["l_returnflag", "cents", "n_items"]).group_by(
            "l_returnflag"
        ).aggregate([("cents", "sum"), ("n_items", "sum")])
        return g.rename_columns(["l_returnflag", "cents", "n_items"])

    partials = unioned.groupby(
        # partition count stays well below the bucket-key count: each
        # hash-shuffle partition is a cold-spawned aggregator actor, and 8
        # partitions x 4 bucket keys each give the same parallelism with a
        # quarter of the actor spawns (aged-session latency, BASELINE.md)
        "bucket", num_partitions=partitions_for(n_rows)
    ).map_groups(verify_bucket, batch_format="pyarrow")
    np_ = shuffle_partitions(4)
    agg = partials.groupby(
        "l_returnflag", num_partitions=np_
    ).aggregate(Sum("cents", alias_name="cents"), Sum("n_items", alias_name="n_items"))
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("l_returnflag"),
                pc.divide(b.column("cents").cast(pa.float64()), 10000.0),
                b.column("n_items"),
            ],
            names=["l_returnflag", "revenue", "n_items"],
        ),
        batch_format="pyarrow",
    )


def order_priority_revenue_bucketed(
    sf_dir: str, n_buckets: int | None = None
) -> "ray.data.Dataset":
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
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)

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
                pa.array(["rev"] * g.num_rows, pa.string()),
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
                pa.array(["orders"] * batch.num_rows, pa.string()),
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
        # Arrow-native join: no pandas round-trip in the per-bucket task
        m = left.join(rev, keys="o_orderkey", join_type="inner")
        # priority partial-agg inside the bucket: 5 rows leave, not 150k
        g = (
            m.select(["o_orderpriority", "cents"])
            .group_by("o_orderpriority")
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        return g.rename_columns(["o_orderpriority", "cents", "n_orders"])

    partials = unioned.groupby(
        # partition count stays well below the bucket-key count: each
        # hash-shuffle partition is a cold-spawned aggregator actor, and 8
        # partitions x 4 bucket keys each give the same parallelism with a
        # quarter of the actor spawns (aged-session latency, BASELINE.md)
        "bucket", num_partitions=partitions_for(n_rows)
    ).map_groups(join_bucket, batch_format="pyarrow")
    np_ = shuffle_partitions(4)
    agg = partials.groupby(
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


def nation_returned_revenue(
    sf_dir: str, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """TPC-H Q10-shaped 4-table pipeline: revenue of RETURNED lineitems per
    nation — lineitem JOIN orders JOIN customer JOIN nation, two different
    join keys, exact integer cents.

    The multi-hop join playbook at scale:
      - filter + batch-local partial aggregation BEFORE the first exchange
        (only 'R' rows, one row per orderkey per batch crosses the wire);
      - exchange 1 on crc-free orderkey % B: join rev<->orders per bucket,
        then partial-agg to (custkey, cents, n_orders) INSIDE the bucket —
        the key switch (orderkey -> custkey) pays one re-exchange but the
        re-exchanged stream is already order-granular, not lineitem-rows;
      - exchange 2 on custkey % B: join with customer, partial-agg to
        (nationkey, ...) — at most #nations rows leave each bucket;
      - nation itself is a bounded dimension (25 rows at every TPC-H SF):
        read driver-side once and mapped via a vectorized numpy take, the
        broadcast-small-side pattern (never a shuffle).
    Both exchanges carry sentinel rows (side='sent'): each is fed by
    filtering/aggregating stages, the empty-first-block hash-shuffle race
    (_exchange.py).
    """
    import numpy as np

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)

    ex1_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("side", pa.string()),
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def tag_returned(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        rev = pc.multiply(
            f.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), f.column("l_discount")),
        )
        cents = pc.round(pc.multiply(rev, pa.scalar(10000.0))).cast(pa.int64())
        t = pa.Table.from_arrays(
            [f.column("l_orderkey"), cents], names=["o_orderkey", "cents"]
        )
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
                pa.array(["rev"] * g.num_rows, pa.string()),
                key,
                pa.nulls(g.num_rows, pa.int64()),
                g.column("cents"),
            ],
            schema=ex1_schema,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                bucket,
                pa.array(["ord"] * n, pa.string()),
                key,
                batch.column("o_custkey"),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex1_schema,
        )

    ex1 = (
        lineitem.map_batches(tag_returned, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1_schema, "bucket", fill={"side": "sent"}))
    )

    ex2_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("side", pa.string()),
            ("c_custkey", pa.int64()),
            ("c_nationkey", pa.int32()),
            ("cents", pa.int64()),
            ("n_orders", pa.int64()),
        ]
    )

    def join_orderkey_bucket(group: pa.Table) -> pa.Table:
        side = group.column("side")
        rev = (
            group.filter(pc.equal(side, "rev"))
            .select(["o_orderkey", "cents"])
            .group_by("o_orderkey")
            .aggregate([("cents", "sum")])
            .rename_columns(["o_orderkey", "cents"])
        )
        ords = group.filter(pc.equal(side, "ord")).select(
            ["o_orderkey", "o_custkey"]
        )
        # Arrow-native join: no pandas round-trip in the per-bucket task
        m = rev.join(ords, keys="o_orderkey", join_type="inner")
        # key switch: partial-agg per custkey inside the bucket; each rev
        # row here is one distinct order, so count == n distinct orders
        g = (
            m.select(["o_custkey", "cents"])
            .group_by("o_custkey")
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        key = g.column("o_custkey").combine_chunks()
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        n = g.num_rows
        return pa.Table.from_arrays(
            [
                bucket,
                pa.array(["rev"] * n, pa.string()),
                key,
                pa.nulls(n, pa.int32()),
                g.column("cents_sum").combine_chunks(),
                g.column("cents_count").cast(pa.int64()).combine_chunks(),
            ],
            schema=ex2_schema,
        )

    def tag_customer(batch: pa.Table) -> pa.Table:
        key = batch.column("c_custkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                bucket,
                pa.array(["cust"] * n, pa.string()),
                key,
                batch.column("c_nationkey").cast(pa.int32()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex2_schema,
        )

    per_cust = (
        ex1.groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(join_orderkey_bucket, batch_format="pyarrow")
        .union(customer.map_batches(tag_customer, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2_schema, "bucket", fill={"side": "sent"}))
    )

    # nation is a BOUNDED dimension (25 rows at any SF): driver-side read +
    # vectorized numpy take is the broadcast-small-side pattern
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nkeys = nat.column("n_nationkey").to_numpy()
    names_by_key = np.empty(int(nkeys.max()) + 1 if len(nkeys) else 1, dtype=object)
    names_by_key[nkeys] = nat.column("n_name").to_pylist()

    def join_custkey_bucket(group: pa.Table) -> pa.Table:
        side = group.column("side")
        rev = group.filter(pc.equal(side, "rev")).select(
            ["c_custkey", "cents", "n_orders"]
        )
        cust = group.filter(pc.equal(side, "cust")).select(
            ["c_custkey", "c_nationkey"]
        )
        # Arrow-native join: no pandas round-trip in the per-bucket task
        m = rev.join(cust, keys="c_custkey", join_type="inner")
        g = (
            m.select(["c_nationkey", "cents", "n_orders"])
            .group_by("c_nationkey")
            .aggregate([("cents", "sum"), ("n_orders", "sum")])
        )
        nk = np.asarray(g.column("c_nationkey").combine_chunks()).astype(np.int64)
        names = names_by_key[nk]
        return pa.Table.from_pydict(
            {
                "n_name": pa.array(list(names), pa.string()),
                "cents": g.column("cents_sum").combine_chunks(),
                "n_orders": g.column("n_orders_sum").combine_chunks(),
            }
        )

    partials = per_cust.groupby(
        "bucket", num_partitions=partitions_for(n_rows)
    ).map_groups(join_custkey_bucket, batch_format="pyarrow")
    np_ = shuffle_partitions(4)
    agg = partials.groupby(
        "n_name", num_partitions=np_
    ).aggregate(Sum("cents", alias_name="cents"), Sum("n_orders", alias_name="n_orders"))
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("n_name"),
                pc.divide(b.column("cents").cast(pa.float64()), 10000.0),
                b.column("n_orders"),
            ],
            names=["n_name", "revenue", "n_orders"],
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: outer join + aggregate-of-aggregate


def customer_order_distribution(
    sf_dir: str, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """Q13 (customer distribution): how many customers placed exactly k
    qualifying orders, INCLUDING k = 0 — the outer-join-then-double-
    aggregate shape (TPC-H Q13; the comment NOT LIKE predicate becomes a
    priority filter — the synth orders table has no comment column).

    Shape: orders pre-aggregate per batch to (custkey, n) partials, so
    the bucketed exchange moves one row per distinct custkey per batch —
    never order rows; customers ship key-only. Each bucket resolves the
    LEFT join (missing custkey => 0) and emits a PARTIAL histogram, so
    the second exchange moves at most |distinct counts| rows per bucket.
    Driver holds nothing.
    """
    from ray.data.aggregate import Sum

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    n_rows = orders.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("custkey", pa.int64()),
            ("side", pa.string()),
            ("n", pa.int64()),
        ]
    )
    if customer.count() == 0:  # metadata-only; zero-row shuffle guard
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "c_count": pa.array([], pa.int64()),
                    "custdist": pa.array([], pa.int64()),
                }
            )
        )

    def _bucket(key: "pa.ChunkedArray") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    def tag_customer(batch: pa.Table) -> pa.Table:
        key = batch.column("c_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["c"] * batch.num_rows, pa.string()),
                pa.nulls(batch.num_rows, pa.int64()),
            ],
            schema=ex_schema,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        qual = batch.filter(
            pc.not_equal(batch.column("o_orderpriority"), "1-URGENT")
        )
        d = (
            qual.select(["o_custkey"])
            .group_by("o_custkey")
            .aggregate([("o_custkey", "count")])
        )  # batch-local partial counts
        key = d.column("o_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * d.num_rows, pa.string()),
                d.column("o_custkey_count").cast(pa.int64()),
            ],
            schema=ex_schema,
        )

    def hist_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_cust = pc.equal(g.column("side"), "c")
        cust = g.filter(is_cust).select(["custkey"])
        if cust.num_rows == 0:
            return pa.table(
                {
                    "c_count": pa.array([], pa.int64()),
                    "n_cust": pa.array([], pa.int64()),
                }
            )
        sums = (
            g.filter(pc.invert(is_cust))
            .select(["custkey", "n"])
            .group_by("custkey")
            .aggregate([("n", "sum")])
            .rename_columns(["custkey", "c_count"])
        )
        m = cust.join(sums, keys="custkey", join_type="left outer")
        counts = m.column("c_count").combine_chunks().fill_null(0)  # LEFT: 0
        h = (
            pa.Table.from_arrays([counts], names=["c_count"])
            .group_by("c_count")
            .aggregate([("c_count", "count")])
        )  # -> (c_count, c_count_count)
        return pa.Table.from_arrays(
            [
                h.column("c_count").cast(pa.int64()),
                h.column("c_count_count").cast(pa.int64()),
            ],
            names=["c_count", "n_cust"],
        )

    unioned = (
        customer.map_batches(tag_customer, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .union(int_key_sentinels(ex_schema, "bucket", fill={"side": "sent"}))
    )
    partial_hist = unioned.groupby(
        "bucket", num_partitions=partitions_for(n_rows)
    ).map_groups(hist_bucket, batch_format="pyarrow")
    np_ = shuffle_partitions(4)
    return (
        partial_hist.groupby("c_count", num_partitions=np_)
        .aggregate(Sum("n_cust", alias_name="custdist"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: aggregate -> HAVING filter -> join back


def large_quantity_orders(
    sf_dir: str, min_qty: int = 250, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """Q18 (large-volume customers): orders whose total lineitem quantity
    exceeds ``min_qty``, with customer name attached — the
    aggregate-then-HAVING-then-join-back shape.

    Shape: per-order quantity sums ride the same coarse-bucket exchange
    as the revenue aggregate; the HAVING filter runs INSIDE each bucket,
    so only qualifying (orderkey, qty) rows — bounded by the threshold's
    selectivity, not by order count — reach the driver for a broadcast.
    Orders then stream once against the broadcast map (no exchange), and
    the tiny matched set joins customer names through one key-only
    bucketed exchange. Money stays exact integer cents.
    """
    import logging

    import ray as _ray

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    qty_ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    n_rows = qty_ds.count()
    n_buckets = n_buckets or auto_buckets(n_rows)

    def qty_partial(batch: pa.Table) -> pa.Table:
        q = pc.round(batch.column("l_quantity")).cast(pa.int64())
        t = (
            pa.Table.from_arrays(
                [batch.column("l_orderkey"), q], names=["o_orderkey", "qty"]
            )
            .group_by("o_orderkey")
            .aggregate([("qty", "sum")])
        )
        key = t.column("o_orderkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [bucket, key, t.column("qty_sum").combine_chunks()],
            names=["bucket", "o_orderkey", "qty"],
        )

    def having_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(  # drop the exchange-guard sentinel rows
            pc.greater_equal(group.column("o_orderkey"), pa.scalar(0, pa.int64()))
        )
        g = (
            g.select(["o_orderkey", "qty"])
            .group_by("o_orderkey")
            .aggregate([("qty", "sum")])
        )
        keep = pc.greater(g.column("qty_sum"), pa.scalar(min_qty, pa.int64()))
        out = g.filter(keep)
        return out.rename_columns(["o_orderkey", "qty"])

    qty_schema = pa.schema(
        [("bucket", pa.int32()), ("o_orderkey", pa.int64()), ("qty", pa.int64())]
    )
    hot_rows = (
        qty_ds.map_batches(qty_partial, batch_format="pyarrow")
        # empty-first-block guard: a zero-row input block makes qty_partial
        # emit an empty table, and Ray's hash shuffle then skips the schema
        # broadcast for that sequence (_exchange.py) — sentinel rows keep
        # every partition non-empty; o_orderkey=-1 is dropped above
        .union(
            int_key_sentinels(
                qty_schema, "bucket", fill={"o_orderkey": -1, "qty": 0}
            )
        )
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(having_bucket, batch_format="pyarrow")
        .take_all()
    )  # bounded by HAVING selectivity, never by order count
    if len(hot_rows) > 1_000_000:
        logging.getLogger(__name__).warning(
            "large_quantity_orders: %d qualifying orders broadcast to every "
            "worker — raise min_qty if this threshold stops being selective",
            len(hot_rows),
        )
    hot = {r["o_orderkey"]: r["qty"] for r in hot_rows}
    href = _ray.put(hot)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("custkey", pa.int64()),
            ("side", pa.string()),
            ("o_orderkey", pa.int64()),
            ("total_cents", pa.int64()),
            ("qty", pa.int64()),
            ("c_name", pa.string()),
        ]
    )

    def probe_orders(batch: pa.Table, *, _h=href) -> pa.Table:
        cache = probe_orders.__dict__
        if "hot" not in cache:
            cache["hot"] = _ray.get(_h)
            cache["keys"] = pa.array(list(cache["hot"]), pa.int64())
        m = batch.filter(
            pc.is_in(batch.column("o_orderkey"), value_set=cache["keys"])
        )
        qty = pa.array(
            [cache["hot"][k] for k in m.column("o_orderkey").to_pylist()],
            pa.int64(),
        )  # tiny: only qualifying orders survive the filter
        cents = pc.round(
            pc.multiply(m.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        key = m.column("o_custkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [
                bucket,
                key,
                pa.array(["o"] * m.num_rows, pa.string()),
                m.column("o_orderkey"),
                cents,
                qty,
                pa.nulls(m.num_rows, pa.string()),
            ],
            schema=ex_schema,
        )

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def tag_customer(batch: pa.Table) -> pa.Table:
        key = batch.column("c_custkey")
        n = batch.num_rows
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [
                bucket,
                key,
                pa.array(["c"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                batch.column("c_name"),
            ],
            schema=ex_schema,
        )

    def join_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_o = pc.equal(g.column("side"), "o")
        o = g.filter(is_o).select(
            ["custkey", "o_orderkey", "total_cents", "qty"]
        )
        if o.num_rows == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "total_cents": pa.array([], pa.int64()),
                    "qty": pa.array([], pa.int64()),
                }
            )
        c = g.filter(pc.invert(is_o)).select(["custkey", "c_name"])
        m = o.join(c, keys="custkey", join_type="inner")
        return pa.Table.from_arrays(
            [
                m.column("custkey"),
                m.column("c_name").combine_chunks(),
                m.column("o_orderkey").combine_chunks(),
                m.column("total_cents").combine_chunks(),
                m.column("qty").combine_chunks(),
            ],
            names=["c_custkey", "c_name", "o_orderkey", "total_cents", "qty"],
        )

    return (
        orders.map_batches(probe_orders, batch_format="pyarrow")
        .union(customer.map_batches(tag_customer, batch_format="pyarrow"))
        .union(int_key_sentinels(ex_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q3 shape (shipping priority): top-k unshipped orders of one
    market segment by outstanding revenue — customer ⋈ orders ⋈ lineitem
    with filters on all three tables and a global top-k.

    Scale shape — two bucketed exchanges plus a tiny top-k merge:

    1. orders ⋉ customer semi-join keyed by custkey: the customer side
       ships KEYS ONLY (custkey of the segment's customers — customer
       scales with SF, so no broadcast), the orders side is date-filtered
       first; per-bucket resolve is a vectorized ``is_in``.
    2. revenue join keyed by orderkey: lineitem is shipdate-filtered and
       pre-aggregated per batch to exact integer cents per orderkey
       before the exchange; the per-bucket task joins Arrow-native and
       emits only its LOCAL top-k — so the final global merge sees
       ≤ k×buckets rows regardless of SF.
    3. the k×buckets partials go through Ray's sort + limit(k) (tiny).

    Ordering is fully deterministic: (revenue DESC, o_orderdate ASC,
    l_orderkey ASC) — no tie can diverge from the SQL oracle. Both
    exchanges feed ``map_groups`` from filtering stages, so they union
    sentinel rows against Ray's empty-first-block schema race
    (functions/_exchange.py).
    """
    import numpy as np

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    cut = pa.scalar(np.datetime64(cutoff, "us"))

    ex1_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
        ]
    )

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    def tag_cust(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch.column("c_mktsegment"), segment))
        key = f.column("c_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["c"] * f.num_rows, pa.string()),
                pa.nulls(f.num_rows, pa.int64()),
                pa.nulls(f.num_rows, pa.timestamp("us")),
            ],
            schema=ex1_schema,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.less(batch.column("o_orderdate"), cut))
        key = f.column("o_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * f.num_rows, pa.string()),
                f.column("o_orderkey"),
                f.column("o_orderdate").cast(pa.timestamp("us")),
            ],
            schema=ex1_schema,
        )

    def semi_bucket(group: pa.Table) -> pa.Table:
        group = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_c = pc.equal(group.column("side"), "c")
        ckeys = group.filter(is_c).column("key").combine_chunks()
        o = group.filter(pc.invert(is_c))
        hit = o.filter(pc.is_in(o.column("key"), value_set=ckeys))
        return hit.select(["o_orderkey", "o_orderdate"])

    surviving = (
        customer.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(semi_bucket, batch_format="pyarrow")
    )

    ex2_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("cents", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
        ]
    )

    def tag_rev(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater(batch.column("l_shipdate"), cut))
        cents = pc.round(
            pc.multiply(
                pc.multiply(
                    f.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), f.column("l_discount")),
                ),
                pa.scalar(10000.0),
            )
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [f.column("l_orderkey"), cents], names=["key", "cents"]
        )
        g = (
            t.group_by("key").aggregate([("cents", "sum")])
            .rename_columns(["key", "cents"])
        )
        key = g.column("key")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["r"] * g.num_rows, pa.string()),
                g.column("cents"),
                pa.nulls(g.num_rows, pa.timestamp("us")),
            ],
            schema=ex2_schema,
        )

    def tag_surviving(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * batch.num_rows, pa.string()),
                pa.nulls(batch.num_rows, pa.int64()),
                batch.column("o_orderdate"),
            ],
            schema=ex2_schema,
        )

    out_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("cents", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
        ]
    )

    def join_topk(group: pa.Table) -> pa.Table:
        group = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_r = pc.equal(group.column("side"), "r")
        rev = (
            group.filter(is_r)
            .select(["key", "cents"])
            .group_by("key")
            .aggregate([("cents", "sum")])
            .rename_columns(["key", "cents"])
        )
        o = group.filter(pc.invert(is_r)).select(["key", "o_orderdate"])
        m = o.join(rev, keys="key", join_type="inner")
        # bucket-local top-k: only k rows per bucket reach the global merge
        order = pc.sort_indices(
            m,
            sort_keys=[
                ("cents", "descending"),
                ("o_orderdate", "ascending"),
                ("key", "ascending"),
            ],
        )
        m = m.take(order.slice(0, k))
        return pa.Table.from_arrays(
            [m.column("key"), m.column("cents"), m.column("o_orderdate")],
            schema=out_schema,
        )

    partials = (
        surviving.map_batches(tag_surviving, batch_format="pyarrow")
        .union(lineitem.map_batches(tag_rev, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(join_topk, batch_format="pyarrow")
    )

    top = partials.sort(
        key=["cents", "o_orderdate", "l_orderkey"],
        descending=[True, False, False],
    ).limit(k)
    return top.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("l_orderkey"),
                pc.divide(b.column("cents").cast(pa.float64()), 10000.0),
                b.column("o_orderdate"),
            ],
            names=["l_orderkey", "revenue", "o_orderdate"],
        ),
        batch_format="pyarrow",
    )


def late_shipment_priority(
    sf_dir: str, late_days: int = 90, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """TPC-H Q12 shape: per returnflag class, how many LATE lineitems
    (shipped more than ``late_days`` after the order date — a derived
    condition that requires the join) belong to high-priority orders
    (1-URGENT / 2-HIGH) vs the rest.

    One bucketed exchange keyed by orderkey: orders ship
    (key, orderdate, a precomputed high/low bit), lineitem ships
    (key, returnflag, shipdate); the per-bucket task joins Arrow-native,
    applies the interval predicate vectorized, and emits ≤ |returnflag|
    partial rows — a tiny groupby finishes. Sentinel-guarded (both
    feeders can emit zero-row blocks).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    late_us = np.timedelta64(late_days, "D").astype("timedelta64[us]")

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("high", pa.int8()),
            ("ts", pa.timestamp("us")),
            ("l_returnflag", pa.string()),
        ]
    )

    def _bucket(key):
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        high = pc.cast(
            pc.is_in(
                batch.column("o_orderpriority"),
                value_set=pa.array(["1-URGENT", "2-HIGH"]),
            ),
            pa.int8(),
        )
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * batch.num_rows, pa.string()),
                high,
                batch.column("o_orderdate").cast(pa.timestamp("us")),
                pa.nulls(batch.num_rows, pa.string()),
            ],
            schema=ex_schema,
        )

    def tag_lines(batch: pa.Table) -> pa.Table:
        key = batch.column("l_orderkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * batch.num_rows, pa.string()),
                pa.nulls(batch.num_rows, pa.int8()),
                batch.column("l_shipdate").cast(pa.timestamp("us")),
                batch.column("l_returnflag"),
            ],
            schema=ex_schema,
        )

    def join_bucket(group: pa.Table) -> pa.Table:
        group = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_o = pc.equal(group.column("side"), "o")
        o = (
            group.filter(is_o)
            .select(["key", "high", "ts"])
            .rename_columns(["key", "high", "odate"])
        )
        l = group.filter(pc.invert(is_o)).select(["key", "ts", "l_returnflag"])
        m = l.join(o, keys="key", join_type="inner")
        odate = m.column("odate").to_numpy(zero_copy_only=False)
        sdate = m.column("ts").to_numpy(zero_copy_only=False)
        late = pa.array(sdate > odate + late_us)
        m = m.filter(late)
        hi = pc.cast(m.column("high"), pa.int64())
        t = pa.Table.from_arrays(
            [
                m.column("l_returnflag"),
                hi,
                pc.subtract(pa.scalar(1, pa.int64()), hi),
            ],
            names=["l_returnflag", "high_line_count", "low_line_count"],
        )
        g = t.group_by("l_returnflag").aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "high_line_count", "low_line_count"]
        )

    partials = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(lineitem.map_batches(tag_lines, batch_format="pyarrow"))
        .union(int_key_sentinels(ex_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(join_bucket, batch_format="pyarrow")
    )
    return partials.groupby(
        "l_returnflag", num_partitions=shuffle_partitions(4)
    ).aggregate(
        Sum("high_line_count", alias_name="high_line_count"),
        Sum("low_line_count", alias_name="low_line_count"),
    )


def promo_revenue_share(
    sf_dir: str, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """TPC-H Q14 shape: what share of revenue comes from PROMO parts —
    lineitem ⋈ part on partkey (both sides scale, so a bucketed
    exchange), exact integer cents all the way, one summary row
    (promo_cents, total_cents, promo_per_mille via integer division).

    The lineitem side pre-aggregates per batch to one cents row per
    partkey; the part side ships (partkey, is_promo 0/1). Each bucket
    emits ONE partial row, so the final merge is a ≤buckets-row
    aggregate."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("v", pa.int64()),
        ]
    )

    def _bucket(key):
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    def tag_part(batch: pa.Table) -> pa.Table:
        key = batch.column("p_partkey")
        promo = pc.cast(
            pc.equal(batch.column("p_type"), "PROMO"), pa.int64()
        )
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["p"] * batch.num_rows, pa.string()),
                promo,
            ],
            schema=ex_schema,
        )

    def tag_rev(batch: pa.Table) -> pa.Table:
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
            [batch.column("l_partkey"), cents], names=["key", "v"]
        )
        g = t.group_by("key").aggregate([("v", "sum")]).rename_columns(["key", "v"])
        return pa.Table.from_arrays(
            [
                _bucket(g.column("key")),
                g.column("key"),
                pa.array(["r"] * g.num_rows, pa.string()),
                g.column("v"),
            ],
            schema=ex_schema,
        )

    def bucket_partial(group: pa.Table) -> pa.Table:
        group = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_p = pc.equal(group.column("side"), "p")
        p = (
            group.filter(is_p)
            .select(["key", "v"])
            .rename_columns(["key", "promo"])
        )
        r = (
            group.filter(pc.invert(is_p))
            .select(["key", "v"])
            .group_by("key")
            .aggregate([("v", "sum")])
            .rename_columns(["key", "cents"])
        )
        m = r.join(p, keys="key", join_type="inner")
        cents = m.column("cents")
        promo = pc.sum(pc.multiply(cents, m.column("promo"))).as_py() or 0
        total = pc.sum(cents).as_py() or 0
        return pa.table(
            {
                "promo_cents": pa.array([promo], pa.int64()),
                "total_cents": pa.array([total], pa.int64()),
            }
        )

    partials = (
        part.map_batches(tag_part, batch_format="pyarrow")
        .union(lineitem.map_batches(tag_rev, batch_format="pyarrow"))
        .union(int_key_sentinels(ex_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(bucket_partial, batch_format="pyarrow")
    )

    def finish(batch: pa.Table) -> pa.Table:
        promo = pc.sum(batch.column("promo_cents")).as_py() or 0
        total = pc.sum(batch.column("total_cents")).as_py() or 0
        pm = (1000 * promo) // total if total else 0
        return pa.table(
            {
                "promo_cents": pa.array([promo], pa.int64()),
                "total_cents": pa.array([total], pa.int64()),
                "promo_per_mille": pa.array([pm], pa.int64()),
            }
        )

    # bucket partials are ≤ n_buckets rows: fold them in one tiny task
    return partials.repartition(1).map_batches(finish, batch_format="pyarrow")


def _order_supplier_streams(
    sf_dir: str,
    nation_keys: "pa.Array",
    lo,
    hi,
    n_buckets: int | None,
):
    """Shared exchanges 1-2 of the Q5/Q7 family: survivor orders
    (o_orderkey, cust_nationkey) via the custkey exchange and
    supplier-attributed revenue partials (orderkey, supp_nationkey,
    cents) via the suppkey exchange, both restricted to ``nation_keys``.
    Returns (surviving_orders, supplier_revenue, n_buckets, n_rows)."""
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supplier = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    # --- exchange 1: orders ⋈ customer on custkey -----------------------
    ex1_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("nationkey", pa.int32()),
            ("o_orderkey", pa.int64()),
        ]
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.is_in(batch.column("c_nationkey"), value_set=nation_keys))
        key = f.column("c_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["c"] * f.num_rows, pa.string()),
                f.column("c_nationkey"),
                pa.nulls(f.num_rows, pa.int64()),
            ],
            schema=ex1_schema,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        f = batch.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        key = f.column("o_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * f.num_rows, pa.string()),
                pa.nulls(f.num_rows, pa.int32()),
                f.column("o_orderkey"),
            ],
            schema=ex1_schema,
        )

    def cust_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_c = pc.equal(g.column("side"), "c")
        cust = g.filter(is_c).select(["key", "nationkey"])
        o = g.filter(pc.invert(is_c)).select(["key", "o_orderkey"])
        if cust.num_rows == 0 or o.num_rows == 0:
            return pa.schema(
                [("o_orderkey", pa.int64()), ("cust_nationkey", pa.int32())]
            ).empty_table()
        m = o.join(cust, keys="key", join_type="inner")
        return pa.Table.from_arrays(
            [m.column("o_orderkey"), m.column("nationkey")],
            names=["o_orderkey", "cust_nationkey"],
        )

    surviving_orders = (
        customer.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(cust_bucket, batch_format="pyarrow")
    )

    # --- exchange 2: lineitem ⋈ supplier on suppkey ---------------------
    ex2_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("nationkey", pa.int32()),
            ("orderkey", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def tag_supp(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.is_in(batch.column("s_nationkey"), value_set=nation_keys))
        key = f.column("s_suppkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["s"] * f.num_rows, pa.string()),
                f.column("s_nationkey"),
                pa.nulls(f.num_rows, pa.int64()),
                pa.nulls(f.num_rows, pa.int64()),
            ],
            schema=ex2_schema,
        )

    def tag_line(batch: pa.Table) -> pa.Table:
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
            [batch.column("l_suppkey"), batch.column("l_orderkey"), cents],
            names=["key", "orderkey", "cents"],
        )
        g = (
            t.group_by(["key", "orderkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["key", "orderkey", "cents"])
        )
        key = g.column("key")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * g.num_rows, pa.string()),
                pa.nulls(g.num_rows, pa.int32()),
                g.column("orderkey"),
                g.column("cents"),
            ],
            schema=ex2_schema,
        )

    def supp_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_s = pc.equal(g.column("side"), "s")
        supp = g.filter(is_s).select(["key", "nationkey"])
        li = g.filter(pc.invert(is_s)).select(["key", "orderkey", "cents"])
        out_schema = pa.schema(
            [
                ("orderkey", pa.int64()),
                ("supp_nationkey", pa.int32()),
                ("cents", pa.int64()),
            ]
        )
        if supp.num_rows == 0 or li.num_rows == 0:
            return out_schema.empty_table()
        m = li.join(supp, keys="key", join_type="inner")
        # collapse the suppkey dimension before the orderkey exchange
        g2 = (
            m.select(["orderkey", "nationkey", "cents"])
            .group_by(["orderkey", "nationkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["orderkey", "supp_nationkey", "cents"])
        )
        return g2.cast(out_schema)

    supplier_revenue = (
        supplier.map_batches(tag_supp, batch_format="pyarrow")
        .union(lineitem.map_batches(tag_line, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(supp_bucket, batch_format="pyarrow")
    )

    return surviving_orders, supplier_revenue, n_buckets, n_rows


def regional_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q5 shape (local supplier volume): revenue per nation from
    lineitems where the SUPPLIER and the ordering CUSTOMER sit in the same
    nation of one region — the classic 6-table join
    (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier).

    Scale shape — dimension broadcast + three bucketed exchanges, each
    moving only keys/partials, never full fact rows:

    1. region ⋈ nation collapses DRIVER-SIDE to a nationkey set + name
       dict (25 nations total; a true bounded dimension — the same
       broadcast rule as ``nation_returned_revenue``).
    2. exchange 1 (custkey): region-filtered customers ship
       (custkey, nationkey); date-filtered orders ship
       (custkey, orderkey). Per-bucket vectorized hash join emits
       (orderkey, cust_nationkey) — one row per surviving order.
    3. exchange 2 (suppkey): region-filtered suppliers ship
       (suppkey, nationkey); lineitem ships revenue PARTIALS
       pre-aggregated per (batch, orderkey, suppkey) in exact integer
       cents. Per-bucket join emits (orderkey, supp_nationkey, cents)
       re-aggregated per (orderkey, nationkey) — the suppkey dimension is
       gone before the wide fact exchange.
    4. exchange 3 (orderkey): the two survivor streams meet; the bucket
       task joins on orderkey, keeps rows with cust_nationkey ==
       supp_nationkey (the Q5 co-location predicate — it CANNOT be
       evaluated earlier because the two nationkeys arrive via different
       join paths), and emits per-nation cents partials — ≤ 25 rows per
       bucket reach the final fold.

    All three exchanges feed ``map_groups`` from filtering stages, so
    each unions sentinel rows against Ray's empty-first-block schema race
    (functions/_exchange.py). Output: (n_name, revenue) sorted by
    revenue DESC — deterministic because revenue is an exact integer-cents
    sum (ties broken by n_name).
    """
    import numpy as np
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    # --- bounded dimension broadcast: region ⋈ nation (≤25 rows) --------
    nation_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region_tbl = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rkeys = region_tbl.filter(pc.equal(region_tbl.column("r_name"), region)).column(
        "r_regionkey"
    )
    nat = nation_tbl.filter(pc.is_in(nation_tbl.column("n_regionkey"), value_set=rkeys))
    nation_keys = nat.column("n_nationkey").combine_chunks().cast(pa.int32())
    nation_names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))
    surviving_orders, supplier_revenue, n_buckets, n_rows = (
        _order_supplier_streams(sf_dir, nation_keys, lo, hi, n_buckets)
    )

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    # --- exchange 3: co-location join on orderkey -----------------------
    ex3_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("nationkey", pa.int32()),
            ("cents", pa.int64()),
        ]
    )

    def tag_surviving(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * batch.num_rows, pa.string()),
                batch.column("cust_nationkey"),
                pa.nulls(batch.num_rows, pa.int64()),
            ],
            schema=ex3_schema,
        )

    def tag_revenue(batch: pa.Table) -> pa.Table:
        key = batch.column("orderkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * batch.num_rows, pa.string()),
                batch.column("supp_nationkey"),
                batch.column("cents"),
            ],
            schema=ex3_schema,
        )

    def colocate_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_o = pc.equal(g.column("side"), "o")
        o = (
            g.filter(is_o)
            .select(["key", "nationkey"])
            .rename_columns(["key", "cust_nationkey"])
        )
        li = g.filter(pc.invert(is_o)).select(["key", "nationkey", "cents"])
        out_schema = pa.schema([("nationkey", pa.int32()), ("cents", pa.int64())])
        if o.num_rows == 0 or li.num_rows == 0:
            return out_schema.empty_table()
        m = li.join(o, keys="key", join_type="inner")
        m = m.filter(pc.equal(m.column("nationkey"), m.column("cust_nationkey")))
        g2 = (
            m.select(["nationkey", "cents"])
            .group_by("nationkey")
            .aggregate([("cents", "sum")])
            .rename_columns(["nationkey", "cents"])
        )
        return g2.cast(out_schema)

    partials = (
        surviving_orders.map_batches(tag_surviving, batch_format="pyarrow")
        .union(supplier_revenue.map_batches(tag_revenue, batch_format="pyarrow"))
        .union(int_key_sentinels(ex3_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(colocate_bucket, batch_format="pyarrow")
    )

    def finish(batch: pa.Table) -> pa.Table:
        g = (
            batch.group_by("nationkey")
            .aggregate([("cents", "sum")])
            .rename_columns(["nationkey", "cents"])
        )
        names = pa.array(
            [nation_names[k] for k in g.column("nationkey").to_pylist()],
            pa.string(),
        )
        t = pa.Table.from_arrays(
            [
                names,
                pc.divide(g.column("cents").cast(pa.float64()), 10000.0),
            ],
            names=["n_name", "revenue"],
        )
        order = pc.sort_indices(
            t, sort_keys=[("revenue", "descending"), ("n_name", "ascending")]
        )
        return t.take(order)

    # ≤ 25 rows per bucket reach this single-task fold
    return partials.repartition(1).map_batches(finish, batch_format="pyarrow")


def large_volume_customer(
    sf_dir: str,
    qty_threshold: int = 150,
    k: int = 100,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q18 shape (large-volume customer): orders whose total lineitem
    quantity exceeds a threshold — the aggregate-HAVING semi-join — joined
    back to orders and customer, top-k by order value.

    Scale shape — two bucketed exchanges plus a tiny top-k merge:

    1. exchange 1 (orderkey): lineitem ships per-batch quantity PARTIALS
       per orderkey (quantities are integral, so int64 sums are exact);
       orders ships (orderkey, custkey, totalprice, orderdate). The
       bucket task finishes the quantity aggregate, applies the HAVING
       filter — the filter CANNOT move before the exchange because the
       total is only known after the cross-batch sum — joins the
       surviving orderkeys to their order rows, and emits only its LOCAL
       top-k by (totalprice DESC, orderkey), so the global merge sees
       ≤ k×buckets rows.
    2. the global sort + limit(k) runs on that bounded set (tiny).
    3. exchange 2 (custkey): resolves c_name for the k winners — the
       customer side ships (custkey, name) KEYS ONLY (customer scales
       with SF, so no broadcast; same rule as ``orders_by_segment``).

    Both exchanges feed ``map_groups`` from filtering stages, so each
    unions sentinel rows (functions/_exchange.py). Output deterministic:
    (o_totalprice DESC, o_orderkey ASC) total order.
    """
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    ex1_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("qty", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
        ]
    )

    def tag_line(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("l_orderkey"), qty], names=["key", "qty"]
        )
        g = (
            t.group_by("key").aggregate([("qty", "sum")])
            .rename_columns(["key", "qty"])
        )
        key = g.column("key")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * g.num_rows, pa.string()),
                g.column("qty"),
                pa.nulls(g.num_rows, pa.int64()),
                pa.nulls(g.num_rows, pa.float64()),
                pa.nulls(g.num_rows, pa.timestamp("us")),
            ],
            schema=ex1_schema,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * batch.num_rows, pa.string()),
                pa.nulls(batch.num_rows, pa.int64()),
                batch.column("o_custkey"),
                batch.column("o_totalprice"),
                batch.column("o_orderdate").cast(pa.timestamp("us")),
            ],
            schema=ex1_schema,
        )

    o1_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("total_qty", pa.int64()),
        ]
    )

    def having_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_l = pc.equal(g.column("side"), "l")
        qty = (
            g.filter(is_l)
            .select(["key", "qty"])
            .group_by("key")
            .aggregate([("qty", "sum")])
            .rename_columns(["key", "total_qty"])
        )
        qty = qty.filter(
            pc.greater(qty.column("total_qty"), pa.scalar(qty_threshold, pa.int64()))
        )
        o = g.filter(pc.invert(is_l)).select(
            ["key", "o_custkey", "o_totalprice", "o_orderdate"]
        )
        if qty.num_rows == 0 or o.num_rows == 0:
            return o1_schema.empty_table()
        m = o.join(qty, keys="key", join_type="inner")
        order = pc.sort_indices(
            m,
            sort_keys=[("o_totalprice", "descending"), ("key", "ascending")],
        )
        m = m.take(order.slice(0, k))
        return pa.Table.from_arrays(
            [
                m.column("key"),
                m.column("o_custkey"),
                m.column("o_totalprice"),
                m.column("o_orderdate"),
                m.column("total_qty"),
            ],
            schema=o1_schema,
        )

    winners = (
        lineitem.map_batches(tag_line, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(having_bucket, batch_format="pyarrow")
        .sort(key=["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )

    ex2_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("c_name", pa.string()),
            ("o_orderkey", pa.int64()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("total_qty", pa.int64()),
        ]
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        key = batch.column("c_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["c"] * batch.num_rows, pa.string()),
                batch.column("c_name"),
                pa.nulls(batch.num_rows, pa.int64()),
                pa.nulls(batch.num_rows, pa.float64()),
                pa.nulls(batch.num_rows, pa.timestamp("us")),
                pa.nulls(batch.num_rows, pa.int64()),
            ],
            schema=ex2_schema,
        )

    def tag_winner(batch: pa.Table) -> pa.Table:
        key = batch.column("o_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["w"] * batch.num_rows, pa.string()),
                pa.nulls(batch.num_rows, pa.string()),
                batch.column("o_orderkey"),
                batch.column("o_totalprice"),
                batch.column("o_orderdate"),
                batch.column("total_qty"),
            ],
            schema=ex2_schema,
        )

    out_schema = pa.schema(
        [
            ("c_name", pa.string()),
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_totalprice", pa.float64()),
            ("total_qty", pa.int64()),
        ]
    )

    def name_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_c = pc.equal(g.column("side"), "c")
        cust = g.filter(is_c).select(["key", "c_name"])
        w = g.filter(pc.invert(is_c)).select(
            ["key", "o_orderkey", "o_totalprice", "o_orderdate", "total_qty"]
        )
        if cust.num_rows == 0 or w.num_rows == 0:
            return out_schema.empty_table()
        m = w.join(cust, keys="key", join_type="inner")
        return pa.Table.from_arrays(
            [
                m.column("c_name"),
                m.column("o_orderkey"),
                m.column("o_orderdate"),
                m.column("o_totalprice"),
                m.column("total_qty"),
            ],
            schema=out_schema,
        )

    named = (
        customer.map_batches(tag_cust, batch_format="pyarrow")
        .union(winners.map_batches(tag_winner, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(customer.count()))
        .map_groups(name_bucket, batch_format="pyarrow")
    )
    return named.sort(
        key=["o_totalprice", "o_orderkey"], descending=[True, False]
    )


def nation_trade_volume(
    sf_dir: str,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_12",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q7 shape (volume shipping): revenue flowing BETWEEN two
    nations — supplier in one, ordering customer in the other — grouped
    by the ordered (supp_nation, cust_nation) pair.

    Reuses the Q5 family's shared exchanges
    (``_order_supplier_streams``): the nation-key set is the two-nation
    pair, so the custkey/suppkey exchanges prune both fact sides to the
    two nations before any wide shuffle. Exchange 3 (orderkey) then
    keeps CROSS-nation rows (supp != cust — the opposite predicate of
    Q5's co-location) and emits per-pair cents partials; ≤ 2 pair rows
    per bucket reach the fold. Output: (supp_nation, cust_nation,
    revenue), revenue DESC then names — fully deterministic.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    nation_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat = nation_tbl.filter(
        pc.is_in(
            nation_tbl.column("n_name"),
            value_set=pa.array([nation_a, nation_b], pa.string()),
        )
    )
    if nat.num_rows != 2:
        raise ValueError(f"nations not found: {nation_a}, {nation_b}")
    nation_keys = nat.column("n_nationkey").combine_chunks().cast(pa.int32())
    nation_names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))
    surviving_orders, supplier_revenue, n_buckets, n_rows = (
        _order_supplier_streams(sf_dir, nation_keys, lo, hi, n_buckets)
    )

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    ex3_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("nationkey", pa.int32()),
            ("cents", pa.int64()),
        ]
    )

    def tag_surviving(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * batch.num_rows, pa.string()),
                batch.column("cust_nationkey"),
                pa.nulls(batch.num_rows, pa.int64()),
            ],
            schema=ex3_schema,
        )

    def tag_revenue(batch: pa.Table) -> pa.Table:
        key = batch.column("orderkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * batch.num_rows, pa.string()),
                batch.column("supp_nationkey"),
                batch.column("cents"),
            ],
            schema=ex3_schema,
        )

    pair_schema = pa.schema(
        [
            ("supp_nationkey", pa.int32()),
            ("cust_nationkey", pa.int32()),
            ("cents", pa.int64()),
        ]
    )

    def cross_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_o = pc.equal(g.column("side"), "o")
        o = (
            g.filter(is_o)
            .select(["key", "nationkey"])
            .rename_columns(["key", "cust_nationkey"])
        )
        li = g.filter(pc.invert(is_o)).select(["key", "nationkey", "cents"])
        if o.num_rows == 0 or li.num_rows == 0:
            return pair_schema.empty_table()
        m = li.join(o, keys="key", join_type="inner")
        # Q7: CROSS-nation flows only (the co-location rows are Q5's)
        m = m.filter(
            pc.not_equal(m.column("nationkey"), m.column("cust_nationkey"))
        )
        g2 = (
            m.select(["nationkey", "cust_nationkey", "cents"])
            .group_by(["nationkey", "cust_nationkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["supp_nationkey", "cust_nationkey", "cents"])
        )
        return g2.cast(pair_schema)

    partials = (
        surviving_orders.map_batches(tag_surviving, batch_format="pyarrow")
        .union(supplier_revenue.map_batches(tag_revenue, batch_format="pyarrow"))
        .union(int_key_sentinels(ex3_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(cross_bucket, batch_format="pyarrow")
    )

    def finish(batch: pa.Table) -> pa.Table:
        g = (
            batch.group_by(["supp_nationkey", "cust_nationkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["supp_nationkey", "cust_nationkey", "cents"])
        )
        t = pa.Table.from_arrays(
            [
                pa.array(
                    [nation_names[k] for k in g.column("supp_nationkey").to_pylist()],
                    pa.string(),
                ),
                pa.array(
                    [nation_names[k] for k in g.column("cust_nationkey").to_pylist()],
                    pa.string(),
                ),
                pc.divide(g.column("cents").cast(pa.float64()), 10000.0),
            ],
            names=["supp_nation", "cust_nation", "revenue"],
        )
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("revenue", "descending"),
                ("supp_nation", "ascending"),
                ("cust_nation", "ascending"),
            ],
        )
        return t.take(order)

    return partials.repartition(1).map_batches(finish, batch_format="pyarrow")


def order_priority_check(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    late_days: int = 60,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q4 shape (order priority checking): how many orders of each
    priority, placed in one window, have AT LEAST ONE late lineitem —
    the EXISTS semi-join that must DEDUPE inside the join (an order with
    three late lines counts once; Q12 by contrast counts lines).

    Scale shape — one bucketed exchange plus a tiny priority merge:
    orders ship (orderkey, priority) for the date window; lineitem ships
    per-batch DISTINCT (orderkey, max shipdate) partials — the EXISTS
    test only needs each order's LATEST shipdate, so the fact side
    collapses to one row per (batch, orderkey) before the shuffle. The
    bucket task finishes the max-shipdate aggregate, evaluates the late
    predicate against o_orderdate (it needs both sides, so it cannot
    move earlier), and emits per-priority COUNTS — ≤ 5 rows per bucket
    reach the final fold. Sentinel-guarded (functions/_exchange.py).
    Output: (o_orderpriority, n_orders) sorted by priority.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
            ("max_shipdate", pa.timestamp("us")),
        ]
    )

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        f = batch.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        key = f.column("o_orderkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * f.num_rows, pa.string()),
                f.column("o_orderdate").cast(pa.timestamp("us")),
                f.column("o_orderpriority"),
                pa.nulls(f.num_rows, pa.timestamp("us")),
            ],
            schema=ex_schema,
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        g = (
            batch.group_by("l_orderkey")
            .aggregate([("l_shipdate", "max")])
            .rename_columns(["key", "max_shipdate"])
        )
        key = g.column("key")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * g.num_rows, pa.string()),
                pa.nulls(g.num_rows, pa.timestamp("us")),
                pa.nulls(g.num_rows, pa.string()),
                g.column("max_shipdate").cast(pa.timestamp("us")),
            ],
            schema=ex_schema,
        )

    part_schema = pa.schema(
        [("o_orderpriority", pa.string()), ("n_orders", pa.int64())]
    )

    def check_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_o = pc.equal(g.column("side"), "o")
        o = g.filter(is_o).select(["key", "o_orderdate", "o_orderpriority"])
        li = (
            g.filter(pc.invert(is_o))
            .select(["key", "max_shipdate"])
            .group_by("key")
            .aggregate([("max_shipdate", "max")])
            .rename_columns(["key", "max_shipdate"])
        )
        if o.num_rows == 0 or li.num_rows == 0:
            return part_schema.empty_table()
        m = o.join(li, keys="key", join_type="inner")
        import datetime

        late = pc.greater(
            m.column("max_shipdate"),
            pc.add(
                m.column("o_orderdate"),
                pa.scalar(datetime.timedelta(days=late_days)),
            ),
        )
        hit = m.filter(late)
        out = (
            hit.select(["o_orderpriority"])
            .group_by("o_orderpriority")
            .aggregate([("o_orderpriority", "count")])
            .rename_columns(["o_orderpriority", "n_orders"])
        )
        return out.cast(part_schema)

    partials = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(lineitem.map_batches(tag_line, batch_format="pyarrow"))
        .union(int_key_sentinels(ex_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(check_bucket, batch_format="pyarrow")
    )
    return (
        partials.groupby("o_orderpriority", num_partitions=partitions_for(8))
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("o_orderpriority")
    )


def top_revenue_supplier(
    sf_dir: str,
    date_lo: str = "1997-01-01",
    date_hi: str = "1997-04-01",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Q15 (top supplier): the supplier(s) whose shipped revenue inside a
    three-month window equals the global maximum — aggregate, then a
    scalar-subquery max, then a tie-preserving filter joined back to the
    supplier names.

    Scale shape: lineitem never leaves its scan — per-batch partials
    collapse the window's rows to one exact-cents row per suppkey before
    the one bucketed exchange, so the exchange payload is bounded by
    supplier count, not lineitem count. The merged revenue table is
    materialized ONCE (it feeds both the max() and the winner filter —
    a lazy dataset consumed twice re-executes its plan), the max is a
    Ray aggregate, and only the winners (ties included, typically one
    row) are broadcast against the supplier stream; supplier itself is
    never shuffled or collected.
    """
    import logging

    import numpy as np

    import ray as _ray

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    part_schema = pa.schema(
        [("bucket", pa.int32()), ("s_suppkey", pa.int64()), ("cents", pa.int64())]
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        m = batch.filter(
            pc.and_(
                pc.greater_equal(batch.column("l_shipdate"), lo),
                pc.less(batch.column("l_shipdate"), hi),
            )
        )
        rev = pc.multiply(
            m.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), m.column("l_discount")),
        )
        cents = pc.round(pc.multiply(rev, pa.scalar(10000.0))).cast(pa.int64())
        t = (
            pa.Table.from_arrays(
                [m.column("l_suppkey"), cents], names=["s_suppkey", "cents"]
            )
            .group_by("s_suppkey")
            .aggregate([("cents", "sum")])
        )
        key = t.column("s_suppkey")
        bucket = pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )
        return pa.Table.from_arrays(
            [bucket, key, t.column("cents_sum").combine_chunks()],
            schema=part_schema,
        )

    def merge_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(  # drop the exchange-guard sentinel rows
            pc.greater_equal(group.column("s_suppkey"), pa.scalar(0, pa.int64()))
        )
        out = (
            g.select(["s_suppkey", "cents"])
            .group_by("s_suppkey")
            .aggregate([("cents", "sum")])
        )
        return out.rename_columns(["s_suppkey", "cents"])

    revenue = (
        lineitem.map_batches(rev_partial, batch_format="pyarrow")
        # rev_partial filters (a batch fully outside the window emits zero
        # rows) -> sentinel rows guard Ray's empty-first-block schema race
        .union(int_key_sentinels(part_schema, "bucket", fill={"s_suppkey": -1, "cents": 0}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(merge_bucket, batch_format="pyarrow")
        .materialize()  # consumed twice below (max + winner filter)
    )

    from agentic_doc_ray.context import scalar_agg

    mx = scalar_agg(revenue, "cents", "max")

    def at_max(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("cents"), pa.scalar(mx, pa.int64())))

    winners = revenue.map_batches(
        at_max, batch_format="pyarrow"
    ).take_all()  # tiny: ties at the global max only
    if len(winners) > 100_000:
        logging.getLogger(__name__).warning(
            "top_revenue_supplier: %d suppliers tie at the max — broadcast "
            "larger than expected",
            len(winners),
        )
    wmap = {r["s_suppkey"]: r["cents"] for r in winners}
    wref = _ray.put(wmap)

    supplier = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )

    def attach(batch: pa.Table, *, _w=wref) -> pa.Table:
        cache = attach.__dict__
        if "w" not in cache:
            cache["w"] = _ray.get(_w)
            cache["keys"] = pa.array(list(cache["w"]), pa.int64())
        m = batch.filter(
            pc.is_in(batch.column("s_suppkey"), value_set=cache["keys"])
        )
        cents = [cache["w"][k] for k in m.column("s_suppkey").to_pylist()]
        return pa.Table.from_arrays(
            [
                m.column("s_suppkey"),
                m.column("s_name"),
                pc.divide(pa.array(cents, pa.int64()), pa.scalar(10000.0)),
            ],
            names=["s_suppkey", "s_name", "total_revenue"],
        )

    return supplier.map_batches(attach, batch_format="pyarrow")


def small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#23", max_size: int = 10
) -> "ray.data.Dataset":
    """Q17 (small-quantity-order revenue): revenue from lineitems of one
    brand's small parts whose quantity is below 20% of that part's average
    — the correlated-scalar-subquery shape (per-part avg joined back to
    the detail rows).

    Scale shape — two streamed passes over a pre-filtered lineitem, zero
    row exchanges:

    1. the qualifying partkey set (one brand x small sizes, ~0.8% of
       part) is collected ONCE and broadcast (logged if it outgrows the
       expected bound);
    2. pass 1 computes exact per-part (qty_sum, cnt) via per-batch
       partial group-bys merged on the driver — the merged table is
       bounded by the qualifying-part count, not lineitem count;
    3. pass 2 streams lineitem again and keeps rows with
       ``5 * qty * cnt < qty_sum`` (the exact-integer form of
       ``qty < 0.2 * avg(qty)`` — quantities are integral, so no float
       average is ever compared), summing exact cents per batch; the
       final reduce is a Ray ``sum`` over per-batch scalars.

    Output: one row ``(total_cents, avg_yearly)`` with
    ``avg_yearly = total_cents / 7 / 10000`` (TPC-H divides by 7 years).
    """
    import logging

    import ray as _ray

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )

    def qualifying(batch: pa.Table) -> pa.Table:
        m = batch.filter(
            pc.and_(
                pc.equal(batch.column("p_brand"), brand),
                pc.less_equal(batch.column("p_size"), pa.scalar(max_size)),
            )
        )
        return m.select(["p_partkey"])

    pkeys_rows = part.map_batches(qualifying, batch_format="pyarrow").take_all()
    if len(pkeys_rows) > 1_000_000:
        logging.getLogger(__name__).warning(
            "small_quantity_revenue: %d qualifying parts broadcast to every "
            "worker — narrow the brand/size predicate at this scale",
            len(pkeys_rows),
        )
    pkeys = pa.array([r["p_partkey"] for r in pkeys_rows], pa.int64())
    pref = _ray.put(pkeys)

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def qty_partial(batch: pa.Table, *, _p=pref) -> pa.Table:
        cache = qty_partial.__dict__
        if "keys" not in cache:
            cache["keys"] = _ray.get(_p)
        m = batch.filter(
            pc.is_in(batch.column("l_partkey"), value_set=cache["keys"])
        )
        q = pc.round(m.column("l_quantity")).cast(pa.int64())
        t = (
            pa.Table.from_arrays(
                [m.column("l_partkey"), q, pa.array([1] * m.num_rows, pa.int64())],
                names=["l_partkey", "qty", "one"],
            )
            .group_by("l_partkey")
            .aggregate([("qty", "sum"), ("one", "sum")])
        )
        return t.rename_columns(["l_partkey", "qty_sum", "cnt"])

    # per-part stats: bounded by the qualifying-part count (the broadcast
    # bound above), merged exactly on the driver
    stats_rows = lineitem.map_batches(qty_partial, batch_format="pyarrow").take_all()
    stats: dict[int, list[int]] = {}
    for r in stats_rows:
        s = stats.setdefault(r["l_partkey"], [0, 0])
        s[0] += r["qty_sum"]
        s[1] += r["cnt"]
    sref = _ray.put(stats)

    def cents_partial(batch: pa.Table, *, _p=pref, _s=sref) -> pa.Table:
        import numpy as np

        cache = cents_partial.__dict__
        if "keys" not in cache:
            cache["keys"] = _ray.get(_p)
            st = _ray.get(_s)
            cache["qs"] = {k: v[0] for k, v in st.items()}
            cache["cnt"] = {k: v[1] for k, v in st.items()}
        m = batch.filter(
            pc.is_in(batch.column("l_partkey"), value_set=cache["keys"])
        )
        pk = m.column("l_partkey").to_numpy(zero_copy_only=False)
        q = (
            pc.round(m.column("l_quantity"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        qs = np.array([cache["qs"][k] for k in pk], dtype=np.int64)
        cnt = np.array([cache["cnt"][k] for k in pk], dtype=np.int64)
        keep = 5 * q * cnt < qs  # exact-integer qty < 0.2 * avg(qty)
        cents = pc.round(
            pc.multiply(m.column("l_extendedprice"), pa.scalar(10000.0))
        ).cast(pa.int64())
        total = int(pc.sum(cents.filter(pa.array(keep))).as_py() or 0)
        return pa.table({"cents": pa.array([total], pa.int64())})

    from agentic_doc_ray.context import scalar_agg

    total = scalar_agg(
        lineitem.map_batches(cents_partial, batch_format="pyarrow"), "cents"
    )
    total = int(total or 0)
    return ray.data.from_arrow(
        pa.table(
            {
                "total_cents": pa.array([total], pa.int64()),
                "avg_yearly": pa.array([total / 70000.0], pa.float64()),
            }
        )
    )


def brand_bracket_revenue(
    sf_dir: str, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """Q19 (disjunctive-predicate revenue): revenue over three OR-ed
    (brand, size-range, quantity-range) brackets — the join whose filter
    can only resolve AFTER the part attributes meet the lineitem row.

    Scale shape: a single partkey-bucketed exchange. The part side ships
    only the three brands' ``(partkey, brand, size)`` rows (no driver
    broadcast — part scales with SF, VERDICT r02 #3 applies); the
    lineitem side pre-filters to the union of the quantity ranges and
    pre-projects to exact cents, so each side sheds most rows before the
    shuffle. Per bucket: one Arrow-native join, one vectorized
    disjunction, one partial cents sum — the final reduce sees one row
    per bucket.
    """
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    branches = [
        ("Brand#12", 1, 5, 1, 11),
        ("Brand#23", 1, 10, 10, 20),
        ("Brand#34", 1, 15, 20, 30),
    ]
    brands = pa.array([b[0] for b in branches], pa.string())
    qty_lo = min(b[3] for b in branches)
    qty_hi = max(b[4] for b in branches)

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("partkey", pa.int64()),
            ("side", pa.string()),
            ("brand", pa.string()),
            ("size", pa.int64()),
            ("qty", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    def tag_part(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.is_in(batch.column("p_brand"), value_set=brands))
        key = m.column("p_partkey")
        n = m.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["p"] * n, pa.string()),
                m.column("p_brand"),
                m.column("p_size").cast(pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex_schema,
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        q = pc.round(batch.column("l_quantity")).cast(pa.int64())
        m = pc.and_(
            pc.greater_equal(q, pa.scalar(qty_lo, pa.int64())),
            pc.less_equal(q, pa.scalar(qty_hi, pa.int64())),
        )
        f = batch.filter(m)
        qf = q.filter(m)
        rev = pc.multiply(
            f.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), f.column("l_discount")),
        )
        cents = pc.round(pc.multiply(rev, pa.scalar(10000.0))).cast(pa.int64())
        key = f.column("l_partkey")
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * n, pa.string()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.int64()),
                qf,
                cents,
            ],
            schema=ex_schema,
        )

    def join_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_p = pc.equal(g.column("side"), "p")
        p = g.filter(is_p).select(["partkey", "brand", "size"])
        l = g.filter(pc.invert(is_p)).select(["partkey", "qty", "cents"])
        if p.num_rows == 0 or l.num_rows == 0:
            return pa.table({"cents": pa.array([0], pa.int64())})
        # Arrow-native join: no pandas round-trip in the per-bucket task
        m = l.join(p, keys="partkey", join_type="inner")
        keep = pa.array([False] * m.num_rows)
        for b, slo, shi, qlo, qhi in branches:
            cond = pc.and_(
                pc.and_(
                    pc.equal(m.column("brand"), b),
                    pc.and_(
                        pc.greater_equal(m.column("size"), pa.scalar(slo, pa.int64())),
                        pc.less_equal(m.column("size"), pa.scalar(shi, pa.int64())),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(m.column("qty"), pa.scalar(qlo, pa.int64())),
                    pc.less_equal(m.column("qty"), pa.scalar(qhi, pa.int64())),
                ),
            )
            keep = pc.or_(keep, cond)
        total = int(pc.sum(m.column("cents").filter(keep)).as_py() or 0)
        return pa.table({"cents": pa.array([total], pa.int64())})

    total = (
        part.map_batches(tag_part, batch_format="pyarrow")
        .union(lineitem.map_batches(tag_line, batch_format="pyarrow"))
        # both sides filter -> sentinel rows guard the schema race
        .union(int_key_sentinels(ex_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(join_bucket, batch_format="pyarrow")
    )
    from agentic_doc_ray.context import scalar_agg

    total = int(scalar_agg(total, "cents") or 0)
    return ray.data.from_arrow(
        pa.table(
            {
                "total_cents": pa.array([total], pa.int64()),
                "revenue": pa.array([total / 10000.0], pa.float64()),
            }
        )
    )


def idle_rich_customers(
    sf_dir: str,
    nations: tuple = (1, 3, 5, 7, 9, 11, 13),
    price_cut: float = 300000.0,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Q22 (global-sales-opportunity shape): per-nation count and balance
    of above-average-balance customers in a nation subset who have NO
    high-value order — scalar subquery (global average) + anti-join +
    final rollup.

    Scale shape: the global average is two exact integers (cents sum +
    count) reduced from per-batch partials — nothing wider ever reaches
    the driver. The anti-join runs on a custkey-bucketed exchange:
    customers ship ``(custkey, nationkey, bal_cents)`` (no broadcast —
    customer scales with SF, VERDICT r02 #3), qualifying orders ship
    keys only, each bucket resolves with a vectorized ``is_in`` and
    emits per-nation partials; the final groupby folds ≤ 25 x buckets
    rows. The above-average test is the exact-integer cross-multiplied
    form ``bal * n > total`` — no float average is compared.
    """
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    nat = pa.array(list(nations), pa.int64())

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    n_rows = customer.count()
    n_buckets = n_buckets or auto_buckets(n_rows)

    def bal_partial(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.is_in(batch.column("c_nationkey"), value_set=nat))
        bal = pc.round(pc.multiply(m.column("c_acctbal"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        pos = bal.filter(pc.greater(bal, pa.scalar(0, pa.int64())))
        return pa.table(
            {
                "tot": pa.array([int(pc.sum(pos).as_py() or 0)], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    parts = customer.map_batches(bal_partial, batch_format="pyarrow").take_all()
    tot = sum(r["tot"] for r in parts)
    n_pos = sum(r["n"] for r in parts)

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("custkey", pa.int64()),
            ("side", pa.string()),
            ("c_nationkey", pa.int64()),
            ("bal_cents", pa.int64()),
        ]
    )

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    def tag_cust(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.is_in(batch.column("c_nationkey"), value_set=nat))
        bal = pc.round(pc.multiply(m.column("c_acctbal"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        keep = pc.greater(
            pc.multiply(bal, pa.scalar(n_pos, pa.int64())),
            pa.scalar(tot, pa.int64()),
        )
        f = m.filter(keep)
        key = f.column("c_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["c"] * f.num_rows, pa.string()),
                f.column("c_nationkey"),
                bal.filter(keep),
            ],
            schema=ex_schema,
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        m = batch.filter(
            pc.greater(batch.column("o_totalprice"), pa.scalar(price_cut))
        )
        key = m.column("o_custkey")
        n = m.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex_schema,
        )

    part_schema = pa.schema(
        [("c_nationkey", pa.int64()), ("n_custs", pa.int64()), ("bal", pa.int64())]
    )

    def anti_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_c = pc.equal(g.column("side"), "c")
        c = g.filter(is_c)
        if c.num_rows == 0:
            return part_schema.empty_table()
        hot = g.filter(pc.invert(is_c)).column("custkey").combine_chunks()
        keep = pc.invert(pc.is_in(c.column("custkey"), value_set=hot))
        f = c.filter(keep)
        out = (
            pa.Table.from_arrays(
                [
                    f.column("c_nationkey"),
                    pa.array([1] * f.num_rows, pa.int64()),
                    f.column("bal_cents"),
                ],
                names=["c_nationkey", "n_custs", "bal"],
            )
            .group_by("c_nationkey")
            .aggregate([("n_custs", "sum"), ("bal", "sum")])
        )
        return out.rename_columns(["c_nationkey", "n_custs", "bal"]).cast(part_schema)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("c_nationkey"),
                batch.column("n_custs"),
                pc.divide(batch.column("bal"), pa.scalar(100.0)),
            ],
            names=["c_nationkey", "n_custs", "total_acctbal"],
        )

    return (
        customer.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        # both sides filter -> sentinel rows guard the schema race
        .union(int_key_sentinels(ex_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(anti_bucket, batch_format="pyarrow")
        .groupby("c_nationkey", num_partitions=partitions_for(64))
        .aggregate(
            Sum("n_custs", alias_name="n_custs"), Sum("bal", alias_name="bal")
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def nation_market_share(
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_7",
    p_type: str = "ECONOMY",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Q8 (national market share): one nation's share of a region's
    yearly revenue for one part type — the deepest join in the feasible
    family (lineitem ⋈ part ⋈ supplier ⋈ orders ⋈ customer ⋈ nation ⋈
    region), grouped by order year with a numerator/denominator split.

    Scale shape — four bucketed exchanges, each side shedding rows first:

    1. custkey: region-filtered customers ship KEYS ONLY against
       date-filtered orders → (orderkey, year);
    2. partkey: type-filtered part ships keys only against lineitem
       (exact cents projected per row) → per-(orderkey, suppkey) cents;
    3. suppkey: the full supplier dimension (key + nationkey — never
       broadcast, it scales with SF) against the partials → per-
       (orderkey, is_target_nation) cents;
    4. orderkey: (orderkey, year) ⋈ the attributed cents → per-year
       numerator/denominator partials, folded by one tiny final groupby.

    nation/region themselves are fixed 25/5-row tables, read once on the
    driver for key lookups. The market share is a single IEEE division
    of two exact BIGINT cent sums per year — deterministic against the
    SQL oracle.
    """
    import numpy as np
    import pyarrow.parquet as _pq

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    # driver-side key lookups over the fixed-size dimension tables
    nat_t = _pq.read_table(f"{sf_dir}/nation.parquet")
    reg_t = _pq.read_table(f"{sf_dir}/region.parquet")
    rkey = reg_t.filter(pc.equal(reg_t.column("r_name"), region)).column(
        "r_regionkey"
    )[0].as_py()
    region_nations = nat_t.filter(
        pc.equal(nat_t.column("n_regionkey"), rkey)
    ).column("n_nationkey").cast(pa.int64())
    target_key = nat_t.filter(pc.equal(nat_t.column("n_name"), nation)).column(
        "n_nationkey"
    )[0].as_py()

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    width = partitions_for(n_rows)

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    # --- exchange 1: orders ⋈ customer(region) on custkey → (orderkey, year)
    ex1 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("o_orderkey", pa.int64()),
            ("o_year", pa.int64()),
        ]
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.is_in(
                batch.column("c_nationkey").cast(pa.int64()),
                value_set=region_nations,
            )
        )
        key = f.column("c_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["c"] * f.num_rows, pa.string()),
                pa.nulls(f.num_rows, pa.int64()),
                pa.nulls(f.num_rows, pa.int64()),
            ],
            schema=ex1,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        f = batch.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        key = f.column("o_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * f.num_rows, pa.string()),
                f.column("o_orderkey"),
                pc.year(f.column("o_orderdate")).cast(pa.int64()),
            ],
            schema=ex1,
        )

    order_year_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_year", pa.int64())]
    )

    def cust_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_c = pc.equal(g.column("side"), "c")
        cust = g.filter(is_c).select(["key"])
        o = g.filter(pc.invert(is_c)).select(["key", "o_orderkey", "o_year"])
        if cust.num_rows == 0 or o.num_rows == 0:
            return order_year_schema.empty_table()
        keep = pc.is_in(o.column("key"), value_set=cust.column("key").combine_chunks())
        return o.filter(keep).select(["o_orderkey", "o_year"])

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    order_year = (
        customer.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(cust_bucket, batch_format="pyarrow")
    )

    # --- exchange 2: lineitem ⋈ part(type) on partkey -------------------
    ex2 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("orderkey", pa.int64()),
            ("suppkey", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def tag_part(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch.column("p_type"), p_type))
        key = f.column("p_partkey")
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["p"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex2,
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(
                pc.multiply(
                    batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                ),
                pa.scalar(10000.0),
            )
        ).cast(pa.int64())
        key = batch.column("l_partkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * n, pa.string()),
                batch.column("l_orderkey"),
                batch.column("l_suppkey"),
                cents,
            ],
            schema=ex2,
        )

    os_schema = pa.schema(
        [("orderkey", pa.int64()), ("suppkey", pa.int64()), ("cents", pa.int64())]
    )

    def part_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_p = pc.equal(g.column("side"), "p")
        p = g.filter(is_p).select(["key"])
        li = g.filter(pc.invert(is_p)).select(["key", "orderkey", "suppkey", "cents"])
        if p.num_rows == 0 or li.num_rows == 0:
            return os_schema.empty_table()
        keep = pc.is_in(li.column("key"), value_set=p.column("key").combine_chunks())
        f = li.filter(keep)
        # collapse the partkey dimension before the suppkey exchange
        out = (
            f.select(["orderkey", "suppkey", "cents"])
            .group_by(["orderkey", "suppkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["orderkey", "suppkey", "cents"])
        )
        return out.cast(os_schema)

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    typed_rev = (
        part.map_batches(tag_part, batch_format="pyarrow")
        .union(lineitem.map_batches(tag_line, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(part_bucket, batch_format="pyarrow")
    )

    # --- exchange 3: typed_rev ⋈ supplier on suppkey ---------------------
    ex3 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("orderkey", pa.int64()),
            ("cents", pa.int64()),
            ("is_target", pa.bool_()),
        ]
    )

    def tag_supp(batch: pa.Table) -> pa.Table:
        key = batch.column("s_suppkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["s"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pc.equal(
                    batch.column("s_nationkey").cast(pa.int64()),
                    pa.scalar(target_key, pa.int64()),
                ),
            ],
            schema=ex3,
        )

    def tag_rev(batch: pa.Table) -> pa.Table:
        key = batch.column("suppkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["r"] * n, pa.string()),
                batch.column("orderkey"),
                batch.column("cents"),
                pa.nulls(n, pa.bool_()),
            ],
            schema=ex3,
        )

    attr_schema = pa.schema(
        [
            ("orderkey", pa.int64()),
            ("is_target", pa.bool_()),
            ("cents", pa.int64()),
        ]
    )

    def supp_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_s = pc.equal(g.column("side"), "s")
        supp = g.filter(is_s).select(["key", "is_target"])
        rv = g.filter(pc.invert(is_s)).select(["key", "orderkey", "cents"])
        if supp.num_rows == 0 or rv.num_rows == 0:
            return attr_schema.empty_table()
        m = rv.join(supp, keys="key", join_type="inner")
        out = (
            m.select(["orderkey", "is_target", "cents"])
            .group_by(["orderkey", "is_target"])
            .aggregate([("cents", "sum")])
            .rename_columns(["orderkey", "is_target", "cents"])
        )
        return out.cast(attr_schema)

    supplier = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    attributed = (
        supplier.map_batches(tag_supp, batch_format="pyarrow")
        .union(typed_rev.map_batches(tag_rev, batch_format="pyarrow"))
        .union(int_key_sentinels(ex3, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(supp_bucket, batch_format="pyarrow")
    )

    # --- exchange 4: attributed ⋈ order_year on orderkey → per-year partials
    ex4 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("o_year", pa.int64()),
            ("cents", pa.int64()),
            ("is_target", pa.bool_()),
        ]
    )

    def tag_year(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["y"] * n, pa.string()),
                batch.column("o_year"),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.bool_()),
            ],
            schema=ex4,
        )

    def tag_attr(batch: pa.Table) -> pa.Table:
        key = batch.column("orderkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["a"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                batch.column("cents"),
                batch.column("is_target"),
            ],
            schema=ex4,
        )

    year_part_schema = pa.schema(
        [
            ("o_year", pa.int64()),
            ("nation_cents", pa.int64()),
            ("total_cents", pa.int64()),
        ]
    )

    def year_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_y = pc.equal(g.column("side"), "y")
        y = g.filter(is_y).select(["key", "o_year"])
        a = g.filter(pc.invert(is_y)).select(["key", "cents", "is_target"])
        if y.num_rows == 0 or a.num_rows == 0:
            return year_part_schema.empty_table()
        m = a.join(y, keys="key", join_type="inner")
        nation_cents = pc.if_else(
            m.column("is_target"), m.column("cents"), pa.scalar(0, pa.int64())
        )
        out = (
            pa.Table.from_arrays(
                [m.column("o_year"), nation_cents, m.column("cents")],
                names=["o_year", "nation_cents", "total_cents"],
            )
            .group_by("o_year")
            .aggregate([("nation_cents", "sum"), ("total_cents", "sum")])
            .rename_columns(["o_year", "nation_cents", "total_cents"])
        )
        return out.cast(year_part_schema)

    def finalize(batch: pa.Table) -> pa.Table:
        share = pc.divide(
            batch.column("nation_cents").cast(pa.float64()),
            batch.column("total_cents").cast(pa.float64()),
        )
        return pa.Table.from_arrays(
            [
                batch.column("o_year"),
                batch.column("nation_cents"),
                batch.column("total_cents"),
                share,
            ],
            names=["o_year", "nation_cents", "total_cents", "mkt_share"],
        )

    return (
        order_year.map_batches(tag_year, batch_format="pyarrow")
        .union(attributed.map_batches(tag_attr, batch_format="pyarrow"))
        .union(int_key_sentinels(ex4, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(year_bucket, batch_format="pyarrow")
        .groupby("o_year", num_partitions=partitions_for(64))
        .aggregate(
            Sum("nation_cents", alias_name="nation_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def waiting_supplier_check(
    sf_dir: str,
    nation: str = "NATION_9",
    late_days: int = 90,
    k: int = 100,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    ('F') orders with MORE than one distinct supplier where EXACTLY one
    supplier shipped late, credit that supplier — the double-correlated
    EXISTS / NOT-EXISTS self-join over lineitem, the one classic TPC-H
    shape the available tables can still express. "Late" is the derived
    Q12 predicate (max shipdate per (order, supplier) more than
    ``late_days`` after the order date), since the synthetic lineitem
    carries no commit/receipt dates (reference Q21 uses receipt >
    commit; the correlation structure — exists another supplier, not
    exists another LATE supplier — is identical).

    Scale shape — two bucketed exchanges plus a tiny top-k merge:

    1. exchange 1 (orderkey): lineitem collapses per batch to
       (orderkey, suppkey, max shipdate) partials — the late bit needs
       only the latest line a supplier shipped for the order — and
       orders ships 'F' rows as (orderkey, orderdate) keys. The bucket
       task merges the partials, derives the late bit, counts
       per-order suppliers / late suppliers, and emits per-suppkey
       waiter-count PARTIALS (bounded by distinct suppliers per
       bucket, never lineitem rows).
    2. exchange 2 (suppkey): supplier ships (suppkey, name) keys only,
       pre-filtered to the target nation via the ≤25-row nation table
       (supplier itself scales with SF, so no broadcast); the bucket
       task finishes the per-supplier sum, joins the name, and emits
       its LOCAL top-k by (numwait DESC, s_name), so the global
       sort + limit sees ≤ k×buckets rows.

    Both exchanges feed ``map_groups`` from filtering stages, so each
    unions sentinel rows (functions/_exchange.py). Output deterministic:
    (numwait DESC, s_name ASC) total order.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat_keys = {
        name: key
        for key, name in zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist(),
        )
    }
    nationkey = nat_keys[nation]
    supplier = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    late_us = np.timedelta64(late_days, "D").astype("timedelta64[us]")

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())),
            pa.int32(),
        )

    ex1_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("suppkey", pa.int64()),
            ("ts", pa.timestamp("us")),
        ]
    )

    def tag_lines(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [
                batch.column("l_orderkey"),
                batch.column("l_suppkey"),
                batch.column("l_shipdate").cast(pa.timestamp("us")),
            ],
            names=["key", "suppkey", "ts"],
        )
        g = (
            t.group_by(["key", "suppkey"])
            .aggregate([("ts", "max")])
            .rename_columns(["key", "suppkey", "ts"])
        )
        key = g.column("key")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * g.num_rows, pa.string()),
                g.column("suppkey"),
                g.column("ts"),
            ],
            schema=ex1_schema,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch.column("o_orderstatus"), "F"))
        key = f.column("o_orderkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * f.num_rows, pa.string()),
                pa.nulls(f.num_rows, pa.int64()),
                f.column("o_orderdate").cast(pa.timestamp("us")),
            ],
            schema=ex1_schema,
        )

    part_schema = pa.schema([("suppkey", pa.int64()), ("cnt", pa.int64())])

    def waiters_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_o = pc.equal(g.column("side"), "o")
        o = (
            g.filter(is_o)
            .select(["key", "ts"])
            .rename_columns(["key", "odate"])
        )
        l = (
            g.filter(pc.invert(is_o))
            .select(["key", "suppkey", "ts"])
            .group_by(["key", "suppkey"])
            .aggregate([("ts", "max")])
            .rename_columns(["key", "suppkey", "ts"])
        )
        if o.num_rows == 0 or l.num_rows == 0:
            return part_schema.empty_table()
        m = l.join(o, keys="key", join_type="inner")
        if m.num_rows == 0:
            return part_schema.empty_table()
        odate = m.column("odate").to_numpy(zero_copy_only=False)
        sdate = m.column("ts").to_numpy(zero_copy_only=False)
        late = pa.array((sdate > odate + late_us).astype("int64"))
        m = pa.Table.from_arrays(
            [m.column("key"), m.column("suppkey"), late, late],
            names=["key", "suppkey", "late", "n_late"],
        )
        per_order = (
            m.select(["key", "late", "n_late"])
            .group_by("key")
            .aggregate([("late", "count"), ("n_late", "sum")])
            .rename_columns(["key", "n_supps", "n_late"])
        )
        per_order = per_order.filter(
            pc.and_(
                pc.greater(per_order.column("n_supps"), pa.scalar(1, pa.int64())),
                pc.equal(per_order.column("n_late"), pa.scalar(1, pa.int64())),
            )
        )
        if per_order.num_rows == 0:
            return part_schema.empty_table()
        w = m.filter(pc.equal(m.column("late"), pa.scalar(1, pa.int64()))).join(
            per_order.select(["key"]), keys="key", join_type="inner"
        )
        if w.num_rows == 0:
            return part_schema.empty_table()
        out = (
            w.select(["suppkey", "late"])
            .group_by("suppkey")
            .aggregate([("late", "sum")])
            .rename_columns(["suppkey", "cnt"])
        )
        return out.cast(part_schema)

    partials = (
        lineitem.map_batches(tag_lines, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows))
        .map_groups(waiters_bucket, batch_format="pyarrow")
    )

    ex2_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("cnt", pa.int64()),
            ("s_name", pa.string()),
        ]
    )

    def tag_supp(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.equal(batch.column("s_nationkey"), pa.scalar(nationkey))
        )
        key = f.column("s_suppkey").cast(pa.int64())
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["s"] * f.num_rows, pa.string()),
                pa.nulls(f.num_rows, pa.int64()),
                f.column("s_name"),
            ],
            schema=ex2_schema,
        )

    def tag_partial(batch: pa.Table) -> pa.Table:
        key = batch.column("suppkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["w"] * batch.num_rows, pa.string()),
                batch.column("cnt"),
                pa.nulls(batch.num_rows, pa.string()),
            ],
            schema=ex2_schema,
        )

    out_schema = pa.schema([("s_name", pa.string()), ("numwait", pa.int64())])

    def name_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_s = pc.equal(g.column("side"), "s")
        supp = g.filter(is_s).select(["key", "s_name"])
        w = (
            g.filter(pc.invert(is_s))
            .select(["key", "cnt"])
            .group_by("key")
            .aggregate([("cnt", "sum")])
            .rename_columns(["key", "numwait"])
        )
        if supp.num_rows == 0 or w.num_rows == 0:
            return out_schema.empty_table()
        m = w.join(supp, keys="key", join_type="inner")
        if m.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            m, sort_keys=[("numwait", "descending"), ("s_name", "ascending")]
        )
        m = m.take(order.slice(0, k))
        return pa.Table.from_arrays(
            [m.column("s_name"), m.column("numwait")], schema=out_schema
        )

    named = (
        partials.map_batches(tag_partial, batch_format="pyarrow")
        .union(supplier.map_batches(tag_supp, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2_schema, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(supplier.count()))
        .map_groups(name_bucket, batch_format="pyarrow")
    )
    return named.sort(
        key=["numwait", "s_name"], descending=[True, False]
    ).limit(k)


def product_type_profit(
    sf_dir: str,
    name_token: str = "widget",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q9 shape (product-type profit): per (supplier nation, order
    year) revenue for parts whose name contains ``name_token`` — the
    classic 5-table profit attribution (lineitem ⋈ part ⋈ supplier ⋈
    orders ⋈ nation), minus the partsupp cost term (no partsupp table in
    this corpus; revenue IS the profit measure here).

    Scale shape — three bucketed exchanges, each side shedding first:

    1. partkey: name-filtered part ships KEYS ONLY against lineitem
       (exact cents projected per row) → per-(orderkey, suppkey) cents;
    2. suppkey: the supplier dimension (key + nationkey — SF-scaled, so
       never broadcast) joins in-bucket → per-(orderkey, nationkey)
       cents;
    3. orderkey: orders ship (orderkey, year); the join finishes per
       bucket and collapses to ≤ |nations|×|years| partial rows each —
       the final groupby is tiny.

    nation (fixed 25 rows) is read once on the driver and mapped onto
    the ≤25-key result. Exact integer cents end-to-end; the float
    ``profit`` is a single IEEE division per output row.
    """
    import numpy as np
    import pyarrow.parquet as _pq

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    nat_t = _pq.read_table(f"{sf_dir}/nation.parquet")
    nat_name = {
        k.as_py(): v.as_py()
        for k, v in zip(
            nat_t.column("n_nationkey").cast(pa.int64()),
            nat_t.column("n_name"),
        )
    }

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    width = partitions_for(n_rows)

    def _bucket(key: "pa.Array") -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    # --- exchange 1: lineitem ⋉ part(name) on partkey --------------------
    ex1 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("orderkey", pa.int64()),
            ("suppkey", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def tag_part(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.match_substring(batch.column("p_name"), name_token)
        )
        key = f.column("p_partkey")
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["p"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex1,
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(
                pc.multiply(
                    batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                ),
                pa.scalar(10000.0),
            )
        ).cast(pa.int64())
        key = batch.column("l_partkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * n, pa.string()),
                batch.column("l_orderkey"),
                batch.column("l_suppkey"),
                cents,
            ],
            schema=ex1,
        )

    os_schema = pa.schema(
        [("orderkey", pa.int64()), ("suppkey", pa.int64()), ("cents", pa.int64())]
    )

    def part_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_p = pc.equal(g.column("side"), "p")
        p = g.filter(is_p).select(["key"])
        li = g.filter(pc.invert(is_p)).select(
            ["key", "orderkey", "suppkey", "cents"]
        )
        if p.num_rows == 0 or li.num_rows == 0:
            return os_schema.empty_table()
        keep = pc.is_in(li.column("key"), value_set=p.column("key").combine_chunks())
        f = li.filter(keep)
        out = (
            f.select(["orderkey", "suppkey", "cents"])
            .group_by(["orderkey", "suppkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["orderkey", "suppkey", "cents"])
        )
        return out.cast(os_schema)

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    typed_rev = (
        part.map_batches(tag_part, batch_format="pyarrow")
        .union(lineitem.map_batches(tag_line, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(part_bucket, batch_format="pyarrow")
    )

    # --- exchange 2: typed_rev ⋈ supplier on suppkey → nationkey ---------
    ex2 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("orderkey", pa.int64()),
            ("cents", pa.int64()),
            ("nationkey", pa.int64()),
        ]
    )

    def tag_supp(batch: pa.Table) -> pa.Table:
        key = batch.column("s_suppkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["s"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                batch.column("s_nationkey").cast(pa.int64()),
            ],
            schema=ex2,
        )

    def tag_rev(batch: pa.Table) -> pa.Table:
        key = batch.column("suppkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["r"] * n, pa.string()),
                batch.column("orderkey"),
                batch.column("cents"),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex2,
        )

    on_schema = pa.schema(
        [
            ("orderkey", pa.int64()),
            ("nationkey", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def supp_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_s = pc.equal(g.column("side"), "s")
        supp = g.filter(is_s).select(["key", "nationkey"])
        rv = g.filter(pc.invert(is_s)).select(["key", "orderkey", "cents"])
        if supp.num_rows == 0 or rv.num_rows == 0:
            return on_schema.empty_table()
        m = rv.join(supp, keys="key", join_type="inner")
        out = (
            m.select(["orderkey", "nationkey", "cents"])
            .group_by(["orderkey", "nationkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["orderkey", "nationkey", "cents"])
        )
        return out.cast(on_schema)

    supplier = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    attributed = (
        supplier.map_batches(tag_supp, batch_format="pyarrow")
        .union(typed_rev.map_batches(tag_rev, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(supp_bucket, batch_format="pyarrow")
    )

    # --- exchange 3: attributed ⋈ orders on orderkey → per-(nation, year)
    ex3 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("o_year", pa.int64()),
            ("cents", pa.int64()),
            ("nationkey", pa.int64()),
        ]
    )

    def tag_year(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["y"] * n, pa.string()),
                pc.year(batch.column("o_orderdate")).cast(pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex3,
        )

    def tag_attr(batch: pa.Table) -> pa.Table:
        key = batch.column("orderkey")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["a"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                batch.column("cents"),
                batch.column("nationkey"),
            ],
            schema=ex3,
        )

    ny_schema = pa.schema(
        [
            ("nationkey", pa.int64()),
            ("o_year", pa.int64()),
            ("profit_cents", pa.int64()),
        ]
    )

    def year_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_y = pc.equal(g.column("side"), "y")
        y = g.filter(is_y).select(["key", "o_year"])
        a = g.filter(pc.invert(is_y)).select(["key", "cents", "nationkey"])
        if y.num_rows == 0 or a.num_rows == 0:
            return ny_schema.empty_table()
        m = a.join(y, keys="key", join_type="inner")
        out = (
            m.select(["nationkey", "o_year", "cents"])
            .group_by(["nationkey", "o_year"])
            .aggregate([("cents", "sum")])
            .rename_columns(["nationkey", "o_year", "profit_cents"])
        )
        return out.cast(ny_schema)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def finalize(batch: pa.Table) -> pa.Table:
        names = pa.array(
            [nat_name[k] for k in batch.column("nationkey").to_pylist()],
            pa.string(),
        )
        return pa.Table.from_arrays(
            [
                names,
                batch.column("o_year"),
                batch.column("profit_cents"),
                pc.divide(
                    batch.column("profit_cents").cast(pa.float64()), 10000.0
                ),
            ],
            names=["n_name", "o_year", "profit_cents", "profit"],
        )

    return (
        orders.map_batches(tag_year, batch_format="pyarrow")
        .union(attributed.map_batches(tag_attr, batch_format="pyarrow"))
        .union(int_key_sentinels(ex3, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(year_bucket, batch_format="pyarrow")
        .groupby(["nationkey", "o_year"], num_partitions=partitions_for(64))
        .aggregate(Sum("profit_cents", alias_name="profit_cents"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def brand_supplier_counts(
    sf_dir: str,
    max_size: int = 3,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q16 shape (parts/supplier relationship): how many DISTINCT
    suppliers ship each small (p_size < ``max_size``) brand/size bracket
    — the supplier-diversity signal. This corpus has no partsupp table,
    so the shipped lineitem pairs stand in for the part-supplier
    relation (same join/count-distinct shape).

    Scale shape — count-distinct across a join without ever shipping
    duplicate pairs twice: the lineitem side collapses to DISTINCT
    (partkey, suppkey) per batch BEFORE exchange 1 (partkey buckets,
    size-filtered part ships (key, brand, size)); each bucket re-dedups
    and emits distinct (brand, size, suppkey) rows; exchange 2 hashes
    the (brand, size) group key so the global distinct-supplier count
    finishes in-bucket. Payload is bounded by the distinct relation, not
    the lineitem row count.
    """
    import numpy as np

    from agentic_doc_ray.functions._exchange import (
        int_key_sentinels,
        str_key_sentinels,
    )

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    width = partitions_for(n_rows)

    ex1 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.string()),
            ("suppkey", pa.int64()),
            ("brand", pa.string()),
            ("size", pa.int64()),
        ]
    )

    def _bucket(key):
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    def tag_part(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.less(batch.column("p_size"), max_size))
        key = f.column("p_partkey")
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["p"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                f.column("p_brand"),
                f.column("p_size").cast(pa.int64()),
            ],
            schema=ex1,
        )

    def tag_pairs(batch: pa.Table) -> pa.Table:
        d = (
            batch.select(["l_partkey", "l_suppkey"])
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([])
        )
        key = d.column("l_partkey")
        n = d.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["l"] * n, pa.string()),
                d.column("l_suppkey"),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex1,
        )

    bss_schema = pa.schema(
        [
            ("gbucket", pa.string()),
            ("brand", pa.string()),
            ("size", pa.int64()),
            ("suppkey", pa.int64()),
            ("side", pa.string()),
        ]
    )

    def part_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_p = pc.equal(g.column("side"), "p")
        p = g.filter(is_p).select(["key", "brand", "size"])
        li = g.filter(pc.invert(is_p)).select(["key", "suppkey"])
        if p.num_rows == 0 or li.num_rows == 0:
            return bss_schema.empty_table()
        m = (
            li.join(p, keys="key", join_type="inner")
            .select(["brand", "size", "suppkey"])
            .group_by(["brand", "size", "suppkey"])
            .aggregate([])
        )
        gb = pc.binary_join_element_wise(
            m.column("brand").cast(pa.string()),
            pc.cast(m.column("size"), pa.string()),
            "|",
        )
        n = m.num_rows
        return pa.Table.from_arrays(
            [
                gb,
                m.column("brand"),
                m.column("size"),
                m.column("suppkey"),
                pa.array(["r"] * n, pa.string()),
            ],
            schema=bss_schema,
        )

    distinct_rel = (
        part.map_batches(tag_part, batch_format="pyarrow")
        .union(lineitem.map_batches(tag_pairs, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(part_bucket, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            ("p_brand", pa.string()),
            ("p_size", pa.int64()),
            ("n_suppliers", pa.int64()),
        ]
    )

    def count_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        if g.num_rows == 0:
            return out_schema.empty_table()
        d = (
            g.select(["brand", "size", "suppkey"])
            .group_by(["brand", "size", "suppkey"])
            .aggregate([])
        )
        cnt = (
            d.append_column("one", pa.array(np.ones(d.num_rows, np.int64)))
            .group_by(["brand", "size"])
            .aggregate([("one", "sum")])
            .rename_columns(["p_brand", "p_size", "n_suppliers"])
        )
        return cnt.cast(out_schema)

    return (
        distinct_rel.union(
            str_key_sentinels(
                bss_schema, "gbucket", fill={"side": "sent", "brand": "", "suppkey": -1, "size": -1}
            )
        )
        .groupby("gbucket", num_partitions=partitions_for(64))
        .map_groups(count_bucket, batch_format="pyarrow")
    )


def min_cost_supplier(
    sf_dir: str,
    region: str = "EUROPE",
    ptype: str = "PROMO",
    max_size: int = 10,
    k: int = 100,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q2 shape (minimum-cost supplier): for every small part of one
    type, the region's supplier(s) offering it at the global minimum cost
    — the correlated-scalar-min join. This corpus has no partsupp table,
    so the stand-in supply cost is the cheapest shipped line price per
    (part, supplier): MIN(round(l_extendedprice * 10000)) over lineitem.

    Scale shape — two bucketed exchanges plus a tiny top-k merge:

    1. suppkey exchange: lineitem collapses per batch to one min-cents
       row per (partkey, suppkey) before the wire (payload bounded by
       the distinct part-supplier relation); the supplier side is
       region-filtered against the ≤25-row nation⋈region broadcast and
       ships (key, name, acctbal, nation). Buckets finish the min and
       join supplier attributes Arrow-native.
    2. partkey exchange: the part side ships only type/size-filtered
       (key, brand); buckets join, resolve the per-part min with a
       group-min + equality filter (ties preserved, Q2 semantics), and
       emit their LOCAL top-k, so the global merge sees ≤ k×buckets rows.
    3. Ray sort + limit(k) over the k×buckets partials (tiny).

    Ordering is fully deterministic: (s_acctbal DESC, n_name, s_name,
    p_partkey, s_suppkey) — suppkey last so even same-named suppliers
    tying at the boundary cannot diverge from the SQL oracle. Both
    exchanges feed map_groups from filtering stages → sentinel rows
    guard Ray's empty-first-block schema race (functions/_exchange.py).
    """
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    # bounded dimension broadcast: region ⋈ nation (≤25 rows)
    nation_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region_tbl = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rkeys = region_tbl.filter(
        pc.equal(region_tbl.column("r_name"), region)
    ).column("r_regionkey")
    nat = nation_tbl.filter(
        pc.is_in(nation_tbl.column("n_regionkey"), value_set=rkeys)
    )
    nat_keys = nat.column("n_nationkey").combine_chunks()
    nat_names = nat.column("n_name").combine_chunks()

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    supplier = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    width = partitions_for(n_rows)

    def _bucket(key):
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    ex1 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),  # suppkey
            ("side", pa.string()),
            ("partkey", pa.int64()),
            ("cents", pa.int64()),
            ("s_name", pa.string()),
            ("s_acctbal", pa.float64()),
            ("n_name", pa.string()),
        ]
    )

    def tag_cost(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(batch.column("l_extendedprice"), pa.scalar(10000.0))
        ).cast(pa.int64())
        t = (
            pa.Table.from_arrays(
                [batch.column("l_partkey"), batch.column("l_suppkey"), cents],
                names=["partkey", "key", "cents"],
            )
            .group_by(["partkey", "key"])
            .aggregate([("cents", "min")])
        )
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(t.column("key")),
                t.column("key"),
                pa.array(["l"] * n, pa.string()),
                t.column("partkey"),
                t.column("cents_min"),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.float64()),
                pa.nulls(n, pa.string()),
            ],
            schema=ex1,
        )

    def tag_supp(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column("s_nationkey"), value_set=nat_keys)
        f = batch.filter(pc.is_valid(idx))
        names = nat_names.take(pc.index_in(f.column("s_nationkey"), value_set=nat_keys))
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(f.column("s_suppkey")),
                f.column("s_suppkey"),
                pa.array(["s"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                f.column("s_name"),
                f.column("s_acctbal").cast(pa.float64()),
                names,
            ],
            schema=ex1,
        )

    mid = pa.schema(
        [
            ("partkey", pa.int64()),
            ("suppkey", pa.int64()),
            ("cents", pa.int64()),
            ("s_name", pa.string()),
            ("s_acctbal", pa.float64()),
            ("n_name", pa.string()),
        ]
    )

    def cost_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_l = pc.equal(g.column("side"), "l")
        li = (
            g.filter(is_l)
            .select(["partkey", "key", "cents"])
            .group_by(["partkey", "key"])
            .aggregate([("cents", "min")])
        )
        s = g.filter(pc.equal(g.column("side"), "s")).select(
            ["key", "s_name", "s_acctbal", "n_name"]
        )
        if li.num_rows == 0 or s.num_rows == 0:
            return mid.empty_table()
        j = li.join(s, keys="key", join_type="inner")
        return pa.Table.from_arrays(
            [
                j.column("partkey"),
                j.column("key"),
                j.column("cents_min"),
                j.column("s_name"),
                j.column("s_acctbal"),
                j.column("n_name"),
            ],
            schema=mid,
        )

    costed = (
        lineitem.map_batches(tag_cost, batch_format="pyarrow")
        .union(supplier.map_batches(tag_supp, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(cost_bucket, batch_format="pyarrow")
    )

    ex2 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),  # partkey
            ("side", pa.string()),
            ("suppkey", pa.int64()),
            ("cents", pa.int64()),
            ("s_name", pa.string()),
            ("s_acctbal", pa.float64()),
            ("n_name", pa.string()),
            ("p_brand", pa.string()),
        ]
    )

    def tag_mid(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(batch.column("partkey")),
                batch.column("partkey"),
                pa.array(["r"] * n, pa.string()),
                batch.column("suppkey"),
                batch.column("cents"),
                batch.column("s_name"),
                batch.column("s_acctbal"),
                batch.column("n_name"),
                pa.nulls(n, pa.string()),
            ],
            schema=ex2,
        )

    def tag_part(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.and_(
                pc.equal(batch.column("p_type"), ptype),
                pc.less(batch.column("p_size"), max_size),
            )
        )
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(f.column("p_partkey")),
                f.column("p_partkey"),
                pa.array(["p"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.float64()),
                pa.nulls(n, pa.string()),
                f.column("p_brand"),
            ],
            schema=ex2,
        )

    out_schema = pa.schema(
        [
            ("s_acctbal", pa.float64()),
            ("s_name", pa.string()),
            ("n_name", pa.string()),
            ("p_partkey", pa.int64()),
            ("p_brand", pa.string()),
            ("s_suppkey", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def pick_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_p = pc.equal(g.column("side"), "p")
        p = g.filter(is_p).select(["key", "p_brand"])
        r = g.filter(pc.equal(g.column("side"), "r")).select(
            ["key", "suppkey", "cents", "s_name", "s_acctbal", "n_name"]
        )
        if p.num_rows == 0 or r.num_rows == 0:
            return out_schema.empty_table()
        j = r.join(p, keys="key", join_type="inner")
        if j.num_rows == 0:
            return out_schema.empty_table()
        mins = j.select(["key", "cents"]).group_by("key").aggregate([("cents", "min")])
        j = j.join(mins, keys="key", join_type="inner")
        w = j.filter(pc.equal(j.column("cents"), j.column("cents_min")))
        order = pc.sort_indices(
            w,
            sort_keys=[
                ("s_acctbal", "descending"),
                ("n_name", "ascending"),
                ("s_name", "ascending"),
                ("key", "ascending"),
                ("suppkey", "ascending"),
            ],
        )
        w = w.take(order.slice(0, k))  # bucket-local top-k
        return pa.Table.from_arrays(
            [
                w.column("s_acctbal"),
                w.column("s_name"),
                w.column("n_name"),
                w.column("key"),
                w.column("p_brand"),
                w.column("suppkey"),
                w.column("cents"),
            ],
            schema=out_schema,
        )

    top = (
        costed.map_batches(tag_mid, batch_format="pyarrow")
        .union(part.map_batches(tag_part, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(pick_bucket, batch_format="pyarrow")
        .sort(
            key=["s_acctbal", "n_name", "s_name", "p_partkey", "s_suppkey"],
            descending=[True, False, False, False, False],
        )
        .limit(k)
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("s_acctbal"),
                batch.column("s_name"),
                batch.column("n_name"),
                batch.column("p_partkey"),
                batch.column("p_brand"),
                batch.column("s_suppkey"),
                pc.divide(batch.column("cents").cast(pa.float64()), 10000.0),
            ],
            names=[
                "s_acctbal", "s_name", "n_name", "p_partkey",
                "p_brand", "s_suppkey", "cost",
            ],
        )

    return top.map_batches(finalize, batch_format="pyarrow")


def important_part_values(
    sf_dir: str,
    nation: str = "NATION_7",
    mult: int = 2,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q11 shape (important stock): per-part shipped value through
    one nation's suppliers, kept only where a part's value exceeds
    ``mult``× the AVERAGE per-part share — the aggregate-vs-global-total
    HAVING. TPC-H scales its fixed fraction by 1/SF for exactly this
    reason (a constant fraction empties out as the part count grows);
    anchoring on the average share keeps the output a stable proportion
    at every scale (measured 9 / 127 / 1224 rows at sf0.001/0.01/0.1).
    Stand-in for partsupp value: SUM(round(l_extendedprice * 10000))
    over lineitem (no partsupp table in this corpus).

    Scale shape: lineitem collapses per batch to (partkey, cents)
    partials restricted to the nation's suppliers — the supplier side
    ships KEYS ONLY into a suppkey-bucketed semi-join (supplier scales
    with SF, so no broadcast; the nation filter itself uses the ≤25-row
    nation broadcast). Buckets re-aggregate per partkey before the final
    partkey hash-aggregate, so the second exchange is bounded by the
    distinct part count. Total and part count are TWO driver scalars off
    the materialized per-part table, and the keep test is the exact
    integer cross-multiplication ``value_cents * n_parts > mult *
    total_cents`` — int64-safe on the left while value × parts stays
    under 2^63 (~3e18 at sf100: value ~1e12 cents-e4 × 3e6 parts;
    beyond that, pre-divide the right side and accept the one-ulp
    boundary, or move to Python ints in the filter).
    """
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    nation_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkeys = nation_tbl.filter(
        pc.equal(nation_tbl.column("n_name"), nation)
    ).column("n_nationkey").combine_chunks()

    supplier = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    width = partitions_for(n_rows)

    def _bucket(key):
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    ex1 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),  # suppkey
            ("side", pa.string()),
            ("partkey", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def tag_value(batch: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(batch.column("l_extendedprice"), pa.scalar(10000.0))
        ).cast(pa.int64())
        t = (
            pa.Table.from_arrays(
                [batch.column("l_partkey"), batch.column("l_suppkey"), cents],
                names=["partkey", "key", "cents"],
            )
            .group_by(["partkey", "key"])
            .aggregate([("cents", "sum")])
        )
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(t.column("key")),
                t.column("key"),
                pa.array(["l"] * n, pa.string()),
                t.column("partkey"),
                t.column("cents_sum"),
            ],
            schema=ex1,
        )

    def tag_supp(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.is_in(batch.column("s_nationkey"), value_set=nkeys))
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(f.column("s_suppkey")),
                f.column("s_suppkey"),
                pa.array(["s"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex1,
        )

    part_schema = pa.schema([("l_partkey", pa.int64()), ("cents", pa.int64())])

    def semi_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_s = pc.equal(g.column("side"), "s")
        skeys = g.filter(is_s).column("key").combine_chunks()
        li = g.filter(pc.invert(is_s))
        hit = li.filter(pc.is_in(li.column("key"), value_set=skeys))
        if hit.num_rows == 0:
            return part_schema.empty_table()
        out = (
            hit.select(["partkey", "cents"])
            .group_by("partkey")
            .aggregate([("cents", "sum")])
        )
        return out.rename_columns(["l_partkey", "cents"]).cast(part_schema)

    per_part = (
        lineitem.map_batches(tag_value, batch_format="pyarrow")
        .union(supplier.map_batches(tag_supp, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(semi_bucket, batch_format="pyarrow")
        .groupby("l_partkey", num_partitions=partitions_for(n_rows // 8))
        .aggregate(Sum("cents", alias_name="value_cents"))
        .materialize()  # consumed thrice: total + count scalars + filter
    )

    from agentic_doc_ray.context import scalar_agg

    total = int(scalar_agg(per_part, "value_cents") or 0)
    n_parts = per_part.count()

    def keep(batch: pa.Table) -> pa.Table:
        v = batch.column("value_cents")
        m = pc.greater(
            pc.multiply(v, pa.scalar(n_parts, pa.int64())),
            pa.scalar(mult * total, pa.int64()),
        )
        f = batch.filter(m)
        return pa.Table.from_arrays(
            [
                f.column("l_partkey"),
                f.column("value_cents"),
                pc.divide(f.column("value_cents").cast(pa.float64()), 10000.0),
            ],
            names=["l_partkey", "value_cents", "value"],
        )

    return per_part.map_batches(keep, batch_format="pyarrow")


def excess_stock_suppliers(
    sf_dir: str,
    name_like: str = "gear",
    nation: str = "NATION_3",
    year: int = 1997,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q20 shape (potential part promotion): one nation's suppliers
    holding excess stock of a part family — the nested semi-join chain
    with a correlated per-(part, supplier) aggregate threshold. Stand-in
    for availqty (no partsupp table): a supplier has "excess stock" of a
    part when LESS than half its all-time shipped quantity of that part
    moved in ``year`` (qty_total > 2 * qty_year; quantities are integral,
    so the cross-multiplied test is exact int64).

    Scale shape — two bucketed exchanges plus a tiny name sort:

    1. partkey exchange: the part side ships name-filtered KEYS ONLY;
       lineitem collapses per batch to (partkey, suppkey, qty_total,
       qty_year) integer partials. Buckets semi-join, finish both sums,
       apply the threshold, and emit DISTINCT suppkeys (a suppkey
       reaching the merge at most once per bucket).
    2. suppkey exchange: the nation-filtered supplier side (≤25-row
       nation broadcast for the filter) ships (key, name); buckets
       re-dedup the winning suppkeys across part buckets and join names.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    nation_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkeys = nation_tbl.filter(
        pc.equal(nation_tbl.column("n_name"), nation)
    ).column("n_nationkey").combine_chunks()

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    supplier = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )
    n_rows = lineitem.count()
    n_buckets = n_buckets or auto_buckets(n_rows)
    width = partitions_for(n_rows)
    lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"))
    hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"))

    def _bucket(key):
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    ex1 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),  # partkey
            ("side", pa.string()),
            ("suppkey", pa.int64()),
            ("qty_total", pa.int64()),
            ("qty_year", pa.int64()),
        ]
    )

    def tag_qty(batch: pa.Table) -> pa.Table:
        qty = pc.round(batch.column("l_quantity")).cast(pa.int64())
        in_year = pc.and_(
            pc.greater_equal(batch.column("l_shipdate"), lo),
            pc.less(batch.column("l_shipdate"), hi),
        )
        qty_year = pc.if_else(in_year, qty, pa.scalar(0, pa.int64()))
        t = (
            pa.Table.from_arrays(
                [
                    batch.column("l_partkey"),
                    batch.column("l_suppkey"),
                    qty,
                    qty_year,
                ],
                names=["key", "suppkey", "qty_total", "qty_year"],
            )
            .group_by(["key", "suppkey"])
            .aggregate([("qty_total", "sum"), ("qty_year", "sum")])
        )
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(t.column("key")),
                t.column("key"),
                pa.array(["l"] * n, pa.string()),
                t.column("suppkey"),
                t.column("qty_total_sum"),
                t.column("qty_year_sum"),
            ],
            schema=ex1,
        )

    def tag_part(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.match_substring(batch.column("p_name"), name_like)
        )
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(f.column("p_partkey")),
                f.column("p_partkey"),
                pa.array(["p"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex1,
        )

    skey_schema = pa.schema([("suppkey", pa.int64())])

    def excess_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_p = pc.equal(g.column("side"), "p")
        pkeys = g.filter(is_p).column("key").combine_chunks()
        li = g.filter(pc.invert(is_p))
        hit = li.filter(pc.is_in(li.column("key"), value_set=pkeys))
        if hit.num_rows == 0:
            return skey_schema.empty_table()
        t = (
            hit.select(["key", "suppkey", "qty_total", "qty_year"])
            .group_by(["key", "suppkey"])
            .aggregate([("qty_total", "sum"), ("qty_year", "sum")])
        )
        excess = t.filter(
            pc.greater(
                t.column("qty_total_sum"),
                pc.multiply(t.column("qty_year_sum"), pa.scalar(2, pa.int64())),
            )
        )
        out = excess.select(["suppkey"]).group_by("suppkey").aggregate([])
        return out.cast(skey_schema)

    winners = (
        lineitem.map_batches(tag_qty, batch_format="pyarrow")
        .union(part.map_batches(tag_part, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=width)
        .map_groups(excess_bucket, batch_format="pyarrow")
    )

    ex2 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("key", pa.int64()),  # suppkey
            ("side", pa.string()),
            ("s_name", pa.string()),
        ]
    )

    def tag_winner(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(batch.column("suppkey")),
                batch.column("suppkey"),
                pa.array(["w"] * n, pa.string()),
                pa.nulls(n, pa.string()),
            ],
            schema=ex2,
        )

    def tag_supp(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.is_in(batch.column("s_nationkey"), value_set=nkeys))
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(f.column("s_suppkey")),
                f.column("s_suppkey"),
                pa.array(["s"] * n, pa.string()),
                f.column("s_name"),
            ],
            schema=ex2,
        )

    out_schema = pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())])

    def name_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_w = pc.equal(g.column("side"), "w")
        # re-dedup: the same suppkey can win in many part buckets
        w = (
            g.filter(is_w)
            .select(["key"])
            .group_by("key")
            .aggregate([])
        )
        s = g.filter(pc.equal(g.column("side"), "s")).select(["key", "s_name"])
        if w.num_rows == 0 or s.num_rows == 0:
            return out_schema.empty_table()
        j = w.join(s, keys="key", join_type="inner")
        return pa.Table.from_arrays(
            [j.column("key"), j.column("s_name")], schema=out_schema
        )

    return (
        winners.map_batches(tag_winner, batch_format="pyarrow")
        .union(supplier.map_batches(tag_supp, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=partitions_for(n_rows // 16))
        .map_groups(name_bucket, batch_format="pyarrow")
        .sort(key=["s_name", "s_suppkey"])
    )
