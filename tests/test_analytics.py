"""Relational operators vs DuckDB oracles (pre-agg groupby, broadcast join,
tumbling windows, sessionization)."""

import duckdb
import pandas as pd
import pytest

from agentic_doc_ray.functions import analytics as A

SF = "/root/testdata/sf0.001"


def _duck(sql):
    for t in ["lineitem", "orders", "customer", "events"]:
        sql = sql.replace(f" {t}", f" read_parquet('{SF}/{t}.parquet')")
    return duckdb.sql(sql).df()


def test_lineitem_pricing_summary():
    got = (
        A.lineitem_pricing_summary(SF)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_revenue,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1,2 ORDER BY 1,2
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_orders_by_segment_broadcast_join():
    got = (
        A.orders_by_segment(SF)
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT c.c_mktsegment,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price,
               count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1 ORDER BY 1
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_events_hourly_window():
    got = (
        A.events_hourly(SF)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value,
               count(*) AS n_events,
               min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY 1,2 ORDER BY 1,2
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_sessionize_against_sql_gaps():
    got = A.sessionize(SF, gap_minutes=30).to_pandas()
    got = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    want = _duck(
        """
        WITH marked AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
          FROM events
        ), numbered AS (
          SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS sess
          FROM marked
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
        FROM numbered GROUP BY user_id, sess ORDER BY user_id, session_start
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_events_sliding_window():
    got = (
        A.events_sliding(SF)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS window_start,
               event_type,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value,
               count(*) AS n_events
        FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k)
        GROUP BY 1,2 ORDER BY 1,2
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # every event lands in exactly 4 windows
    n_events = _duck("SELECT count(*) n FROM events")["n"][0]
    assert got["n_events"].sum() == 4 * n_events


def _order_priority_oracle():
    return _duck(
        """
        SELECT o.o_orderpriority,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
               count(DISTINCT o.o_orderkey) AS n_orders
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1 ORDER BY 1
        """
    )


def test_order_priority_revenue_native_join():
    from agentic_doc_ray.functions.joins import order_priority_revenue

    got = (
        order_priority_revenue(SF)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, _order_priority_oracle(), check_dtype=False, check_exact=True
    )


def test_order_priority_revenue_bucketed_join():
    from agentic_doc_ray.functions.joins import order_priority_revenue_bucketed

    got = (
        order_priority_revenue_bucketed(SF)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, _order_priority_oracle(), check_dtype=False, check_exact=True
    )


def test_purchase_prior_view_asof():
    got = (
        A.purchase_prior_view(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT p.event_id, p.user_id, p.ts, v.ts AS prior_view_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts > v.ts
        ORDER BY p.event_id
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_distinct_users():
    got = (
        A.distinct_users(SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = _duck(
        "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1 ORDER BY 1"
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_hll_distinct_within_error():
    import ray.data

    from agentic_doc_ray.functions.sketches import hll_distinct

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    got = hll_distinct(ds.repartition(6), "event_type", "user_id").to_pandas()
    want = _duck(
        "SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY 1"
    ).set_index("event_type")["n"]
    assert len(got) == len(want)
    for _, row in got.iterrows():
        exact = want[row["event_type"]]
        assert abs(row["approx_distinct"] - exact) / exact < 0.05  # 4096 regs ~1.6% se


def test_hll_merge_is_partition_invariant():
    import ray.data

    from agentic_doc_ray.functions.sketches import hll_distinct

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    a = hll_distinct(ds.repartition(2), "event_type", "user_id").to_pydict()
    b = hll_distinct(ds.repartition(11), "event_type", "user_id").to_pydict()
    assert a == b


def test_exact_quantiles_vs_duckdb():
    import duckdb
    import pandas as pd
    import ray.data

    from agentic_doc_ray.functions.sketches import exact_quantiles

    SF = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    got = (
        exact_quantiles(ds, "event_type", "value")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            "SELECT event_type, "
            "quantile_disc(CAST(round(value*100) AS BIGINT), 0.5)/100.0 AS p50, "
            "quantile_disc(CAST(round(value*100) AS BIGINT), 0.9)/100.0 AS p90, "
            "quantile_disc(CAST(round(value*100) AS BIGINT), 0.99)/100.0 AS p99 "
            f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type "
            "ORDER BY event_type"
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_exact_quantiles_edge_small_groups():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.sketches import exact_quantiles

    t = pa.Table.from_pydict(
        {"g": ["a", "a", "a", "a", "b"], "v": [1.0, 2.0, 3.0, 4.0, 7.0]}
    )
    out = {
        r["g"]: r
        for r in exact_quantiles(
            ray.data.from_arrow(t), "g", "v", quantiles=(0.5, 0.9)
        ).to_pylist()
    }
    # quantile_disc: smallest value with cumulative fraction >= q
    assert out["a"]["p50"] == 2.0 and out["a"]["p90"] == 4.0
    assert out["b"]["p50"] == 7.0 and out["b"]["p90"] == 7.0


def test_funnel_counts_vs_sql_chain():
    got = (
        A.funnel_counts(SF).to_pandas().sort_values("stage").reset_index(drop=True)
    )
    want = _duck(
        """
        WITH v AS (SELECT user_id, min(ts) AS prev FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS prev FROM events e
              JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.prev GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS prev FROM events e
              JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.prev GROUP BY e.user_id)
        SELECT '1_view' AS stage, count(*) AS n_users FROM v
        UNION ALL SELECT '2_view_click', count(*) FROM c
        UNION ALL SELECT '3_view_click_purchase', count(*) FROM p
        ORDER BY stage
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # funnel must be monotone non-increasing
    assert got["n_users"].is_monotonic_decreasing or got["n_users"].nunique() == 1


def test_nation_returned_revenue_four_table_join():
    from agentic_doc_ray.functions import joins as J

    got = (
        J.nation_returned_revenue(SF)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    sql = """
        SELECT n.n_name,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
               count(DISTINCT o.o_orderkey) AS n_orders
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R' GROUP BY n.n_name ORDER BY n.n_name
    """
    import re

    for t in ["lineitem", "orders", "customer", "nation"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_customer_order_distribution_q13():
    """LEFT-outer + double aggregate: zero-order customers MUST appear in
    the c_count=0 bucket (the whole point of the outer join)."""
    from agentic_doc_ray.functions import joins as J

    got = (
        J.customer_order_distribution(SF)
        .to_pandas()
        .sort_values("c_count")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c.c_custkey, count(o.o_custkey) AS c_count
          FROM read_parquet('{SF}/customer.parquet') c
          LEFT OUTER JOIN (SELECT o_custkey FROM read_parquet('{SF}/orders.parquet')
                           WHERE o_orderpriority <> '1-URGENT') o
            ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) GROUP BY c_count ORDER BY c_count
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # the distribution must account for every customer exactly once
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    assert got["custdist"].sum() == n_cust


def test_large_quantity_orders_q18():
    """HAVING-then-join-back: every row's qty must exceed the threshold,
    and the result must match SQL exactly (inner joins, exact cents)."""
    from agentic_doc_ray.functions import joins as J

    got = (
        J.large_quantity_orders(SF, min_qty=150)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents, q.qty
        FROM (SELECT l_orderkey,
                     CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
              FROM read_parquet('{SF}/lineitem.parquet')
              GROUP BY l_orderkey HAVING qty > 150) q
        JOIN read_parquet('{SF}/orders.parquet') o ON o.o_orderkey = q.l_orderkey
        JOIN read_parquet('{SF}/customer.parquet') c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_orderkey
        """
    ).df()
    assert len(got) > 0, "threshold too high for the test scale"
    assert (got["qty"] > 150).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_user_event_paths_ordered_collect():
    got = (
        A.user_event_paths(SF)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
               count(*) AS n_events
        FROM events GROUP BY user_id ORDER BY user_id
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # path length must equal n_events (ordered collect drops nothing)
    assert (got["path"].str.count(">") + 1 == got["n_events"]).all()


def test_order_rollup_grouping_sets():
    got = (
        A.order_priority_status_rollup(SF)
        .to_pandas()
        .sort_values(["priority", "status"])
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
               count(*) AS n_orders
        FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        ORDER BY 1, 2
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # the grand total must equal the sum of the leaf level
    leaf = got[(got.priority != "ALL") & (got.status != "ALL")]
    total = got[(got.priority == "ALL") & (got.status == "ALL")]
    assert int(leaf.cents.sum()) == int(total.cents.iloc[0])
    assert int(leaf.n_orders.sum()) == int(total.n_orders.iloc[0])


def test_user_event_pivot_conditional_agg():
    got = (
        A.user_event_pivot(SF)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click') AS n_click,
               count(*) FILTER (WHERE event_type = 'error') AS n_error,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               count(*) FILTER (WHERE event_type = 'view') AS n_view
        FROM events GROUP BY user_id ORDER BY user_id
        """
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False, check_exact=True
    )


def test_event_value_histogram_exact_bins():
    got = (
        A.event_value_histogram(SF)
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT CAST(round(value * 100) AS BIGINT) // 1000 AS bin,
               count(*) AS n_events
        FROM events GROUP BY 1 ORDER BY 1
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert int(got["n_events"].sum()) == len(_duck("SELECT * FROM events"))


def test_priority_revenue_share_sums_to_one():
    got = (
        A.priority_revenue_share(SF)
        .to_pandas()
        .sort_values("priority")
        .reset_index(drop=True)
    )
    want = _duck(
        """
        WITH a AS (SELECT o_orderpriority AS priority,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
                   FROM orders GROUP BY 1)
        SELECT priority, cents, CAST(cents AS DOUBLE) /
               (SELECT CAST(sum(cents) AS DOUBLE) FROM a) AS share
        FROM a ORDER BY priority
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert abs(got["share"].sum() - 1.0) < 1e-12


def test_cohort_retention():
    got = (
        A.cohort_retention(SF)
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    want = _duck(
        """
        WITH weeks AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
        ), firsts AS (
          SELECT user_id, min(w) AS cohort FROM weeks GROUP BY user_id
        )
        SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
               date_diff('day', f.cohort, w.w) // 7 AS week_offset,
               COUNT(*) AS n_users
        FROM weeks w JOIN firsts f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # offset 0 exists for every cohort (each user is active in their own
    # first week by construction)
    assert (got.groupby("cohort_week")["week_offset"].min() == 0).all()


def test_hll_replica_oracle_bit_equal():
    """Distributed HLL == single-process replica exactly (commutative
    register max-merge makes the estimate batching-independent)."""
    import pyarrow as pa

    import ray.data

    from agentic_doc_ray.functions.sketches import hll_distinct, hll_distinct_oracle

    t = pa.table(
        {
            "event_type": [f"t{i % 3}" for i in range(5000)],
            "user_id": [i % 700 for i in range(5000)],
        }
    )
    got = hll_distinct(
        ray.data.from_arrow(t).repartition(7), "event_type", "user_id"
    ).to_pylist()
    want = hll_distinct_oracle(t, "event_type", "user_id").to_pylist()
    assert got == want


def test_shipping_priority_q3_topk():
    """Q3 shape: top-k building-segment orders by outstanding revenue must
    equal the SQL plan row-for-row IN ORDER (the tie-break is total)."""
    import re

    from agentic_doc_ray.functions import joins as J

    got = J.shipping_priority(SF, k=10).to_pandas().reset_index(drop=True)
    sql = """
        WITH rev AS (
          SELECT l_orderkey,
                 sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS cents
          FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01'
          GROUP BY l_orderkey)
        SELECT o.o_orderkey AS l_orderkey,
               CAST(r.cents AS BIGINT) / 10000.0 AS revenue,
               o.o_orderdate
        FROM orders o
        JOIN rev r ON r.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        ORDER BY revenue DESC, o.o_orderdate, l_orderkey LIMIT 10
    """
    for t in ["lineitem", "orders", "customer"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_late_shipment_priority_q12():
    import re

    from agentic_doc_ray.functions import joins as J

    got = (
        J.late_shipment_priority(SF)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    sql = """
        SELECT l.l_returnflag,
          CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """
    for t in ["lineitem", "orders"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_promo_revenue_share_q14():
    import re

    from agentic_doc_ray.functions import joins as J

    got = J.promo_revenue_share(SF).to_pandas()
    sql = """
        WITH rev AS (
          SELECT l_partkey,
                 sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS cents
          FROM lineitem GROUP BY l_partkey
        ), j AS (
          SELECT CASE WHEN p.p_type = 'PROMO' THEN r.cents ELSE 0 END AS pcents,
                 r.cents
          FROM rev r JOIN part p ON p.p_partkey = r.l_partkey
        )
        SELECT CAST(sum(pcents) AS BIGINT) AS promo_cents,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST((1000 * CAST(sum(pcents) AS BIGINT)) // CAST(sum(cents) AS BIGINT) AS BIGINT) AS promo_per_mille
        FROM j
    """
    for t in ["lineitem", "part"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert got.iloc[0]["total_cents"] > got.iloc[0]["promo_cents"] > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_regional_supplier_volume_q5():
    """Q5 shape: 6-table join with the customer==supplier nation
    co-location predicate; revenue is an exact integer-cents sum."""
    import re

    from agentic_doc_ray.functions import joins as J

    got = J.regional_supplier_volume(SF).to_pandas().reset_index(drop=True)
    sql = """
        SELECT n.n_name,
        CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE c.c_nationkey = s.s_nationkey AND r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n.n_name ORDER BY revenue DESC, n.n_name
    """
    for t in ["customer", "orders", "lineitem", "supplier", "nation", "region"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_large_volume_customer_q18():
    """Q18 shape: aggregate-HAVING semi-join + top-k; total order pinned
    by (o_totalprice DESC, o_orderkey)."""
    import re

    from agentic_doc_ray.functions import joins as J

    got = J.large_volume_customer(SF).to_pandas().reset_index(drop=True)
    sql = """
        WITH q AS (
          SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
          FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
        ), top AS (
          SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice, q.total_qty
          FROM orders o JOIN q ON q.l_orderkey = o.o_orderkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
        )
        SELECT c.c_name, t.o_orderkey, t.o_orderdate, t.o_totalprice, t.total_qty
        FROM top t JOIN customer c ON c.c_custkey = t.o_custkey
        ORDER BY t.o_totalprice DESC, t.o_orderkey
    """
    for t in ["lineitem", "orders", "customer"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_nation_trade_volume_q7():
    """Q7 shape: cross-nation trade flows (supp != cust nation) per
    ordered pair, via the shared Q5-family exchange streams."""
    import re

    from agentic_doc_ray.functions import joins as J

    got = J.nation_trade_volume(SF).to_pandas().reset_index(drop=True)
    sql = """
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        WHERE ns.n_name IN ('NATION_3','NATION_12')
        AND nc.n_name IN ('NATION_3','NATION_12')
        AND ns.n_name <> nc.n_name
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1,2 ORDER BY revenue DESC, supp_nation, cust_nation
    """
    for t in ["customer", "orders", "lineitem", "supplier", "nation"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert len(got) == 2  # both directions of the pair
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_pruned_revenue_scan_pushdown():
    """Filter pushed into the parquet read == the SQL plan; also pinned
    against the same pipeline WITHOUT pushdown (post-read filter), so
    pruning can never change results."""
    import re

    got = A.pruned_revenue_scan(SF).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    sql = """
        SELECT l_returnflag,
        CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
        GROUP BY l_returnflag ORDER BY l_returnflag
    """
    sql = re.sub(r"\blineitem\b", f"read_parquet('{SF}/lineitem.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_order_priority_check_q4():
    """Q4 shape: EXISTS must count each order once no matter how many of
    its lineitems are late (the in-join dedupe)."""
    import re

    from agentic_doc_ray.functions import joins as J

    got = J.order_priority_check(SF).to_pandas().reset_index(drop=True)
    sql = """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
        AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """
    for t in ["orders", "lineitem"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert len(got) == 5
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


SF01 = "/root/testdata/sf0.01"


def _tpch_sql(sql, sf, tables):
    import re

    for t in tables:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{sf}/{t}.parquet')", sql)
    return duckdb.sql(sql).df()


def test_top_supplier_revenue_q15():
    """Q15 shape: scalar-subquery max with tie preservation — the winner
    set must equal the SQL plan exactly (including any ties)."""
    from agentic_doc_ray.functions import joins as J

    got = (
        J.top_revenue_supplier(SF01)
        .to_pandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    want = _tpch_sql(
        """
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, CAST(r.cents AS BIGINT) / 10000.0 AS total_revenue
        FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
        WHERE r.cents = (SELECT max(cents) FROM rev)
        ORDER BY s.s_suppkey
        """,
        SF01,
        ["lineitem", "supplier"],
    )
    assert len(got) >= 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_small_quantity_revenue_q17():
    """Q17 shape: the exact-integer form 5*qty*cnt < qty_sum must match the
    SQL correlated-average plan; sf0.001 pins the zero-match path."""
    from agentic_doc_ray.functions import joins as J

    sql = """
        WITH pk AS (SELECT p_partkey FROM part
                    WHERE p_brand = 'Brand#23' AND p_size <= 10),
        l AS (SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS q,
                     CAST(round(l_extendedprice * 10000) AS BIGINT) AS cents
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM pk)),
        ag AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS qs, count(*) AS n
               FROM l GROUP BY l_partkey)
        SELECT CAST(COALESCE(sum(l.cents), 0) AS BIGINT) AS total_cents,
               CAST(COALESCE(sum(l.cents), 0) AS BIGINT) / 70000.0 AS avg_yearly
        FROM l JOIN ag ON ag.l_partkey = l.l_partkey
        WHERE 5 * l.q * ag.n < ag.qs
    """
    got = J.small_quantity_revenue(SF01).to_pandas()
    want = _tpch_sql(sql, SF01, ["lineitem", "part"])
    assert int(got["total_cents"][0]) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # zero-match corpus: the single output row must still agree
    got0 = J.small_quantity_revenue(SF).to_pandas()
    want0 = _tpch_sql(sql, SF, ["lineitem", "part"])
    pd.testing.assert_frame_equal(got0, want0, check_dtype=False, check_exact=True)


def test_brand_bracket_revenue_q19():
    """Q19 shape: the OR-of-brackets predicate resolves only after the
    part attributes meet the lineitem row — bucketed join + vectorized
    disjunction must equal the SQL plan."""
    from agentic_doc_ray.functions import joins as J

    sql = """
        SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS total_cents,
               CAST(COALESCE(sum(c), 0) AS BIGINT) / 10000.0 AS revenue
        FROM (
          SELECT CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS c
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                 AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 11)
             OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
                 AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 10 AND 20)
             OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
                 AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 20 AND 30)
        )
    """
    got = J.brand_bracket_revenue(SF01).to_pandas()
    want = _tpch_sql(sql, SF01, ["lineitem", "part"])
    assert int(got["total_cents"][0]) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_idle_rich_customers_q22():
    """Q22 shape: exact-integer above-average test + anti-join on
    high-value orders + per-nation rollup; sf0.001 pins the all-filtered
    (empty-output) path through the exchange."""
    from agentic_doc_ray.functions import joins as J

    sql = """
        WITH c0 AS (SELECT c_custkey, c_nationkey,
                           CAST(round(c_acctbal * 100) AS BIGINT) AS bal
                    FROM customer
                    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        s AS (SELECT CAST(sum(CASE WHEN bal > 0 THEN bal ELSE 0 END) AS BIGINT) AS tot,
                     CAST(sum(CASE WHEN bal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
              FROM c0),
        hot AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_totalprice > 300000.0)
        SELECT c.c_nationkey, count(*) AS n_custs,
               CAST(sum(c.bal) AS BIGINT) / 100.0 AS total_acctbal
        FROM c0 c, s
        WHERE c.bal * s.n > s.tot
          AND NOT EXISTS (SELECT 1 FROM hot h WHERE h.o_custkey = c.c_custkey)
        GROUP BY c.c_nationkey ORDER BY c.c_nationkey
    """
    got = (
        J.idle_rich_customers(SF01)
        .to_pandas()
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    want = _tpch_sql(sql, SF01, ["customer", "orders"])
    assert len(got) >= 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # all-anti-joined corpus: empty output on both sides
    got0 = J.idle_rich_customers(SF).to_pandas()
    assert len(got0) == 0


def test_nation_market_share_q8():
    """Q8 shape: 7-table market-share join with numerator/denominator
    split per year — exact cents on both engines, share is one IEEE
    division of the two BIGINTs."""
    from agentic_doc_ray.functions import joins as J

    sql = """
        WITH v AS (
          SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
                 CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS cents,
                 s.s_nationkey
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
            AND o.o_orderdate >= TIMESTAMP '1996-01-01'
            AND o.o_orderdate < TIMESTAMP '1998-01-01')
        SELECT o_year,
          CAST(sum(CASE WHEN s_nationkey = 7 THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
          CAST(sum(cents) AS BIGINT) AS total_cents,
          CAST(sum(CASE WHEN s_nationkey = 7 THEN cents ELSE 0 END) AS BIGINT)
            / CAST(sum(cents) AS BIGINT) AS mkt_share
        FROM v GROUP BY o_year ORDER BY o_year
    """
    got = (
        J.nation_market_share(SF01)
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    want = _tpch_sql(
        sql,
        SF01,
        ["lineitem", "part", "supplier", "orders", "customer", "nation", "region"],
    )
    assert len(got) == 2
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_waiting_supplier_check_q21():
    """Q21 shape: orders with >1 supplier where exactly ONE shipped late
    credit that supplier; derived late predicate (max shipdate per
    (order, supplier) vs orderdate + 90 days), deterministic
    (numwait DESC, s_name) order."""
    from agentic_doc_ray.functions import joins as J

    sql = """
        WITH l AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
                   FROM lineitem GROUP BY 1, 2),
        j AS (SELECT l.l_orderkey, l.l_suppkey,
                CASE WHEN l.ms > o.o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END AS late
              FROM l JOIN orders o ON o.o_orderkey = l.l_orderkey
              WHERE o.o_orderstatus = 'F'),
        agg AS (SELECT l_orderkey, count(*) AS n_supps, sum(late) AS n_late
                FROM j GROUP BY 1),
        w AS (SELECT j.l_suppkey FROM j JOIN agg USING (l_orderkey)
              WHERE j.late = 1 AND agg.n_supps > 1 AND agg.n_late = 1)
        SELECT s.s_name AS s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_12'
        GROUP BY s.s_name ORDER BY numwait DESC, s_name LIMIT 100
    """
    got = (
        J.waiting_supplier_check(SF, nation="NATION_12")
        .to_pandas()
        .reset_index(drop=True)
    )
    want = _tpch_sql(sql, SF, ["lineitem", "orders", "supplier", "nation"])
    assert len(got) >= 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_cms_token_counts_guarantees():
    """Count-Min: distributed == replica bit-for-bit; estimates are NEVER
    below exact counts (collisions only add), and a tiny width=16 sketch
    forces collisions to prove the min-over-depth still upper-bounds."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from agentic_doc_ray.functions.sketches import (
        cms_token_counts,
        cms_token_counts_oracle,
    )

    sf = "/root/testdata/sf0.001"
    probes = ["hash", "join", "vector", "window", "spark", "zzz_absent"]
    d = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    got = cms_token_counts(d.repartition(7), probes).to_pandas()
    want = cms_token_counts_oracle(tbl, probes).to_pandas()
    pd.testing.assert_frame_equal(got, want, check_exact=True)

    # exact counts lower-bound the estimates, at ANY width
    exact = duckdb.sql(
        f"""
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest(regexp_split_to_array(
            regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS w
          FROM read_parquet('{sf}/documents.parquet')
          WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> '') t
        GROUP BY 1
        """
    ).df()
    exact_map = dict(zip(exact["w"], exact["c"]))
    for width in (2048, 16):  # 16 forces heavy collisions
        est = cms_token_counts_oracle(tbl, probes, width=width).to_pandas()
        for tok, e in zip(est["token"], est["est_count"]):
            assert e >= exact_map.get(tok, 0), (width, tok, e)
    # wide sketch on a small vocab is collision-free -> exact
    for tok, e in zip(want["token"], want["est_count"]):
        assert e == exact_map.get(tok, 0)


def test_event_transitions_vs_sql_lag():
    got = (
        A.event_transitions(SF)
        .to_pandas()
        .sort_values(["prev_event", "next_event"])
        .reset_index(drop=True)
    )
    want = _duck(
        """
        WITH o AS (SELECT user_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS prev_type FROM events)
        SELECT prev_type AS prev_event, event_type AS next_event,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2
        ORDER BY prev_event, next_event
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # total transitions = total events - distinct users (every user's
    # first event has no predecessor)
    tot = _duck(
        "SELECT count(*) - count(DISTINCT user_id) AS n FROM events"
    )["n"][0]
    assert got["n_pairs"].sum() == tot


def test_forecast_revenue_q6():
    """Q6 shape: one-row forecast scan (pushed date window + vectorized
    discount/quantity predicate + exact integer cents, zero exchanges)."""
    import re

    got = A.forecast_revenue(SF).to_pandas().reset_index(drop=True)
    sql = """
        WITH f AS (
          SELECT CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT) AS cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND l_discount >= 0.05 AND l_discount <= 0.07
            AND l_quantity < 24
        )
        SELECT CAST(COALESCE(sum(cents), 0) AS BIGINT) AS forecast_cents,
               CAST(COALESCE(sum(cents), 0) AS BIGINT) / 10000.0 AS forecast_revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM f
    """
    sql = re.sub(r"\blineitem\b", f"read_parquet('{SF}/lineitem.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert got["n_lines"][0] > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_product_type_profit_q9():
    """Q9 shape: per-(nation, year) profit for name-filtered parts —
    three bucketed exchanges, exact integer cents."""
    import re

    from agentic_doc_ray.functions import joins as J

    got = (
        J.product_type_profit(SF)
        .to_pandas()
        .sort_values(["n_name", "o_year"])
        .reset_index(drop=True)
    )
    sql = """
        SELECT n.n_name,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS profit_cents,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    for t in ["lineitem", "part", "supplier", "nation", "orders"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_min_cost_supplier_q2():
    """Q2 shape: per-part min-cost supplier in one region, ties preserved,
    deterministic top-100."""
    import re

    from agentic_doc_ray.functions import joins as J

    got = (
        J.min_cost_supplier(SF)
        .to_pandas()
        .sort_values(["s_acctbal", "s_name", "p_partkey"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    sql = """
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 CAST(min(CAST(round(l_extendedprice*10000) AS BIGINT)) AS BIGINT) AS cents
          FROM lineitem GROUP BY 1, 2
        ), esupp AS (
          SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
          FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey WHERE r.r_name = 'EUROPE'
        ), cand AS (
          SELECT p.p_partkey, p.p_brand, e.s_suppkey, e.s_name, e.s_acctbal, e.n_name, ps.cents
          FROM part p JOIN ps ON ps.l_partkey = p.p_partkey
          JOIN esupp e ON e.s_suppkey = ps.l_suppkey
          WHERE p.p_type = 'PROMO' AND p.p_size < 10
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey,
               cents/10000.0 AS cost
        FROM cand
        QUALIFY cents = min(cents) OVER (PARTITION BY p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey LIMIT 100
    """
    for t in ["lineitem", "supplier", "nation", "region", "part"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = (
        duckdb.sql(sql)
        .df()
        .sort_values(["s_acctbal", "s_name", "p_partkey"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_important_part_values_q11():
    """Q11 shape: per-part value vs global-total threshold (exact integer
    cross-multiply), supplier side as a keys-only semi-join."""
    import re

    from agentic_doc_ray.functions import joins as J

    # NATION_8 is the sf0.001 fixture's supplier-bearing nation (NATION_7,
    # the sf0.01 default the driver checks, has no suppliers at this SF)
    got = (
        J.important_part_values(SF, nation="NATION_8")
        .to_pandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    sql = """
        WITH ps AS (
          SELECT l.l_partkey,
                 CAST(sum(CAST(round(l.l_extendedprice*10000) AS BIGINT)) AS BIGINT) AS value_cents
          FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          WHERE n.n_name = 'NATION_8'
          GROUP BY 1
        ), tot AS (SELECT count(*) AS n, sum(value_cents) AS t FROM ps)
        SELECT l_partkey, value_cents, value_cents/10000.0 AS value
        FROM ps, tot WHERE value_cents * n > 2 * t
        ORDER BY l_partkey
    """
    for t in ["lineitem", "supplier", "nation"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_excess_stock_suppliers_q20():
    """Q20 shape: nested semi-join chain with a correlated aggregate
    threshold; winners deduped across part buckets."""
    import re

    from agentic_doc_ray.functions import joins as J

    got = J.excess_stock_suppliers(SF).to_pandas().reset_index(drop=True)
    sql = """
        SELECT s.s_suppkey, s.s_name
        FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3' AND s.s_suppkey IN (
          SELECT ps.l_suppkey FROM (
            SELECT l_partkey, l_suppkey,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_total,
                   CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                                  AND l_shipdate < TIMESTAMP '1998-01-01'
                                 THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_year
            FROM lineitem GROUP BY 1, 2
          ) ps
          WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
            AND ps.qty_total > 2*ps.qty_year
        ) ORDER BY s_name, s_suppkey
    """
    for t in ["lineitem", "supplier", "nation", "part"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_brand_supplier_counts_q16():
    """Q16 shape: distinct suppliers per small brand/size bracket —
    join + count-distinct with per-batch pair dedup before the exchange."""
    import re

    from agentic_doc_ray.functions import joins as J

    got = (
        J.brand_supplier_counts(SF)
        .to_pandas()
        .sort_values(["p_brand", "p_size"])
        .reset_index(drop=True)
    )
    sql = """
        SELECT p.p_brand,
               CAST(p.p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_size < 3
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    for t in ["lineitem", "part"]:
        sql = re.sub(rf"\b{t}\b", f"read_parquet('{SF}/{t}.parquet')", sql)
    want = duckdb.sql(sql).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_event_outliers_exact_three_sigma():
    """The distributed flags equal an independent float-free brute check
    (exact Python-int cross-multiplication per row), and the flagged set
    is non-trivial on the exponential-tailed value column."""
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions.analytics import event_outliers

    got = (
        event_outliers(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "event_type", "value"])
    import numpy as np

    cents = np.floor(np.asarray(t["value"].to_numpy()) * 100 + 0.5).astype(np.int64)
    types = np.asarray(t["event_type"].to_pylist(), dtype=object)
    ids = t["event_id"].to_numpy()
    want = []
    for et in np.unique(types):
        m = types == et
        n, s = int(m.sum()), int(cents[m].sum())
        q = int((cents[m].astype(object) ** 2).sum())  # exact python ints
        for i, x in zip(ids[m], cents[m]):
            lhs = int(x) * n - s
            if lhs > 0 and lhs * lhs > 9 * (n * q - s * s):
                want.append((int(i), et, int(x)))
    want.sort()
    assert got.values.tolist() == [list(w) for w in want]
    assert len(want) > 10


def test_revenue_trend_matches_numpy_ols():
    """Exact-integer slope equals the float OLS slope to 1e-6 relative,
    per priority, and n_days matches the distinct-day count."""
    import numpy as np
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions.analytics import revenue_trend

    got = revenue_trend(SF).to_pandas().set_index("o_orderpriority")
    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    t["x"] = (
        t["o_orderdate"].astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    ) - 9000
    t["cents"] = np.floor(t["o_totalprice"] * 100 + 0.5).astype("int64")
    for prio, sub in t.groupby("o_orderpriority"):
        daily = sub.groupby("x")["cents"].sum()
        slope = np.polyfit(daily.index.to_numpy(float), daily.to_numpy(float), 1)[0]
        row = got.loc[prio]
        assert row["n_days"] == len(daily)
        assert abs(row["slope_micro"] / 1e6 - slope) <= max(1e-6 * abs(slope), 1e-3)


def test_qty_discount_covariance_exact():
    got = (
        A.qty_discount_covariance(SF)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH m AS (SELECT l_returnflag,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_q,
          CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_d,
          CAST(sum(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_qd
        FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1)
        SELECT l_returnflag, n, sum_q, sum_d, sum_qd,
          CAST(n*sum_qd - sum_q*sum_d AS BIGINT) AS cov_num FROM m
        ORDER BY l_returnflag
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, check_exact=True,
    )
    # the Python-int cross-multiply must equal the definition n^2*cov
    r = got.iloc[0]
    assert r["cov_num"] == r["n"] * r["sum_qd"] - r["sum_q"] * r["sum_d"]


def test_copurchase_pairs_support():
    got = (
        A.copurchase_pairs(SF)
        .to_pandas()
        .sort_values(["support", "part_a", "part_b"],
                     ascending=[False, True, True])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH p AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM read_parquet('{SF}/lineitem.parquet')),
        pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
          FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey),
        c AS (SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS support
          FROM pr GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER
          (ORDER BY support DESC, part_a, part_b) AS rn FROM c)
        SELECT part_a, part_b, support FROM r WHERE rn <= 100
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, check_exact=True,
    )
    assert (got["part_a"] < got["part_b"]).all()


def test_revenue_moving_avg_window():
    got = (
        A.revenue_moving_avg(SF)
        .to_pandas()
        .sort_values("day_num")
        .reset_index(drop=True)
    )
    # hand-rolled trailing window over the daily rollup
    daily = duckdb.sql(
        f"""
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_num,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS day_cents
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1 ORDER BY 1
        """
    ).df()
    c = daily["day_cents"].to_numpy()
    for i in [0, 3, len(daily) - 1]:
        lo = max(0, i - 6)
        row = got.iloc[i]
        assert row["win_cents"] == c[lo : i + 1].sum()
        assert row["win_days"] == i + 1 - lo
        assert row["avg_cents"] == c[lo : i + 1].sum() // (i + 1 - lo)
    assert len(got) == len(daily)
    assert (got["day_num"].to_numpy() == daily["day_num"].to_numpy()).all()


def test_scd2_history_intervals():
    got = A.scd2_history(SF).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
          ts AS valid_from, lead(ts) OVER w AS valid_to, event_type,
          CAST(round(value*100) AS BIGINT) AS value_cents
        FROM read_parquet('{SF}/events.parquet')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    ).df()
    g = got.sort_values(["user_id", "version"]).reset_index(drop=True)
    w = want.sort_values(["user_id", "version"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[sorted(g.columns)], w[sorted(w.columns)],
        check_dtype=False, check_exact=True,
    )
    # interval chain: valid_to == next valid_from; exactly one open
    # (NULL) interval per user, on its max version
    for uid, grp in g.groupby("user_id"):
        grp = grp.sort_values("version")
        assert grp["valid_to"].isna().sum() == 1
        assert pd.isna(grp["valid_to"].iloc[-1])
        assert (
            grp["valid_to"].iloc[:-1].to_numpy()
            == grp["valid_from"].iloc[1:].to_numpy()
        ).all()
        if uid > 20:
            break


def test_revenue_changepoint_exact():
    got = A.revenue_changepoint(SF).take_all()
    assert len(got) == 1
    r = got[0]
    daily = duckdb.sql(
        f"""
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_num,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1 ORDER BY 1
        """
    ).df()
    n = len(daily)
    s_n = int(daily["c"].sum())
    cs, best = 0, None
    for i, (day, c) in enumerate(zip(daily["day_num"], daily["c"])):
        cs += int(c)
        d = n * cs - (i + 1) * s_n
        if best is None or abs(d) > abs(best[1]):
            best = (int(day), d)
    assert (r["split_day_num"], r["d_value"]) == best
    assert r["n_days"] == n and r["total_cents"] == s_n


def _brute_skyline(price, size):
    """O(n^2) dominance reference for the 2-D skyline."""
    keep = []
    n = len(price)
    for i in range(n):
        dominated = any(
            price[j] <= price[i]
            and size[j] >= size[i]
            and (price[j] < price[i] or size[j] > size[i])
            for j in range(n)
        )
        if not dominated:
            keep.append(i)
    return set(keep)


def test_local_skyline_matches_brute_force():
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(11)
    price = np.round(rng.uniform(1, 50, 200), 2)
    size = rng.randint(1, 20, 200).astype(np.int64)
    # plant ties on both dims: duplicate frontier points must ALL survive
    price[10] = price[11] = 1.0
    size[10] = size[11] = 19
    t = pa.table(
        {
            "p_partkey": pa.array(range(200), pa.int64()),
            "p_retailprice": pa.array(price, pa.float64()),
            "p_size": pa.array(size, pa.int64()),
        }
    )
    got = set(A._local_skyline(t).column("p_partkey").to_pylist())
    assert got == _brute_skyline(price, size)


def test_skyline_composition_is_lossless():
    """skyline(skyline(A) U skyline(B)) == skyline(A U B): the property
    the distributed partial->merge shape relies on."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(7)
    price = np.round(rng.uniform(1, 30, 300), 2)
    size = rng.randint(1, 15, 300).astype(np.int64)
    t = pa.table(
        {
            "p_partkey": pa.array(range(300), pa.int64()),
            "p_retailprice": pa.array(price, pa.float64()),
            "p_size": pa.array(size, pa.int64()),
        }
    )
    import pyarrow as _pa

    whole = set(A._local_skyline(t).column("p_partkey").to_pylist())
    parts = [t.slice(0, 100), t.slice(100, 100), t.slice(200, 100)]
    merged = A._local_skyline(
        _pa.concat_tables([A._local_skyline(p) for p in parts])
    )
    assert set(merged.column("p_partkey").to_pylist()) == whole


def test_pareto_front_end_to_end_matches_sql():
    got = (
        A.pareto_front(SF)
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""
        SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
        FROM read_parquet('{SF}/part.parquet') p WHERE NOT EXISTS (
          SELECT 1 FROM read_parquet('{SF}/part.parquet') q
          WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
            AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        ORDER BY p_partkey
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_user_latest_state_matches_sql():
    got = (
        A.user_latest_state(SF)
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        _duck(
            "SELECT user_id, event_type, last_ts_us, last_event_id,"
            " last_value_cents FROM ("
            " SELECT user_id, event_type, epoch_us(ts) AS last_ts_us,"
            "  event_id AS last_event_id,"
            "  CAST(round(value * 100) AS BIGINT) AS last_value_cents,"
            "  row_number() OVER (PARTITION BY user_id, event_type"
            "   ORDER BY ts DESC, event_id DESC) AS rn FROM events"
            ") WHERE rn = 1 ORDER BY user_id, event_type"
        )
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_group_quantiles_brute_force():
    import duckdb
    import numpy as np

    from agentic_doc_ray.functions.analytics import group_quantiles

    got = (
        group_quantiles("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    con = duckdb.connect()
    ev = con.execute(
        "SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).df()
    for etype, sub in ev.groupby("event_type"):
        v = np.sort(sub["cents"].to_numpy())
        n = len(v)
        assert got.loc[etype, "n"] == n
        assert got.loc[etype, "p50_cents"] == v[(n - 1) // 2]
        assert got.loc[etype, "p90_cents"] == v[(n - 1) * 9 // 10]
        assert got.loc[etype, "p99_cents"] == v[(n - 1) * 99 // 100]


def test_copurchase_triples_brute_force():
    from collections import Counter
    from itertools import combinations

    import duckdb

    from agentic_doc_ray.functions.analytics import copurchase_triples

    got = (
        copurchase_triples("/root/testdata/sf0.001", min_support=2)
        .to_pandas()
        .sort_values(["part_a", "part_b", "part_c"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    rows = con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey "
        "FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    ).fetchall()
    baskets: dict[int, list] = {}
    for o, p in rows:
        baskets.setdefault(o, []).append(p)
    cnt = Counter()
    for parts in baskets.values():
        for tri in combinations(sorted(parts), 3):
            cnt[tri] += 1
    want = sorted((t, s) for t, s in cnt.items() if s >= 2)
    assert [
        ((r.part_a, r.part_b, r.part_c), r.support) for r in got.itertuples()
    ] == want


def test_conversion_lags_brute_force():
    import duckdb

    from agentic_doc_ray.functions.analytics import conversion_lags

    got = (
        conversion_lags("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("user_id")["lag_sec"]
        .to_dict()
    )
    con = duckdb.connect()
    ev = con.execute(
        "SELECT user_id, epoch_us(ts) AS us, event_type "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet') "
        "WHERE event_type IN ('view', 'purchase')"
    ).df()
    want = {}
    for uid, sub in ev.groupby("user_id"):
        views = sub.loc[sub["event_type"] == "view", "us"]
        if views.empty:
            continue
        fv = views.min()
        pur = sub.loc[(sub["event_type"] == "purchase") & (sub["us"] >= fv), "us"]
        if pur.empty:
            continue
        want[uid] = int((pur.min() - fv) // 1_000_000)
    assert got == want
    assert all(v >= 0 for v in got.values())


def test_rolling_active_users_brute_force():
    import duckdb

    from agentic_doc_ray.functions.analytics import (
        daily_new_users,
        rolling_active_users,
    )

    got = (
        rolling_active_users("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    con = duckdb.connect()
    du = con.execute(
        "SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).df()
    days = sorted(du["day"].unique())
    for d in days:
        dau = du[du["day"] == d]["user_id"].nunique()
        wau = du[(du["day"] >= d - 6) & (du["day"] <= d)]["user_id"].nunique()
        assert got.loc[d, "dau"] == dau
        assert got.loc[d, "wau"] == wau
        assert got.loc[d, "stickiness_ppm"] == 1_000_000 * dau // wau
    assert set(got.index) == set(days)

    new = (
        daily_new_users("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    first = du.groupby("user_id")["day"].min()
    for d in days:
        assert new.loc[d, "n_active"] == du[du["day"] == d]["user_id"].nunique()
        assert new.loc[d, "n_new"] == int((first == d).sum())
    # conservation: total new users == distinct users
    assert new["n_new"].sum() == du["user_id"].nunique()


def test_rfm_segments_brute_force():
    import duckdb
    import numpy as np

    from agentic_doc_ray.functions.analytics import rfm_segments

    got = (
        rfm_segments("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("custkey")
        .sort_index()
    )
    con = duckdb.connect()
    p = con.execute(
        "SELECT o_custkey AS custkey, max(epoch_us(o_orderdate)) AS last_us, "
        "count(*) AS freq, sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents "
        "FROM read_parquet('/root/testdata/sf0.001/orders.parquet') GROUP BY 1"
    ).df()
    mx = p["last_us"].max()
    p["rec"] = (mx - p["last_us"]) // 86_400_000_000
    p["dollars"] = p["cents"] // 100

    def terciles(v):
        s = np.sort(v.to_numpy())
        n = len(s)
        return s[(n - 1) // 3], s[2 * (n - 1) // 3]

    tr, tf, td = terciles(p["rec"]), terciles(p["freq"]), terciles(p["dollars"])

    def binv(v, t):
        return 0 if v <= t[0] else (1 if v <= t[1] else 2)

    for row in p.itertuples():
        g = got.loc[row.custkey]
        assert g["recency_days"] == row.rec
        assert g["frequency"] == row.freq
        assert g["monetary_cents"] == row.cents
        assert g["r_bin"] == binv(row.rec, tr)
        assert g["f_bin"] == binv(row.freq, tf)
        assert g["m_bin"] == binv(row.dollars, td)


def test_length_outliers_brute_force():
    import duckdb

    from agentic_doc_ray.functions.analytics import length_outliers_by_source

    got = (
        length_outliers_by_source("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("doc_id")
    )
    con = duckdb.connect()
    df = con.execute(
        "SELECT doc_id, source, n_chars FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).df()
    for src, sub in df.groupby("source"):
        xs = [int(v) for v in sub["n_chars"]]
        n, S = len(xs), sum(xs)
        Q = sum(v * v for v in xs)
        rhs = 9 * (n * Q - S * S)
        for did, v in zip(sub["doc_id"], xs):
            want = 1 if (v * n - S) ** 2 > rhs else 0
            assert got.loc[did, "is_outlier"] == want, (src, did)


def test_order_total_audit_conservation():
    import duckdb

    from agentic_doc_ray.functions.analytics import order_total_audit

    got = order_total_audit("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    n_orders = con.execute(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).fetchone()[0]
    total_line = con.execute(
        "SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) "
        "FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    ).fetchone()[0]
    assert len(got) == n_orders
    assert got["line_cents"].sum() == total_line
    assert (got["diff_cents"] == got["total_cents"] - got["line_cents"]).all()


def test_order_gap_quantiles_brute_force():
    import duckdb
    import numpy as np

    from agentic_doc_ray.functions.analytics import order_gap_quantiles

    got = order_gap_quantiles("/root/testdata/sf0.001").to_pandas().iloc[0]
    con = duckdb.connect()
    df = con.execute(
        "SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day "
        "FROM read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).df()
    gaps = []
    for _, sub in df.groupby("o_custkey"):
        days = np.sort(sub["day"].to_numpy())
        gaps.extend(np.diff(days).tolist())
    gaps = np.sort(np.array(gaps, dtype=np.int64))
    n = len(gaps)
    assert got["n_gaps"] == n
    assert got["p50_days"] == gaps[(n - 1) // 2]
    assert got["p90_days"] == gaps[(n - 1) * 9 // 10]
    assert got["p99_days"] == gaps[(n - 1) * 99 // 100]
