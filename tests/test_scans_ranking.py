"""Ordered scans, ranking, anti-join and Bloom semi-join vs DuckDB oracles.

Also pins the non-SQL invariants the oracles can't see: the heavy-hitter
candidate superset guarantee under aggressive truncation, and the Bloom
filter's no-false-negative property.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from agentic_doc_ray.functions import analytics as A
from agentic_doc_ray.functions import joins as J
from agentic_doc_ray.functions import ranking as R
from agentic_doc_ray.functions import scans as S

SF = "/root/testdata/sf0.001"


def _duck(sql):
    for t in ["lineitem", "orders", "customer", "events", "documents"]:
        sql = sql.replace(f" {t}", f" read_parquet('{SF}/{t}.parquet')")
    return duckdb.sql(sql).df()


def _cmp(got, want, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(sort_cols).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_late_events_prefix_scan():
    got = S.late_events(SF).to_pandas()
    want = _duck(
        """
        WITH a AS (
          SELECT event_id, ts,
            ts + to_seconds(CAST((event_id * 2654435761) % 600 AS BIGINT)) AS arrival_ts
          FROM events
        ), w AS (
          SELECT event_id, ts,
            max(ts) OVER (ORDER BY arrival_ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS watermark_ts
          FROM a
        )
        SELECT event_id, ts, watermark_ts,
          COALESCE(watermark_ts - ts > INTERVAL 5 MINUTE, false) AS is_late FROM w
        """
    )
    assert bool(got["is_late"].any())  # jitter must actually produce lateness
    _cmp(got, want, ["event_id"])


def test_user_cumulative_spend():
    got = S.user_cumulative_spend(SF).to_pandas()
    want = _duck(
        """
        SELECT event_id, user_id, ts,
          CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS n_purchases,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100.0 AS cum_spend
        FROM events WHERE event_type = 'purchase'
        """
    )
    _cmp(got, want, ["event_id"])


def test_on_time_hourly_watermark_window():
    got = S.on_time_hourly(SF).to_pandas()
    want = _duck(
        """
        WITH a AS (
          SELECT event_id, ts, event_type, value,
            ts + to_seconds(CAST((event_id * 2654435761) % 600 AS BIGINT)) AS arrival_ts
          FROM events
        ), w AS (
          SELECT *, max(ts) OVER (ORDER BY arrival_ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM a
        )
        SELECT date_trunc('hour', ts) AS window_start, event_type,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value,
          count(*) AS n_events FROM w
        WHERE wm IS NULL OR wm - ts <= INTERVAL 5 MINUTE GROUP BY 1, 2
        """
    )
    # it must actually drop something vs the unfiltered hourly aggregate
    n_all = int(_duck("SELECT count(*) AS n FROM events")["n"][0])
    assert int(got["n_events"].sum()) < n_all
    _cmp(got, want, ["window_start", "event_type"])


def test_global_rank_no_global_sort():
    got = S.global_rank(SF).to_pandas()
    want = _duck(
        "SELECT doc_id, n_chars, CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS global_rank"
        " FROM documents"
    )
    # dense, total, no duplicates
    assert sorted(got["global_rank"]) == list(range(1, len(got) + 1))
    _cmp(got, want, ["doc_id"])


def test_filter_above_group_median():
    from agentic_doc_ray.functions.sketches import filter_above_group_median

    got = filter_above_group_median(SF).to_pandas()
    want = _duck(
        """
        WITH m AS (SELECT lang, quantile_disc(n_chars, 0.5) AS med
                   FROM documents GROUP BY lang)
        SELECT d.doc_id, d.lang, d.n_chars FROM documents d
        JOIN m ON d.lang = m.lang WHERE d.n_chars >= m.med
        """
    )
    _cmp(got, want, ["doc_id"])


def test_top_orders_per_segment():
    got = R.top_orders_per_segment(SF).to_pandas()
    want = _duck(
        """
        SELECT c_mktsegment, CAST(rank AS BIGINT) AS rank, o_orderkey, o_totalprice
        FROM (
          SELECT c.c_mktsegment,
            row_number() OVER (PARTITION BY c.c_mktsegment
              ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rank,
            o.o_orderkey, o.o_totalprice
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ) WHERE rank <= 3
        """
    )
    _cmp(got, want, ["c_mktsegment", "rank"])


def test_heavy_hitter_tokens_exact():
    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    got = R.heavy_hitter_tokens(docs, per_mille=2).to_pandas()
    want = _duck(
        """
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
          FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        )
        SELECT token, count(*) AS n FROM toks GROUP BY token
        HAVING count(*) * 1000 >= 2 * (SELECT count(*) FROM toks)
        """
    )
    _cmp(got, want, ["token"])


def test_heavy_hitter_truncation_still_exact():
    # capacity barely above the exactness bound forces real Misra-Gries
    # truncation in every batch; the answer must not change.
    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    loose = R.heavy_hitter_tokens(docs, per_mille=2, capacity=4000).to_pandas()
    tight = R.heavy_hitter_tokens(docs, per_mille=2, capacity=501).to_pandas()
    _cmp(tight, loose, ["token"])


def test_customers_without_urgent_anti_join():
    got = J.customers_without_urgent(SF).to_pandas()
    want = _duck(
        """
        SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT')
        """
    )
    assert len(want) > 0
    _cmp(got, want, ["c_custkey"])


def test_bloom_no_false_negatives():
    keys = pa.array(np.arange(0, 50000, 7, dtype=np.int64))
    bits = np.zeros(J._BLOOM_BITS // 8, dtype=np.uint8)
    for pos in J._bloom_positions(keys):
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    hit = np.ones(len(keys), dtype=bool)
    for pos in J._bloom_positions(keys):
        hit &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    assert hit.all()
    # false-positive rate on disjoint probes stays small at this load
    probes = pa.array(np.arange(1, 50000, 7, dtype=np.int64))
    fp = np.ones(len(probes), dtype=bool)
    for pos in J._bloom_positions(probes):
        fp &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    assert fp.mean() < 0.01


def test_urgent_revenue_bloom():
    got = J.urgent_revenue_bloom(SF).to_pandas()
    want = _duck(
        """
        SELECT l_returnflag,
          CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
          count(*) AS n_items FROM lineitem WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag
        """
    )
    _cmp(got, want, ["l_returnflag"])


def test_purchase_sessions_interval_join():
    got = A.purchase_sessions(SF).to_pandas()
    want = _duck(
        """
        WITH marked AS (
          SELECT user_id, ts,
            CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess FROM events
        ), numbered AS (
          SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sess FROM marked
        ), sessions AS (
          SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
          FROM numbered GROUP BY user_id, sess
        )
        SELECT e.event_id, e.user_id, e.ts, s.session_start, s.session_end
        FROM events e JOIN sessions s ON e.user_id = s.user_id
        AND e.ts BETWEEN s.session_start AND s.session_end
        WHERE e.event_type = 'purchase'
        """
    )
    # every purchase falls in exactly one of its user's sessions
    assert len(got) == len(_duck("SELECT 1 FROM events WHERE event_type = 'purchase'"))
    _cmp(got, want, ["event_id"])


def test_shuffle_positions_deterministic_permutation():
    got = S.shuffle_positions(SF, seed=42).to_pandas()
    want = _duck(
        """
        WITH h AS (
          SELECT doc_id,
            ((CAST(doc_id AS HUGEINT) + 42) * 11400714819323198485)
            % 18446744073709551616 AS hk
          FROM documents
        )
        SELECT doc_id,
          CAST(row_number() OVER (ORDER BY hk, doc_id) - 1 AS BIGINT)
          AS shuffle_pos FROM h
        """
    )
    # a permutation: every position 0..n-1 exactly once
    assert sorted(got["shuffle_pos"]) == list(range(len(got)))
    _cmp(got, want, ["doc_id"])
    # reruns reproduce the order; a different seed permutes differently
    again = S.shuffle_positions(SF, seed=42).to_pandas()
    _cmp(got, again, ["doc_id"])
    other = S.shuffle_positions(SF, seed=7).to_pandas()
    merged = got.merge(other, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["shuffle_pos_a"] != merged["shuffle_pos_b"]).any()


def test_heavy_hitter_ngrams_exact():
    """wimbd-style most-common trigrams == the SQL window plan; windows
    never cross doc boundaries (lead() is doc-partitioned on both
    sides), and a tight MG capacity must not change the exact answer."""
    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    got = R.heavy_hitter_ngrams(docs, n=3, per_million=200).to_pandas()
    want = _duck(
        """
        WITH toks AS (
          SELECT doc_id, w, i FROM (
            SELECT doc_id,
              unnest(regexp_split_to_array(regexp_replace(text,'^\\s+|\\s+$','','g'), '\\s+')) AS w,
              unnest(generate_series(1, len(regexp_split_to_array(regexp_replace(text,'^\\s+|\\s+$','','g'), '\\s+')))) AS i
            FROM documents WHERE regexp_replace(text,'^\\s+|\\s+$','','g') <> ''
          )
        ), g AS (
          SELECT w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS ngram,
                 (lead(w,2) OVER win IS NOT NULL) AS fullwin
          FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        ), wins AS (SELECT ngram FROM g WHERE fullwin)
        SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM wins GROUP BY ngram
        HAVING count(*) * 1000000 >= 200 * (SELECT count(*) FROM wins)
        """
    )
    assert len(got) > 0
    _cmp(got, want, ["ngram"])
    tight = R.heavy_hitter_ngrams(
        docs, n=3, per_million=200, capacity=5001
    ).to_pandas()
    _cmp(tight, got, ["ngram"])


def test_word_ngram_units_doc_boundaries():
    """n-gram windows stop at document edges; short docs emit none."""
    import pyarrow as pa

    from agentic_doc_ray.functions.ranking import _word_ngram_units

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c d", "x y", "", "  p  q r  "],
        }
    )
    grams = _word_ngram_units(t, 3).to_pylist()
    assert grams == ["a b c", "b c d", "p q r"]


def test_zorder_layout_oracle_and_file_sizes():
    """Morton layout vs a numpy recount, plus the layout invariants: file
    ids are a dense prefix partition of the (zkey, key) order with at
    most rows_per_file rows each."""
    got = S.zorder_layout(SF, rows_per_file=100).to_pandas()
    o = _duck("SELECT o_orderkey, o_custkey, o_orderdate FROM orders")
    days = (
        (o["o_orderdate"] - pd.Timestamp("1970-01-01")).dt.days.to_numpy()
    ).astype(np.int64)
    cust = o["o_custkey"].to_numpy()
    z = np.zeros(len(o), dtype=np.int64)
    for i in range(8):
        z |= ((cust >> i) & 1) << (2 * i)
        z |= ((days >> i) & 1) << (2 * i + 1)
    want = pd.DataFrame({"o_orderkey": o["o_orderkey"], "zkey": z})
    want = want.sort_values(["zkey", "o_orderkey"]).reset_index(drop=True)
    want["file_id"] = np.arange(len(want), dtype=np.int64) // 100
    _cmp(got, want, ["o_orderkey"])
    sizes = got.groupby("file_id").size()
    assert (sizes <= 100).all()
    assert sorted(sizes.index) == list(range(len(sizes)))


def test_revenue_gini_exact():
    got = S.revenue_gini(SF).to_pandas()
    want = _duck(
        """
        WITH cr AS (SELECT o_custkey,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        r AS (SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS i FROM cr),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(cents) AS BIGINT) AS sum_cents,
          CAST(sum(i*cents) AS BIGINT) AS wsum FROM r)
        SELECT n, sum_cents, wsum AS weighted_rank_sum,
          CAST(2*wsum - (n+1)*sum_cents AS BIGINT) AS gini_num,
          CAST(n*sum_cents AS BIGINT) AS gini_den,
          CAST((1000*(2*wsum - (n+1)*sum_cents)) // (n*sum_cents) AS BIGINT) AS gini_per_mille
        FROM s
        """
    )
    _cmp(got, want, ["n"])
    r = got.iloc[0]
    assert 0 <= r["gini_per_mille"] < 1000
    # identity: gini_num/den reconstruct from the raw moments
    assert r["gini_num"] == 2 * r["weighted_rank_sum"] - (r["n"] + 1) * r["sum_cents"]


def test_segment_percent_rank_matches_sql():
    import duckdb
    import pandas as pd

    from agentic_doc_ray.functions.scans import segment_percent_rank

    SF = "/root/testdata/sf0.001"
    got = (
        segment_percent_rank(SF)
        .to_pandas()
        .sort_values(["c_mktsegment", "cents", "o_orderkey"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""
        WITH j AS (SELECT o_orderkey, c_mktsegment,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM read_parquet('{SF}/orders.parquet') o
          JOIN read_parquet('{SF}/customer.parquet') c ON o_custkey = c_custkey)
        SELECT o_orderkey, c_mktsegment, cents,
          CAST(1000000 * (rank() OVER (PARTITION BY c_mktsegment ORDER BY cents) - 1)
          // greatest(count(*) OVER (PARTITION BY c_mktsegment) - 1, 1) AS BIGINT) AS pr_ppm
        FROM j ORDER BY c_mktsegment, cents, o_orderkey
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
