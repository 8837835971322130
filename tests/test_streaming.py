"""Online (actor-state) dedup ingestion: planted duplicates, arrival
order, backpressure window, and the SQL first-occurrence oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from agentic_doc_ray.functions.streaming import streaming_dedup_keep

SF = "/root/testdata/sf0.001"


def test_planted_duplicates_first_occurrence():
    """Copies planted at higher doc_ids are rejected; the smallest
    doc_id per content wins regardless of block layout or shard
    count."""
    rows = []
    for i in range(120):
        rows.append({"doc_id": i, "text": f"document body {i % 40}"})  # 3 copies each
    t = pa.Table.from_pylist(rows)
    for shards, window in [(2, 2), (8, 16)]:
        ds = ray.data.from_arrow(t).repartition(7)
        got = sorted(
            r["doc_id"]
            for r in streaming_dedup_keep(ds, n_shards=shards, window=window).take_all()
        )
        assert got == list(range(40))  # exactly the first copies


def test_matches_sql_oracle_on_corpus():
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(9)
    got = (
        streaming_dedup_keep(ds, n_shards=4, window=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT doc_id, text FROM (
          SELECT doc_id, text,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM read_parquet('{SF}/documents.parquet')
        ) WHERE rn = 1 ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_shard_state_is_partitioned():
    """Every shard holds a disjoint slice of the digest set; sizes sum
    to the distinct-content count."""
    import ray

    from agentic_doc_ray.functions.streaming import _DedupShard, _block_digests

    t = pa.Table.from_pylist(
        [{"doc_id": i, "text": f"body {i % 10}"} for i in range(30)]
    )
    shards = [_DedupShard.remote(k, 4) for k in range(4)]
    d = _block_digests.remote(t)
    res = ray.get([s.admit.remote(d) for s in shards])
    positions = sorted(i for pos, _ in res for i in pos)
    assert positions == list(range(30))  # disjoint cover
    sizes = ray.get([s.size.remote() for s in shards])
    assert sum(sizes) == 10
