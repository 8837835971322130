"""Content-defined chunking: tiling, shift invariance, hash consistency,
batching independence, and the distributed dedup-stats == SQL oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from agentic_doc_ray.functions.cdc import (
    cdc_chunk_batch,
    cdc_chunks,
    cdc_dedup_stats,
)

SF = "/root/testdata/sf0.001"

_T = pa.table(
    {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "the quick brown fox jumps over the lazy dog " * 20,
            "",
            "short",
            "abc " * 200,
        ],
    }
)


def test_chunks_tile_documents_exactly():
    df = cdc_chunk_batch(_T, window=8, divisor=32, max_len=100).to_pandas()
    assert set(df.doc_id) == {1, 3, 4}  # empty doc emits nothing
    for d in (1, 3, 4):
        txt = _T.column("text")[_T.column("doc_id").to_pylist().index(d)].as_py()
        sub = df[df.doc_id == d].sort_values("chunk_idx")
        assert list(sub.chunk_idx) == list(range(len(sub)))
        assert sub.start.iloc[0] == 0
        assert (
            sub.start.values[1:]
            == sub.start.values[:-1] + sub.length.values[:-1]
        ).all()
        assert sub.start.iloc[-1] + sub.length.iloc[-1] == len(txt)
        assert sub.length.max() <= 100
        assert sub.length.min() >= 1


def test_equal_content_equal_hash_and_no_collisions():
    df = cdc_chunk_batch(_T, window=8, divisor=32, max_len=100).to_pandas()
    texts = dict(zip(_T.column("doc_id").to_pylist(), _T.column("text").to_pylist()))
    content_by_hash = {}
    for _, r in df.iterrows():
        c = texts[r.doc_id][r.start : r.start + r.length]
        assert content_by_hash.setdefault(r.chunk_hash, c) == c
    # the periodic doc must actually dedup to a handful of distinct hashes
    h4 = df[df.doc_id == 4]
    assert h4.chunk_hash.nunique() < len(h4) / 10


def test_shift_invariance():
    """Prefix insertion realigns every content cut past the first window
    (the CDC property fixed-size chunking lacks). max_len disabled so
    only content cuts participate."""
    a = "the quick brown fox jumps over the lazy dog " * 20
    b = "PREFIX-INSERTED-" + a
    ta = cdc_chunk_batch(
        pa.table({"doc_id": [1], "text": [a]}), window=8, divisor=32, max_len=10**6
    ).to_pandas()
    tb = cdc_chunk_batch(
        pa.table({"doc_id": [1], "text": [b]}), window=8, divisor=32, max_len=10**6
    ).to_pandas()
    cuts_a = set(ta.start.values) - {0}
    cuts_b = set(tb.start.values) - {0}
    shifted = {c + len("PREFIX-INSERTED-") for c in cuts_a if c >= 8}
    assert shifted and shifted <= cuts_b


def test_batching_independence():
    whole = cdc_chunk_batch(_T, window=8, divisor=32, max_len=100).to_pandas()
    parts = pd.concat(
        [
            cdc_chunk_batch(_T.slice(0, 2), window=8, divisor=32, max_len=100)
            .to_pandas(),
            cdc_chunk_batch(_T.slice(2, 2), window=8, divisor=32, max_len=100)
            .to_pandas(),
        ]
    ).reset_index(drop=True)
    assert parts.equals(whole)


def test_ascii_enforced():
    with pytest.raises(ValueError):
        cdc_chunk_batch(pa.table({"doc_id": [1], "text": ["héllo wörld" * 10]}))


def test_distributed_stats_match_sql(tmp_path):
    import ray.data

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(6)
    got = cdc_dedup_stats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)

    rep = cdc_chunk_batch(
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    )
    p = str(tmp_path / "chunks.parquet")
    pq.write_table(rep, p)
    want = duckdb.sql(
        f"""
        WITH c AS (SELECT * FROM read_parquet('{p}')),
        d AS (SELECT chunk_hash, count(*) AS cnt FROM c GROUP BY 1)
        SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(CASE WHEN d.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         CAST(sum(CASE WHEN d.cnt >= 2 THEN c.length ELSE 0 END) AS BIGINT) AS dup_bytes,
         CAST(sum(c.length) AS BIGINT) AS n_bytes
        FROM c JOIN d USING (chunk_hash) GROUP BY c.doc_id ORDER BY c.doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.n_dup_chunks.sum() > 0  # the synthetic corpus shares content

    # distributed chunks == replica, row for row
    gc = (
        cdc_chunks(ds)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    rc = rep.to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(gc, rc)


def test_transfer_stats_match_sql(tmp_path):
    """Cross-snapshot transfer: per new-doc reused chunks/bytes == the
    SQL left-join over the two single-process chunk replicas; edited
    docs must still reuse most bytes (the shift-invariance payoff)."""
    import ray.data

    from agentic_doc_ray.functions.cdc import cdc_transfer_stats
    from agentic_doc_ray.functions.delta import (
        second_crawl_batch,
        synth_second_crawl,
    )

    d = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = (
        cdc_transfer_stats(d, synth_second_crawl(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    p1, p2 = str(tmp_path / "v1.parquet"), str(tmp_path / "v2.parquet")
    pq.write_table(cdc_chunk_batch(tbl), p1)
    pq.write_table(cdc_chunk_batch(second_crawl_batch(tbl)), p2)
    want = duckdb.sql(
        f"""
        WITH c2 AS (SELECT * FROM read_parquet('{p2}')),
        old AS (SELECT DISTINCT chunk_hash FROM read_parquet('{p1}'))
        SELECT c2.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(c2.length) AS BIGINT) AS n_bytes,
         CAST(sum(CASE WHEN o.chunk_hash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reused_chunks,
         CAST(sum(CASE WHEN o.chunk_hash IS NOT NULL THEN c2.length ELSE 0 END) AS BIGINT) AS reused_bytes
        FROM c2 LEFT JOIN old o USING (chunk_hash) GROUP BY c2.doc_id ORDER BY c2.doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # edited docs (doc_id % 5 == 0, suffix appended) keep most content
    edited = got[(got.doc_id % 5 == 0) & (got.doc_id < 10_000_000)]
    assert len(edited) > 0
    assert edited.reused_bytes.sum() > 0.5 * edited.n_bytes.sum()
