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


# --- hypothesis: fuzz against brute-force per-doc references ------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=400
)


def _brute_chunks(text: str, window: int, divisor: int, max_len: int):
    """Naive per-doc reference: O(n * window) python rolling hash, no
    prefix-sum tricks — independent of the vectorized implementation."""
    from agentic_doc_ray.functions.substr import _canonical_gram_hash

    n = len(text)
    if n == 0:
        return []
    cuts = [0]
    for i in range(0, n - window + 1):
        b = i + window
        if b < n and _canonical_gram_hash(text[i : i + window]) % divisor == 0:
            cuts.append(b)
    cuts.append(n)
    out = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        while b - a > max_len:
            out.append((a, a + max_len))
            a += max_len
        out.append((a, b))
    # adjacent content cuts can coincide only via the duplicate-boundary
    # guard above; drop zero-length artifacts from duplicated cut points
    return [(s, e) for s, e in out if e > s]


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(_ascii_text, min_size=1, max_size=5),
    window=st.integers(4, 12),
    max_len=st.integers(8, 64),
)
def test_cdc_chunks_match_bruteforce(texts, window, max_len):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = cdc_chunk_batch(t, window=window, divisor=16, max_len=max_len)
    by_doc = {}
    for r in got.to_pylist():
        by_doc.setdefault(r["doc_id"], []).append((r["start"], r["start"] + r["length"]))
    for i, txt in enumerate(texts):
        want = _brute_chunks(txt, window, 16, max_len)
        assert by_doc.get(i, []) == want, (i, txt)


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(_ascii_text, min_size=1, max_size=4),
    query=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=6,
    ),
)
def test_substring_counts_match_bruteforce(texts, query):
    """Overlapping-occurrence semantics == a manual position scan."""
    import ray.data

    from agentic_doc_ray.functions.substr import substring_counts

    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    got = {r["query"]: r for r in substring_counts(ds, [query]).take_all()}
    want_n = sum(
        sum(1 for i in range(len(t) - len(query) + 1) if t[i : i + len(query)] == query)
        for t in texts
    )
    want_docs = sum(
        1
        for t in texts
        if any(t[i : i + len(query)] == query for i in range(len(t) - len(query) + 1))
    )
    if want_n == 0:
        assert query not in got
    else:
        assert got[query]["n_occurrences"] == want_n
        assert got[query]["n_docs"] == want_docs
