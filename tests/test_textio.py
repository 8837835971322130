"""JSONL / CSV sink+source roundtrips are lossless vs the parquet original."""

import duckdb
import pandas as pd

from agentic_doc_ray.sources.textio import (
    csv_roundtrip_stats,
    jsonl_roundtrip_stats,
)

SF = "/root/testdata/sf0.001"
_SQL = (
    "SELECT doc_id, lang, source, CAST(length(text) AS BIGINT) AS n_chars "
    f"FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
)


def _check(fn):
    got = fn(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(_SQL).df()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_jsonl_roundtrip_lossless():
    _check(jsonl_roundtrip_stats)


def test_csv_roundtrip_lossless():
    _check(csv_roundtrip_stats)
