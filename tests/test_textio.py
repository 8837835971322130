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


def test_partitioned_parquet_prunes_and_roundtrips():
    import os

    from agentic_doc_ray.sources.textio import partitioned_parquet_roundtrip

    got = (
        partitioned_parquet_roundtrip(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT doc_id, lang, source, CAST(length(text) AS BIGINT) AS n_chars "
        f"FROM read_parquet('{SF}/documents.parquet') "
        "WHERE lang IN ('en', 'de') ORDER BY doc_id"
    ).df()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # the sink really is hive-partitioned: one directory per lang
    out = "/tmp/agentic_textio/sf0.001/part_parquet"
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert len(dirs) >= 3  # all langs written, only two read back
