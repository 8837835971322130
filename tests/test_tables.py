"""Structured table extraction: cell grammar, ragged rows, truncation
tolerance, and the distributed run == SQL over the flat-span replica."""

import pyarrow as pa

from agentic_doc_ray.functions.tables import table_cells_batch


def _cells(text, kind="table"):
    t = pa.table(
        {
            "doc_id": ["d1"],
            "offset": pa.array([0], pa.int32()),
            "kind": [kind],
            "text": [text],
            "media_ref": [""],
            "chunk_id": ["c"],
            "page": pa.array([0], pa.int32()),
        }
    )
    return table_cells_batch(t).to_pylist()


def test_basic_grid():
    out = _cells("| a | b |\n| c | d |")
    assert [(r["row_idx"], r["col_idx"], r["cell"]) for r in out] == [
        (0, 0, "a"), (0, 1, "b"), (1, 0, "c"), (1, 1, "d"),
    ]


def test_ragged_and_truncated_rows():
    # page-boundary truncation drops the closing bar; ragged widths stay
    out = _cells("| a | b | c |\n| d | e")
    assert [(r["row_idx"], r["col_idx"], r["cell"]) for r in out] == [
        (0, 0, "a"), (0, 1, "b"), (0, 2, "c"), (1, 0, "d"), (1, 1, "e"),
    ]


def test_non_table_spans_dropped():
    assert _cells("| a | b |", kind="text") == []


def test_pipeline_matches_sql(tmp_path):
    """Full flagship extraction -> table_cells == the DuckDB unnest plan
    over the pure-Python flat-span oracle."""
    import duckdb
    import pandas as pd

    from __ray_entry__ import _corpus_ds, _ensure_extraction_oracles
    from agentic_doc_ray.functions.tables import table_cells
    from agentic_doc_ray.pipelines import extract_flat_spans

    sf = "/root/testdata/sf0.001"
    out_dir = _ensure_extraction_oracles(sf)
    got = (
        table_cells(extract_flat_spans(_corpus_ds(sf)))
        .to_pandas()
        .sort_values(["doc_id", "offset", "row_idx", "col_idx"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH t AS (SELECT doc_id, "offset", text
                   FROM read_parquet('{out_dir}/flat_spans.parquet') WHERE kind='table'),
        r AS (
          SELECT doc_id, "offset",
            unnest(string_split(text, chr(10))) AS line,
            unnest(generate_series(1, len(string_split(text, chr(10))))) AS rn
          FROM t
        ), c AS (
          SELECT doc_id, "offset", CAST(rn-1 AS BIGINT) AS row_idx,
            unnest(string_split(regexp_replace(line, '^\\| | \\|$', '', 'g'), ' | ')) AS cell,
            unnest(generate_series(1, len(string_split(regexp_replace(line, '^\\| | \\|$', '', 'g'), ' | ')))) AS cn
          FROM r
        )
        SELECT doc_id, "offset", row_idx, CAST(cn-1 AS BIGINT) AS col_idx, cell
        FROM c ORDER BY doc_id, "offset", row_idx, col_idx
        """
    ).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_doc_outline_batch_sections():
    """Preamble only when non-empty; titles own their sections; empty
    trailing sections (title with nothing after) still emitted."""
    from agentic_doc_ray.functions.tables import doc_outline_batch

    def span(doc, off, kind, text):
        return {
            "doc_id": doc, "offset": off, "kind": kind, "text": text,
            "media_ref": "", "chunk_id": "c", "page": 0,
        }

    rows = [
        span("d1", 0, "text", "pre"),          # preamble
        span("d1", 1, "title", "A"),
        span("d1", 2, "text", "x"),
        span("d1", 3, "table", "| a |"),
        span("d1", 4, "title", "B"),            # empty section
        span("d2", 0, "title", "only"),         # no preamble
    ]
    t = pa.Table.from_pylist(rows)
    out = sorted(
        (r["doc_id"], r["title_idx"], r["title_text"], r["n_spans"])
        for r in doc_outline_batch(t).to_pylist()
    )
    assert out == [
        ("d1", -1, None, 1),
        ("d1", 0, "A", 2),
        ("d1", 1, "B", 0),
        ("d2", 0, "only", 0),
    ]


def test_doc_outline_matches_sql_over_replica():
    """Ray-free: the batch fn over the whole pure-Python flat-span
    oracle equals the window-SQL plan."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from __ray_entry__ import _ensure_extraction_oracles
    from agentic_doc_ray.functions.tables import doc_outline_batch

    out_dir = _ensure_extraction_oracles("/root/testdata/sf0.001")
    tbl = pq.read_table(f"{out_dir}/flat_spans.parquet")
    got = (
        doc_outline_batch(tbl)
        .to_pandas()
        .sort_values(["doc_id", "title_idx"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH s AS (
          SELECT doc_id, "offset", kind, text,
            CAST(sum(CASE WHEN kind='title' THEN 1 ELSE 0 END) OVER (
              PARTITION BY doc_id ORDER BY "offset" ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS title_idx
          FROM read_parquet('{out_dir}/flat_spans.parquet')
        )
        SELECT doc_id, title_idx,
          max(CASE WHEN kind='title' THEN text END) AS title_text,
          CAST(sum(CASE WHEN kind <> 'title' THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
        FROM s GROUP BY doc_id, title_idx
        HAVING title_idx >= 0 OR sum(CASE WHEN kind <> 'title' THEN 1 ELSE 0 END) > 0
        ORDER BY doc_id, title_idx
        """
    ).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
