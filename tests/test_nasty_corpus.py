"""One frozen adversarial corpus through the FULL Ray pipeline vs oracle:
every edge the fuzzers found, in one distributed run (the local property
tests exercise the same semantics without Ray)."""

import pyarrow as pa
import ray.data

from agentic_doc_ray.config import EngineConfig
from agentic_doc_ray.oracle import parse_corpus_oracle
from agentic_doc_ray.pipelines import extract_corpus
from agentic_doc_ray.schema import CORPUS_SCHEMA
from agentic_doc_ray.textparse import CORRUPT_MARKER


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


NASTY = [
    ("empty-doc", []),
    ("blank-pages", [_span("text", "", "", 0), _span("text", "\x0b", "", 1), _span("text", "  \n ", "", 2)]),
    ("gap-offsets", [_span("text", "late words", "", 12), _span("text", "early words", "", 7)]),
    ("all-corrupt", [_span("pdf_page", CORRUPT_MARKER + "x", "", i) for i in range(4)]),
    ("mixed-corrupt", [_span("pdf_page", "good page body", "", 0), _span("pdf_page", CORRUPT_MARKER, "", 1), _span("pdf_page", "more body", "", 2)]),
    ("sixtyone-caps", [_span("text", "A" + "B" * 60, "", 0)]),
    ("sixty-caps", [_span("text", "A" + "B" * 59, "", 0)]),
    ("lone-pipe", [_span("text", "| a |", "", 0)]),
    ("lone-digit", [_span("text", "7", "", 0)]),
    ("unicode", [_span("text", "h\u00e9llo w\u00f6rld \u2028 line", "", 0)]),
    ("figure-no-ref", [_span("text", "![cap]()", "", 0)]),
    ("html-short", [_span("html", "<p>tiny</p>", "", 0)]),
    ("html-unclosed", [_span("html", "<nav><a>x</a><p>long enough main paragraph text", "", 0)]),
    ("image-empty-caption", [_span("image", "", "m://x", 0)]),
    ("many-parts", [_span("pdf_page", f"page {i} body words here", "", i) for i in range(23)]),
]


def test_nasty_corpus_ray_vs_oracle():
    t = pa.Table.from_pydict(
        {"doc_id": [n for n, _ in NASTY], "spans": [s for _, s in NASTY]},
        schema=CORPUS_SCHEMA,
    )
    cfg = EngineConfig(split_size=4, parse_concurrency=(1, 2))
    ds = ray.data.from_arrow(t).random_shuffle(seed=1).repartition(5)
    got = sorted(extract_corpus(ds, cfg).take_all(), key=lambda r: r["doc_id"])
    want = parse_corpus_oracle(t, cfg).to_pylist()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in w["spans"]
        ], g["doc_id"]
        assert g["markdown"] == w["markdown"], g["doc_id"]
        assert [dict(e) for e in g["errors"]] == w["errors"], g["doc_id"]


def test_nasty_corpus_downstream_doc_local_ops():
    """The doc-local downstream operators (caption harvesting, interleave
    metrics) over the same adversarial corpus through full Ray: no
    crashes, and their invariants hold on every edge case."""
    from agentic_doc_ray.functions.captions import harvest_captions
    from agentic_doc_ray.functions.interleave import interleave_stats

    t = pa.Table.from_pydict(
        {"doc_id": [n for n, _ in NASTY], "spans": [s for _, s in NASTY]},
        schema=CORPUS_SCHEMA,
    )
    cfg = EngineConfig(split_size=4, parse_concurrency=(1, 2))
    ds = ray.data.from_arrow(t).random_shuffle(seed=1).repartition(5)

    parsed = extract_corpus(ds, cfg)
    caps = harvest_captions(parsed).take_all()
    want_spans = {
        r["doc_id"]: r["spans"] for r in parse_corpus_oracle(t, cfg).to_pylist()
    }
    media_refs = {
        (d, s["media_ref"])
        for d, spans in want_spans.items()
        for s in spans
        if s["media_ref"]
    }
    # exactly one caption row per media span; captions come from the doc
    assert {(r["doc_id"], r["media_ref"]) for r in caps} == media_refs
    assert len(caps) == len(media_refs)
    doc_texts = {
        d: {s["text"] for s in spans if s["kind"] == "text"}
        for d, spans in want_spans.items()
    }
    for r in caps:
        for side in ("caption_before", "caption_after"):
            assert r[side] == "" or r[side] in doc_texts[r["doc_id"]]

    stats = {r["doc_id"]: r for r in interleave_stats(ds).take_all()}
    assert set(stats) == {n for n, _ in NASTY}
    assert stats["empty-doc"]["n_spans"] == 0
    assert stats["empty-doc"]["max_text_run"] == 0
    assert stats["image-empty-caption"]["n_media"] == 1
    assert stats["image-empty-caption"]["media_per_mille"] == 1000
    # offset gaps don't break the run rule (both spans are non-media)
    assert stats["gap-offsets"]["max_text_run"] == 2


def test_nasty_corpus_table_cells_and_outline():
    """The adversarial corpus through the downstream structured
    extractors: table_cells and doc_outline must process whatever the
    parser emits (corrupt pages become error chunks, '| a |' classifies
    however the heuristics decide) without crashing, and must equal the
    same batch fns applied to the pure-Python oracle's flat spans."""
    import pandas as pd

    from agentic_doc_ray.functions.tables import (
        doc_outline_batch,
        table_cells_batch,
    )
    from agentic_doc_ray.oracle import explode_parsed
    from agentic_doc_ray.pipelines import extract_flat_spans

    t = pa.Table.from_pydict(
        {"doc_id": [n for n, _ in NASTY], "spans": [s for _, s in NASTY]},
        schema=CORPUS_SCHEMA,
    )
    cfg = EngineConfig(split_size=4, parse_concurrency=(1, 2))
    ds = ray.data.from_arrow(t).random_shuffle(seed=1).repartition(5)
    flat = extract_flat_spans(ds, cfg)

    from agentic_doc_ray.functions.tables import doc_outline, table_cells

    got_cells = (
        table_cells(flat)
        .to_pandas()
        .sort_values(["doc_id", "offset", "row_idx", "col_idx"])
        .reset_index(drop=True)
    )
    oracle_flat = explode_parsed(parse_corpus_oracle(t, cfg))
    want_cells = (
        table_cells_batch(oracle_flat)
        .to_pandas()
        .sort_values(["doc_id", "offset", "row_idx", "col_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_cells, want_cells)

    from agentic_doc_ray.pipelines import extract_corpus as _ec

    got_outline = (
        doc_outline(_ec(ds, cfg))
        .to_pandas()
        .sort_values(["doc_id", "title_idx"])
        .reset_index(drop=True)
    )
    want_outline = (
        doc_outline_batch(oracle_flat)
        .to_pandas()
        .sort_values(["doc_id", "title_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_outline, want_outline)
