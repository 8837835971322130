"""End-to-end pipeline vs the pure-Python oracle (the north_rule invariant:
per-doc span-sequence equality (kind, text, media_ref, order)), plus the
reference suite's output invariants (FIXTURES.md §3)."""

import pyarrow as pa
import pytest
import ray.data

from agentic_doc_ray.config import EngineConfig
from agentic_doc_ray.oracle import parse_corpus_oracle
from agentic_doc_ray.pipelines.extract import extract_corpus, extract_flat_spans
from agentic_doc_ray.schema import CORPUS_SCHEMA, PARSED_DOC_SCHEMA

CFG = EngineConfig(parse_concurrency=(1, 2), explode_batch_size=16)


def _normalize(rows):
    out = []
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        r = dict(r)
        r["spans"] = [
            {**dict(s), "bbox": list(s["bbox"])} for s in (r["spans"] or [])
        ]
        r["errors"] = [dict(e) for e in (r["errors"] or [])]
        out.append(r)
    return out


@pytest.fixture(scope="module")
def parsed_vs_oracle(sf_smoke_corpus):
    # deliberately shuffle input across many small blocks: no stage may rely
    # on block order (SURVEY.md §7.4 "ordering without global order")
    ds = ray.data.from_arrow(sf_smoke_corpus).random_shuffle(seed=7).repartition(13)
    got = _normalize(extract_corpus(ds, CFG).take_all())
    want = _normalize(parse_corpus_oracle(sf_smoke_corpus, CFG).to_pylist())
    return got, want


def test_span_sequence_equality(parsed_vs_oracle):
    got, want = parsed_vs_oracle
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["doc_id"] == w["doc_id"]
        got_seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]]
        want_seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in w["spans"]]
        assert got_seq == want_seq, g["doc_id"]


def test_full_row_equality(parsed_vs_oracle):
    got, want = parsed_vs_oracle
    assert got == want


def test_output_invariants(parsed_vs_oracle):
    got, _ = parsed_vs_oracle
    saw_error_doc = False
    for r in got:
        spans = r["spans"]
        offs = [s["offset"] for s in spans]
        assert offs == list(range(len(spans)))                      # dense, increasing
        pages = [s["page"] for s in spans]
        assert pages == sorted(pages)                               # non-decreasing
        # page coverage is consecutive over GROUNDING pages: a multi-page
        # chunk's continuation pages appear only in its groundings list
        gpages = sorted({g["page"] for s in spans for g in s["groundings"]})
        assert gpages == list(range(len(gpages)))                   # consecutive from 0
        ids = [s["chunk_id"] for s in spans]
        assert len(set(ids)) == len(ids) and all(ids)               # unique, non-empty
        for s in spans:
            l, t, rr, b = s["bbox"]
            assert 0.0 <= l < rr <= 1.0 and 0.0 <= t < b <= 1.0
            assert s["groundings"], "every span grounds somewhere"
            g0 = s["groundings"][0]
            assert g0["page"] == s["page"]                          # scalar = first grounding
            assert [round(x, 6) for x in g0["bbox"]] == [
                round(x, 6) for x in s["bbox"]
            ]
            gp = [g["page"] for g in s["groundings"]]
            assert gp == list(range(gp[0], gp[0] + len(gp)))        # consecutive chain
        if r["errors"]:
            saw_error_doc = True
            err_pages = {e["page_num"] for e in r["errors"]}
            span_err_pages = {s["page"] for s in spans if s["kind"] == "error"}
            assert err_pages == span_err_pages
            assert all(e["error_code"] == -1 for e in r["errors"])
        else:
            assert r["markdown"]                                    # non-empty for clean docs
        assert r["doc_type"] in ("pdf", "image")
        if r["doc_type"] == "image":
            assert r["start_page_idx"] == r["end_page_idx"] == 0
    assert saw_error_doc  # the error family must be exercised


def test_zero_span_doc_yields_empty_parsed_doc():
    # reference: _merge_part_results([]) -> empty ParsedDocument (parse.py:599-611)
    t = pa.Table.from_pydict(
        {
            "doc_id": ["a", "b"],
            "spans": [
                [],
                [{"kind": "text", "text": "normal doc body words", "media_ref": "", "offset": 0}],
            ],
        },
        schema=CORPUS_SCHEMA,
    )
    out = _normalize(extract_corpus(ray.data.from_arrow(t), CFG).take_all())
    assert [r["doc_id"] for r in out] == ["a", "b"]
    empty = out[0]
    assert empty["spans"] == [] and empty["markdown"] == "" and empty["errors"] == []
    assert empty["doc_type"] == "pdf"
    assert empty["start_page_idx"] == 0 and empty["end_page_idx"] == 0


def test_empty_corpus():
    empty = pa.Table.from_pydict({"doc_id": [], "spans": []}, schema=CORPUS_SCHEMA)
    out = extract_corpus(ray.data.from_arrow(empty), CFG).take_all()
    assert out == []


def test_determinism_across_partitioning(sf_smoke_corpus):
    small = sf_smoke_corpus.slice(0, 20)
    a = _normalize(
        extract_corpus(ray.data.from_arrow(small).repartition(1), CFG).take_all()
    )
    b = _normalize(
        extract_corpus(ray.data.from_arrow(small).repartition(7), CFG).take_all()
    )
    assert a == b


def test_flat_spans_match_nested(sf_smoke_corpus):
    small = sf_smoke_corpus.slice(0, 20)
    nested = _normalize(
        extract_corpus(ray.data.from_arrow(small), CFG).take_all()
    )
    flat = extract_flat_spans(ray.data.from_arrow(small), CFG).take_all()
    flat = sorted(flat, key=lambda r: (r["doc_id"], r["offset"]))
    want = [
        (r["doc_id"], s["offset"], s["kind"], s["text"])
        for r in nested
        for s in r["spans"]
    ]
    got = [(r["doc_id"], r["offset"], r["kind"], r["text"]) for r in flat]
    assert got == want


def test_output_schema(sf_smoke_corpus):
    small = sf_smoke_corpus.slice(0, 5)
    out = extract_corpus(ray.data.from_arrow(small), CFG)
    batches = list(out.iter_batches(batch_format="pyarrow"))
    assert batches
    for b in batches:
        assert b.schema.equals(PARSED_DOC_SCHEMA), b.schema


def test_fused_equals_unfused(sf_smoke_corpus):
    import ray.data

    from agentic_doc_ray.config import EngineConfig
    from agentic_doc_ray.pipelines import extract_corpus

    small = sf_smoke_corpus.slice(0, 60)
    fused = EngineConfig(fuse_stages=True, parse_concurrency=(1, 2))
    unfused = EngineConfig(fuse_stages=False, parse_concurrency=(1, 2))
    a = sorted(
        extract_corpus(ray.data.from_arrow(small), fused).take_all(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        extract_corpus(ray.data.from_arrow(small), unfused).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert a == b


def test_fused_actor_pool_equals_tasks(sf_smoke_corpus):
    import ray.data

    from agentic_doc_ray.config import EngineConfig
    from agentic_doc_ray.pipelines import extract_corpus

    small = sf_smoke_corpus.slice(0, 40)
    tasks = EngineConfig(fuse_stages=True, fused_use_actors=False)
    actors = EngineConfig(
        fuse_stages=True, fused_use_actors=True, parse_concurrency=(1, 2)
    )
    a = sorted(
        extract_corpus(ray.data.from_arrow(small), tasks).take_all(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        extract_corpus(ray.data.from_arrow(small), actors).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert a == b


def test_multi_page_groundings_flow(parsed_vs_oracle):
    """The continued-table fixture (synth: doc_id % 36 == 3) must produce
    chunks grounded on SEVERAL pages (reference Chunk.grounding is a list,
    common.py:49-53; ref tests/unit/test_common.py:95-103), identical
    between engine and oracle, and the grounding manifest must emit one
    row per grounding with the chunk's kind and rect."""
    got, want = parsed_vs_oracle
    multi = [
        (g["doc_id"], s)
        for g in got
        for s in g["spans"]
        if len(s["groundings"]) > 1
    ]
    assert multi, "corpus must contain multi-grounding chunks"
    assert any(len(s["groundings"]) >= 3 for _, s in multi)  # a 3-page chain
    for _, s in multi:
        assert s["kind"] == "table"
        pages = [gr["page"] for gr in s["groundings"]]
        assert pages == list(range(pages[0], pages[0] + len(pages)))
        # merged text carries one member per grounding
        assert s["text"].count("\n") >= len(pages) - 1

    # oracle agrees exactly (already covered by full-row equality; assert
    # the specific field anyway for a readable failure)
    want_multi = [
        (w["doc_id"], s)
        for w in want
        for s in w["spans"]
        if len(s["groundings"]) > 1
    ]
    assert [(d, s["chunk_id"], [g["page"] for g in s["groundings"]]) for d, s in multi] == [
        (d, s["chunk_id"], [g["page"] for g in s["groundings"]]) for d, s in want_multi
    ]

    # manifest: one row per grounding, g_idx sequence intact
    from agentic_doc_ray.functions.grounding import grounding_manifest_batch

    doc_id, s = multi[0]
    src = next(g for g in got if g["doc_id"] == doc_id)
    batch = pa.Table.from_pylist([src], schema=PARSED_DOC_SCHEMA)
    man = grounding_manifest_batch(batch, "/tmp/gm").to_pylist()
    rows = [m for m in man if m["chunk_id"] == s["chunk_id"]]
    assert [m["g_idx"] for m in rows] == list(range(len(s["groundings"])))
    assert [m["page"] for m in rows] == [g["page"] for g in s["groundings"]]
    assert all(m["kind"] == "table" for m in rows)
