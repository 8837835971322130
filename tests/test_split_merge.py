"""Split + merge semantics pinned against the reference.

- split: 5 pages at split_size=2 -> parts [0,1],[2,3],[4,4]
  (tests/unit/test_utils.py:215-236 in the reference).
- merge: page rebasing page_abs = page_rel + part.start_page_idx
  (_merge_next_part, parse.py:620-629; tests/unit/test_parse.py:315-365).
- markdown: parts joined with "\\n\\n"; a failed part contributes "".
"""

import pyarrow as pa

from agentic_doc_ray.config import EngineConfig
from agentic_doc_ray.schema import CHUNK_SCHEMA, CORPUS_SCHEMA
from agentic_doc_ray.stages.explode import explode_spans
from agentic_doc_ray.stages.reassemble import merge_doc_group


def _corpus(doc_id, spans):
    return pa.Table.from_pydict({"doc_id": [doc_id], "spans": [spans]}, schema=CORPUS_SCHEMA)


def test_split_five_pages_size_two():
    spans = [
        {"kind": "pdf_page", "text": f"page {p} body words", "media_ref": "", "offset": p}
        for p in range(5)
    ]
    pages = explode_spans(_corpus("d", spans), EngineConfig(split_size=2))
    assert pages.column("part_idx").to_pylist() == [0, 0, 1, 1, 2]
    assert pages.column("page_rel").to_pylist() == [0, 1, 0, 1, 0]
    assert pages.column("n_spans").to_pylist() == [5] * 5
    assert pages.column("doc_type").to_pylist() == ["pdf"] * 5


def test_split_uses_offset_not_list_position():
    spans = [
        {"kind": "pdf_page", "text": "b", "media_ref": "", "offset": 1},
        {"kind": "pdf_page", "text": "a", "media_ref": "", "offset": 0},
        {"kind": "pdf_page", "text": "c", "media_ref": "", "offset": 2},
    ]
    pages = explode_spans(_corpus("d", spans), EngineConfig(split_size=2))
    got = dict(zip(pages.column("text").to_pylist(), pages.column("part_idx").to_pylist()))
    assert got == {"a": 0, "b": 0, "c": 1}


def test_image_doc_type():
    spans = [{"kind": "image", "text": "Figure: x", "media_ref": "m", "offset": 0}]
    pages = explode_spans(_corpus("d", spans))
    assert pages.column("doc_type").to_pylist() == ["image"]


def test_image_doc_followed_by_empty_doc():
    # Regression (ADVICE r1): reduceat with clipped starts truncated the last
    # non-empty doc's segment when a zero-span doc ended the batch, flipping
    # an all-image doc to doc_type='pdf'.
    corpus = pa.Table.from_pydict(
        {
            "doc_id": ["img", "empty"],
            "spans": [
                [
                    {"kind": "image", "text": "Figure: a", "media_ref": "m", "offset": 0},
                    {"kind": "image", "text": "Figure: b", "media_ref": "m", "offset": 1},
                ],
                [],
            ],
        },
        schema=CORPUS_SCHEMA,
    )
    pages = explode_spans(corpus)
    by_doc = dict(zip(pages.column("doc_id").to_pylist(), pages.column("doc_type").to_pylist()))
    assert by_doc["img"] == "image"


def test_empty_doc_between_pdf_docs():
    corpus = pa.Table.from_pydict(
        {
            "doc_id": ["a", "e", "b"],
            "spans": [
                [{"kind": "pdf_page", "text": "x", "media_ref": "", "offset": 0}],
                [],
                [{"kind": "image", "text": "Figure: y", "media_ref": "m", "offset": 0}],
            ],
        },
        schema=CORPUS_SCHEMA,
    )
    pages = explode_spans(corpus)
    by_doc = dict(zip(pages.column("doc_id").to_pylist(), pages.column("doc_type").to_pylist()))
    assert by_doc == {"a": "pdf", "e": "pdf", "b": "image"}


def test_mixed_doc_is_pdf_type():
    spans = [
        {"kind": "text", "text": "words", "media_ref": "", "offset": 0},
        {"kind": "image", "text": "Figure: x", "media_ref": "m", "offset": 1},
    ]
    pages = explode_spans(_corpus("d", spans))
    assert pages.column("doc_type").to_pylist() == ["pdf", "pdf"]


def _chunk_row(part_idx, page_rel, block_idx, text, is_error=False, error=""):
    return {
        "doc_id": "d",
        "part_idx": part_idx,
        "page_rel": page_rel,
        "block_idx": block_idx,
        "kind": "error" if is_error else "text",
        "text": text,
        "media_ref": "",
        "chunk_id": f"d-{part_idx}-{page_rel}-{block_idx}",
        "bbox": [0.0, 0.0, 1.0, 1.0],
        "is_error": is_error,
        "error": error,
        "n_spans": 5,
        "doc_type": "pdf",
    }


def test_merge_rebases_pages_exactly():
    # split_size=2: part 1 page_rel 1 -> absolute page 3 (= 1 + 1*2)
    rows = [
        _chunk_row(1, 1, 0, "p3"),
        _chunk_row(0, 0, 0, "p0"),
        _chunk_row(2, 0, 0, "p4"),
        _chunk_row(0, 1, 0, "p1"),
        _chunk_row(1, 0, 0, "p2"),
    ]
    group = pa.Table.from_pylist(rows, schema=CHUNK_SCHEMA)
    out = merge_doc_group(group, EngineConfig(split_size=2)).to_pylist()[0]
    spans = out["spans"]
    assert [s["page"] for s in spans] == [0, 1, 2, 3, 4]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3, 4]
    assert [s["text"] for s in spans] == ["p0", "p1", "p2", "p3", "p4"]
    assert out["start_page_idx"] == 0 and out["end_page_idx"] == 4
    # markdown: 3 parts joined with \n\n
    assert out["markdown"] == "p0\n\np1\n\np2\n\np3\n\np4"


def test_merge_failed_part_contributes_empty_markdown():
    rows = [
        _chunk_row(0, 0, 0, "a"),
        _chunk_row(0, 1, 0, "b"),
        _chunk_row(1, 0, 0, "", is_error=True, error="boom"),
        _chunk_row(1, 1, 0, "", is_error=True, error="boom"),
        _chunk_row(2, 0, 0, "e"),
    ]
    group = pa.Table.from_pylist(rows, schema=CHUNK_SCHEMA)
    out = merge_doc_group(group, EngineConfig(split_size=2)).to_pylist()[0]
    # parse.py:621 semantics: "a\n\nb" + "\n\n" + "" + "\n\n" + "e"
    assert out["markdown"] == "a\n\nb\n\n\n\ne"
    assert [e["page_num"] for e in out["errors"]] == [2, 3]
    assert all(e["error_code"] == -1 for e in out["errors"])
    # error spans present in the span stream with kind="error"
    assert [s["kind"] for s in out["spans"]] == ["text", "text", "error", "error", "text"]


def test_two_phase_merge_equals_single_phase(sf_smoke_corpus):
    """The salted two-phase escape hatch must be bit-equal to the
    single-phase reassembly on a corpus with mega docs, empty docs and
    error parts."""
    import ray.data

    from agentic_doc_ray.pipelines import extract_corpus
    from agentic_doc_ray.stages.fused import FusedParseActor
    from agentic_doc_ray.stages.reassemble import reassemble, reassemble_two_phase

    cfg = EngineConfig(split_size=2, parse_concurrency=(1, 2), fuse_stages=False)
    corpus = ray.data.from_arrow(sf_smoke_corpus.slice(0, 40))
    # chunk rows via the fused stage without local reassembly
    chunks = corpus.map_batches(
        FusedParseActor,
        fn_constructor_kwargs={"config": cfg, "local_reassembly": False},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 2),
    )
    single = sorted(
        reassemble(chunks, cfg).take_all(), key=lambda r: r["doc_id"]
    )
    double = sorted(
        reassemble_two_phase(chunks, cfg, range_size=2).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert len(single) == len(double)
    for a, b in zip(single, double):
        assert a == b, (a["doc_id"],)
