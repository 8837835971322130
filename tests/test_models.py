"""Pydantic parity surface: create_metadata_model recursion (behaviour pinned
by ref tests/unit/test_common.py:248-398) and the extraction_model path."""

from typing import List, Optional

import pyarrow as pa
import pytest
import ray.data
from pydantic import BaseModel, ValidationError

from agentic_doc_ray.models import (
    Chunk,
    ChunkGrounding,
    ChunkGroundingBox,
    ChunkType,
    DocExtraction,
    MetadataType,
    PageError,
    ParsedDocument,
    create_metadata_model,
)


class Researcher(BaseModel):
    age: int
    name: str


class TopLevelModel(BaseModel):
    id: int
    researcher: Researcher


def test_nested_model_recursion():
    MM = create_metadata_model(TopLevelModel)
    assert MM.__name__ == "TopLevelModelMetadata"
    inst = MM(
        id={"confidence": 0.5, "chunk_references": ["dummy"], "value": 5},
        researcher={
            "age": {"confidence": 0.5, "chunk_references": ["a", "b"], "value": 5},
            "name": {"confidence": 0.5, "chunk_references": ["a"], "value": "jo"},
        },
    )
    assert isinstance(inst.id, MetadataType[int])
    assert isinstance(inst.researcher.age, MetadataType[int])
    assert isinstance(inst.researcher.name, MetadataType[str])
    assert inst.researcher.__class__.__name__ == "ResearcherMetadata"


def test_optional_leaf():
    class M(BaseModel):
        required_field: str
        optional_field: Optional[str] = None

    MM = create_metadata_model(M)
    inst = MM(
        required_field={"confidence": 0.5, "chunk_references": ["d"], "value": "x"},
        optional_field=None,
    )
    assert isinstance(inst.required_field, MetadataType[str])
    assert inst.optional_field is None


def test_optional_nested_model():
    class M(BaseModel):
        maybe: Optional[Researcher] = None

    MM = create_metadata_model(M)
    assert MM(maybe=None).maybe is None
    filled = MM(
        maybe={
            "age": {"chunk_references": ["d"]},
            "name": {"chunk_references": ["d"]},
        }
    )
    assert isinstance(filled.maybe.age, MetadataType[int])


def test_list_of_model_and_primitive():
    class M(BaseModel):
        items: List[Researcher]
        tags: List[str]

    MM = create_metadata_model(M)
    inst = MM(
        items=[
            {"age": {"chunk_references": ["d"]}, "name": {"chunk_references": ["d"]}},
        ],
        tags=[{"chunk_references": ["d"]}, {"chunk_references": ["e"]}],
    )
    assert isinstance(inst.items[0].age, MetadataType[int])
    assert isinstance(inst.tags[0], MetadataType[str])
    assert "chunk_references" in inst.tags[0].__class__.model_fields
    # defaults: both list fields default to []
    assert MM().items == [] and MM().tags == []


def test_chunk_references_required():
    class M(BaseModel):
        f: str

    MM = create_metadata_model(M)
    with pytest.raises(ValidationError):
        MM(f={"value": "x"})  # missing chunk_references


def test_parsed_document_envelope():
    doc = ParsedDocument(
        markdown="hello",
        chunks=[
            Chunk(
                text="hello",
                grounding=[
                    ChunkGrounding(
                        page=0, box=ChunkGroundingBox(l=0.0, t=0.0, r=1.0, b=1.0)
                    )
                ],
                chunk_type=ChunkType.text,
                chunk_id="c1",
            )
        ],
        start_page_idx=0,
        end_page_idx=0,
        doc_type="pdf",
        errors=[PageError(page_num=0, error="x", error_code=-1)],
    )
    assert doc.extraction is None and doc.result_path is None
    with pytest.raises(ValidationError):
        ParsedDocument(
            markdown="", chunks=[], start_page_idx=0, end_page_idx=0, doc_type="docx"
        )


# ---------------------------------------------------------------------------
# extraction_model path through Ray
# ---------------------------------------------------------------------------


def _parsed_fixture() -> pa.Table:
    def span(kind, text, chunk_id, page, offset):
        return {
            "kind": kind,
            "text": text,
            "media_ref": "",
            "offset": offset,
            "chunk_id": chunk_id,
            "page": page,
            "bbox": [0.1, 0.1, 0.9, 0.9],
        }

    from agentic_doc_ray.schema import PARSED_DOC_SCHEMA

    rows = [
        {
            "doc_id": "d1",
            "markdown": "# T\n\nbody",
            "spans": [
                span("title", "# The Title", "d1-c0", 0, 0),
                span("text", "first paragraph", "d1-c1", 0, 1),
                span("figure", "Figure: sales chart", "d1-c2", 1, 2),
                span("figure", "Figure: org chart", "d1-c3", 2, 3),
                span("table", "| a | b |", "d1-c4", 2, 4),
            ],
            "errors": [],
            "start_page_idx": 0,
            "end_page_idx": 2,
            "doc_type": "pdf",
        },
        {
            "doc_id": "d2",
            "markdown": "",
            "spans": [],
            "errors": [],
            "start_page_idx": 0,
            "end_page_idx": 0,
            "doc_type": "pdf",
        },
    ]
    return pa.Table.from_pylist(rows, schema=PARSED_DOC_SCHEMA)


def test_extract_fields_model_end_to_end():
    import json

    from agentic_doc_ray.functions.extract_fields import extract_fields_model

    out = {
        r["doc_id"]: r
        for r in extract_fields_model(
            ray.data.from_arrow(_parsed_fixture()), DocExtraction
        ).take_all()
    }
    r1 = out["d1"]
    assert r1["extraction_error"] == ""
    ex = json.loads(r1["extraction"])
    assert ex["title"] == "The Title"
    assert ex["n_pages"] == 3
    assert ex["counts"] == {"n_figures": 2, "n_tables": 1}
    assert [f["caption"] for f in ex["figures"]] == [
        "Figure: sales chart",
        "Figure: org chart",
    ]
    assert [f["page"] for f in ex["figures"]] == [1, 2]
    assert ex["figure_captions"] == ["Figure: sales chart", "Figure: org chart"]
    md = json.loads(r1["extraction_metadata"])
    assert md["title"]["chunk_references"] == ["d1-c0"]
    assert md["counts"]["n_figures"]["chunk_references"] == ["d1-c2", "d1-c3"]
    assert md["figures"][0]["caption"]["chunk_references"] == ["d1-c2"]
    assert md["figure_captions"][1]["chunk_references"] == ["d1-c3"]
    # round-trips through the metadata model
    from agentic_doc_ray.models import create_metadata_model

    meta = create_metadata_model(DocExtraction).model_validate(md)
    assert meta.title.value == "The Title"

    # d2 has no spans: Optional fields None, lists empty, still valid
    r2 = out["d2"]
    assert r2["extraction_error"] == ""
    ex2 = json.loads(r2["extraction"])
    assert ex2["title"] is None and ex2["figures"] == []
    assert ex2["n_pages"] == 1


def test_extract_fields_model_validation_failure_is_error_row():
    class Strict(BaseModel):
        title: str  # required; d2 has none -> validation error

    from agentic_doc_ray.functions.extract_fields import extract_fields_model

    out = {
        r["doc_id"]: r
        for r in extract_fields_model(
            ray.data.from_arrow(_parsed_fixture()), Strict
        ).take_all()
    }
    assert out["d1"]["extraction_error"] == ""
    assert out["d2"]["extraction"] is None
    assert out["d2"]["extraction_error"] != ""


def test_get_chunk_from_reference():
    from agentic_doc_ray.functions.extract_fields import get_chunk_from_reference

    spans = _parsed_fixture().to_pylist()[0]["spans"]
    hit = get_chunk_from_reference("d1-c2", spans)
    assert hit["text"] == "Figure: sales chart"
    assert get_chunk_from_reference("missing", spans) is None
