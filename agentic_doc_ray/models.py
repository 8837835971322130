"""Pydantic result-model surface (reference parity layer).

Mirrors the public data model of ``/root/reference/agentic_doc/common.py``:
``ChunkType``/``ChunkGroundingBox``/``ChunkGrounding``/``Chunk``/``PageError``
(common.py:22-59), the generic ``MetadataType`` leaf (common.py:66-69), the
recursive ``create_metadata_model`` factory (common.py:72-126) and the
``ParsedDocument`` envelope (common.py:129-161). Behaviour is pinned by the
reference's tests (tests/unit/test_common.py:248-398): nested models recurse,
``Optional[T]`` leaves become ``Optional[MetadataType[T]]``, ``List[Model]``
recurses element-wise, ``List[primitive]`` becomes ``List[MetadataType[p]]``.

This module is pure Pydantic — no Ray. The engine's Arrow tables are the
at-scale representation; these models are the per-document validation /
interchange surface (extraction typing, save/reload roundtrip).
"""

from __future__ import annotations

import inspect
from enum import Enum
from pathlib import Path
from typing import (
    Any,
    Dict,
    Generic,
    List,
    Literal,
    Optional,
    TypeVar,
    Union,
    get_args,
    get_origin,
)

from pydantic import BaseModel, Field, create_model


class ChunkType(str, Enum):
    table = "table"
    figure = "figure"
    text = "text"
    marginalia = "marginalia"
    # engine extensions beyond the reference enum (common.py:22-26): the
    # local layout classifier also emits titles, and failed pages surface
    # as error chunks instead of raising (never-throw contract)
    title = "title"
    error = "error"


class ChunkGroundingBox(BaseModel):
    """Bounding box in [left, top, right, bottom] order."""

    l: float  # noqa: E741
    t: float
    r: float
    b: float


class ChunkGrounding(BaseModel):
    page: int
    box: ChunkGroundingBox
    image_path: Union[Path, None] = None


class Chunk(BaseModel):
    text: str
    grounding: List[ChunkGrounding]
    chunk_type: ChunkType
    chunk_id: str


class PageError(BaseModel):
    page_num: int
    error: str
    error_code: int


T = TypeVar("T", bound=BaseModel)
VT = TypeVar("VT")


class MetadataType(BaseModel, Generic[VT]):
    """Per-field provenance leaf: value + chunk_id FKs + confidence."""

    value: Optional[VT] = None
    chunk_references: List[str]
    confidence: Optional[float] = None


def create_metadata_model(model: type[BaseModel]) -> type[BaseModel]:
    """Recursively rewrite a Pydantic model's leaves to ``MetadataType``.

    - ``Optional[Model]``  -> ``Optional[ModelMetadata]`` (default None)
    - ``Optional[prim]``   -> ``Optional[MetadataType[prim]]`` (default None)
    - ``List[Model]``      -> ``List[ModelMetadata]`` (default [])
    - ``List[prim]``       -> ``List[MetadataType[prim]]`` (default [])
    - nested ``Model``     -> ``ModelMetadata``
    - primitive leaf       -> ``MetadataType[prim]``

    Result model is named ``{Name}Metadata`` (common.py:72-126 semantics).
    """
    fields: Dict[str, Any] = {}
    for name, field in model.model_fields.items():
        field_type = field.annotation
        origin = get_origin(field_type)

        if origin is Union:
            args = get_args(field_type)
            if len(args) == 2 and type(None) in args:
                inner = args[0] if args[1] is type(None) else args[1]
                if inspect.isclass(inner) and issubclass(inner, BaseModel):
                    fields[name] = (
                        Optional[create_metadata_model(inner)],
                        Field(default=None),
                    )
                else:
                    fields[name] = (
                        Optional[MetadataType[inner]],  # type: ignore[valid-type]
                        Field(default=None),
                    )
                continue

        if origin is list:
            inner = get_args(field_type)[0]
            if inspect.isclass(inner) and issubclass(inner, BaseModel):
                fields[name] = (
                    List[create_metadata_model(inner)],  # type: ignore[valid-type]
                    Field(default_factory=list),
                )
            else:
                fields[name] = (
                    List[MetadataType[inner]],  # type: ignore[valid-type]
                    Field(default_factory=list),
                )
            continue

        if inspect.isclass(field_type) and issubclass(field_type, BaseModel):
            fields[name] = (create_metadata_model(field_type), Field())
        else:
            fields[name] = (MetadataType[field_type], Field())  # type: ignore[valid-type]

    return create_model(f"{model.__name__}Metadata", **fields)


class ParsedDocument(BaseModel, Generic[T]):
    """Per-document result envelope (common.py:129-161).

    ``extraction`` is the typed (or raw-dict) extraction result;
    ``extraction_metadata`` the per-field provenance; ``result_path`` is
    attached by the save/reload roundtrip (parse.py:201-221,453-466).
    """

    markdown: str
    chunks: List[Chunk]
    extraction: Optional[Union[T, Dict[str, Any]]] = None
    extraction_metadata: Optional[Union[Dict[str, Any], BaseModel]] = None
    start_page_idx: int
    end_page_idx: int
    doc_type: Literal["pdf", "image"]
    result_path: Optional[Path] = None
    errors: List[PageError] = Field(default_factory=list)
    extraction_error: Optional[str] = None


# ---------------------------------------------------------------------------
# Demo extraction models (module-level so actor constructor kwargs pickle by
# reference). Exercise every create_metadata_model branch: nested model,
# Optional leaf, Optional nested, list-of-model, list-of-primitive.
# ---------------------------------------------------------------------------


class FigureInfo(BaseModel):
    caption: str
    page: int


class DocCounts(BaseModel):
    n_figures: int
    n_tables: int


class DocExtraction(BaseModel):
    """Flagship demo model for the extract_fields_model query."""

    title: Optional[str] = None
    n_pages: int
    first_text: Optional[str] = None
    counts: DocCounts
    figures: List[FigureInfo]
    figure_captions: List[str]
