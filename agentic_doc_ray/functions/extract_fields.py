"""Field-extraction + validation layer (the reference's extraction surface).

Reimplements the semantics of ``/root/reference/agentic_doc/parse.py``:

  - user-supplied JSON Schema drives both extraction and response
    validation (parse.py:556-565,697-706); ``$ref`` definitions are inlined
    recursively before use (``resolve_refs``, parse.py:783-791);
  - validation failure never fails the job: it lands in
    ``extraction_error`` with a null extraction
    (tests/unit/test_parse.py:1277-1498 semantics);
  - per-field provenance mirrors ``MetadataType`` (common.py:66-69): every
    extracted leaf carries ``value``, ``chunk_references`` (chunk_id FKs)
    and ``confidence``.

The model behind the API is replaced by deterministic extraction rules
over the parsed chunks: a schema property named ``title``/``n_pages``/
``n_figures``/``n_tables``/``first_text``/``languages`` maps to the
corresponding document evidence; unknown properties extract null (and
fail validation iff required). Runs as a stateful actor pool (validator
compiled once per actor).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

import ray.data


def resolve_refs(schema: Any, defs: dict | None = None) -> Any:
    """Inline ``$ref`` pointers into a self-contained schema
    (parse.py:783-791 semantics; supports #/$defs/ and #/definitions/)."""
    if defs is None:
        defs = {}
        for key in ("$defs", "definitions"):
            if isinstance(schema, dict) and key in schema:
                defs.update(schema[key])
    if isinstance(schema, dict):
        if "$ref" in schema:
            name = schema["$ref"].split("/")[-1]
            if name in defs:
                return resolve_refs(defs[name], defs)
            return schema
        return {
            k: resolve_refs(v, defs)
            for k, v in schema.items()
            if k not in ("$defs", "definitions")
        }
    if isinstance(schema, list):
        return [resolve_refs(v, defs) for v in schema]
    return schema


def get_chunk_from_reference(chunk_id: str, spans: list[dict]) -> dict | None:
    """chunk_id -> span dict lookup (ref utils.py:127-128 semantics: first
    match or None). The FK consumer of extraction_metadata.chunk_references."""
    for s in spans:
        if s.get("chunk_id") == chunk_id:
            return s
    return None


def _extract_field(name: str, spans: list[dict], doc: dict) -> tuple[Any, list[str]]:
    """Deterministic per-field extraction -> (value, chunk_references)."""
    if name == "title":
        for s in spans:
            if s["kind"] == "title":
                return s["text"].lstrip("# "), [s["chunk_id"]]
        return None, []
    if name == "n_pages":
        return int(doc["end_page_idx"]) + 1, []
    if name == "n_figures":
        refs = [s["chunk_id"] for s in spans if s["kind"] == "figure"]
        return len(refs), refs
    if name == "n_tables":
        refs = [s["chunk_id"] for s in spans if s["kind"] == "table"]
        return len(refs), refs
    if name == "first_text":
        for s in spans:
            if s["kind"] == "text":
                return s["text"], [s["chunk_id"]]
        return None, []
    if name == "figure_captions":
        caps = [(s["text"], s["chunk_id"]) for s in spans if s["kind"] == "figure"]
        return [c for c, _ in caps], [r for _, r in caps]
    return None, []


# ---------------------------------------------------------------------------
# Pydantic extraction_model path (ref parse.py:553-576: extraction =
# extraction_model.model_validate(...), extraction_metadata =
# create_metadata_model(extraction_model).model_validate(...)).
# ---------------------------------------------------------------------------

# list-of-model property name -> span kind family (element per matching span)
_SPAN_FAMILY = {"figures": "figure", "tables": "table"}


def _leaf_meta(value: Any, refs: list[str]) -> dict:
    return {
        "value": value,
        "chunk_references": refs,
        "confidence": 1.0 if value is not None else None,
    }


def _extract_span_models(
    name: str, inner_model: type, spans: list[dict]
) -> tuple[list[dict], list[dict]]:
    """List-of-model extraction: one element per span of the matching kind.

    Element leaves: ``caption``/``text`` -> span text, ``page`` -> span page,
    ``kind`` -> span kind; every leaf references the span's chunk_id."""
    kind = _SPAN_FAMILY.get(name)
    items_ex, items_md = [], []
    if kind is None:
        return items_ex, items_md
    for s in spans:
        if s["kind"] != kind:
            continue
        ex, md = {}, {}
        for leaf in inner_model.model_fields:
            if leaf in ("caption", "text"):
                v: Any = s["text"]
            elif leaf == "page":
                v = int(s.get("page", 0))
            elif leaf == "kind":
                v = s["kind"]
            else:
                v = None
            ex[leaf] = v
            md[leaf] = _leaf_meta(v, [s["chunk_id"]])
        items_ex.append(ex)
        items_md.append(md)
    return items_ex, items_md


def _extract_model_node(
    model_cls: type, spans: list[dict], doc: dict
) -> tuple[dict, dict]:
    """Recursive extraction shaped by a Pydantic model: (extraction, metadata).

    Mirrors create_metadata_model's recursion (common.py:72-126): Optional
    leaves may stay None (metadata None), nested models recurse, list-of-model
    extracts per matching span, list-of-primitive gets one MetadataType per
    extracted item."""
    import inspect as _inspect
    from typing import Union, get_args, get_origin

    from pydantic import BaseModel

    def _is_model(t: Any) -> bool:
        return _inspect.isclass(t) and issubclass(t, BaseModel)

    extraction: dict[str, Any] = {}
    metadata: dict[str, Any] = {}
    for name, field in model_cls.model_fields.items():
        ft = field.annotation
        origin = get_origin(ft)
        if origin is Union:
            args = get_args(ft)
            if len(args) == 2 and type(None) in args:
                inner = args[0] if args[1] is type(None) else args[1]
                if _is_model(inner):
                    ex, md = _extract_model_node(inner, spans, doc)
                    extraction[name], metadata[name] = ex, md
                else:
                    value, refs = _extract_field(name, spans, doc)
                    extraction[name] = value
                    metadata[name] = _leaf_meta(value, refs) if value is not None else None
                continue
        if origin is list:
            inner = get_args(ft)[0]
            if _is_model(inner):
                ex_items, md_items = _extract_span_models(name, inner, spans)
                extraction[name], metadata[name] = ex_items, md_items
            else:
                values, refs = _extract_field(name, spans, doc)
                values = values or []
                extraction[name] = values
                metadata[name] = [
                    _leaf_meta(v, [r]) for v, r in zip(values, refs)
                ]
            continue
        if _is_model(ft):
            ex, md = _extract_model_node(ft, spans, doc)
            extraction[name], metadata[name] = ex, md
        else:
            value, refs = _extract_field(name, spans, doc)
            extraction[name] = value
            metadata[name] = _leaf_meta(value, refs)
    return extraction, metadata


class ModelFieldExtractActor:
    """Pydantic-model-driven extraction actor (warm model + metadata model).

    Validation semantics per the reference (parse.py:553-576): the extraction
    dict is validated by ``extraction_model.model_validate``, the metadata by
    ``create_metadata_model(extraction_model).model_validate``; any failure
    becomes ``extraction_error`` with null extraction (never-throw)."""

    def __init__(self, model: type, max_pages: int = 50):
        from agentic_doc_ray.models import create_metadata_model

        self.model = model
        self.meta_model = create_metadata_model(model)
        self.max_pages = max_pages

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": batch.column("doc_id").to_pylist(),
            "extraction": [],
            "extraction_metadata": [],
            "extraction_error": [],
        }
        spans_col = batch.column("spans").to_pylist()
        end_pages = batch.column("end_page_idx").to_pylist()
        for spans, end_page in zip(spans_col, end_pages):
            if end_page + 1 > self.max_pages:
                out["extraction"].append(None)
                out["extraction_metadata"].append("{}")
                out["extraction_error"].append(
                    f"Document has {end_page + 1} pages, which exceeds the "
                    f"maximum of {self.max_pages} pages allowed when using "
                    "field extraction."
                )
                continue
            doc = {"end_page_idx": end_page}
            ex_dict, md_dict = _extract_model_node(self.model, spans or [], doc)
            try:
                typed = self.model.model_validate(ex_dict)
                meta = self.meta_model.model_validate(md_dict)
                out["extraction"].append(typed.model_dump_json())
                out["extraction_metadata"].append(meta.model_dump_json())
                out["extraction_error"].append("")
            except Exception as exc:
                out["extraction"].append(None)
                out["extraction_metadata"].append("{}")
                out["extraction_error"].append(str(exc).split("\n")[0][:300])
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("extraction", pa.string()),
                    ("extraction_metadata", pa.string()),
                    ("extraction_error", pa.string()),
                ]
            ),
        )


def extract_fields_model(
    parsed: "ray.data.Dataset", model: type, concurrency=(1, 4), max_pages: int = 50
) -> "ray.data.Dataset":
    """Typed (Pydantic) field extraction over parsed documents."""
    return parsed.map_batches(
        ModelFieldExtractActor,
        fn_constructor_kwargs={"model": model, "max_pages": max_pages},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class FieldExtractActor:
    """Parsed docs -> (extraction, extraction_metadata, extraction_error).

    Schema compiled + $refs inlined once per actor (warm state).

    ``max_pages`` mirrors the reference's ``extraction_split_size`` cap
    (default 50; docs with more pages are rejected when extraction is on,
    parse.py:483-498) — except rejection is an ``extraction_error`` row,
    not a raised exception (engine-wide never-throw contract)."""

    def __init__(self, schema: dict, max_pages: int = 50):
        import jsonschema

        self.schema = resolve_refs(schema)
        self.validator = jsonschema.Draft202012Validator(self.schema)
        self.props = list(self.schema.get("properties", {}))
        self.max_pages = max_pages

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": batch.column("doc_id").to_pylist(),
            "extraction": [],
            "extraction_metadata": [],
            "extraction_error": [],
        }
        spans_col = batch.column("spans").to_pylist()
        end_pages = batch.column("end_page_idx").to_pylist()
        for spans, end_page in zip(spans_col, end_pages):
            if end_page + 1 > self.max_pages:
                out["extraction"].append(None)
                out["extraction_metadata"].append("{}")
                out["extraction_error"].append(
                    f"Document has {end_page + 1} pages, which exceeds the "
                    f"maximum of {self.max_pages} pages allowed when using "
                    "field extraction."
                )
                continue
            doc = {"end_page_idx": end_page}
            extraction: dict[str, Any] = {}
            metadata: dict[str, Any] = {}
            for p in self.props:
                value, refs = _extract_field(p, spans or [], doc)
                if value is not None:
                    extraction[p] = value
                # MetadataType leaf: value + chunk_references + confidence
                metadata[p] = {
                    "value": value,
                    "chunk_references": refs,
                    "confidence": 1.0 if value is not None else None,
                }
            err = ""
            try:
                self.validator.validate(extraction)
            except Exception as exc:  # validation failure -> error, null extraction
                err = str(exc).split("\n")[0][:300]
                extraction = None  # type: ignore[assignment]
            out["extraction"].append(
                json.dumps(extraction, sort_keys=True) if extraction is not None else None
            )
            out["extraction_metadata"].append(json.dumps(metadata, sort_keys=True))
            out["extraction_error"].append(err)
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("extraction", pa.string()),
                    ("extraction_metadata", pa.string()),
                    ("extraction_error", pa.string()),
                ]
            ),
        )


def extract_fields(
    parsed: "ray.data.Dataset", schema: dict, concurrency=(1, 4), max_pages: int = 50
) -> "ray.data.Dataset":
    """Attach schema-validated field extraction to parsed documents."""
    return parsed.map_batches(
        FieldExtractActor,
        fn_constructor_kwargs={"schema": schema, "max_pages": max_pages},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


CHUNK_LOOKUP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("field", pa.string()),
        ("chunk_id", pa.string()),
        ("chunk_text", pa.string()),
    ]
)


class ChunkLookupActor(FieldExtractActor):
    """Extraction + chunk_reference resolution in one warm actor.

    For every chunk_id FK the extraction metadata emits, resolve it back to
    its span (``get_chunk_from_reference``, ref utils.py:127-128) — per-doc
    local (references and spans ride the same row), so the operator needs no
    shuffle regardless of corpus size."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        ex = super().__call__(batch.select(["doc_id", "spans", "end_page_idx"]))
        out = {"doc_id": [], "field": [], "chunk_id": [], "chunk_text": []}
        for doc_id, md_json, spans in zip(
            ex.column("doc_id").to_pylist(),
            ex.column("extraction_metadata").to_pylist(),
            batch.column("spans").to_pylist(),
        ):
            by_id = {s["chunk_id"]: s for s in (spans or [])}
            md = json.loads(md_json)
            for field in sorted(md):
                for cid in md[field].get("chunk_references", []):
                    hit = by_id.get(cid)
                    out["doc_id"].append(doc_id)
                    out["field"].append(field)
                    out["chunk_id"].append(cid)
                    out["chunk_text"].append(hit["text"] if hit else None)
        return pa.Table.from_pydict(out, schema=CHUNK_LOOKUP_SCHEMA)


def chunk_reference_lookup(
    parsed: "ray.data.Dataset", schema: dict, concurrency=(1, 4)
) -> "ray.data.Dataset":
    """(doc_id, field, chunk_id, chunk_text) for every metadata FK."""
    return parsed.map_batches(
        ChunkLookupActor,
        fn_constructor_kwargs={"schema": schema},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
