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
