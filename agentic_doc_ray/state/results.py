"""Per-document JSON save/reload roundtrip (reference parity surface).

Mirrors ``/root/reference/agentic_doc/parse.py:453-466`` (save: one
``{stem}_{%Y%m%d_%H%M%S}.json`` per document, content =
``ParsedDocument.model_dump_json()``) and ``parse.py:201-221`` (reload:
``ParsedDocument.model_validate`` over the JSON, attaching ``result_path``).

This is the interchange surface, not the scale path — the partitioned
parquet sink (state/manifest.py) is what a 100 TB run writes. Per-doc JSON
is still useful at the edges (handing single results to downstream tools),
and both directions run distributed: save is a ``map_batches`` stage whose
tasks write their own rows' files (a shared filesystem / object store at
multi-node scale), reload is ``read_binary_files`` + validate per batch.

Arrow-row <-> ParsedDocument mapping:
  - span.kind        <-> chunk.chunk_type  (ChunkType incl. title/error)
  - span.text        <-> chunk.text
  - span.page/bbox   <-> chunk.grounding[0].page/.box (l,t,r,b)
  - span.media_ref   <-> sidecar ``media_refs`` map in the JSON payload
    (``image_path`` is a pydantic ``Path`` and would normalize ``//`` in
    media URIs; the reference reserves it for grounding crops anyway)
  - span.offset       =  chunk list position (spans are rebased dense)
  - span.chunk_id    <-> chunk.chunk_id
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime

import pyarrow as pa

import ray.data

from agentic_doc_ray.models import (
    Chunk,
    ChunkGrounding,
    ChunkGroundingBox,
    PageError,
    ParsedDocument,
)
from agentic_doc_ray.schema import PARSED_DOC_SCHEMA

_STEM_SAFE_RE = re.compile(r"[^A-Za-z0-9._-]")


def doc_row_to_parsed_document(row: dict) -> ParsedDocument:
    """One PARSED_DOC_SCHEMA row -> the reference's ParsedDocument."""
    def _groundings(s: dict) -> list[ChunkGrounding]:
        # multi-page groundings map 1:1 onto the reference's grounding
        # LIST (common.py:49-53); pre-groundings rows fall back to the
        # scalar page/bbox pair
        gs = s.get("groundings") or [{"page": s["page"], "bbox": s["bbox"]}]
        return [
            ChunkGrounding(
                page=g["page"],
                box=ChunkGroundingBox(
                    l=g["bbox"][0], t=g["bbox"][1], r=g["bbox"][2], b=g["bbox"][3]
                ),
            )
            for g in gs
        ]

    chunks = [
        Chunk(
            text=s["text"],
            grounding=_groundings(s),
            chunk_type=s["kind"],
            chunk_id=s["chunk_id"],
        )
        for s in (row["spans"] or [])
    ]
    errors = [
        PageError(page_num=e["page_num"], error=e["error"], error_code=e["error_code"])
        for e in (row["errors"] or [])
    ]
    return ParsedDocument(
        markdown=row["markdown"],
        chunks=chunks,
        start_page_idx=row["start_page_idx"],
        end_page_idx=row["end_page_idx"],
        doc_type=row["doc_type"],
        errors=errors,
    )


def parsed_document_to_doc_row(
    doc: ParsedDocument, doc_id: str, media_refs: dict[str, str] | None = None
) -> dict:
    """Inverse mapping (offset = chunk position; spans are dense-rebased)."""
    media_refs = media_refs or {}
    spans = []
    for i, c in enumerate(doc.chunks):
        g = c.grounding[0]
        spans.append(
            {
                "kind": c.chunk_type.value,
                "text": c.text,
                "media_ref": media_refs.get(c.chunk_id, ""),
                "offset": i,
                "chunk_id": c.chunk_id,
                "page": g.page,
                "bbox": [g.box.l, g.box.t, g.box.r, g.box.b],
                "groundings": [
                    {
                        "page": gg.page,
                        "bbox": [gg.box.l, gg.box.t, gg.box.r, gg.box.b],
                    }
                    for gg in c.grounding
                ],
            }
        )
    return {
        "doc_id": doc_id,
        "markdown": doc.markdown,
        "spans": spans,
        "errors": [
            {"page_num": e.page_num, "error": e.error, "error_code": e.error_code}
            for e in doc.errors
        ],
        "start_page_idx": doc.start_page_idx,
        "end_page_idx": doc.end_page_idx,
        "doc_type": doc.doc_type,
    }


def save_results_json(
    parsed: "ray.data.Dataset",
    result_save_dir: str,
    timestamp: str | None = None,
) -> "ray.data.Dataset":
    """Write one ``{stem}_{ts}.json`` per document; returns (doc_id,
    result_path) rows. ``timestamp`` pins the ts for deterministic tests;
    default is now() like the reference (parse.py:453)."""
    ts = timestamp or datetime.now().strftime("%Y%m%d_%H%M%S")
    os.makedirs(result_save_dir, exist_ok=True)

    def save(batch: pa.Table) -> pa.Table:
        has_extraction = "extraction" in batch.schema.names
        paths = []
        for row in batch.to_pylist():
            doc = doc_row_to_parsed_document(row)
            stem = _STEM_SAFE_RE.sub("_", row["doc_id"])
            path = os.path.join(result_save_dir, f"{stem}_{ts}.json")
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                # doc_id + media_refs travel alongside the reference-shaped
                # payload so reload can restore the engine's keys
                payload = json.loads(doc.model_dump_json())
                payload["doc_id"] = row["doc_id"]
                payload["media_refs"] = {
                    s["chunk_id"]: s["media_ref"]
                    for s in (row["spans"] or [])
                    if s["media_ref"]
                }
                if has_extraction:
                    # extraction travels in the ParsedDocument shape
                    # (common.py:129-161): typed dict + metadata + error
                    payload["extraction"] = (
                        json.loads(row["extraction"])
                        if row.get("extraction")
                        else None
                    )
                    payload["extraction_metadata"] = (
                        json.loads(row["extraction_metadata"])
                        if row.get("extraction_metadata")
                        else None
                    )
                    payload["extraction_error"] = (
                        row.get("extraction_error") or None
                    )
                json.dump(payload, fh)
            os.replace(tmp, path)
            paths.append(path)
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"), "result_path": paths},
            schema=pa.schema([("doc_id", pa.string()), ("result_path", pa.string())]),
        )

    return parsed.map_batches(save, batch_format="pyarrow")


RELOADED_SCHEMA = pa.schema(
    list(PARSED_DOC_SCHEMA)
    + [
        pa.field("result_path", pa.string()),
        pa.field("extraction", pa.string()),
        pa.field("extraction_metadata", pa.string()),
        pa.field("extraction_error", pa.string()),
    ]
)


def load_results_json(result_save_dir: str) -> "ray.data.Dataset":
    """Re-read + re-validate saved JSON results, attaching result_path
    (parse.py:201-221 semantics: every file goes back through
    ParsedDocument.model_validate). Extraction fields round-trip when
    present (null columns otherwise)."""
    files = ray.data.read_binary_files(result_save_dir, include_paths=True)

    def load(batch: pa.Table) -> pa.Table:
        rows = []
        for path, blob in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            data = json.loads(blob.decode("utf-8"))
            doc_id = data.pop("doc_id")
            media_refs = data.pop("media_refs", {})
            # keep the raw extraction dicts: unparameterized ParsedDocument
            # validates Union[T, Dict] with T bound to bare BaseModel,
            # which would swallow the dict's fields
            ex_raw = data.pop("extraction", None)
            md_raw = data.pop("extraction_metadata", None)
            err_raw = data.pop("extraction_error", None)
            doc = ParsedDocument.model_validate(data)
            row = parsed_document_to_doc_row(doc, doc_id, media_refs)
            row["result_path"] = path
            row["extraction"] = (
                json.dumps(ex_raw, sort_keys=True) if ex_raw is not None else None
            )
            row["extraction_metadata"] = (
                json.dumps(md_raw, sort_keys=True) if md_raw is not None else None
            )
            row["extraction_error"] = err_raw
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=RELOADED_SCHEMA)

    return files.map_batches(load, batch_format="pyarrow")
