"""Pure-Python, single-process oracle for the extraction pipeline.

Implements the reference's split -> parse -> ordered-merge semantics
(``/root/reference/agentic_doc/parse.py:472-517,597-629``; split
``utils.py:214-264``) directly over the corpus table, with no Ray. The Ray
pipeline's output must match this under span-sequence equality
``(kind, text, media_ref, order)`` per doc_id (the north_rule invariant) —
this oracle substitutes for the remote API the reference tests against.

Shares only the page-level parsing primitives (textparse) with the Ray
stages; the orchestration under test — explode, shuffle, rebase, merge order
— is implemented here independently as straight-line loops.
"""

from __future__ import annotations

import pyarrow as pa

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.schema import FLAT_SPAN_SCHEMA, PARSED_DOC_SCHEMA
from agentic_doc_ray.textparse import merge_markdown, parse_page, part_markdown


def parse_doc_oracle(
    doc_id: str, spans: list[dict], config: EngineConfig = DEFAULT_CONFIG
) -> dict:
    """Parse one document exactly as the pipeline must, single-threaded."""
    spans = sorted(spans, key=lambda s: s["offset"])
    n = len(spans)
    doc_type = "image" if (n > 0 and all(s["kind"] == "image" for s in spans)) else "pdf"
    if n == 0:
        return {
            "doc_id": doc_id,
            "markdown": "",
            "spans": [],
            "errors": [],
            "start_page_idx": 0,
            "end_page_idx": 0,
            "doc_type": doc_type,
        }

    split = config.split_size
    out_spans: list[dict] = []
    errors: list[dict] = []
    part_mds: list[str] = []
    offset_out = 0
    # parts = [0..split), [split..2*split), ... (utils.py:244-263 semantics)
    for part_start in range(0, n, split):
        part = spans[part_start : part_start + split]
        chunk_texts: list[str] = []
        for s in part:
            page_abs = s["offset"]  # rebase: page_rel + part.start_page_idx
            for c in parse_page(
                doc_id,
                s["offset"],
                s["kind"],
                s["text"],
                s["media_ref"],
                include_marginalia=config.include_marginalia,
            ):
                out_spans.append(
                    {
                        "kind": c.kind,
                        "text": c.text,
                        "media_ref": c.media_ref,
                        "offset": offset_out,
                        "chunk_id": c.chunk_id,
                        "page": page_abs,
                        "bbox": list(c.bbox),
                    }
                )
                offset_out += 1
                if c.is_error:
                    errors.append(
                        {"page_num": page_abs, "error": c.error, "error_code": -1}
                    )
                else:
                    chunk_texts.append(c.text)
        part_mds.append(part_markdown(chunk_texts))
    return {
        "doc_id": doc_id,
        "markdown": merge_markdown(part_mds),
        "spans": out_spans,
        "errors": errors,
        "start_page_idx": 0,
        "end_page_idx": 0 if doc_type == "image" else n - 1,
        "doc_type": doc_type,
    }


def parse_corpus_oracle(
    corpus: pa.Table, config: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """Oracle over a whole corpus table -> PARSED_DOC_SCHEMA table, sorted by doc_id."""
    rows = [
        parse_doc_oracle(d, s, config)
        for d, s in zip(corpus["doc_id"].to_pylist(), corpus["spans"].to_pylist())
    ]
    rows.sort(key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows, schema=PARSED_DOC_SCHEMA)


def explode_parsed(parsed: pa.Table) -> pa.Table:
    """Nested parsed docs -> flat span rows (FLAT_SPAN_SCHEMA), for hashing."""
    out = []
    for d, spans in zip(parsed["doc_id"].to_pylist(), parsed["spans"].to_pylist()):
        for s in spans:
            out.append(
                {
                    "doc_id": d,
                    "offset": s["offset"],
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "chunk_id": s["chunk_id"],
                    "page": s["page"],
                }
            )
    return pa.Table.from_pylist(out, schema=FLAT_SPAN_SCHEMA)
