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
    # parts = [0..split), [split..2*split), ... (utils.py:244-263 semantics)
    for part_start in range(0, n, split):
        part = spans[part_start : part_start + split]
        part_spans: list[dict] = []
        for s in part:
            page_abs = s["offset"]  # rebase: page_rel + part.start_page_idx
            chunks = parse_page(
                doc_id,
                s["offset"],
                s["kind"],
                s["text"],
                s["media_ref"],
                include_marginalia=config.include_marginalia,
            )
            for ci, c in enumerate(chunks):
                if c.is_error:
                    errors.append(
                        {"page_num": page_abs, "error": c.error, "error_code": -1}
                    )
                # table-continuation merge (multi-page groundings, reference
                # Chunk.grounding is a LIST — common.py:49-53): the FIRST
                # chunk of a page extends the previous page's LAST chunk
                # when both are tables on adjacent pages of the same part
                prev = part_spans[-1] if part_spans else None
                if (
                    ci == 0
                    and c.kind == "table"
                    and prev is not None
                    and prev["kind"] == "table"
                    and prev["groundings"][-1]["page"] == page_abs - 1
                    and prev["_last_of_page"]
                ):
                    prev["text"] += "\n" + c.text
                    prev["groundings"].append(
                        {"page": page_abs, "bbox": list(c.bbox)}
                    )
                    prev["_last_of_page"] = ci == len(chunks) - 1
                    continue
                part_spans.append(
                    {
                        "kind": c.kind,
                        "text": c.text,
                        "media_ref": c.media_ref,
                        "offset": -1,  # assigned dense below
                        "chunk_id": c.chunk_id,
                        "page": page_abs,
                        "bbox": list(c.bbox),
                        "groundings": [{"page": page_abs, "bbox": list(c.bbox)}],
                        "_last_of_page": ci == len(chunks) - 1,
                    }
                )
        for ps in part_spans:
            del ps["_last_of_page"]
        out_spans.extend(part_spans)
        part_mds.append(
            part_markdown(
                [ps["text"] for ps in part_spans if ps["kind"] != "error"]
            )
        )
    for i, ps in enumerate(out_spans):
        ps["offset"] = i
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
