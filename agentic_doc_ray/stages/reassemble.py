"""Reassembly stage — THE shuffle of the engine.

``groupby(doc_id).map_groups(merge)``: the Ray-native form of the
reference's ``_merge_part_results`` / ``_merge_next_part``
(``/root/reference/agentic_doc/parse.py:597-629``):

  - chunks sorted by (part_idx, page_rel, block_idx) — restores intra-doc
    order from the ``offset`` keys, never from block order (SURVEY.md §2.6);
  - pages rebased: page_abs = page_rel + part_idx * split_size, the exact
    ``grounding.page += next.start_page_idx`` math (parse.py:620-624);
  - markdown = part markdowns joined "\n\n" (parse.py:621), a failed part
    contributing its empty string;
  - errors concatenated in part order (parse.py:628);
  - final span offsets re-assigned dense 0..n-1 per doc.

Skew note: one pathological mega-doc is one group. The per-group work is
O(n_chunks) python over at most (pages_per_doc x blocks_per_page) rows;
at 100 TB the group payload is bounded by size-aware splitting upstream,
and a salted two-phase merge (partial merge per (doc_id, part_bucket),
final merge per doc_id) is the documented escape hatch if a single group
exceeds a worker's heap.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.schema import PARSED_DOC_SCHEMA
from agentic_doc_ray.textparse import merge_markdown, part_markdown


def merge_doc_group(group: pa.Table, config: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Merge one doc's chunk rows (CHUNK_SCHEMA) -> one PARSED_DOC_SCHEMA row.

    Single to_pydict + python sort: groups are small (one document), where
    per-call pyarrow overhead dominates vectorized kernels (measured ~3x).
    """
    d = group.to_pydict()
    n = len(d["doc_id"])
    order = sorted(
        range(n),
        key=lambda i: (d["part_idx"][i], d["page_rel"][i], d["block_idx"][i]),
    )
    doc_id = d["doc_id"][0]
    doc_type = d["doc_type"][0]
    n_spans = int(d["n_spans"][0])
    split = config.split_size

    if n_spans == 0:
        # zero-span document -> empty ParsedDocument (parse.py:599-611)
        return pa.Table.from_pylist(
            [
                {
                    "doc_id": doc_id,
                    "markdown": "",
                    "spans": [],
                    "errors": [],
                    "start_page_idx": 0,
                    "end_page_idx": 0,
                    "doc_type": doc_type,
                }
            ],
            schema=PARSED_DOC_SCHEMA,
        )

    part_idx = d["part_idx"]
    page_rel = d["page_rel"]
    kinds = d["kind"]
    texts = d["text"]
    refs = d["media_ref"]
    chunk_ids = d["chunk_id"]
    bboxes = d["bbox"]
    is_err = d["is_error"]
    errs = d["error"]

    spans, errors = [], []
    part_mds: list[str] = []
    cur_part, cur_texts = None, []
    for out_i, i in enumerate(order):
        page_abs = page_rel[i] + part_idx[i] * split  # the rebase
        if part_idx[i] != cur_part:
            if cur_part is not None:
                part_mds.append(part_markdown(cur_texts))
            cur_part, cur_texts = part_idx[i], []
        spans.append(
            {
                "kind": kinds[i],
                "text": texts[i],
                "media_ref": refs[i],
                "offset": out_i,
                "chunk_id": chunk_ids[i],
                "page": page_abs,
                "bbox": bboxes[i],
            }
        )
        if is_err[i]:
            errors.append({"page_num": page_abs, "error": errs[i], "error_code": -1})
        else:
            cur_texts.append(texts[i])
    if cur_part is not None:
        part_mds.append(part_markdown(cur_texts))

    row = {
        "doc_id": doc_id,
        "markdown": merge_markdown(part_mds),
        "spans": spans,
        "errors": errors,
        "start_page_idx": 0,
        "end_page_idx": 0 if doc_type == "image" else max(0, n_spans - 1),
        "doc_type": doc_type,
    }
    return pa.Table.from_pylist([row], schema=PARSED_DOC_SCHEMA)


def reassemble(
    chunks: "ray.data.Dataset", config: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """The groupby(doc_id) shuffle restoring per-document span order.

    The sort-based groupby partitions by the input block count, so chunks
    are first repartitioned to ``reassemble_num_partitions`` blocks — this
    sets the merge stage's parallelism (measured: 5 blocks = 5 merge tasks
    regardless of cluster size).
    """
    if config.reassemble_num_partitions:
        chunks = chunks.repartition(config.reassemble_num_partitions)
    return chunks.groupby("doc_id").map_groups(
        lambda g: merge_doc_group(g, config), batch_format="pyarrow"
    )
