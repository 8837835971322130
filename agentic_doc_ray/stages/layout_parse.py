"""Layout-parse + chunk-classify stage (stateful actor pool).

The local stand-in for the reference's per-part remote parse
(``/root/reference/agentic_doc/parse.py:660-739``). Run as
``ds.map_batches(LayoutParseActor, concurrency=N, batch_size=B,
batch_format="pyarrow")`` — per-actor warm state (compiled patterns /
"model") built once in ``__init__``, per-batch work in ``__call__``.

Never-throw contract (parse.py:722-739): an undecodable page never raises;
it yields a single error-placeholder chunk (kind="error", is_error=True)
that the reassembly stage turns into a PageError row + error span. This
keeps the UDF a pure function of its input batch, so Ray task retries and
actor restarts are safe (SURVEY.md §4.2).

One page row -> M chunk rows (CHUNK_SCHEMA); pages remain part-relative
until the reassembly shuffle rebases them.
"""

from __future__ import annotations

import pyarrow as pa

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.schema import CHUNK_SCHEMA
from agentic_doc_ray.stages.explode import BLANK_KIND, EMPTY_KIND
from agentic_doc_ray.textparse import parse_page

CHUNK_WITH_BUCKET_SCHEMA = CHUNK_SCHEMA.append(pa.field("bucket", pa.int32()))


class LayoutParseActor:
    def __init__(self, config: EngineConfig = DEFAULT_CONFIG):
        # Warm state: in a real deployment this is where layout/classifier
        # model weights load (once per actor, amortized over all batches).
        self.config = config
        self._include_marginalia = config.include_marginalia
        # bucket key for the downstream reassembly exchange, computed here
        # so no extra operator hop is needed (crc32: deterministic across
        # processes, unlike python hash())
        self._n_buckets = config.reassemble_num_partitions or 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        part_idxs = batch.column("part_idx").to_pylist()
        page_rels = batch.column("page_rel").to_pylist()
        kinds = batch.column("kind").to_pylist()
        texts = batch.column("text").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        offsets = batch.column("offset").to_pylist()
        n_spans = batch.column("n_spans").to_pylist()
        doc_types = batch.column("doc_type").to_pylist()

        import zlib

        nb = self._n_buckets
        bucket_cache: dict[str, int] = {}
        cols: dict[str, list] = {name: [] for name in CHUNK_SCHEMA.names}
        cols["bucket"] = []
        for i in range(len(doc_ids)):
            b = bucket_cache.get(doc_ids[i])
            if b is None:
                b = zlib.crc32(doc_ids[i].encode()) % nb
                bucket_cache[doc_ids[i]] = b
            if kinds[i] == EMPTY_KIND:
                # zero-span document: forward the sentinel so the doc still
                # yields an (empty) output row after reassembly
                cols["doc_id"].append(doc_ids[i])
                cols["part_idx"].append(0)
                cols["page_rel"].append(0)
                cols["block_idx"].append(0)
                cols["kind"].append(EMPTY_KIND)
                cols["text"].append("")
                cols["media_ref"].append("")
                cols["chunk_id"].append(f"{doc_ids[i]}-empty")
                cols["bbox"].append([0.0, 0.0, 1.0, 1.0])
                cols["is_error"].append(False)
                cols["error"].append("")
                cols["n_spans"].append(0)
                cols["doc_type"].append("pdf")
                cols["bucket"].append(b)
                continue
            chunks = parse_page(
                doc_ids[i],
                offsets[i],
                kinds[i],
                texts[i],
                refs[i],
                include_marginalia=self._include_marginalia,
            )
            if not chunks:
                # blank page: no extractable blocks, but the page still
                # occupies its slot in the part/markdown structure
                cols["doc_id"].append(doc_ids[i])
                cols["part_idx"].append(part_idxs[i])
                cols["page_rel"].append(page_rels[i])
                cols["block_idx"].append(0)
                cols["kind"].append(BLANK_KIND)
                cols["text"].append("")
                cols["media_ref"].append("")
                cols["chunk_id"].append(f"{doc_ids[i]}-{offsets[i]:05d}-blank")
                cols["bbox"].append([0.0, 0.0, 1.0, 1.0])
                cols["is_error"].append(False)
                cols["error"].append("")
                cols["n_spans"].append(n_spans[i])
                cols["doc_type"].append(doc_types[i])
                cols["bucket"].append(b)
                continue
            for c in chunks:
                cols["doc_id"].append(doc_ids[i])
                cols["part_idx"].append(part_idxs[i])
                cols["page_rel"].append(page_rels[i])
                cols["block_idx"].append(c.block_idx)
                cols["kind"].append(c.kind)
                cols["text"].append(c.text)
                cols["media_ref"].append(c.media_ref)
                cols["chunk_id"].append(c.chunk_id)
                cols["bbox"].append(list(c.bbox))
                cols["is_error"].append(c.is_error)
                cols["error"].append(c.error)
                cols["n_spans"].append(n_spans[i])
                cols["doc_type"].append(doc_types[i])
                cols["bucket"].append(b)
        return pa.Table.from_pydict(cols, schema=CHUNK_WITH_BUCKET_SCHEMA)
