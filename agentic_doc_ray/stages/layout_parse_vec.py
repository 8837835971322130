"""Vectorized layout parser — Arrow-kernel implementation of the
``textparse`` spec.

``textparse.parse_page`` (shared with the oracle) is the SEMANTIC SPEC;
this module re-expresses it as columnar kernels so the hot path runs at
C speed: one ``split_pattern_regex`` explodes pages into blocks, RE2
``match_substring_regex`` masks classify every block at once, and numpy
segment arithmetic assigns bboxes, block indices, and chunk ids. Parity is
enforced by tests (vectorized == reference actor on fixture and
hypothesis-generated corpora) — any divergence is a bug here, not a new
semantic.

Same interface as ``LayoutParseActor``; selected via
``EngineConfig.parse_impl`` ("vectorized" default, "reference" fallback).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.stages.explode import BLANK_KIND, EMPTY_KIND
from agentic_doc_ray.stages.layout_parse import CHUNK_WITH_BUCKET_SCHEMA, LayoutParseActor
from agentic_doc_ray.textparse import CORRUPT_MARKER

# RE2 equivalents of the textparse classification rules (all ASCII, like
# the re.A-flagged spec patterns).
_RE_TITLE = r"^#{1,2} "
_RE_FIGURE = r"^!\[[^\]]*\]\([^)]*\)"
_RE_FIGURE_REF = r"^!\[[^\]]*\]\((?P<ref>[^)]*)\)"
_RE_TABLE = r"^[ \t]*\|[^\n]*(\n[ \t]*\|[^\n]*)*$"
_RE_SINGLE_LINE = r"^[^\n]*$"
# ALLCAPS uses {2,59} (not the spec regex's {2,60}) because the spec ANDs
# its regex with len(line) <= 60.
_RE_MARGINALIA_LINE = (
    r"^(Page [0-9]+( of [0-9]+)?|- [0-9]+ -|[0-9]{1,4}"
    r"|©[^\n]*|\(c\) [^\n]*"
    r"|[A-Z][A-Z0-9 .,&'\-]{2,59})$"
)


class VecLayoutParseActor:
    """Drop-in replacement for LayoutParseActor (vectorized hot path).

    Irregular rows (corrupt payloads, image spans, zero-span sentinels) are
    delegated to the reference implementation — they are rare and its
    semantics are the spec.
    """

    def __init__(self, config: EngineConfig = DEFAULT_CONFIG):
        self.config = config
        self._ref = LayoutParseActor(config)
        self._n_buckets = config.reassemble_num_partitions or 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        kind = batch.column("kind").combine_chunks()
        text = batch.column("text").combine_chunks()
        irregular = pc.or_(
            pc.or_(pc.equal(kind, "image"), pc.equal(kind, EMPTY_KIND)),
            pc.match_substring(text, CORRUPT_MARKER),
        )
        # html rows reaching the parser unstripped also take the slow path
        irregular = pc.or_(irregular, pc.equal(kind, "html"))
        irr_np = irregular.to_numpy(zero_copy_only=False)
        parts = []
        if irr_np.any():
            parts.append(self._ref(batch.filter(irregular)))
        reg = batch.filter(pc.invert(irregular))
        if reg.num_rows:
            parts.append(self._parse_regular(reg))
        if not parts:
            return CHUNK_WITH_BUCKET_SCHEMA.empty_table()
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    # ------------------------------------------------------------------
    def _parse_regular(self, batch: pa.Table) -> pa.Table:
        import zlib

        n_pages = batch.num_rows
        text = batch.column("text").combine_chunks()

        # pages -> blocks (one kernel call), then ASCII-trim each block.
        # Explicit whitespace class: RE2 \s lacks \x0b, python ASCII \s has
        # it — the spec (textparse) uses this class for exactly that reason.
        WS = "[ \\t\\n\\r\\f\\v]"
        blocks_list = pc.split_pattern_regex(text, f"\\n{WS}*\\n")
        raw_blocks = blocks_list.flatten()
        page_of_block = pc.list_parent_indices(blocks_list).to_numpy(
            zero_copy_only=False
        )
        trimmed = pc.replace_substring_regex(
            raw_blocks, f"^{WS}+|{WS}+$", ""
        )
        nonempty = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)

        blocks = trimmed.filter(pa.array(nonempty))
        page_of_block = page_of_block[nonempty]
        n_blocks = len(blocks)

        # per-page kept-block counts and within-page block index i
        counts = np.bincount(page_of_block, minlength=n_pages)
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        block_i = np.arange(n_blocks) - starts[page_of_block]

        # --- classification masks (priority: title>figure>table>marg>text)
        m_title = pc.match_substring_regex(blocks, _RE_TITLE).to_numpy(
            zero_copy_only=False
        )
        m_figure = pc.match_substring_regex(blocks, _RE_FIGURE).to_numpy(
            zero_copy_only=False
        )
        m_table = pc.match_substring_regex(blocks, _RE_TABLE).to_numpy(
            zero_copy_only=False
        )
        m_single = pc.match_substring_regex(blocks, _RE_SINGLE_LINE).to_numpy(
            zero_copy_only=False
        )
        m_marg_line = pc.match_substring_regex(
            blocks, _RE_MARGINALIA_LINE
        ).to_numpy(zero_copy_only=False)
        m_marg = m_single & m_marg_line
        kinds = np.select(
            [m_title, m_figure, m_table, m_marg],
            ["title", "figure", "table", "marginalia"],
            default="text",
        )

        # figure media_ref extraction (only where figure)
        refs = np.full(n_blocks, "", dtype=object)
        if m_figure.any():
            ex = pc.extract_regex(blocks, _RE_FIGURE_REF)
            ref_vals = ex.field("ref").to_pylist()
            for j in np.flatnonzero(m_figure):
                refs[j] = ref_vals[j] or ""

        # marginalia exclusion
        include_marg = self.config.include_marginalia
        keep = np.ones(n_blocks, dtype=bool)
        if not include_marg:
            keep = kinds != "marginalia"

        # out_idx: rank among KEPT blocks within the page (cumsum of keep
        # minus the cumsum at each page's first block)
        csum = np.cumsum(keep)
        kept_before_page = np.concatenate(([0], csum))[starts[page_of_block]]
        out_idx = csum - 1 - kept_before_page  # index among kept, 0-based

        # bbox (vectorized bbox_for): t=i/n, b=(i+1)/n with clamps; l,r by kind
        n_per_block = counts[page_of_block].astype(np.float64)
        n_per_block = np.maximum(n_per_block, 1.0)
        t_ = block_i / n_per_block
        b_ = (block_i + 1) / n_per_block
        t_ = np.clip(t_, 0.0, 0.999)
        b_ = np.clip(b_, t_ + 0.001, 1.0)
        is_marg = kinds == "marginalia"
        l_ = np.where(is_marg, 0.08, 0.05)
        r_ = np.where(is_marg, 0.92, 0.95)
        bbox = np.stack([l_, t_, r_, b_], axis=1).astype(np.float32)

        # page-level columns gathered to blocks
        doc_ids = batch.column("doc_id").to_pylist()
        offsets_np = batch.column("offset").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        part_np = batch.column("part_idx").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        pagerel_np = batch.column("page_rel").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        nspans_np = batch.column("n_spans").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        doc_types = batch.column("doc_type").to_pylist()

        # chunk ids: "{doc}-{offset:05d}-{out:02d}" via vectorized join
        off_str = np.char.zfill(
            offsets_np[page_of_block].astype("U10"), 5
        )
        out_str = np.char.zfill(out_idx.astype("U10"), 2)
        doc_arr = np.array(doc_ids, dtype=object)[page_of_block]
        chunk_ids = [
            f"{d}-{o}-{x}" for d, o, x in zip(doc_arr, off_str, out_str)
        ]

        bucket_cache: dict[str, int] = {}

        def bucket_of(d: str) -> int:
            v = bucket_cache.get(d)
            if v is None:
                v = zlib.crc32(d.encode()) % self._n_buckets
                bucket_cache[d] = v
            return v

        buckets_per_page = np.array(
            [bucket_of(d) for d in doc_ids], dtype=np.int32
        )

        keep_idx = np.flatnonzero(keep)
        pk = page_of_block[keep_idx]
        chunk_tbl = pa.Table.from_arrays(
            [
                pa.array(doc_arr[keep_idx], pa.string()),
                pa.array(part_np[pk], pa.int32()),
                pa.array(pagerel_np[pk], pa.int32()),
                pa.array(out_idx[keep_idx], pa.int32()),
                pa.array(kinds[keep_idx], pa.string()),
                blocks.take(pa.array(keep_idx, pa.int64())),
                pa.array(refs[keep_idx], pa.string()),
                pa.array([chunk_ids[j] for j in keep_idx], pa.string()),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(bbox[keep_idx].reshape(-1), pa.float32()), 4
                ),
                pa.array(np.zeros(len(keep_idx), dtype=bool)),
                pa.array([""] * len(keep_idx), pa.string()),
                pa.array(nspans_np[pk], pa.int32()),
                pa.array(np.array(doc_types, dtype=object)[pk], pa.string()),
                pa.array(buckets_per_page[pk], pa.int32()),
            ],
            schema=CHUNK_WITH_BUCKET_SCHEMA,
        )

        # blank pages: pages with zero kept blocks -> sentinel rows
        kept_counts = np.bincount(pk, minlength=n_pages) if len(pk) else np.zeros(
            n_pages, dtype=np.int64
        )
        blank_pages = np.flatnonzero(kept_counts == 0)
        if len(blank_pages):
            bp = blank_pages
            blank_tbl = pa.Table.from_arrays(
                [
                    pa.array(np.array(doc_ids, dtype=object)[bp], pa.string()),
                    pa.array(part_np[bp], pa.int32()),
                    pa.array(pagerel_np[bp], pa.int32()),
                    pa.array(np.zeros(len(bp), np.int32)),
                    pa.array([BLANK_KIND] * len(bp), pa.string()),
                    pa.array([""] * len(bp), pa.string()),
                    pa.array([""] * len(bp), pa.string()),
                    pa.array(
                        [f"{doc_ids[j]}-{offsets_np[j]:05d}-blank" for j in bp],
                        pa.string(),
                    ),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(
                            np.tile([0.0, 0.0, 1.0, 1.0], len(bp)), pa.float32()
                        ),
                        4,
                    ),
                    pa.array(np.zeros(len(bp), dtype=bool)),
                    pa.array([""] * len(bp), pa.string()),
                    pa.array(nspans_np[bp], pa.int32()),
                    pa.array(np.array(doc_types, dtype=object)[bp], pa.string()),
                    pa.array(buckets_per_page[bp], pa.int32()),
                ],
                schema=CHUNK_WITH_BUCKET_SCHEMA,
            )
            chunk_tbl = pa.concat_tables([chunk_tbl, blank_tbl])
        return chunk_tbl


# Per-worker-process cache for the TASK-based parse stage (same rationale
# as stages/fused.py:_FUSED_CACHE): the default worker pool persists
# across dataset executions, so parser state warms once per process while
# an actor pool cold-starts on every run. Keyed by the frozen config.
_VEC_PARSE_CACHE: dict = {}


def vec_parse_batch(batch: pa.Table, config: "EngineConfig") -> pa.Table:
    parser = _VEC_PARSE_CACHE.get(config)
    if parser is None:
        parser = _VEC_PARSE_CACHE.setdefault(config, VecLayoutParseActor(config))
    return parser(batch)
