"""Fused explode -> html-strip -> layout-parse stage (one actor hop).

The unfused pipeline ships the exploded PAGE rows (a ~16x row blow-up over
corpus rows, with full page text) through the object store between the
explode/strip task operator and the parse actor pool. On the sandbox host
that per-task IPC is the scaling bottleneck (BASELINE.md); fusing the three
stages into the parse actor's ``__call__`` removes two operator boundaries
and the entire page-row intermediate — corpus rows in, chunk rows (with the
reassembly bucket key) out.

Semantics are EXACTLY the composed stages — this class literally calls
them in sequence; parity with the unfused path is pinned in
tests/test_pipeline.py.
"""

from __future__ import annotations

import pyarrow as pa

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.stages.explode import explode_spans
from agentic_doc_ray.stages.html_strip import strip_html_batch


class FusedParseActor:
    """Corpus-row batches -> chunk rows, fusing explode/strip/parse."""

    def __init__(
        self, config: EngineConfig = DEFAULT_CONFIG, local_reassembly: bool = False
    ):
        if config.parse_impl == "vectorized":
            from agentic_doc_ray.stages.layout_parse_vec import VecLayoutParseActor

            self._parser = VecLayoutParseActor(config)
        else:
            from agentic_doc_ray.stages.layout_parse import LayoutParseActor

            self._parser = LayoutParseActor(config)
        self.config = config
        self.local_reassembly = local_reassembly

    def __call__(self, batch: pa.Table) -> pa.Table:
        pages = explode_spans(batch, self.config)
        pages = strip_html_batch(pages)
        chunks = self._parser(pages)
        if not self.local_reassembly:
            return chunks
        # ZERO-SHUFFLE reassembly: a corpus ROW carries its whole document
        # (rows are atomic under batch slicing), so every doc's parts are
        # co-located in this batch by construction and the merge runs
        # locally — the textbook "data already partitioned by the key"
        # optimization. Per-doc size is bounded by the input contract
        # (config.mega_doc_spans); page-row-shaped inputs must use the
        # bucketed exchange instead (fuse_stages=False).
        from agentic_doc_ray.stages.reassemble import merge_bucket_group

        return merge_bucket_group(chunks, self.config)


# Per-worker-process cache for the TASK-based fused stage: Ray's default
# worker pool persists across dataset executions, so the parser state warms
# once per process — unlike an actor pool, which is torn down and cold-
# started (~2 s x pool size) on every pipeline run. Keyed by config (frozen
# dataclass) so differently-configured pipelines don't share state.
_FUSED_CACHE: dict = {}


def fused_parse_batch(batch: pa.Table, config: EngineConfig) -> pa.Table:
    actor = _FUSED_CACHE.get(config)
    if actor is None:
        actor = _FUSED_CACHE.setdefault(
            config, FusedParseActor(config, local_reassembly=True)
        )
    return actor(batch)
