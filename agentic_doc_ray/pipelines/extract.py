"""The flagship extraction pipeline (SURVEY.md §3.4).

    read corpus -> explode pages -> strip html -> layout-parse (actor pool)
      -> groupby(doc_id) reassemble -> parsed docs [-> flat spans]

Everything streams: no stage materializes the dataset; the only all-to-all
exchange is the final groupby(doc_id). Batch formats are pyarrow end to end
(zero-copy from the object store).
"""

from __future__ import annotations

import ray.data

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.stages.explode import explode_spans, flatten_parsed
from agentic_doc_ray.stages.html_strip import strip_html_batch
from agentic_doc_ray.stages.layout_parse import LayoutParseActor
from agentic_doc_ray.stages.reassemble import reassemble


def read_corpus(path: str) -> "ray.data.Dataset":
    """Read the interleaved corpus table.

    TableIO seam (SURVEY.md §7.0): ``read_lance`` when the Lance bindings are
    importable, else Parquet with the identical Arrow schema. Both columns
    are needed downstream, so no projection is pruned here.
    """
    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path)
    except ImportError:
        return ray.data.read_parquet(path)


def extract_corpus(
    corpus: "ray.data.Dataset", config: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """corpus (doc_id, spans) -> parsed documents (PARSED_DOC_SCHEMA)."""
    # Empty input -> empty output without running the shuffle: Ray's hash
    # shuffle aggregator raises ArrowInvalid on zero input rows, and count()
    # on the raw input is metadata-only (no execution of the pipeline).
    if corpus.count() == 0:
        from agentic_doc_ray.schema import PARSED_DOC_SCHEMA

        return ray.data.from_arrow(PARSED_DOC_SCHEMA.empty_table())
    if config.fuse_stages:
        from agentic_doc_ray.stages.fused import FusedParseActor, fused_parse_batch

        # Corpus rows carry whole documents, so the fused stage merges each
        # doc locally and NO reassembly exchange runs at all (fused.py).
        if config.fused_use_actors:
            # warm-model actor-pool shape (expensive state loads once per
            # actor in __init__)
            return corpus.map_batches(
                FusedParseActor,
                fn_constructor_kwargs={"config": config, "local_reassembly": True},
                batch_format="pyarrow",
                batch_size=config.explode_batch_size,
                concurrency=config.parse_concurrency,
                zero_copy_batch=True,
                max_task_retries=config.max_retries,
                max_restarts=config.max_retries,
            )
        # Task-based default: parser state is cheap and cached per worker
        # process, and the default worker pool persists across executions —
        # an actor pool cold-starts on every run.
        return corpus.map_batches(
            fused_parse_batch,
            fn_kwargs={"config": config},
            batch_format="pyarrow",
            batch_size=config.explode_batch_size,
            zero_copy_batch=True,
            max_retries=config.max_retries,
        )
    pages = corpus.map_batches(
        explode_spans,
        fn_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=config.explode_batch_size,
        zero_copy_batch=True,
    )
    pages = pages.map_batches(
        strip_html_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    if config.parse_impl == "vectorized":
        from agentic_doc_ray.stages.layout_parse_vec import VecLayoutParseActor

        parser_cls = VecLayoutParseActor
    else:
        parser_cls = LayoutParseActor
    chunks = pages.map_batches(
        parser_cls,
        fn_constructor_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=config.parse_batch_size,
        concurrency=config.parse_concurrency,
        zero_copy_batch=True,
        # infra-failure retries only (UDFs are pure; app errors are rows)
        max_task_retries=config.max_retries,
        max_restarts=config.max_retries,
    )
    return reassemble(chunks, config)


def extract_flat_spans(
    corpus: "ray.data.Dataset", config: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """Full pipeline, then explode the parsed docs to flat span rows."""
    parsed = extract_corpus(corpus, config)
    return parsed.map_batches(
        flatten_parsed, batch_format="pyarrow", zero_copy_batch=True
    )
