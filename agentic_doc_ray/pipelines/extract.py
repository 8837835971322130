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


_ADAPTIVE_SENTINEL_PREFIX = "\x00sr"
_N_ADAPTIVE_SENTINELS = 128  # covers both exchanges for 2..9 partitions
                             # (pinned by tests/test_graph.py)


def _adaptive_sentinel_chunks(n_buckets: int) -> "ray.data.Dataset":
    """Chunk-schema sentinel rows guarding the mega-doc branch's exchanges
    against Ray's empty-first-block schema-broadcast loss (the branch is
    fed by a filtering map_batches — see functions/_exchange.py). Each
    sentinel is a legal one-chunk document whose doc_id carries a NUL
    prefix no real corpus id can have; they ride through both merge
    phases as (fake) parsed docs and are dropped after reassembly.
    Phase 1 partitions on the explicit (bucket, part_range) columns —
    bucket = i covers them; phase 2 re-keys on crc32(doc_id) % b, which
    the 128 distinct ids also cover (both pinned against Ray's own
    hash_partition)."""
    import zlib

    import numpy as np
    import pyarrow as pa

    from agentic_doc_ray.stages.layout_parse_vec import CHUNK_WITH_BUCKET_SCHEMA

    n = _N_ADAPTIVE_SENTINELS
    ids = [f"{_ADAPTIVE_SENTINEL_PREFIX}{i:04d}" for i in range(n)]
    t = pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array(np.zeros(n, np.int32)),  # part_idx -> part_range 0
            pa.array(np.zeros(n, np.int32)),  # page_rel
            pa.array(np.zeros(n, np.int32)),  # block_idx
            pa.array(["text"] * n, pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array([f"{d}-00000-00" for d in ids], pa.string()),
            pa.FixedSizeListArray.from_arrays(
                pa.array(np.tile([0.0, 0.0, 1.0, 1.0], n), pa.float32()), 4
            ),
            pa.array(np.zeros(n, bool)),
            pa.array([""] * n, pa.string()),
            pa.array(np.ones(n, np.int32)),  # n_spans
            pa.array(["pdf"] * n, pa.string()),
            pa.array(np.arange(n, dtype=np.int32)),  # bucket: phase-1 coverage
        ],
        schema=CHUNK_WITH_BUCKET_SCHEMA,
    )
    return ray.data.from_arrow(t)


def extract_corpus_adaptive(
    corpus: "ray.data.Dataset",
    config: EngineConfig = DEFAULT_CONFIG,
    span_threshold: int | None = None,
) -> "ray.data.Dataset":
    """Size-aware routing (north-star: "size-aware repartitioning splits
    mega-PDFs across blocks"): documents at or under ``span_threshold``
    spans take the fused ZERO-exchange path; oversized documents explode
    to page rows and reassemble through the salted TWO-PHASE exchange
    (``reassemble_two_phase``), so no single task parses — and no single
    reducer merges — a whole pathological document.

    The input is scanned twice (one filter per branch); at production
    scale the router predicate would be pushed to a span-count statistics
    column so each branch prunes row groups at the read. Output equals
    ``extract_corpus`` row-for-row (pinned by tests), including when
    either branch is empty — the mega branch's exchanges are sentinel-
    guarded, so an all-small corpus runs them on 128 sentinel rows only.

    A cheap pre-scan (per-batch max of the span-list LENGTHS — offsets
    only, no span payloads) skips the mega branch entirely when no
    document exceeds the threshold: the common all-small corpus then pays
    one length scan instead of two cold aggregator-fleet spawns for
    sentinel-only exchanges (~3.8 s of pure exchange floor at sf0.1).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from agentic_doc_ray.schema import PARSED_DOC_SCHEMA
    from agentic_doc_ray.stages.fused import fused_parse_batch
    from agentic_doc_ray.stages.layout_parse_vec import vec_parse_batch
    from agentic_doc_ray.stages.reassemble import reassemble_two_phase

    thr = int(span_threshold if span_threshold is not None else config.mega_doc_spans)
    if corpus.count() == 0:
        return ray.data.from_arrow(PARSED_DOC_SCHEMA.empty_table())

    def batch_max_spans(batch: pa.Table) -> pa.Table:
        m = pc.max(pc.list_value_length(batch.column("spans"))).as_py()
        return pa.table({"m": pa.array([int(m or 0)], pa.int64())})

    from agentic_doc_ray.context import scalar_agg

    max_spans = (
        scalar_agg(
            corpus.map_batches(
                batch_max_spans, batch_format="pyarrow", zero_copy_batch=True
            ),
            "m",
            "max",
        )
        or 0
    )

    def small_only(batch: pa.Table) -> pa.Table:
        lens = pc.list_value_length(batch.column("spans"))
        return batch.filter(pc.less_equal(lens, thr))

    def big_only(batch: pa.Table) -> pa.Table:
        lens = pc.list_value_length(batch.column("spans"))
        return batch.filter(pc.greater(lens, thr))

    small_parsed = corpus.map_batches(
        small_only, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        fused_parse_batch,
        fn_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=config.explode_batch_size,
        zero_copy_batch=True,
        max_retries=config.max_retries,
    )

    if max_spans <= thr:
        # no mega documents anywhere: the fused plan IS the whole answer
        return small_parsed

    pages = corpus.map_batches(
        big_only, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        explode_spans,
        fn_kwargs={"config": config},
        batch_format="pyarrow",
        # mega docs: small batches so one task never holds many mega rows
        batch_size=max(1, config.explode_batch_size // 64),
        zero_copy_batch=True,
    )
    pages = pages.map_batches(
        strip_html_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    # task-based parse with a per-worker warm cache (not an actor pool):
    # the mega branch usually carries few documents, and an actor pool
    # cold-starts (~2 s x pool size) on every dataset execution
    chunks = pages.map_batches(
        vec_parse_batch,
        fn_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=config.parse_batch_size,
        zero_copy_batch=True,
        max_retries=config.max_retries,
    )
    b = config.reassemble_num_partitions or 64
    guarded = chunks.union(_adaptive_sentinel_chunks(b))
    big_parsed = reassemble_two_phase(guarded, config)

    def drop_sentinels(batch: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.starts_with(batch.column("doc_id"), pattern="\x00")
        )
        return batch.filter(keep)

    big_parsed = big_parsed.map_batches(
        drop_sentinels, batch_format="pyarrow", zero_copy_batch=True
    )
    return small_parsed.union(big_parsed)


def extract_flat_spans(
    corpus: "ray.data.Dataset", config: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """Full pipeline, then explode the parsed docs to flat span rows."""
    parsed = extract_corpus(corpus, config)
    return parsed.map_batches(
        flatten_parsed, batch_format="pyarrow", zero_copy_batch=True
    )
