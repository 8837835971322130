"""Engine configuration.

Mirrors the reference's ``ParseConfig`` / ``Settings`` surface
(``/root/reference/agentic_doc/config.py:22-43,85-148``) for the knobs that
still make sense in a Ray-Data engine. Validation bounds copied from the
reference: ``split_size`` in (0, 100] (``utils.py:229-231``,
``config.py:123-128``).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    """Per-pipeline configuration, passed explicitly to every stage.

    Unlike the reference (module-level settings snapshot at import time,
    the known wart at ``parse.py:742``), config is an explicit value so Ray
    workers all see the same snapshot.
    """

    # --- reference-parity knobs -------------------------------------------
    split_size: int = 10          # pages per part; reference default 10, (0,100]
    include_marginalia: bool = True
    include_metadata_in_markdown: bool = True
    # Infra retries (reference: tenacity, <=3 attempts, parse.py:743-750).
    # APPLICATION errors never retry — they become error rows (the
    # never-throw contract); these retries cover worker/actor death only,
    # which is safe because every UDF is a pure function of its batch.
    max_retries: int = 3
    # Transient-download retry ladder (connector/URL fetch — the engine's
    # only remote I/O): reference tenacity params (parse.py:743-750) and
    # per-attempt logging style (utils.py:267-291, config.py:104-118).
    max_retry_wait_time: int = 60
    retry_logging_style: str = "log_msg"  # log_msg | inline_block | none
    # "vectorized": Arrow-kernel parser (2.3x at production batch sizes);
    # "reference": the per-page spec implementation (textparse) — identical
    # output, enforced by parity tests.
    parse_impl: str = "vectorized"
    # Fuse explode->strip->parse into ONE actor stage (corpus rows in,
    # chunks out): removes the 16x page-row intermediate through the object
    # store and two operator boundaries — the measured IPC bottleneck at
    # high CPU counts. False = the unfused 3-operator pipeline (parity
    # reference, pinned equal by tests).
    fuse_stages: bool = True
    # Run the fused stage as an ACTOR POOL (parse_concurrency) instead of
    # cached tasks. Default False: the current parser state is cheap and
    # actor pools cold-start on every dataset execution; flip to True when
    # the stage holds a genuinely expensive model (the north_star's
    # warm-model actor-pool shape — load in __init__, amortized per actor).
    fused_use_actors: bool = False

    # --- Ray execution knobs ----------------------------------------------
    # Autoscaling actor pool (min, max): a FIXED pool that reserves every CPU
    # starves the all-to-all (repartition/sort/groupby) operators and the
    # pipeline deadlocks — min must leave slack for the shuffle stages.
    parse_concurrency: int | tuple[int, int] = (1, 16)
    # Batch sizes bound task granularity: the fused explode->strip->parse
    # operator creates one task per batch, so batches must be small enough
    # to fan out across the cluster (5000-row batches = 5 tasks = 5 busy
    # cores, measured). 256 corpus rows ~= 1-2k span rows per task.
    parse_batch_size: int = 256                    # rows per parse batch
    explode_batch_size: int = 256                  # corpus rows per explode batch
    # Bucket count for the bucketed reassembly exchange (crc32(doc_id) % B).
    # None -> 64. Size to >= cluster cores; each bucket is one merge task.
    reassemble_num_partitions: int | None = None

    # --- synthesis knobs (deterministic fixtures) -------------------------
    seed: int = 42
    mega_doc_modulus: int = 1000   # doc_id % modulus == modulus-1 -> mega doc (skew fixture)
    mega_doc_spans: int = 200

    def __post_init__(self) -> None:
        if not (0 < self.split_size <= 100):
            raise ValueError("split_size must be in (0, 100]")
        from agentic_doc_ray.retry import RETRY_LOGGING_STYLES

        if self.retry_logging_style not in RETRY_LOGGING_STYLES:
            raise ValueError(
                f"Invalid retry logging style: {self.retry_logging_style}"
            )


DEFAULT_CONFIG = EngineConfig()


# Reference Settings env-var names (config.py:85-148) -> EngineConfig fields.
_ENV_MAP = {
    "SPLIT_SIZE": ("split_size", int),
    "MAX_RETRIES": ("max_retries", int),
    "MAX_RETRY_WAIT_TIME": ("max_retry_wait_time", int),
    "RETRY_LOGGING_STYLE": ("retry_logging_style", str),
    "BATCH_SIZE": ("parse_batch_size", int),
    "INCLUDE_MARGINALIA": ("include_marginalia", lambda v: v.lower() in ("1", "true", "yes")),
    "INCLUDE_METADATA_IN_MARKDOWN": (
        "include_metadata_in_markdown",
        lambda v: v.lower() in ("1", "true", "yes"),
    ),
    # MAX_WORKERS caps the parse actor pool (reference: per-doc thread pool)
    "MAX_WORKERS": ("parse_concurrency", lambda v: (1, max(1, int(v)))),
}


def settings_from_env(environ: dict | None = None) -> EngineConfig:
    """Build an EngineConfig from reference-named env vars (Settings
    parity, ref config.py:85-148 — BATCH_SIZE, SPLIT_SIZE, MAX_RETRIES,
    MAX_WORKERS...). Explicit-config remains the primary surface (env
    snapshots at import time were the reference's known wart); this adapter
    exists so reference users' environment keeps working. Unknown vars are
    ignored; values go through EngineConfig's validation."""
    import os

    env = os.environ if environ is None else environ
    kwargs = {}
    for var, (field, conv) in _ENV_MAP.items():
        if var in env and env[var] != "":
            kwargs[field] = conv(env[var])
    return EngineConfig(**kwargs)
