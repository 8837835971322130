"""agentic_doc_ray — a Ray-Data-native document-extraction engine.

A from-scratch reimplementation of the query/data-processing semantics of
``skalingclouds/agentic-doc`` (reference at /root/reference, see SURVEY.md),
expressed as idiomatic Ray Data pipelines:

    read corpus (doc_id, spans)                # Lance when available, else Parquet
      -> explode spans to page rows            # vectorized pyarrow map_batches
      -> HTML boilerplate strip                # stateless map_batches, compiled regexes
      -> layout parse + chunk classify         # actor pool (warm heuristics/models)
      -> groupby(doc_id) ordered reassembly    # THE shuffle: sort by (part_idx,page,block)
      -> write partitioned parquet + manifest  # resumable

The reference defines the *contract* (chunk taxonomy ``common.py:22-26``,
split semantics ``utils.py:214-264``, merge/rebase ``parse.py:597-629``,
never-throw error placeholders ``parse.py:722-739``); the parser internals are
local deterministic heuristics (the reference's parser is a remote API).
"""

from agentic_doc_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
