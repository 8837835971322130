"""Composed end-to-end curation pipeline: quality gate -> exact dedup ->
token pricing, fused into a single streaming plan.

Real curation runs (Gopher, RefinedWeb, FineWeb) are compositions — a
quality rule set gates documents, the survivors are exact-deduplicated,
and what remains is priced in tokens for mixture planning. Each stage
exists in this repo as a standalone operator (text.gopher_quality_flags,
dedup.dedup_keep, text.token_counts); this module chains them WITHOUT
materializing between stages and without re-reading or re-shipping
document text:

  stage 1 (map_batches, batch-local): Gopher flags -> filter keep==1 ->
      md5 the surviving text -> emit slim (bucket, h, doc_id, n_tokens)
      key rows. n_words from the Gopher pass IS the repo-wide whitespace
      token count, so pricing costs nothing extra. Text never leaves
      this stage.
  stage 2 (ONE bucketed exchange): per-bucket first-occurrence keep
      (min doc_id per content hash), emitting (doc_id, n_tokens).

Total exchange payload: one ~50-byte key row per SURVIVING doc — at
100 TB the shuffle moves hashes, never documents. The quality filter can
empty whole blocks (a batch of boilerplate), so the exchange unions the
standard covering sentinels against Ray's empty-first-block schema race
(see functions/_exchange.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import partitions_for, shuffle_partitions
from agentic_doc_ray.functions.dedup import _N_DEDUP_BUCKETS
from agentic_doc_ray.functions.text import (
    _GOPHER_STOPWORDS,
    gopher_quality_flags_batch,
)

_KEY_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("h", pa.string()),
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)


def _gate_and_key(
    batch: pa.Table, stopwords: tuple[str, ...] = _GOPHER_STOPWORDS
) -> pa.Table:
    """Gopher gate + content hash in one pass over the batch."""
    flags = gopher_quality_flags_batch(batch, stopwords=stopwords)
    mask = pc.cast(pc.equal(flags.column("keep"), 1), pa.bool_())
    surv = batch.filter(mask)
    toks = flags.filter(mask).column("n_words")
    h = [
        hashlib.md5((t or "").encode()).hexdigest()
        for t in surv.column("text").to_pylist()
    ]
    bucket = pa.array(
        [int(x[:4], 16) % _N_DEDUP_BUCKETS for x in h], pa.int32()
    )
    return pa.Table.from_arrays(
        [bucket, pa.array(h, pa.string()), surv.column("doc_id"), toks],
        schema=_KEY_SCHEMA,
    )


def _keep_first(group: pa.Table) -> pa.Table:
    """Min-doc_id row per content hash (sentinel rows carry doc_id=-1)."""
    group = group.filter(pc.greater_equal(group.column("doc_id"), 0))
    if group.num_rows == 0:
        return pa.Table.from_pydict(
            {"doc_id": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64())}
        )
    keepers = (
        group.select(["h", "doc_id"])
        .group_by("h")
        .aggregate([("doc_id", "min")])
        .rename_columns(["h", "keeper"])
    )
    joined = group.join(keepers, keys="h", join_type="inner")
    kept = joined.filter(
        pc.equal(joined.column("doc_id"), joined.column("keeper"))
    )
    return kept.select(["doc_id", "n_tokens"])


def curation_keep(
    docs: "ray.data.Dataset",
    stopwords: tuple[str, ...] = _GOPHER_STOPWORDS,
    n_rows_hint: int | None = None,
) -> "ray.data.Dataset":
    """(doc_id, n_tokens) for every document that passes the full Gopher
    rule set (with the given stopword inventory) AND is the first
    occurrence (min doc_id) of its exact content among the survivors.

    ``n_rows_hint`` (an upper bound on input rows, e.g. the parquet
    metadata count) sizes the exchange width by data volume instead of
    the cluster-wide cap — see ``context.partitions_for``."""
    import functools

    from agentic_doc_ray.functions._exchange import int_key_sentinels

    keyed = docs.map_batches(
        functools.partial(_gate_and_key, stopwords=stopwords),
        batch_format="pyarrow",
    )
    sentinels = int_key_sentinels(
        _KEY_SCHEMA, "bucket", fill={"h": "", "doc_id": -1, "n_tokens": 0}
    )
    np_ = (
        partitions_for(n_rows_hint) if n_rows_hint else shuffle_partitions()
    )
    return (
        keyed.union(sentinels)
        .groupby("bucket", num_partitions=np_)
        .map_groups(_keep_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# The full curation DAG as one composed, oracle-checked plan
# ---------------------------------------------------------------------------

_DAG_KEY_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("h", pa.string()),
        ("doc_id", pa.int64()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)
_DAG_SRC_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("doc_id", pa.int64()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)
_DAG_POS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("hk", pa.uint64()),
        ("doc_id", pa.int64()),
        ("source", pa.string()),
        ("n_tokens", pa.int64()),
    ]
)


def curation_pipeline(
    docs: "ray.data.Dataset",
    stopwords: tuple[str, ...] = _GOPHER_STOPWORDS,
    cap_tokens: int = 800,
    shard_size: int = 32,
    seed: int = 42,
    n_shard_buckets: int = 64,
    n_rows_hint: int | None = None,
) -> "ray.data.Dataset":
    """The WHOLE curation DAG, one streaming plan: Gopher quality gate ->
    exact-dedup first-occurrence keep -> per-source token cap (best-first)
    -> seeded-shuffle shard assignment. Output: one row per surviving doc
    (doc_id, source, n_tokens, shard_id) — exactly what a pretraining
    export writes, end-to-end oracle-checkable as a single SQL statement.

    Three key-only exchanges; document text never leaves stage 1:

      1. bucket(md5(text)): gate + first-occurrence keep (per-bucket
         group-min), carrying (source, n_chars, n_tokens) key columns;
      2. bucket(hash(source)): vectorized segmented per-source cumsum,
         keep while the source's running total <= cap_tokens;
      3. bucket(fib_hash(doc_id) >> 58): global shuffle positions via the
         shuffle_positions machinery (per-bucket counts -> driver prefix,
         <= n_shard_buckets integers), shard_id = position // shard_size.

    Stages 2 and 3 consume map_groups output (which re-emits empty
    partitions), so both exchanges union covering sentinels against
    Ray's empty-first-block schema race (functions/_exchange.py)."""
    import zlib

    from agentic_doc_ray.functions._exchange import int_key_sentinels
    from agentic_doc_ray.functions.scans import _shuffle_hash

    # --- stage 1: gate + content hash + first-occurrence keep -------------
    def gate_key(batch: pa.Table) -> pa.Table:
        flags = gopher_quality_flags_batch(batch, stopwords=stopwords)
        mask = pc.cast(pc.equal(flags.column("keep"), 1), pa.bool_())
        surv = batch.filter(mask)
        toks = flags.filter(mask).column("n_words")
        h = [
            hashlib.md5((t or "").encode()).hexdigest()
            for t in surv.column("text").to_pylist()
        ]
        bucket = pa.array(
            [int(x[:4], 16) % _N_DEDUP_BUCKETS for x in h], pa.int32()
        )
        return pa.Table.from_arrays(
            [
                bucket,
                pa.array(h, pa.string()),
                surv.column("doc_id"),
                surv.column("source"),
                surv.column("n_chars"),
                toks,
            ],
            schema=_DAG_KEY_SCHEMA,
        )

    def keep_first(group: pa.Table) -> pa.Table:
        group = group.filter(pc.greater_equal(group.column("doc_id"), 0))
        if group.num_rows == 0:
            out_schema = pa.schema(
                [f for f in _DAG_SRC_SCHEMA if f.name != "bucket"]
            )
            return pa.Table.from_pydict(
                {f.name: pa.array([], f.type) for f in out_schema},
                schema=out_schema,
            )
        keepers = (
            group.select(["h", "doc_id"])
            .group_by("h")
            .aggregate([("doc_id", "min")])
            .rename_columns(["h", "keeper"])
        )
        j = group.join(keepers, keys="h", join_type="inner")
        kept = j.filter(pc.equal(j.column("doc_id"), j.column("keeper")))
        return kept.select(["doc_id", "source", "n_chars", "n_tokens"])

    np_ = (
        partitions_for(n_rows_hint) if n_rows_hint else shuffle_partitions()
    )
    deduped = (
        docs.map_batches(gate_key, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                _DAG_KEY_SCHEMA,
                "bucket",
                fill={"h": "", "doc_id": -1, "source": "",
                      "n_chars": 0, "n_tokens": 0},
            )
        )
        .groupby("bucket", num_partitions=np_)
        .map_groups(keep_first, batch_format="pyarrow")
    )

    # --- stage 2: per-source token cap, best-first ------------------------
    def src_key(batch: pa.Table) -> pa.Table:
        enc = batch.column("source").combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        ub = np.array(
            [zlib.crc32(u.encode()) % 64 for u in uniq], np.int32
        ) if uniq else np.zeros(0, np.int32)
        bucket = pa.array(
            ub[enc.indices.to_numpy(zero_copy_only=False)], pa.int32()
        )
        return pa.Table.from_arrays(
            [
                bucket,
                batch.column("doc_id"),
                batch.column("source"),
                batch.column("n_chars"),
                batch.column("n_tokens"),
            ],
            schema=_DAG_SRC_SCHEMA,
        )

    def cap_scan(group: pa.Table) -> pa.Table:
        group = group.filter(pc.greater_equal(group.column("doc_id"), 0))
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("source", pa.string()),
             ("n_tokens", pa.int64())]
        )
        if group.num_rows == 0:
            return pa.Table.from_pydict(
                {"doc_id": [], "source": [], "n_tokens": []}, schema=out_schema
            )
        order = pc.sort_indices(
            group,
            sort_keys=[("source", "ascending"), ("n_chars", "descending"),
                       ("doc_id", "ascending")],
        )
        g = group.take(order)
        toks = g.column("n_tokens").to_numpy(zero_copy_only=False)
        src = g.column("source").to_numpy(zero_copy_only=False)
        cs = np.cumsum(toks)
        starts = np.ones(len(src), dtype=bool)
        starts[1:] = src[1:] != src[:-1]
        seg = np.cumsum(starts) - 1
        base = (cs[starts] - toks[starts])[seg]
        kept = g.filter(pa.array((cs - base) <= cap_tokens))
        return kept.select(["doc_id", "source", "n_tokens"]).cast(out_schema)

    capped = (
        deduped.map_batches(src_key, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                _DAG_SRC_SCHEMA,
                "bucket",
                fill={"doc_id": -1, "source": "", "n_chars": 0, "n_tokens": 0},
            )
        )
        .groupby("bucket", num_partitions=np_)
        .map_groups(cap_scan, batch_format="pyarrow")
        .materialize()  # consumed twice below (counts pass + shard exchange)
    )

    # --- stage 3: seeded shuffle order -> shard ids -----------------------
    shift = 64 - int(np.log2(n_shard_buckets))

    def pos_key(batch: pa.Table) -> pa.Table:
        hk = _shuffle_hash(batch.column("doc_id").combine_chunks(), seed)
        return pa.Table.from_arrays(
            [
                pa.array((hk >> shift).astype(np.int32)),
                pa.array(hk, pa.uint64()),
                batch.column("doc_id"),
                batch.column("source"),
                batch.column("n_tokens"),
            ],
            schema=_DAG_POS_SCHEMA,
        )

    keyed = capped.map_batches(pos_key, batch_format="pyarrow").materialize()
    counts = keyed.map_batches(
        lambda b: b.select(["bucket"]).group_by("bucket").aggregate(
            [("bucket", "count")]
        ).rename_columns(["bucket", "n"]),
        batch_format="pyarrow",
    ).take_all()
    per_bucket: dict[int, int] = {}
    for r in counts:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n"]
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b]
    off_ref = ray.put(offsets)

    def shard_bucket(group: pa.Table) -> pa.Table:
        group = group.filter(pc.greater_equal(group.column("doc_id"), 0))
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("source", pa.string()),
             ("n_tokens", pa.int64()), ("shard_id", pa.int64())]
        )
        if group.num_rows == 0:
            return pa.Table.from_pydict(
                {"doc_id": [], "source": [], "n_tokens": [], "shard_id": []},
                schema=out_schema,
            )
        offs = ray.get(off_ref)
        order = pc.sort_indices(
            group, sort_keys=[("hk", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        base = offs[int(g.column("bucket")[0].as_py())]
        pos = np.arange(g.num_rows, dtype=np.int64) + base
        return pa.Table.from_arrays(
            [
                g.column("doc_id"),
                g.column("source"),
                g.column("n_tokens"),
                pa.array(pos // shard_size),
            ],
            schema=out_schema,
        )

    return (
        keyed.union(
            int_key_sentinels(
                _DAG_POS_SCHEMA,
                "bucket",
                fill={"hk": 0, "doc_id": -1, "source": "", "n_tokens": 0},
            )
        )
        # survivor count is exact here (the offsets pass summed it)
        .groupby("bucket", num_partitions=partitions_for(acc))
        .map_groups(shard_bucket, batch_format="pyarrow")
    )


def domain_scorecard(
    docs: "ray.data.Dataset",
    stopwords: tuple[str, ...] = _GOPHER_STOPWORDS,
) -> "ray.data.Dataset":
    """Per-domain quality scorecard: for every ``source``, how many docs,
    how many pass the full Gopher gate, and total/alpha word volume — the
    decision table a curation run consults before cutting whole domains
    (the RefinedWeb/DCLM per-domain triage step).

    Shape: the Gopher rules run batch-locally (integer cross-multiplied
    flags, zero shuffle), each batch reduces to one partial row per source
    it touches, and ONE tiny exchange (key space = domain cardinality)
    sums the partials. Document text never shuffles; the exchange carries
    four int64 counters per (batch, source).
    """
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        flags = gopher_quality_flags_batch(
            batch.select(["doc_id", "text"]), stopwords=stopwords
        )
        t = pa.Table.from_arrays(
            [
                batch.column("source"),
                pc.cast(flags.column("keep"), pa.int64()),
                pc.cast(flags.column("n_words"), pa.int64()),
                pc.cast(flags.column("n_alpha_words"), pa.int64()),
            ],
            names=["source", "keep", "n_words", "n_alpha_words"],
        )
        g = t.group_by("source").aggregate(
            [("keep", "count"), ("keep", "sum"), ("n_words", "sum"),
             ("n_alpha_words", "sum")]
        )
        return g.rename_columns(
            ["source", "n_docs", "n_keep", "n_words", "n_alpha_words"]
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source", num_partitions=shuffle_partitions(4))
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_keep", alias_name="n_keep"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_alpha_words", alias_name="n_alpha_words"),
        )
    )


def _rekey_index_rows(batch: pa.Table) -> pa.Table:
    """Recompute the md5-prefix bucket for bare (h, doc_id, n_tokens)
    index rows (the bucket column is dropped across the id anti-join)."""
    hs = batch.column("h").to_pylist()
    bucket = pa.array(
        [int(x[:4], 16) % _N_DEDUP_BUCKETS for x in hs], pa.int32()
    )
    return pa.Table.from_arrays(
        [
            bucket,
            batch.column("h"),
            batch.column("doc_id"),
            batch.column("n_tokens"),
        ],
        schema=_KEY_SCHEMA,
    )


def incremental_curation_keep(
    v1: "ray.data.Dataset",
    v2: "ray.data.Dataset",
    stopwords: tuple[str, ...] = _GOPHER_STOPWORDS,
    n_rows_hint: int | None = None,
) -> "ray.data.Dataset":
    """``curation_keep(v2)`` computed INCREMENTALLY across crawl
    snapshots: the expensive per-document work (Gopher gate, tokenize,
    content md5) runs only on the delta (added + changed docs); the
    prior snapshot's (h, doc_id, n_tokens) keep-index is maintained with
    key-row algebra (one id anti-join) and the winner rule re-resolves
    per content hash. Output is EXACTLY the full recompute over v2 —
    the oracle is the composed curation SQL over the v2 view, the
    strongest check an incremental pipeline can have (same contract as
    ``incremental_token_counts``).

    The 100-TB motivation: a daily crawl changes ~1% of documents. Here
    the full-corpus touches are (a) the fingerprint pass inside
    ``snapshot_diff`` (16-byte counter rows per doc, never text through
    an exchange), (b) the delta semi-join, which moves v2's rows once
    through a bucketed exchange to select the delta (the flagship-merge
    ~1x-bytes budget class; a production crawler hands the delta over as
    its own feed and skips this hop) and (c) the prior index maintenance
    (key rows only) — in production the prior index is the checkpoint
    written by the last run (``state/manifest``), modeled here by gating
    v1 in place (that modeling cost is absent when the checkpoint is
    read back).

    Correctness of the winner rule under edits: alive-prior rows are
    exactly v2's unchanged docs (identical content, so their v1 gate
    verdict and token count still hold); delta rows are gated on their
    v2 content; the union is one gate row per v2 document, so min-id per
    content hash over the union IS the full-recompute rule — including
    the subtle transitions (a smaller id editing INTO a kept doc's
    content dethrones it; a duplicate editing AWAY restores the loser).
    """
    import functools

    from agentic_doc_ray.functions._exchange import int_key_sentinels
    from agentic_doc_ray.functions.delta import (
        anti_join_ids,
        semi_join_ids,
        snapshot_diff,
    )

    np_delta = partitions_for(2 * n_rows_hint) if n_rows_hint else None
    # materialize: the diff is O(delta) rows and feeds BOTH id sets — a
    # lazy dataset would re-execute the fingerprint exchange per consumer
    diff = snapshot_diff(v1, v2, num_partitions=np_delta).materialize()

    def _ids(*changes):
        vs = pa.array(list(changes), pa.string())

        def f(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column("change"), value_set=vs)
            return batch.filter(m).select(["doc_id"])

        return diff.map_batches(f, batch_format="pyarrow")

    gate_ids = _ids("added", "changed")
    dead_ids = _ids("removed", "changed")

    gate = functools.partial(_gate_and_key, stopwords=stopwords)
    delta_keyed = semi_join_ids(
        v2, gate_ids, num_partitions=np_delta
    ).map_batches(gate, batch_format="pyarrow")
    # prior state: in production, read back from the previous run's
    # checkpoint; modeled by gating v1 (same rows bit-for-bit)
    prior_keyed = v1.map_batches(gate, batch_format="pyarrow").map_batches(
        lambda b: b.select(["h", "doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    alive_prior = anti_join_ids(
        prior_keyed, dead_ids, num_partitions=np_delta
    ).map_batches(_rekey_index_rows, batch_format="pyarrow")

    sentinels = int_key_sentinels(
        _KEY_SCHEMA, "bucket", fill={"h": "", "doc_id": -1, "n_tokens": 0}
    )
    np_ = (
        partitions_for(n_rows_hint) if n_rows_hint else shuffle_partitions()
    )
    return (
        delta_keyed.union(alive_prior)
        .union(sentinels)
        .groupby("bucket", num_partitions=np_)
        .map_groups(_keep_first, batch_format="pyarrow")
    )
