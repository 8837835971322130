"""Ranking operators: top-k per group and exact heavy hitters.

Both avoid shuffling raw rows:

  - ``top_orders_per_segment`` moves at most (groups x k) rows per batch
    through the exchange — a per-batch local top-k is a valid partial for
    a global top-k because the global winners are winners in their batch;
  - ``heavy_hitter_tokens`` is the two-pass exact heavy-hitters scheme:
    pass 1 builds a MERGEABLE truncated-counter summary per batch
    (exact batch counts compressed Misra-Gries-style: subtract the
    (capacity+1)-th largest count, keep positives — error <= n_b/(cap+1),
    errors add under merge, so any token with global frequency above the
    threshold is guaranteed to survive); pass 2 broadcasts the candidate
    set and EXACTLY recounts only those tokens. Summaries merge through
    a distributed groupby — the driver sees only the candidate set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from agentic_doc_ray.context import partitions_for, shuffle_partitions
from agentic_doc_ray.functions._exchange import str_key_sentinels
from agentic_doc_ray.functions.text import _regex_trim


def top_orders_per_segment(
    sf_dir: str, k: int = 3, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Top-k orders by o_totalprice per market segment (deterministic
    tie-break: price desc, orderkey asc).

    Customer scales with SF, so it is never collected on the driver
    (VERDICT r02 #4). Exchange 1 buckets BOTH sides by
    ``custkey & (n_buckets-1)``; orders are pre-reduced per batch to the
    top-k per custkey (valid partial: all of a custkey's orders share one
    segment, so a segment winner is a winner among its own custkey's
    orders). Each bucket joins custkey -> segment with Arrow Table.join
    and emits its per-segment top-k — so exchange 2 sees at most
    ``segments x k x n_buckets`` rows before the final selection.
    Inner-join semantics: orders without a customer row are dropped
    (matches the SQL oracle)."""
    from agentic_doc_ray.functions._exchange import int_key_sentinels, str_key_sentinels

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    n_rows = orders.count()  # metadata-only; sizes the exchange width
    out_schema = pa.schema(
        [
            ("c_mktsegment", pa.string()),
            ("o_orderkey", pa.int64()),
            ("o_totalprice", pa.float64()),
        ]
    )
    if orders.count() == 0:  # metadata-only; zero-row shuffle guard
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "rank": pa.array([], pa.int64()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_totalprice": pa.array([], pa.float64()),
                }
            )
        )

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("custkey", pa.int64()),
            ("side", pa.string()),
            ("segment", pa.string()),
            ("o_orderkey", pa.int64()),
            ("o_totalprice", pa.float64()),
        ]
    )

    def _bucket(key) -> "pa.Array":
        return pc.cast(
            pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
        )

    def tag_customer(batch: pa.Table) -> pa.Table:
        key = batch.column("c_custkey")
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["c"] * batch.num_rows, pa.string()),
                batch.column("c_mktsegment"),
                pa.nulls(batch.num_rows, pa.int64()),
                pa.nulls(batch.num_rows, pa.float64()),
            ],
            schema=ex_schema,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        # per-(batch, custkey) top-k partial — pandas groupby.head runs in C
        df = batch.select(["o_orderkey", "o_custkey", "o_totalprice"]).to_pandas()
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        df = df.groupby("o_custkey", sort=False).head(k)
        key = pa.array(df["o_custkey"].to_numpy(), pa.int64())
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["o"] * len(df), pa.string()),
                pa.nulls(len(df), pa.string()),
                pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
                pa.array(df["o_totalprice"].to_numpy(), pa.float64()),
            ],
            schema=ex_schema,
        )

    def topk_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_cust = pc.equal(g.column("side"), "c")
        cust = (
            g.filter(is_cust)
            .select(["custkey", "segment"])
            .rename_columns(["custkey", "c_mktsegment"])
        )
        ords = g.filter(pc.invert(is_cust)).select(
            ["custkey", "o_orderkey", "o_totalprice"]
        )
        if cust.num_rows == 0 or ords.num_rows == 0:
            return out_schema.empty_table()
        df = (
            ords.join(cust, keys="custkey", join_type="inner")
            .select(["c_mktsegment", "o_orderkey", "o_totalprice"])
            .to_pandas()
        )
        df = df.sort_values(
            ["c_mktsegment", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        df = df.groupby("c_mktsegment", sort=False).head(k)
        return pa.Table.from_pandas(df, schema=out_schema, preserve_index=False)

    def final(group):
        # drop the NUL-prefixed string sentinels guarding exchange 2
        g = group[~group["c_mktsegment"].str.startswith("\x00")]
        if g.empty:
            import pandas as pd

            return pd.DataFrame(
                {
                    "c_mktsegment": pd.Series([], dtype=object),
                    "rank": pd.Series([], dtype="int64"),
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "o_totalprice": pd.Series([], dtype="float64"),
                }
            )
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.index + 1
        return g[["c_mktsegment", "rank", "o_orderkey", "o_totalprice"]]

    unioned = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(customer.map_batches(tag_customer, batch_format="pyarrow"))
        .union(int_key_sentinels(ex_schema, "bucket", fill={"side": "sent"}))
    )
    per_bucket = unioned.groupby(
        "bucket", num_partitions=partitions_for(n_rows)
    ).map_groups(topk_bucket, batch_format="pyarrow")
    return (
        # topk_bucket emits zero-row blocks for sentinel-only buckets, the
        # exact empty-first-block shape _exchange.py documents — guard it
        per_bucket.union(
            str_key_sentinels(
                out_schema, "c_mktsegment", fill={"o_orderkey": -1, "o_totalprice": 0.0}
            )
        )
        .groupby("c_mktsegment", num_partitions=shuffle_partitions(4))
        .map_groups(final, batch_format="pandas")
    )

def _token_units(batch: pa.Table) -> "pa.Array":
    """Whitespace tokens of a batch, flattened (tokenization parity with
    the heavy-hitter SQL oracles: trim then split on \\s+)."""
    trimmed = _regex_trim(batch.column("text"))
    nonempty = pc.not_equal(trimmed, "")
    toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    return (
        toks.combine_chunks().flatten()
        if isinstance(toks, pa.ChunkedArray)
        else toks.flatten()
    )


def _word_ngram_units(batch: pa.Table, n: int) -> "pa.Array":
    """Space-joined word n-grams of a batch, flattened; windows never
    cross a document boundary. Vectorized: one take per window offset
    over the flat token array + one binary_join_element_wise."""
    trimmed = _regex_trim(batch.column("text"))
    nonempty = pc.not_equal(trimmed, "")
    toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    if len(lens) == 0:
        return pa.array([], pa.string())
    offs = np.concatenate((np.zeros(1, np.int64), np.cumsum(lens)))
    n_wins = np.maximum(lens - n + 1, 0)
    total = int(n_wins.sum())
    if total == 0:
        return pa.array([], pa.string())
    win_offs = np.concatenate((np.zeros(1, np.int64), np.cumsum(n_wins)))
    pos = np.arange(total, dtype=np.int64) - np.repeat(win_offs[:-1], n_wins)
    starts = np.repeat(offs[:-1], n_wins) + pos
    cols = [pc.take(flat, pa.array(starts + j, pa.int64())) for j in range(n)]
    return pc.binary_join_element_wise(*cols, " ")


def _heavy_hitter_units(
    docs: "ray.data.Dataset",
    extract,
    unit_col: str,
    num: int,
    den: int,
    capacity: int,
) -> "ray.data.Dataset":
    """EXACT units occurring in >= num/den of all unit positions — the
    shared Misra-Gries + exact-recount core behind
    ``heavy_hitter_tokens`` (num/1000) and ``heavy_hitter_ngrams``
    (num/1e6; n-gram frequencies sit orders of magnitude below token
    frequencies, so they need the finer unit).

    Guarantee: the pass-1 merged summary undercounts any unit by at most
    n_total/(capacity+1); candidates are kept down to
    threshold - n_total/(capacity+1), so the candidate set is a superset
    of the true answer whenever capacity+1 > den/num. Pass 2 recounts
    candidates exactly, so the output has no approximation.

    Merge topology: per-batch summaries materialize once (summary-sized),
    merge through a distributed groupby, and only the CANDIDATE units
    ever reach the driver — O(heavy hitters), not O(batches x capacity).
    """
    if capacity + 1 <= den // max(num, 1):
        raise ValueError("capacity must exceed den/num for exactness")

    def summarize(batch: pa.Table) -> pa.Table:
        flat = extract(batch)
        n_batch = len(flat)
        g = (
            pa.Table.from_arrays([flat], names=[unit_col])
            .group_by(unit_col)
            .aggregate([(unit_col, "count")])
            .rename_columns([unit_col, "n"])
        )
        counts = np.asarray(g.column("n").combine_chunks())
        if len(counts) > capacity:
            # Misra-Gries compression of exact counts: subtract the
            # (capacity+1)-th largest, drop non-positives.
            cut = np.partition(counts, len(counts) - capacity - 1)[
                len(counts) - capacity - 1
            ]
            adj = counts - cut
            keep = adj > 0
            g = pa.Table.from_arrays(
                [g.column(unit_col).combine_chunks().filter(pa.array(keep)),
                 pa.array(adj[keep])],
                names=[unit_col, "n"],
            )
        total_row = pa.Table.from_pydict(
            {unit_col: pa.array([None], pa.string()),
             "n": pa.array([n_batch], pa.int64())}
        )
        return pa.concat_tables(
            [g.set_column(1, "n", g.column("n").cast(pa.int64())), total_row]
        )

    # summaries are materialized once (capacity rows per batch — summary-
    # sized, never unit occurrences) and merged DISTRIBUTED: the driver
    # only ever sees the candidate set, not per-batch counters
    partials = docs.map_batches(summarize, batch_format="pyarrow").materialize()
    n_total = sum(
        r["n"]
        for r in partials.map_batches(
            lambda b: b.filter(pc.is_null(b.column(unit_col))).select(["n"]),
            batch_format="pyarrow",
        ).take_all()
    )
    empty = pa.Table.from_pydict(
        {unit_col: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if n_total == 0:  # no units anywhere: empty answer, skip the shuffle
        return ray.data.from_arrow(empty)
    threshold = max(1, -(-n_total * num // den))  # ceil
    slack = n_total // (capacity + 1)
    cutoff = max(1, threshold - slack)
    _sum_schema = pa.schema([(unit_col, pa.string()), ("n", pa.int64())])
    merged = (
        partials.map_batches(
            lambda b: b.filter(pc.is_valid(b.column(unit_col))),
            batch_format="pyarrow",
        )
        # filtering map_batches can emit zero-row blocks (a batch of only
        # total rows) — the empty-first-block shape _exchange.py documents.
        # Sentinels are inert: Sum leaves them at n=0 < cutoff (>= 1).
        .union(str_key_sentinels(_sum_schema, unit_col, fill={"n": 0}))
        # candidate rows are bounded by capacity x blocks (kB-scale), so a
        # narrow exchange: width follows the summary size, not the corpus
        .groupby(unit_col, num_partitions=shuffle_partitions(8))
        .aggregate(Sum("n", alias_name="n"))
    )
    cand_rows = merged.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("n"), pa.scalar(cutoff))
        ).select([unit_col]),
        batch_format="pyarrow",
    ).take_all()
    candidates = pa.array([r[unit_col] for r in cand_rows], pa.string())
    if len(candidates) == 0:
        # empty candidate set would feed a zero-row shuffle (Ray crashes);
        # the exact answer is definitionally empty
        return ray.data.from_arrow(empty)
    cand_ref = ray.put(candidates)

    def recount(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        flat = extract(batch)
        hits = flat.filter(pc.is_in(flat, value_set=cand))
        g = (
            pa.Table.from_arrays([hits], names=[unit_col])
            .group_by(unit_col)
            .aggregate([(unit_col, "count")])
            .rename_columns([unit_col, "n"])
        )
        return g.set_column(1, "n", g.column("n").cast(pa.int64()))

    agg = (
        docs.map_batches(recount, batch_format="pyarrow")
        # a batch with no candidate hits emits a zero-row block; guard the
        # merge like pass 1 (sentinels die on the threshold filter, >= 1)
        .union(str_key_sentinels(_sum_schema, unit_col, fill={"n": 0}))
        .groupby(unit_col, num_partitions=shuffle_partitions(4))
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), pa.scalar(threshold))),
        batch_format="pyarrow",
    )


def heavy_hitter_tokens(
    docs: "ray.data.Dataset", per_mille: int = 1, capacity: int = 4000
) -> "ray.data.Dataset":
    """EXACT tokens occurring in >= per_mille/1000 of all token positions
    (Misra-Gries summaries + exact recount; see ``_heavy_hitter_units``)."""
    return _heavy_hitter_units(
        docs, _token_units, "token", per_mille, 1000, capacity
    )


def heavy_hitter_ngrams(
    docs: "ray.data.Dataset",
    n: int = 3,
    per_million: int = 200,
    capacity: int = 8192,
) -> "ray.data.Dataset":
    """EXACT word n-grams occurring in >= per_million/1e6 of all n-gram
    windows — the wimbd-style most-common-n-grams corpus probe, with the
    same no-approximation guarantee as ``heavy_hitter_tokens`` (the MG
    candidate superset is recounted exactly). Windows never cross
    document boundaries; gram identity is the literal space-joined text."""
    import functools

    return _heavy_hitter_units(
        docs,
        functools.partial(_word_ngram_units, n=n),
        "ngram",
        per_million,
        1_000_000,
        capacity,
    )
