"""Per-column table profiling — the data-quality / schema-drift gate.

Every ingestion pipeline fronts its tables with a profile pass (row
count, null count, exact distinct cardinality, numeric range per
column — the Deequ/TFDV-style contract check) before the expensive
stages run; at crawl scale the profile also feeds partitioning choices
(distinct counts size bucket fan-outs). One operator profiles every
column of a table in a single plan:

  1. counting partials (n, n_null, and min/max for integer-valued
     columns — timestamps profile as epoch micros) fold batch-locally
     into ONE row per (batch, column): a tiny driver-side merge,
     exactly the _dim_micro_sums collect shape;
  2. exact distinct cardinality per column via one (column, value-key)
     exchange: each batch emits its LOCAL distinct keys only, buckets
     count their share of the global distincts (a disjoint partition of
     the key space), and a kilobyte per-(bucket, column) count table
     folds driver-side. The exchange payload is bounded by the DISTINCT
     mass per batch, never the row count.

Value keys canonicalize by TYPE, not by print format: integers and
timestamps key as int64, doubles normalize -0.0 -> +0.0 and key by
bit pattern (repr-free, exact), strings key as themselves — so the
cardinality equals SQL COUNT(DISTINCT) without any float-printing
parity games. Output: (column, n, n_null, n_distinct, min_i64,
max_i64), the range columns null for non-integer types.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import partitions_for
from agentic_doc_ray.functions._exchange import int_key_sentinels

_N_BUCKETS = 64

_KEY_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("column", pa.string()),
        ("vkey", pa.string()),
        ("side", pa.string()),
    ]
)
_OUT_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n", pa.int64()),
        ("n_null", pa.int64()),
        ("n_distinct", pa.int64()),
        ("min_i64", pa.int64()),
        ("max_i64", pa.int64()),
    ]
)


def _value_keys(col: "pa.ChunkedArray") -> np.ndarray:
    """Canonical string keys of the NON-NULL values (type-aware, see
    module doc)."""
    t = col.type
    valid = col.drop_null()
    if pa.types.is_integer(t):
        v = valid.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return v.astype("U21").astype(object)
    if pa.types.is_timestamp(t):
        v = valid.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return v.astype("U21").astype(object)
    if pa.types.is_floating(t):
        v = valid.cast(pa.float64()).to_numpy(zero_copy_only=False) + 0.0
        return (
            np.char.mod("%d", v.view(np.int64)).astype(object)
        )
    return np.asarray(valid.cast(pa.string()).to_pandas(), dtype=object)


def table_profile(sf_dir: str, table: str) -> pa.Table:
    """(column, n, n_null, n_distinct, min_i64, max_i64) for every
    column of ``{sf_dir}/{table}.parquet`` (see module doc)."""
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet")
    n_rows = ds.count()
    np_ = partitions_for(n_rows)

    def count_partials(batch: pa.Table) -> pa.Table:
        rows = []
        for name in batch.schema.names:
            col = batch.column(name)
            t = col.type
            mn = mx = None
            if pa.types.is_integer(t) or pa.types.is_timestamp(t):
                as_i = col.cast(pa.int64())
                mn = pc.min(as_i).as_py()
                mx = pc.max(as_i).as_py()
            rows.append(
                {
                    "column": name,
                    "n": batch.num_rows,
                    "n_null": col.null_count,
                    "min_i64": mn,
                    "max_i64": mx,
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("column", pa.string()),
                    ("n", pa.int64()),
                    ("n_null", pa.int64()),
                    ("min_i64", pa.int64()),
                    ("max_i64", pa.int64()),
                ]
            ),
        )

    counts: dict[str, list] = {}
    for r in ds.map_batches(count_partials, batch_format="pyarrow").take_all():
        c = counts.setdefault(r["column"], [0, 0, None, None])
        c[0] += int(r["n"])
        c[1] += int(r["n_null"])
        for i, (cur, new, f) in enumerate(
            [(c[2], r["min_i64"], min), (c[3], r["max_i64"], max)], start=2
        ):
            if new is not None:
                c[i] = new if cur is None else f(cur, new)

    def distinct_keys(batch: pa.Table) -> pa.Table:
        cols: list[np.ndarray] = []
        names: list[np.ndarray] = []
        for name in batch.schema.names:
            k = np.unique(_value_keys(batch.column(name)))
            cols.append(k)
            names.append(np.full(len(k), name, dtype=object))
        if not cols:
            return _KEY_SCHEMA.empty_table()
        vk = np.concatenate(cols)
        nm = np.concatenate(names)
        h = pd.util.hash_array(nm + "\x1f" + vk)
        return pa.Table.from_arrays(
            [
                pa.array((h % _N_BUCKETS).astype(np.int32)),
                pa.array(nm, pa.string()),
                pa.array(vk, pa.string()),
                pa.array(["v"] * len(vk), pa.string()),
            ],
            schema=_KEY_SCHEMA,
        )

    def bucket_counts(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        if g.num_rows == 0:
            return pa.schema(
                [("column", pa.string()), ("cnt", pa.int64())]
            ).empty_table()
        d = (
            g.select(["column", "vkey"])
            .group_by(["column", "vkey"])
            .aggregate([])
        )
        return (
            d.group_by("column")
            .aggregate([("vkey", "count")])
            .rename_columns(["column", "cnt"])
        )

    distinct: dict[str, int] = {}
    for r in (
        ds.map_batches(distinct_keys, batch_format="pyarrow")
        .union(int_key_sentinels(_KEY_SCHEMA, "bucket", fill={"side": "s"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(bucket_counts, batch_format="pyarrow")
        .take_all()
    ):
        distinct[r["column"]] = distinct.get(r["column"], 0) + int(r["cnt"])

    out = [
        {
            "column": name,
            "n": c[0],
            "n_null": c[1],
            "n_distinct": distinct.get(name, 0),
            "min_i64": c[2],
            "max_i64": c[3],
        }
        for name, c in sorted(counts.items())
    ]
    return pa.Table.from_pylist(out, schema=_OUT_SCHEMA)


# ---------------------------------------------------------------------------
# referential integrity (FK -> PK) audit
# ---------------------------------------------------------------------------

_FK_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("key", pa.int64()),
        ("n_rows", pa.int64()),
        ("side", pa.string()),  # 'c' child partial / 'p' parent key / 's'
    ]
)
_FK_MULTI_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("key", pa.int64()),
        ("n_rows", pa.int64()),
        ("side", pa.string()),  # 'c' child partial / 'p' parent key / 's'
        ("fk", pa.string()),  # edge name, carried through the exchange
    ]
)
_FK_OUT = pa.schema(
    [
        ("fk", pa.string()),
        ("n_child_rows", pa.int64()),
        ("n_violating_rows", pa.int64()),
        ("n_violating_keys", pa.int64()),
    ]
)


def fk_violations_tables(
    tables: "list[tuple[ray.data.Dataset, list[tuple[str, str, int]]]]",
    edge_names: list[str],
    n_buckets: int = _N_BUCKETS,
    n_rows_hint: int = 1 << 19,
) -> "ray.data.Dataset":
    """Referential-integrity audit of MANY FK edges with ONE read per
    table and ONE exchange total. ``tables`` is a list of
    (dataset, specs) where each spec ``(col, side, edge_id)`` says this
    table plays ``side`` ('c' child / 'p' parent) for edge ``edge_id``
    through column ``col`` — so a fact table audited on two FKs is read
    once, and a dimension parenting two edges ships its keys from one
    scan. Rows are bucketed by ``edge_id * n_buckets + (key & mask)`` so
    every group holds exactly one edge's one key range.

    Per edge, same semantics as ``fk_violations``: child ships per-batch
    (key, n_rows) partials, parent ships batch-local distinct keys, a
    vectorized ``is_in`` per bucket emits one summary row, and a tiny
    name-keyed merge sums them. NULLs are not violations.

    Why this exists: the per-edge composition (4x ``fk_violations``
    unioned) paid each branch's read + pipeline start-up serially —
    13.7 s at sf0.1 where this shape runs the same audit in ~6 s, with
    the fact table scanned once instead of once per FK."""
    from ray.data.aggregate import Sum

    np_ = partitions_for(n_rows_hint)
    mask = np.int64(n_buckets - 1)

    def make_tag(specs: "list[tuple[str, str, int]]"):
        def tag(batch: pa.Table) -> pa.Table:
            outs = []
            for col, side, edge_id in specs:
                if side == "c":
                    t = (
                        batch.select([col])
                        .drop_null()
                        .group_by(col)
                        .aggregate([(col, "count")])
                        .rename_columns(["key", "n_rows"])
                    )
                    n_rows = t.column("n_rows").cast(pa.int64())
                else:
                    t = (
                        batch.select([col]).drop_null().group_by(col).aggregate([])
                    )
                    t = t.rename_columns(["key"])
                    n_rows = pa.array(np.zeros(t.num_rows, np.int64))
                key = t.column("key").cast(pa.int64())
                bucket = pc.add(
                    pc.bit_wise_and(key, pa.scalar(mask)),
                    pa.scalar(np.int64(edge_id * n_buckets)),
                )
                outs.append(
                    pa.Table.from_arrays(
                        [
                            pc.cast(bucket, pa.int32()),
                            key,
                            n_rows,
                            pa.array([side] * t.num_rows, pa.string()),
                            pa.array(
                                [edge_names[edge_id]] * t.num_rows, pa.string()
                            ),
                        ],
                        schema=_FK_MULTI_SCHEMA,
                    )
                )
            return pa.concat_tables(outs)

        return tag

    def resolve(group: pa.Table) -> pa.Table:
        side = group.column("side")
        child_part = group.filter(pc.equal(side, "c"))
        if child_part.num_rows == 0:
            return _FK_OUT.empty_table()
        name = child_part.column("fk")[0].as_py()
        pk = group.filter(pc.equal(side, "p")).column("key").combine_chunks()
        ck = (
            child_part.select(["key", "n_rows"])
            .group_by("key")
            .aggregate([("n_rows", "sum")])
            .rename_columns(["key", "n_rows"])
        )
        hit = pc.is_in(ck.column("key"), value_set=pk)
        bad = ck.filter(pc.invert(hit))
        return pa.Table.from_pylist(
            [
                {
                    "fk": name,
                    "n_child_rows": int(pc.sum(ck.column("n_rows")).as_py() or 0),
                    "n_violating_rows": int(
                        pc.sum(bad.column("n_rows")).as_py() or 0
                    ),
                    "n_violating_keys": bad.num_rows,
                }
            ],
            schema=_FK_OUT,
        )

    streams = [
        ds.map_batches(make_tag(specs), batch_format="pyarrow")
        for ds, specs in tables
    ]
    tagged = streams[0]
    for s in streams[1:]:
        tagged = tagged.union(s)
    per_bucket = (
        tagged.union(
            int_key_sentinels(_FK_MULTI_SCHEMA, "bucket", fill={"side": "s"})
        )
        .groupby("bucket", num_partitions=np_)
        .map_groups(resolve, batch_format="pyarrow")
    )
    return per_bucket.groupby("fk", num_partitions=2).aggregate(
        Sum("n_child_rows", alias_name="n_child_rows"),
        Sum("n_violating_rows", alias_name="n_violating_rows"),
        Sum("n_violating_keys", alias_name="n_violating_keys"),
    )


def fk_violations(
    child: "ray.data.Dataset",
    fk_col: str,
    parent: "ray.data.Dataset",
    pk_col: str,
    name: str,
    n_buckets: int = _N_BUCKETS,
    n_rows_hint: int | None = None,
) -> "ray.data.Dataset":
    """Referential-integrity audit of one FK edge: how many child rows
    (and distinct child keys) reference a key absent from the parent —
    the Deequ/dbt-test `relationships` check, the gate that catches
    partial loads and orphaned facts before a join silently drops them.

    Scale shape: the child side ships per-batch (key, n_rows) PARTIALS
    (bounded by distinct keys per batch, not rows), the parent ships
    batch-local distinct keys only; ONE hash(key) bucket exchange
    resolves membership with a vectorized ``is_in`` per bucket and emits
    one summary row per bucket. Nothing scales with table size on the
    driver. NULL child keys are not violations (SQL FK semantics)."""
    np_ = partitions_for(
        n_rows_hint if n_rows_hint is not None else child.count()
    )
    mask = np.int64(n_buckets - 1)

    def tag_child(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([fk_col])
            .drop_null()
            .group_by(fk_col)
            .aggregate([(fk_col, "count")])
            .rename_columns(["key", "n_rows"])
        )
        key = t.column("key").cast(pa.int64())
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(key, pa.scalar(mask)), pa.int32()),
                key,
                t.column("n_rows").cast(pa.int64()),
                pa.array(["c"] * t.num_rows, pa.string()),
            ],
            schema=_FK_SCHEMA,
        )

    def tag_parent(batch: pa.Table) -> pa.Table:
        t = batch.select([pk_col]).drop_null().group_by(pk_col).aggregate([])
        key = t.column(pk_col).cast(pa.int64())
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(key, pa.scalar(mask)), pa.int32()),
                key,
                pa.array(np.zeros(t.num_rows, np.int64)),
                pa.array(["p"] * t.num_rows, pa.string()),
            ],
            schema=_FK_SCHEMA,
        )

    def resolve(group: pa.Table) -> pa.Table:
        side = group.column("side")
        child_part = group.filter(pc.equal(side, "c"))
        if child_part.num_rows == 0:
            return _FK_OUT.empty_table()
        pk = group.filter(pc.equal(side, "p")).column("key").combine_chunks()
        # fold the per-batch child partials to per-key totals first
        ck = (
            child_part.select(["key", "n_rows"])
            .group_by("key")
            .aggregate([("n_rows", "sum")])
            .rename_columns(["key", "n_rows"])
        )
        hit = pc.is_in(ck.column("key"), value_set=pk)
        bad = ck.filter(pc.invert(hit))
        return pa.Table.from_pylist(
            [
                {
                    "fk": name,
                    "n_child_rows": int(
                        pc.sum(ck.column("n_rows")).as_py() or 0
                    ),
                    "n_violating_rows": int(
                        pc.sum(bad.column("n_rows")).as_py() or 0
                    ),
                    "n_violating_keys": bad.num_rows,
                }
            ],
            schema=_FK_OUT,
        )

    from ray.data.aggregate import Sum

    per_bucket = (
        child.map_batches(tag_child, batch_format="pyarrow")
        .union(parent.map_batches(tag_parent, batch_format="pyarrow"))
        .union(int_key_sentinels(_FK_SCHEMA, "bucket", fill={"side": "s"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(resolve, batch_format="pyarrow")
    )
    return per_bucket.groupby("fk", num_partitions=2).aggregate(
        Sum("n_child_rows", alias_name="n_child_rows"),
        Sum("n_violating_rows", alias_name="n_violating_rows"),
        Sum("n_violating_keys", alias_name="n_violating_keys"),
    )


def referential_integrity_check(sf_dir: str) -> "ray.data.Dataset":
    """The schema's FK audit in one result table: every declared FK edge
    of the TPC-H-ish star (lineitem→orders, lineitem→part,
    orders→customer, events→customer) checked with ``fk_violations``;
    one row per edge with child-row and violation counts. On clean data
    every violation count is exactly 0 — and the oracle pins that, so a
    loader regression that orphans keys flips the gate."""

    def rd(table: str, cols: list[str]) -> "ray.data.Dataset":
        return ray.data.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=cols
        )

    return fk_violations_tables(
        [
            # fact tables read ONCE, auditing every FK they carry
            (
                rd("lineitem", ["l_orderkey", "l_partkey"]),
                [("l_orderkey", "c", 0), ("l_partkey", "c", 1)],
            ),
            (
                rd("orders", ["o_orderkey", "o_custkey"]),
                [("o_orderkey", "p", 0), ("o_custkey", "c", 2)],
            ),
            (rd("part", ["p_partkey"]), [("p_partkey", "p", 1)]),
            (
                rd("customer", ["c_custkey"]),
                [("c_custkey", "p", 2), ("c_custkey", "p", 3)],
            ),
            (rd("events", ["user_id"]), [("user_id", "c", 3)]),
        ],
        [
            "lineitem.l_orderkey->orders.o_orderkey",
            "lineitem.l_partkey->part.p_partkey",
            "orders.o_custkey->customer.c_custkey",
            "events.user_id->customer.c_custkey",
        ],
    )


# ---------------------------------------------------------------------------
# dataset card (single-pass corpus summary)
# ---------------------------------------------------------------------------

_CARD_SCHEMA = pa.schema([("metric", pa.string()), ("value", pa.int64())])
_CARD_EX_SCHEMA = pa.schema(
    [("g", pa.int32()), ("metric", pa.string()), ("value", pa.int64())]
)


def dataset_card(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """The corpus summary every dataset card leads with, in ONE streaming
    pass: (metric, value) rows — n_docs, n_chars, n_tokens, min/max doc
    length, mean_chars_x100, and one ``docs:<source>`` row per source.

    Scale shape: per-batch partials are a handful of metric rows (plus
    one per distinct source in the batch); ONE tiny constant-key exchange
    folds them with per-metric merge rules (sum for counts, min/max for
    extremes) — all metrics land in one group because the mean derives
    from two of the sums. The merge task handles batches x ~(5+sources)
    two-field rows — kilobytes per million batches; nothing proportional
    to corpus size anywhere, nothing on the driver."""
    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions._exchange import int_key_sentinels
    from agentic_doc_ray.functions.text import _token_count

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        chars = pc.utf8_length(batch.column("text")).cast(pa.int64())
        toks = _token_count(batch.column("text"))
        rows = [
            ("sum:n_docs", n),
            ("sum:n_chars", int(pc.sum(chars).as_py() or 0)),
            ("sum:n_tokens", int(pc.sum(toks).as_py() or 0)),
        ]
        if n:
            rows.append(("min:min_chars", int(pc.min(chars).as_py())))
            rows.append(("max:max_chars", int(pc.max(chars).as_py())))
        g = (
            pa.Table.from_arrays([batch.column("source")], names=["source"])
            .group_by("source")
            .aggregate([("source", "count")])
        )
        for s, c in zip(
            g.column("source").to_pylist(), g.column("source_count").to_pylist()
        ):
            rows.append((f"sum:docs:{s}", int(c)))
        return pa.Table.from_pylist(
            [{"g": 0, "metric": m, "value": v} for m, v in rows],
            schema=_CARD_EX_SCHEMA,
        )

    def merge(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("metric"), ""))
        if g.num_rows == 0:
            return _CARD_SCHEMA.empty_table()
        out: dict[str, int] = {}
        for m, v in zip(
            g.column("metric").to_pylist(), g.column("value").to_pylist()
        ):
            rule, name = m.split(":", 1)
            if name not in out:
                out[name] = v
            elif rule == "sum":
                out[name] += v
            elif rule == "min":
                out[name] = min(out[name], v)
            else:
                out[name] = max(out[name], v)
        if "n_docs" in out and "n_chars" in out and out["n_docs"]:
            out["mean_chars_x100"] = 100 * out["n_chars"] // out["n_docs"]
        return pa.Table.from_pylist(
            [{"metric": k, "value": v} for k, v in sorted(out.items())],
            schema=_CARD_SCHEMA,
        )

    partials = docs.map_batches(partial, batch_format="pyarrow")
    return (
        partials.union(
            int_key_sentinels(_CARD_EX_SCHEMA, "g", fill={"metric": "", "value": 0})
        )
        .groupby("g", num_partitions=shuffle_partitions(2))
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# rollup (GROUPING SETS) counts
# ---------------------------------------------------------------------------

_ROLLUP_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("lang", pa.string()),
        ("n_docs", pa.int64()),
        ("n_chars", pa.int64()),
    ]
)


def rollup_counts(docs: "ray.data.Dataset") -> pa.Table:
    """GROUPING SETS in one pass: doc/char counts at every rollup level —
    (source, lang), (source, ALL), (ALL, lang), (ALL, ALL) — the OLAP
    cube slice a mixture dashboard reads, marked with the literal 'ALL'.

    Shape: ONLY the finest level shuffles (per-batch (source, lang)
    partials through one tiny ``groupby().aggregate()``); the coarser
    levels are derived from the finest table, which is bounded by
    ``|sources| x |langs|`` — a group-cardinality collect, never a row
    collect (the nation-broadcast precedent)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [
                batch.column("source"),
                batch.column("lang"),
                pc.utf8_length(batch.column("text")).cast(pa.int64()),
            ],
            names=["source", "lang", "n_chars"],
        )
        g = t.group_by(["source", "lang"]).aggregate(
            [("n_chars", "count"), ("n_chars", "sum")]
        )
        return g.rename_columns(["source", "lang", "n_docs", "n_chars"])

    fine = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"], num_partitions=shuffle_partitions(4))
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
        )
    )
    blocks = [
        b for b in _ray.get(fine.materialize().to_arrow_refs()) if b.num_rows
    ]
    if not blocks:
        return _ROLLUP_SCHEMA.empty_table()
    t = pa.concat_tables(blocks).combine_chunks()
    rows: dict[tuple[str, str], list[int]] = {}
    for r in t.to_pylist():
        for key in [
            (r["source"], r["lang"]),
            (r["source"], "ALL"),
            ("ALL", r["lang"]),
            ("ALL", "ALL"),
        ]:
            c = rows.setdefault(key, [0, 0])
            c[0] += int(r["n_docs"])
            c[1] += int(r["n_chars"])
    out = sorted((s, l, c[0], c[1]) for (s, l), c in rows.items())
    return pa.Table.from_pydict(
        {
            "source": pa.array([r[0] for r in out], pa.string()),
            "lang": pa.array([r[1] for r in out], pa.string()),
            "n_docs": pa.array([r[2] for r in out], pa.int64()),
            "n_chars": pa.array([r[3] for r in out], pa.int64()),
        }
    )


def source_common_prefix(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-source longest common prefix of ALL documents (the template
    header / boilerplate-prefix detector for crawl sources): exact via
    the lexicographic min/max trick — the common prefix of a string SET
    equals the common prefix of its lexicographic min and max, and
    min/max are mergeable aggregates, so the exchange carries two
    strings per source per batch, never documents.

    Output: (source, n_docs, prefix_len, prefix) — prefix truncated to
    64 chars for the report (length is exact)."""
    from ray.data.aggregate import Max, Min, Sum

    from agentic_doc_ray.context import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["source", "text"])
            .group_by("source")
            .aggregate([("text", "min"), ("text", "max"), ("text", "count")])
        )
        return g.rename_columns(["source", "mn", "mx", "n"])

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source", num_partitions=shuffle_partitions(4))
        .aggregate(
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
            Sum("n", alias_name="n_docs"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        # rows here are source-bounded; the per-row loop is over sources
        rows = []
        for r in batch.to_pylist():
            a, b = r["mn"] or "", r["mx"] or ""
            lim = min(len(a), len(b))
            i = 0
            while i < lim and a[i] == b[i]:
                i += 1
            rows.append(
                {
                    "source": r["source"],
                    "n_docs": int(r["n_docs"]),
                    "prefix_len": i,
                    "prefix": a[: min(i, 64)],
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("source", pa.string()),
                    ("n_docs", pa.int64()),
                    ("prefix_len", pa.int64()),
                    ("prefix", pa.string()),
                ]
            ),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def source_common_suffix(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-source longest common document SUFFIX (the footer /
    copyright-boilerplate detector): ``source_common_prefix``'s min/max
    identity applied to the REVERSED strings — reversal happens once per
    batch (Arrow kernel), only two reversed strings per source per batch
    move. Output suffix is reported right-side-out (last <= 64 chars)."""
    from ray.data.aggregate import Max, Min, Sum

    from agentic_doc_ray.context import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.utf8_reverse(batch.column("text"))
        t = pa.Table.from_arrays(
            [batch.column("source"), rev], names=["source", "rt"]
        )
        g = (
            t.group_by("source")
            .aggregate([("rt", "min"), ("rt", "max"), ("rt", "count")])
        )
        return g.rename_columns(["source", "mn", "mx", "n"])

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source", num_partitions=shuffle_partitions(4))
        .aggregate(
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
            Sum("n", alias_name="n_docs"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            a, b = r["mn"] or "", r["mx"] or ""
            lim = min(len(a), len(b))
            i = 0
            while i < lim and a[i] == b[i]:
                i += 1
            rows.append(
                {
                    "source": r["source"],
                    "n_docs": int(r["n_docs"]),
                    "suffix_len": i,
                    "suffix": a[: min(i, 64)][::-1],
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("source", pa.string()),
                    ("n_docs", pa.int64()),
                    ("suffix_len", pa.int64()),
                    ("suffix", pa.string()),
                ]
            ),
        )

    return agg.map_batches(finish, batch_format="pyarrow")
