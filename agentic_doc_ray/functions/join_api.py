"""Generic distributed hash join with automatic broadcast routing.

The TPC-H pipelines in ``joins.py`` hand-build each join shape for its
specific predicate pushdowns; this module is the general-purpose surface
a user reaches for when no specialized shape applies:

    hash_join(left, right, left_on="o_custkey", right_on="c_custkey",
              how="inner")

Routing (decided once, from the RIGHT side's row count):

  * ``right.count() <= broadcast_threshold`` — the right side is
    collected ONCE into a pyarrow Table and broadcast via ``ray.put``;
    every left batch joins map-side with Arrow's hash-join kernel.
    ZERO exchanges: the dominant case for dimension tables, and the
    repo-wide "broadcast small sides" rule made reusable.
  * otherwise — both sides are tagged with ``bucket = siphash(key) %
    num_partitions`` and meet in ONE bucketed exchange; each bucket
    joins locally with the same Arrow kernel. Sentinel rows guard the
    exchange against Ray's empty-first-block schema race
    (``_exchange.py``), and ``num_partitions`` scales with the larger
    side's row count (``context.partitions_for``).

Join types map directly onto Arrow's: inner, left (outer), semi, anti
(both left-flavored). Output schema is derived ONCE by joining zero-row
tables of the input schemas, so empty buckets and empty inputs are
schema-stable. Multi-column keys hash through
``pd.util.hash_pandas_object`` (fixed-key siphash — stable across
processes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_HOW_TO_ARROW = {
    "inner": "inner",
    "left": "left outer",
    "semi": "left semi",
    "anti": "left anti",
    # full outer ALWAYS takes the bucketed exchange route: the broadcast
    # route replays the right side per left batch, so unmatched right
    # rows would be emitted once per batch (or lost); per-bucket full
    # joins are correct because buckets partition the key space.
    "full": "full outer",
}


def _as_list(x: "str | list[str]") -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _canon_key_strings(col, n: int) -> np.ndarray:
    """Type-canonical string keys for hashing: int/timestamp via int64
    repr, float by bit pattern (-0.0 normalized), else string cast;
    nulls -> a reserved marker. A plain ``to_pandas()`` hash is NOT
    layout-stable: an int64 arrow column converts to float64 pandas when
    a batch happens to contain nulls, and 1 hashes differently from 1.0
    — the same key would route to different buckets in different
    batches."""
    t = col.type
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    if pa.types.is_integer(t) or pa.types.is_timestamp(t):
        v = col.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
        out = v.astype("U21").astype(object)
    elif pa.types.is_floating(t):
        v = col.cast(pa.float64()).fill_null(0.0).to_numpy(
            zero_copy_only=False
        ) + 0.0
        out = np.char.mod("%d", v.view(np.int64)).astype(object)
    else:
        out = np.asarray(
            col.cast(pa.string()).fill_null("").to_pandas(), dtype=object
        )
    if null_mask.any():
        out = out.copy()
        out[null_mask] = "\x00null"
    return out


def _key_bucket(tbl: pa.Table, keys: list[str], n_buckets: int) -> pa.Array:
    """Deterministic vectorized multi-column key -> bucket hash,
    layout- and null-placement-stable (see _canon_key_strings)."""
    n = tbl.num_rows
    parts = [_canon_key_strings(tbl.column(k), n) for k in keys]
    joined = parts[0]
    for p in parts[1:]:
        joined = joined + "\x1f" + p
    h = pd.util.hash_array(joined)
    return pa.array((h % n_buckets).astype(np.int32), pa.int32())


def _arrow_join(
    left: pa.Table,
    right: pa.Table,
    left_on: list[str],
    right_on: list[str],
    how: str,
) -> pa.Table:
    return left.join(
        right,
        keys=left_on,
        right_keys=right_on,
        join_type=_HOW_TO_ARROW[how],
        left_suffix="",
        right_suffix="_r",
    )


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: "str | list[str]",
    right_on: "str | list[str] | None" = None,
    how: str = "inner",
    broadcast_threshold: int = 100_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Join two Datasets on key equality; see module docstring.

    ``how``: "inner" | "left" | "semi" | "anti" (left-flavored).
    Returns a Dataset with the Arrow-join output schema (right-side
    column name collisions get an ``_r`` suffix; semi/anti keep the left
    schema). Row order is not defined (hash-partitioned).
    """
    if how not in _HOW_TO_ARROW:
        raise ValueError(f"how must be one of {sorted(_HOW_TO_ARROW)}: {how!r}")
    lk = _as_list(left_on)
    rk = _as_list(right_on if right_on is not None else left_on)
    if len(lk) != len(rk):
        raise ValueError("left_on and right_on must have equal arity")

    # materialize the right side FIRST: the schema fetch below and the
    # count would each execute a lazy upstream plan (the repo's
    # to_arrow_refs lesson); materializing once serves both + the join
    right = right.materialize()
    l_s = left.schema(fetch_if_missing=True)
    r_s = right.schema(fetch_if_missing=True)
    if l_s is None or r_s is None:
        # a row-lambda filter that drops every row erases Ray's schema;
        # schema-preserving alternatives keep it (pyarrow map_batches)
        raise ValueError(
            "hash_join requires schematized inputs; an all-filtering "
            "row filter erases the schema — filter via map_batches("
            "batch_format='pyarrow') instead"
        )
    l_schema: pa.Schema = l_s.base_schema
    r_schema: pa.Schema = r_s.base_schema
    out_schema = _arrow_join(
        l_schema.empty_table(), r_schema.empty_table(), lk, rk, how
    ).schema

    n_right = right.count()

    if how == "full":
        broadcast_threshold = -1  # see _HOW_TO_ARROW: exchange route only

    if n_right <= broadcast_threshold:
        r_tbl = pa.concat_tables(
            ray.get(right.to_arrow_refs()), promote_options="default"
        )
        r_ref = ray.put(r_tbl)

        def bjoin(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema.empty_table()
            out = _arrow_join(batch, ray.get(r_ref), lk, rk, how)
            return out.select(out_schema.names).cast(out_schema)

        return left.map_batches(bjoin, batch_format="pyarrow")

    # ---- bucketed exchange route ----------------------------------------
    from agentic_doc_ray.context import partitions_for, shuffle_partitions
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    n_left = left.count()
    np_ = shuffle_partitions(
        num_partitions
        if num_partitions is not None
        else partitions_for(max(n_left, n_right))
    )
    n_buckets = max(np_ * 8, 64)

    # union schema: bucket + side + every column of both sides (disjoint
    # names via the _u suffix for right columns colliding with left ones)
    r_names = {
        n: (n if n not in l_schema.names else n + "_u") for n in r_schema.names
    }
    union_fields = (
        [("bucket", pa.int32()), ("side", pa.string())]
        + [(f.name, f.type) for f in l_schema]
        + [(r_names[f.name], f.type) for f in r_schema]
    )
    union_schema = pa.schema(union_fields)

    def _pad(tbl: pa.Table, side: str, key_cols: list[str]) -> pa.Table:
        n = tbl.num_rows
        cols = [
            _key_bucket(tbl, key_cols, n_buckets),
            pa.array([side] * n, pa.string()),
        ]
        for f in union_schema:
            if f.name in ("bucket", "side"):
                continue
            src = None
            if side == "l" and f.name in l_schema.names:
                src = tbl.column(f.name)
            elif side == "r":
                orig = next(
                    (k for k, v in r_names.items() if v == f.name), None
                )
                if orig is not None and orig in r_schema.names:
                    src = tbl.column(orig)
            cols.append(src if src is not None else pa.nulls(n, f.type))
        return pa.Table.from_arrays(cols, schema=union_schema)

    left_tagged = left.map_batches(
        lambda b: _pad(b, "l", lk), batch_format="pyarrow"
    )
    right_tagged = right.map_batches(
        lambda b: _pad(b, "r", rk), batch_format="pyarrow"
    )

    rk_union = [r_names[k] for k in rk]

    def join_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        is_l = pc.equal(g.column("side"), "l")
        lt = g.filter(is_l).select(l_schema.names).cast(l_schema)
        # restore the right side's original column names for the join
        rt = (
            g.filter(pc.invert(is_l))
            .select([r_names[n] for n in r_schema.names])
            .rename_columns(list(r_schema.names))
            .cast(r_schema)
        )
        if lt.num_rows == 0 and how != "full":
            return out_schema.empty_table()
        out = _arrow_join(lt, rt, lk, rk, how)
        return out.select(out_schema.names).cast(out_schema)

    return (
        left_tagged.union(right_tagged)
        .union(
            int_key_sentinels(union_schema, "bucket", fill={"side": "s"})
        )
        .groupby("bucket", num_partitions=np_)
        .map_groups(join_bucket, batch_format="pyarrow")
    )
