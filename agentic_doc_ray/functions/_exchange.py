"""Sentinel guards for ``groupby().map_groups()`` hash exchanges.

Ray's hash shuffle broadcasts schemas to its aggregator actors along with
the FIRST block of each input sequence (``send_empty_blocks=True`` fans an
empty, schema-carrying shard to every partition). But ``_shuffle_block``
returns early on a ZERO-ROW input block without sending anything — while
the operator has already marked schemas as broadcast
(``hash_shuffle.py:223,588`` in ray 2.49). If the stream's first block is
empty — routine when an exchange consumes the output of an upstream
map_groups or a filtering map_batches — any partition that then receives
no rows finalizes a schema-less block, and the ``Concat`` aggregation used
by map_groups dies sorting it: ``ArrowInvalid: No match for
FieldRef.Name(<key>)``. Which block arrives first is a streaming-executor
race, so the crash is NONDETERMINISTIC — green tests don't prove a
pipeline safe. (``groupby().aggregate()`` uses a different aggregation
that tolerates empty partitions; only the map_groups path crashes.)

Guard: union sentinel rows whose key values land in EVERY partition, so
no partition is ever empty. The group fn must drop them (filter on a
side/id column) or they must be inert under its own filters.

Coverage is ADAPTIVE: key sets are generated at plan time against Ray's
own ``transform_pyarrow.hash_partition`` and cached per (key type,
partition cap). Because the actual ``num_partitions`` of an exchange is
chosen at plan time as ``min(requested, cluster CPUs)``, a set covering
EVERY np in ``2..cap`` is valid for any request on any session size —
there is no engine-wide partition ceiling. The partition hash is
TYPE-sensitive (an int32 key column routes differently from int64), so
keys are generated in the schema's own key-column type. Generated sets
are re-verified exhaustively in ``tests/test_graph.py`` for np in 2..64.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

# NUL prefix cannot collide with text-derived keys
_STR_CANDIDATE_FMT = "\x00sentinel%05d"

_COVER_CACHE: dict[tuple[str, int], list] = {}

_U64 = (1 << 64) - 1


def _mix64(i: int) -> int:
    """splitmix64 finalizer — deterministic well-spread candidate stream.

    Sequential ints 0,1,2,... cannot reach every partition of Ray's int
    hash at high num_partitions (measured: int64 np=447 stays uncovered
    after 1e6 consecutive candidates); a mixed stream covers np=512 with
    ~3k candidates."""
    z = (i * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) & _U64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _U64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _U64
    return z ^ (z >> 31)


def _covering_keys(max_np: int, key_type: pa.DataType, candidate) -> list:
    """Key values landing >=1 row in EVERY hash partition for EVERY
    ``num_partitions`` in ``2..max_np``, verified against Ray's own
    partitioner at generation time (driver-side, cached). ``candidate(i)``
    yields the i-th deterministic candidate key value."""
    cache_key = (str(key_type), max_np)
    cached = _COVER_CACHE.get(cache_key)
    if cached is not None:
        return cached
    from ray.data._internal.arrow_ops.transform_pyarrow import hash_partition

    chosen: list = []
    chosen_set: set = set()
    pool_end = 0  # next candidate index to draw

    def _covered(keys: list, np_: int) -> set:
        if not keys:
            return set()
        t = pa.table({"k": pa.array(keys, key_type)})
        parts = hash_partition(t, hash_cols=["k"], num_partitions=np_)
        return {p for p, b in parts.items() if b.num_rows > 0}

    for np_ in range(2, max_np + 1):
        missing = set(range(np_)) - _covered(chosen, np_)
        while missing:
            batch = [candidate(i) for i in range(pool_end, pool_end + 256)]
            pool_end += len(batch)
            t = pa.table({"k": pa.array(batch, key_type)})
            parts = hash_partition(t, hash_cols=["k"], num_partitions=np_)
            for p in sorted(missing):
                b = parts.get(p)
                if b is not None and b.num_rows > 0:
                    v = b.column("k")[0].as_py()
                    if v not in chosen_set:
                        chosen.append(v)
                        chosen_set.add(v)
                    missing.discard(p)
            if pool_end > 1_000_000:  # pragma: no cover - partitioner broken
                raise RuntimeError(
                    f"could not cover np={np_} for {key_type} after "
                    f"{pool_end} candidates"
                )
    # re-verify the final set end-to-end before trusting it
    for np_ in range(2, max_np + 1):
        got = _covered(chosen, np_)
        if got != set(range(np_)):  # pragma: no cover - generation is greedy
            raise RuntimeError(
                f"sentinel coverage hole for {key_type} at np={np_}: "
                f"missing {set(range(np_)) - got}"
            )
    _COVER_CACHE[cache_key] = chosen
    return chosen


def _default_cap() -> int:
    from agentic_doc_ray.context import shuffle_partitions

    return shuffle_partitions()


def covering_int_keys(key_type: pa.DataType, max_np: int | None = None) -> list:
    """Non-negative ints covering every partition for np in 2..max_np,
    drawn from a mixed stream masked to the key type's positive range."""
    width = {"int8": 7, "int16": 15, "int32": 31, "int64": 63}.get(str(key_type), 63)
    mask = (1 << width) - 1
    return _covering_keys(
        max_np or _default_cap(), key_type, lambda i: _mix64(i) & mask
    )


def covering_str_keys(max_np: int | None = None) -> list:
    """NUL-prefixed strings covering every partition for np in 2..max_np."""
    return _covering_keys(
        max_np or _default_cap(), pa.string(), lambda i: _STR_CANDIDATE_FMT % i
    )


def sentinel_table(
    schema: pa.Schema, key_col: str, keys: "pa.Array", fill: dict | None = None
) -> pa.Table:
    """A table in ``schema`` with ``keys`` in the key column and, per other
    column, ``fill[name]`` replicated (else typed nulls)."""
    n = len(keys)
    fill = fill or {}
    cols = []
    for f in schema:
        if f.name == key_col:
            cols.append(keys.cast(f.type))
        elif f.name in fill:
            cols.append(pa.array([fill[f.name]] * n, f.type))
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def int_key_sentinels(
    schema: pa.Schema,
    key_col: str = "bucket",
    fill: dict | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Sentinels for an int-keyed exchange: keys generated in the schema's
    own key-column type to cover every partition for any np up to
    ``num_partitions`` (default: the session's partition cap)."""
    key_type = schema.field(key_col).type
    keys = pa.array(covering_int_keys(key_type, num_partitions), key_type)
    return ray.data.from_arrow(sentinel_table(schema, key_col, keys, fill))


def str_key_sentinels(
    schema: pa.Schema,
    key_col: str,
    fill: dict | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Sentinels for a string-keyed exchange: NUL-prefixed keys (cannot
    collide with text-derived keys) covering every partition for any np up
    to ``num_partitions`` (default: the session's partition cap)."""
    keys = pa.array(covering_str_keys(num_partitions), pa.string())
    return ray.data.from_arrow(sentinel_table(schema, key_col, keys, fill))
