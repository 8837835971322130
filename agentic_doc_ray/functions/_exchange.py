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
side/id column) or they must be inert under its own filters. Coverage of
the key sets below is verified exhaustively against Ray's own
``transform_pyarrow.hash_partition`` in ``tests/test_graph.py``:
128 int keys cover num_partitions 2..9 (``shuffle_partitions`` caps at
the CPU count, max 8 everywhere in this engine); 128 strings cover 2..17.
The partition hash is TYPE-sensitive — 128 keys are verified for BOTH
int32 and int64 key columns (64 suffice for int32 but miss a partition
for int64 at num_partitions=5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

N_INT_SENTINELS = 128
STR_SENTINEL_KEYS = ["\x00sentinel%03d" % i for i in range(128)]


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
    schema: pa.Schema, key_col: str = "bucket", fill: dict | None = None
) -> "ray.data.Dataset":
    """Sentinels for an int-keyed exchange: keys 0..127 (every partition
    covered for num_partitions <= 9, int32 or int64 key column)."""
    keys = pa.array(np.arange(N_INT_SENTINELS, dtype=np.int64))
    return ray.data.from_arrow(sentinel_table(schema, key_col, keys, fill))


def str_key_sentinels(
    schema: pa.Schema, key_col: str, fill: dict | None = None
) -> "ray.data.Dataset":
    """Sentinels for a string-keyed exchange: 128 NUL-prefixed keys (every
    partition covered for num_partitions <= 17; the NUL prefix cannot
    collide with text-derived keys)."""
    keys = pa.array(STR_SENTINEL_KEYS, pa.string())
    return ray.data.from_arrow(sentinel_table(schema, key_col, keys, fill))
