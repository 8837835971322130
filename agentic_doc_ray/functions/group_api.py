"""Generic distributed groupby-apply — the safe ``map_groups`` surface.

``hash_join`` (join_api.py) is the general join surface; this is its
aggregation sibling: a user hands an arbitrary per-group table function
and gets Ray-Data execution with the engine's hard-won guards applied —

  * rows co-locate by a STABLE multi-column key hash (the join_api
    siphash — process-independent, type-aware) into ``n_buckets``
    bucket groups, so parallelism is an engine choice while ``fn`` still
    sees exactly one whole key group per call;
  * the bucket exchange is sentinel-guarded against Ray 2.49's
    empty-first-block schema race (functions/_exchange.py) — the raw
    ``groupby().map_groups()`` path crashes nondeterministically when
    its input stream starts with a zero-row block. Sentinel rows ride a
    dedicated ``__adr_sent`` marker column (real rows may legitimately
    hold null keys, so null-keyed rows cannot double as sentinels);
  * inside a bucket, key groups are sliced vectorized (one sort +
    run-boundary scan), not fed through Ray's per-group hash aggregate
    (~60us/distinct group — the measured copurchase hot spot).

``fn`` receives one pyarrow Table per distinct key group (all of that
group's rows) and returns a pyarrow Table castable to
``output_schema``. Exchange cost: every row ships exactly once with a
5-byte (bucket, marker) tag.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import partitions_for
from agentic_doc_ray.functions._exchange import int_key_sentinels
from agentic_doc_ray.functions.join_api import _key_bucket


def grouped_apply(
    ds: "ray.data.Dataset",
    keys: "str | list[str]",
    fn,
    output_schema: pa.Schema,
    n_buckets: int = 64,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Apply ``fn`` once per distinct key group of ``ds`` (see module
    doc). ``output_schema`` fixes the result schema so empty buckets and
    empty inputs stay schema-stable."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    in_schema_t = ds.schema(fetch_if_missing=True)
    if in_schema_t is None:
        raise ValueError("grouped_apply requires a schematized input")
    in_schema = in_schema_t.base_schema
    marked_schema = pa.schema(
        [("__adr_bucket", pa.int32()), ("__adr_sent", pa.int8())]
        + [(f.name, f.type) for f in in_schema]
    )
    np_ = (
        num_partitions if num_partitions is not None else partitions_for(ds.count())
    )

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _key_bucket(batch, keys, n_buckets),
                pa.array(np.zeros(n, np.int8)),
            ]
            + [batch.column(name) for name in in_schema.names],
            schema=marked_schema,
        )

    sentinels = int_key_sentinels(
        marked_schema, "__adr_bucket", fill={"__adr_sent": 1}
    )

    def apply_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(
            pc.equal(group.column("__adr_sent"), pa.scalar(0, pa.int8()))
        )
        if g.num_rows == 0:
            return output_schema.empty_table()
        g = g.drop_columns(["__adr_bucket", "__adr_sent"])
        order = pc.sort_indices(g, sort_keys=[(k, "ascending") for k in keys])
        g = g.take(order)
        import pandas as pd

        codes, _ = pd.factorize(
            pd.util.hash_pandas_object(g.select(keys).to_pandas(), index=False),
            sort=False,
        )
        changes = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], changes))
        ends = np.concatenate((changes, [len(codes)]))
        outs = []
        for s, e in zip(starts, ends):
            out = fn(g.slice(s, e - s))
            if out.num_rows:
                outs.append(out.cast(output_schema))
        if not outs:
            return output_schema.empty_table()
        return pa.concat_tables(outs)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .union(sentinels)
        .groupby("__adr_bucket", num_partitions=np_)
        .map_groups(apply_bucket, batch_format="pyarrow")
    )
