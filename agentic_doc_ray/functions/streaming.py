"""Online (streaming-ingest) exact dedup on raw Ray actors — the one
operator family where the Dataset API genuinely cannot express the
semantics: a SHARED MUTABLE INDEX consulted in arrival order.

Batch dedup (functions/dedup.py) answers "which copy wins" with a
groupby over the finished corpus. An INGESTION pipeline instead sees
documents arrive over time and must decide each one ONLINE — admit the
first copy, reject later ones — against state that outlives any single
batch. That admit/reject decision against accumulating state is not a
map, a groupby, or a join, so this stage drops to raw Ray actors (the
engine's documented last-resort tier) while staying bounded:

  - state is SHARDED BY HASH RANGE across ``n_shards`` actors (actor k
    owns digests with ``digest[0] % n_shards == k``) — no actor holds
    more than ~1/K of the distinct-content digest set, and shards never
    coordinate (a digest has exactly one owner);
  - arrival order is preserved PER SHARD for free: Ray actors execute
    their task queue in submission order (argument readiness only
    delays, never reorders), so submitting one admit task per (block,
    shard) in block order gives each hash range a strictly ordered
    view — the only order first-occurrence semantics needs;
  - the DRIVER handles only ObjectRefs and boolean masks: digests are
    computed by cluster tasks from block refs, admitted rows are
    filtered by cluster tasks, and document text never touches the
    driver or the actors (16-byte digests do).

Determinism: arrival order is defined as (block order, row order) of
the doc_id-sorted, materialized input — so admission reproduces exactly
the batch ``dedup_keep`` winner rule (smallest doc_id per content),
which is the SQL oracle the driver checks. An unsorted feed is still a
valid online dedup, just with arrival-order winners.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
class _DedupShard:
    """Owner of one hash range: admits first-seen digests in task-queue
    order. ``admit`` receives the BLOCK's full digest list and returns
    the admit mask for the positions it owns (position list + mask), so
    the driver never routes rows itself."""

    def __init__(self, shard: int, n_shards: int) -> None:
        self._shard = shard
        self._n = n_shards
        self._seen: set[bytes] = set()

    def admit(self, digests: list[bytes]):
        mine = [i for i, d in enumerate(digests) if d[0] % self._n == self._shard]
        out = []
        seen = self._seen
        for i in mine:
            d = digests[i]
            if d in seen:
                out.append(False)
            else:
                seen.add(d)
                out.append(True)
        return mine, out

    def size(self) -> int:
        return len(self._seen)


@ray.remote
def _block_digests(tbl: pa.Table) -> list[bytes]:
    return [
        hashlib.md5((t or "").encode()).digest()
        for t in tbl.column("text").to_pylist()
    ]


@ray.remote
def _filter_block(tbl: pa.Table, *shard_results) -> pa.Table:
    admit = np.zeros(tbl.num_rows, dtype=bool)
    for positions, mask in shard_results:
        if positions:
            admit[np.asarray(positions, dtype=np.int64)] = mask
    return tbl.select(["doc_id", "text"]).filter(pa.array(admit))


def streaming_dedup_keep(
    docs: "ray.data.Dataset",
    n_shards: int = 8,
    window: int = 16,
) -> "ray.data.Dataset":
    """Online first-occurrence dedup: the (doc_id, text) rows an
    ingestion gate ADMITS, processing blocks in order against
    hash-range-sharded actor state. ``window`` bounds in-flight blocks
    (backpressure on the submit loop); the driver loop is O(blocks) ref
    bookkeeping, never row data.
    """
    shards = [_DedupShard.remote(k, n_shards) for k in range(n_shards)]

    ordered = docs.sort("doc_id").materialize()
    block_refs = ordered.to_arrow_refs()

    kept_refs: list = []
    in_flight: list = []
    for bref in block_refs:
        dref = _block_digests.remote(bref)
        shard_results = [s.admit.remote(dref) for s in shards]
        kref = _filter_block.remote(bref, *shard_results)
        kept_refs.append(kref)
        in_flight.append(kref)
        if len(in_flight) >= window:
            ray.wait([in_flight.pop(0)], num_returns=1)

    out_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    if not kept_refs:
        return ray.data.from_arrow(out_schema.empty_table())
    # admitted blocks stay in the object store; the driver hands refs on
    return ray.data.from_arrow_refs(kept_refs)
