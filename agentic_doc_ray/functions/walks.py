"""Deterministic random walks over an edge table (DeepWalk corpus prep).

DeepWalk / node2vec pipelines (Perozzi et al. 2014) turn a graph into a
"corpus" of node sequences that a skip-gram model then embeds; the walk
generation is the distributed step. One walk starts at every node and
takes ``n_steps`` hops; at each hop the walker picks the out-neighbor
with the minimal ``(hash64(walk_id|step|dst), dst)`` key — a
deterministic stand-in for the uniform random choice (the repo-wide
replica contract: hash-derived decisions, no RNG stream, so reruns,
batching and the single-process oracle are bit-equal; vary an epoch tag
in the walk_id to get fresh "randomness" per epoch). Walks stop early at
sink nodes (no out-edges), like the reference algorithm's early
termination.

Plan shape: edges materialize once bucketed by src; each hop is ONE
bucketed hash exchange — the frontier rows (walk_id, cur) meet their
out-edges where they live, the argmin resolves vectorized per walk, and
the chosen hop is both emitted (walk_id, step, node) and re-bucketed as
the next frontier. Exchange payload is frontier + edge rows (edge-table
bounded); the growing walk prefix NEVER ships — output rows leave the
loop per step. Same union + groupby(bucket) + sentinel pattern as
pagerank/graph (see graph.py for the Ray hash-shuffle landmines).

Skew note: a hot node's bucket holds its out-edges once, and frontier
rows only add O(#walks currently AT the node); the per-hop join is
bounded by edges + frontier in the bucket. Degree skew concentrates in
one bucket only if one node carries a large share of ALL edges —
pre-split such hubs by salting dst choice into per-salt edge slices if a
real crawl graph needs it (documented, not needed for the test graphs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import shuffle_partitions
from agentic_doc_ray.functions.graph import _bucket_of, _sentinels

_W_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("walk_id", pa.string()),
        ("node", pa.string()),  # edges: src; frontier: current node
        ("dst", pa.string()),
        ("side", pa.string()),  # 'e' edge / 'f' frontier / 's' sentinel
    ]
)
_OUT_SCHEMA = pa.schema(
    [("walk_id", pa.string()), ("step", pa.int64()), ("node", pa.string())]
)


def _choice_keys(walk_ids: np.ndarray, step: int, dsts: np.ndarray) -> np.ndarray:
    """uint64 decision key per (walk, candidate dst) — pandas siphash
    with its fixed key (stable across processes; same primitive as
    graph._bucket_of)."""
    composed = np.array(
        [f"{w}|{step}|{d}" for w, d in zip(walk_ids, dsts)], dtype=object
    )
    return pd.util.hash_array(composed)


def graph_walks(
    edges: "ray.data.Dataset",
    n_steps: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "ray.data.Dataset":
    """(walk_id, step, node) rows: one walk per distinct source node,
    ``step`` 0 (the start) .. at most ``n_steps`` (see module doc)."""

    def canon(batch: pa.Table) -> pa.Table:
        src = pc.cast(batch.column(src_col), pa.string()).combine_chunks()
        dst = pc.cast(batch.column(dst_col), pa.string()).combine_chunks()
        n = len(src)
        return pa.Table.from_arrays(
            [
                _bucket_of(src),
                pa.nulls(n, pa.string()),
                src,
                dst,
                pa.array(["e"] * n, pa.string()),
            ],
            schema=_W_SCHEMA,
        )

    edge_rows = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n_edges = edge_rows.count()
    if n_edges == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    np_ = max(2, min(shuffle_partitions(), 1 + n_edges // 65536))

    # walk starts: every distinct SOURCE node (sinks have no walk of
    # their own — a walk from them would end at step 0 anyway)
    def start_rows(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").unique()
        n = len(nodes)
        return pa.Table.from_arrays(
            [
                _bucket_of(nodes),
                nodes,  # walk_id = start node
                nodes,
                pa.nulls(n, pa.string()),
                pa.array(["f"] * n, pa.string()),
            ],
            schema=_W_SCHEMA,
        )

    def dedupe_frontier(group: pa.Table) -> pa.Table:
        g = group.filter(pc.equal(group.column("side"), "f"))
        if g.num_rows == 0:
            return _W_SCHEMA.empty_table()
        t = (
            g.select(["bucket", "walk_id", "node"])
            .group_by(["bucket", "walk_id", "node"])
            .aggregate([])
        )
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t.column("bucket").combine_chunks(),
                t.column("walk_id").combine_chunks(),
                t.column("node").combine_chunks(),
                pa.nulls(n, pa.string()),
                pa.array(["f"] * n, pa.string()),
            ],
            schema=_W_SCHEMA,
        )

    frontier = (
        edge_rows.map_batches(start_rows, batch_format="pyarrow")
        .union(_sentinels(_W_SCHEMA))
        .groupby("bucket", num_partitions=np_)
        .map_groups(dedupe_frontier, batch_format="pyarrow")
        .materialize()
    )

    def frontier_out(batch: pa.Table, step: int) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("walk_id").combine_chunks(),
                pa.array(np.full(batch.num_rows, step, np.int64)),
                batch.column("node").combine_chunks(),
            ],
            schema=_OUT_SCHEMA,
        )

    outputs = [
        frontier.map_batches(
            lambda b: frontier_out(b, 0), batch_format="pyarrow"
        ).materialize()
    ]

    def make_hop(step: int):
        def hop(group: pa.Table) -> pa.Table:
            g = group.filter(pc.not_equal(group.column("side"), "s"))
            is_edge = pc.equal(g.column("side"), "e")
            e = g.filter(is_edge).select(["node", "dst"])
            f = g.filter(pc.invert(is_edge)).select(["walk_id", "node"])
            if e.num_rows == 0 or f.num_rows == 0:
                return _W_SCHEMA.empty_table()
            m = f.join(e, keys="node", join_type="inner").to_pandas()
            if not len(m):
                return _W_SCHEMA.empty_table()
            keys = _choice_keys(
                m["walk_id"].to_numpy(), step, m["dst"].to_numpy()
            )
            m = m.assign(_k=keys).sort_values(
                ["walk_id", "_k", "dst"], kind="stable"
            )
            pick = m.drop_duplicates("walk_id", keep="first")
            nxt = pick["dst"].to_numpy(dtype=object)
            wid = pick["walk_id"].to_numpy(dtype=object)
            n = len(pick)
            nxt_arr = pa.array(nxt, pa.string())
            return pa.Table.from_arrays(
                [
                    _bucket_of(nxt_arr),
                    pa.array(wid, pa.string()),
                    nxt_arr,
                    pa.nulls(n, pa.string()),
                    pa.array(["f"] * n, pa.string()),
                ],
                schema=_W_SCHEMA,
            )

        return hop

    for step in range(1, n_steps + 1):
        frontier = (
            edge_rows.union(frontier)
            .union(_sentinels(_W_SCHEMA))
            .groupby("bucket", num_partitions=np_)
            .map_groups(make_hop(step), batch_format="pyarrow")
            .materialize()
        )
        if frontier.count() == 0:
            break
        outputs.append(
            frontier.map_batches(
                lambda b, s=step: frontier_out(b, s), batch_format="pyarrow"
            ).materialize()
        )

    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out


def graph_walks_oracle(
    edges: pa.Table,
    n_steps: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pa.Table:
    """Single-process replica — same hash-argmin choice rule, bit-equal."""
    src = [str(x) for x in edges.column(src_col).to_pylist()]
    dst = [str(x) for x in edges.column(dst_col).to_pylist()]
    adj: dict[str, list[str]] = {}
    for s, d in zip(src, dst):
        adj.setdefault(s, []).append(d)
    rows = []
    for start in sorted(adj):
        cur = start
        rows.append((start, 0, start))
        for step in range(1, n_steps + 1):
            outs = adj.get(cur)
            if not outs:
                break
            keys = _choice_keys(
                np.array([start] * len(outs), dtype=object),
                step,
                np.array(outs, dtype=object),
            )
            order = sorted(zip(keys, outs))
            cur = order[0][1]
            rows.append((start, step, cur))
    return pa.table(
        {
            "walk_id": pa.array([r[0] for r in rows], pa.string()),
            "step": pa.array([r[1] for r in rows], pa.int64()),
            "node": pa.array([r[2] for r in rows], pa.string()),
        }
    )
