"""HITS hubs & authorities over an edge table (Kleinberg 1999, BSP).

Third member of the directed-graph family (after ``pagerank`` and
``bfs_distances``): every node gets a hub score (points at good
authorities) and an authority score (pointed at by good hubs) — the
classic link-analysis pair for seed selection / site-vs-page quality in a
web corpus. Each power iteration is two mirrored half-steps:

  auth(v) <- sum over edges (u, v) of hub(u)
  hub(u)  <- sum over edges (u, v) of auth(v)

and each half-step is TWO bucketed hash exchanges bounded by the EDGE
table (same union + groupby(bucket) + sentinel pattern as ``pagerank`` —
see that module and ``graph.py`` for the Ray hash-shuffle landmines this
defuses): (1) keyed by the edge's source end — each bucket joins edges to
its co-located scores and emits one contribution per edge; (2) keyed by
the receiving node — each bucket sums its contributions while the other
score rides through untouched.

EXACT integer arithmetic end to end (the repo-wide replica contract):
scores are int64; instead of the textbook L2 normalisation (an
irrational sqrt), each half-step rescales by a power-of-two right shift
chosen from the global max — ``score >> max(0, bit_length(max) -
TARGET_BITS)`` — so the top score stays in [2^39, 2^40) and relative
order/ratios are preserved exactly. Integer sums are associative and the
shift is a pure function of one driver scalar, so block arrival order
cannot change a bit (bit-equal to ``hits_oracle``). Overflow bound
(documented, not silent): a node's raw sum is <= in_degree * 2^40, exact
while max in-degree < 2^23 (~8.4M); lower TARGET_BITS for denser graphs.

Runs a FIXED ``n_iter`` rounds (deterministic, same rationale as
pagerank). Sandbox note: like kcore/scc this is exchange-LATENCY bound
at test scale (4 exchanges + 2 tiny max passes per iteration, each a
cold aggregator-fleet spawn); the fleets amortize at real data volume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import shuffle_partitions
from agentic_doc_ray.functions.graph import _bucket_of, _sentinels

TARGET_BITS = 40  # rescaled max lands in [2^(TARGET_BITS-1), 2^TARGET_BITS)
SCALE0 = np.int64(1) << TARGET_BITS  # initial hub score

# one schema for both exchanges of a half-step:
#   side 'e': edge row (node = giving end, peer = receiving end)
#   side 'r': state row (node, hub, auth)
#   side 'c': contribution row (node = receiving end, val)
_H_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.string()),
        ("peer", pa.string()),
        ("side", pa.string()),
        ("hub", pa.int64()),
        ("auth", pa.int64()),
        ("val", pa.int64()),
    ]
)
_STATE_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.string()),
        ("hub", pa.int64()),
        ("auth", pa.int64()),
    ]
)


def _edge_rows(
    edges: "ray.data.Dataset", give_col: str, take_col: str
) -> "ray.data.Dataset":
    """Edge table as _H_SCHEMA rows bucketed by the GIVING end."""

    def canon(batch: pa.Table) -> pa.Table:
        give = pc.cast(batch.column(give_col), pa.string()).combine_chunks()
        take = pc.cast(batch.column(take_col), pa.string()).combine_chunks()
        n = len(give)
        return pa.Table.from_arrays(
            [
                _bucket_of(give),
                give,
                take,
                pa.array(["e"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=_H_SCHEMA,
        )

    return edges.map_batches(canon, batch_format="pyarrow")


def _state_rows(state: "ray.data.Dataset") -> "ray.data.Dataset":
    def conv(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch.column("bucket").combine_chunks(),
                batch.column("node").combine_chunks(),
                pa.nulls(n, pa.string()),
                pa.array(["r"] * n, pa.string()),
                batch.column("hub").combine_chunks(),
                batch.column("auth").combine_chunks(),
                pa.nulls(n, pa.int64()),
            ],
            schema=_H_SCHEMA,
        )

    return state.map_batches(conv, batch_format="pyarrow")


def _shift_for(max_val: int) -> int:
    return max(0, int(max_val).bit_length() - TARGET_BITS)


def hits(
    edges: "ray.data.Dataset",
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "ray.data.Dataset":
    """(node, hub_scaled, auth_scaled) for every node of ``edges`` after
    ``n_iter`` exact-integer HITS iterations (see module docstring)."""
    e_by_src = _edge_rows(edges, src_col, dst_col).materialize()
    e_by_dst = _edge_rows(edges, dst_col, src_col).materialize()
    n_edges = e_by_src.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "hub_scaled": pa.array([], pa.int64()),
                    "auth_scaled": pa.array([], pa.int64()),
                }
            )
        )
    np_ = max(2, min(shuffle_partitions(), 1 + n_edges // 65536))

    # node set -> initial state (hub = SCALE0, auth = 0) via one exchange
    def node_partials(batch: pa.Table) -> pa.Table:
        node_c, peer_c = batch.column("node"), batch.column("peer")
        nodes = pa.chunked_array(
            list(node_c.chunks) + list(peer_c.chunks), pa.string()
        ).unique()
        n = len(nodes)
        return pa.Table.from_arrays(
            [
                _bucket_of(nodes),
                nodes,
                pa.nulls(n, pa.string()),
                pa.array(["c"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=_H_SCHEMA,
        )

    def init_state(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        if g.num_rows == 0:
            return _STATE_SCHEMA.empty_table()
        t = (
            g.select(["bucket", "node"])
            .group_by(["bucket", "node"])
            .aggregate([])
        )
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t.column("bucket").combine_chunks(),
                t.column("node").combine_chunks(),
                pa.array(np.full(n, SCALE0, np.int64)),
                pa.array(np.zeros(n, np.int64)),
            ],
            schema=_STATE_SCHEMA,
        )

    state = (
        e_by_src.map_batches(node_partials, batch_format="pyarrow")
        .union(_sentinels(_H_SCHEMA))
        .groupby("bucket", num_partitions=np_)
        .map_groups(init_state, batch_format="pyarrow")
        .materialize()
    )

    def make_contribute(src_score: str):
        def contribute(group: pa.Table) -> pa.Table:
            g = group.filter(pc.not_equal(group.column("side"), "s"))
            is_edge = pc.equal(g.column("side"), "e")
            e = g.filter(is_edge).select(["node", "peer"])
            r = g.filter(pc.equal(g.column("side"), "r")).select(
                ["node", src_score]
            )
            if e.num_rows == 0 or r.num_rows == 0:
                return _H_SCHEMA.empty_table()
            m = e.join(r, keys="node", join_type="inner")
            peer = m.column("peer").combine_chunks()
            val = m.column(src_score).combine_chunks()
            n = m.num_rows
            return pa.Table.from_arrays(
                [
                    _bucket_of(peer),
                    peer,
                    pa.nulls(n, pa.string()),
                    pa.array(["c"] * n, pa.string()),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.int64()),
                    val,
                ],
                schema=_H_SCHEMA,
            )

        return contribute

    def _col_max(ds: "ray.data.Dataset", col: str) -> int:
        """Block-local max scan — no 200-partition aggregate fleet (same
        rationale as graph._changed_sum); 'c' rows carry nulls in the
        score columns, which pc.max ignores."""
        parts = ds.map_batches(
            lambda b: pa.table(
                {"m": pa.array([pc.max(b.column(col)).as_py()], pa.int64())}
            ),
            batch_format="pyarrow",
        ).take_all()
        vals = [r["m"] for r in parts if r["m"] is not None]
        return max(vals) if vals else 0

    def make_fused(src_score: str, dst_score: str, s_prev: int, emit_next: bool):
        """Fused half-step (one exchange, VERDICT r03 #6 pattern): the
        previous half-step's power-of-two rescale is DEFERRED into this
        group — contributions are exact per-edge copies of the giver's
        score, so shifting each c.val by s_prev equals shifting at the
        source — then the new dst_score sums fold, and the giving-end
        edge rows co-located on this bucket emit the NEXT half-step's
        contribution rows from the just-updated (unshifted) scores."""

        def fused(group: pa.Table) -> pa.Table:
            g = group.filter(pc.not_equal(group.column("side"), "s"))
            st = g.filter(pc.equal(g.column("side"), "r"))
            if st.num_rows == 0:
                return _H_SCHEMA.empty_table()
            c = g.filter(pc.equal(g.column("side"), "c")).select(["node", "val"])
            src_vals = st.column(src_score).combine_chunks()
            if s_prev:
                src_vals = pa.array(
                    src_vals.to_numpy(zero_copy_only=False) >> s_prev, pa.int64()
                )
                c = c.set_column(
                    1,
                    "val",
                    pa.array(
                        c.column("val").to_numpy(zero_copy_only=False) >> s_prev,
                        pa.int64(),
                    ),
                )
            sums = (
                c.group_by("node")
                .aggregate([("val", "sum")])
                .rename_columns(["node", "csum"])
            )
            base = pa.Table.from_arrays(
                [st.column("bucket").combine_chunks(),
                 st.column("node").combine_chunks(), src_vals],
                names=["bucket", "node", "srcv"],
            )
            m = base.join(sums, keys="node", join_type="left outer")
            new_val = m.column("csum").combine_chunks().fill_null(0)
            n = m.num_rows
            cols = {
                "bucket": m.column("bucket").combine_chunks(),
                "node": m.column("node").combine_chunks(),
                "peer": pa.nulls(n, pa.string()),
                "side": pa.array(["r"] * n, pa.string()),
                src_score: m.column("srcv").combine_chunks(),
                dst_score: new_val,
                "val": pa.nulls(n, pa.int64()),
            }
            out = pa.Table.from_arrays(
                [cols[f.name] for f in _H_SCHEMA], schema=_H_SCHEMA
            )
            if not emit_next:
                return out
            e = g.filter(pc.equal(g.column("side"), "e")).select(["node", "peer"])
            if e.num_rows == 0:
                return out
            giver = pa.Table.from_arrays(
                [m.column("node").combine_chunks(), new_val],
                names=["node", "gval"],
            )
            me = e.join(giver, keys="node", join_type="inner")
            peer = me.column("peer").combine_chunks()
            k = me.num_rows
            out_c = pa.Table.from_arrays(
                [
                    _bucket_of(peer),
                    peer,
                    pa.nulls(k, pa.string()),
                    pa.array(["c"] * k, pa.string()),
                    pa.nulls(k, pa.int64()),
                    pa.nulls(k, pa.int64()),
                    me.column("gval").combine_chunks(),
                ],
                schema=_H_SCHEMA,
            )
            return pa.concat_tables([out, out_c])

        return fused

    # seed: contributions from the initial hub scores (one attach exchange),
    # then ONE exchange per half-step — the rescale shift travels as a
    # driver scalar into the next group. 2 exchanges/iteration instead of 4
    # (plus the per-half-step Dataset.max fleets, now block-local scans).
    cur = (
        e_by_src.union(_state_rows(state))
        .union(_sentinels(_H_SCHEMA))
        .groupby("bucket", num_partitions=np_)
        .map_groups(make_contribute("hub"), batch_format="pyarrow")
        .union(_state_rows(state))
        .materialize()
    )
    s_pending = 0
    steps = [("hub", "auth", e_by_dst), ("auth", "hub", e_by_src)] * n_iter
    for i, (src_score, dst_score, next_edges) in enumerate(steps):
        last = i == len(steps) - 1
        cur = (
            cur.union(next_edges)
            .union(_sentinels(_H_SCHEMA))
            .groupby("bucket", num_partitions=np_)
            .map_groups(
                make_fused(src_score, dst_score, s_pending, emit_next=not last),
                batch_format="pyarrow",
            )
            .materialize()
        )
        s_pending = _shift_for(_col_max(cur, dst_score))

    def final(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("side"), "r"))
        hub = b.column("hub").combine_chunks()
        if s_pending:  # the last half-step's deferred rescale (hub)
            hub = pa.array(
                hub.to_numpy(zero_copy_only=False) >> s_pending, pa.int64()
            )
        return pa.Table.from_arrays(
            [b.column("node").combine_chunks(), hub,
             b.column("auth").combine_chunks()],
            names=["node", "hub_scaled", "auth_scaled"],
        )

    return cur.map_batches(final, batch_format="pyarrow")


def hits_oracle(
    edges: pa.Table,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pa.Table:
    """Single-process replica — same integer sums + power-of-two
    rescale, bit-equal to the distributed run."""
    src = [str(x) for x in edges.column(src_col).to_pylist()]
    dst = [str(x) for x in edges.column(dst_col).to_pylist()]
    nodes = sorted(set(src) | set(dst))
    if not nodes:
        return pa.table(
            {
                "node": pa.array([], pa.string()),
                "hub_scaled": pa.array([], pa.int64()),
                "auth_scaled": pa.array([], pa.int64()),
            }
        )
    hub = {v: int(SCALE0) for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(n_iter):
        sums = {v: 0 for v in nodes}
        for s_, d_ in zip(src, dst):
            sums[d_] += hub[s_]
        sh = _shift_for(max(sums.values()))
        auth = {v: sums[v] >> sh for v in nodes}
        sums = {v: 0 for v in nodes}
        for s_, d_ in zip(src, dst):
            sums[s_] += auth[d_]
        sh = _shift_for(max(sums.values()))
        hub = {v: sums[v] >> sh for v in nodes}
    return pa.table(
        {
            "node": pa.array(nodes, pa.string()),
            "hub_scaled": pa.array([hub[v] for v in nodes], pa.int64()),
            "auth_scaled": pa.array([auth[v] for v in nodes], pa.int64()),
        }
    )
