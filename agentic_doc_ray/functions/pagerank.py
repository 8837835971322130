"""Distributed PageRank over an edge table (BSP power iteration).

Second member of the graph family (after ``graph.connected_components``):
rank every node of a directed graph — link-graph quality weighting for a
web corpus (the original use), or centrality over a near-dup/citation
graph. Per iteration, TWO bucketed hash exchanges bounded by the EDGE
table, never any corpus: (1) keyed by src — each bucket joins its edges
to its co-located (rank, degree) state rows and emits one contribution
per edge; (2) keyed by dst — each bucket sums its contributions and
re-emits the node's new state. The same union + groupby + sentinel
pattern as connected_components (see that module's docstring for the two
Ray hash-shuffle landmines this defuses).

EXACT integer arithmetic makes the distributed run bit-equal to the
single-process replica (``pagerank_oracle``): ranks are int64 scaled by
10^12, per-edge contribution is ``rank // out_degree`` (floor), and the
update is ``base + (85 * Σcontrib) // 100`` with ``base = (15 * (S //
N)) // 100`` — integer sums are associative, so block arrival order
cannot change a single bit (same trick as the k-means integer partial
sums). The floor divisions leak a little probability mass (as dangling
nodes do in any simple PageRank); ranks are comparative weights, not an
exact distribution, and the leak is identical on both sides.

Runs a FIXED ``n_iter`` rounds (deterministic; convergence checking
would add a per-round driver sync for no correctness gain — callers pick
n_iter ~ graph diameter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import shuffle_partitions
from agentic_doc_ray.functions.graph import _bucket_of, _sentinels

SCALE = 10**12
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact fraction

# exchange A (key: src): edge rows (side 'e') + state rows (side 'r')
_A_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("src", pa.string()),
        ("dst", pa.string()),
        ("side", pa.string()),
        ("rank", pa.int64()),
        ("deg", pa.int64()),
    ]
)
# exchange B (key: node): contribution rows (side 'c') + state rows ('r')
_B_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.string()),
        ("side", pa.string()),
        ("val", pa.int64()),
        ("deg", pa.int64()),
    ]
)
_STATE_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.string()),
        ("rank", pa.int64()),
        ("deg", pa.int64()),
    ]
)


def pagerank(
    edges: "ray.data.Dataset",
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_fn=None,
) -> "ray.data.Dataset":
    """(node, rank_scaled) for every node in ``edges`` after ``n_iter``
    damped power iterations; rank_scaled/1e12 is the PageRank weight.

    ``seed_fn`` (optional) personalizes the walk: a PURE vectorized
    predicate ``np.ndarray[str] -> np.ndarray[bool]`` marking the
    teleport set (e.g. trusted-domain seeds). Seeds split the initial
    mass (SCALE // n_seeds each) and the teleport term lands ONLY on
    them (base = 0 elsewhere) — TrustRank-style proximity scoring. A
    pure function instead of a seed table keeps the plan unchanged (the
    flag is recomputed per batch from the node id, nothing joins or
    broadcasts); ``seed_fn=None`` is exactly classic PageRank, pinned
    bit-equal against the replica."""

    def canon(batch: pa.Table) -> pa.Table:
        src = pc.cast(batch.column(src_col), pa.string()).combine_chunks()
        dst = pc.cast(batch.column(dst_col), pa.string()).combine_chunks()
        n = len(src)
        return pa.Table.from_arrays(
            [
                _bucket_of(src),
                src,
                dst,
                pa.array(["e"] * n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            schema=_A_SCHEMA,
        )

    edge_rows = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n_edges = edge_rows.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "node": pa.array([], pa.string()),
                    "rank_scaled": pa.array([], pa.int64()),
                }
            )
        )
    # partitions scale with the EDGE table, not the cluster (same rationale
    # as connected_components: each partition is a cold-spawned aggregator
    # fleet per execution, and pagerank runs 2 exchanges per iteration)
    np_ = max(2, min(shuffle_partitions(), 1 + n_edges // 65536))

    # initial state: distinct nodes with out-degree, built through one
    # exchange keyed by node (batch-local partial degrees, then sum)
    def node_partials(batch: pa.Table) -> pa.Table:
        src = batch.column("src").combine_chunks()
        dst = batch.column("dst").combine_chunks()
        d = (
            pa.Table.from_arrays([src], names=["node"])
            .group_by("node")
            .aggregate([("node", "count")])
            .rename_columns(["node", "deg"])
        )
        dst_d = pa.Table.from_arrays(
            [dst.unique(), pa.nulls(len(dst.unique()), pa.int64())],
            names=["node", "deg"],
        )
        t = pa.concat_tables([d, dst_d])
        node = t.column("node").combine_chunks()
        return pa.Table.from_arrays(
            [
                _bucket_of(node),
                node,
                pa.array(["c"] * t.num_rows, pa.string()),
                t.column("deg").combine_chunks(),
                pa.nulls(t.num_rows, pa.int64()),
            ],
            schema=_B_SCHEMA,
        )

    def degree_resolve(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        if g.num_rows == 0:
            return _STATE_SCHEMA.empty_table()
        agg = (
            g.select(["bucket", "node", "val"])
            .group_by(["bucket", "node"])
            .aggregate([("val", "sum")])
        )
        deg = agg.column("val_sum").combine_chunks().fill_null(0)
        n = agg.num_rows
        return pa.Table.from_arrays(
            [
                agg.column("bucket").combine_chunks(),
                agg.column("node").combine_chunks(),
                pa.nulls(n, pa.int64()),  # rank filled below (needs N)
                deg,
            ],
            schema=_STATE_SCHEMA,
        )

    state = (
        edge_rows.map_batches(node_partials, batch_format="pyarrow")
        .union(_sentinels(_B_SCHEMA))
        .groupby("bucket", num_partitions=np_)
        .map_groups(degree_resolve, batch_format="pyarrow")
        .materialize()
    )
    n_nodes = state.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "node": pa.array([], pa.string()),
                    "rank_scaled": pa.array([], pa.int64()),
                }
            )
        )
    if seed_fn is None:
        r0 = SCALE // n_nodes
        base = (_DAMP_DEN - _DAMP_NUM) * r0 // _DAMP_DEN

        def node_r0(nodes: np.ndarray) -> np.ndarray:
            return np.full(len(nodes), r0, np.int64)

        def node_base(nodes: "pa.Array") -> "pa.Array":
            return pa.array(
                np.full(len(nodes), base, np.int64), pa.int64()
            )

    else:
        # count the seed set with one streaming pass over the state rows
        n_seeds = int(
            state.map_batches(
                lambda b: pa.table(
                    {
                        "ns": pa.array(
                            [
                                int(
                                    seed_fn(
                                        np.asarray(
                                            b.column("node").to_pylist(),
                                            dtype=object,
                                        )
                                    ).sum()
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            ).sum("ns")
            or 0
        )
        if n_seeds == 0:
            raise ValueError("personalized pagerank: seed_fn marked no nodes")
        r0_seed = SCALE // n_seeds
        base_seed = (_DAMP_DEN - _DAMP_NUM) * r0_seed // _DAMP_DEN

        def node_r0(nodes: np.ndarray) -> np.ndarray:
            return np.where(seed_fn(nodes), r0_seed, 0).astype(np.int64)

        def node_base(nodes: "pa.Array") -> "pa.Array":
            flags = seed_fn(
                np.asarray(nodes.to_pylist(), dtype=object)
            )
            return pa.array(
                np.where(flags, base_seed, 0).astype(np.int64), pa.int64()
            )

    def init_rank(batch: pa.Table) -> pa.Table:
        nodes = np.asarray(batch.column("node").to_pylist(), dtype=object)
        return batch.set_column(
            batch.schema.get_field_index("rank"),
            "rank",
            pa.array(node_r0(nodes), pa.int64()),
        )

    state = state.map_batches(init_rank, batch_format="pyarrow").materialize()

    def state_as_a(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch.column("bucket").combine_chunks(),
                batch.column("node").combine_chunks(),
                pa.nulls(n, pa.string()),
                pa.array(["r"] * n, pa.string()),
                batch.column("rank").combine_chunks(),
                batch.column("deg").combine_chunks(),
            ],
            schema=_A_SCHEMA,
        )

    def _contrib_rows(e: pa.Table, r: pa.Table) -> pa.Table:
        """Per-edge contribution rows (side 'c', addressed to bucket(dst))
        from co-located edges e(src, dst) and state r(src, rank, deg)."""
        if e.num_rows == 0 or r.num_rows == 0:
            return _A_SCHEMA.empty_table()
        m = e.join(r, keys="src", join_type="inner")
        contrib = pc.divide(  # int64 // int64 floor for non-negatives
            m.column("rank"), m.column("deg")
        )
        dst = m.column("dst").combine_chunks()
        n = m.num_rows
        return pa.Table.from_arrays(
            [
                _bucket_of(dst),
                dst,
                pa.nulls(n, pa.string()),
                pa.array(["c"] * n, pa.string()),
                contrib.combine_chunks()
                if isinstance(contrib, pa.ChunkedArray)
                else contrib,
                pa.nulls(n, pa.int64()),
            ],
            schema=_A_SCHEMA,
        )

    def contribute(group: pa.Table) -> pa.Table:
        # first attach only: contributions from the initial ranks
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        is_edge = pc.equal(g.column("side"), "e")
        return _contrib_rows(
            g.filter(is_edge).select(["src", "dst"]),
            g.filter(pc.invert(is_edge)).select(["src", "rank", "deg"]),
        )

    def make_round(emit_contrib: bool):
        # fused BSP round (one exchange, VERDICT r03 #6 pattern): fold the
        # damped update for this bucket's nodes AND — because the static
        # edge rows key on the same bucket(src) — emit the next round's
        # contribution rows from the just-updated ranks
        def fused_round(group: pa.Table) -> pa.Table:
            g = group.filter(pc.not_equal(group.column("side"), "s"))
            st = g.filter(pc.equal(g.column("side"), "r"))
            if st.num_rows == 0:
                return _A_SCHEMA.empty_table()
            c = g.filter(pc.equal(g.column("side"), "c")).select(["src", "rank"])
            sums = (
                c.group_by("src")
                .aggregate([("rank", "sum")])
                .rename_columns(["src", "csum"])
            )
            m = st.select(["bucket", "src", "deg"]).join(
                sums, keys="src", join_type="left outer"
            )
            csum = m.column("csum").combine_chunks().fill_null(0)
            new_rank = pc.add(
                node_base(m.column("src").combine_chunks()),
                pc.divide(
                    pc.multiply(csum, pa.scalar(_DAMP_NUM, pa.int64())),
                    pa.scalar(_DAMP_DEN, pa.int64()),
                ),
            )
            n = m.num_rows
            new_state = pa.Table.from_arrays(
                [
                    m.column("bucket").combine_chunks(),
                    m.column("src").combine_chunks(),
                    pa.nulls(n, pa.string()),
                    pa.array(["r"] * n, pa.string()),
                    new_rank.combine_chunks()
                    if isinstance(new_rank, pa.ChunkedArray)
                    else new_rank,
                    m.column("deg").combine_chunks(),
                ],
                schema=_A_SCHEMA,
            )
            if not emit_contrib:
                return new_state
            e = g.filter(pc.equal(g.column("side"), "e"))
            out_c = _contrib_rows(
                e.select(["src", "dst"]),
                new_state.select(["src", "rank", "deg"]),
            )
            return (
                pa.concat_tables([new_state, out_c])
                if out_c.num_rows
                else new_state
            )

        return fused_round

    # first contributions (from rank_0) via one attach exchange; every
    # subsequent round folds update + next-round attach in ONE exchange:
    # n_iter + 2 exchanges total instead of 2*n_iter + 1
    cur = (
        edge_rows.union(state.map_batches(state_as_a, batch_format="pyarrow"))
        .union(_sentinels(_A_SCHEMA))
        .groupby("bucket", num_partitions=np_)
        .map_groups(contribute, batch_format="pyarrow")
        .union(state.map_batches(state_as_a, batch_format="pyarrow"))
        .materialize()
    )
    for k in range(n_iter):
        cur = (
            cur.union(edge_rows)
            .union(_sentinels(_A_SCHEMA))
            .groupby("bucket", num_partitions=np_)
            .map_groups(
                make_round(emit_contrib=k < n_iter - 1), batch_format="pyarrow"
            )
            .materialize()
        )

    def final(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("side"), "r"))
        return b.select(["src", "rank"]).rename_columns(["node", "rank_scaled"])

    return cur.map_batches(final, batch_format="pyarrow")


N_LINKS = 3
_LCG_A, _LCG_C = 1103515245, 2654435761


def link_edges(
    doc_ids: "pa.ChunkedArray | pa.Array", n_docs: int
) -> pa.Table:
    """Deterministic synthetic web-link graph over a doc_id column: doc i
    links to ``(A*i + C*k) % n_docs`` for k = 1..N_LINKS (self-links
    rotated off by one). Pure and batch-local — the Ray query maps it per
    batch and the oracle applies it to the whole column; identical edges
    either way. int64 stays exact: max id ~n_docs and A*n_docs << 2^63
    for any test scale."""
    ids = np.asarray(pc.cast(doc_ids, pa.int64()).to_numpy(), dtype=np.int64)
    src = np.repeat(ids, N_LINKS)
    k = np.tile(np.arange(1, N_LINKS + 1, dtype=np.int64), len(ids))
    dst = (src * _LCG_A + k * _LCG_C) % n_docs
    dst = np.where(dst == src, (dst + 1) % n_docs, dst)
    return pa.Table.from_arrays(
        [
            pc.cast(pa.array(src, pa.int64()), pa.string()),
            pc.cast(pa.array(dst, pa.int64()), pa.string()),
        ],
        names=["src", "dst"],
    )


def pagerank_oracle(
    edges: pa.Table,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_fn=None,
) -> pa.Table:
    """Single-process replica — same integer arithmetic, bit-equal."""
    import numpy as np

    src = [str(x) for x in edges.column(src_col).to_pylist()]
    dst = [str(x) for x in edges.column(dst_col).to_pylist()]
    nodes = sorted(set(src) | set(dst))
    deg: dict[str, int] = {}
    for s in src:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    if n == 0:
        return pa.Table.from_pydict(
            {
                "node": pa.array([], pa.string()),
                "rank_scaled": pa.array([], pa.int64()),
            }
        )
    if seed_fn is None:
        is_seed = {v: True for v in nodes}
        r0 = SCALE // n
    else:
        flags = seed_fn(np.asarray(nodes, dtype=object))
        is_seed = {v: bool(f) for v, f in zip(nodes, flags)}
        n_seeds = sum(is_seed.values())
        if n_seeds == 0:
            raise ValueError("personalized pagerank: seed_fn marked no nodes")
        r0 = SCALE // n_seeds
    base = (_DAMP_DEN - _DAMP_NUM) * r0 // _DAMP_DEN
    rank = {v: (r0 if is_seed[v] else 0) for v in nodes}
    for _ in range(n_iter):
        sums = {v: 0 for v in nodes}
        for s, d in zip(src, dst):
            sums[d] += rank[s] // deg[s]
        rank = {
            v: (base if is_seed[v] else 0) + _DAMP_NUM * sums[v] // _DAMP_DEN
            for v in nodes
        }
    return pa.Table.from_pydict(
        {
            "node": pa.array(nodes, pa.string()),
            "rank_scaled": pa.array([rank[v] for v in nodes], pa.int64()),
        }
    )
