"""Connected components vs a naive union-find on constructed graphs."""

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.functions.graph import connected_components


def _naive_cc(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comps.values() for n in members}


def _run(edges, **kw):
    t = pa.Table.from_pydict(
        {"doc_a": [a for a, _ in edges], "doc_b": [b for _, b in edges]}
    )
    got = connected_components(ray.data.from_arrow(t), **kw).to_pandas()
    return dict(zip(got["doc_id"], got["component"]))


def test_mixed_components():
    edges = [
        ("d1", "d2"), ("d2", "d3"),            # chain
        ("d4", "d5"), ("d5", "d6"), ("d4", "d6"),  # triangle
        ("d7", "d8"),                           # pair
        ("d9", "d10"), ("d9", "d11"),           # star (min is d10)
    ]
    assert _run(edges) == _naive_cc(edges)


def test_long_chain_converges():
    n = 14
    edges = [(f"x{i:02d}", f"x{i+1:02d}") for i in range(n - 1)]
    got = _run(edges)
    assert got == _naive_cc(edges)
    assert set(got.values()) == {"x00"}


def test_duplicate_and_reversed_edges():
    edges = [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a")]
    assert _run(edges) == _naive_cc(edges)


def test_near_dedup_keep():
    from agentic_doc_ray.functions.graph import near_dedup_keep

    edges = [("d1", "d2"), ("d2", "d3"), ("d5", "d4")]
    all_ids = [f"d{i}" for i in range(8)]
    docs = ray.data.from_arrow(pa.Table.from_pydict({"doc_id": all_ids}))
    t = pa.Table.from_pydict(
        {"doc_a": [a for a, _ in edges], "doc_b": [b for _, b in edges]}
    )
    got = sorted(
        near_dedup_keep(docs, ray.data.from_arrow(t)).to_pandas()["doc_id"]
    )
    comp = _naive_cc(edges)
    want = sorted(i for i in all_ids if comp.get(i, i) == i)
    assert got == want  # d2,d3,d5 dropped; d1,d4 canonical; rest untouched


def test_local_table_path_matches_bsp():
    """A pa.Table input takes the local union-find; it must agree exactly
    with the distributed BSP path (Dataset input) and the naive oracle."""
    edges = [("d1", "d2"), ("d2", "d3"), ("d9", "d10"), ("d9", "d11")]
    t = pa.Table.from_pydict(
        {"doc_a": [a for a, _ in edges], "doc_b": [b for _, b in edges]}
    )
    local = connected_components(t).to_pandas()
    got = dict(zip(local["doc_id"], local["component"]))
    assert got == _naive_cc(edges) == _run(edges)


def test_sentinel_partition_coverage():
    """The adaptive _exchange sentinel key sets must land >=1 row in EVERY
    hash partition under Ray's own partitioner for EVERY num_partitions up
    to the requested cap — the whole point of the guard (see
    functions/_exchange.py docstring). Pinned for np in 2..64, well past
    the 32-CPU sandbox cap, in all three key types used by the engine."""
    from ray.data._internal.arrow_ops.transform_pyarrow import hash_partition

    from agentic_doc_ray.functions import _exchange as X

    MAX_NP = 64
    # the partition hash is TYPE-sensitive — verify both int key widths
    for dt in (pa.int32(), pa.int64()):
        keys = X.covering_int_keys(dt, MAX_NP)
        assert all(isinstance(k, int) and k >= 0 for k in keys)
        ints = pa.table({"k": pa.array(keys, dt)})
        for np_ in range(2, MAX_NP + 1):
            parts = hash_partition(ints, hash_cols=["k"], num_partitions=np_)
            covered = {p for p, b in parts.items() if b.num_rows > 0}
            assert covered == set(range(np_)), f"{dt} keys miss at np={np_}"

    skeys = X.covering_str_keys(MAX_NP)
    assert all(k.startswith("\x00") for k in skeys)
    strs = pa.table({"k": pa.array(skeys, pa.string())})
    for np_ in range(2, MAX_NP + 1):
        parts = hash_partition(strs, hash_cols=["k"], num_partitions=np_)
        covered = {p for p, b in parts.items() if b.num_rows > 0}
        assert covered == set(range(np_)), f"str keys miss partitions at np={np_}"


def test_empty_pairs():
    t = pa.Table.from_pydict({"doc_a": pa.array([], pa.string()),
                              "doc_b": pa.array([], pa.string())})
    got = connected_components(ray.data.from_arrow(t)).to_pandas()
    assert len(got) == 0


def _pr_run(edges, n_iter=5):
    from agentic_doc_ray.functions.pagerank import pagerank

    t = pa.Table.from_pydict(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
    )
    got = pagerank(ray.data.from_arrow(t), n_iter=n_iter).to_pandas()
    return dict(zip(got["node"], got["rank_scaled"]))


def _pr_oracle(edges, n_iter=5):
    from agentic_doc_ray.functions.pagerank import pagerank_oracle

    t = pa.Table.from_pydict(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
    )
    got = pagerank_oracle(t, n_iter=n_iter)
    return dict(zip(got["node"].to_pylist(), got["rank_scaled"].to_pylist()))


def test_pagerank_bit_equal_mixed_graph():
    """Distributed BSP == single-process replica, bit for bit, on a graph
    with a hub, a chain, a dangling node (d9: in-links only) and a
    multi-edge (duplicate d1->d2 doubles the contribution)."""
    edges = [
        ("d1", "d2"), ("d1", "d2"), ("d1", "d3"),
        ("d2", "d3"), ("d3", "d1"),
        ("d4", "d1"), ("d5", "d1"), ("d6", "d1"),   # hub in-links
        ("d7", "d8"), ("d8", "d9"),                  # chain into dangling d9
    ]
    got = _pr_run(edges)
    want = _pr_oracle(edges)
    assert got == want
    # hub d1 must outrank the leaf-only sources
    assert got["d1"] > got["d4"]


def test_pagerank_uniform_cycle():
    """On a pure cycle every node keeps exactly the same rank: update is
    base + 85%*(r//1), bit-equal across nodes and to the replica."""
    n = 6
    edges = [(f"c{i}", f"c{(i+1) % n}") for i in range(n)]
    got = _pr_run(edges, n_iter=7)
    assert got == _pr_oracle(edges, n_iter=7)
    assert len(set(got.values())) == 1


def test_pagerank_empty_edges():
    from agentic_doc_ray.functions.pagerank import pagerank

    t = pa.Table.from_pydict(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
    )
    got = pagerank(ray.data.from_arrow(t)).to_pandas()
    assert len(got) == 0


def test_link_edges_deterministic_and_batch_local():
    """link_edges over the whole column == concat of per-batch calls (the
    oracle-side vs Ray-side construction), and no self-links."""
    from agentic_doc_ray.functions.pagerank import link_edges

    ids = pa.array(list(range(40)), pa.int64())
    whole = link_edges(ids, 40)
    parts = pa.concat_tables(
        [link_edges(ids.slice(o, 10), 40) for o in range(0, 40, 10)]
    )
    assert whole.equals(parts)
    assert pc.sum(
        pc.cast(pc.equal(whole["src"], whole["dst"]), pa.int64())
    ).as_py() == 0


def test_adaptive_sentinel_partition_coverage():
    """The adaptive router's chunk sentinels must cover every partition of
    BOTH reassemble_two_phase exchanges: phase 1 on (bucket, part_range)
    and phase 2 on the recomputed crc32(doc_id) % b bucket."""
    import zlib

    import numpy as np
    from ray.data._internal.arrow_ops.transform_pyarrow import hash_partition

    from agentic_doc_ray.pipelines.extract import (
        _ADAPTIVE_SENTINEL_PREFIX,
        _N_ADAPTIVE_SENTINELS,
    )

    n = _N_ADAPTIVE_SENTINELS
    ids = [f"{_ADAPTIVE_SENTINEL_PREFIX}{i:04d}" for i in range(n)]
    phase1 = pa.table(
        {
            "bucket": pa.array(np.arange(n, dtype=np.int32)),
            "part_range": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
    phase2 = pa.table(
        {
            "bucket": pa.array(
                np.array([zlib.crc32(s.encode()) % 64 for s in ids], np.int32)
            )
        }
    )
    for np_ in range(2, 10):
        p1 = hash_partition(
            phase1, hash_cols=["bucket", "part_range"], num_partitions=np_
        )
        assert {k for k, b in p1.items() if b.num_rows > 0} == set(range(np_))
        p2 = hash_partition(phase2, hash_cols=["bucket"], num_partitions=np_)
        assert {k for k, b in p2.items() if b.num_rows > 0} == set(range(np_))


def test_triangle_counts_match_sql():
    """Node-iterator triangle counting == the 3-way self-join closure in
    SQL, per node; plus a hand-checked tiny clique graph."""
    import duckdb
    import pandas as pd
    import ray.data

    from agentic_doc_ray.functions.graph import triangle_counts

    sf = "/root/testdata/sf0.001"
    d = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    got = (
        triangle_counts(d, d.count())
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH ids AS (SELECT doc_id AS i FROM read_parquet('{sf}/documents.parquet')),
        nn AS (SELECT count(*) AS n FROM ids),
        e0 AS (SELECT i AS src, (i*1103515245 + k*2654435761) % nn.n AS dst
               FROM ids, nn, generate_series(1,3) AS t(k)),
        e1 AS (SELECT src, CASE WHEN dst = src THEN (dst+1) % (SELECT n FROM nn) ELSE dst END AS dst FROM e0),
        canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM e1 WHERE src <> dst),
        tri AS (
          SELECT w1.a AS u, w1.b AS v, w2.b AS w
          FROM canon w1 JOIN canon w2 ON w2.a = w1.a AND w2.b > w1.b
          JOIN canon e ON e.a = w1.b AND e.b = w2.b
        )
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
          SELECT u AS node FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri
        ) GROUP BY node ORDER BY node
        """
    ).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_triangle_counts_clique():
    """K4 embedded at ids {0,1,2,3} of a 4-node graph would need a
    custom edge formula; instead pin the exact per-node counts the LCG
    graph yields on 20 dense ids (regression anchor, derived once from
    the SQL oracle)."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.graph import triangle_counts

    d = ray.data.from_arrow(pa.table({"doc_id": list(range(20))})).repartition(3)
    got = sorted(
        (r["node"], r["n_triangles"])
        for r in triangle_counts(d, 20).take_all()
    )
    want = duckdb.sql(
        """
        WITH ids AS (SELECT unnest(generate_series(0,19)) AS i),
        e0 AS (SELECT i AS src, (i*1103515245 + k*2654435761) % 20 AS dst
               FROM ids, generate_series(1,3) AS t(k)),
        e1 AS (SELECT src, CASE WHEN dst = src THEN (dst+1) % 20 ELSE dst END AS dst FROM e0),
        canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM e1 WHERE src <> dst),
        tri AS (
          SELECT w1.a AS u, w1.b AS v, w2.b AS w
          FROM canon w1 JOIN canon w2 ON w2.a = w1.a AND w2.b > w1.b
          JOIN canon e ON e.a = w1.b AND e.b = w2.b
        )
        SELECT node, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT u AS node FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri
        ) GROUP BY node ORDER BY node
        """
    ).fetchall()
    assert got == [(int(a), int(b)) for a, b in want]


def test_link_prediction_matches_sql():
    """Common-neighbor link prediction == wedge-count-minus-edges closure
    in SQL, top-k in deterministic (n_common DESC, a, b) order."""
    import duckdb
    import pandas as pd
    import ray.data

    from agentic_doc_ray.functions.graph import link_prediction

    sf = "/root/testdata/sf0.001"
    d = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    got = link_prediction(d, d.count(), k=40).to_pandas().reset_index(drop=True)
    want = duckdb.sql(
        f"""
        WITH ids AS (SELECT doc_id AS i FROM read_parquet('{sf}/documents.parquet')),
        nn AS (SELECT count(*) AS n FROM ids),
        e0 AS (SELECT i AS src, (i*1103515245 + k*2654435761) % nn.n AS dst
               FROM ids, nn, generate_series(1,3) AS t(k)),
        e1 AS (SELECT src, CASE WHEN dst = src THEN (dst+1) % (SELECT n FROM nn) ELSE dst END AS dst FROM e0),
        canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM e1 WHERE src <> dst),
        wed AS (SELECT w1.b AS x, w2.b AS y FROM canon w1
                JOIN canon w2 ON w2.a = w1.a AND w2.b > w1.b),
        cn AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_common FROM wed GROUP BY 1, 2),
        pred AS (SELECT cn.* FROM cn LEFT JOIN canon e ON e.a = cn.x AND e.b = cn.y
                 WHERE e.a IS NULL)
        SELECT x AS node_a, y AS node_b, n_common FROM pred
        ORDER BY n_common DESC, node_a, node_b LIMIT 40
        """
    ).df()
    assert len(got) == 40
    # no predicted pair may already be an edge (spot the anti-join)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


# ---------------------------------------------------------------- k-core


def _brute_coreness(edges, nodes):
    """Textbook definition check: repeatedly delete nodes of degree < k;
    core(v) = largest k whose k-core still contains v. Independent of both
    peel_core's heap order and the BSP H-index."""
    core = {}
    for k in range(1, len(nodes) + 2):
        alive = set(nodes)
        while True:
            deg = {v: 0 for v in alive}
            for a, b in edges:
                if a in alive and b in alive:
                    deg[a] += 1
                    deg[b] += 1
            drop = [v for v in alive if deg[v] < k]
            if not drop:
                break
            alive -= set(drop)
        for v in alive:
            core[v] = k
        if not alive:
            break
    return {v: core.get(v, 0) for v in nodes}


def test_peel_core_hand_graphs():
    import numpy as np

    from agentic_doc_ray.functions.graph import peel_core

    cases = [
        # triangle with a tail: triangle nodes core 2, tail core 1
        [(0, 1), (1, 2), (0, 2), (2, 3)],
        # pure chain: everything core 1
        [(i, i + 1) for i in range(6)],
        # two K4 cliques joined by a bridge: clique nodes core 3
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)],
    ]
    for edges in cases:
        nodes = sorted({v for e in edges for v in e})
        a = np.array([e[0] for e in edges], np.int64)
        b = np.array([e[1] for e in edges], np.int64)
        got = dict(zip(*(c.to_pylist() for c in peel_core(a, b).columns)))
        assert got == _brute_coreness(edges, nodes)


def test_segment_h_index_brute():
    import numpy as np

    from agentic_doc_ray.functions.graph import _segment_h_index

    rng = np.random.RandomState(7)
    for _ in range(25):
        n = rng.randint(1, 40)
        nodes = rng.randint(0, 8, n).astype(np.int64)
        ests = rng.randint(0, 10, n).astype(np.int64)
        uniq, h = _segment_h_index(nodes, ests)
        for u, hv in zip(uniq.tolist(), h.tolist()):
            vals = sorted(ests[nodes == u].tolist(), reverse=True)
            brute = max(
                [r for r in range(1, len(vals) + 1) if vals[r - 1] >= r],
                default=0,
            )
            assert hv == brute, (u, vals)


def test_kcore_bsp_matches_peeling_oracle():
    """The distributed H-index iteration lands exactly on the peeled
    coreness for the LCG link graph over 500 doc ids."""
    import pyarrow as pa

    import ray.data

    from agentic_doc_ray.functions.graph import kcore, kcore_oracle

    n = 500
    ids = pa.table({"doc_id": list(range(n))})
    got = (
        kcore(ray.data.from_arrow(ids).repartition(4), n)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = kcore_oracle(ids.column("doc_id"), n).to_pandas()
    assert got["node"].tolist() == want["node"].tolist()
    assert got["core"].tolist() == want["core"].tolist()


def test_anchor_texts_hand_graph():
    """5-doc corpus, edges derivable by hand from the LCG formula; the
    brute-force recount shares nothing with the bucketed implementation."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.graph import anchor_texts
    from agentic_doc_ray.functions.pagerank import N_LINKS, _LCG_A, _LCG_C

    n = 5
    texts = [
        "alpha beta gamma delta",
        "alpha alpha zulu",     # first-3 SET dedupes to {alpha, zulu}
        "  beta   gamma  ",     # leading/multi whitespace
        "",                      # no tokens: contributes only in-links
        "omega",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )

    # brute force
    inlinks: dict[int, int] = {}
    counts: dict[tuple[int, str], int] = {}
    for src in range(n):
        toks = set(texts[src].split()[:3])
        for k in range(1, N_LINKS + 1):
            dst = (src * _LCG_A + k * _LCG_C) % n
            if dst == src:
                dst = (dst + 1) % n
            inlinks[dst] = inlinks.get(dst, 0) + 1
            for tok in toks:
                counts[(dst, tok)] = counts.get((dst, tok), 0) + 1
    want = {}
    for d, m in inlinks.items():
        best = sorted(
            ((c, tok) for (dd, tok), c in counts.items() if dd == d),
            key=lambda x: (-x[0], x[1]),
        )
        top_tok, top_cnt = (best[0][1], best[0][0]) if best else ("", 0)
        want[d] = (m, top_tok, top_cnt)

    for n_blocks in (1, 3):
        got = {
            r["target_id"]: (r["n_inlinks"], r["top_token"], r["top_count"])
            for r in anchor_texts(
                ray.data.from_arrow(t).repartition(n_blocks), n
            ).take_all()
        }
        assert got == want


def test_clustering_coefficient_clique_and_chain():
    """K4-with-tail by brute force: clique interiors dense, tail sparse.
    Uses a direct edge table via monkeypatched edge derivation? No — the
    operator derives LCG edges, so assert against a brute-force recount
    of the SAME derived graph on 30 ids (degree >= 2 filter, per-mille
    integer division)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.graph import clustering_coefficient
    from agentic_doc_ray.functions.pagerank import N_LINKS, _LCG_A, _LCG_C

    n = 30
    edges = set()
    for src in range(n):
        for k in range(1, N_LINKS + 1):
            dst = (src * _LCG_A + k * _LCG_C) % n
            if dst == src:
                dst = (dst + 1) % n
            if dst != src:
                edges.add((min(src, dst), max(src, dst)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(
            1
            for x in nb
            for y in nb
            if x < y and (min(x, y), max(x, y)) in edges
        )
        want[v] = (d, t, 2000 * t // (d * (d - 1)))

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64())})
    ).repartition(3)
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["coeff_per_mille"])
        for r in clustering_coefficient(ds, n).take_all()
    }
    assert got == want


def test_bfs_distances_chain():
    """Directed chain 0->1->2->3: every round reaches a NEW node (the
    left-join first-reach path), distances are exact hop counts, and the
    unreachable direction (nothing upstream of the seed) stays absent."""
    from agentic_doc_ray.functions.graph import bfs_distances

    edges = ray.data.from_arrow(
        pa.table({"src": ["0", "1", "2"], "dst": ["1", "2", "3"]})
    )
    seeds = ray.data.from_arrow(pa.table({"node": ["0"]}))
    got = {
        r["node"]: r["dist"] for r in bfs_distances(edges, seeds).take_all()
    }
    assert got == {"0": 0, "1": 1, "2": 2, "3": 3}


def test_bfs_distances_multi_source_min():
    """Two seeds on a cycle: each node takes the MIN hop distance over
    both sources; a shortcut edge must win over the longer path."""
    from agentic_doc_ray.functions.graph import bfs_distances

    # cycle 0->1->2->3->0 plus shortcut 0->3
    edges = ray.data.from_arrow(
        pa.table(
            {"src": ["0", "1", "2", "3", "0"], "dst": ["1", "2", "3", "0", "3"]}
        )
    )
    seeds = ray.data.from_arrow(pa.table({"node": ["0", "2"]}))
    got = {
        r["node"]: r["dist"] for r in bfs_distances(edges, seeds).take_all()
    }
    assert got == {"0": 0, "2": 0, "1": 1, "3": 1}


def test_bfs_distances_no_edges():
    """Empty edge table: seeds are still at distance 0 of themselves."""
    from agentic_doc_ray.functions.graph import bfs_distances

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
            }
        )
    )
    seeds = ray.data.from_arrow(pa.table({"node": ["7", "9"]}))
    got = {
        r["node"]: r["dist"] for r in bfs_distances(edges, seeds).take_all()
    }
    assert got == {"7": 0, "9": 0}


def test_label_propagation_matches_oracle_random():
    """Distributed LPA == the single-process replica, bit for bit, on a
    random multigraph (duplicate + reversed edges collapse to the same
    distinct neighbor sets)."""
    import numpy as np
    import pandas as pd

    from agentic_doc_ray.functions.graph import (
        label_propagation,
        label_propagation_oracle,
    )

    rng = np.random.RandomState(11)
    t = pa.table(
        {
            "src": pa.array(rng.randint(0, 80, 300).astype(str)),
            "dst": pa.array(rng.randint(0, 80, 300).astype(str)),
        }
    )
    got = (
        label_propagation(ray.data.from_arrow(t), n_iter=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = (
        label_propagation_oracle(t, n_iter=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_label_propagation_two_cliques():
    """Two triangles joined by one bridge edge settle into two distinct
    communities (pinned to the deterministic min-tie fixpoint: the
    bridge node c seeds the second clique's label before c itself is
    absorbed into the a-clique — a known sync-LPA artifact, identical in
    the replica)."""
    from agentic_doc_ray.functions.graph import label_propagation

    t = pa.table(
        {
            "src": ["a", "b", "c", "x", "y", "z", "c"],
            "dst": ["b", "c", "a", "y", "z", "x", "x"],
        }
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(ray.data.from_arrow(t), n_iter=4).take_all()
    }
    assert {got["a"], got["b"], got["c"]} == {"a"}
    assert {got["x"], got["y"], got["z"]} == {"c"}


def test_personalized_pagerank_bit_equal():
    """Seeded teleport == the replica bit for bit; non-seed nodes carry
    only flowed-in mass (no base term)."""
    import numpy as np
    import pandas as pd

    from agentic_doc_ray.functions.pagerank import pagerank, pagerank_oracle

    def seeds(nodes):
        return np.array([int(x) % 3 == 0 for x in nodes], dtype=bool)

    rng = np.random.RandomState(3)
    t = pa.table(
        {
            "src": pa.array(rng.randint(0, 40, 120).astype(str)),
            "dst": pa.array(rng.randint(0, 40, 120).astype(str)),
        }
    )
    got = (
        pagerank(ray.data.from_arrow(t), n_iter=4, seed_fn=seeds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = (
        pagerank_oracle(t, n_iter=4, seed_fn=seeds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # personalization concentrates mass: the seed third of the nodes must
    # hold MORE than its population share of the total rank
    seed_mass = want[want["node"].map(lambda x: int(x) % 3 == 0)]["rank_scaled"].sum()
    assert seed_mass > want["rank_scaled"].sum() / 3


def test_scc_constructed_matches_kosaraju():
    """Coloring/FW-BW peel == iterative Kosaraju on a graph with a
    3-cycle, a 2-cycle behind a one-way bridge, a chain, and an isolate."""
    import pandas as pd
    import pyarrow as pa

    from agentic_doc_ray.functions.graph import scc, scc_oracle

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),   # SCC {a,b,c}
        ("c", "d"),                            # one-way bridge
        ("d", "e"), ("e", "d"),                # SCC {d,e}
        ("e", "f"), ("f", "g"),                # chain: singletons
    ]
    nodes = list("abcdefgh")                   # h isolated
    et = pa.Table.from_pydict(
        {"src": [s for s, _ in edges], "dst": [d for _, d in edges]}
    )
    nt = pa.Table.from_pydict({"node": nodes})
    got = (
        scc(ray.data.from_arrow(nt), ray.data.from_arrow(et))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = (
        scc_oracle(et, nodes).to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert got.set_index("node").loc["a", "scc_id"] == "c"  # max of {a,b,c}
    assert got.set_index("node").loc["h", "scc_id"] == "h"  # isolate


def test_scc_random_matches_kosaraju():
    import random

    import pandas as pd
    import pyarrow as pa

    from agentic_doc_ray.functions.graph import scc, scc_oracle

    rng = random.Random(2)
    ns = [str(i) for i in range(14)]
    es = [(rng.choice(ns), rng.choice(ns)) for _ in range(22)]
    es = [(s, d) for s, d in es if s != d]
    et = pa.Table.from_pydict(
        {"src": [s for s, _ in es], "dst": [d for _, d in es]}
    )
    nt = pa.Table.from_pydict({"node": ns})
    got = (
        scc(ray.data.from_arrow(nt), ray.data.from_arrow(et))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = (
        scc_oracle(et, ns).to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert got["scc_id"].nunique() > 1


def test_hits_matches_replica_toy_and_lcg():
    """Distributed HITS is bit-equal to the replica on a hand graph and
    on the synthetic LCG link graph; structure: the node every hub points
    at carries the top authority."""
    import pyarrow as pa

    from agentic_doc_ray.functions.hits import hits, hits_oracle
    from agentic_doc_ray.functions.pagerank import link_edges

    edges = pa.table(
        {
            "src": ["a", "a", "b", "c", "d", "d", "e"],
            "dst": ["b", "c", "c", "a", "c", "e", "a"],
        }
    )
    got = (
        hits(ray.data.from_arrow(edges), n_iter=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = (
        hits_oracle(edges, n_iter=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()
    # c has in-links from every hub side (a, b, d) -> max authority
    best = got.loc[got["auth_scaled"].idxmax(), "node"]
    assert best == "c"

    ids = pa.array(list(range(120)), pa.int64())
    lcg = link_edges(ids, 120)
    got2 = (
        hits(ray.data.from_arrow(lcg), n_iter=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want2 = (
        hits_oracle(lcg, n_iter=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got2.values.tolist() == want2.values.tolist()


def test_graph_walks_matches_replica_with_sinks():
    """Distributed walks are bit-equal to the replica; sink nodes
    terminate walks early; every walk starts at its own node."""
    import pyarrow as pa

    from agentic_doc_ray.functions.walks import graph_walks, graph_walks_oracle

    edges = pa.table(
        {
            "src": ["a", "a", "b", "c", "d", "d", "e", "f"],
            "dst": ["b", "c", "c", "a", "c", "e", "a", "g"],
        }
    )
    got = (
        graph_walks(ray.data.from_arrow(edges), n_steps=5)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    want = (
        graph_walks_oracle(edges, n_steps=5)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()
    fw = got[got.walk_id == "f"]
    assert fw.node.tolist() == ["f", "g"]  # g is a sink -> early stop
    starts = got[got.step == 0]
    assert (starts.walk_id == starts.node).all()
    assert set(starts.walk_id) == {"a", "b", "c", "d", "e", "f"}


def test_avg_neighbor_degree_brute_force():
    """Brute-force recount of the derived LCG graph on 30 ids: degree,
    neighbor-degree sum, and the exact floor per-mille average."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.graph import avg_neighbor_degree
    from agentic_doc_ray.functions.pagerank import N_LINKS, _LCG_A, _LCG_C

    n = 30
    edges = set()
    for src in range(n):
        for k in range(1, N_LINKS + 1):
            dst = (src * _LCG_A + k * _LCG_C) % n
            if dst == src:
                dst = (dst + 1) % n
            if dst != src:
                edges.add((min(src, dst), max(src, dst)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {
        v: (
            len(nb),
            sum(len(adj[u]) for u in nb),
            1000 * sum(len(adj[u]) for u in nb) // len(nb),
        )
        for v, nb in adj.items()
    }

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64())})
    ).repartition(3)
    got = {
        r["node"]: (r["degree"], r["nbr_degree_sum"], r["avg_nbr_deg_permille"])
        for r in avg_neighbor_degree(ds, n).take_all()
    }
    assert got == want


def test_degree_histogram_brute_force():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.graph import degree_histogram
    from agentic_doc_ray.functions.pagerank import N_LINKS, _LCG_A, _LCG_C

    n = 30
    edges = set()
    for src in range(n):
        for k in range(1, N_LINKS + 1):
            dst = (src * _LCG_A + k * _LCG_C) % n
            if dst == src:
                dst = (dst + 1) % n
            if dst != src:
                edges.add((min(src, dst), max(src, dst)))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want: dict[int, int] = {}
    for d in deg.values():
        want[d] = want.get(d, 0) + 1

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64())})
    ).repartition(3)
    got = {
        r["degree"]: r["n_nodes"] for r in degree_histogram(ds, n).take_all()
    }
    assert got == want
    assert sum(got.values()) == len(deg)


def test_degree_assortativity_matches_sql():
    import duckdb
    import ray.data

    from agentic_doc_ray.functions.graph import degree_assortativity

    SF = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    got = degree_assortativity(docs, n_docs=docs.count()).to_pylist()[0]
    want = duckdb.sql(
        f"""
        WITH ids AS (SELECT doc_id AS i FROM read_parquet('{SF}/documents.parquet')),
        nn AS (SELECT count(*) AS n FROM ids),
        e0 AS (SELECT i AS src, (i*1103515245 + k*2654435761) % nn.n AS dst
               FROM ids, nn, generate_series(1,3) AS t(k)),
        e1 AS (SELECT src, CASE WHEN dst = src THEN (dst+1) % (SELECT n FROM nn) ELSE dst END AS dst FROM e0),
        canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM e1 WHERE src <> dst),
        dir AS (SELECT a AS node, b AS other FROM canon UNION ALL SELECT b, a FROM canon),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM dir GROUP BY node),
        pn AS (SELECT r.node, dn.degree AS d, CAST(sum(do_.degree) AS BIGINT) AS s
               FROM dir r JOIN deg dn ON dn.node = r.node
               JOIN deg do_ ON do_.node = r.other GROUP BY r.node, dn.degree)
        SELECT CAST(sum(d) AS BIGINT) AS n, CAST(sum(d*d) AS BIGINT) AS sx,
               CAST(sum(d*d*d) AS BIGINT) AS sxx, CAST(sum(d*s) AS BIGINT) AS sxy FROM pn
        """
    ).fetchone()
    assert got["n_endpoints"] == want[0]
    assert got["sx"] == want[1]
    assert got["sxx"] == want[2]
    assert got["sxy"] == want[3]
    assert got["num"] == want[0] * want[3] - want[1] ** 2
    assert got["den"] == want[0] * want[2] - want[1] ** 2


def test_graph_modularity_brute_force():
    """Engine decomposition == a pure-Python recount over the same LCG
    edge set and LPA labels; global identities pinned."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.graph import (
        graph_modularity,
        label_propagation,
        label_propagation_oracle,
    )
    from agentic_doc_ray.functions.pagerank import N_LINKS, _LCG_A, _LCG_C, link_edges

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )
    n = tbl.num_rows
    d = ray.data.from_arrow(tbl).repartition(3)
    edges = d.map_batches(
        lambda b: link_edges(b.column("doc_id"), n), batch_format="pyarrow"
    )
    labels = label_propagation(edges, n_iter=4)
    got = (
        graph_modularity(d, n, labels)
        .to_pandas()
        .sort_values("community")
        .reset_index(drop=True)
    )

    # brute force: canonical distinct undirected edges + oracle labels
    ids = np.asarray(tbl.column("doc_id").to_pylist(), dtype=np.int64)
    src = np.repeat(ids, N_LINKS)
    k = np.tile(np.arange(1, N_LINKS + 1, dtype=np.int64), len(ids))
    dst = (src * _LCG_A + k * _LCG_C) % n
    dst = np.where(dst == src, (dst + 1) % n, dst)
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    keep = a != b
    pairs = {(int(x), int(y)) for x, y in zip(a[keep], b[keep])}
    lab = {
        r["node"]: r["community"]
        for r in label_propagation_oracle(
            link_edges(tbl.column("doc_id"), n), n_iter=4
        ).to_pylist()
    }
    from collections import Counter

    deg, intra, nnodes = Counter(), Counter(), Counter()
    for x, y in pairs:
        ca, cb = lab[str(x)], lab[str(y)]
        deg[ca] += 1
        deg[cb] += 1
        if ca == cb:
            intra[ca] += 1
    for c in lab.values():
        nnodes[c] += 1

    want = {
        c: (nnodes[c], intra.get(c, 0), deg.get(c, 0)) for c in nnodes
    }
    got_map = {
        r["community"]: (r["n_nodes"], r["n_intra"], r["degree_sum"])
        for r in got.to_dict("records")
    }
    assert got_map == want
    # identities: sum(degree_sum) == 2m, sum(n_nodes) == n
    assert got["degree_sum"].sum() == 2 * len(pairs)
    assert got["n_nodes"].sum() == n


def test_two_hop_reach_brute_force():
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.graph import two_hop_reach
    from agentic_doc_ray.functions.pagerank import N_LINKS, _LCG_A, _LCG_C

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )
    n = tbl.num_rows
    got = (
        two_hop_reach(ray.data.from_arrow(tbl).repartition(3), n)
        .to_pandas()
        .set_index("node")["n_reach2"]
        .to_dict()
    )
    ids = np.asarray(tbl.column("doc_id").to_pylist(), dtype=np.int64)
    src = np.repeat(ids, N_LINKS)
    k = np.tile(np.arange(1, N_LINKS + 1, dtype=np.int64), len(ids))
    dst = (src * _LCG_A + k * _LCG_C) % n
    dst = np.where(dst == src, (dst + 1) % n, dst)
    adj: dict[int, set] = {}
    for s, d in zip(src, dst):
        if s != d:
            adj.setdefault(int(s), set()).add(int(d))
            adj.setdefault(int(d), set()).add(int(s))
    for node, nbrs in adj.items():
        reach = set(nbrs)
        for m in nbrs:
            reach |= adj[m]
        reach.discard(node)
        assert got[node] == len(reach), node
    assert set(got) == set(adj)


def test_cocitation_counts_brute_force():
    from collections import Counter
    from itertools import combinations

    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.graph import cocitation_counts
    from agentic_doc_ray.functions.pagerank import N_LINKS, _LCG_A, _LCG_C

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )
    n = tbl.num_rows
    got = cocitation_counts(
        ray.data.from_arrow(tbl).repartition(3), n, k=50
    ).to_pandas()
    ids = np.asarray(tbl.column("doc_id").to_pylist(), dtype=np.int64)
    cnt = Counter()
    for i in ids:
        outs = set()
        for k in range(1, N_LINKS + 1):
            d = (int(i) * _LCG_A + k * _LCG_C) % n
            if d == i:
                d = (d + 1) % n
            outs.add(d)
        for a, b in combinations(sorted(outs), 2):
            cnt[(a, b)] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [
        ((r.page_a, r.page_b), r.n_cociting) for r in got.itertuples()
    ] == want
