"""Similarity search vs numpy brute-force oracle on the real embeddings."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from agentic_doc_ray.functions.similarity import brute_force_topk, ivf_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    return t


def _oracle_topk(vecs, ids, queries, k):
    unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    q = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    sims = unit @ q.T
    out = []
    for qi in range(q.shape[0]):
        order = np.lexsort((ids, -sims[:, qi]))[:k]
        out.append([int(ids[o]) for o in order])
    return out


def test_brute_force_matches_oracle(emb):
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(emb["vec_id"].to_pylist())
    queries, qids = vecs[:5], [int(i) for i in ids[:5]]
    got = brute_force_topk(
        ray.data.from_arrow(emb).repartition(6), queries, qids, k=10
    ).to_pylist()
    want = _oracle_topk(vecs, ids, queries, 10)
    for qi, qid in enumerate(qids):
        got_ids = [r["vec_id"] for r in got if r["query_id"] == qid]
        assert got_ids == want[qi]
        ranks = [r["rank"] for r in got if r["query_id"] == qid]
        assert ranks == list(range(1, 11))
    # querying with a dataset vector: rank 1 is itself with cosine ~1
    self_hit = next(r for r in got if r["query_id"] == qids[0] and r["rank"] == 1)
    assert self_hit["vec_id"] == qids[0]
    assert self_hit["cosine"] > 0.999999


def test_ivf_topk_is_subset_with_self_hit(emb):
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(emb["vec_id"].to_pylist())
    queries, qids = vecs[:5], [int(i) for i in ids[:5]]
    got = ivf_topk(ray.data.from_arrow(emb), queries, qids, k=10).to_pylist()
    all_ids = set(int(i) for i in ids)
    for qid in qids:
        rows = sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert rows, f"no results for query {qid}"
        assert all(r["vec_id"] in all_ids for r in rows)
        # the query's own vector assigns to its nearest centroid, which the
        # query probes first -> self is always a candidate and ranks first
        assert rows[0]["vec_id"] == qid and rows[0]["cosine"] > 0.999999


def test_pq_topk_matches_replica_oracle(emb):
    from agentic_doc_ray.functions.similarity import pq_topk, pq_topk_oracle

    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(emb["vec_id"].to_pylist())
    queries, qids = vecs[:5], [int(i) for i in ids[:5]]
    want = pq_topk_oracle(emb, queries, qids, k=10).to_pylist()
    # distributed == single-process replica, regardless of block layout
    # (per-vector ADC scores are batch-independent; merge = global sort)
    for parts in (1, 7):
        got = pq_topk(
            ray.data.from_arrow(emb).repartition(parts), queries, qids, k=10
        ).to_pylist()
        assert got == want
    # quantized recall sanity: decent overlap with exact brute-force top-k
    exact = _oracle_topk(vecs, ids, queries, 10)
    overlap = 0
    for qi, qid in enumerate(qids):
        got_ids = {r["vec_id"] for r in want if r["query_id"] == qid}
        overlap += len(got_ids & set(exact[qi]))
    assert overlap >= 30  # >=60% mean recall@10 across the 5 queries


def test_kmeans_separates_planted_clusters():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.similarity import kmeans, kmeans_oracle

    rng = np.random.RandomState(0)
    centers = np.array([[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]])
    vecs = np.vstack([c + rng.standard_normal((30, 4)) * 0.1 for c in centers])
    t = pa.Table.from_pydict(
        {"vec_id": list(range(90)), "embedding": [v.tolist() for v in vecs]}
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(ray.data.from_arrow(t), k=3, n_iter=5).take_all()
    }
    # each planted group maps to exactly one cluster id
    groups = [sorted({got[i] for i in range(g * 30, (g + 1) * 30)}) for g in range(3)]
    assert all(len(g) == 1 for g in groups)
    assert len({g[0] for g in groups}) == 3
    # distributed == single-process replica (exact-integer updates),
    # regardless of block layout
    want = {
        r["vec_id"]: r["cluster"] for r in kmeans_oracle(t, k=3, n_iter=5).to_pylist()
    }
    assert got == want
    got7 = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(ray.data.from_arrow(t).repartition(7), k=3, n_iter=5).take_all()
    }
    assert got7 == want


def test_knn_join_matches_replica_and_recall(ray_session):
    """Distributed kNN join == the single-process replica bit-for-bit,
    and with n_probe == n_centroids (exhaustive probing) it equals the
    exact brute-force neighbor graph."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from agentic_doc_ray.functions.similarity import (
        _unit,
        knn_join,
        knn_join_oracle,
    )

    SF = "/root/testdata/sf0.001"
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = (
        knn_join(ds, k=4)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        knn_join_oracle(t, k=4)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    # exhaustive probing == exact brute force
    n_c = 4
    exact_dist = (
        knn_join(ds, k=3, n_centroids=n_c, n_probe=n_c)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    V = _unit(np.array(t.column("embedding").to_pylist(), dtype=np.float64))
    S = V @ V.T
    rows = []
    for i in range(len(ids)):
        s = S[i].copy()
        keep = ids != ids[i]
        sub_ids, sub_s = ids[keep], s[keep]
        order = np.lexsort((sub_ids, -sub_s))[:3]
        rows += [
            (int(ids[i]), r + 1, int(sub_ids[o])) for r, o in enumerate(order)
        ]
    brute = (
        pd.DataFrame(rows, columns=["vec_id", "rank", "neighbor_id"])
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        exact_dist, brute, check_dtype=False, check_exact=True
    )


def test_random_projection_bit_equal_replica(emb):
    """Distributed JL projection == single-process replica bit-for-bit,
    under a batch size that fragments the input."""
    from agentic_doc_ray.functions.similarity import (
        random_projection,
        random_projection_oracle,
    )

    ds = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = (
        random_projection(ds, out_dim=16, seed=7)
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    want = (
        random_projection_oracle(emb, out_dim=16, seed=7)
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    assert (got.values == want.values).all()
    assert len(got) == emb.num_rows * 16


def test_random_projection_preserves_distances(emb):
    """JL property sanity: projected distances correlate strongly with the
    original distances (seeded ±1 matrix, 64 -> 16 dims)."""
    from agentic_doc_ray.functions.similarity import (
        _list_matrix_micro,
        _rademacher_matrix,
    )

    micro = _list_matrix_micro(emb.column("embedding"), 64)[:200].astype(np.float64)
    proj = micro @ _rademacher_matrix(64, 16, 7).astype(np.float64)
    iu = np.triu_indices(len(micro), 1)
    d2_orig = ((micro[:, None, :] - micro[None, :, :]) ** 2).sum(axis=2)[iu]
    d2_proj = (((proj[:, None, :] - proj[None, :, :]) ** 2).sum(axis=2) / 16.0)[iu]
    # JL concentration for k=16: E[ratio]=1 with stdev ~ sqrt(2/k) ≈ 0.35;
    # synthetic sphere-like embeddings make distances concentrate, so test
    # the per-pair ratio distribution, not a correlation
    ratio = d2_proj / np.maximum(d2_orig, 1.0)
    assert 0.9 < ratio.mean() < 1.1
    assert (np.abs(ratio - 1.0) < 1.0).mean() > 0.95


def test_rademacher_matrix_deterministic_and_balanced():
    from agentic_doc_ray.functions.similarity import _rademacher_matrix

    a = _rademacher_matrix(64, 16, 7)
    b = _rademacher_matrix(64, 16, 7)
    assert (a == b).all()
    assert set(np.unique(a)) == {-1, 1}
    # a different seed gives a different matrix
    assert (a != _rademacher_matrix(64, 16, 8)).any()
    # roughly balanced signs (binomial bound)
    assert abs(int(a.sum())) < 200


def test_binary_quantize_strict_above_mean():
    """Sign bits: strictly-above-global-mean test (a coordinate exactly AT
    the mean gets bit 0 — the cross-multiplication is strict), packing is
    little-endian within each 32-bit word."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.similarity import binary_quantize

    # dim 64; three vectors where dim 0 has values (-1, 0, 1): mean 0, so
    # only the +1 vector sets bit 0. dim 33 all equal: nobody sets it.
    vecs = np.zeros((3, 64), dtype=np.float32)
    vecs[:, 0] = [-0.000001, 0.0, 0.000001]
    vecs[:, 33] = 0.25
    vecs[2, 40] = 0.5
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    )
    out = binary_quantize(ds).to_pandas().sort_values(["vec_id", "word_idx"])
    w = {(r.vec_id, r.word_idx): r.word for r in out.itertuples()}
    assert w[(0, 0)] == 0 and w[(1, 0)] == 0 and w[(2, 0)] == 1  # bit 0
    # dim 33 at the mean everywhere -> bit (33-32)=1 of word 1 never set;
    # dim 40 -> bit 8 of word 1 only for vec 2
    assert w[(0, 1)] == 0 and w[(1, 1)] == 0 and w[(2, 1)] == (1 << 8)


def test_hamming_topk_matches_bruteforce():
    """hamming_topk == brute-force popcount over the same codes at
    sf0.001, ties by vec_id."""
    import numpy as np
    import ray.data

    from agentic_doc_ray.functions.similarity import (
        _dim_micro_sums,
        _list_matrix_micro,
        _pack_sign_bits,
        hamming_topk,
    )

    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = hamming_topk(emb, n_queries=4, k=5).to_pandas()

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    sums, n = _dim_micro_sums(emb, 64)
    micro = _list_matrix_micro(t.column("embedding"), 64)
    codes = _pack_sign_bits(micro, sums, n, 32)
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    rows = []
    for q in range(4):
        qrow = codes[ids == q][0]
        d = np.zeros(len(ids), dtype=np.int64)
        for w in range(codes.shape[1]):
            x = (codes[:, w] ^ qrow[w]).astype(np.uint64)
            d += np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = ids != q
        order = np.lexsort((ids[keep], d[keep]))[:5]
        for rank, j in enumerate(order, start=1):
            rows.append((q, rank, int(ids[keep][j]), int(d[keep][j])))
    import pandas as pd

    want = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "hamming"])
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        want,
        check_dtype=False,
        check_exact=True,
    )


def test_sq8_quantize_exact_and_batch_invariant():
    """SQ8 codes: exact integer levels in [0,255], batch-layout
    independent (global min/max collect), words never touch the sign
    bit, and a zero-span dimension encodes to 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.similarity import (
        SQ8_CODES_PER_WORD,
        sq8_quantize,
    )

    rng = np.random.RandomState(3)
    dim = 16
    vecs = rng.randn(40, dim).astype(np.float32)
    vecs[:, 5] = 0.25  # zero-span dimension
    t = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        df = sq8_quantize(ds, in_dim=dim).to_pandas()
        return df.sort_values(["vec_id", "word_idx"]).reset_index(drop=True)

    a, b = run(1), run(5)
    assert a.equals(b)
    words = a["word"].to_numpy()
    assert (words >= 0).all()  # sign bit untouched by construction
    # unpack and check levels
    micro = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    mn, mx = micro.min(0), micro.max(0)
    span = mx - mn
    want = np.where(span > 0, (micro - mn) * 255 // np.maximum(span, 1), 0)
    n_words = (dim + SQ8_CODES_PER_WORD - 1) // SQ8_CODES_PER_WORD
    got = np.zeros((40, dim), np.int64)
    for r in a.itertuples():
        w = int(r.word)
        base = int(r.word_idx) * SQ8_CODES_PER_WORD
        for i in range(min(SQ8_CODES_PER_WORD, dim - base)):
            got[int(r.vec_id), base + i] = (w >> (8 * i)) & 0xFF
    assert (got == want).all()
    assert (want >= 0).all() and (want <= 255).all()
    assert (want[:, 5] == 0).all()
    assert a["word_idx"].max() == n_words - 1


def test_sq8_topk_adc_recovers_neighbors():
    """ADC parity: a single-process recompute (decode every code, exact
    int64 squared-L2, (dist, vec_id) order) must match the distributed
    partial-merge output; a planted exact duplicate of query 0 must rank
    first at distance 0... almost: its CODES coincide, so ADC distance
    equals the query-to-own-code distance, the minimum possible."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.similarity import sq8_topk

    rng = np.random.RandomState(11)
    dim = 16
    vecs = rng.randn(50, dim).astype(np.float32)
    vecs[37] = vecs[0]  # exact duplicate of query 0
    t = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    got = sq8_topk(
        ray.data.from_arrow(t).repartition(4), n_queries=3, k=5, in_dim=dim
    ).to_pylist()

    micro = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    mn, mx = micro.min(0), micro.max(0)
    span = mx - mn
    codes = np.where(span > 0, (micro - mn) * 255 // np.maximum(span, 1), 0)
    dec = mn + codes * span // 255
    want = []
    for q in range(3):
        d = ((dec - micro[q]) ** 2).sum(axis=1)
        cand = sorted((int(d[i]), i) for i in range(50) if i != q)[:5]
        for rank, (dist, vid) in enumerate(cand, 1):
            want.append(
                {"query_id": q, "rank": rank, "vec_id": vid, "dist": dist}
            )
    assert got == want
    # the planted duplicate of query 0 is its rank-1 neighbor
    assert got[0]["query_id"] == 0 and got[0]["vec_id"] == 37


def test_embedding_gram_exact():
    """Distributed Gram partials == one single-process numpy matmul over
    the whole table, entry for entry (integer-exact)."""
    from agentic_doc_ray.functions.similarity import embedding_gram

    got = embedding_gram(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    flat = np.asarray(
        t.column("embedding").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        ),
        dtype=np.float64,
    )
    n = t.num_rows
    d = len(flat) // n
    x = np.floor(flat * 10**6 + 0.5).astype(np.int64).reshape(n, d)
    g = x.T @ x
    assert len(got) == d * (d + 1) // 2
    assert (got["n_vecs"] == n).all()
    for _, r in got.sample(50, random_state=0).iterrows():
        assert g[int(r["d_i"]), int(r["d_j"])] == r["sumprod_micro2"]


def test_ivf_recall_bounds_and_exhaustive():
    """recall is in [0, 1000]; probing EVERY centroid makes IVF exact, so
    recall@k == 1000 for all queries."""
    from agentic_doc_ray.functions.similarity import ivf_recall

    got = ivf_recall(SF, k=10).to_pandas()
    assert len(got) == 5
    assert got["recall_per_mille"].between(0, 1000).all()

    # exhaustive probing: IVF == brute force exactly
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    import pyarrow.compute as pc

    qt = t.filter(pc.less(t["vec_id"], 5))
    queries = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    qids = [int(x) for x in qt["vec_id"].to_pylist()]
    emb = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    exact = ivf_topk(emb, queries, qids, k=10, n_centroids=8, n_probe=8)
    brute = brute_force_topk(
        ray.data.read_parquet(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        queries,
        qids,
        k=10,
    )
    assert (
        exact.select(["query_id", "rank", "vec_id"]).to_pandas().values.tolist()
        == brute.select(["query_id", "rank", "vec_id"]).to_pandas().values.tolist()
    )


def test_pca_project_matches_replica_and_geometry(emb):
    """Distributed PCA projection is bit-equal to the whole-table replica,
    and the basis actually diagonalizes: recovered component variances
    (from the integer outputs) match the top eigenvalues of the float
    covariance."""
    from agentic_doc_ray.functions.similarity import (
        pca_project,
        pca_project_oracle,
    )

    got = (
        pca_project(SF, k=4)
        .to_pandas()
        .sort_values(["vec_id", "comp"])
        .reset_index(drop=True)
    )
    want = (
        pca_project_oracle(emb, k=4)
        .to_pandas()
        .sort_values(["vec_id", "comp"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()

    # geometry: per-component variance of coord/(n*micro^2) ~= eigenvalue
    micro = 10**6
    n = emb.num_rows
    flat = np.asarray(emb["embedding"].combine_chunks().flatten())
    x = flat.reshape(n, -1).astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    eig = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    coords = got["coord_nscaled"].to_numpy().reshape(n, 4) / (n * micro * micro)
    var = coords.var(axis=0)
    assert np.allclose(var, eig, rtol=1e-3)
    # centering: component means are ~0
    assert np.abs(coords.mean(axis=0)).max() < 1e-9


def test_kcenter_coreset_matches_replica(emb):
    """Distributed Gonzalez traversal is bit-equal to the replica; the
    coverage radius curve is non-increasing; centers are distinct."""
    from agentic_doc_ray.functions.similarity import (
        kcenter_coreset,
        kcenter_oracle,
    )

    got = kcenter_coreset(SF, k=6).to_pandas()
    want = kcenter_oracle(emb, k=6).to_pandas()
    assert got.values.tolist() == want.values.tolist()
    r = got["radius_sq_micro2"].to_numpy()[1:]
    assert (r[1:] <= r[:-1]).all()
    assert got["vec_id"].is_unique


def test_hard_negatives_excludes_same_label():
    """Planted 2-label set: the nearest vector shares the query's label
    and MUST be excluded; negatives come back in exact cosine order."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.similarity import hard_negatives

    # query = e0; same-label near-duplicate at id 1; negatives at 2..5
    vecs = np.array(
        [
            [1.0, 0.0, 0.0],   # 0: the query itself (label 0)
            [0.99, 0.1, 0.0],  # 1: near-dup, label 0 -> excluded
            [0.9, 0.4, 0.0],   # 2: label 1
            [0.5, 0.8, 0.0],   # 3: label 1
            [0.0, 1.0, 0.0],   # 4: label 1
            [-1.0, 0.0, 0.0],  # 5: label 1
        ]
    )
    labels = [0, 0, 1, 1, 1, 1]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(6), pa.int64()),
                "embedding": pa.array(
                    [list(v) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        )
    ).repartition(3)
    res = hard_negatives(ds, vecs[:1], [0], [0], k=3).to_pylist()
    got = [(r["rank"], r["vec_id"]) for r in res]
    assert got == [(1, 2), (2, 3), (3, 4)]  # 0 and 1 excluded (label 0)


def test_mutual_knn_pairs_matches_replica():
    """Distributed mutual-kNN == mutual pairs of the single-process
    knn_join replica on a deterministic planted set."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.similarity import (
        knn_join_oracle,
        mutual_knn_pairs,
        mutual_knn_pairs_oracle,
    )

    rng = np.random.RandomState(3)
    vecs = rng.randn(80, 8)
    t = pa.table(
        {
            "vec_id": pa.array(range(80), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    got = (
        mutual_knn_pairs(ray.data.from_arrow(t).repartition(4), k=4)
        .to_pandas()
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )
    want = mutual_knn_pairs_oracle(knn_join_oracle(t, k=4)).to_pandas()
    assert got.values.tolist() == want.values.tolist()
    # mutuality is symmetric by construction: every pair is canonical
    assert (got["vec_id_a"] < got["vec_id_b"]).all()


def test_centroid_affinity_matches_replica_and_geometry():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.similarity import (
        centroid_affinity,
        centroid_affinity_oracle,
    )

    # label 0 along +x, label 1 along +x too (affinity ~1), label 2 along +y
    vecs, labs = [], []
    rng = np.random.RandomState(5)
    for i in range(30):
        base = [1.0, 0.0, 0.0] if i % 3 < 2 else [0.0, 1.0, 0.0]
        v = np.array(base) + rng.randn(3) * 0.01
        vecs.append([float(x) for x in v])
        labs.append(i % 3)
    t = pa.table(
        {
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labs, pa.int32()),
        }
    )
    got = centroid_affinity(ray.data.from_arrow(t).repartition(4)).to_pandas()
    want = centroid_affinity_oracle(t).to_pandas()
    assert got.values.tolist() == want.values.tolist()
    by = {(r.label_a, r.label_b): r.cosine_micro for r in got.itertuples()}
    assert by[(0, 1)] > 999_000      # same direction
    assert abs(by[(0, 2)]) < 50_000  # near-orthogonal


def test_embedding_clusters_matches_unionfind():
    """Two well-separated planted blobs -> two clusters labeled by their
    min member; distributed CC over mutual-kNN == replica union-find."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.similarity import (
        embedding_clusters,
        embedding_clusters_oracle,
        knn_join_oracle,
    )

    rng = np.random.RandomState(9)
    blob_a = rng.randn(30, 6) * 0.05 + np.array([10, 0, 0, 0, 0, 0])
    blob_b = rng.randn(30, 6) * 0.05 + np.array([0, 10, 0, 0, 0, 0])
    vecs = np.vstack([blob_a, blob_b])
    t = pa.table(
        {
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    got = (
        embedding_clusters(ray.data.from_arrow(t).repartition(4), k=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = (
        embedding_clusters_oracle(knn_join_oracle(t, k=4))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()
    by_cluster = got.groupby("cluster")["vec_id"].apply(list).to_dict()
    # no cluster mixes the two blobs
    for members in by_cluster.values():
        sides = {m // 30 for m in members}
        assert len(sides) == 1


def test_label_mrr_planted_duplicates():
    """A vector with an exact same-label duplicate must have
    first_match_rank == 1; the replica SQL derivation is covered by the
    driver oracle — here we pin the engine's invariants."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.similarity import label_mrr

    rng = np.random.RandomState(3)
    base = rng.randn(40, 8)
    vecs = np.vstack([base, base[:5]])  # 5 exact duplicates
    labels = np.concatenate([np.arange(40) % 4, (np.arange(5) % 4)])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(45), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    got = (
        label_mrr(ray.data.from_arrow(t).repartition(3), k=5, n_probe=16)
        .to_pandas()
        .set_index("vec_id")
    )
    assert len(got) == 45
    # duplicated vectors: nearest neighbor is the exact copy, same label
    for vid in range(5):
        assert got.loc[vid, "first_match_rank"] == 1
        assert got.loc[vid, "mrr_ppm"] == 1_000_000
        assert got.loc[40 + vid, "first_match_rank"] == 1
    # score bounds
    assert ((got["mrr_ppm"] >= 0) & (got["mrr_ppm"] <= 1_000_000)).all()


def test_class_separability_brute_force():
    """Engine moments == brute-force all-pairs dot sums in Python ints."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.similarity import class_separability

    tbl = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    got = class_separability(
        ray.data.from_arrow(tbl).repartition(3)
    ).to_pandas().set_index("label")

    emb = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    micro = np.round(emb * 1_000_000.0).astype(np.int64)
    labs = np.asarray(tbl.column("label").to_pylist(), dtype=np.int64)
    for lab in np.unique(labs):
        inside = micro[labs == lab].astype(object)
        outside = micro[labs != lab].astype(object)
        intra = 0
        for i in range(len(inside)):
            for j in range(len(inside)):
                if i != j:
                    intra += int(np.dot(inside[i], inside[j]))
        inter = int(np.dot(inside.sum(axis=0), outside.sum(axis=0)))
        row = got.loc[lab]
        assert int(row["intra_dot_micro2"]) == intra
        assert int(row["inter_dot_micro2"]) == inter
        assert row["intra_pairs"] == len(inside) * (len(inside) - 1)
        assert row["inter_pairs"] == len(inside) * len(outside)


def test_seeding_is_arrival_order_independent(ray_session):
    """Centroid seeding must be a pure function of CONTENT, not of block
    arrival order (r05 regression guard: `Dataset.limit(n).take_all()`
    follows whichever blocks arrive first under the streaming executor,
    so identical knn_join calls seeded different centroids). Pins:
    (1) _seed_matrix over a shuffled/partitioned view == the replica
    rule on the raw table; (2) knn_join is bit-equal across two
    executions of a multi-block, order-perturbed input."""
    import pandas as pd
    import ray.data

    from agentic_doc_ray.functions.similarity import (
        _seed_matrix,
        _seed_matrix_tbl,
        knn_join,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    # reversed row order + fine partitioning: same content, different
    # arrival layout
    rev = t.take(list(range(t.num_rows - 1, -1, -1)))
    ds_rev = ray.data.from_arrow(rev).repartition(7)

    want = _seed_matrix_tbl(t, 64)
    got = _seed_matrix(ds_rev, 64)
    assert np.array_equal(got, want)

    run1 = (
        knn_join(ds_rev, k=3)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    run2 = (
        knn_join(ds_rev, k=3)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(run1, run2, check_dtype=False, check_exact=True)
