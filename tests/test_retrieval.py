"""BM25 top-k vs a naive single-process implementation."""

import math

import pyarrow as pa

import ray.data

from agentic_doc_ray.functions.retrieval import bm25_topk


def _naive_bm25(texts, queries, k=10, k1=1.2, b=0.75):
    toks = [t.strip().split() if t.strip() else [] for t in texts]
    n = len(toks)
    total = sum(len(x) for x in toks)
    out = {}
    for q, terms in queries.items():
        scores = []
        for i, tk in enumerate(toks):
            s = 0.0
            for t in terms:
                df = sum(1 for x in toks if t in x)
                tf = tk.count(t)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                ratio = (len(tk) * n) / total
                s += idf * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * ratio))
            scores.append((-s, i, i))
        out[q] = [i for _, _, i in sorted(scores)[:k]]
    return out


def _run(texts, queries, k=10):
    t = pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts}
    )
    got = bm25_topk(ray.data.from_arrow(t), queries, k=k).to_pandas()
    return {
        q: list(g.sort_values("rank")["doc_id"])
        for q, g in got.groupby("query_id")
    }


def test_bm25_matches_naive():
    texts = [
        "hash join hash hash table",
        "window stream window",
        "the quick vector scan",
        "hash",
        "",
        "   ",
        "join join join window",
        "vector vector vector vector",
    ]
    queries = {"q0": ["hash", "join"], "q1": ["window"], "q2": ["vector", "scan"]}
    assert _run(texts, queries, k=5) == _naive_bm25(texts, queries, k=5)


def test_bm25_rank_is_dense_and_capped():
    texts = ["a b", "a a", "b b", "c"]
    got = bm25_topk(
        ray.data.from_arrow(
            pa.Table.from_pydict({"doc_id": [0, 1, 2, 3], "text": texts})
        ),
        {"qa": ["a"]},
        k=3,
    ).to_pandas()
    assert list(got.sort_values("rank")["rank"]) == [1, 2, 3]


def test_bm25_empty_corpus():
    t = pa.Table.from_pydict(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    got = bm25_topk(ray.data.from_arrow(t), {"q": ["x"]}).to_pandas()
    assert len(got) == 0


def test_rrf_fusion_matches_independent_recompute():
    """Fusion parity: recompute RRF in the test from the two rank lists
    the engine itself produced — pins the fixed-point weights, the
    union-of-candidates semantics, and the (score DESC, doc_id) order."""
    import numpy as np

    from agentic_doc_ray.functions.retrieval import rrf_fusion
    from agentic_doc_ray.functions.similarity import brute_force_topk

    sf = "/root/testdata/sf0.001"
    kw = {"q0": ["hash", "join"], "q1": ["window", "stream"], "q2": ["vector"]}
    vec_ids = {"q0": 0, "q1": 1, "q2": 2}
    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = rrf_fusion(docs, emb, kw, vec_ids, k=10).to_pylist()

    bm = bm25_topk(docs, kw, k=10).take_all()
    q_tbl = emb.take_all()
    vec_of = {int(r["vec_id"]): r["embedding"] for r in q_tbl if r["vec_id"] < 3}
    dense = brute_force_topk(
        emb,
        np.array([vec_of[vec_ids[q]] for q in sorted(kw)], dtype=np.float64),
        [vec_ids[q] for q in sorted(kw)],
        k=10,
    ).to_pylist()
    scores = {}
    for r in bm:
        key = (r["query_id"], int(r["doc_id"]))
        scores[key] = scores.get(key, 0) + 10**12 // (60 + int(r["rank"]))
    name = {v: k for k, v in vec_ids.items()}
    for r in dense:
        key = (name[int(r["query_id"])], int(r["vec_id"]))
        scores[key] = scores.get(key, 0) + 10**12 // (60 + int(r["rank"]))
    want = []
    for q in sorted(kw):
        ranked = sorted(
            ((s, d) for (qq, d), s in scores.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        for rank, (s, d) in enumerate(ranked, 1):
            want.append(
                {"query_id": q, "rank": rank, "doc_id": d, "rrf_score": s}
            )
    assert got == want
    # a doc ranked in both lists must outscore any single-list doc of
    # equal best rank: 2/(60+r) > 1/(60+r)
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rrf_score"])
    for q, ss in per_q.items():
        assert ss == sorted(ss, reverse=True)
