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
