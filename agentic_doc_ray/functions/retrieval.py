"""BM25 keyword retrieval over the documents table.

The retrieval primitive a training-data pipeline needs for targeted
corpus inspection (pull the top-k documents for audit queries) without
building a persistent index. Two streaming passes, no corpus shuffle:

  1. corpus statistics — N, total token count, and per-term document
     frequency for the QUERY terms only — as per-batch vectorized
     partials tree-reduced (repartition + merge) so the driver reads
     O(4) tiny rows however many blocks the corpus has;
  2. vectorized scoring per batch against the broadcast stats, local
     top-k per (query, block), then one tiny groupby(query_id) merge —
     k x n_blocks candidate rows per query cross the exchange, never
     documents.

Output is (query_id, rank, doc_id) — scores stay internal: float
ordering is engine-specific in the last ulp, while ranks with doc_id
tie-breaks compare exactly against the DuckDB oracle (same contract as
similarity_topk). Tokenization is the engine's standard whitespace
split on RE2-trimmed text (functions/text.py), which the oracle mirrors
token-for-token.

BM25 constants k1=1.2, b=0.75 (Robertson et al.); idf is the
"plus-one" form ln(1 + (N - df + 0.5)/(df + 0.5)), non-negative for
any df. Arithmetic follows the oracle's association order exactly
(e.g. dl*N/total, not dl/avgdl) so equal inputs give bit-equal scores.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from agentic_doc_ray.context import shuffle_partitions
from agentic_doc_ray.functions.text import _regex_trim, _token_count

K1 = 1.2
B = 0.75


def _tf_dl(batch: pa.Table, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(n_rows x n_terms) exact term counts + token lengths per doc."""
    text = batch.column("text")
    dl = _token_count(text).to_numpy(zero_copy_only=False)
    toks = pc.split_pattern_regex(_regex_trim(text), r"\s+")
    flat = pc.list_flatten(toks).combine_chunks()
    parent = np.repeat(
        np.arange(len(dl)),
        pc.list_value_length(toks).to_numpy(zero_copy_only=False),
    )
    tf = np.zeros((len(dl), len(terms)), dtype=np.int64)
    for ti, t in enumerate(terms):
        eq = pc.equal(flat, t).to_numpy(zero_copy_only=False)
        np.add.at(tf[:, ti], parent[eq], 1)
    return tf, dl


def bm25_topk(
    docs: "ray.data.Dataset",
    queries: dict[str, list[str]],
    k: int = 10,
) -> "ray.data.Dataset":
    """(query_id, rank, doc_id): top-k BM25 documents per keyword query."""
    terms = sorted({t for ts in queries.values() for t in ts})
    t_idx = {t: i for i, t in enumerate(terms)}
    empty = pa.Table.from_pydict(
        {
            "query_id": pa.array([], pa.string()),
            "rank": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
        }
    )
    if not terms or docs.count() == 0:  # metadata-only; zero-row guard
        return ray.data.from_arrow(empty)

    # --- pass 1: corpus stats, tree-reduced ------------------------------
    def partial_stats(batch: pa.Table) -> pa.Table:
        tf, dl = _tf_dl(batch, terms)
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(dl)], pa.int64()),
                "total": pa.array([int(dl.sum())], pa.int64()),
                "df": pa.array([(tf > 0).sum(axis=0).tolist()], pa.list_(pa.int64())),
            }
        )

    def merge_stats(batch: pa.Table) -> pa.Table:
        df = np.array(batch.column("df").to_pylist(), dtype=np.int64).sum(axis=0)
        return pa.Table.from_pydict(
            {
                "n": pa.array([int(pc.sum(batch.column("n")).as_py())], pa.int64()),
                "total": pa.array(
                    [int(pc.sum(batch.column("total")).as_py())], pa.int64()
                ),
                "df": pa.array([df.tolist()], pa.list_(pa.int64())),
            }
        )

    reduced = (
        docs.map_batches(partial_stats, batch_format="pyarrow")
        .repartition(shuffle_partitions(4))
        .map_batches(merge_stats, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    n_docs = sum(r["n"] for r in reduced)
    total = sum(r["total"] for r in reduced)
    df = np.sum([r["df"] for r in reduced], axis=0).astype(np.int64)
    if n_docs == 0 or total == 0:
        return ray.data.from_arrow(empty)
    # idf in the oracle's exact association order
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    stats_ref = ray.put((idf, n_docs, total))
    q_ids = sorted(queries)
    q_cols = [np.array([t_idx[t] for t in queries[q]], dtype=np.int64) for q in q_ids]

    # --- pass 2: score + local top-k per block ---------------------------
    def score_batch(batch: pa.Table) -> pa.Table:
        idf_, n_, total_ = ray.get(stats_ref)
        tf, dl = _tf_dl(batch, terms)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # (dl * N) / total, matching the SQL's left-assoc integer product
        ratio = (dl * n_).astype(np.float64) / float(total_)
        denom = tf + K1 * ((1.0 - B) + B * ratio[:, None])
        s_term = idf_[None, :] * tf * (K1 + 1.0) / denom
        out_q, out_id, out_s = [], [], []
        for qi, q in enumerate(q_ids):
            s = s_term[:, q_cols[qi]].sum(axis=1)
            top = np.lexsort((ids, -s))[:k]
            out_q.extend([q] * len(top))
            out_id.extend(ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        )
        g = group.take(order[:k])
        return pa.Table.from_pydict(
            {
                "query_id": g.column("query_id"),
                "rank": pa.array(np.arange(1, g.num_rows + 1), pa.int64()),
                "doc_id": g.column("doc_id"),
            }
        )

    # every non-empty batch emits rows for every query, so the exchange's
    # first block is never empty (no sentinel needed, _exchange.py)
    return (
        docs.map_batches(score_batch, batch_format="pyarrow")
        .groupby("query_id", num_partitions=shuffle_partitions(4))
        .map_groups(final_topk, batch_format="pyarrow")
    )


def rrf_fusion(
    docs: "ray.data.Dataset",
    embeddings: "ray.data.Dataset",
    keyword_queries: dict[str, list[str]],
    query_vec_ids: dict[str, int],
    k: int = 10,
    k_rrf: int = 60,
) -> pa.Table:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack/Clarke/Buettcher
    2009) of the BM25 keyword ranking and the dense cosine ranking for
    the same query set — the standard lexical+dense hybrid. The
    interleaved corpus carries one embedding per document (vec_id ==
    doc_id), so both sides rank the same id space.

    Each side runs its own distributed pass (``bm25_topk``: two
    streaming passes, corpus never shuffles; ``brute_force_topk``:
    broadcast query matrix + per-batch partial top-k); the fusion itself
    touches only |queries| x k rank rows on the driver — bounded by the
    ASK, not the corpus.

    Integer-exact fusion: rank r contributes ``10^12 // (k_rrf + r)``
    (the canonical 1/(60+r) RRF weight in fixed point), so the combined
    ordering — ties broken by doc_id ascending — is bit-identical to the
    SQL oracle's. Output (query_id, rank, doc_id, rrf_score), top-k.
    """
    from agentic_doc_ray.functions.similarity import brute_force_topk

    qnames = sorted(keyword_queries)
    bm_rows = bm25_topk(docs, keyword_queries, k=k).take_all()

    wanted = pa.array(
        sorted({query_vec_ids[q] for q in qnames}), pa.int64()
    )

    def grab_queries(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("vec_id"), wanted))

    q_rows = (
        embeddings.map_batches(grab_queries, batch_format="pyarrow").take_all()
    )
    vec_of = {int(r["vec_id"]): r["embedding"] for r in q_rows}
    queries_m = np.array(
        [vec_of[query_vec_ids[q]] for q in qnames], dtype=np.float64
    )
    dense = brute_force_topk(
        embeddings, queries_m, [query_vec_ids[q] for q in qnames], k=k
    )
    name_of_vec = {query_vec_ids[q]: q for q in qnames}

    scores: dict[tuple[str, int], int] = {}
    big = 10**12
    for r in bm_rows:
        key = (str(r["query_id"]), int(r["doc_id"]))
        scores[key] = scores.get(key, 0) + big // (k_rrf + int(r["rank"]))
    for r in dense.to_pylist():
        key = (name_of_vec[int(r["query_id"])], int(r["vec_id"]))
        scores[key] = scores.get(key, 0) + big // (k_rrf + int(r["rank"]))

    out = {"query_id": [], "rank": [], "doc_id": [], "rrf_score": []}
    for q in qnames:
        ranked = sorted(
            ((s, d) for (qq, d), s in scores.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for rank, (s, d) in enumerate(ranked, start=1):
            out["query_id"].append(q)
            out["rank"].append(rank)
            out["doc_id"].append(d)
            out["rrf_score"].append(s)
    return pa.Table.from_pydict(
        out,
        schema=pa.schema(
            [
                ("query_id", pa.string()),
                ("rank", pa.int64()),
                ("doc_id", pa.int64()),
                ("rrf_score", pa.int64()),
            ]
        ),
    )
