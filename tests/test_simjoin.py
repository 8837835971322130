"""Exact prefix-filter similarity join vs brute force and vs the LSH route."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from agentic_doc_ray.functions.dedup import (
    bruteforce_jaccard_pairs,
    verified_dedup_pairs,
)
from agentic_doc_ray.functions.simjoin import exact_jaccard_join

SF = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = [str(x) for x in t["doc_id"].to_pylist()]
    texts = [str(x) for x in t["text"].to_pylist()]
    return ids, texts, pa.table(
        {"doc_id": pa.array(ids, pa.string()), "text": pa.array(texts, pa.string())}
    )


def _sorted(df):
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def test_exact_jaccard_join_matches_bruteforce():
    ids, texts, tt = _docs()
    got = _sorted(
        exact_jaccard_join(ray.data.from_arrow(tt), threshold=0.8).to_pandas()
    )
    want = _sorted(bruteforce_jaccard_pairs(ids, texts, threshold=0.8).to_pandas())
    assert got.values.tolist() == want.values.tolist()
    assert len(want) > 5  # the corpus plants real near-dups


def test_exact_join_agrees_with_lsh_route():
    """The LSH pipeline's exactness CLAIM (loose bands recall everything
    above the final threshold) checked against the theorem-exact join."""
    _, _, tt = _docs()
    a = _sorted(
        exact_jaccard_join(ray.data.from_arrow(tt), threshold=0.8).to_pandas()
    )
    b = _sorted(verified_dedup_pairs(ray.data.from_arrow(tt), 0.8, 0.5).to_pandas())
    assert a.values.tolist() == b.values.tolist()
