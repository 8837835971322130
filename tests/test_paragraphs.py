"""Cross-corpus paragraph dedup vs the pure-Python replica oracle."""

import pyarrow as pa
import pytest
import ray.data

from agentic_doc_ray.functions.paragraphs import (
    paragraph_dedup,
    paragraph_dedup_oracle,
)


def _run(tbl: pa.Table, parts: int) -> dict:
    ds = ray.data.from_arrow(tbl)
    if parts > 1:
        ds = ds.repartition(parts)
    return {r["doc_id"]: r["text"] for r in paragraph_dedup(ds).take_all()}


CORPUS = pa.Table.from_pydict(
    {
        "doc_id": [3, 1, 2, 4, 5, 6],
        "text": ["A\n\nB", "B\n\nA\n\nB", "A\n\nC", "B", "", ""],
    }
)


def test_first_occurrence_rule_and_rebuild():
    want = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup_oracle(CORPUS).to_pylist()
    }
    # hand-check the rule once so the oracle itself is pinned:
    # doc 1 keeps B@0 and A@1 (its second B is a within-doc dup); every
    # later occurrence of A or B anywhere drops; doc 5 keeps the first ""
    assert want == {1: "B\n\nA", 2: "C", 3: "", 4: "", 5: "", 6: ""}
    for parts in (1, 5):
        assert _run(CORPUS, parts) == want


def test_string_doc_ids():
    tbl = pa.Table.from_pydict(
        {
            "doc_id": ["b", "a", "c"],
            "text": ["X\n\nY", "Y\n\nZ", "Z"],
        }
    )
    want = {
        r["doc_id"]: r["text"] for r in paragraph_dedup_oracle(tbl).to_pylist()
    }
    assert want == {"a": "Y\n\nZ", "b": "X", "c": ""}
    assert _run(tbl, 3) == want


@pytest.mark.parametrize("n_docs", [40])
def test_synthetic_boilerplate(n_docs):
    # every doc carries one of 3 boilerplate paragraphs plus unique body
    ids = list(range(n_docs))
    texts = [f"body {i}\n\nboiler {i % 3}" for i in ids]
    tbl = pa.Table.from_pydict({"doc_id": ids, "text": texts})
    got = _run(tbl, 7)
    want = {
        r["doc_id"]: r["text"] for r in paragraph_dedup_oracle(tbl).to_pylist()
    }
    assert got == want
    # boilerplate k survives only in doc k (the min doc_id carrying it)
    for i in ids:
        if i < 3:
            assert got[i] == f"body {i}\n\nboiler {i}"
        else:
            assert got[i] == f"body {i}"
