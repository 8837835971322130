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


# ---------------------------------------------------------------------------
# domain_boilerplate_strip
# ---------------------------------------------------------------------------

from agentic_doc_ray.functions.paragraphs import (  # noqa: E402
    domain_boilerplate_oracle,
    domain_boilerplate_strip,
)


def _bp_corpus():
    """Two sources: srcA (12 docs) crosses min_source_docs=10; srcB (3
    docs) doesn't, so even its universal footer survives. In srcA the
    footer (df=12, 1000 per-mille) strips, a half-common line (df=6,
    500 per-mille >= 200) strips, a rare repeat (df=2, 166 per-mille
    < 200) survives, unique bodies survive, empty lines survive."""
    rows = []
    for i in range(12):
        parts = ["body-a-%d" % i, "footer-A"]
        if i % 2 == 0:
            parts.append("common-A")
        if i < 2:
            parts.append("rare-A")
        if i == 0:
            parts.insert(1, "")  # empty line mid-doc
        rows.append((i, "srcA", "\n".join(parts)))
    for i in range(3):
        rows.append((100 + i, "srcB", "body-b-%d\nfooter-B" % i))
    rows.append((200, "srcA", ""))  # empty doc
    return pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "source": [r[1] for r in rows],
            "text": [r[2] for r in rows],
        }
    )


def _bp_run(tbl: pa.Table, parts: int) -> dict:
    ds = ray.data.from_arrow(tbl)
    if parts > 1:
        ds = ds.repartition(parts)
    return {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in domain_boilerplate_strip(ds).take_all()
    }


def test_boilerplate_rules_pinned():
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in domain_boilerplate_oracle(_bp_corpus()).to_pylist()
    }
    # hand-pinned: footer-A + common-A strip, rare-A and bodies survive
    assert got[0] == ("body-a-0\n\nrare-A", 2)  # footer+common gone, "" kept
    assert got[1] == ("body-a-1\nrare-A", 1)  # footer gone (odd: no common)
    assert got[2] == ("body-a-2", 2)
    # srcB below min_source_docs: untouched
    assert got[100] == ("body-b-0\nfooter-B", 0)
    assert got[200] == ("", 0)  # empty doc passes through


def test_boilerplate_matches_oracle_through_ray():
    tbl = _bp_corpus()
    want = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in domain_boilerplate_oracle(tbl).to_pylist()
    }
    for parts in (1, 5):
        assert _bp_run(tbl, parts) == want


def test_boilerplate_noop_when_nothing_frequent():
    tbl = pa.table(
        {
            "doc_id": list(range(12)),
            "source": ["s"] * 12,
            "text": ["unique-%d" % i for i in range(12)],
        }
    )
    got = _bp_run(tbl, 3)
    assert got == {i: ("unique-%d" % i, 0) for i in range(12)}


def test_sentence_dedup_first_occurrence(ray_session):
    """Corpus-wide sentence dedup: min (doc_id, sent_idx) survives per
    distinct sentence; layout-independent."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.paragraphs import sentence_dedup

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "Alpha one. Shared sentence. Beta two.",
                "Shared sentence. Gamma three. Shared sentence.",
                "Delta four. Gamma three.",
            ],
        }
    )
    expect = {
        (1, 0, "Alpha one"),
        (1, 1, "Shared sentence"),   # first occurrence wins
        (1, 2, "Beta two"),
        (2, 1, "Gamma three"),
        (3, 0, "Delta four"),
    }
    for parallelism in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parallelism)
        got = {
            (r["doc_id"], r["sent_idx"], r["sentence"])
            for r in sentence_dedup(ds).take_all()
        }
        assert got == expect
