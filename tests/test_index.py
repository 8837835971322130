"""Inverted index vs a naive dict-of-dicts build."""

import collections

import pyarrow as pa

import ray.data

from agentic_doc_ray.functions.index import build_inverted_index, index_postings, write_index


def _naive(texts):
    idx = collections.defaultdict(dict)
    for d, t in enumerate(texts):
        for tok in t.strip().split():
            idx[tok][d] = idx[tok].get(d, 0) + 1
    return {t: dict(p) for t, p in idx.items()}


TEXTS = [
    "hash join hash hash",
    "window stream window",
    "  ",
    "",
    "join scan",
    "hash",
]


def _docs():
    return ray.data.from_arrow(
        pa.Table.from_pydict({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    )


def test_full_index_matches_naive():
    got = build_inverted_index(_docs()).to_pandas()
    naive = _naive(TEXTS)
    built = collections.defaultdict(dict)
    for r in got.itertuples():
        built[r.term][r.doc_id] = r.tf
    assert {t: dict(p) for t, p in built.items()} == naive
    # postings within a bucket are (term, doc_id)-sorted
    for _, grp in got.groupby("bucket"):
        assert list(grp[["term", "doc_id"]].itertuples(index=False)) == sorted(
            grp[["term", "doc_id"]].itertuples(index=False)
        )


def test_terms_pruning():
    got = index_postings(_docs(), ["hash", "nosuchterm"]).to_pandas()
    assert set(got["term"]) == {"hash"}
    assert dict(zip(got["doc_id"], got["tf"])) == {0: 3, 5: 1}


def test_terms_filter_empties_every_block():
    # every block empties under the filter -> exercises the sentinel guard
    got = index_postings(_docs(), ["zzz_absent"]).to_pandas()
    assert len(got) == 0


def test_write_partitioned(tmp_path):
    back = write_index(_docs(), str(tmp_path / "idx")).to_pandas()
    naive = _naive(TEXTS)
    assert len(back) == sum(len(p) for p in naive.values())
