"""Interleave-structure metrics: hand-built edge cases + batching."""

import pyarrow as pa
import ray.data

from agentic_doc_ray.functions.interleave import (
    interleave_stats,
    interleave_stats_batch,
)
from agentic_doc_ray.schema import CORPUS_SCHEMA


def _doc(doc_id, flags, shuffle=False):
    """flags: list of bools (True = media span); offsets follow list
    position, optionally stored in scrambled list order."""
    spans = [
        {
            "kind": "image" if m else "text",
            "text": "" if m else f"t{i}",
            "media_ref": f"m://{doc_id}/{i}" if m else "",
            "offset": i,
        }
        for i, m in enumerate(flags)
    ]
    if shuffle:
        spans = spans[::-1]  # list order != offset order
    return {"doc_id": doc_id, "spans": spans}


def _tbl(docs):
    return pa.Table.from_pylist(docs, schema=CORPUS_SCHEMA)


def test_metrics_edge_cases():
    t = _tbl(
        [
            _doc("a", [False, False, True, False]),          # run 2 then 1
            _doc("b", [True, True, True]),                   # all media
            _doc("c", [False] * 5),                          # all text
            _doc("d", []),                                   # empty doc
            _doc("e", [False, True, False, False, False], shuffle=True),
        ]
    )
    got = {r["doc_id"]: r for r in interleave_stats_batch(t).to_pylist()}
    assert got["a"] == {
        "doc_id": "a", "n_spans": 4, "n_media": 1,
        "media_per_mille": 250, "max_text_run": 2,
    }
    assert (got["b"]["n_media"], got["b"]["max_text_run"]) == (3, 0)
    assert (got["c"]["media_per_mille"], got["c"]["max_text_run"]) == (0, 5)
    assert got["d"] == {
        "doc_id": "d", "n_spans": 0, "n_media": 0,
        "media_per_mille": 0, "max_text_run": 0,
    }
    # scrambled list order: runs follow OFFSET order (1 then 3)
    assert got["e"]["max_text_run"] == 3


def test_batching_invariance():
    docs = [
        _doc(f"d{i}", [(j + i) % 3 == 0 for j in range(i % 7)])
        for i in range(20)
    ]
    want = sorted(interleave_stats_batch(_tbl(docs)).to_pylist(), key=lambda r: r["doc_id"])
    for parts in (1, 6):
        ds = ray.data.from_arrow(_tbl(docs)).repartition(parts)
        got = sorted(interleave_stats(ds).take_all(), key=lambda r: r["doc_id"])
        assert got == want
