"""Caption harvesting: hand-built edge cases + batching invariance."""

import pyarrow as pa
import ray.data

from agentic_doc_ray.functions.captions import (
    CAPTION_SCHEMA,
    caption_pairs_batch,
    harvest_captions,
)

SPAN_T = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("chunk_id", pa.string()),
    ]
)


def _doc(doc_id, spans):
    return {
        "doc_id": doc_id,
        "spans": [
            {
                "kind": k,
                "text": t,
                "media_ref": m,
                "offset": i,
                "chunk_id": f"{doc_id}-{i:02d}",
            }
            for i, (k, t, m) in enumerate(spans)
        ],
    }


def _tbl(docs):
    return pa.Table.from_pylist(
        docs,
        schema=pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_T))]),
    )


def test_neighbor_rule_edge_cases():
    docs = [
        # media sandwiched between texts
        _doc("d1", [("text", "before", ""), ("figure", "", "m://1"), ("text", "after", "")]),
        # media first (no before), title is NOT a caption source
        _doc("d2", [("figure", "", "m://2"), ("title", "T", ""), ("text", "tail", "")]),
        # media last (no after); nearest text skips a table span
        _doc("d3", [("text", "early", ""), ("table", "tt", ""), ("figure", "", "m://3")]),
        # no text at all in the doc
        _doc("d4", [("figure", "", "m://4")]),
        # doc with no media contributes nothing
        _doc("d5", [("text", "solo", "")]),
    ]
    got = {
        r["media_ref"]: (r["caption_before"], r["caption_after"])
        for r in caption_pairs_batch(_tbl(docs)).to_pylist()
    }
    assert got == {
        "m://1": ("before", "after"),
        "m://2": ("", "tail"),
        "m://3": ("early", ""),
        "m://4": ("", ""),
    }


def test_doc_boundary_is_respected():
    # text in a PREVIOUS doc must not leak into the next doc's before-caption
    docs = [
        _doc("a", [("text", "leaky", "")]),
        _doc("b", [("figure", "", "m://b"), ("text", "own", "")]),
    ]
    rows = caption_pairs_batch(_tbl(docs)).to_pylist()
    assert rows == [
        {
            "doc_id": "b",
            "offset": 0,
            "media_ref": "m://b",
            "chunk_id": "b-00",
            "caption_before": "",
            "caption_after": "own",
        }
    ]


def test_batching_invariance_and_empty():
    docs = [
        _doc(f"d{i}", [("text", f"t{i}", ""), ("figure", "", f"m://{i}")])
        for i in range(12)
    ]
    want = sorted(
        (r["media_ref"], r["caption_before"])
        for r in caption_pairs_batch(_tbl(docs)).to_pylist()
    )
    for parts in (1, 5):
        ds = ray.data.from_arrow(_tbl(docs)).repartition(parts)
        got = sorted(
            (r["media_ref"], r["caption_before"])
            for r in harvest_captions(ds).take_all()
        )
        assert got == want
    # a batch with zero media spans yields an empty, correctly-typed table
    out = caption_pairs_batch(_tbl([_doc("x", [("text", "no media", "")])]))
    assert out.num_rows == 0 and out.schema == CAPTION_SCHEMA
