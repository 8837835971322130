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


# ---------------------------------------------------------------------------
# interleave_pack
# ---------------------------------------------------------------------------

from agentic_doc_ray.functions.interleave import (  # noqa: E402
    interleave_pack,
    interleave_pack_batch,
    interleave_pack_oracle,
)

_SPAN_T = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)


def _span(text="", media="", offset=0):
    return {"kind": "text", "text": text, "media_ref": media, "offset": offset}


def _pack_corpus():
    w = lambda k: " ".join(["w"] * k)  # noqa: E731
    docs = {
        # text runs split at the budget (96): 40+40 fits, +40 overflows
        "a": [_span(w(40), offset=0), _span(w(40), offset=10), _span(w(40), offset=20)],
        # media placeholder cost (32) interleaved with text
        "b": [
            _span(w(70), offset=0),
            _span("", media="m1", offset=5),   # 70+32 > 96 -> new seq
            _span(w(60), offset=9),            # 32+60 <= 96 -> same seq
            _span("", media="m2", offset=12),  # +32 > 96 -> new seq
        ],
        # single oversize span gets its own sequence, never split
        "c": [_span(w(200), offset=0), _span(w(10), offset=1)],
        # exact boundary: 96 fits in one
        "d": [_span(w(96), offset=0), _span(w(1), offset=3)],
        # offsets out of list order: packing follows OFFSET order
        "e": [_span(w(90), offset=7), _span(w(90), offset=2)],
        # empty doc and zero-cost spans
        "f": [],
        "g": [_span("", offset=0), _span("", offset=1), _span(w(5), offset=2)],
    }
    return pa.table(
        {
            "doc_id": list(docs.keys()),
            "spans": pa.array(list(docs.values()), pa.list_(_SPAN_T)),
        }
    )


def _key(t: pa.Table):
    return sorted(map(tuple, t.to_pandas().values.tolist()))


def test_pack_rules_pinned():
    got = {
        (r["doc_id"], r["offset"]): (r["seq_idx"], r["seq_pos"], r["cost"])
        for r in interleave_pack_oracle(_pack_corpus()).to_pylist()
    }
    assert got[("a", 0)] == (0, 0, 40) and got[("a", 10)] == (0, 1, 40)
    assert got[("a", 20)] == (1, 0, 40)
    assert got[("b", 5)] == (1, 0, 32) and got[("b", 9)] == (1, 1, 60)
    assert got[("b", 12)] == (2, 0, 32)
    assert got[("c", 0)] == (0, 0, 200) and got[("c", 1)] == (1, 0, 10)
    assert got[("d", 0)] == (0, 0, 96) and got[("d", 3)] == (1, 0, 1)
    # offset order, not list order: offset 2 packs first
    assert got[("e", 2)] == (0, 0, 90) and got[("e", 7)] == (1, 0, 90)
    assert got[("g", 2)] == (0, 2, 5)


def test_pack_batch_matches_oracle():
    t = _pack_corpus()
    assert _key(interleave_pack_batch(t)) == _key(interleave_pack_oracle(t))
    # batching independence
    parts = pa.concat_tables(
        [interleave_pack_batch(t.slice(i, 2)) for i in range(0, t.num_rows, 2)]
    )
    assert _key(parts) == _key(interleave_pack_oracle(t))


def test_pack_through_ray_matches_oracle():
    t = _pack_corpus()
    ds = ray.data.from_arrow(t).repartition(3)
    got = interleave_pack(ds).take_all()
    want = interleave_pack_oracle(t).to_pylist()
    skey = lambda r: (r["doc_id"], r["offset"])  # noqa: E731
    assert sorted(got, key=skey) == sorted(want, key=skey)


def test_pack_real_corpus_matches_oracle():
    from agentic_doc_ray.synth import build_corpus_table

    tbl = build_corpus_table("/root/testdata/sf0.001/documents.parquet")
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = interleave_pack(ds).take_all()
    want = interleave_pack_oracle(tbl).to_pylist()
    skey = lambda r: (r["doc_id"], r["offset"])  # noqa: E731
    assert sorted(got, key=skey) == sorted(want, key=skey)


def test_kind_transitions_counts(sf_smoke_corpus):
    """Transitions recomputed from the oracle's parsed output."""
    from collections import Counter

    import ray.data

    from agentic_doc_ray.functions.interleave import kind_transitions
    from agentic_doc_ray.oracle import parse_corpus_oracle
    from agentic_doc_ray.pipelines import extract_corpus

    parsed_tbl = parse_corpus_oracle(sf_smoke_corpus)
    want = Counter()
    for spans in parsed_tbl["spans"].to_pylist():
        kinds = [s["kind"] for s in spans]
        for a, b in zip(kinds, kinds[1:]):
            want[(a, b)] += 1

    corpus = ray.data.from_arrow(sf_smoke_corpus).repartition(3)
    got = {
        (r["kind_a"], r["kind_b"]): r["n"]
        for r in kind_transitions(extract_corpus(corpus)).take_all()
    }
    assert got == dict(want)


def test_error_rate_by_source_conservation(sf_smoke_corpus):
    import ray.data

    from agentic_doc_ray.functions.interleave import error_rate_by_source
    from agentic_doc_ray.oracle import parse_corpus_oracle
    from agentic_doc_ray.pipelines import extract_corpus

    corpus = ray.data.from_arrow(sf_smoke_corpus).repartition(3)
    got = error_rate_by_source(
        extract_corpus(corpus), "/root/testdata/sf0.001"
    ).to_pandas()
    parsed = parse_corpus_oracle(sf_smoke_corpus)
    total_errs = sum(len(e) for e in parsed["errors"].to_pylist())
    assert got["n_errors"].sum() == total_errs
    assert got["n_docs"].sum() == sf_smoke_corpus.num_rows
    assert (got["n_docs_with_errors"] <= got["n_docs"]).all()


def test_extraction_yield_invariants(sf_smoke_corpus):
    import ray.data

    from agentic_doc_ray.functions.interleave import extraction_yield
    from agentic_doc_ray.oracle import parse_corpus_oracle
    from agentic_doc_ray.pipelines import extract_corpus

    corpus = ray.data.from_arrow(sf_smoke_corpus).repartition(3)
    got = extraction_yield(
        extract_corpus(corpus), corpus
    ).to_pandas().set_index("doc_id")
    parsed = parse_corpus_oracle(sf_smoke_corpus)
    # markdown side equals the oracle's markdown lengths exactly
    for d, md in zip(parsed["doc_id"].to_pylist(), parsed["markdown"].to_pylist()):
        assert got.loc[d, "markdown_chars"] == len(md)
    # raw side equals the corpus span-char sums
    for d, spans in zip(
        sf_smoke_corpus["doc_id"].to_pylist(), sf_smoke_corpus["spans"].to_pylist()
    ):
        assert got.loc[d, "raw_chars"] == sum(len(s["text"]) for s in spans)
