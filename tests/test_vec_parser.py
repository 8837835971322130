"""Vectorized parser parity: VecLayoutParseActor must be bit-identical to
the reference LayoutParseActor (the textparse spec) on fixture corpora and
hypothesis-generated ones."""

import pyarrow as pa
from hypothesis import given, settings

from agentic_doc_ray.config import EngineConfig
from agentic_doc_ray.stages.explode import explode_spans
from agentic_doc_ray.stages.html_strip import strip_html_batch
from agentic_doc_ray.stages.layout_parse import LayoutParseActor
from agentic_doc_ray.stages.layout_parse_vec import VecLayoutParseActor
from tests.test_property import corpora


def _rows(actor, pages, bs=97):
    outs = []
    for i in range(0, max(1, pages.num_rows), bs):
        t = actor(pages.slice(i, bs))
        if t.num_rows:
            outs.append(t)
    rows = [r for t in outs for r in t.to_pylist()]
    return sorted(
        rows,
        key=lambda r: (r["doc_id"], r["part_idx"], r["page_rel"], r["block_idx"], r["kind"]),
    )


def _assert_parity(corpus, cfg):
    pages = strip_html_batch(explode_spans(corpus, cfg))
    assert _rows(LayoutParseActor(cfg), pages) == _rows(VecLayoutParseActor(cfg), pages)


def test_parity_on_smoke_corpus(sf_smoke_corpus):
    _assert_parity(sf_smoke_corpus, EngineConfig())


def test_parity_without_marginalia(sf_smoke_corpus):
    _assert_parity(sf_smoke_corpus.slice(0, 30), EngineConfig(include_marginalia=False))


@settings(max_examples=30, deadline=None, derandomize=True)
@given(corpus=corpora())
def test_parity_on_arbitrary_corpora(corpus):
    _assert_parity(corpus, EngineConfig(split_size=3))


def test_edge_blocks():
    # 61-char ALLCAPS line (spec: NOT marginalia), 60-char (marginalia),
    # single "|" line (table), lone "0" (marginalia), unicode whitespace
    cases = [
        "A" + "B" * 60,
        "A" + "B" * 59,
        "| a |",
        "0",
        "x\n \ny",   # \xa0 is NOT ASCII space: no block split
        "# title\n\n\n\nbody text words",
    ]
    corpus = pa.Table.from_pydict(
        {
            "doc_id": [f"d{i}" for i in range(len(cases))],
            "spans": [
                [{"kind": "text", "text": c, "media_ref": "", "offset": 0}]
                for c in cases
            ],
        },
        schema=__import__("agentic_doc_ray.schema", fromlist=["CORPUS_SCHEMA"]).CORPUS_SCHEMA,
    )
    _assert_parity(corpus, EngineConfig())
