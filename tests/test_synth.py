"""Corpus-synthesis invariants (FIXTURES.md §1): offsets dense & unique per
doc, doc_id unique, deterministic, all fixture families present."""

import pyarrow as pa

from agentic_doc_ray.config import EngineConfig
from agentic_doc_ray.schema import CORPUS_SCHEMA
from agentic_doc_ray.synth import build_corpus_table, synth_doc


def test_schema_exact(sf_smoke_corpus):
    assert sf_smoke_corpus.schema.equals(CORPUS_SCHEMA)


def test_offsets_dense_and_unique(sf_smoke_corpus):
    for spans in sf_smoke_corpus["spans"].to_pylist():
        offs = sorted(s["offset"] for s in spans)
        assert offs == list(range(len(spans)))


def test_doc_ids_unique(sf_smoke_corpus):
    ids = sf_smoke_corpus["doc_id"].to_pylist()
    assert len(set(ids)) == len(ids)


def test_deterministic():
    a = build_corpus_table("/root/testdata/sf0.001/documents.parquet", limit=30)
    b = build_corpus_table("/root/testdata/sf0.001/documents.parquet", limit=30)
    assert a.equals(b)


def test_families_present(sf_smoke_corpus):
    kinds = set()
    for spans in sf_smoke_corpus["spans"].to_pylist():
        kinds.update(s["kind"] for s in spans)
    assert kinds == {"text", "html", "pdf_page", "image"}


def test_mega_doc_skew():
    cfg = EngineConfig(mega_doc_modulus=10, mega_doc_spans=50)
    _, spans = synth_doc(9, "some words here", cfg)
    assert len(spans) == 50


def test_error_family_has_corrupt_pages():
    from agentic_doc_ray.textparse import CORRUPT_MARKER

    _, spans = synth_doc(8, "alpha beta gamma delta", EngineConfig())
    assert any(CORRUPT_MARKER in s["text"] for s in spans)


def test_synth_is_pure_function_of_doc():
    a = synth_doc(17, "one two three")
    b = synth_doc(17, "one two three")
    assert a == b
