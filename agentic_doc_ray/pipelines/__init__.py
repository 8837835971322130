from agentic_doc_ray.pipelines.extract import (
    extract_corpus,
    extract_corpus_adaptive,
    extract_flat_spans,
    read_corpus,
)

__all__ = [
    "extract_corpus",
    "extract_corpus_adaptive",
    "extract_flat_spans",
    "read_corpus",
]
