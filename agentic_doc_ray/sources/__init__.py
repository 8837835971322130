from agentic_doc_ray.sources.files import (
    is_valid_httpurl,
    read_binary_corpus,
    sniff_bytes,
    sniff_batch,
)

__all__ = ["is_valid_httpurl", "read_binary_corpus", "sniff_bytes", "sniff_batch"]
