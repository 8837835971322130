"""Ray Data stages of the extraction engine.

Stateless stages are plain functions for ``map_batches`` (pyarrow batch
format, zero-copy); the layout parser is a callable class run as an actor
pool (warm state). Composition lives in ``agentic_doc_ray.pipelines``.
"""

from agentic_doc_ray.stages.explode import explode_spans, flatten_parsed
from agentic_doc_ray.stages.html_strip import strip_html_batch
from agentic_doc_ray.stages.layout_parse import LayoutParseActor
from agentic_doc_ray.stages.reassemble import reassemble

__all__ = [
    "explode_spans",
    "flatten_parsed",
    "strip_html_batch",
    "LayoutParseActor",
    "reassemble",
]
