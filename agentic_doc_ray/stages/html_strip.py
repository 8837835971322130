"""HTML boilerplate-strip stage (stateless map_batches task).

Rewrites ``kind=="html"`` page rows in place: ``text`` becomes the stripped
main content (DOM heuristics in ``textparse.strip_html``) and ``kind``
becomes ``"text"`` so the downstream parser sees plain blocks. Non-HTML rows
pass through untouched (zero-copy columns are reused).

This is the north_star's dedicated boilerplate-strip stage; the reference has
no local analogue (stripping happened server-side behind the API).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from agentic_doc_ray.textparse import strip_html


def strip_html_batch(batch: pa.Table) -> pa.Table:
    kind = batch.column("kind")
    mask = pc.equal(kind, "html")
    if not pc.any(mask).as_py():
        return batch
    mask_np = mask.combine_chunks().to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    kinds = kind.to_pylist()
    for i, m in enumerate(mask_np):
        if m:
            texts[i] = strip_html(texts[i])
            kinds[i] = "text"
    return batch.set_column(
        batch.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
    ).set_column(
        batch.schema.get_field_index("kind"), "kind", pa.array(kinds, pa.string())
    )
