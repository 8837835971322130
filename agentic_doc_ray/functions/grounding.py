"""Grounding media materialization (the reference's save_groundings path).

Reimplements the crop/path semantics of
``/root/reference/agentic_doc/utils.py:63-211`` Ray-natively:

  - pixel crop math (`_crop_image`, utils.py:172-211): clamp normalized
    coords to [0,1], floor the min corner and ceil the max corner to pixels,
    then clamp to the page — vectorized here over a whole batch of bboxes;
  - output layout (`_crop_groundings`, utils.py:158-162):
    ``{save_dir}/page_{page}/{kind}_{chunk_id}_{i}.png``;
  - per-page grouping is LOCAL to a document (utils.py:94-100), so the
    stage is a plain map_batches over parsed docs — no shuffle.

The actual rasterize+encode (pymupdf/cv2 in the reference) is stubbed —
those libs are absent here — so the stage emits the *grounding manifest*
(crop rects + target paths); a deployment plugs a decoder into
``MediaFeatureActor``-style actors to write the bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

GROUNDING_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_id", pa.string()),
        ("kind", pa.string()),
        ("page", pa.int32()),
        ("xmin", pa.int32()),
        ("ymin", pa.int32()),
        ("xmax", pa.int32()),
        ("ymax", pa.int32()),
        ("out_of_bounds", pa.bool_()),
        ("image_path", pa.string()),
    ]
)


def crop_rect(
    bbox: tuple[float, float, float, float], width: int, height: int
) -> tuple[int, int, int, int, bool]:
    """Pixel crop rect for one normalized bbox — the exact _crop_image math
    (clamp to [0,1]; floor mins, ceil maxes; clamp to page)."""
    l, t, r, b = bbox
    oob = l < 0 or t < 0 or r > 1 or b > 1 or l > r or t > b
    l = max(0.0, min(1.0, l))
    t = max(0.0, min(1.0, t))
    r = max(0.0, min(1.0, r))
    b = max(0.0, min(1.0, b))
    import math

    xmin = max(0, math.floor(l * width))
    xmax = min(width, math.ceil(r * width))
    ymin = max(0, math.floor(t * height))
    ymax = min(height, math.ceil(b * height))
    return xmin, ymin, xmax, ymax, oob


def grounding_manifest_batch(
    batch: pa.Table, save_dir: str, page_width: int = 816, page_height: int = 1056
) -> pa.Table:
    """Parsed-doc rows -> grounding manifest rows (vectorized).

    Default page size = US Letter at the reference's 96 dpi
    (``pdf_to_image_dpi``, config.py:118-122).
    """
    spans = batch.column("spans").combine_chunks()
    parents = pc.list_parent_indices(spans)
    flat = spans.flatten()
    doc_ids = pc.take(batch.column("doc_id").combine_chunks(), parents)

    bbox = np.asarray(flat.field("bbox").flatten(), dtype=np.float64).reshape(-1, 4)
    l, t, r, b = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    oob = (l < 0) | (t < 0) | (r > 1) | (b > 1) | (l > r) | (t > b)
    lc = np.clip(l, 0, 1)
    tc = np.clip(t, 0, 1)
    rc = np.clip(r, 0, 1)
    bc = np.clip(b, 0, 1)
    xmin = np.maximum(0, np.floor(lc * page_width)).astype(np.int32)
    xmax = np.minimum(page_width, np.ceil(rc * page_width)).astype(np.int32)
    ymin = np.maximum(0, np.floor(tc * page_height)).astype(np.int32)
    ymax = np.minimum(page_height, np.ceil(bc * page_height)).astype(np.int32)

    kinds = flat.field("kind").to_pylist()
    chunk_ids = flat.field("chunk_id").to_pylist()
    pages = flat.field("page").to_pylist()
    paths = [
        f"{save_dir}/page_{p}/{k}_{cid}_0.png"
        for p, k, cid in zip(pages, kinds, chunk_ids)
    ]
    return pa.Table.from_arrays(
        [
            doc_ids,
            flat.field("chunk_id"),
            flat.field("kind"),
            flat.field("page"),
            pa.array(xmin),
            pa.array(ymin),
            pa.array(xmax),
            pa.array(ymax),
            pa.array(oob),
            pa.array(paths, pa.string()),
        ],
        schema=GROUNDING_SCHEMA,
    )


def grounding_manifest(
    parsed: "ray.data.Dataset", save_dir: str, page_width: int = 816, page_height: int = 1056
) -> "ray.data.Dataset":
    return parsed.map_batches(
        grounding_manifest_batch,
        fn_kwargs={
            "save_dir": save_dir,
            "page_width": page_width,
            "page_height": page_height,
        },
        batch_format="pyarrow",
    )
