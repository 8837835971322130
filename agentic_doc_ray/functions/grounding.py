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

The full rasterize -> crop -> encode -> save -> read-back path is REAL:
pages render to RGB ndarrays (a deterministic synthetic rasterizer stands
in for pymupdf's PDF rendering only — each chunk paints its pixel rect
with a content-derived color), crops are actual array slices, and files
are PPM (P6) — a pure-bytes image format needing no codec library, with
``read_img_rgb`` as the reader (the reference's ``_read_img_rgb``,
utils.py:417-430). ``grounding_manifest`` stays as the metadata-only
fast path (no pixel work).
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
        ("g_idx", pa.int32()),  # grounding index within its chunk
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

    One row per GROUNDING, not per chunk: a multi-page chunk contributes
    one row per (page, bbox) pair with ``g_idx`` giving its position in
    the chunk's grounding list — matching the reference's per-grounding
    crop loop + ``_{i}`` path suffix (utils.py:127-162). Default page size
    = US Letter at the reference's 96 dpi (config.py:118-122).
    """
    spans = batch.column("spans").combine_chunks()
    span_parents = pc.list_parent_indices(spans)
    flat = spans.flatten()
    span_doc_ids = pc.take(batch.column("doc_id").combine_chunks(), span_parents)

    grounds = flat.field("groundings")
    g_parents = pc.list_parent_indices(grounds).to_numpy(zero_copy_only=False)
    gflat = grounds.flatten()
    g_lens = pc.list_value_length(grounds).to_numpy(zero_copy_only=False)
    g_starts = np.concatenate(([0], np.cumsum(g_lens)))
    g_idx = (
        np.arange(len(gflat), dtype=np.int64) - g_starts[g_parents]
    ).astype(np.int32)

    take = pa.array(g_parents, pa.int64())
    doc_ids = pc.take(span_doc_ids, take)
    chunk_ids_arr = pc.take(flat.field("chunk_id"), take)
    kinds_arr = pc.take(flat.field("kind"), take)
    pages_arr = gflat.field("page")

    bbox = np.asarray(gflat.field("bbox").flatten(), dtype=np.float64).reshape(-1, 4)
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

    kinds = kinds_arr.to_pylist()
    chunk_ids = chunk_ids_arr.to_pylist()
    pages = pages_arr.to_pylist()
    paths = [
        f"{save_dir}/page_{p}/{k}_{cid}_{gi}.png"
        for p, k, cid, gi in zip(pages, kinds, chunk_ids, g_idx.tolist())
    ]
    return pa.Table.from_arrays(
        [
            doc_ids,
            chunk_ids_arr,
            pa.array(g_idx),
            kinds_arr,
            pages_arr,
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


# ---------------------------------------------------------------------------
# Real rasterize -> crop -> encode -> save -> read path (PPM, no codec lib)
# ---------------------------------------------------------------------------


def _chunk_color(text: str) -> np.ndarray:
    """Deterministic RGB for a chunk's painted rect (content-derived)."""
    import hashlib

    d = hashlib.sha256((text or "").encode()).digest()
    # keep away from the 255 background so crops are distinguishable
    return np.frombuffer(d[:3], dtype=np.uint8) % 200


def rasterize_page(
    page_spans: list[dict], width: int = 816, height: int = 1056
) -> np.ndarray:
    """Render one page to an RGB array (the ``page_to_image`` analogue,
    ref utils.py:110-124). Deterministic synthetic rendering: white page,
    each chunk's pixel rect painted with a color derived from its text —
    the stand-in for pymupdf's rasterizer; everything downstream (crop,
    encode, save, read) operates on these real arrays."""
    img = np.full((height, width, 3), 255, dtype=np.uint8)
    for s in page_spans:
        x0, y0, x1, y1, _ = crop_rect(tuple(s["bbox"]), width, height)
        if x1 > x0 and y1 > y0:
            img[y0:y1, x0:x1] = _chunk_color(s["text"])
    return img


def encode_ppm(img: np.ndarray) -> bytes:
    """RGB array -> binary PPM (P6): pure bytes, no codec library."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def read_img_rgb(data: bytes) -> np.ndarray:
    """PPM (P6) bytes -> RGB array (the reference's _read_img_rgb reader
    surface, utils.py:417-430 — theirs wraps cv2 imread + BGR->RGB)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated, with
    # possible '#' comments
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


def save_groundings_batch(
    batch: pa.Table, save_dir: str, page_width: int = 816, page_height: int = 1056
) -> pa.Table:
    """Parsed-doc rows -> written crop files + manifest rows.

    Per doc: group chunks by page (LOCAL, ref utils.py:94-100), rasterize
    each page once, slice every grounding's crop out of the page array, and
    write ``{save_dir}/page_{p}/{kind}_{chunk_id}_0.ppm`` atomically."""
    import os

    out = {
        "doc_id": [],
        "chunk_id": [],
        "page": [],
        "image_path": [],
        "crop_w": [],
        "crop_h": [],
    }
    for row in batch.to_pylist():
        # one paint + one crop per GROUNDING: a multi-page chunk paints and
        # crops on every page it grounds on, path-suffixed by its grounding
        # index (ref utils.py:127-162 `_crop_groundings` loop)
        by_page: dict[int, list[tuple]] = {}
        for s in row["spans"] or []:
            gs = s.get("groundings") or [{"page": s["page"], "bbox": s["bbox"]}]
            for gi, gr in enumerate(gs):
                by_page.setdefault(gr["page"], []).append((s, gi, gr["bbox"]))
        for p, marks in sorted(by_page.items()):
            img = rasterize_page(
                [{"text": s["text"], "bbox": bb} for s, _, bb in marks],
                page_width,
                page_height,
            )
            page_dir = os.path.join(save_dir, f"page_{p}")
            os.makedirs(page_dir, exist_ok=True)
            for s, gi, bb in marks:
                x0, y0, x1, y1, _ = crop_rect(tuple(bb), page_width, page_height)
                crop = img[y0:y1, x0:x1]
                path = os.path.join(
                    page_dir, f"{s['kind']}_{s['chunk_id']}_{gi}.ppm"
                )
                tmp = path + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(encode_ppm(crop))
                os.replace(tmp, path)
                out["doc_id"].append(row["doc_id"])
                out["chunk_id"].append(s["chunk_id"])
                out["page"].append(p)
                out["image_path"].append(path)
                out["crop_w"].append(max(0, x1 - x0))
                out["crop_h"].append(max(0, y1 - y0))
    return pa.Table.from_pydict(
        out,
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("chunk_id", pa.string()),
                ("page", pa.int32()),
                ("image_path", pa.string()),
                ("crop_w", pa.int32()),
                ("crop_h", pa.int32()),
            ]
        ),
    )


def save_groundings(
    parsed: "ray.data.Dataset",
    save_dir: str,
    page_width: int = 816,
    page_height: int = 1056,
) -> "ray.data.Dataset":
    """Write every grounding crop as a real image file; returns the
    manifest of written files (a shared filesystem at multi-node scale)."""
    return parsed.map_batches(
        save_groundings_batch,
        fn_kwargs={
            "save_dir": save_dir,
            "page_width": page_width,
            "page_height": page_height,
        },
        batch_format="pyarrow",
    )


def grounding_coverage(manifest: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per (doc, page) grounding-coverage audit over the crop manifest:
    sum of clamped bbox pixel areas (exact integers; overlaps counted —
    a SUM coverage, the cheap layout-density signal) vs the page area,
    as floor ppm. Per-batch (doc, page) partials -> one tiny aggregate.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        area = pc.multiply(
            pc.subtract(batch.column("xmax"), batch.column("xmin")),
            pc.subtract(batch.column("ymax"), batch.column("ymin")),
        ).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("doc_id"), batch.column("page").cast(pa.int64()), area],
            names=["doc_id", "page", "area"],
        )
        g = t.group_by(["doc_id", "page"]).aggregate(
            [("area", "sum"), ("area", "count")]
        )
        return g.rename_columns(["doc_id", "page", "area", "n_crops"])

    agg = (
        manifest.map_batches(partial, batch_format="pyarrow")
        .groupby(["doc_id", "page"], num_partitions=shuffle_partitions(8))
        .aggregate(
            Sum("area", alias_name="area_sum"),
            Sum("n_crops", alias_name="n_crops"),
        )
    )
    page_area = 816 * 1056  # the engine's default page raster (see above)

    def finish(batch: pa.Table) -> pa.Table:
        ppm = pc.divide(
            pc.multiply(batch.column("area_sum"), pa.scalar(1_000_000, pa.int64())),
            pa.scalar(page_area, pa.int64()),
        )
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("page"),
                batch.column("n_crops").combine_chunks().cast(pa.int64()),
                batch.column("area_sum").combine_chunks().cast(pa.int64()),
                ppm.combine_chunks().cast(pa.int64()),
            ],
            names=["doc_id", "page", "n_crops", "area_sum", "coverage_ppm"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")
