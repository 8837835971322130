"""Visualization debug stage (the reference's viz_parsed_document analogue).

The reference draws per-page bboxes + ``{idx} {chunk_type}`` labels with a
per-ChunkType color map (``/root/reference/agentic_doc/utils.py:294-414``,
colors ``config.py:14-19``). Two surfaces here:

  - ``viz_commands``: the draw-command table — one row per chunk with
    pixel rect, BGR color, and label — which any renderer can replay;
  - ``render_overlays``: REAL rendered page overlays through the engine's
    PPM raster path (grounding.rasterize_page + encode_ppm): bbox
    outlines in the per-type color and a blended label-background strip
    per mark, matching the reference's rectangle/label-box semantics.
    Glyph rendering needs a font library this container lacks, so the
    label strip is the documented stand-in for cv2.putText; everything
    else (rect geometry, color map, opacity blend, placement fallback)
    is real and pixel-tested.

Not on the hot path (debug only).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

# Reference color map (BGR, config.py:14-19); title reuses text's color,
# error gets red.
COLOR_MAP: dict[str, tuple[int, int, int]] = {
    "marginalia": (128, 0, 255),
    "table": (139, 69, 19),
    "figure": (50, 205, 50),
    "text": (255, 0, 0),
    "title": (255, 0, 0),
    "error": (0, 0, 255),
}

VIZ_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page", pa.int32()),
        ("label", pa.string()),        # "{idx} {kind}" as in _place_mark
        ("xmin", pa.int32()),
        ("ymin", pa.int32()),
        ("xmax", pa.int32()),
        ("ymax", pa.int32()),
        ("color_b", pa.int32()),
        ("color_g", pa.int32()),
        ("color_r", pa.int32()),
        ("thickness", pa.int32()),
        ("font_scale", pa.float64()),
    ]
)


@dataclass(frozen=True)
class VisualizationConfig:
    """Customizable draw styling (reference config.py:182-221 parity:
    thickness / text bg / padding / font / per-ChunkType color map). The
    ``font`` int mirrors the reference's cv2 font code — carried through
    the draw-command table for whatever renderer replays it."""

    thickness: int = 1
    text_bg_color: tuple[int, int, int] = (211, 211, 211)
    text_bg_opacity: float = 0.7
    padding: int = 1
    font_scale: float = 0.5
    font: int = 0  # cv2.FONT_HERSHEY_SIMPLEX
    color_map: dict[str, tuple[int, int, int]] | None = None  # overrides COLOR_MAP

    def __post_init__(self) -> None:
        if self.thickness < 0 or self.padding < 0 or self.font_scale < 0:
            raise ValueError("thickness/padding/font_scale must be >= 0")
        if not (0.0 <= self.text_bg_opacity <= 1.0):
            raise ValueError("text_bg_opacity must be in [0, 1]")


DEFAULT_VIZ_CONFIG = VisualizationConfig()


def viz_commands(
    parsed: "ray.data.Dataset",
    page_width: int = 816,
    page_height: int = 1056,
    viz_config: VisualizationConfig = DEFAULT_VIZ_CONFIG,
) -> "ray.data.Dataset":
    """Parsed docs -> draw-command rows (one per chunk grounding).

    Single batch fn over parsed-doc rows: a document's chunks never split
    across batches (doc rows are atomic), so the per-doc label index —
    which IS the span offset — stays exact.
    """
    from agentic_doc_ray.functions.grounding import grounding_manifest_batch

    cmap = {**COLOR_MAP, **(viz_config.color_map or {})}

    def to_commands(batch: pa.Table) -> pa.Table:
        m = grounding_manifest_batch(batch, "", page_width, page_height)
        kinds = m.column("kind").to_pylist()
        colors = [cmap.get(k, (255, 0, 0)) for k in kinds]
        # manifest rows are per GROUNDING: the chunk index advances only on
        # a chunk's first grounding (g_idx == 0); its other groundings
        # repeat the same label (ref draws one label per grounding box)
        idx_by_doc: dict[str, int] = {}
        labels = []
        for d, k, gi in zip(
            m.column("doc_id").to_pylist(), kinds, m.column("g_idx").to_pylist()
        ):
            i = idx_by_doc.get(d, 0)
            if gi == 0:
                idx_by_doc[d] = i + 1
            else:
                i -= 1  # same chunk as the previous row
            labels.append(f"{i} {k}")
        return pa.Table.from_arrays(
            [
                m.column("doc_id"),
                m.column("page"),
                pa.array(labels, pa.string()),
                m.column("xmin"),
                m.column("ymin"),
                m.column("xmax"),
                m.column("ymax"),
                pa.array([c[0] for c in colors], pa.int32()),
                pa.array([c[1] for c in colors], pa.int32()),
                pa.array([c[2] for c in colors], pa.int32()),
                pa.array([viz_config.thickness] * m.num_rows, pa.int32()),
                pa.array([viz_config.font_scale] * m.num_rows, pa.float64()),
            ],
            schema=VIZ_SCHEMA,
        )

    return parsed.map_batches(to_commands, batch_format="pyarrow")


OVERLAY_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_marks", pa.int32()),
        ("image_ppm", pa.binary()),
    ]
)


def _draw_rect_outline(
    img: np.ndarray, x0: int, y0: int, x1: int, y1: int, color, thickness: int
) -> None:
    """cv2.rectangle(thickness>0) analogue: a ``thickness``-px frame just
    inside the rect (clamped; degenerate rects are skipped)."""
    if x1 <= x0 or y1 <= y0:
        return
    t = max(1, thickness)
    img[y0 : min(y0 + t, y1), x0:x1] = color
    img[max(y1 - t, y0) : y1, x0:x1] = color
    img[y0:y1, x0 : min(x0 + t, x1)] = color
    img[y0:y1, max(x1 - t, x0) : x1] = color


def _blend_region(
    img: np.ndarray, x0: int, y0: int, x1: int, y1: int, bg, opacity: float
) -> None:
    """cv2.addWeighted analogue over one region (the label's background
    box, ref utils.py:330-340): out = bg*opacity + img*(1-opacity)."""
    if x1 <= x0 or y1 <= y0:
        return
    region = img[y0:y1, x0:x1].astype(np.float64)
    blended = np.asarray(bg, dtype=np.float64) * opacity + region * (1.0 - opacity)
    img[y0:y1, x0:x1] = np.round(blended).astype(np.uint8)


def render_page_overlay(
    page_spans: list[dict],
    doc_marks: list[tuple[int, str]],
    page_width: int,
    page_height: int,
    viz_config: VisualizationConfig,
) -> np.ndarray:
    """Rasterize one page and replay its draw commands onto it.

    ``page_spans`` holds one {text, bbox} dict per MARK on this page (a
    multi-page chunk contributes one mark per grounding it has here);
    ``doc_marks`` carries (span_idx_within_doc, kind) per mark so the
    ``{idx} {kind}`` label numbering matches the reference's enumerate over
    the whole document's chunks (utils.py:309-316)."""
    from agentic_doc_ray.functions.grounding import crop_rect, rasterize_page

    cmap = {**COLOR_MAP, **(viz_config.color_map or {})}
    img = rasterize_page(page_spans, page_width, page_height)
    pad = viz_config.padding
    for s, (idx, kind) in zip(page_spans, doc_marks):
        x0, y0, x1, y1, _ = crop_rect(tuple(s["bbox"]), page_width, page_height)
        bgr = cmap.get(kind, (255, 0, 0))
        rgb = (bgr[2], bgr[1], bgr[0])  # PPM pages are RGB; the map is BGR
        _draw_rect_outline(img, x0, y0, x1, y1, rgb, viz_config.thickness)
        # label background strip (the cv2.getTextSize box): height/width
        # scale with font_scale and label length; placed above the bbox,
        # falling inside it when clipped at the page top (ref
        # _place_mark's in-image fallback)
        label = f"{idx} {kind}"
        lh = max(8, int(round(16 * viz_config.font_scale))) + 2 * pad
        lw = min(
            page_width - x0,
            max(4, int(round(8 * viz_config.font_scale))) * len(label) + 2 * pad,
        )
        ly0 = y0 - lh - pad
        if ly0 < 0:
            ly0 = y0 + pad
        _blend_region(
            img,
            x0,
            ly0,
            x0 + lw,
            min(ly0 + lh, page_height),
            viz_config.text_bg_color,
            viz_config.text_bg_opacity,
        )
    return img


def render_overlays(
    parsed: "ray.data.Dataset",
    page_width: int = 816,
    page_height: int = 1056,
    viz_config: VisualizationConfig = DEFAULT_VIZ_CONFIG,
) -> "ray.data.Dataset":
    """Parsed docs -> one rendered PPM overlay row per (doc, page).

    The rendered-output counterpart of ``viz_commands`` (reference
    utils.py:294-414 semantics over the engine's PPM raster path). Pages
    render independently inside each batch task; a doc's rows are atomic
    per batch, so the per-doc mark numbering is exact."""
    from agentic_doc_ray.functions.grounding import encode_ppm

    def to_overlays(batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": [],
            "page": [],
            "width": [],
            "height": [],
            "n_marks": [],
            "image_ppm": [],
        }
        for row in batch.to_pylist():
            spans = row["spans"] or []
            by_page: dict[int, list] = {}
            for idx, s in enumerate(spans):
                gs = s.get("groundings") or [{"page": s["page"], "bbox": s["bbox"]}]
                for gr in gs:  # one mark per grounding, per its own page
                    by_page.setdefault(gr["page"], []).append((idx, s, gr["bbox"]))
            for p, marks in sorted(by_page.items()):
                img = render_page_overlay(
                    [{"text": s["text"], "bbox": bb} for _, s, bb in marks],
                    [(idx, s["kind"]) for idx, s, _ in marks],
                    page_width,
                    page_height,
                    viz_config,
                )
                out["doc_id"].append(row["doc_id"])
                out["page"].append(p)
                out["width"].append(page_width)
                out["height"].append(page_height)
                out["n_marks"].append(len(marks))
                out["image_ppm"].append(encode_ppm(img))
        return pa.Table.from_pydict(out, schema=OVERLAY_SCHEMA)

    return parsed.map_batches(to_overlays, batch_format="pyarrow")
