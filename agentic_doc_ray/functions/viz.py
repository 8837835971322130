"""Visualization debug stage (the reference's viz_parsed_document analogue).

The reference draws per-page bboxes + ``{idx} {chunk_type}`` labels with a
per-ChunkType color map (``/root/reference/agentic_doc/utils.py:294-414``,
colors ``config.py:14-19``). No image libraries exist in this container, so
the Ray-native stage emits the *draw-command table* — one row per chunk
with pixel rect, BGR color, and label — which any renderer can replay.
Not on the hot path (debug only).
"""

from __future__ import annotations

from dataclasses import dataclass

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
        idx_by_doc: dict[str, int] = {}
        labels = []
        for d, k in zip(m.column("doc_id").to_pylist(), kinds):
            i = idx_by_doc.get(d, 0)
            labels.append(f"{i} {k}")
            idx_by_doc[d] = i + 1
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
