"""Video frame-sequence processing: perceptual scene-cut detection.

The clip-sampling stage of a video training-data pipeline needs scene
boundaries: consecutive frames inside a scene are perceptually near
(small dHash Hamming distance), a hard cut jumps. This operator runs on
the engine's REAL PPM image path (functions/grounding.py decode +
functions/phash.dhash64) — no external codec: frames are genuine raster
images, hashes are exact integers, and the planted fixture proves the
detector separates gradual drift from cuts.

Scale shape: frame PIXELS never shuffle. The per-frame dHash is a
batch-local map (64 bits per frame leave the stage); only
(video_id, frame_idx, dhash) key rows — 16 B/frame — go through ONE
video-keyed exchange where each group sorts its frames and computes
consecutive XOR-popcount distances. A 2-hour 30 fps video is ~216k
frames = ~3.5 MB of exchange rows; group work is O(frames).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import partitions_for

FRAME_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("frame_idx", pa.int64()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

CUT_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("frame_idx", pa.int64()),
        ("hamming", pa.int64()),
        ("is_cut", pa.int64()),
    ]
)


def _frame_hashes_batch(batch: pa.Table) -> pa.Table:
    """(video_id, frame_idx, payload) -> (video_id, frame_idx, dhash):
    REAL PPM decode + exact-integer dHash, batch-local."""
    from agentic_doc_ray.functions.grounding import read_img_rgb
    from agentic_doc_ray.functions.phash import dhash64

    hashes = np.fromiter(
        (dhash64(read_img_rgb(p.as_py())) for p in batch.column("payload")),
        dtype=np.uint64,
        count=batch.num_rows,
    ).view(np.int64)
    return pa.Table.from_arrays(
        [batch.column("video_id"), batch.column("frame_idx"), pa.array(hashes)],
        names=["video_id", "frame_idx", "dhash"],
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of an int64/uint64 array (byte unpack)."""
    if len(x) == 0:
        return np.zeros(0, np.int64)
    return (
        np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )


def scene_cuts_from_hashes(tbl: pa.Table, threshold: int) -> pa.Table:
    """(video_id, frame_idx, dhash) rows of ONE OR MORE whole videos ->
    per-transition rows; shared by the group task and the replica
    oracle (bit-equal)."""
    order = pc.sort_indices(
        tbl, sort_keys=[("video_id", "ascending"), ("frame_idx", "ascending")]
    )
    t = tbl.take(order)
    vid = t.column("video_id").to_numpy(zero_copy_only=False)
    h = t.column("dhash").to_numpy(zero_copy_only=False)
    if len(vid) < 2:
        return CUT_SCHEMA.empty_table()
    same = vid[1:] == vid[:-1]
    ham = _popcount64(np.bitwise_xor(h[1:], h[:-1]))
    keep = same
    return pa.Table.from_arrays(
        [
            pa.array(vid[1:][keep]),
            t.column("frame_idx").slice(1).filter(pa.array(keep)),
            pa.array(ham[keep]),
            pa.array((ham[keep] > threshold).astype(np.int64)),
        ],
        schema=CUT_SCHEMA,
    )


def video_scene_cuts(
    frames: "ray.data.Dataset",
    threshold: int = 8,
    n_rows_hint: int | None = None,
) -> "ray.data.Dataset":
    """Distributed scene-cut detection: per video, one output row per
    frame TRANSITION (frame_idx of the later frame) with the dHash
    Hamming distance and the cut flag.

    One exchange, key rows only (16 B/frame); the video-keyed group
    task sorts frames and computes consecutive distances — shared
    verbatim with the replica oracle. The exchange is sentinel-guarded
    (NUL-prefixed video_ids, dropped in-group)."""
    from agentic_doc_ray.functions._exchange import str_key_sentinels

    hash_schema = pa.schema(
        [
            ("video_id", pa.string()),
            ("frame_idx", pa.int64()),
            ("dhash", pa.int64()),
        ]
    )

    def cuts_group(grp: pa.Table) -> pa.Table:
        if grp.column("video_id")[0].as_py().startswith("\x00"):
            return CUT_SCHEMA.empty_table()
        return scene_cuts_from_hashes(grp, threshold)

    n_hint = n_rows_hint if n_rows_hint is not None else frames.count()
    return (
        frames.map_batches(_frame_hashes_batch, batch_format="pyarrow")
        .union(
            str_key_sentinels(hash_schema, "video_id", fill={"frame_idx": 0, "dhash": 0})
        )
        .groupby("video_id", num_partitions=partitions_for(n_hint))
        .map_groups(cuts_group, batch_format="pyarrow")
    )


def synth_ppm_video_table(
    documents_parquet: str,
    limit: int = 12,
    n_frames: int = 16,
    scene_len: int = 6,
) -> pa.Table:
    """Deterministic video fixture with REAL PPM frames and PLANTED
    scene structure: scene s of a video is a fresh token-derived cell
    pattern (``_scene_img`` below — scene id hashed into EVERY cell);
    within a scene, each frame inverts ONE more grid-aligned cell than
    the last, so consecutive same-scene frames differ by <= 2 dHash
    bits while scene boundaries jump by many — the ground truth for the
    cut detector's planted test (cuts at frame_idx % scene_len == 0)."""
    import zlib

    import pyarrow.parquet as pq

    from agentic_doc_ray.functions.grounding import encode_ppm
    from agentic_doc_ray.functions.phash import _CELL_PX, GRID_H, GRID_W

    def _scene_img(text: str, scene: int) -> np.ndarray:
        """Cell pattern like ``phash._pattern_img`` but with the SCENE id
        in every cell's hash input, so a scene change re-rolls every
        cell (expected dHash distance ~32 bits, not the ~1-7 a
        text-suffix tweak yields — it only perturbs the last token)."""
        toks = (text or "x").split() or ["x"]
        cells = np.empty((GRID_H, GRID_W, 3), dtype=np.uint8)
        for r in range(GRID_H):
            for c in range(GRID_W):
                tok = toks[(r * GRID_W + c) % len(toks)]
                v = zlib.crc32(f"{tok}:{r}:{c}:s{scene}".encode())
                cells[r, c] = [(v >> sh) & 0xFF for sh in (0, 8, 16)]
        return np.repeat(np.repeat(cells, _CELL_PX, axis=0), _CELL_PX, axis=1)

    t = pq.read_table(documents_parquet, columns=["doc_id", "text"]).slice(0, limit)
    rows = []
    for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        img = None
        for f in range(n_frames):
            s, j = divmod(f, scene_len)
            if j == 0:
                img = _scene_img(txt or str(d), s)
            else:
                # invert one interior cell per step (cumulative): cell
                # (r, c) touches only the two comparisons beside it
                r = 1 + (j % (GRID_H - 2))
                c = 1 + ((j * 3) % (GRID_W - 2))
                cp = _CELL_PX
                img = img.copy()
                img[r * cp : (r + 1) * cp, c * cp : (c + 1) * cp] = (
                    255 - img[r * cp : (r + 1) * cp, c * cp : (c + 1) * cp]
                )
            h, w = img.shape[:2]
            rows.append(
                {
                    "video_id": f"vid-{int(d):08d}",
                    "frame_idx": f,
                    "payload": encode_ppm(img),
                    "width": w,
                    "height": h,
                }
            )
    return pa.Table.from_pylist(rows, schema=FRAME_SCHEMA)


SCENE_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("scene_idx", pa.int64()),
        ("start_frame", pa.int64()),
        ("n_frames", pa.int64()),
    ]
)


def scenes_from_hashes(tbl: pa.Table, threshold: int) -> pa.Table:
    """(video_id, frame_idx, dhash) rows of whole videos -> scene SPANS
    (the clip-sampling unit): consecutive frames stay in one scene until
    a transition's Hamming distance exceeds ``threshold``. Shared by the
    distributed group task and the replica oracle."""
    order = pc.sort_indices(
        tbl, sort_keys=[("video_id", "ascending"), ("frame_idx", "ascending")]
    )
    t = tbl.take(order)
    vid = t.column("video_id").to_numpy(zero_copy_only=False)
    fidx = t.column("frame_idx").to_numpy(zero_copy_only=False)
    h = t.column("dhash").to_numpy(zero_copy_only=False)
    if len(vid) == 0:
        return SCENE_SCHEMA.empty_table()
    new_video = np.concatenate(([True], vid[1:] != vid[:-1]))
    ham = np.concatenate(
        ([0], _popcount64(np.bitwise_xor(h[1:], h[:-1])))
    )
    starts = new_video | ((ham > threshold) & ~new_video)
    scene_of_row = np.cumsum(starts.astype(np.int64)) - 1
    start_rows = np.flatnonzero(starts)
    n_frames = np.diff(np.concatenate((start_rows, [len(vid)])))
    # scene_idx resets per video: subtract each video's first scene id
    vstart_rows = np.flatnonzero(new_video)
    first_scene_of_video = scene_of_row[vstart_rows]
    scene_idx = np.arange(len(start_rows), dtype=np.int64) - np.repeat(
        first_scene_of_video,
        np.diff(np.concatenate((np.searchsorted(start_rows, vstart_rows), [len(start_rows)]))),
    )
    return pa.Table.from_arrays(
        [
            pa.array(vid[start_rows]),
            pa.array(scene_idx),
            pa.array(fidx[start_rows]),
            pa.array(n_frames),
        ],
        schema=SCENE_SCHEMA,
    )


def video_scenes(
    frames: "ray.data.Dataset",
    threshold: int = 8,
    n_rows_hint: int | None = None,
) -> "ray.data.Dataset":
    """Distributed scene-span extraction: same one-exchange shape as
    ``video_scene_cuts`` (16 B/frame key rows; pixels never shuffle),
    emitting (video_id, scene_idx, start_frame, n_frames) spans."""
    from agentic_doc_ray.functions._exchange import str_key_sentinels

    hash_schema = pa.schema(
        [
            ("video_id", pa.string()),
            ("frame_idx", pa.int64()),
            ("dhash", pa.int64()),
        ]
    )

    def scenes_group(grp: pa.Table) -> pa.Table:
        if grp.column("video_id")[0].as_py().startswith("\x00"):
            return SCENE_SCHEMA.empty_table()
        return scenes_from_hashes(grp, threshold)

    n_hint = n_rows_hint if n_rows_hint is not None else frames.count()
    return (
        frames.map_batches(_frame_hashes_batch, batch_format="pyarrow")
        .union(
            str_key_sentinels(hash_schema, "video_id", fill={"frame_idx": 0, "dhash": 0})
        )
        .groupby("video_id", num_partitions=partitions_for(n_hint))
        .map_groups(scenes_group, batch_format="pyarrow")
    )
