"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns. The Ray-side
plumbing (schemas, actor-pool signatures, batch sizing, output layout) is
real and tested; the codec itself is STUBBED — the container has no
image/audio libraries — behind ``decoder="fake"`` (deterministic) or
``decoder="real"`` (raises NotImplementedError where PIL/ffmpeg would be
called).

Batch-size note for 100 TB: binary rows are wide; these stages should run
with small ``batch_size`` (e.g. 16-64) and a larger
``DataContext.target_max_block_size`` so single rows never exceed a block.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a feature vector derived
    from the payload digest. Keeps the distributed plumbing honest."""
    d = hashlib.sha256(payload or b"").digest()
    return (
        np.frombuffer(d[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0
    )


class MediaFeatureActor:
    """binary payload -> feature vector (actor pool; codec is warm state)."""

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError("decoder must be 'fake' or 'real'")
        self.decoder = decoder
        # real path: this is where the codec/model would be loaded once

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decoder == "real":
            raise NotImplementedError(
                "real image/audio decode requires PIL/ffmpeg, unavailable here"
            )
        return _fake_decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._decode(p) for p in payloads])
        return pa.Table.from_arrays(
            [
                batch.column("media_id"),
                batch.column("media_type"),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), FEATURE_DIM
                ),
            ],
            names=["media_id", "media_type", "features"],
        )


class FrameSampleActor:
    """Deterministic frame sampling stub: one row per sampled "frame"."""

    def __init__(self, every_n_bytes: int = 1024, decoder: str = "fake"):
        self.every = every_n_bytes
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("real frame extraction requires ffmpeg")
        out = {"media_id": [], "frame_idx": [], "frame_digest": []}
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            p = payload or b""
            n_frames = max(1, len(p) // self.every)
            for f in range(n_frames):
                chunk = p[f * self.every : (f + 1) * self.every]
                out["media_id"].append(mid)
                out["frame_idx"].append(f)
                out["frame_digest"].append(hashlib.sha256(chunk).hexdigest()[:16])
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [
                    ("media_id", pa.string()),
                    ("frame_idx", pa.int32()),
                    ("frame_digest", pa.string()),
                ]
            ),
        )


def media_features(
    media: "ray.data.Dataset", decoder: str = "fake"
) -> "ray.data.Dataset":
    return media.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=64,  # wide binary rows -> small batches
        concurrency=(1, 8),
    )


def frame_samples(
    media: "ray.data.Dataset", decoder: str = "fake"
) -> "ray.data.Dataset":
    return media.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 8),
    )


def synth_media_table(documents_parquet: str, limit: int = 64) -> pa.Table:
    """Deterministic media fixture derived from the documents table."""
    import pyarrow.parquet as pq

    t = pq.read_table(documents_parquet, columns=["doc_id", "text"]).slice(0, limit)
    rows = {"media_id": [], "media_type": [], "payload": [], "width": [], "height": []}
    types = ["image", "audio", "video"]
    for i, (d, txt) in enumerate(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())):
        rows["media_id"].append(f"media-{int(d):08d}")
        rows["media_type"].append(types[i % 3])
        rows["payload"].append((txt or "x").encode() * 50)
        rows["width"].append(64 + (i % 8) * 16)
        rows["height"].append(64 + (i % 5) * 16)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
