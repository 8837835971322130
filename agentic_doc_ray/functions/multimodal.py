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


def _ppm_features(payload: bytes) -> np.ndarray:
    """REAL image features from a PPM payload: per-channel mean/std/min/max
    + aspect + size (padded to FEATURE_DIM). No codec library — PPM is the
    engine's native image format (functions/grounding.py)."""
    from agentic_doc_ray.functions.grounding import read_img_rgb

    img = read_img_rgb(payload).astype(np.float64) / 255.0
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    feats = np.concatenate(
        [
            flat.mean(axis=0),
            flat.std(axis=0),
            flat.min(axis=0),
            flat.max(axis=0),
            [w / max(h, 1), np.log1p(w * h) / 20.0],
        ]
    )
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[: len(feats)] = feats.astype(np.float32)
    return out


class MediaFeatureActor:
    """binary payload -> feature vector (actor pool; codec is warm state).

    decoder: "ppm" = REAL decode+features for the engine's native PPM
    format; "fake" = deterministic digest features (any payload); "real" =
    the PIL/ffmpeg seam (unavailable in this container, raises)."""

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real", "ppm"):
            raise ValueError("decoder must be 'fake', 'real' or 'ppm'")
        self.decoder = decoder
        # real path: this is where the codec/model would be loaded once

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decoder == "real":
            raise NotImplementedError(
                "real image/audio decode requires PIL/ffmpeg, unavailable here"
            )
        if self.decoder == "ppm":
            return _ppm_features(payload)
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


RESIZED_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("orig_width", pa.int32()),
        ("orig_height", pa.int32()),
    ]
)


class ResizeActor:
    """Image resize stage: fit within (max_w, max_h) preserving aspect
    ratio — the dimension math is real (matches PIL.thumbnail semantics:
    floor with a 1px minimum), the pixel resample is the stubbed codec
    (deterministic digest-tagged payload on the fake path). Non-image rows
    pass through unchanged with their original dims copied."""

    def __init__(self, max_w: int = 512, max_h: int = 512, decoder: str = "fake"):
        if decoder not in ("fake", "real", "ppm"):
            raise ValueError("decoder must be 'fake', 'real' or 'ppm'")
        self.max_w, self.max_h = max_w, max_h
        self.decoder = decoder

    def target_dims(self, w: int, h: int) -> tuple[int, int]:
        if w <= self.max_w and h <= self.max_h:
            return w, h
        scale = min(self.max_w / w, self.max_h / h)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def _resample_ppm(self, payload: bytes, tw: int, th: int) -> bytes:
        """REAL nearest-neighbor resample of a PPM payload (pure numpy)."""
        from agentic_doc_ray.functions.grounding import encode_ppm, read_img_rgb

        img = read_img_rgb(payload)
        h, w = img.shape[:2]
        yi = np.minimum((np.arange(th) * h) // th, h - 1)
        xi = np.minimum((np.arange(tw) * w) // tw, w - 1)
        return encode_ppm(img[yi][:, xi])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("real resize requires PIL, unavailable here")
        out = {k: [] for k in RESIZED_SCHEMA.names}
        for row in batch.to_pylist():
            w, h = row["width"], row["height"]
            if row["media_type"] == "image":
                tw, th = self.target_dims(w, h)
                if (tw, th) == (w, h):
                    payload = row["payload"]
                elif self.decoder == "ppm":
                    payload = self._resample_ppm(row["payload"], tw, th)
                else:
                    payload = hashlib.sha256(
                        (row["payload"] or b"") + f"{tw}x{th}".encode()
                    ).digest()
            else:
                tw, th, payload = w, h, row["payload"]
            out["media_id"].append(row["media_id"])
            out["media_type"].append(row["media_type"])
            out["payload"].append(payload)
            out["width"].append(tw)
            out["height"].append(th)
            out["orig_width"].append(w)
            out["orig_height"].append(h)
        return pa.Table.from_pydict(out, schema=RESIZED_SCHEMA)


class AudioChunkActor:
    """Audio chunking stub: fixed-duration windows over the byte stream
    (stand-in for sample-rate-aware segmentation); one row per chunk with
    byte offsets so a real codec slots in without schema changes."""

    def __init__(self, chunk_bytes: int = 2048, decoder: str = "fake"):
        self.chunk = chunk_bytes
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("real audio decode requires ffmpeg")
        out = {"media_id": [], "chunk_idx": [], "byte_lo": [], "byte_hi": [], "digest": []}
        for mid, mtype, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mtype != "audio":
                continue
            p = payload or b""
            n = max(1, (len(p) + self.chunk - 1) // self.chunk)
            for c in range(n):
                lo, hi = c * self.chunk, min((c + 1) * self.chunk, len(p))
                out["media_id"].append(mid)
                out["chunk_idx"].append(c)
                out["byte_lo"].append(lo)
                out["byte_hi"].append(hi)
                out["digest"].append(hashlib.sha256(p[lo:hi]).hexdigest()[:16])
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [
                    ("media_id", pa.string()),
                    ("chunk_idx", pa.int32()),
                    ("byte_lo", pa.int64()),
                    ("byte_hi", pa.int64()),
                    ("digest", pa.string()),
                ]
            ),
        )


def resize_media(
    media: "ray.data.Dataset", max_w: int = 512, max_h: int = 512, decoder: str = "fake"
) -> "ray.data.Dataset":
    return media.map_batches(
        ResizeActor,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 8),
    )


def audio_chunks(
    media: "ray.data.Dataset", chunk_bytes: int = 2048, decoder: str = "fake"
) -> "ray.data.Dataset":
    return media.map_batches(
        AudioChunkActor,
        fn_constructor_kwargs={"chunk_bytes": chunk_bytes, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 8),
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


def synth_ppm_media_table(documents_parquet: str, limit: int = 64) -> pa.Table:
    """Deterministic IMAGE fixture with REAL PPM payloads: each document's
    first spans rasterized to a small page (functions/grounding.py), so the
    decode/feature/resize paths operate on genuine image bytes."""
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions.grounding import encode_ppm, rasterize_page

    t = pq.read_table(documents_parquet, columns=["doc_id", "text"]).slice(0, limit)
    rows = {"media_id": [], "media_type": [], "payload": [], "width": [], "height": []}
    for i, (d, txt) in enumerate(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())):
        w, h = 96 + (i % 4) * 32, 96 + (i % 3) * 32
        blocks = [b for b in (txt or "x").split("\n\n") if b][:4] or ["x"]
        n = len(blocks)
        spans = [
            {
                "bbox": [0.05, 0.05 + j * (0.9 / n), 0.95, 0.05 + (j + 0.8) * (0.9 / n)],
                "text": b,
                "kind": "text",
            }
            for j, b in enumerate(blocks)
        ]
        rows["media_id"].append(f"ppm-{int(d):08d}")
        rows["media_type"].append("image")
        rows["payload"].append(encode_ppm(rasterize_page(spans, w, h)))
        rows["width"].append(w)
        rows["height"].append(h)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


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


SEGMENT_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("seg_idx", pa.int64()),
        ("start_frame", pa.int64()),
        ("n_frames", pa.int64()),
        ("energy_sum", pa.int64()),
    ]
)


def audio_segments_batch(
    batch: pa.Table, frame_samples: int = 256, energy_threshold: int = 4096
) -> pa.Table:
    """VAD-style energy segmentation over opaque 8-bit-PCM payloads: the
    ASR-data prep step that turns raw tracks into speech utterances.

    Per track: frames of ``frame_samples`` bytes (tail truncated); frame
    energy = sum((s - 128)^2) in EXACT int64; a segment is a maximal run
    of frames with energy > threshold. One output row per segment with
    its exact total energy. Batch-local (track rows are atomic) and
    per-track deterministic => batching-independent; the numpy work is
    vectorized within each track (frame reshape + square-sum + island
    scan), with only the track loop in Python — same shape as the other
    actor-pool media stages."""
    out = {k: [] for k in ("media_id", "seg_idx", "start_frame", "n_frames", "energy_sum")}
    for mid, payload in zip(
        batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
    ):
        buf = np.frombuffer(payload or b"", dtype=np.uint8)
        n_frames = len(buf) // frame_samples
        if n_frames == 0:
            continue
        x = buf[: n_frames * frame_samples].astype(np.int64) - 128
        energy = (x * x).reshape(n_frames, frame_samples).sum(axis=1)
        speech = energy > energy_threshold
        if not speech.any():
            continue
        brk = np.flatnonzero(np.diff(speech.astype(np.int8)) != 0) + 1
        bounds = np.concatenate(([0], brk, [n_frames]))
        seg_idx = 0
        for s, e in zip(bounds[:-1], bounds[1:]):
            if speech[s]:
                out["media_id"].append(mid)
                out["seg_idx"].append(seg_idx)
                out["start_frame"].append(int(s))
                out["n_frames"].append(int(e - s))
                out["energy_sum"].append(int(energy[s:e].sum()))
                seg_idx += 1
    return pa.Table.from_pydict(out, schema=SEGMENT_SCHEMA)


def audio_segments(
    media: "ray.data.Dataset",
    frame_samples: int = 256,
    energy_threshold: int = 4096,
) -> "ray.data.Dataset":
    """Distributed VAD-style segmentation: batch-local, zero exchanges
    (wide binary rows -> small batches, as for the other media stages)."""
    import functools

    return media.map_batches(
        functools.partial(
            audio_segments_batch,
            frame_samples=frame_samples,
            energy_threshold=energy_threshold,
        ),
        batch_format="pyarrow",
        batch_size=64,
    )


def synth_pcm_table(documents_parquet: str, limit: int = 32) -> pa.Table:
    """Deterministic 8-bit-PCM audio fixture with PLANTED speech/silence
    structure: per document, 6 alternating regions (speech first) whose
    frame lengths derive from crc32 of the doc id; speech samples are
    +-40-amplitude pseudo-noise (LCG over the sample index), silence
    stays within +-1 of the midpoint — so frame energies separate by
    ~3 orders of magnitude and the expected segments are exactly the
    3 speech regions."""
    import zlib

    import pyarrow.parquet as pq

    t = pq.read_table(documents_parquet, columns=["doc_id"]).slice(0, limit)
    frame = 256
    rows = {"media_id": [], "media_type": [], "payload": [], "width": [], "height": []}
    for d in t["doc_id"].to_pylist():
        parts = []
        for k in range(6):
            n = (zlib.crc32(f"{d}:{k}".encode()) % 4 + 2) * frame  # 2-5 frames
            i = np.arange(n, dtype=np.int64)
            if k % 2 == 0:  # speech: +-40 pseudo-noise
                v = 128 + ((i * 2654435761 + int(d) * 97 + k) >> 7) % 81 - 40
            else:  # silence: +-1 around the midpoint
                v = 128 + (i % 3) - 1
            parts.append(v.astype(np.uint8))
        rows["media_id"].append(f"pcm-{int(d):08d}")
        rows["media_type"].append("audio")
        rows["payload"].append(np.concatenate(parts).tobytes())
        rows["width"].append(0)
        rows["height"].append(0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
