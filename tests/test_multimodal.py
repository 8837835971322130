"""Multimodal plumbing: real schemas/actors, stubbed codec."""

import pytest
import ray.data

from agentic_doc_ray.functions import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media_ds():
    return ray.data.from_arrow(M.synth_media_table(f"{SF}/documents.parquet", limit=30))


def test_media_features_shape_and_determinism(media_ds):
    a = sorted(M.media_features(media_ds).take_all(), key=lambda r: r["media_id"])
    b = sorted(M.media_features(media_ds).take_all(), key=lambda r: r["media_id"])
    assert len(a) == 30
    assert all(len(r["features"]) == M.FEATURE_DIM for r in a)
    assert [list(r["features"]) for r in a] == [list(r["features"]) for r in b]


def test_frame_samples_counts(media_ds):
    rows = M.frame_samples(media_ds).take_all()
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for frames in per_media.values():
        assert sorted(frames) == list(range(len(frames)))  # dense frame idx


def test_real_decoder_is_stubbed(media_ds):
    actor = M.MediaFeatureActor(decoder="real")
    import pyarrow as pa

    batch = M.synth_media_table(f"{SF}/documents.parquet", limit=2)
    with pytest.raises(NotImplementedError):
        actor(batch)


def test_resize_dimension_math():
    from agentic_doc_ray.functions.multimodal import ResizeActor

    a = ResizeActor(max_w=100, max_h=50)
    assert a.target_dims(80, 40) == (80, 40)       # already fits
    assert a.target_dims(200, 50) == (100, 25)     # width-bound
    assert a.target_dims(100, 200) == (25, 50)     # height-bound
    assert a.target_dims(10000, 10) == (100, 1)    # 1px floor... scale=0.01 -> h=0.1 -> 1
    # aspect preserved within floor rounding
    tw, th = a.target_dims(317, 211)
    assert abs(tw / th - 317 / 211) < 0.05


def test_resize_passthrough_non_images():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.multimodal import MEDIA_SCHEMA, resize_media

    t = pa.Table.from_pydict(
        {
            "media_id": ["i1", "a1"],
            "media_type": ["image", "audio"],
            "payload": [b"imagebytes" * 100, b"audiobytes" * 100],
            "width": [1024, 0],
            "height": [768, 0],
        },
        schema=MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in resize_media(ray.data.from_arrow(t), 512, 512).take_all()}
    img = rows["i1"]
    assert (img["width"], img["height"]) == (512, 384)
    assert (img["orig_width"], img["orig_height"]) == (1024, 768)
    assert img["payload"] != b"imagebytes" * 100  # resampled (fake digest)
    aud = rows["a1"]
    assert aud["payload"] == b"audiobytes" * 100  # untouched


def test_audio_chunks_cover_payload():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.multimodal import MEDIA_SCHEMA, audio_chunks

    payload = b"x" * 5000
    t = pa.Table.from_pydict(
        {
            "media_id": ["a1", "v1"],
            "media_type": ["audio", "video"],
            "payload": [payload, b"video"],
            "width": [0, 64],
            "height": [0, 64],
        },
        schema=MEDIA_SCHEMA,
    )
    rows = audio_chunks(ray.data.from_arrow(t), chunk_bytes=2048).take_all()
    assert all(r["media_id"] == "a1" for r in rows)  # video rows skipped
    rows.sort(key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert rows[0]["byte_lo"] == 0 and rows[-1]["byte_hi"] == 5000
    for a, b in zip(rows, rows[1:]):
        assert a["byte_hi"] == b["byte_lo"]  # contiguous coverage


def test_ppm_decoder_real_features_and_resize():
    import numpy as np
    import ray.data

    from agentic_doc_ray.functions.grounding import encode_ppm, read_img_rgb
    from agentic_doc_ray.functions.multimodal import (
        MEDIA_SCHEMA,
        media_features,
        resize_media,
    )
    import pyarrow as pa

    # a 40x20 image: left half black, right half white
    img = np.zeros((20, 40, 3), dtype=np.uint8)
    img[:, 20:] = 255
    t = pa.Table.from_pydict(
        {
            "media_id": ["m1"],
            "media_type": ["image"],
            "payload": [encode_ppm(img)],
            "width": [40],
            "height": [20],
        },
        schema=MEDIA_SCHEMA,
    )
    feats = media_features(ray.data.from_arrow(t), decoder="ppm").take_all()[0][
        "features"
    ]
    # real stats: mean 0.5 per channel, min 0, max 1
    assert all(abs(f - 0.5) < 1e-6 for f in feats[:3])
    assert all(f == 0.0 for f in feats[6:9])  # min
    assert all(f == 1.0 for f in feats[9:12])  # max

    resized = resize_media(ray.data.from_arrow(t), 20, 20, decoder="ppm").take_all()[0]
    assert (resized["width"], resized["height"]) == (20, 10)
    out = read_img_rgb(resized["payload"])
    assert out.shape == (10, 20, 3)
    # halves preserved under nearest-neighbor
    assert (out[:, :10] == 0).all() and (out[:, 10:] == 255).all()


def test_frame_samples_digest_parity():
    """Engine actor output == independent slice+sha256 loop (the same rule
    the __ray_entry__ oracle builder implements)."""
    import hashlib

    import pyarrow as pa

    from agentic_doc_ray.functions.multimodal import FrameSampleActor

    payloads = {
        "m1": b"a" * 3000,   # 2 frames (3000 // 1024)
        "m2": b"xy",          # short -> still 1 frame
        "m3": b"",            # empty -> 1 frame of the empty slice
    }
    table = pa.table(
        {
            "media_id": list(payloads),
            "media_type": ["video"] * 3,
            "payload": list(payloads.values()),
        }
    )
    got = FrameSampleActor()(table).to_pylist()
    want = []
    for mid, p in payloads.items():
        for f in range(max(1, len(p) // 1024)):
            want.append(
                {
                    "media_id": mid,
                    "frame_idx": f,
                    "frame_digest": hashlib.sha256(
                        p[f * 1024 : (f + 1) * 1024]
                    ).hexdigest()[:16],
                }
            )
    assert got == want


def test_video_scene_cuts_planted_and_replica():
    """Scene-cut detector on REAL PPM frames: distributed run ==
    bit-equal replica; planted structure separates cleanly (in-scene
    drift <= 2 bits, scene boundaries >= 11 at threshold 8); every
    video cuts exactly at frame 6 and 12."""
    import pandas as pd
    import ray.data

    from agentic_doc_ray.functions.video import (
        _frame_hashes_batch,
        scene_cuts_from_hashes,
        synth_ppm_video_table,
        video_scene_cuts,
    )

    frames = synth_ppm_video_table(
        "/root/testdata/sf0.001/documents.parquet", limit=12
    )
    got = (
        video_scene_cuts(ray.data.from_arrow(frames).repartition(5), threshold=8)
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    rep = (
        scene_cuts_from_hashes(_frame_hashes_batch(frames), 8)
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, rep)
    cuts = got[got.is_cut == 1]
    assert set(cuts.frame_idx) == {6, 12} and len(cuts) == 24
    noncuts = got[got.is_cut == 0]
    assert (noncuts.frame_idx % 6 != 0).all()
    assert noncuts.hamming.max() <= 2 and cuts.hamming.min() >= 11


def test_audio_segments_planted_and_replica():
    """Energy-VAD segmentation: distributed == bit-equal replica; the
    planted PCM fixture (3 speech bursts per track, ~3 orders of
    magnitude energy separation) segments to exactly 3 utterances; tail
    bytes short of a frame are truncated; silent tracks emit nothing."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_segments,
        audio_segments_batch,
        synth_pcm_table,
    )

    t = synth_pcm_table("/root/testdata/sf0.001/documents.parquet", limit=16)
    got = (
        audio_segments(ray.data.from_arrow(t).repartition(4))
        .to_pandas()
        .sort_values(["media_id", "seg_idx"])
        .reset_index(drop=True)
    )
    rep = (
        audio_segments_batch(t)
        .to_pandas()
        .sort_values(["media_id", "seg_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, rep)
    assert (got.groupby("media_id").seg_idx.count() == 3).all()

    silent = pa.Table.from_pylist(
        [
            {
                "media_id": "quiet", "media_type": "audio",
                "payload": bytes([128] * 1024), "width": 0, "height": 0,
            },
            {
                "media_id": "tiny", "media_type": "audio",
                "payload": bytes([0] * 100), "width": 0, "height": 0,
            },
        ],
        schema=MEDIA_SCHEMA,
    )
    assert audio_segments_batch(silent).num_rows == 0


def test_video_scenes_spans():
    """Scene spans: distributed == replica; per video exactly 3 scenes
    of scene_len frames tiling [0, n_frames); scene_idx resets per
    video."""
    import pandas as pd
    import ray.data

    from agentic_doc_ray.functions.video import (
        _frame_hashes_batch,
        scenes_from_hashes,
        synth_ppm_video_table,
        video_scenes,
    )

    frames = synth_ppm_video_table(
        "/root/testdata/sf0.001/documents.parquet", limit=12
    )
    got = (
        video_scenes(ray.data.from_arrow(frames).repartition(5), threshold=8)
        .to_pandas()
        .sort_values(["video_id", "scene_idx"])
        .reset_index(drop=True)
    )
    rep = (
        scenes_from_hashes(_frame_hashes_batch(frames), 8)
        .to_pandas()
        .sort_values(["video_id", "scene_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, rep)
    per = got.groupby("video_id")
    assert (per.scene_idx.count() == 3).all()
    assert (per.n_frames.sum() == 16).all()
    for _, g in per:
        assert list(g.scene_idx) == [0, 1, 2]
        assert list(g.start_frame) == [0, 6, 12]
