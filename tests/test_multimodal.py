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
