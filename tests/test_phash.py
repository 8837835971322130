"""dHash perceptual image dedup vs the brute-force all-pairs oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from agentic_doc_ray.functions.grounding import encode_ppm
from agentic_doc_ray.functions.phash import (
    DHashActor,
    _pattern_img,
    dhash64,
    image_dup_pairs,
    image_dup_pairs_oracle,
    synth_ppm_dup_media_table,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_dhash_properties():
    # cap values at 200 so a +17 shift cannot clip (clipping saturates
    # bright blocks and legitimately changes gradients)
    img = (_pattern_img("alpha beta gamma delta").astype(np.int64) % 200).astype(
        np.uint8
    )
    h = dhash64(img)
    assert 0 <= h < (1 << 64)
    # global brightness shift preserves every gradient comparison
    shifted = (img.astype(np.int64) + 17).astype(np.uint8)
    assert dhash64(shifted) == h
    # a different doc gets a different hash
    assert dhash64(_pattern_img("totally other words here")) != h
    # non-multiple-of-grid sizes still hash (uneven blocks)
    assert 0 <= dhash64(img[:91, :101]) < (1 << 64)


def test_planted_dups_within_hamming_envelope():
    tbl = synth_ppm_dup_media_table(DOCS, limit=16, dup_every=4)
    hashed = DHashActor(decoder="ppm")(tbl)
    by_id = dict(
        zip(
            hashed.column("media_id").to_pylist(),
            np.asarray(hashed.column("dhash")).view(np.uint64),
        )
    )
    for mid, h in by_id.items():
        if mid.endswith("-copy"):
            assert h == by_id[mid[:-5]]
        if mid.endswith("-near"):
            d = int(bin(int(h) ^ int(by_id[mid[:-5]])).count("1"))
            # one recolored cell touches at most 2 comparisons (and may
            # touch none, if the inverted gray stays on the same side)
            assert d <= 2


def test_pairs_match_bruteforce_any_partitioning():
    tbl = synth_ppm_dup_media_table(DOCS, limit=32, dup_every=4)
    want = sorted(
        (r["media_a"], r["media_b"], r["hamming"])
        for r in image_dup_pairs_oracle(tbl).to_pylist()
    )
    assert len(want) >= 3 * (32 // 4)  # every planted triple pairs fully
    for parts in (1, 6):
        got = image_dup_pairs(
            ray.data.from_arrow(tbl).repartition(parts)
        ).to_pandas()
        assert sorted(zip(got.media_a, got.media_b, got.hamming)) == want


def test_image_dedup_keep_canonicalizes_clusters():
    from agentic_doc_ray.functions.graph import near_dedup_keep

    tbl = synth_ppm_dup_media_table(DOCS, limit=16, dup_every=4)
    ids = ray.data.from_arrow(pa.table({"doc_id": tbl.column("media_id")}))
    pairs = image_dup_pairs(ray.data.from_arrow(tbl)).select_columns(
        ["media_a", "media_b"]
    )
    kept = set(
        r["doc_id"]
        for r in near_dedup_keep(
            ids, pairs, a_col="media_a", b_col="media_b"
        ).take_all()
    )
    all_ids = set(tbl.column("media_id").to_pylist())
    # expected: local union-find over the INDEPENDENT brute-force pairs,
    # keep the min member per component, singletons pass through
    parent = {m: m for m in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in image_dup_pairs_oracle(tbl).to_pylist():
        ra, rb = find(r["media_a"]), find(r["media_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for m in all_ids:
        comp_min[find(m)] = min(comp_min.get(find(m), m), m)
    want = {m for m in all_ids if comp_min[find(m)] == m}
    assert kept == want
    # -copy members are never canonical (base id sorts first)
    assert not any(m.endswith("-copy") for m in kept)


def test_fake_decoder_and_empty_stream():
    # fake decoder path: digest hashes, no PPM requirement
    tbl = pa.table(
        {
            "media_id": pa.array(["a", "b", "a2"]),
            "media_type": pa.array(["image"] * 3),
            "payload": pa.array([b"xx", b"yy", b"xx"], pa.binary()),
            "width": pa.array([1, 1, 1], pa.int32()),
            "height": pa.array([1, 1, 1], pa.int32()),
        }
    )
    got = image_dup_pairs(ray.data.from_arrow(tbl), decoder="fake").to_pandas()
    assert sorted(zip(got.media_a, got.media_b, got.hamming)) == [("a", "a2", 0)]
    # an all-unique stream yields zero pairs without crashing the exchange
    img = _pattern_img("solo")
    one = pa.table(
        {
            "media_id": pa.array(["only"]),
            "media_type": pa.array(["image"]),
            "payload": pa.array([encode_ppm(img)], pa.binary()),
            "width": pa.array([img.shape[1]], pa.int32()),
            "height": pa.array([img.shape[0]], pa.int32()),
        }
    )
    assert image_dup_pairs(ray.data.from_arrow(one)).count() == 0
