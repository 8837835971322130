"""Property tests: caption harvesting vs a naive per-doc reference, and
dHash banded pairing vs brute force, on arbitrary generated inputs.
Stage functions run directly — no Ray session per example."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from agentic_doc_ray.functions.captions import caption_pairs_batch
from agentic_doc_ray.functions.phash import (
    GRID_H,
    GRID_W,
    _band_rows,
    _bucket_pairs,
    dhash64,
)

SPAN_T = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("chunk_id", pa.string()),
    ]
)
_PARSED_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_T))]
)
_KINDS = ["text", "title", "table", "figure", "marginalia", "error"]


@st.composite
def parsed_docs(draw):
    n_docs = draw(st.integers(0, 5))
    rows = []
    for d in range(n_docs):
        spans = []
        for i in range(draw(st.integers(0, 8))):
            kind = draw(st.sampled_from(_KINDS))
            spans.append(
                {
                    "kind": kind,
                    "text": draw(st.text(max_size=12)),
                    "media_ref": draw(st.sampled_from(["", f"m://{d}/{i}"])),
                    "offset": i,
                    "chunk_id": f"d{d}-{i}",
                }
            )
        rows.append({"doc_id": f"d{d}", "spans": spans})
    return pa.Table.from_pylist(rows, schema=_PARSED_SCHEMA)


def _naive_captions(rows):
    out = []
    for r in rows:
        spans = r["spans"]
        for i, s in enumerate(spans):
            if not s["media_ref"]:
                continue
            before = next(
                (t["text"] for t in reversed(spans[:i]) if t["kind"] == "text"),
                "",
            )
            after = next(
                (t["text"] for t in spans[i + 1 :] if t["kind"] == "text"), ""
            )
            out.append(
                (r["doc_id"], s["offset"], s["media_ref"], before, after)
            )
    return sorted(out)


@settings(max_examples=60, deadline=None)
@given(parsed_docs())
def test_captions_match_naive_reference(tbl):
    got = sorted(
        (
            r["doc_id"],
            r["offset"],
            r["media_ref"],
            r["caption_before"],
            r["caption_after"],
        )
        for r in caption_pairs_batch(tbl).to_pylist()
    )
    assert got == _naive_captions(tbl.to_pylist())


@settings(max_examples=60, deadline=None)
@given(parsed_docs(), st.integers(1, 3))
def test_captions_batching_invariance(tbl, cuts):
    whole = caption_pairs_batch(tbl).to_pylist()
    pieces = []
    n = tbl.num_rows
    bounds = sorted({0, n, *[(n * k) // (cuts + 1) for k in range(1, cuts + 1)]})
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        pieces.extend(caption_pairs_batch(tbl.slice(lo, hi - lo)).to_pylist())
    key = lambda r: (r["doc_id"], r["offset"])  # noqa: E731
    assert sorted(pieces, key=key) == sorted(whole, key=key)


@st.composite
def images(draw):
    h = draw(st.integers(GRID_H, 40))
    w = draw(st.integers(GRID_W, 40))
    data = draw(
        st.binary(min_size=h * w * 3, max_size=h * w * 3)
    )
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


@settings(max_examples=40, deadline=None)
@given(st.lists(images(), min_size=0, max_size=8), st.integers(0, 3))
def test_banded_pairing_equals_bruteforce(imgs, max_hamming):
    hashes = np.array([dhash64(im) for im in imgs], dtype=np.uint64)
    ids = [f"im{i}" for i in range(len(imgs))]
    # brute force
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = int(bin(int(hashes[i]) ^ int(hashes[j])).count("1"))
            if d <= max_hamming:
                want.add((ids[i], ids[j], d))
    # banded path: band rows -> group per key -> pairs, merged by min
    tbl = pa.table(
        {"media_id": pa.array(ids), "dhash": pa.array(hashes.view(np.int64))}
    )
    band = _band_rows(tbl)
    got = {}
    for key in set(band.column("bkey").to_pylist()):
        import pyarrow.compute as pc

        grp = band.filter(pc.equal(band.column("bkey"), key))
        for r in _bucket_pairs(grp, max_hamming).to_pylist():
            k = (r["media_a"], r["media_b"])
            got[k] = min(got.get(k, 64), r["hamming"])
    assert {(a, b, d) for (a, b), d in got.items()} == want
