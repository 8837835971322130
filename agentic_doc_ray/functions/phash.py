"""Perceptual-hash image deduplication (dHash + banded Hamming LSH).

The image-side analogue of MinHash text dedup — the standard near-dup
filter for multimodal training corpora (LAION-style pipelines dedup on
perceptual hashes before CLIP scoring). Three stages, all streaming:

1. **dHash** — decode (actor pool, codec warm), area-downsample the
   grayscale image to a 9x8 grid of block sums (integral image; exact
   int64 arithmetic), compare horizontally adjacent block MEANS by
   integer cross-multiplication (``sum_i * n_j > sum_j * n_i`` — no
   float division, so the 64-bit hash is exactly reproducible anywhere).
   Gradient-based, so a global brightness shift leaves the hash
   unchanged.
2. **Band exchange** — the 64-bit hash splits into four 16-bit bands; a
   pair with Hamming distance <= 3 differs in at most 3 bit positions,
   so BY PIGEONHOLE it collides on at least one full band: recall of the
   banded LSH is EXACTLY 1.0 for ``max_hamming <= 3`` (the default),
   which is what lets the driver gate this against a brute-force
   all-pairs oracle rather than a replica. The shuffle moves only
   (band, key, media_id, dhash) rows — 4 small rows per image, never
   payloads.
3. **Verify + merge** — exact popcount(xor) within each bucket, then a
   (media_a, media_b) groupby merges duplicate candidates from multiple
   bands. Oversized buckets (>_BUCKET_CAP) emit star pairs against the
   min-id representative instead of all-pairs, so a corpus of a million
   identical images stays linear (same policy as dedup.py).

Reference analogue: none (the reference extracts; it does not dedup
media) — public dHash design (Krawetz 2013) + the repo's own banded-LSH
conventions (functions/dedup.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

GRID_W, GRID_H = 9, 8  # dHash grid: 8 horizontal comparisons per row
N_BANDS = 4
BAND_BITS = 64 // N_BANDS
_BUCKET_CAP = 5000

HASH_SCHEMA = pa.schema([("media_id", pa.string()), ("dhash", pa.int64())])
PAIR_SCHEMA = pa.schema(
    [("media_a", pa.string()), ("media_b", pa.string()), ("hamming", pa.int64())]
)


def dhash64(img: np.ndarray) -> int:
    """RGB uint8 array -> 64-bit dHash (returned as a Python int in
    [0, 2^64)). Exact integer arithmetic end to end."""
    h, w = img.shape[:2]
    gray = img.astype(np.int64).sum(axis=2)  # 3x the mean — monotone
    # integral image: S[i, j] = sum of gray[:i, :j]
    S = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(gray, axis=0, out=S[1:, 1:])
    np.cumsum(S[1:, 1:], axis=1, out=S[1:, 1:])
    rb = (np.arange(GRID_H + 1) * h) // GRID_H
    cb = (np.arange(GRID_W + 1) * w) // GRID_W
    # block sums and pixel counts for the GRID_H x GRID_W grid
    blk = (
        S[np.ix_(rb[1:], cb[1:])]
        - S[np.ix_(rb[:-1], cb[1:])]
        - S[np.ix_(rb[1:], cb[:-1])]
        + S[np.ix_(rb[:-1], cb[:-1])]
    )
    cnt = np.diff(rb)[:, None] * np.diff(cb)[None, :]
    # bit[r, c] = mean(r, c+1) > mean(r, c), exact via cross-multiply
    left_s, right_s = blk[:, :-1], blk[:, 1:]
    left_n, right_n = cnt[:, :-1], cnt[:, 1:]
    bits = (right_s * left_n) > (left_s * right_n)
    out = 0
    for b in bits.flatten():
        out = (out << 1) | int(b)
    return out


def _fake_dhash(payload: bytes) -> int:
    """Deterministic stand-in when the payload is not decodable media."""
    d = hashlib.sha256(payload or b"").digest()
    return int.from_bytes(d[:8], "big")


class DHashActor:
    """media rows -> (media_id, dhash). decoder: "ppm" = REAL decode of
    the engine's native PPM payloads; "fake" = digest stand-in; "real" =
    the PIL seam (unavailable in this container)."""

    def __init__(self, decoder: str = "ppm"):
        if decoder not in ("ppm", "fake", "real"):
            raise ValueError("decoder must be 'ppm', 'fake' or 'real'")
        self.decoder = decoder

    def _one(self, payload: bytes) -> int:
        if self.decoder == "ppm":
            from agentic_doc_ray.functions.grounding import read_img_rgb

            return dhash64(read_img_rgb(payload))
        if self.decoder == "fake":
            return _fake_dhash(payload)
        raise NotImplementedError(
            "decoder='real' needs PIL, absent from this container"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [self._one(p) for p in batch.column("payload").to_pylist()]
        return pa.Table.from_arrays(
            [
                batch.column("media_id"),
                # two's-complement view keeps the full 64 bits in int64
                pa.array(np.array(hashes, dtype=np.uint64).view(np.int64)),
            ],
            schema=HASH_SCHEMA,
        )


def image_dhashes(
    media: "ray.data.Dataset", decoder: str = "ppm", concurrency=(1, 8)
) -> "ray.data.Dataset":
    """(media_id, payload, ...) -> (media_id, dhash). Small batches: rows
    are payload-wide (docstring at module top of multimodal.py)."""
    return media.map_batches(
        DHashActor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )


_BAND_SCHEMA = pa.schema(
    [("bkey", pa.int64()), ("media_id", pa.string()), ("dhash", pa.int64())]
)


def _band_rows(batch: pa.Table) -> pa.Table:
    """One row per (image, band); the exchange key folds (band_id,
    band_value) into a single int64 — bkey = band_id·2^16 + value — so
    the single-key sentinel guard applies."""
    if batch.num_rows == 0:
        return _BAND_SCHEMA.empty_table()
    h = batch.column("dhash").to_numpy(zero_copy_only=False).view(np.uint64)
    n = len(h)
    keys = np.empty(N_BANDS * n, dtype=np.int64)
    mask = np.uint64((1 << BAND_BITS) - 1)
    for b in range(N_BANDS):
        keys[b * n : (b + 1) * n] = (
            ((h >> np.uint64(b * BAND_BITS)) & mask).astype(np.int64)
            + (b << BAND_BITS)
        )
    ids = pa.chunked_array(
        [c for _ in range(N_BANDS) for c in batch.column("media_id").chunks]
    )
    dh = pa.chunked_array(
        [c for _ in range(N_BANDS) for c in batch.column("dhash").chunks]
    )
    return pa.table(
        {"bkey": pa.array(keys), "media_id": ids, "dhash": dh},
        schema=_BAND_SCHEMA,
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    v = x.copy()
    c = np.zeros(len(x), dtype=np.int64)
    while v.any():
        c += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)
    return c


def _bucket_pairs(group: pa.Table, max_hamming: int) -> pa.Table:
    group = group.filter(pc.not_equal(group.column("media_id"), ""))  # sentinels
    ids = group.column("media_id").to_pylist()
    out = {"media_a": [], "media_b": [], "hamming": []}
    if len(ids) >= 2:
        h = group.column("dhash").to_numpy(zero_copy_only=False).view(np.uint64)
        if len(ids) > _BUCKET_CAP:
            rep = ids.index(min(ids))  # min-id representative: star pairs, linear
            d = _popcount64(h ^ h[rep])
            for j in np.flatnonzero(d <= max_hamming):
                if j == rep:
                    continue
                a, b = sorted((ids[rep], ids[j]))
                out["media_a"].append(a)
                out["media_b"].append(b)
                out["hamming"].append(int(d[j]))
        else:
            ii, jj = np.triu_indices(len(ids), k=1)
            d = _popcount64(h[ii] ^ h[jj])
            for i, j, dist in zip(ii[d <= max_hamming], jj[d <= max_hamming], d[d <= max_hamming]):
                a, b = sorted((ids[i], ids[j]))
                out["media_a"].append(a)
                out["media_b"].append(b)
                out["hamming"].append(int(dist))
    return pa.Table.from_pydict(out, schema=PAIR_SCHEMA)


def image_dup_pairs(
    media: "ray.data.Dataset", max_hamming: int = 3, decoder: str = "ppm"
) -> "ray.data.Dataset":
    """Near-duplicate image pairs: (media_a, media_b, hamming) with
    Hamming(dhash) <= max_hamming, media_a < media_b. EXACT (recall 1.0)
    for max_hamming <= 3 — see module docstring."""
    from ray.data.aggregate import Min

    from agentic_doc_ray.context import shuffle_partitions as _cap
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"banded LSH is exact only for max_hamming <= {N_BANDS - 1}"
        )
    np_ = _cap()  # sentinel coverage adapts to the resolved width (_exchange.py)
    hashed = image_dhashes(media, decoder=decoder)
    # empty-first-block guard (_exchange.py); media_id="" rows are dropped
    # inside _bucket_pairs before pairing
    pairs = (
        hashed.map_batches(_band_rows, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                _BAND_SCHEMA, "bkey", fill={"media_id": "", "dhash": 0}
            )
        )
        .groupby("bkey", num_partitions=np_)
        .map_groups(
            lambda g: _bucket_pairs(g, max_hamming), batch_format="pyarrow"
        )
    )
    return pairs.groupby(
        ["media_a", "media_b"], num_partitions=max(2, np_ // 4)
    ).aggregate(Min("hamming", alias_name="hamming"))


def image_dup_pairs_oracle(media_tbl: pa.Table, max_hamming: int = 3) -> pa.Table:
    """Brute-force all-pairs oracle — an INDEPENDENT implementation (no
    banding, no bucketing): every pair's exact Hamming distance over the
    same dHashes. Exact equality with the pipeline is the LSH
    completeness guarantee, not a shared code path."""
    hashed = DHashActor(decoder="ppm")(media_tbl)
    ids = hashed.column("media_id").to_pylist()
    h = hashed.column("dhash").to_numpy(zero_copy_only=False).view(np.uint64)
    out = {"media_a": [], "media_b": [], "hamming": []}
    for i in range(len(ids)):
        d = _popcount64(h[i + 1 :] ^ h[i])
        for off in np.flatnonzero(d <= max_hamming):
            a, b = sorted((ids[i], ids[i + 1 + off]))
            out["media_a"].append(a)
            out["media_b"].append(b)
            out["hamming"].append(int(d[off]))
    return pa.Table.from_pydict(out, schema=PAIR_SCHEMA)


_CELL_PX = 12  # pattern-image cell size; the planted-dup recolor must
# stay aligned to exactly one cell for the Hamming <= 2 envelope


def _pattern_img(text: str, cell_px: int = _CELL_PX) -> np.ndarray:
    """Deterministic GRID_H x GRID_W cell-pattern image derived from the
    document's tokens (crc32 per cell) — horizontally structured, so
    distinct documents get near-uniformly-random dHashes (the rasterized
    page fixture paints full-width bands, which have NO horizontal
    gradient and hash identically)."""
    import zlib

    toks = (text or "x").split() or ["x"]
    cells = np.empty((GRID_H, GRID_W, 3), dtype=np.uint8)
    for r in range(GRID_H):
        for c in range(GRID_W):
            t = toks[(r * GRID_W + c) % len(toks)]
            v = zlib.crc32(f"{t}:{r}:{c}".encode())
            cells[r, c] = [(v >> s) & 0xFF for s in (0, 8, 16)]
    return np.repeat(np.repeat(cells, cell_px, axis=0), cell_px, axis=1)


def synth_ppm_dup_media_table(
    documents_parquet: str, limit: int = 48, dup_every: int = 4
) -> pa.Table:
    """REAL-PPM media fixture with PLANTED near-duplicates: per document
    a token-derived cell-pattern image; every ``dup_every``-th image
    gains (a) an exact copy and (b) a one-cell-recolored copy (at most
    the 2 comparisons adjacent to that cell flip, so Hamming(dhash) <= 2
    — inside the pipeline's exact max_hamming=3 envelope).
    Deterministic."""
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions.grounding import encode_ppm
    from agentic_doc_ray.functions.multimodal import MEDIA_SCHEMA

    t = pq.read_table(documents_parquet, columns=["doc_id", "text"]).slice(
        0, limit
    )
    rows = []
    for i, (d, txt) in enumerate(
        zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    ):
        img = _pattern_img(txt or str(d))
        h, w = img.shape[:2]
        base = {
            "media_id": f"ppm-{int(d):08d}",
            "media_type": "image",
            "payload": encode_ppm(img),
            "width": w,
            "height": h,
        }
        rows.append(base)
        if i % dup_every == 0:
            rows.append({**base, "media_id": base["media_id"] + "-copy"})
            near = img.copy()
            # recolor one interior cell (row 3, col 4) — _CELL_PX keeps
            # the patch aligned to exactly one dHash grid cell
            cp = _CELL_PX
            near[3 * cp : 4 * cp, 4 * cp : 5 * cp] = 255 - near[
                3 * cp : 4 * cp, 4 * cp : 5 * cp
            ]
            rows.append(
                {
                    **base,
                    "media_id": base["media_id"] + "-near",
                    "payload": encode_ppm(near),
                }
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
