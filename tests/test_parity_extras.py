"""Parity extras: grounding crop math, binary sources, field extraction."""

import math

import pyarrow as pa
import pytest
import ray.data

from agentic_doc_ray.config import EngineConfig
from agentic_doc_ray.functions.extract_fields import (
    FieldExtractActor,
    extract_fields,
    resolve_refs,
)
from agentic_doc_ray.functions.grounding import (
    crop_rect,
    grounding_manifest,
)
from agentic_doc_ray.pipelines import extract_corpus
from agentic_doc_ray.sources.files import (
    is_valid_httpurl,
    read_binary_corpus,
    sniff_bytes,
)

CFG = EngineConfig(parse_concurrency=(1, 2))


class TestCropRect:
    """Pins the reference's _crop_image math (utils.py:172-211; clamp edge
    cases mirror tests/unit/test_utils.py:801-859)."""

    def test_basic_floor_ceil(self):
        assert crop_rect((0.1, 0.2, 0.5, 0.8), 100, 200) == (10, 40, 50, 160, False)

    def test_fractional_floor_ceil(self):
        x0, y0, x1, y1, oob = crop_rect((0.111, 0.0, 0.555, 1.0), 100, 50)
        assert (x0, x1) == (math.floor(11.1), math.ceil(55.5))
        assert (y0, y1) == (0, 50)
        assert not oob

    def test_out_of_bounds_clamped_and_flagged(self):
        x0, y0, x1, y1, oob = crop_rect((-0.5, -0.1, 1.5, 1.2), 100, 100)
        assert (x0, y0, x1, y1) == (0, 0, 100, 100)
        assert oob

    def test_inverted_box_flagged(self):
        *_, oob = crop_rect((0.8, 0.8, 0.2, 0.2), 100, 100)
        assert oob


def test_grounding_manifest_paths(sf_smoke_corpus):
    parsed = extract_corpus(ray.data.from_arrow(sf_smoke_corpus.slice(0, 10)), CFG)
    rows = grounding_manifest(parsed, "/tmp/gm").take_all()
    assert rows
    for r in rows:
        # one row per grounding; path carries the grounding index
        # (ref _crop_groundings `_{i}` suffix, utils.py:158-162)
        assert r["image_path"] == (
            f"/tmp/gm/page_{r['page']}/{r['kind']}_{r['chunk_id']}_{r['g_idx']}.png"
        )
        assert r["g_idx"] >= 0
        assert 0 <= r["xmin"] <= r["xmax"] <= 816
        assert 0 <= r["ymin"] <= r["ymax"] <= 1056
        assert not r["out_of_bounds"]


class TestSniff:
    def test_pdf_magic(self):
        assert sniff_bytes(b"%PDF-1.7 junk") == "pdf"

    def test_text(self):
        assert sniff_bytes("hello wörld".encode()) == "text"

    def test_image(self):
        assert sniff_bytes(b"\x89PNG\r\n\x1a\n\xff\xfe") == "image"

    def test_multibyte_char_straddles_probe_boundary(self):
        # Regression (ADVICE r1): a valid UTF-8 file whose multi-byte char
        # crosses the 4096-byte probe edge must not be misread as 'image'.
        for pad in (4095, 4094):  # 2-byte char split at either byte
            data = b"a" * pad + "é".encode() + b" more valid text"
            assert sniff_bytes(data) == "text"
        data = b"a" * 4094 + "€".encode() + b" tail"  # 3-byte char
        assert sniff_bytes(data) == "text"

    def test_invalid_bytes_at_probe_tail_without_truncation(self):
        # genuinely invalid trailing bytes in a short file stay 'image'
        assert sniff_bytes(b"a" * 100 + b"\xff\xfe") == "image"

    def test_url_validation(self):
        assert is_valid_httpurl("https://example.com/x.pdf")
        assert is_valid_httpurl("http://a/b")
        assert not is_valid_httpurl("ftp://a/b")
        assert not is_valid_httpurl("not a url")


def test_read_binary_corpus_end_to_end(tmp_path):
    (tmp_path / "doc.txt").write_text("first paragraph here\n\nsecond paragraph here")
    (tmp_path / "img.png").write_bytes(b"\x89PNG\r\n\x1a\n\xff\xfe\x00\x01")
    (tmp_path / "real.pdf").write_bytes(b"%PDF-1.4 binarystuff")
    corpus = read_binary_corpus(str(tmp_path))
    parsed = {r["doc_id"]: r for r in extract_corpus(corpus, CFG).take_all()}
    assert len(parsed) == 3
    txt = parsed[str(tmp_path / "doc.txt")]
    assert [s["text"] for s in txt["spans"]] == [
        "first paragraph here",
        "second paragraph here",
    ]
    img = parsed[str(tmp_path / "img.png")]
    assert img["doc_type"] == "image"
    assert img["spans"][0]["kind"] == "figure"
    # real pdf: decode stubbed -> error placeholder, job does not fail
    pdf = parsed[str(tmp_path / "real.pdf")]
    assert [e["error_code"] for e in pdf["errors"]] == [-1]
    assert [s["kind"] for s in pdf["spans"]] == ["error"]


SCHEMA = {
    "type": "object",
    "properties": {
        "title": {"$ref": "#/$defs/name"},
        "n_pages": {"type": "integer"},
        "n_figures": {"type": "integer"},
    },
    "required": ["title", "n_pages"],
    "$defs": {"name": {"type": "string"}},
}


def test_resolve_refs_inlines():
    r = resolve_refs(SCHEMA)
    assert r["properties"]["title"] == {"type": "string"}
    assert "$defs" not in r


def test_field_extraction_success_and_failure(sf_smoke_corpus):
    parsed = extract_corpus(ray.data.from_arrow(sf_smoke_corpus.slice(0, 30)), CFG)
    out = {r["doc_id"]: r for r in extract_fields(parsed, SCHEMA).take_all()}
    assert len(out) == 30
    import json

    ok = [r for r in out.values() if r["extraction"] is not None]
    failed = [r for r in out.values() if r["extraction"] is None]
    assert ok, "some docs must satisfy the schema"
    assert failed, "docs without a title must fail the required-title schema"
    for r in ok:
        e = json.loads(r["extraction"])
        assert isinstance(e["title"], str) and isinstance(e["n_pages"], int)
        m = json.loads(r["extraction_metadata"])
        assert m["title"]["chunk_references"], "title must cite its chunk"
        assert m["title"]["confidence"] == 1.0
        assert r["extraction_error"] == ""
    for r in failed:
        assert r["extraction_error"]


def test_metadata_model_shape(sf_smoke_corpus):
    # every leaf is {value, chunk_references, confidence} (common.py:66-69)
    import json

    parsed = extract_corpus(ray.data.from_arrow(sf_smoke_corpus.slice(0, 5)), CFG)
    rows = extract_fields(parsed, SCHEMA).take_all()
    for r in rows:
        meta = json.loads(r["extraction_metadata"])
        assert set(meta) == {"title", "n_pages", "n_figures"}
        for leaf in meta.values():
            assert set(leaf) == {"value", "chunk_references", "confidence"}


def test_viz_commands(sf_smoke_corpus):
    from agentic_doc_ray.functions.viz import COLOR_MAP, viz_commands

    parsed = extract_corpus(ray.data.from_arrow(sf_smoke_corpus.slice(0, 8)), CFG)
    rows = viz_commands(parsed).take_all()
    assert rows
    for r in rows:
        idx, kind = r["label"].split(" ", 1)
        assert idx.isdigit() and kind in COLOR_MAP
        assert (r["color_b"], r["color_g"], r["color_r"]) == COLOR_MAP[kind]
        assert r["xmin"] <= r["xmax"] and r["ymin"] <= r["ymax"]


def test_extraction_page_cap(sf_smoke_corpus):
    # extraction_split_size analogue (parse.py:483-498): oversized docs get
    # an extraction_error row instead of a raised exception
    parsed = extract_corpus(ray.data.from_arrow(sf_smoke_corpus.slice(0, 30)), CFG)
    rows = extract_fields(parsed, SCHEMA, max_pages=3).take_all()
    capped = [r for r in rows if "exceeds the maximum" in r["extraction_error"]]
    assert capped, "smoke corpus has multi-page docs beyond the cap"
    for r in capped:
        assert r["extraction"] is None


def test_config_split_size_and_marginalia_e2e(sf_smoke_corpus):
    # non-default split + marginalia off, end-to-end vs oracle
    from agentic_doc_ray.oracle import parse_corpus_oracle

    cfg = EngineConfig(split_size=3, include_marginalia=False, parse_concurrency=(1, 2))
    small = sf_smoke_corpus.slice(0, 25)
    got = sorted(
        extract_corpus(ray.data.from_arrow(small), cfg).take_all(),
        key=lambda r: r["doc_id"],
    )
    want = parse_corpus_oracle(small, cfg).to_pylist()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    saw_multi_part = False
    for g, w in zip(got, want):
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
        ] == [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in w["spans"]]
        assert g["markdown"] == w["markdown"]
        assert all(s["kind"] != "marginalia" for s in g["spans"])
        if g["end_page_idx"] >= 3:
            saw_multi_part = True
    assert saw_multi_part


def test_read_url_corpus_mock_fetch():
    from agentic_doc_ray.sources.files import read_url_corpus

    # closure (cloudpickle-by-value) — a test-module function would not be
    # importable inside Ray workers
    store = {
        "https://example.com/a.txt": b"plain text document body\n\nsecond block here",
        "https://example.com/b.pdf": b"%PDF-1.7 payload",
        "https://example.com/c.png": b"\x89PNG\r\n\x1a\n\xff\xfe",
    }

    def _mock_fetcher(url):
        if url not in store:
            raise IOError("404 not found")
        return store[url]

    urls = [
        "https://example.com/a.txt",
        "https://example.com/b.pdf",
        "https://example.com/c.png",
        "https://example.com/missing.txt",  # fetch fails -> dropped
        "ftp://bad.scheme/x",  # invalid -> dropped
    ]
    rows = {r["doc_id"]: r for r in read_url_corpus(urls, _mock_fetcher).take_all()}
    # failure semantics (ref parse.py:182-190): failed/invalid are dropped
    assert set(rows) == {
        "https://example.com/a.txt",
        "https://example.com/b.pdf",
        "https://example.com/c.png",
    }
    a = rows["https://example.com/a.txt"]["spans"]
    assert [s["kind"] for s in a] == ["text", "text"]
    assert a[0]["text"] == "plain text document body"
    assert rows["https://example.com/b.pdf"]["spans"][0]["kind"] == "pdf_page"
    assert rows["https://example.com/c.png"]["spans"][0]["kind"] == "image"


def test_read_binary_corpus_scheme_stand_in(tmp_path):
    # the S3 path goes through the same read_binary_files call; exercise it
    # through an explicit filesystem scheme URI as the stand-in
    from agentic_doc_ray.sources.files import read_binary_corpus

    (tmp_path / "x.txt").write_bytes(b"hello scheme world block")
    (tmp_path / "y.pdf").write_bytes(b"%PDF-1.4 data")
    rows = read_binary_corpus(f"local://{tmp_path}").take_all()
    kinds = sorted(
        (r["doc_id"].rsplit("/", 1)[-1], r["spans"][0]["kind"]) for r in rows
    )
    assert kinds == [("x.txt", "text"), ("y.pdf", "pdf_page")]


def test_settings_from_env():
    from agentic_doc_ray.config import settings_from_env

    cfg = settings_from_env(
        {
            "SPLIT_SIZE": "5",
            "MAX_RETRIES": "2",
            "BATCH_SIZE": "64",
            "MAX_WORKERS": "8",
            "INCLUDE_MARGINALIA": "false",
            "UNRELATED": "x",
        }
    )
    assert cfg.split_size == 5
    assert cfg.max_retries == 2
    assert cfg.parse_batch_size == 64
    assert cfg.parse_concurrency == (1, 8)
    assert not cfg.include_marginalia
    # defaults untouched
    assert cfg.include_metadata_in_markdown
    # validation still applies (split_size bound, ref config.py:123-128)
    with pytest.raises(ValueError):
        settings_from_env({"SPLIT_SIZE": "500"})


def test_visualization_config_custom(sf_smoke_corpus):
    from agentic_doc_ray.functions.viz import VisualizationConfig, viz_commands

    parsed = extract_corpus(ray.data.from_arrow(sf_smoke_corpus.slice(0, 5)), CFG)
    vc = VisualizationConfig(
        thickness=3, font_scale=1.25, color_map={"text": (1, 2, 3)}
    )
    rows = viz_commands(parsed, viz_config=vc).take_all()
    assert rows
    for r in rows:
        assert r["thickness"] == 3 and r["font_scale"] == 1.25
        if r["label"].split(" ", 1)[1] == "text":
            assert (r["color_b"], r["color_g"], r["color_r"]) == (1, 2, 3)
    with pytest.raises(ValueError):
        VisualizationConfig(text_bg_opacity=1.5)


def test_grounding_save_and_read_roundtrip(tmp_path, sf_smoke_corpus):
    """rasterize -> crop -> PPM encode -> save -> read back: the written
    crop must equal the page slice, and dims must match the crop rect."""
    import numpy as np

    from agentic_doc_ray.functions.grounding import (
        crop_rect,
        encode_ppm,
        rasterize_page,
        read_img_rgb,
        save_groundings,
    )

    # pure roundtrip first
    img = rasterize_page(
        [{"bbox": [0.1, 0.1, 0.5, 0.4], "text": "hello", "kind": "text"}], 64, 48
    )
    assert read_img_rgb(encode_ppm(img)).tolist() == img.tolist()

    parsed = extract_corpus(ray.data.from_arrow(sf_smoke_corpus.slice(0, 8)), CFG)
    rows = save_groundings(parsed, str(tmp_path)).take_all()
    assert rows
    doc_rows = {r["doc_id"]: r for r in parsed.take_all()}
    import collections

    # one mark per GROUNDING per page (multi-page chunks paint and crop on
    # every page they ground on) — mirrors save_groundings_batch
    by_doc_page = collections.defaultdict(list)
    for d, r in doc_rows.items():
        for s in r["spans"]:
            for gi, gr in enumerate(s["groundings"]):
                by_doc_page[(d, gr["page"])].append((s, gi, gr["bbox"]))
    checked = 0
    for m in rows[:40]:
        marks = by_doc_page[(m["doc_id"], m["page"])]
        page_img = rasterize_page(
            [{"text": s["text"], "bbox": bb} for s, _, bb in marks]
        )
        gi_of = int(m["image_path"].rsplit("_", 1)[1].split(".")[0])
        _, _, bb = next(
            x for x in marks if x[0]["chunk_id"] == m["chunk_id"] and x[1] == gi_of
        )
        x0, y0, x1, y1, _ = crop_rect(tuple(bb), 816, 1056)
        with open(m["image_path"], "rb") as fh:
            got = read_img_rgb(fh.read())
        assert got.shape == (m["crop_h"], m["crop_w"], 3)
        assert np.array_equal(got, page_img[y0:y1, x0:x1])
        checked += 1
    assert checked


def test_render_overlays_pixels(sf_smoke_corpus):
    """Rendered PPM overlays (utils.py:294-414 semantics): bbox outline
    rows carry the chunk-type color (BGR map -> RGB pixels), the label
    strip is blended above the box, and untouched page stays background.
    Pixel assertions use a controlled single-span page (marks can overlap
    on real pages); the real corpus gets a decode + mark-count pass."""
    import numpy as np

    from agentic_doc_ray.functions.grounding import crop_rect, read_img_rgb
    from agentic_doc_ray.functions.viz import COLOR_MAP, render_overlays
    from agentic_doc_ray.schema import PARSED_DOC_SCHEMA

    # --- controlled page: one well-interior span, nothing overlaps -------
    span = {
        "kind": "table",
        "text": "cells",
        "media_ref": "",
        "offset": 0,
        "chunk_id": "c0",
        "page": 0,
        "bbox": [0.25, 0.25, 0.75, 0.75],
    }
    one = pa.Table.from_pylist(
        [
            {
                "doc_id": "d0",
                "doc_type": "pdf",
                "markdown": "cells",
                "spans": [span],
                "errors": [],
                "start_page_idx": 0,
                "end_page_idx": 0,
            }
        ],
        schema=PARSED_DOC_SCHEMA,
    )
    [r] = render_overlays(ray.data.from_arrow(one)).take_all()
    img = read_img_rgb(r["image_ppm"])
    assert img.shape == (r["height"], r["width"], 3) and r["n_marks"] == 1
    x0, y0, x1, y1, _ = crop_rect(tuple(span["bbox"]), r["width"], r["height"])
    bgr = COLOR_MAP["table"]
    rgb = np.array([bgr[2], bgr[1], bgr[0]], np.uint8)
    # all four outline edges carry the chunk-type color end to end
    assert (img[y0, x0:x1] == rgb).all()
    assert (img[y1 - 1, x0:x1] == rgb).all()
    assert (img[y0:y1, x0] == rgb).all()
    assert (img[y0:y1, x1 - 1] == rgb).all()
    # label strip above the box is blended (not pure white background)
    assert not (img[y0 - 2, x0 + 2] == 255).all()
    # far corner untouched: background white
    assert (img[5, r["width"] - 5] == 255).all()

    # --- real corpus: every page decodes, mark counts match spans --------
    parsed = extract_corpus(ray.data.from_arrow(sf_smoke_corpus.slice(0, 8)), CFG)
    doc_rows = {dr["doc_id"]: dr for dr in parsed.take_all()}
    rows = render_overlays(parsed).take_all()
    assert rows
    for r in rows:
        img = read_img_rgb(r["image_ppm"])
        assert img.shape == (r["height"], r["width"], 3)
        n = sum(
            1
            for s in doc_rows[r["doc_id"]]["spans"]
            for g in s["groundings"]
            if g["page"] == r["page"]
        )
        assert r["n_marks"] == n
