"""Deterministic synthesis of the interleaved corpus (the input_hint table).

The driver provides a ``documents`` parquet table (doc_id:int64, text, lang,
source, n_chars). This module deterministically derives from it the corpus
table of BASELINE.json's ``input_hint``:

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

One fixture family per ``doc_id % 12`` (FIXTURES.md §1 families), plus a
mega-doc skew fixture every ``mega_doc_modulus`` docs. Generation is a pure
function of (seed, doc_id, text) — independent of row order, block
boundaries, or parallelism — so the same corpus is produced by the local
builder and by the Ray map_batches stage.
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.schema import CORPUS_SCHEMA
from agentic_doc_ray.textparse import CORRUPT_MARKER

_FALLBACK_WORDS = ["lorem", "ipsum", "dolor", "sit", "amet"]


def _doc_rng(seed: int, doc_id: int) -> random.Random:
    digest = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


class _Words:
    """Cyclic word supply drawn from the source document's own text."""

    def __init__(self, text: str):
        ws = [w.lower() for w in (text or "").split() if w]
        self.words = ws or list(_FALLBACK_WORDS)
        self.i = 0

    def take(self, n: int) -> list[str]:
        out = []
        for _ in range(n):
            out.append(self.words[self.i % len(self.words)])
            self.i += 1
        return out


def _para(w: _Words, rng: random.Random) -> str:
    return " ".join(w.take(rng.randint(8, 24)))


def _title(w: _Words, rng: random.Random) -> str:
    return "# " + " ".join(t.capitalize() for t in w.take(rng.randint(2, 5)))


def _table(w: _Words, rng: random.Random) -> str:
    ncol = rng.randint(2, 4)
    nrow = rng.randint(2, 4)
    lines = ["| " + " | ".join(w.take(ncol)) + " |" for _ in range(nrow)]
    return "\n".join(lines)


def _figure(doc_id: str, page: int, k: int, w: _Words, rng: random.Random) -> str:
    caption = " ".join(w.take(rng.randint(2, 6)))
    return f"![{caption}](media://{doc_id}/{page}/{k})"


def _page_text(blocks: list[str]) -> str:
    return "\n\n".join(blocks)


def _pdf_pages(
    doc_id: str,
    n_pages: int,
    w: _Words,
    rng: random.Random,
    *,
    marginalia: bool = True,
    tables: bool = False,
    figures: bool = False,
    corrupt_pages: set[int] | None = None,
) -> list[dict]:
    spans = []
    for p in range(n_pages):
        if corrupt_pages and p in corrupt_pages:
            text = CORRUPT_MARKER + "".join(w.take(3))
        else:
            blocks: list[str] = []
            if p == 0:
                blocks.append(_title(w, rng))
            for _ in range(rng.randint(1, 3)):
                blocks.append(_para(w, rng))
            if tables and rng.random() < 0.5:
                blocks.append(_table(w, rng))
            if figures and rng.random() < 0.5:
                blocks.append(_figure(doc_id, p, 1, w, rng))
            if marginalia:
                blocks.append(f"Page {p + 1} of {n_pages}")
            text = _page_text(blocks)
        spans.append({"kind": "pdf_page", "text": text, "media_ref": "", "offset": p})
    return spans


def _pdf_pages_continued(
    doc_id: str, n_pages: int, w: _Words, rng: random.Random
) -> list[dict]:
    """Continued-table fixture (multi-page chunk groundings): page 1 ENDS
    with a table (no marginalia on that page) and page 2 STARTS with one,
    so the parser's table-continuation rule merges them into one chunk
    grounded on both pages. When the doc is long enough, pages 3-5 form a
    3-page chain (page 4 is a lone table block: both first and last)."""
    spans = []
    for p in range(n_pages):
        if p == 0:
            blocks = [_title(w, rng), _para(w, rng)]
        elif p == 1:
            blocks = [_para(w, rng), _table(w, rng)]  # ends with a table
        elif p == 2:
            blocks = [_table(w, rng), _para(w, rng), f"Page {p + 1} of {n_pages}"]
        elif n_pages >= 7 and p == 3:
            blocks = [_para(w, rng), _table(w, rng)]  # chain start
        elif n_pages >= 7 and p == 4:
            blocks = [_table(w, rng)]  # lone table: first AND last
        elif n_pages >= 7 and p == 5:
            blocks = [_table(w, rng), _para(w, rng), f"Page {p + 1} of {n_pages}"]
        else:
            blocks = [_para(w, rng), f"Page {p + 1} of {n_pages}"]
        spans.append(
            {
                "kind": "pdf_page",
                "text": _page_text(blocks),
                "media_ref": "",
                "offset": p,
            }
        )
    return spans


def _html_span(doc_id: str, w: _Words, rng: random.Random, offset: int) -> dict:
    paras = []
    for _ in range(rng.randint(2, 4)):
        # ensure each paragraph clears the MIN_BLOCK_CHARS threshold
        p = _para(w, rng)
        while len(p) < 30:
            p += " " + _para(w, rng)
        paras.append(p)
    nav = "<nav>" + "".join(f'<a href="#">{t}</a>' for t in w.take(4)) + "</nav>"
    farm = (
        '<div class="links">'
        + "".join(f'<a href="/x">{t}</a> ' for t in w.take(8))
        + "</div>"
    )
    body = "".join(f"<p>{p}</p>" for p in paras)
    footer = "<footer>(c) " + " ".join(w.take(2)) + "</footer>"
    html = f"<html><head><script>var x=1;</script></head><body>{nav}{farm}{body}{footer}</body></html>"
    return {"kind": "html", "text": html, "media_ref": "", "offset": offset}


def synth_doc(
    doc_id_int: int, text: str, config: EngineConfig = DEFAULT_CONFIG
) -> tuple[str, list[dict]]:
    """Synthesize one document's spans. Pure function of (seed, doc_id, text)."""
    rng = _doc_rng(config.seed, doc_id_int)
    w = _Words(text)
    doc_id = f"doc-{doc_id_int:08d}"
    fam = doc_id_int % 12

    if doc_id_int % config.mega_doc_modulus == config.mega_doc_modulus - 1:
        # skew fixture: one pathological mega document
        spans = _pdf_pages(doc_id, config.mega_doc_spans, w, rng, marginalia=True)
    elif fam in (0, 1, 2):  # tiny_text
        spans = []
        for i in range(rng.randint(1, 3)):
            blocks = []
            if i == 0 and rng.random() < 0.5:
                blocks.append(_title(w, rng))
            blocks += [_para(w, rng) for _ in range(rng.randint(1, 3))]
            spans.append(
                {"kind": "text", "text": _page_text(blocks), "media_ref": "", "offset": i}
            )
    elif fam in (3, 4):  # multi_page pdf
        if doc_id_int % 36 == 3:  # continued-table sub-fixture (multi-page
            # groundings): every 3rd fam-3 doc gets cross-page table chains
            spans = _pdf_pages_continued(doc_id, rng.randint(5, 12), w, rng)
        else:
            spans = _pdf_pages(doc_id, rng.randint(5, 12), w, rng, tables=True)
    elif fam == 5:  # complex_doc: title+text+table+figure+marginalia over 2 pages
        p0 = _page_text(
            [_title(w, rng), _para(w, rng), _table(w, rng), "Page 1 of 2"]
        )
        p1 = _page_text(
            [_para(w, rng), _figure(doc_id, 1, 1, w, rng), "Page 2 of 2"]
        )
        spans = [
            {"kind": "pdf_page", "text": p0, "media_ref": "", "offset": 0},
            {"kind": "pdf_page", "text": p1, "media_ref": "", "offset": 1},
        ]
    elif fam == 6:  # html_doc
        spans = [_html_span(doc_id, w, rng, i) for i in range(rng.randint(1, 3))]
    elif fam == 7:  # image_doc
        caption = "Figure: " + " ".join(w.take(rng.randint(2, 5)))
        spans = [
            {
                "kind": "image",
                "text": caption,
                "media_ref": f"media://{doc_id}/0/img",
                "offset": 0,
            }
        ]
    elif fam == 8:  # error_doc: some undecodable pages
        n = rng.randint(4, 8)
        bad = {rng.randrange(n)}
        if rng.random() < 0.5:
            bad.add(rng.randrange(n))
        spans = _pdf_pages(doc_id, n, w, rng, corrupt_pages=bad)
    elif fam == 9:  # marginalia-heavy
        spans = []
        n = rng.randint(3, 5)
        for p in range(n):
            blocks = [
                "ACME QUARTERLY REPORT",
                _para(w, rng),
                f"Page {p + 1} of {n}",
            ]
            spans.append(
                {
                    "kind": "pdf_page",
                    "text": _page_text(blocks),
                    "media_ref": "",
                    "offset": p,
                }
            )
    elif fam == 10:  # long pdf (split exercised: 25 pages -> 3 parts @ split 10)
        spans = _pdf_pages(doc_id, 25, w, rng)
    else:  # fam == 11: interleaved text + image
        spans = [
            {"kind": "text", "text": _para(w, rng), "media_ref": "", "offset": 0},
            {
                "kind": "image",
                "text": "Figure: " + " ".join(w.take(3)),
                "media_ref": f"media://{doc_id}/1/img",
                "offset": 1,
            },
            {"kind": "text", "text": _para(w, rng), "media_ref": "", "offset": 2},
        ]
    return doc_id, spans


def synth_batch(batch: pa.Table, config: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """map_batches-compatible: documents rows -> corpus rows (pyarrow)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    doc_ids, spans = [], []
    for i, t in zip(ids, texts):
        d, s = synth_doc(int(i), t or "", config)
        doc_ids.append(d)
        spans.append(s)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans}, schema=CORPUS_SCHEMA
    )


def build_corpus_table(
    documents_parquet: str, config: EngineConfig = DEFAULT_CONFIG, limit: int | None = None
) -> pa.Table:
    """Local (non-Ray) corpus builder for tests and oracles."""
    t = pq.read_table(documents_parquet, columns=["doc_id", "text"])
    if limit is not None:
        t = t.slice(0, limit)
    return synth_batch(t, config)


def corpus_path_for(
    sf_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
    n_files: int = 16,
    variant: str = "",
) -> str:
    """Synthesize (once, cached) the corpus for an sf dir under /tmp.

    Written as a DIRECTORY of parquet shard files: a single file serializes
    the read into one task, and the shards double as the partition units for
    the resumable manifest (state/manifest.py). ``variant`` distinguishes
    cache dirs for non-default configs sharing a seed (the skew corpus).
    """
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/agentic_corpus/v2/{tag}-seed{config.seed}{variant}"
    done = os.path.join(out_dir, "_DONE")
    if not os.path.exists(done):
        tmp_dir = out_dir + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)
        table = build_corpus_table(os.path.join(sf_dir, "documents.parquet"), config)
        n = max(1, min(n_files, table.num_rows))
        step = (table.num_rows + n - 1) // n
        for i in range(n):
            part = table.slice(i * step, step)
            if part.num_rows:
                pq.write_table(part, os.path.join(tmp_dir, f"corpus-{i:04d}.parquet"))
        with open(os.path.join(tmp_dir, "_DONE"), "w") as f:
            f.write("ok")
        os.makedirs(out_dir, exist_ok=True)
        import shutil

        shutil.rmtree(out_dir)
        os.replace(tmp_dir, out_dir)  # atomic publish
    return out_dir


def skewed_corpus_path_for(sf_dir: str) -> str:
    """Mega-doc-heavy corpus variant for the skew-path scaling protocol
    (VERDICT r03 #5): 1% of docs are pathological mega documents of 10^4
    spans each (vs the default 0.1% at 200), so the span mass is dominated
    by the docs that take ``extract_corpus_adaptive``'s salted two-phase
    split/merge branch — the part of the engine that actually faces
    multi-node shuffle risk. Same deterministic per-doc generation, cached
    separately from the default corpus."""
    import dataclasses

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, mega_doc_modulus=100, mega_doc_spans=10_000
    )
    return replicated_corpus_path_for(sf_dir, 4, cfg, variant="-skew1pct10k")


def replicated_corpus_path_for(
    sf_dir: str, repl: int, config: EngineConfig = DEFAULT_CONFIG,
    variant: str = "",
) -> str:
    """Corpus replicated ``repl``x with distinct doc_ids (bench-only).

    Scales the workload without external data so scaling runs are not
    dominated by fixed session overhead; each replica re-suffixes doc_ids,
    preserving per-doc determinism.
    """
    if repl <= 1:
        return corpus_path_for(sf_dir, config, variant=variant)
    base = corpus_path_for(sf_dir, config, variant=variant)
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/agentic_corpus/v2/{tag}-seed{config.seed}{variant}-x{repl}"
    done = os.path.join(out_dir, "_DONE")
    if not os.path.exists(done):
        import shutil

        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        import pyarrow.compute as pc

        files = sorted(
            os.path.join(base, f) for f in os.listdir(base) if f.endswith(".parquet")
        )
        for fi, f in enumerate(files):
            t = pq.read_table(f)
            for k in range(repl):
                ids = pc.binary_join_element_wise(
                    t["doc_id"].combine_chunks(), f"~r{k}", ""
                )
                pq.write_table(
                    t.set_column(0, "doc_id", ids),
                    os.path.join(tmp_dir, f"corpus-{fi:04d}-r{k:03d}.parquet"),
                )
        with open(os.path.join(tmp_dir, "_DONE"), "w") as fh:
            fh.write("ok")
        shutil.rmtree(out_dir, ignore_errors=True)
        os.replace(tmp_dir, out_dir)
    return out_dir
