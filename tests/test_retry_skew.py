"""Retry semantics + skew handling.

Reference parity: infra failures retry (tenacity analogue -> Ray task
retries, SURVEY.md §4.2); application errors NEVER retry or raise — they
are data (error placeholder rows). Skew: one pathological mega-document
must not break or stall the bucketed reassembly (north_rule)."""

import pyarrow as pa
import ray.data

from agentic_doc_ray.config import EngineConfig
from agentic_doc_ray.oracle import parse_corpus_oracle
from agentic_doc_ray.pipelines import extract_corpus
from agentic_doc_ray.schema import CORPUS_SCHEMA

CFG = EngineConfig(parse_concurrency=(1, 2))


def test_transient_task_failure_is_retried(tmp_path):
    marker = tmp_path / "failed_once"

    def flaky(batch: pa.Table) -> pa.Table:
        if not marker.exists():
            marker.write_text("x")
            raise RuntimeError("transient infra failure (simulated)")
        return batch

    t = pa.Table.from_pydict({"x": list(range(100))})
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            flaky,
            batch_format="pyarrow",
            max_retries=3,
            retry_exceptions=True,
        )
        .take_all()
    )
    assert len(out) == 100
    assert marker.exists()


def test_app_errors_are_rows_not_retries():
    # a corrupt page yields an error row; the job neither raises nor loops
    from agentic_doc_ray.textparse import CORRUPT_MARKER

    t = pa.Table.from_pydict(
        {
            "doc_id": ["d"],
            "spans": [
                [
                    {"kind": "pdf_page", "text": CORRUPT_MARKER, "media_ref": "", "offset": 0},
                    {"kind": "text", "text": "fine text here", "media_ref": "", "offset": 1},
                ]
            ],
        },
        schema=CORPUS_SCHEMA,
    )
    out = extract_corpus(ray.data.from_arrow(t), CFG).take_all()
    assert len(out) == 1
    assert [e["page_num"] for e in out[0]["errors"]] == [0]
    assert [s["kind"] for s in out[0]["spans"]] == ["error", "text"]


def test_mega_doc_skew_matches_oracle():
    # one 2,000-span doc among 30 small docs; shuffled small blocks
    mega_spans = [
        {"kind": "pdf_page", "text": f"page {p} body words here", "media_ref": "", "offset": p}
        for p in range(2000)
    ]
    rows = {"doc_id": ["mega"], "spans": [mega_spans]}
    for i in range(30):
        rows["doc_id"].append(f"small-{i:02d}")
        rows["spans"].append(
            [{"kind": "text", "text": f"tiny doc {i} words", "media_ref": "", "offset": 0}]
        )
    t = pa.Table.from_pydict(rows, schema=CORPUS_SCHEMA)
    ds = ray.data.from_arrow(t).random_shuffle(seed=3).repartition(9)
    got = sorted(extract_corpus(ds, CFG).take_all(), key=lambda r: r["doc_id"])
    want = parse_corpus_oracle(t, CFG).to_pylist()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
        ] == [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in w["spans"]]
        assert g["markdown"] == w["markdown"]
    mega = next(r for r in got if r["doc_id"] == "mega")
    assert mega["end_page_idx"] == 1999
    assert [s["page"] for s in mega["spans"]] == list(range(2000))

def _mixed_corpus(n_small=25, mega_spans=300):
    rows = {"doc_id": ["mega-a", "mega-b"], "spans": []}
    for m in range(2):
        rows["spans"].append(
            [
                {
                    "kind": "pdf_page",
                    "text": f"mega {m} page {p} body words",
                    "media_ref": "",
                    "offset": p,
                }
                for p in range(mega_spans)
            ]
        )
    for i in range(n_small):
        rows["doc_id"].append(f"small-{i:02d}")
        rows["spans"].append(
            [
                {
                    "kind": "text" if i % 3 else "html",
                    "text": f"<p>tiny doc {i} words</p>" if i % 3 == 0 else f"tiny doc {i} words",
                    "media_ref": "",
                    "offset": 0,
                }
            ]
        )
    return pa.Table.from_pydict(rows, schema=CORPUS_SCHEMA)


def _span_tuples(rows):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in rows
    }


def test_adaptive_router_mixed_corpus_matches_oracle():
    """Size-aware routing: megas through the two-phase exchange, smalls
    through the fused path — output equals the oracle bit-for-bit."""
    from agentic_doc_ray.pipelines import extract_corpus_adaptive

    t = _mixed_corpus()
    ds = ray.data.from_arrow(t).random_shuffle(seed=7).repartition(6)
    got = sorted(
        extract_corpus_adaptive(ds, CFG, span_threshold=50).take_all(),
        key=lambda r: r["doc_id"],
    )
    want = parse_corpus_oracle(t, CFG).to_pylist()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    assert _span_tuples(got) == _span_tuples(want)
    for g, w in zip(got, want):
        assert g["markdown"] == w["markdown"]
        assert g["end_page_idx"] == w["end_page_idx"]


def test_adaptive_router_all_small_corpus():
    """No doc exceeds the threshold: the max-span pre-scan skips the mega
    branch entirely (no exchange fleets) and the output still equals
    extract_corpus."""
    from agentic_doc_ray.pipelines import extract_corpus_adaptive

    t = _mixed_corpus(n_small=12, mega_spans=3)  # "megas" under threshold too
    ds = ray.data.from_arrow(t).repartition(4)
    got = sorted(
        extract_corpus_adaptive(ds, CFG, span_threshold=50).take_all(),
        key=lambda r: r["doc_id"],
    )
    want = parse_corpus_oracle(t, CFG).to_pylist()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    assert _span_tuples(got) == _span_tuples(want)
