"""Checkpoint/resume: kill after k partitions, rerun, final table identical
to an uninterrupted run and only pending partitions re-execute."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet  # noqa: F401  (pa.parquet access below)
import pytest
import ray.data

from agentic_doc_ray.config import EngineConfig
from agentic_doc_ray.state import load_manifest, plan_partitions, run_resumable

CFG = EngineConfig(parse_concurrency=(1, 2))


@pytest.fixture(scope="module")
def corpus_dir(sf_smoke_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    # multiple shard files, as a real corpus would have
    ray.data.from_arrow(sf_smoke_corpus).repartition(6).write_parquet(d)
    return d


def _read_sorted(out_dir):
    import glob

    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    rows = ray.data.read_parquet(files).take_all()
    out = []
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        out.append(
            (
                r["doc_id"],
                tuple(
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in r["spans"]
                ),
            )
        )
    return out


def test_kill_and_resume_identical(corpus_dir, tmp_path):
    full_out = str(tmp_path / "full")
    run_resumable(corpus_dir, full_out, CFG, n_partitions=4)
    want = _read_sorted(full_out)
    m_full = load_manifest(full_out)
    assert all(r["status"] == "done" for r in m_full.values())
    assert sum(r["n_docs"] for r in m_full.values()) == len(want)

    # interrupted run: commit only 2 partitions, then "die"
    out = str(tmp_path / "resumed")
    m1 = run_resumable(corpus_dir, out, CFG, n_partitions=4, fail_after=2)
    assert sum(1 for r in m1.values() if r["status"] == "done") == 2

    # resume: only the 2 pending partitions execute (attempt stays 1 for done)
    m2 = run_resumable(corpus_dir, out, CFG, n_partitions=4)
    assert sorted(m2) == [0, 1, 2, 3]
    assert all(r["status"] == "done" and r["attempt"] == 1 for r in m2.values())
    assert _read_sorted(out) == want


def test_partitions_cover_all_files(corpus_dir):
    parts = plan_partitions(corpus_dir, 4)
    flat = sorted(f for p in parts for f in p)
    all_files = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )
    assert flat == all_files
    assert all(parts), "no empty partitions"


def test_resume_skips_done_partitions_no_rewrite(corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    run_resumable(corpus_dir, out, CFG, n_partitions=3, fail_after=1)
    done_part = next(iter(load_manifest(out).values()))["partition_id"]
    marker = os.path.join(out, f"part={done_part}")
    mtime = os.path.getmtime(marker)
    run_resumable(corpus_dir, out, CFG, n_partitions=3)
    assert os.path.getmtime(marker) == mtime  # untouched on resume


def test_changed_input_invalidates_done_partition(corpus_dir, tmp_path):
    """Lineage fingerprint: a 'done' partition whose input shard changed
    since the commit re-runs; untouched partitions still skip."""
    src = str(tmp_path / "corpus_copy")
    shutil.copytree(corpus_dir, src)
    out = str(tmp_path / "out")
    m1 = run_resumable(src, out, CFG, n_partitions=3)
    assert all(r["status"] == "done" and r["attempt"] == 1 for r in m1.values())
    assert all(r["input_fingerprint"] for r in m1.values())

    # grow one shard of partition 0: append a copy with FRESH doc_ids
    # (same-id rows would merge in per-doc reassembly, hiding the change)
    victim = m1[0]["input_files"][0]
    tbl = pa.parquet.read_table(victim)
    extra = tbl.set_column(
        tbl.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array([f"{d}_copy" for d in tbl.column("doc_id").to_pylist()]),
    )
    pa.parquet.write_table(pa.concat_tables([tbl, extra]), victim)

    m2 = run_resumable(src, out, CFG, n_partitions=3)
    assert m2[0]["attempt"] == 2  # re-ran against the changed input
    assert m2[0]["n_docs"] > m1[0]["n_docs"]  # saw the appended rows
    assert all(m2[p]["attempt"] == 1 for p in m2 if p != 0)  # others skipped
    assert m2[0]["input_fingerprint"] != m1[0]["input_fingerprint"]
    assert "n_page_errors" in m2[0]


def test_save_reload_roundtrip(tmp_path):
    """Per-doc JSON save -> reload re-validates and attaches result_path
    (ref parse.py:201-221,453-466 semantics)."""
    import ray.data

    from agentic_doc_ray.pipelines import extract_corpus
    from agentic_doc_ray.state.results import load_results_json, save_results_json
    from agentic_doc_ray.synth import corpus_path_for

    parsed = extract_corpus(
        ray.data.read_parquet(corpus_path_for("/root/testdata/sf0.001"))
    ).limit(40)
    orig = {r["doc_id"]: r for r in parsed.take_all()}

    out_dir = str(tmp_path / "results")
    manifest = save_results_json(
        ray.data.from_items(list(orig.values())), out_dir, timestamp="20260101_000000"
    ).take_all()
    assert len(manifest) == len(orig)
    assert all(m["result_path"].endswith("_20260101_000000.json") for m in manifest)

    back = {r["doc_id"]: r for r in load_results_json(out_dir).take_all()}
    assert set(back) == set(orig)
    for doc_id, row in orig.items():
        got = back[doc_id]
        assert got["result_path"].endswith(".json")
        assert got["markdown"] == row["markdown"]
        assert got["doc_type"] == row["doc_type"]
        assert got["start_page_idx"] == row["start_page_idx"]
        assert got["end_page_idx"] == row["end_page_idx"]
        assert got["errors"] == row["errors"]
        assert len(got["spans"]) == len(row["spans"])
        for gs, os_ in zip(got["spans"], row["spans"]):
            assert gs["kind"] == os_["kind"]
            assert gs["text"] == os_["text"]
            assert gs["media_ref"] == os_["media_ref"]
            assert gs["offset"] == os_["offset"]
            assert gs["chunk_id"] == os_["chunk_id"]
            assert gs["page"] == os_["page"]
            assert [round(x, 5) for x in gs["bbox"]] == [
                round(x, 5) for x in os_["bbox"]
            ]


def test_save_reload_with_extraction(tmp_path):
    """Extraction fields round-trip through the per-doc JSON envelope
    (ref ParsedDocument.extraction/extraction_metadata/extraction_error)."""
    import json

    import ray.data

    from agentic_doc_ray.functions.extract_fields import extract_fields_model
    from agentic_doc_ray.models import DocExtraction
    from agentic_doc_ray.pipelines import extract_corpus
    from agentic_doc_ray.state.results import load_results_json, save_results_json
    from agentic_doc_ray.synth import corpus_path_for

    parsed = extract_corpus(
        ray.data.read_parquet(corpus_path_for("/root/testdata/sf0.001"))
    ).limit(20)
    rows = {r["doc_id"]: r for r in parsed.take_all()}
    ex = {
        r["doc_id"]: r
        for r in extract_fields_model(
            ray.data.from_items(list(rows.values())), DocExtraction
        ).take_all()
    }
    combined = []
    for d, r in rows.items():
        r = dict(r)
        r["extraction"] = ex[d]["extraction"]
        r["extraction_metadata"] = ex[d]["extraction_metadata"]
        r["extraction_error"] = ex[d]["extraction_error"]
        combined.append(r)

    out_dir = str(tmp_path / "res_ex")
    save_results_json(
        ray.data.from_items(combined), out_dir, timestamp="20260101_000000"
    ).materialize()
    back = {r["doc_id"]: r for r in load_results_json(out_dir).take_all()}
    assert set(back) == set(rows)
    for d in rows:
        got, want = back[d], ex[d]
        if want["extraction"] is None:
            assert got["extraction"] is None
        else:
            assert json.loads(got["extraction"]) == json.loads(want["extraction"])
            assert json.loads(got["extraction_metadata"]) == json.loads(
                want["extraction_metadata"]
            )
        assert (got["extraction_error"] or "") == (want["extraction_error"] or "")
