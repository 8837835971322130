"""Checkpoint manifest + resumable partitioned execution (SURVEY.md §4.4).

Partition = a group of input parquet shard FILES (one output directory per
input shard group — the layout a 100 TB run needs: a rerun never re-reads
finished shards). Each partition commit is atomic:

    write to {out}/_tmp/part={p}   ->   os.rename to {out}/part={p}
    write {out}/_manifest/part-{p}.json.tmp -> rename to .json

On resume, partitions with a committed manifest row (status=done) are
skipped; everything else re-runs. The reference has NO checkpointing
(SURVEY.md §4.1 "rerun reprocesses everything"); this layer is the
north_rule's per-partition lineage + metrics requirement.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

import pyarrow as pa

import ray.data

from agentic_doc_ray.config import DEFAULT_CONFIG, EngineConfig
from agentic_doc_ray.pipelines.extract import extract_corpus


def plan_partitions(corpus_dir: str, n_partitions: int) -> list[list[str]]:
    """Group the corpus directory's parquet files into n partitions.

    Round-robin so early/late file-size skew spreads across partitions.
    """
    files = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet files under {corpus_dir}")
    n = min(n_partitions, len(files))
    return [files[p::n] for p in range(n)]


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _input_fingerprint(files: list[str]) -> str:
    """Cheap lineage fingerprint of a partition's input shard files:
    (basename, size) pairs hashed. Metadata-only — no data read — so it is
    free at 100 TB, yet catches replaced/regrown shards: a "done" partition
    whose inputs changed since the commit re-runs instead of being skipped.
    """
    import hashlib

    h = hashlib.sha256()
    for f in files:
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size};".encode())
    return h.hexdigest()[:16]


def load_manifest(out_dir: str) -> dict[int, dict]:
    """partition_id -> committed manifest row (lineage + metrics)."""
    mdir = _manifest_dir(out_dir)
    rows: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return rows
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                row = json.load(fh)
            rows[row["partition_id"]] = row
    return rows


def _commit_manifest_row(out_dir: str, row: dict) -> None:
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"part-{row['partition_id']}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(row, fh)
    os.replace(tmp, path)  # atomic publish


def run_resumable(
    corpus_dir: str,
    out_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
    n_partitions: int = 8,
    pipeline: Callable[["ray.data.Dataset", EngineConfig], "ray.data.Dataset"] = extract_corpus,
    fail_after: int | None = None,
) -> dict[int, dict]:
    """Run the pipeline partition-by-partition with checkpoint/resume.

    ``fail_after`` (tests only) aborts after committing that many partitions,
    simulating a killed ``ray job submit`` run. Returns the manifest.
    """
    parts = plan_partitions(corpus_dir, n_partitions)
    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    n_run = 0
    for p, files in enumerate(parts):
        fp = _input_fingerprint(files)
        prev = done.get(p, {})
        # skip only if committed AND the inputs are the ones it committed
        # against (missing fingerprint = pre-upgrade manifest row: honor it)
        if prev.get("status") == "done" and prev.get("input_fingerprint", fp) == fp:
            continue
        if fail_after is not None and n_run >= fail_after:
            break
        attempt = done.get(p, {}).get("attempt", 0) + 1
        t0 = time.perf_counter()
        part_out = os.path.join(out_dir, f"part={p}")
        tmp_out = os.path.join(out_dir, "_tmp", f"part={p}")
        shutil.rmtree(tmp_out, ignore_errors=True)
        try:
            ds = ray.data.read_parquet(files)
            parsed = pipeline(ds, config)
            parsed.write_parquet(tmp_out)
            shutil.rmtree(part_out, ignore_errors=True)
            os.makedirs(os.path.dirname(part_out), exist_ok=True)
            os.replace(tmp_out, part_out)  # atomic publish
            back = ray.data.read_parquet(part_out)
            n_docs = back.count()

            def _counts(b: pa.Table) -> pa.Table:
                cols = {
                    "n": [pa.compute.sum(pa.compute.list_value_length(b["spans"])).as_py() or 0]
                }
                cols["n_err"] = (
                    [pa.compute.sum(pa.compute.list_value_length(b["errors"])).as_py() or 0]
                    if "errors" in b.column_names
                    else [0]
                )
                return pa.Table.from_pydict(cols)

            counted = back.map_batches(_counts, batch_format="pyarrow").materialize()
            n_spans = int(counted.sum("n") or 0)
            n_page_errors = int(counted.sum("n_err") or 0)
            row = {
                "partition_id": p,
                "input_files": files,
                "input_fingerprint": fp,
                "n_docs": n_docs,
                "n_spans": n_spans,
                "n_page_errors": n_page_errors,
                "status": "done",
                "attempt": attempt,
                "wall_s": round(time.perf_counter() - t0, 3),
                "error": "",
            }
        except Exception as exc:  # infra failure: record, continue
            row = {
                "partition_id": p,
                "input_files": files,
                "input_fingerprint": fp,
                "n_docs": 0,
                "n_spans": 0,
                "n_page_errors": 0,
                "status": "failed",
                "attempt": attempt,
                "wall_s": round(time.perf_counter() - t0, 3),
                "error": str(exc)[:500],
            }
        _commit_manifest_row(out_dir, row)
        n_run += 1
    return load_manifest(out_dir)
