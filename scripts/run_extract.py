"""Job entrypoint for the extraction pipeline — the ``ray job submit`` path.

    ray job submit -- python scripts/run_extract.py \
        --input /tmp/agentic_corpus/sf0.1-seed42 --output /tmp/extract_out \
        --partitions 16 [--split-size 10] [--no-marginalia]

Resumable by default: re-running with the same --output skips partitions
whose manifest rows are committed (state/manifest.py). Prints a JSON
summary (per-partition lineage + metrics) on completion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus dir (parquet shards)")
    ap.add_argument("--output", required=True, help="output dir (partitioned parquet)")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--split-size", type=int, default=10)
    ap.add_argument("--no-marginalia", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for local runs; under `ray job submit` the cluster decides")
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(
            address="local" if args.num_cpus else None,
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from agentic_doc_ray.config import EngineConfig
    from agentic_doc_ray.context import tune_context
    from agentic_doc_ray.state import run_resumable

    tune_context()
    cfg = EngineConfig(
        split_size=args.split_size,
        include_marginalia=not args.no_marginalia,
    )
    manifest = run_resumable(
        args.input, args.output, cfg, n_partitions=args.partitions
    )
    summary = {
        "partitions": len(manifest),
        "done": sum(1 for r in manifest.values() if r["status"] == "done"),
        "failed": sum(1 for r in manifest.values() if r["status"] == "failed"),
        "n_docs": sum(r["n_docs"] for r in manifest.values()),
        "n_spans": sum(r["n_spans"] for r in manifest.values()),
        "wall_s": round(sum(r["wall_s"] for r in manifest.values()), 2),
        "manifest": sorted(manifest.values(), key=lambda r: r["partition_id"]),
    }
    print(json.dumps(summary, default=str))
    ray.shutdown()
    sys.exit(0 if summary["failed"] == 0 else 1)


if __name__ == "__main__":
    main()
