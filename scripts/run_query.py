"""Run any driver query by name — the ``ray job submit`` path for the
training-data operators (the extraction pipeline has its own resumable
entrypoint, scripts/run_extract.py).

    ray job submit -- python scripts/run_query.py exact_dedup \
        --sf-dir /root/testdata/sf0.01 --output /tmp/q_out
    python scripts/run_query.py --list

Writes the result as parquet under --output (or prints the first rows
with --show). Exit code 0 on success; the query registry is the same
``queries()`` the correctness driver exercises, so anything listed here
is oracle-checked.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--output", default=None, help="write result parquet here")
    ap.add_argument("--show", type=int, default=0, help="print first N rows")
    ap.add_argument("--list", action="store_true", help="list query names")
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
    from agentic_doc_ray.context import tune_context

    tune_context()

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.list or not args.query:
        print("\n".join(sorted(qs)))
        return
    if args.query not in qs:
        sys.exit(f"unknown query {args.query!r}; try --list")

    res = qs[args.query](args.sf_dir)
    if not isinstance(res, ray.data.Dataset):
        import pyarrow as pa

        tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
        res = ray.data.from_arrow(tbl)
    if args.output:
        res.write_parquet(args.output)
        print(f"{args.query}: wrote {res.count()} rows to {args.output}")
    if args.show:
        for row in res.take(args.show):
            print(row)
    if not args.output and not args.show:
        print(f"{args.query}: {res.count()} rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
