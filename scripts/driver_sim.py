"""Simulate the driver's correctness gate: run each queries() entry at a
given sf and compare with oracle_sql() through DuckDB (row count + schema
names + order-insensitive value comparison). Usage:

    python scripts/driver_sim.py [sf_dir] [query_substring ...]

With query_substring args, only matching queries run (and the entry()
smoke-check is skipped) — for iterating on a new operator without paying
for the whole suite.
"""

import sys

import duckdb
import pandas as pd

import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from agentic_doc_ray.context import tune_context

    tune_context()

    import __ray_entry__ as entrymod

    if not ONLY:
        e = entrymod.entry()
        n = e.count() if hasattr(e, "count") else len(e)
        print(f"entry(): {n} rows")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok = fail = 0
    for name, fn in qs.items():
        if ONLY and not any(s in name for s in ONLY):
            continue
        try:
            got = norm(to_pandas(fn(SF)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows, cols {list(got.columns)}")
            ok += 1
            continue
        try:
            want = norm(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {ex}")
            fail += 1
            continue
        status = []
        if len(got) != len(want):
            status.append(f"ROWS {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"SCHEMA {list(got.columns)} != {list(want.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=True
                )
            except AssertionError as ex:
                status.append("VALUES differ: " + str(ex).split("\n")[0])
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            fail += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    ray.shutdown()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
