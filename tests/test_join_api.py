"""Generic hash_join (broadcast + bucketed routes) vs DuckDB on all four
join types, plus schema-stability and route-equality pins."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from agentic_doc_ray.functions.join_api import hash_join

SF = "/root/testdata/sf0.001"


def _duck(sql):
    for t in ["orders", "customer"]:
        sql = sql.replace(f" {t}", f" read_parquet('{SF}/{t}.parquet')")
    return duckdb.sql(sql).df()


def _orders():
    return ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )


def _customer():
    return ray.data.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    )


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


_SQL = {
    "inner": """
        SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    # planted: half the customers get no orders match below (filtered left)
    "left": """
        SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
        FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0) o
        LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
          ON o.o_custkey = c.c_custkey
    """,
    # semi/anti against the o_orderkey % 7 == 0 subset so both outputs
    # are non-empty (every customer has SOME order at this SF)
    "semi": """
        SELECT c.c_custkey, c.c_name, c.c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey % 7 = 0 AND o.o_custkey = c.c_custkey)
    """,
    "anti": """
        SELECT c.c_custkey, c.c_name, c.c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey % 7 = 0 AND o.o_custkey = c.c_custkey)
    """,
}


def _run(how, threshold):
    if how == "inner":
        ds = hash_join(
            _orders(), _customer(),
            left_on="o_custkey", right_on="c_custkey",
            how="inner", broadcast_threshold=threshold,
        )
    elif how == "left":
        o = _orders().filter(lambda r: r["o_orderkey"] % 2 == 0)
        c = _customer().filter(lambda r: r["c_custkey"] % 3 == 0)
        ds = hash_join(
            o, c, left_on="o_custkey", right_on="c_custkey",
            how="left", broadcast_threshold=threshold,
        )
    else:
        o = _orders().filter(lambda r: r["o_orderkey"] % 7 == 0)
        ds = hash_join(
            _customer(), o,
            left_on="c_custkey", right_on="o_custkey",
            how=how, broadcast_threshold=threshold,
        )
    return _norm(ds.to_pandas())


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_both_routes_match_sql(ray_session, how):
    want = _norm(_duck(_SQL[how]))
    broadcast = _run(how, threshold=10**9)
    bucketed = _run(how, threshold=0)
    pd.testing.assert_frame_equal(broadcast, want, check_dtype=False)
    pd.testing.assert_frame_equal(bucketed, want, check_dtype=False)


def test_hash_join_empty_right_schema_stable(ray_session):
    import pyarrow.compute as pc

    # schema-PRESERVING empty filter (a row-lambda filter that drops
    # every row erases Ray's schema, which hash_join rejects — below)
    empty_c = _customer().map_batches(
        lambda b: b.filter(pc.less(b["c_custkey"], -1)),
        batch_format="pyarrow",
    )
    out = hash_join(
        _orders(), empty_c,
        left_on="o_custkey", right_on="c_custkey",
        how="left", broadcast_threshold=10**9,
    )
    df = out.to_pandas()
    assert set(df.columns) == {"o_orderkey", "o_custkey", "c_name", "c_mktsegment"}
    assert len(df) == _orders().count()
    assert df["c_name"].isna().all()


def test_hash_join_colliding_column_names(ray_session):
    l = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    r = ray.data.from_arrow(pa.table({"k2": [2, 3, 4], "v": ["X", "Y", "Z"]}))
    for thr in (10**9, 0):
        got = _norm(
            hash_join(
                l, r, left_on="k", right_on="k2", how="inner",
                broadcast_threshold=thr,
            ).to_pandas()
        )
        assert list(got.columns) == ["k", "v", "v_r"]
        assert got["k"].tolist() == [2, 3]
        assert got["v"].tolist() == ["b", "c"]
        assert got["v_r"].tolist() == ["X", "Y"]


def test_hash_join_rejects_bad_how():
    with pytest.raises(ValueError):
        hash_join(None, None, left_on="x", how="cross")


def test_hash_join_rejects_schemaless_input(ray_session):
    schemaless = _customer().filter(lambda r: r["c_custkey"] < 0)
    with pytest.raises(ValueError, match="schematized"):
        hash_join(
            _orders(), schemaless,
            left_on="o_custkey", right_on="c_custkey", how="left",
        )


def test_hash_join_full_outer():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.join_api import hash_join

    l = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "x": ["a", "b", "c"]})
    ).repartition(2)
    r = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 3, 4], pa.int64()), "y": ["B", "C", "D"]})
    ).repartition(2)
    got = (
        hash_join(l, r, left_on="k", how="full")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 2, 3, 4]
    assert got["x"].tolist()[0] == "a" and got["x"].isna().tolist() == [
        False, False, False, True,
    ]
    assert got["y"].isna().tolist() == [True, False, False, False]


def test_hash_join_full_outer_empty_sides():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.join_api import hash_join

    l = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "x": pa.array([], pa.string())})
    )
    r = ray.data.from_arrow(
        pa.table({"k": pa.array([7], pa.int64()), "y": pa.array(["Z"], pa.string())})
    )
    got = hash_join(l, r, left_on="k", how="full").to_pandas()
    assert got["k"].tolist() == [7] and got["y"].tolist() == ["Z"]
