"""grouped_apply — the generic safe groupby-apply surface."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.functions.group_api import grouped_apply


def test_grouped_apply_multi_key_and_whole_groups():
    """fn sees every row of its key group exactly once (multi-column
    keys), regardless of input partitioning."""
    n = 500
    t = pa.table(
        {
            "a": pa.array((np.arange(n) % 7).astype(np.int64)),
            "b": pa.array([f"s{i % 3}" for i in range(n)]),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.string()), ("n", pa.int64()), ("vsum", pa.int64())]
    )

    def fn(g: pa.Table) -> pa.Table:
        return pa.Table.from_pylist(
            [
                {
                    "a": g.column("a")[0].as_py(),
                    "b": g.column("b")[0].as_py(),
                    "n": g.num_rows,
                    "vsum": int(pc.sum(g.column("v")).as_py()),
                }
            ],
            schema=out_schema,
        )

    got = (
        grouped_apply(
            ray.data.from_arrow(t).repartition(5), ["a", "b"], fn, out_schema
        )
        .to_pandas()
        .set_index(["a", "b"])
        .sort_index()
    )
    df = t.to_pandas()
    want = df.groupby(["a", "b"])["v"].agg(["count", "sum"])
    assert len(got) == len(want)
    for (a, b), row in want.iterrows():
        assert got.loc[(a, b), "n"] == row["count"]
        assert got.loc[(a, b), "vsum"] == row["sum"]


def test_grouped_apply_filtering_input_and_null_keys():
    """A filtering upstream (possible zero-row first block) + null keys
    forming their own group."""
    t = pa.table(
        {
            "k": pa.array([1, 1, None, None, 2], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    out_schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])

    def fn(g: pa.Table) -> pa.Table:
        return pa.Table.from_pylist(
            [{"k": g.column("k")[0].as_py(), "n": g.num_rows}], schema=out_schema
        )

    ds = ray.data.from_arrow(t).repartition(3).map_batches(
        lambda b: b.filter(pc.not_equal(b.column("v"), 50)),
        batch_format="pyarrow",
    )
    got = {
        r["k"]: r["n"] for r in grouped_apply(ds, "k", fn, out_schema).take_all()
    }
    assert got == {1: 2, None: 2}
