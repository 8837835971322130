"""Table profiler vs direct whole-table computation (null handling
included via a synthetic table with planted nulls)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from agentic_doc_ray.functions.profile import table_profile


def test_profile_orders_matches_direct():
    got = table_profile("/root/testdata/sf0.001", "orders").to_pandas()
    t = pq.read_table("/root/testdata/sf0.001/orders.parquet")
    for _, r in got.iterrows():
        col = t.column(r["column"])
        assert r["n"] == len(col)
        assert r["n_null"] == col.null_count
        vals = col.drop_null().to_pylist()
        assert r["n_distinct"] == len(set(vals))
        if pa.types.is_integer(col.type):
            assert r["min_i64"] == min(vals) and r["max_i64"] == max(vals)


def test_profile_nulls_and_negative_zero(tmp_path):
    tbl = pa.table(
        {
            "i": pa.array([1, None, 3, 3, None], pa.int64()),
            "f": pa.array([0.0, -0.0, 1.5, None, 1.5], pa.float64()),
            "s": pa.array(["a", "a", None, "b", ""], pa.string()),
        }
    )
    d = tmp_path / "x"
    d.mkdir()
    pq.write_table(tbl, str(d / "t.parquet"))
    got = table_profile(str(d), "t").to_pandas().set_index("column")
    assert got.loc["i"].tolist() == [5, 2, 2, 1, 3]
    # -0.0 normalizes to +0.0 -> distinct {0.0, 1.5} = 2 (SQL equality)
    assert got.loc["f", "n_null"] == 1 and got.loc["f", "n_distinct"] == 2
    assert got.loc["s", "n_null"] == 1 and got.loc["s", "n_distinct"] == 3


def test_fk_violations_planted_orphans():
    """Planted orphans + NULL child keys: NULLs are not violations,
    orphan rows/keys counted exactly, clean edge reports zeros."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.profile import fk_violations

    child = ray.data.from_arrow(
        pa.table(
            {
                "fk": pa.array([1, 1, 2, 7, 7, 7, None, 9], pa.int64()),
                "x": pa.array(range(8), pa.int64()),
            }
        )
    ).repartition(3)
    parent = ray.data.from_arrow(
        pa.table({"pk": pa.array([1, 2, 3], pa.int64())})
    )
    got = fk_violations(child, "fk", parent, "pk", "child.fk->parent.pk").take_all()
    assert len(got) == 1
    r = got[0]
    assert r["fk"] == "child.fk->parent.pk"
    assert r["n_child_rows"] == 7          # NULL row excluded
    assert r["n_violating_rows"] == 4      # 7,7,7,9
    assert r["n_violating_keys"] == 2      # {7, 9}

    clean = fk_violations(
        ray.data.from_arrow(pa.table({"fk": pa.array([1, 2], pa.int64())})),
        "fk",
        parent,
        "pk",
        "clean",
    ).take_all()
    assert clean[0]["n_violating_rows"] == 0
    assert clean[0]["n_violating_keys"] == 0


def test_dataset_card_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.profile import dataset_card

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["one two three", "four five", ""],
            "source": ["a", "a", "b"],
        }
    )
    got = {
        r["metric"]: r["value"]
        for r in dataset_card(ray.data.from_arrow(t).repartition(2)).take_all()
    }
    assert got["n_docs"] == 3
    assert got["n_tokens"] == 5
    assert got["n_chars"] == 13 + 9 + 0
    assert got["min_chars"] == 0
    assert got["max_chars"] == 13
    assert got["mean_chars_x100"] == 100 * 22 // 3
    assert got["docs:a"] == 2 and got["docs:b"] == 1


def test_rollup_counts_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.profile import rollup_counts

    t = pa.table(
        {
            "source": ["a", "a", "b"],
            "lang": ["en", "de", "en"],
            "text": ["xx", "yyy", "z"],
        }
    )
    got = {
        (r["source"], r["lang"]): (r["n_docs"], r["n_chars"])
        for r in rollup_counts(ray.data.from_arrow(t).repartition(2)).to_pylist()
    }
    assert got[("a", "en")] == (1, 2)
    assert got[("a", "ALL")] == (2, 5)
    assert got[("ALL", "en")] == (2, 3)
    assert got[("ALL", "ALL")] == (3, 6)
    assert len(got) == 3 + 2 + 2 + 1


def test_source_common_prefix_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.profile import source_common_prefix

    t = pa.table(
        {
            "source": ["a", "a", "a", "b", "b", "c"],
            "text": [
                "HEADER: one two",
                "HEADER: three",
                "HEADER: zz",
                "xy1",
                "xy2",
                "solo document",
            ],
        }
    )
    got = (
        source_common_prefix(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    assert got.loc["a", "prefix_len"] == len("HEADER: ")
    assert got.loc["a", "prefix"] == "HEADER: "
    assert got.loc["b", "prefix_len"] == 2 and got.loc["b", "prefix"] == "xy"
    # single-doc source: the whole doc is its own common prefix
    assert got.loc["c", "prefix_len"] == len("solo document")
    assert got.loc["a", "n_docs"] == 3


def test_source_common_suffix_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.profile import source_common_suffix

    t = pa.table(
        {
            "source": ["a", "a", "b"],
            "text": ["one (c) corp", "two words (c) corp", "nothing shared?"],
        }
    )
    got = (
        source_common_suffix(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("source")
    )
    assert got.loc["a", "suffix_len"] == len(" (c) corp")
    assert got.loc["a", "suffix"] == " (c) corp"
    assert got.loc["b", "suffix_len"] == len("nothing shared?")
