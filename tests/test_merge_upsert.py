"""Keyed MERGE/upsert: D/U/I semantics vs the independent v2 derivation,
plus upsert-on-missing-key and a no-op feed."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from agentic_doc_ray.functions.delta import (
    merge_upsert,
    second_crawl_batch,
    upsert_feed_batch,
)

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return df.sort_values("doc_id").reset_index(drop=True)


def test_merge_equals_second_crawl():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = _sorted(
        merge_upsert(
            ray.data.from_arrow(t),
            ray.data.from_arrow(upsert_feed_batch(t)),
        ).to_pandas()
    )
    want = _sorted(second_crawl_batch(t).to_pandas())
    assert got.values.tolist() == want.values.tolist()


def test_merge_upsert_missing_key_and_noop():
    base = pa.table({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    ups = pa.table(
        {
            "doc_id": [2, 9, 3],
            "op": ["U", "U", "D"],
            "text": ["B", "nine", None],
        }
    )
    got = _sorted(
        merge_upsert(
            ray.data.from_arrow(base), ray.data.from_arrow(ups)
        ).to_pandas()
    )
    assert got.values.tolist() == [[1, "a"], [2, "B"], [9, "nine"]]
    # empty feed: identity
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "op": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }
    )
    got2 = _sorted(
        merge_upsert(
            ray.data.from_arrow(base), ray.data.from_arrow(empty)
        ).to_pandas()
    )
    assert got2.values.tolist() == [[1, "a"], [2, "b"], [3, "c"]]
