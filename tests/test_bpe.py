"""BPE merge learning vs the single-process replica oracle."""

import pyarrow as pa
import ray.data

from agentic_doc_ray.functions.bpe import bpe_train, bpe_train_oracle


def _tbl():
    # 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3 — the Sennrich
    # worked example (sans </w>): 'es' then 'est' merge first
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    texts = [" ".join(words[i::4]) for i in range(4)]
    return pa.Table.from_pydict(
        {"doc_id": pa.array(range(4), pa.int64()), "text": texts}
    )


def test_matches_replica_oracle_any_partitioning():
    t = _tbl()
    want = bpe_train_oracle(t, n_merges=10).to_pylist()
    assert want, "oracle produced no merges"
    # first two merges are the classic e+s, es+t (count 9 each)
    assert (want[0]["left"], want[0]["right"]) == ("e", "s")
    assert (want[1]["left"], want[1]["right"]) == ("es", "t")
    assert want[0]["pair_count"] == want[1]["pair_count"] == 9
    for parts in (1, 5):
        got = bpe_train(
            ray.data.from_arrow(t).repartition(parts), n_merges=10
        ).to_pylist()
        assert got == want


def test_min_count_stops_and_cap_is_deterministic():
    t = _tbl()
    # min_count above every pair count -> no merges
    assert bpe_train_oracle(t, min_count=100).num_rows == 0
    # capping the vocab changes counts deterministically on both sides
    got = bpe_train(ray.data.from_arrow(t), n_merges=5, max_words=2).to_pylist()
    want = bpe_train_oracle(t, n_merges=5, max_words=2).to_pylist()
    assert got == want
