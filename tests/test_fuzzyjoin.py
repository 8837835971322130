"""Fuzzy string self-join (FastSS candidates + exact verify) vs an
independent brute-force Levenshtein oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from agentic_doc_ray.functions.fuzzyjoin import (
    _verify_ed1,
    fuzzy_pairs,
    fuzzy_pairs_oracle,
)


def _sorted(df):
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_verify_kernel_cases():
    a = np.array(["abc", "abc", "abcd", "abc", "ab", "héllo", "abc", "x"], dtype=object)
    b = np.array(["abc", "abd", "abc", "abcd", "abcd", "hello", "xbz", "xy"], dtype=object)
    assert _verify_ed1(a, b).tolist() == [0, 1, 1, 1, -1, 1, -1, 1]


def test_fuzzy_pairs_handcrafted():
    t = pa.table(
        {
            "id": list(range(10)),
            "name": [
                "alpha", "alphb", "alpha", "alpa", "beta",
                "betas", "eta", "gamma", "gamm", "gama",
            ],
        }
    )
    got = _sorted(fuzzy_pairs(ray.data.from_arrow(t), "id", "name").to_pandas())
    want = fuzzy_pairs_oracle(t, "id", "name").to_pandas()
    assert got.values.tolist() == want.values.tolist()


def test_fuzzy_pairs_randomized_vs_bruteforce():
    """Seeded random strings over a tiny alphabet (forces dense true-pair
    structure, length 0..6 edge cases included) — distributed result ==
    independent full-DP oracle, i.e. recall AND precision are exact."""
    rng = np.random.default_rng(7)
    names = [
        "".join(rng.choice(list("abc"), size=rng.integers(0, 7)))
        for _ in range(120)
    ]
    t = pa.table({"id": list(range(len(names))), "name": names})
    got = _sorted(fuzzy_pairs(ray.data.from_arrow(t), "id", "name").to_pandas())
    want = fuzzy_pairs_oracle(t, "id", "name").to_pandas()
    assert got.values.tolist() == want.values.tolist()
    assert len(want) > 50  # the alphabet is tiny; the case is non-trivial


def test_entity_clusters_transitive_and_singletons():
    """a~b, b~c (but a!~c) must share one cluster; unrelated rows label
    themselves; distributed result == union-find over oracle pairs."""
    t = pa.table(
        {
            "id": [10, 11, 12, 20, 30, 31],
            "name": ["kettle", "kettl", "kett", "zebra", "apple", "apples"],
        }
    )
    from agentic_doc_ray.functions.fuzzyjoin import entity_clusters

    got = (
        entity_clusters(ray.data.from_arrow(t), "id", "name")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # kettle~kettl~kett chain -> one cluster rooted at 10 (kettle!~kett,
    # distance 2 — only transitivity links them)
    assert got.set_index("id")["cluster"].to_dict() == {
        10: 10, 11: 10, 12: 10, 20: 20, 30: 30, 31: 30,
    }
