"""Dedup operators: exact vs DuckDB, MinHash/SimHash/embedding near-dup vs
brute-force oracles on planted duplicates."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from agentic_doc_ray.functions import dedup as D

SF = "/root/testdata/sf0.001"


def test_exact_dedup_matches_sql():
    # plant duplicates on top of the real table
    base = duckdb.sql(
        f"SELECT CAST(doc_id AS VARCHAR) doc_id, text FROM read_parquet('{SF}/documents.parquet') LIMIT 50"
    ).arrow()
    dup = pa.Table.from_pydict(
        {"doc_id": ["x1", "x2"], "text": [base["text"][0].as_py(), base["text"][0].as_py()]}
    )
    t = pa.concat_tables([base.cast(dup.schema), dup])
    got = (
        D.exact_dedup(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("h")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            "SELECT md5(text) h, min(doc_id) keeper_id, count(*) n_dups FROM t GROUP BY md5(text) ORDER BY h"
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_dups"] == 3).sum() == 1  # the planted triple


def _planted_docs():
    base = (
        "the quick brown fox jumps over the lazy dog while reading documents "
        "about distributed data processing engines and arrow tables " * 3
    )
    return pa.Table.from_pydict(
        {
            "doc_id": ["a", "a_dup", "b", "c"],
            "text": [
                base,
                base + " tiny suffix",  # near-dup of a
                "completely different content about cooking pasta recipes and italian food culture traditions " * 3,
                "yet another unrelated document describing mountain hiking trails and weather conditions in the alps " * 3,
            ],
        }
    )


def test_minhash_finds_planted_near_dup():
    pairs = D.minhash_dedup_pairs(
        ray.data.from_arrow(_planted_docs()), threshold=0.7
    ).take_all()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    assert ("a", "a_dup") in found
    assert all({p[0], p[1]} == {"a", "a_dup"} for p in found)  # no false positives


def test_minhash_estimate_close_to_exact_jaccard():
    docs = ray.data.from_arrow(_planted_docs())
    pairs = D.minhash_dedup_pairs(docs, threshold=0.5).take_all()
    est = {(p["doc_a"], p["doc_b"]): p["est_jaccard"] for p in pairs}
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.jaccard_verify(docs, list(est.keys()))
    }
    for k, e in est.items():
        assert abs(e - exact[k]) < 0.2  # 64-hash estimator tolerance


def test_simhash_hamming_separates():
    t = _planted_docs()
    out = {
        r["doc_id"]: r["simhash"]
        for r in D.simhashes(ray.data.from_arrow(t)).take_all()
    }
    ham = lambda x, y: bin((x ^ y) & ((1 << 63) - 1)).count("1")
    assert ham(out["a"], out["a_dup"]) <= 8
    assert ham(out["a"], out["b"]) > 12
    assert ham(out["a"], out["c"]) > 12


def test_embedding_dup_pairs_vs_bruteforce():
    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 16))
    # plant 5 near-duplicate pairs
    dups = base[:5] + rng.standard_normal((5, 16)) * 0.02
    vecs = np.vstack([base, dups])
    ids = list(range(len(vecs)))
    t = pa.Table.from_pydict(
        {"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
    )
    got = D.embedding_dup_pairs(
        ray.data.from_arrow(t), dim=16, threshold=0.95
    ).take_all()
    got_pairs = {(r["vec_a"], r["vec_b"]) for r in got}
    # brute-force oracle
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = unit @ unit.T
    ii, jj = np.triu_indices(len(vecs), k=1)
    want = {(int(a), int(b)) for a, b in zip(ii[S[ii, jj] >= 0.95], jj[S[ii, jj] >= 0.95])}
    assert want, "oracle found no pairs — fixture broken"
    # no false positives; recall high (banded LSH)
    assert got_pairs <= want
    assert len(got_pairs) >= int(0.8 * len(want))


def test_oversized_bucket_star_pairs():
    # Regression (ADVICE r1): >_BUCKET_PAIR_CAP identical docs in one LSH
    # bucket must still produce pairs (star vs representative), not silence.
    cap = D._BUCKET_PAIR_CAP
    n = cap + 50
    text = "identical content repeated across the whole corpus many times " * 5
    t = pa.Table.from_pydict(
        {"doc_id": [f"d{i:05d}" for i in range(n)], "text": [text] * n}
    )
    pairs = D.minhash_dedup_pairs(
        ray.data.from_arrow(t), threshold=0.8
    ).take_all()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    # star shape: every doc pairs with the min-id representative
    rep = "d00000"
    assert len(found) == n - 1
    assert all(a == rep for a, _ in found)
    assert all(p["est_jaccard"] == 1.0 for p in pairs)


def test_contamination_flags_planted():
    bench_doc = (
        "the quick brown fox jumps over the lazy dog while running through "
        "a dense forest full of obstacles and strange noises everywhere today"
    )
    t = pa.Table.from_pydict(
        {
            "doc_id": ["contam", "clean", "short"],
            "text": [
                "prefix words here " + bench_doc + " suffix trailing words",
                "completely different content about cooking pasta and italian "
                "food culture with many other words that never overlap at all "
                "in any thirteen gram window of the benchmark text sample",
                "too short",
            ],
        }
    )
    out = {
        r["doc_id"]: r
        for r in D.contamination_flags(
            ray.data.from_arrow(t), [bench_doc], n=13
        ).take_all()
    }
    assert out["contam"]["contaminated"] and out["contam"]["n_overlaps"] > 0
    assert not out["clean"]["contaminated"]
    assert not out["short"]["contaminated"]  # < n tokens -> no n-grams


def test_minhash_routes_bit_equal(monkeypatch):
    """The broadcast route (sig matrix via ray.put, scoring in the pair-gen
    group) and the exchange route (two doc-keyed attach exchanges) must
    produce identical (doc_a, doc_b, est_jaccard) sets."""
    docs = ray.data.from_arrow(_planted_docs())
    via_broadcast = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in D.minhash_dedup_pairs(docs, threshold=0.5).take_all()
    )
    monkeypatch.setattr(D, "_SIG_BROADCAST_DOCS", 0)
    via_exchange = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in D.minhash_dedup_pairs(docs, threshold=0.5).take_all()
    )
    assert via_broadcast == via_exchange and via_broadcast


def test_jaccard_verify_routes_bit_equal(monkeypatch):
    """The verify tri-route: broadcast (needed shingle table via ray.put,
    zero exchanges), the big route reusing the materialized needed-only
    shingles (byte budget exceeded but pair ids collectable), and the
    crawl-scale big route that never touches the driver (pair ids NOT
    collectable, full-docs shingling) must all produce identical
    (doc_a, doc_b, jaccard) rows, including a pair referencing an absent
    doc (scores 0.0 on every route)."""
    import ray.data as rd

    docs = ray.data.from_arrow(_planted_docs())
    pair_tbl = pa.table(
        {
            "doc_a": pa.array(["a", "a", "b", "a"], pa.string()),
            "doc_b": pa.array(["a_dup", "b", "c", "zz_missing"], pa.string()),
        }
    )
    def run():
        return sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in D.jaccard_verify_pairs(
                docs, rd.from_arrow(pair_tbl)
            ).take_all()
        )

    via_broadcast = run()
    monkeypatch.setattr(D, "_VERIFY_BROADCAST_BYTES", 0)
    via_exchange_cached = run()
    monkeypatch.setattr(D, "_VERIFY_ID_COLLECT_PAIRS", 0)
    via_exchange_full = run()
    assert via_broadcast == via_exchange_cached == via_exchange_full
    assert len(via_broadcast) == 4
    by_pair = {(a, b): j for a, b, j in via_broadcast}
    assert by_pair[("a", "a_dup")] > 0.5
    assert by_pair[("a", "zz_missing")] == 0.0


def test_embedding_routes_bit_equal(monkeypatch):
    """Broadcast (unit matrix via ray.put, cosine in the pair-gen group)
    and exchange (two vec-keyed attaches) routes must agree exactly."""
    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 16))
    dups = base[:5] + rng.standard_normal((5, 16)) * 0.02
    vecs = np.vstack([base, dups])
    t = pa.Table.from_pydict(
        {"vec_id": list(range(len(vecs))), "embedding": [v.tolist() for v in vecs]}
    )
    via_broadcast = sorted(
        (r["vec_a"], r["vec_b"], round(r["cosine"], 12))
        for r in D.embedding_dup_pairs(
            ray.data.from_arrow(t), dim=16, threshold=0.95
        ).take_all()
    )
    monkeypatch.setattr(D, "_SIG_BROADCAST_DOCS", 0)
    via_exchange = sorted(
        (r["vec_a"], r["vec_b"], round(r["cosine"], 12))
        for r in D.embedding_dup_pairs(
            ray.data.from_arrow(t), dim=16, threshold=0.95
        ).take_all()
    )
    assert via_broadcast == via_exchange and via_broadcast


# ---------------------------------------------------------------------------
# cross_snapshot_dedup
# ---------------------------------------------------------------------------


def _two_snapshots():
    base = (
        "the quick brown fox jumps over the lazy dog while reading documents "
        "about distributed data processing engines and arrow tables " * 3
    )
    pasta = (
        "completely different content about cooking pasta recipes and "
        "italian food culture traditions " * 3
    )
    hike = (
        "yet another unrelated document describing mountain hiking trails "
        "and weather conditions in the alps " * 3
    )
    old = pa.Table.from_pydict(
        {
            "doc_id": ["o1", "o2", "o3", "o9"],
            "text": [base, pasta, hike, base],  # o1/o9: identical text
        }
    )
    new = pa.Table.from_pydict(
        {
            "doc_id": ["n1", "n2", "n3", "n4"],
            "text": [
                base,                      # exact match (min old id = o1)
                pasta + " tiny edit",      # near match of o2
                "short",                   # unique (shingle set tiny)
                "totally fresh content never seen before in any crawl "
                "about submarine cables and oceanography " * 3,  # unique
            ],
        }
    )
    return old, new


def test_cross_snapshot_dedup_pinned():
    old, new = _two_snapshots()
    got = {
        r["new_doc_id"]: (r["status"], r["matched_old_id"], r["jaccard"])
        for r in D.cross_snapshot_dedup(
            ray.data.from_arrow(old), ray.data.from_arrow(new)
        ).take_all()
    }
    assert got["n1"] == ("exact", "o1", 1.0)
    assert got["n2"][0] == "near" and got["n2"][1] == "o2" and got["n2"][2] >= 0.8
    assert got["n3"] == ("unique", "", 0.0)
    assert got["n4"] == ("unique", "", 0.0)


def test_cross_snapshot_dedup_matches_oracle():
    old, new = _two_snapshots()
    want = sorted(
        D.cross_snapshot_dedup_oracle(old, new).to_pylist(),
        key=lambda r: r["new_doc_id"],
    )
    got = sorted(
        D.cross_snapshot_dedup(
            ray.data.from_arrow(old).repartition(3),
            ray.data.from_arrow(new).repartition(2),
        ).take_all(),
        key=lambda r: r["new_doc_id"],
    )
    assert got == want


def test_cross_snapshot_dedup_real_corpus():
    """documents table vs its synthetic second crawl, oracle parity."""
    import duckdb as _dd

    from agentic_doc_ray.functions.delta import synth_second_crawl

    old_tbl = _dd.sql(
        f"SELECT CAST(doc_id AS VARCHAR) doc_id, text "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).arrow()
    old_ds = ray.data.from_arrow(old_tbl).repartition(4)
    new_ds = synth_second_crawl(
        ray.data.read_parquet(f"{SF}/documents.parquet")
    ).map_batches(
        lambda b: pa.Table.from_arrays(
            [b["doc_id"].cast(pa.string()), b["text"]], names=["doc_id", "text"]
        ),
        batch_format="pyarrow",
    )
    new_tbl = pa.concat_tables(
        [pa.Table.from_pylist(
            [{"doc_id": r["doc_id"], "text": r["text"]}
             for r in new_ds.take_all()],
            schema=pa.schema([("doc_id", pa.string()), ("text", pa.string())]),
        )]
    )
    want = sorted(
        D.cross_snapshot_dedup_oracle(old_tbl, new_tbl).to_pylist(),
        key=lambda r: r["new_doc_id"],
    )
    got = sorted(
        D.cross_snapshot_dedup(old_ds, new_ds).take_all(),
        key=lambda r: r["new_doc_id"],
    )
    assert got == want


def test_fuzzy_contamination_planted():
    """A lightly edited copy of a benchmark text shares LSH bands (fuzzy
    hit) even when no 13-gram survives verbatim; an unrelated text does
    not. Batch layout does not change the flags."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.dedup import (
        benchmark_band_table,
        fuzzy_contamination,
        fuzzy_contamination_batch,
    )

    bench = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sailors watch from the harbor wall and gulls wheel overhead "
        "in the salt wind of an october morning near the old lighthouse"
    )
    near_copy = bench.replace("seventeen", "nineteen").replace(
        "october", "november"
    )
    unrelated = (
        "completely different subject matter entirely about integer "
        "arithmetic in distributed database engines and shuffle plans "
        "with no shared phrasing whatsoever in any shingle window here"
    )
    docs = pa.table(
        {
            "doc_id": pa.array(["bench", "near", "far"], pa.string()),
            "text": pa.array([bench, near_copy, unrelated], pa.string()),
        }
    )
    per_band = benchmark_band_table([bench])
    local = fuzzy_contamination_batch(docs, per_band).to_pylist()
    by_id = {r["doc_id"]: r for r in local}
    assert by_id["bench"]["fuzzy_contaminated"]  # self-hit, all bands
    assert by_id["bench"]["n_shared_bands"] == 16
    assert by_id["near"]["fuzzy_contaminated"]  # edited copy still banded
    assert not by_id["far"]["fuzzy_contaminated"]

    for n_blocks in (1, 3):
        got = sorted(
            fuzzy_contamination(
                ray.data.from_arrow(docs).repartition(n_blocks), [bench]
            ).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert got == sorted(local, key=lambda r: r["doc_id"])


def test_soft_dedup_weights_planted():
    """Planted clusters: a triple, a pair, singletons -> integer
    per-mille weights 333/500/1000 and matching cluster sizes."""
    t = pa.table(
        {
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "text": ["aaa", "aaa", "aaa", "bb", "bb", "c", "d"],
        }
    )
    got = (
        D.soft_dedup_weights(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["cluster_size"].tolist() == [3, 3, 3, 2, 2, 1, 1]
    assert got["weight_permille"].tolist() == [333, 333, 333, 500, 500, 1000, 1000]


def test_dup_cluster_histogram_planted():
    t = pa.table(
        {
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "text": ["aaa", "aaa", "aaa", "bb", "bb", "c", "d"],
        }
    )
    got = (
        D.dup_cluster_histogram(ray.data.from_arrow(t).repartition(4))
        .to_pandas()
        .sort_values("cluster_size")
        .reset_index(drop=True)
    )
    assert got["cluster_size"].tolist() == [1, 2, 3]
    assert got["n_clusters"].tolist() == [2, 1, 1]
    assert got["n_docs"].tolist() == [2, 2, 3]


def test_cross_source_duplicates_planted():
    """A text shared by 2 sources, one duplicated within a single source,
    and singletons."""
    t = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": ["x", "x", "y", "y", "z", "w"],
            "source": ["s1", "s2", "s1", "s1", "s2", "s3"],
        }
    )
    got = (
        D.cross_source_duplicates(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("n_docs", ascending=False)
        .reset_index(drop=True)
    )
    assert len(got) == 4
    by = {
        r.h: (r.n_sources, r.n_docs, r.cross_source) for r in got.itertuples()
    }
    import hashlib as _h

    hx = _h.md5(b"x").hexdigest()
    hy = _h.md5(b"y").hexdigest()
    assert by[hx] == (2, 2, True)
    assert by[hy] == (1, 2, False)


def test_dedup_savings_by_source_planted():
    """Cross-source dup: keeper's source keeps the chars, the other
    source's copy counts as removed."""
    t = pa.table(
        {
            "doc_id": pa.array([10, 20, 30, 40], pa.int64()),
            "text": ["x", "x", "y", "z"],
            "source": ["s1", "s2", "s2", "s2"],
            "n_chars": pa.array([5, 5, 7, 9], pa.int64()),
        }
    )
    got = (
        D.dedup_savings_by_source(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["s1"].tolist() == [1, 1, 5, 5]
    # s2: 3 docs, the 'x' copy (doc 20) loses to keeper doc 10 in s1
    assert got.loc["s2"].tolist() == [3, 2, 21, 16]


def test_simhash_dup_pairs_matches_brute_force():
    """Banded pipeline == independent all-pairs Hamming, and the exact
    planted copies surface at hamming 0."""
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.dedup import (
        simhash_dup_pairs,
        simhash_dup_pairs_oracle,
        simhash_plant_batch,
    )

    tbl = simhash_plant_batch(
        pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        )
    )
    got = (
        simhash_dup_pairs(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    want = (
        simhash_dup_pairs_oracle(tbl)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    ham = dict(zip(zip(got["doc_a"], got["doc_b"]), got["hamming"]))
    # every exact planted copy is a hamming-0 pair (recall 1.0)
    ids = set(tbl.column("doc_id").to_pylist())
    for d in range(30):
        if d in ids and d + 1_000_000 in ids:
            assert (d, d + 1_000_000) in pairs
            assert ham[(d, d + 1_000_000)] == 0


def test_prefix_dedup_clusters_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.dedup import prefix_dedup_clusters

    head = "X" * 128
    t = pa.table(
        {
            "doc_id": pa.array([5, 2, 9, 7], pa.int64()),
            "text": [
                head + " tail one",
                head + " other tail",
                "unique document body",
                head + " third",
            ],
        }
    )
    got = prefix_dedup_clusters(
        ray.data.from_arrow(t).repartition(2)
    ).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["n_docs"] == 3
    assert got.iloc[0]["min_doc_id"] == 2


def test_near_dup_source_matrix_symmetry():
    """Canonical source pairs; totals match the verified pair count."""
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.dedup import (
        near_dup_source_matrix,
        verified_dedup_pairs,
    )

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    d = ray.data.from_arrow(tbl).repartition(3)
    got = near_dup_source_matrix(d).to_pandas()
    assert (got["source_a"] <= got["source_b"]).all()
    docs_str = d.map_batches(
        lambda b: __import__("pyarrow").table(
            {
                "doc_id": b.column("doc_id").cast("string"),
                "text": b.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    pairs = verified_dedup_pairs(docs_str, exact_threshold=0.8)
    n_pairs = pairs.num_rows if hasattr(pairs, "num_rows") else pairs.count()
    assert got["n_pairs"].sum() == n_pairs
