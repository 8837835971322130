"""snapshot_diff: crawl-over-crawl delta vs brute-force comparison."""

import pyarrow as pa
import ray.data

from agentic_doc_ray.functions.delta import snapshot_diff, synth_second_crawl


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_snapshot_diff_basic():
    v1 = _ds([(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    v2 = _ds([(2, "b"), (3, "c CHANGED"), (5, "e")])
    got = sorted(
        (r["doc_id"], r["change"]) for r in snapshot_diff(v1, v2).take_all()
    )
    assert got == [(1, "removed"), (3, "changed"), (4, "removed"), (5, "added")]


def test_snapshot_diff_identical_and_empty_sides():
    v1 = _ds([(1, "a"), (2, "b")])
    assert snapshot_diff(v1, _ds([(1, "a"), (2, "b")])).count() == 0
    # all-removed: v2 side contributes zero rows to the exchange — the
    # sentinel guard keeps the schema race away
    empty = _ds([]).filter(lambda r: True)
    got = sorted(
        (r["doc_id"], r["change"]) for r in snapshot_diff(v1, empty).take_all()
    )
    assert got == [(1, "removed"), (2, "removed")]


def test_synth_second_crawl_rules():
    rows = [(i, f"text {i}") for i in range(30)]
    v2 = {r["doc_id"]: r["text"] for r in synth_second_crawl(_ds(rows)).take_all()}
    assert 0 not in v2 and 7 not in v2 and 14 not in v2          # %7 dropped
    assert v2[5] == "text 5 [edited v2]" and v2[10] == "text 10 [edited v2]"
    assert v2[10_000_000] == "text 0 (new)"                       # %11 re-added
    assert v2[10_000_011] == "text 11 (new)" and v2[10_000_022] == "text 22 (new)"
    assert v2[1] == "text 1"                                      # untouched


def test_semi_anti_join_ids():
    from agentic_doc_ray.functions.delta import anti_join_ids, semi_join_ids

    data = _ds([(i, f"t{i}") for i in range(20)])
    ids = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([3, 5, 5, 7, 99], pa.int64())})
    )
    semi = sorted(r["doc_id"] for r in semi_join_ids(data, ids).take_all())
    anti = sorted(r["doc_id"] for r in anti_join_ids(data, ids).take_all())
    assert semi == [3, 5, 7]
    assert anti == [i for i in range(20) if i not in (3, 5, 7)]
    # full-row passthrough (values, not just keys)
    row = next(r for r in semi_join_ids(data, ids).take_all() if r["doc_id"] == 3)
    assert row["text"] == "t3"


def test_incremental_equals_full_recompute():
    from agentic_doc_ray.functions.delta import (
        incremental_token_counts,
        synth_second_crawl,
    )
    from agentic_doc_ray.functions.text import token_counts

    v1 = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    v2 = synth_second_crawl(v1)
    got = sorted(
        (r["doc_id"], r["n_tokens"])
        for r in incremental_token_counts(v1, v2).take_all()
    )
    want = sorted((r["doc_id"], r["n_tokens"]) for r in token_counts(v2).take_all())
    assert got == want


def test_incremental_empty_sides():
    from agentic_doc_ray.functions.delta import incremental_token_counts

    empty = _ds([])
    one = _ds([(1, "hello world")])
    assert incremental_token_counts(empty, empty).count() == 0
    assert incremental_token_counts(one, empty).count() == 0
    got = sorted(
        (r["doc_id"], r["n_tokens"])
        for r in incremental_token_counts(empty, one).take_all()
    )
    assert got == [(1, 2)]


def test_ks_drift_brute_force():
    """Engine KS == a pure-Python recount over v1/v2 length multisets."""
    from collections import Counter

    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.delta import (
        _second_crawl_with_source,
        ks_drift,
    )

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    got = (
        ks_drift(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    v2 = _second_crawl_with_source(tbl)

    def dists(t):
        out = {}
        for s, txt in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            out.setdefault(s, Counter())[len(txt)] += 1
        return out

    d1, d2 = dists(tbl), dists(v2)
    for s in sorted(set(d1) | set(d2)):
        c1, c2 = d1.get(s, Counter()), d2.get(s, Counter())
        n1, n2 = sum(c1.values()), sum(c2.values())
        lens = sorted(set(c1) | set(c2))
        ca = cb = 0
        best, best_len = -1, None
        for ln in lens:
            ca += c1.get(ln, 0)
            cb += c2.get(ln, 0)
            diff = abs(ca * n2 - cb * n1)
            if diff > best:
                best, best_len = diff, ln
        assert got.loc[s, "n1"] == n1 and got.loc[s, "n2"] == n2
        assert got.loc[s, "ks_ppm"] == 1_000_000 * best // (n1 * n2)
        assert got.loc[s, "ks_at_len"] == best_len
