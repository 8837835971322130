"""Split / sample / sequence packing: determinism + budget invariants."""

import numpy as np
import pyarrow as pa
import ray.data

from agentic_doc_ray.functions import sampling as S

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )


def test_split_deterministic_and_proportional():
    a = {r["doc_id"]: r["split"] for r in S.train_val_split(_docs(), 10).take_all()}
    b = {r["doc_id"]: r["split"] for r in S.train_val_split(_docs(), 10).take_all()}
    assert a == b  # stable across runs
    frac = sum(1 for v in a.values() if v == "val") / len(a)
    assert 0.03 < frac < 0.2  # ~10% at n=500


def test_pack_sequences_budget_invariants():
    budget = 512
    rows = S.pack_sequences(_docs(), token_budget=budget).take_all()
    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    # every doc packed exactly once
    assert sum(len(v) for v in by_pack.values()) == _docs().count()
    for pack_id, members in by_pack.items():
        members.sort(key=lambda r: r["position"])
        # positions dense from 0
        assert [m["position"] for m in members] == list(range(len(members)))
        total = sum(m["n_tokens"] for m in members)
        # budget respected unless a single oversized doc owns the pack
        assert total <= budget or len(members) == 1
    # greedy: a pack under budget is followed by a doc that would overflow
    # (checked implicitly by the oracle equality in the driver gate)


def test_pack_sequences_independent_of_block_layout():
    rows1 = sorted(
        map(tuple, (
            (r["pack_id"], r["doc_id"], r["position"])
            for r in S.pack_sequences(_docs(), 1024).take_all()
        ))
    )
    rows2 = sorted(
        map(tuple, (
            (r["pack_id"], r["doc_id"], r["position"])
            for r in S.pack_sequences(_docs().repartition(7), 1024).take_all()
        ))
    )
    assert rows1 == rows2


def test_sample_k_per_group_bottom_k_hash(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.sampling import sample_k_per_group

    sf = "/root/testdata/sf0.001"
    d = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("doc_id"),
            "doc_id",
            b["doc_id"].cast(pa.string()),
        ),
        batch_format="pyarrow",
    )
    got = (
        sample_k_per_group(d, by="lang", k=5)
        .to_pandas()
        .sort_values(["lang", "sample_rank"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT lang, doc_id, sample_rank FROM (
          SELECT lang, CAST(doc_id AS VARCHAR) AS doc_id,
                 CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)),
                            CAST(doc_id AS VARCHAR)) AS BIGINT) AS sample_rank
          FROM read_parquet('{sf}/documents.parquet'))
        WHERE sample_rank <= 5 ORDER BY lang, sample_rank
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # every group contributes exactly min(k, group size) rows
    sizes = duckdb.sql(
        f"SELECT lang, count(*) n FROM read_parquet('{sf}/documents.parquet') GROUP BY 1"
    ).df()
    for _, r in sizes.iterrows():
        assert (got.lang == r.lang).sum() == min(5, r.n)


def test_mixture_sample_weights_and_boundaries():
    t = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(200)], pa.string()),
            "source": pa.array(
                ["keep_all" if i % 4 == 0 else ("drop_all" if i % 4 == 1 else "other")
                 for i in range(200)],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    out = S.mixture_sample(
        ds, {"keep_all": 1000, "drop_all": 0}, default_per_mille=500
    ).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src.get("keep_all", [])) == 50       # weight 1000 keeps all
    assert "drop_all" not in by_src                    # weight 0 keeps none
    n_other = len(by_src.get("other", []))
    assert 20 < n_other < 80                           # default ~50% of 100
    # deterministic across reruns
    out2 = S.mixture_sample(
        ds, {"keep_all": 1000, "drop_all": 0}, default_per_mille=500
    ).take_all()
    assert sorted((r["doc_id"], r["source"]) for r in out) == sorted(
        (r["doc_id"], r["source"]) for r in out2
    )


def test_quantile_bins_edges_and_skew():
    from agentic_doc_ray.functions.sketches import quantile_bins

    # heavy ties: half the mass on one value — duplicate boundaries must
    # collapse deterministically (CASE-first == searchsorted-left)
    vals = [10] * 50 + list(range(100, 150))
    t = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(len(vals))], pa.string()),
            "n_chars": pa.array(vals, pa.int64()),
        }
    )
    out = {r["doc_id"]: r["bin"] for r in quantile_bins(ray.data.from_arrow(t), n_bins=4).take_all()}
    # ties on 10 all land in bin 0 (10 <= b1 since b1 == b2 == 10)
    assert all(out[str(i)] == 0 for i in range(50))
    assert max(out.values()) == 3 and min(out.values()) == 0
    # 4-bin assignment is monotone in the value
    bins = [out[str(i)] for i in range(50, 100)]
    assert bins == sorted(bins)


def test_temperature_mixture_rates_and_determinism():
    import hashlib
    import math

    # 3 sources with counts 40 / 160 / 640: rates 1000 / 500 / 250
    srcs = ["a"] * 40 + ["b"] * 160 + ["c"] * 640
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(srcs))), pa.int64()),
            "source": pa.array(srcs, pa.string()),
        }
    )
    out = S.temperature_mixture_sample(ray.data.from_arrow(t)).take_all()
    # replica: rate_pm = floor(1000*sqrt(min_n/n)), keep iff md5 pm < rate
    rates = {
        s: math.floor(1000.0 * math.sqrt(40.0 / n))
        for s, n in (("a", 40), ("b", 160), ("c", 640))
    }
    assert rates == {"a": 1000, "b": 500, "c": 250}
    expect = sorted(
        (i, s)
        for i, s in enumerate(srcs)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 1000
        < rates[s]
    )
    assert sorted((r["doc_id"], r["source"]) for r in out) == expect
    # the smallest source survives intact; the 16x source is flattened
    kept = {}
    for r in out:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
    assert kept["a"] == 40
    assert kept["c"] < kept["b"] * 4  # flattened well below the 4x raw ratio


def test_temperature_mixture_rejects_other_tau():
    import pytest

    t = pa.table({"doc_id": [1], "source": ["a"]})
    with pytest.raises(NotImplementedError):
        S.temperature_mixture_sample(ray.data.from_arrow(t), tau=0.9)


def test_leakage_free_split_components_never_straddle(ray_session):
    """Every member of a pair-connected component gets the SAME split
    side (the whole point); singletons split exactly like
    train_val_split's per-doc gate."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.sampling import (
        _pct,
        leakage_free_split,
        train_val_split,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(40)], pa.string()),
            "text": pa.array(["t"] * 40, pa.string()),
        }
    )
    # components: {0,1,2}, {5,6}, {10,11,12,13} via chains
    pairs = pa.table(
        {
            "doc_a": pa.array(["0", "1", "5", "10", "11", "12"], pa.string()),
            "doc_b": pa.array(["1", "2", "6", "11", "12", "13"], pa.string()),
        }
    )
    got = {
        r["doc_id"]: (r["component"], r["split"])
        for r in leakage_free_split(
            ray.data.from_arrow(docs).repartition(3),
            ray.data.from_arrow(pairs),
            val_pct=30,
        ).take_all()
    }
    assert len(got) == 40
    for comp_members in (["0", "1", "2"], ["5", "6"], ["10", "11", "12", "13"]):
        canon = min(comp_members)
        sides = {got[m][1] for m in comp_members}
        assert len(sides) == 1, comp_members
        assert {got[m][0] for m in comp_members} == {canon}
        want_side = "val" if _pct([canon])[0] < 30 else "train"
        assert sides == {want_side}
    # singleton: same side as the per-doc gate
    tv = {
        r["doc_id"]: r["split"]
        for r in train_val_split(
            ray.data.from_arrow(docs), val_pct=30
        ).take_all()
    }
    for d in ("20", "25", "39"):
        assert got[d] == (d, tv[d])


def test_fim_transform_roundtrip_and_gate():
    """PSM output is loss-free (reassembling middle between prefix and
    suffix recovers the original text), the md5 gate matches the
    repo-standard percentile, and 'orig' rows pass through unchanged."""
    import hashlib

    import ray.data

    from agentic_doc_ray.functions.sampling import fim_transform

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    orig = {
        str(r["doc_id"]): r["text"]
        for r in docs.take_all()
    }
    rows = fim_transform(docs, transform_pct=50).take_all()
    assert len(rows) == len(orig)
    n_psm = 0
    for r in rows:
        d, t = r["doc_id"], orig[r["doc_id"]]
        gate = int(hashlib.md5(d.encode()).hexdigest()[:4], 16) % 100
        if gate < 50:
            assert r["mode"] == "psm"
            n_psm += 1
            body = r["fim_text"]
            assert body.startswith("<PRE>")
            pre, rest = body[5:].split("<SUF>", 1)
            suf, mid = rest.split("<MID>", 1)
            assert pre + mid + suf == t
        else:
            assert r["mode"] == "orig"
            assert r["fim_text"] == t
    assert 0 < n_psm < len(rows)


def test_upsample_sources_planted():
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.sampling import upsample_sources

    ids = list(range(40))
    src = ["a" if i % 2 == 0 else "b" for i in ids]
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(src, pa.string()),
        }
    )
    got = (
        upsample_sources(
            ray.data.from_arrow(t).repartition(3), {"a": 2500, "b": 400}
        )
        .to_pandas()
        .sort_values(["doc_id", "epoch"])
        .reset_index(drop=True)
    )
    pm = {
        d: int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16) % 1000
        for d in ids
    }
    for d in ids:
        copies = got[got.doc_id == d]
        if d % 2 == 0:  # source a: 2 or 3 copies
            want = 2 + (1 if pm[d] < 500 else 0)
        else:  # source b: 0 or 1 copies
            want = 1 if pm[d] < 400 else 0
        assert len(copies) == want, d
        assert copies["epoch"].tolist() == list(range(want))


def test_span_corruption_invariants_and_batching():
    """Reconstruction invariant: interleaving input/target around matched
    sentinels reproduces the original token sequence; distributed output
    byte-equals the single-process kernel."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.sampling import (
        span_corruption,
        span_corruption_batch,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b",
        "",
        " ".join(f"tok{i}" for i in range(100)),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))], pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        span_corruption(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        span_corruption_batch(t)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()
    # reconstruct: walk input; at <extra_id_k> splice the target run k
    import re

    for r in want.itertuples():
        orig = texts[int(r.doc_id[1:])].split()
        runs = {}
        cur = None
        for tok in r.target_text.split():
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            if m:
                cur = int(m.group(1))
                runs[cur] = []
            else:
                runs[cur].append(tok)
        rebuilt = []
        for tok in r.input_text.split():
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            if m:
                rebuilt.extend(runs[int(m.group(1))])
            else:
                rebuilt.append(tok)
        assert rebuilt == orig, r.doc_id
        assert r.n_masked_tokens == sum(len(v) for v in runs.values())


def test_mixture_plan_waterfilling():
    """Two small sources fully taken, two big ones capped at the
    waterline; total allocation == budget when it fits."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.sampling import mixture_plan

    def doc(src, n_tokens):
        return {"source": src, "text": " ".join(["w"] * n_tokens)}

    rows = (
        [doc("tiny", 10)]
        + [doc("small", 100)]
        + [doc("big1", 500) for _ in range(2)]
        + [doc("big2", 700) for _ in range(2)]
    )
    t = pa.Table.from_pylist(rows)
    got = mixture_plan(
        ray.data.from_arrow(t).repartition(3), budget_tokens=1000
    ).to_pandas().set_index("source")
    # sweep (asc): tiny 10 (share 250) -> small 100 (share 330) ->
    # big1 1000avail take share 445 -> big2 take 445
    assert got.loc["tiny"].tolist() == [10, 10]
    assert got.loc["small"].tolist() == [100, 100]
    assert got.loc["big1", "avail_tokens"] == 1000
    assert got.loc["big1", "alloc_tokens"] == 445
    assert got.loc["big2", "alloc_tokens"] == 445
    assert got["alloc_tokens"].sum() == 1000


def test_balanced_shards_snake_balance():
    from agentic_doc_ray.functions.sampling import balanced_shards

    got = balanced_shards("/root/testdata/sf0.001", k=8).to_pandas()
    assert len(got) == 500
    per = got.groupby("shard")["n_chars"].agg(["count", "sum"])
    assert set(per.index) == set(range(8))
    # snake deal: doc counts within 1 of each other, sizes near-balanced
    assert per["count"].max() - per["count"].min() <= 1
    spread = per["sum"].max() - per["sum"].min()
    assert spread <= got["n_chars"].max() * 2
    # brute-force check of the snake formula on the exact rank order
    ref = got.sort_values(["n_chars", "doc_id"], ascending=[False, False])
    ref = ref.reset_index(drop=True)
    for r0, row in enumerate(ref.itertuples()):
        idx = r0 % 8
        want = idx if (r0 // 8) % 2 == 0 else 7 - idx
        assert row.shard == want


def test_packing_stats_invariants():
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.sampling import pack_sequences, packing_stats

    d = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    stats = packing_stats(d, token_budget=256).to_pandas()
    packed = pack_sequences(d, token_budget=256).to_pandas()
    # conservation: member counts and token sums match the assignment
    want = packed.groupby("pack_id")["n_tokens"].agg(["count", "sum"])
    got = stats.set_index("pack_id")
    assert len(got) == len(want)
    for pid, row in want.iterrows():
        assert got.loc[pid, "n_docs"] == row["count"]
        assert got.loc[pid, "used_tokens"] == row["sum"]
        assert got.loc[pid, "waste"] == max(0, 256 - row["sum"])
    # multi-doc packs never exceed the budget
    multi = got[got["n_docs"] > 1]
    assert (multi["used_tokens"] <= 256).all()
