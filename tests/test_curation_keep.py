"""The three round-3 curation operators vs brute-force python oracles:
quality-based cluster-representative keep, token-budget prefix selection,
and the composed gopher->dedup->pricing pipeline."""

import pyarrow as pa

import ray.data

from agentic_doc_ray.functions.curation import curation_keep
from agentic_doc_ray.functions.graph import near_dedup_keep_best


def _naive_keep_best(ids, scores, pairs):
    """Union-find clusters, keep argmax-(score, min id) per cluster plus
    every unpaired id."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    clusters = {}
    for n in parent:
        clusters.setdefault(find(n), []).append(n)
    score = dict(zip(ids, scores))
    kept = {i for i in ids if i not in parent}
    for members in clusters.values():
        kept.add(min(members, key=lambda m: (-score[m], m)))
    return kept


def test_keep_best_mixed_clusters():
    ids = [f"d{i}" for i in range(12)]
    scores = [5, 9, 9, 1, 7, 3, 8, 2, 4, 6, 0, 10]
    pairs = [
        ("d0", "d1"), ("d1", "d2"),          # chain; d1/d2 tie at 9 -> d1
        ("d3", "d4"),                          # pair -> d4 (7 > 1)
        ("d5", "d6"), ("d6", "d7"), ("d5", "d7"),  # triangle -> d6
    ]
    docs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": ids, "n_chars": pa.array(scores, pa.int64())}
        )
    )
    prs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_a": [a for a, _ in pairs], "doc_b": [b for _, b in pairs]}
        )
    )
    got = set(
        near_dedup_keep_best(docs, prs).to_pandas()["doc_id"]
    )
    assert got == _naive_keep_best(ids, scores, pairs)
    assert "d1" in got and "d2" not in got  # tie broken by min doc_id
    assert "d4" in got and "d3" not in got  # higher score wins


def test_keep_best_no_pairs_passthrough():
    docs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": ["a", "b"], "n_chars": pa.array([1, 2], pa.int64())}
        )
    )
    prs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_a": pa.array([], pa.string()),
                "doc_b": pa.array([], pa.string()),
            }
        )
    )
    got = set(near_dedup_keep_best(docs, prs).to_pandas()["doc_id"])
    assert got == {"a", "b"}


def _gate(text, stopwords):
    """Pure-python Gopher keep bit (same rules as the batch fn)."""
    words = text.strip().split()
    n = len(words)
    if not (50 <= n <= 100_000):
        return False
    wl = sum(len(w) for w in words)
    if not (3 * n <= wl <= 10 * n):
        return False
    sym = text.count("#") + text.count("...")
    if 10 * sym > n:
        return False
    lines = [l for l in text.split("\n") if l != ""]
    bullets = sum(1 for l in lines if l.startswith(("-", "•")))
    ell = sum(1 for l in lines if l.endswith("..."))
    if 10 * bullets > 9 * len(lines) or 10 * ell > 3 * len(lines):
        return False
    alpha = sum(1 for w in words if any(c.isalpha() for c in w))
    if 5 * alpha < 4 * n:
        return False
    distinct = {w.lower() for w in words if w.lower() in stopwords}
    return len(distinct) >= 2


def test_curation_keep_gate_dedup_pricing():
    sw = ("the", "a")
    good = "the word a " + "token " * 60  # passes every rule
    nostop = "word tok " * 40           # fails stopwords only
    short = "the a tiny"                # fails word count
    rows = [
        (1, good),
        (2, good),       # exact dup of 1 -> dropped (min id keeps)
        (3, nostop),
        (4, short),
        (5, good + "x"), # distinct content, passes
    ]
    docs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
    )
    got = curation_keep(docs, stopwords=sw).to_pandas()
    expected_pass = {i for i, t in rows if _gate(t, sw)}
    assert expected_pass == {1, 2, 5}
    assert set(got["doc_id"]) == {1, 5}
    priced = dict(zip(got["doc_id"], got["n_tokens"]))
    assert priced[1] == len(good.strip().split())
    assert priced[5] == len((good + "x").strip().split())


def test_token_budget_select_prefix(tmp_path):
    # synthesize a tiny documents.parquet so the sf_dir-shaped operator
    # runs end to end, then check against the naive sorted prefix
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions.scans import token_budget_select

    texts = [
        "alpha beta gamma delta",          # 4 tokens
        "one two three",                   # 3
        "a b c d e f",                     # 6
        "x " * 10,                         # 10
        "solo",                            # 1
    ]
    ids = list(range(5))
    n_chars = [len(t) for t in texts]
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": texts,
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    budget = 14
    got = token_budget_select(str(tmp_path), budget_tokens=budget).to_pandas()

    toks = [len(t.strip().split()) for t in texts]
    order = sorted(ids, key=lambda i: (-n_chars[i], i))
    cum, naive = 0, {}
    for i in order:
        cum += toks[i]
        if cum <= budget:
            naive[i] = cum
        else:
            break
    assert dict(zip(got["doc_id"], got["cum_tokens"])) == naive
    assert dict(zip(got["doc_id"], got["n_tokens"])) == {
        i: toks[i] for i in naive
    }


def test_source_capped_select(tmp_path):
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions.scans import source_capped_select

    rows = [
        (0, "s1", "w " * 5),   # 5 tokens
        (1, "s1", "ww " * 8),  # 8 tokens, longer -> first in s1
        (2, "s1", "w w w"),    # 3 tokens
        (3, "s2", "x " * 4),
        (4, "s2", "xx " * 9),
    ]
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": [r[1] for r in rows],
                "text": [r[2] for r in rows],
                "n_chars": pa.array(
                    [len(r[2]) for r in rows], pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    cap = 10
    got = source_capped_select(str(tmp_path), cap_tokens=cap).to_pandas()

    naive = {}
    by_src = {}
    for i, s, t in rows:
        by_src.setdefault(s, []).append((len(t), -i, i, len(t.split())))
    for s, docs_ in by_src.items():
        cum = 0
        for _, _, i, tok in sorted(docs_, key=lambda x: (-x[0], x[2])):
            cum += tok
            if cum <= cap:
                naive[i] = cum
            else:
                break
    assert dict(zip(got["doc_id"], got["cum_source_tokens"])) == naive


def test_shard_manifest(tmp_path):
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions.scans import shard_manifest

    n = 37
    texts = [("tok " * (i % 5 + 1)).strip() for i in range(n)]
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": texts,
            }
        ),
        tmp_path / "documents.parquet",
    )
    size = 8
    got = shard_manifest(str(tmp_path), shard_size=size).to_pandas()

    MULT, MOD = 11400714819323198485, 1 << 64
    order = sorted(range(n), key=lambda i: (((i + 42) * MULT) % MOD, i))
    naive = {}
    for pos, i in enumerate(order):
        s = pos // size
        d, t = naive.get(s, (0, 0))
        naive[s] = (d + 1, t + len(texts[i].split()))
    assert {
        int(r.shard_id): (int(r.n_docs), int(r.n_tokens))
        for r in got.itertuples()
    } == naive
    assert got["n_docs"].sum() == n


def test_curation_pipeline_end_to_end():
    """Full DAG (gate -> dedup -> per-source cap -> shard) vs a naive
    chained python oracle on a planted corpus."""
    from agentic_doc_ray.functions.curation import curation_pipeline

    sw = ("the", "a")
    def mk(i, extra=""):
        return "the word a " + "token " * (52 + i) + extra

    rows = [
        (1, "s1", mk(0)),
        (2, "s1", mk(0)),      # exact dup of 1
        (3, "s1", mk(5)),
        (4, "s2", mk(2)),
        (5, "s2", mk(9)),
        (6, "s2", "no stopwords here " * 20),  # fails gate
        (7, "s1", mk(1)),
    ]
    docs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[2] for r in rows],
                "source": [r[1] for r in rows],
                "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
            }
        )
    )
    cap, size, seed = 150, 2, 42
    got = curation_pipeline(
        docs, stopwords=sw, cap_tokens=cap, shard_size=size, seed=seed
    ).to_pandas()

    # naive chain
    surv = [(i, s, t) for i, s, t in rows if _gate(t, sw)]
    seen, ded = {}, []
    for i, s, t in surv:
        if t not in seen:
            seen[t] = i
            ded.append((i, s, t))
    kept = []
    by_src = {}
    for i, s, t in ded:
        by_src.setdefault(s, []).append((i, len(t), len(t.split())))
    for s, ds_ in by_src.items():
        cum = 0
        for i, _, tok in sorted(ds_, key=lambda x: (-x[1], x[0])):
            cum += tok
            if cum <= cap:
                kept.append((i, s, tok))
    MULT, MOD = 11400714819323198485, 1 << 64
    order = sorted(kept, key=lambda x: (((x[0] + seed) * MULT) % MOD, x[0]))
    naive = {
        i: (s, tok, pos // size) for pos, (i, s, tok) in enumerate(order)
    }
    assert {
        int(r.doc_id): (r.source, int(r.n_tokens), int(r.shard_id))
        for r in got.itertuples()
    } == naive
    assert 2 not in naive and 6 not in naive  # dup + gate-fail dropped
    assert len(naive) >= 4  # the cap keeps a real subset


def test_domain_scorecard_vs_replica(ray_session):
    """Scorecard sums must equal a direct per-source reduction of the
    flags table, regardless of batch layout."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.curation import domain_scorecard
    from agentic_doc_ray.functions.text import gopher_quality_flags_batch

    t = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "source": ["a", "b", "a", "b", "a", "c", "c", "a"],
            "text": [
                "the a data value " * 20,     # passes (stopwords present)
                "x",                           # too short
                "the a data value " * 20,
                "# # # " * 50,                 # symbol-heavy
                "word " * 60,                  # no stopwords -> fails
                "the a data value " * 20,
                "",                            # empty
                "the a data value " * 9999,   # too long? 4*9999 words pass cap
            ],
        }
    )
    flags = gopher_quality_flags_batch(
        t.select(["doc_id", "text"]), stopwords=("the", "a", "data", "value")
    )
    import collections

    expect = collections.defaultdict(lambda: [0, 0, 0, 0])
    for src, keep, nw, na in zip(
        t.column("source").to_pylist(),
        flags.column("keep").to_pylist(),
        flags.column("n_words").to_pylist(),
        flags.column("n_alpha_words").to_pylist(),
    ):
        e = expect[src]
        e[0] += 1; e[1] += keep; e[2] += nw; e[3] += na
    for parallelism in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parallelism)
        got = {
            r["source"]: [r["n_docs"], r["n_keep"], r["n_words"], r["n_alpha_words"]]
            for r in domain_scorecard(
                ds, stopwords=("the", "a", "data", "value")
            ).take_all()
        }
        assert got == dict(expect)


def test_incremental_curation_equals_full_recompute(ray_session):
    """The O(delta) path must equal curation_keep(v2) exactly through the
    subtle transitions: an edit INTO a kept doc's content dethrones it
    (smaller id wins), an edit AWAY restores the former loser, and a
    removed keeper hands its content to the surviving duplicate."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.curation import (
        curation_keep,
        incremental_curation_keep,
    )

    SW = ("the", "a", "data", "value")
    filler = "the a data value " * 20
    X, Y, Z, W = (filler + t for t in ("X", "Y", "Z", "W"))
    v1_rows = {
        0: filler + "zero",  # will edit INTO Z (dethrones doc 3)
        1: X,                # keeper of X; will edit AWAY to Y
        2: X,                # loser of X; should be restored in v2
        3: Z,                # kept in v1; dethroned in v2 by doc 0
        4: W,                # keeper of W; REMOVED in v2
        5: W,                # loser of W; restored in v2
        6: "too short",      # gate-fails in both
    }
    v2_rows = dict(v1_rows)
    v2_rows[0] = Z
    v2_rows[1] = Y
    del v2_rows[4]
    v2_rows[7] = filler + "brand new"   # added doc

    def ds(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(rows), pa.int64()),
                    "text": pa.array(list(rows.values()), pa.string()),
                }
            )
        ).repartition(3)

    got = sorted(
        (r["doc_id"], r["n_tokens"])
        for r in incremental_curation_keep(
            ds(v1_rows), ds(v2_rows), stopwords=SW
        ).take_all()
    )
    want = sorted(
        (r["doc_id"], r["n_tokens"])
        for r in curation_keep(ds(v2_rows), stopwords=SW).take_all()
    )
    assert got == want
    kept_ids = {d for d, _ in got}
    assert 0 in kept_ids and 3 not in kept_ids   # dethroned by the edit-in
    assert 2 in kept_ids                          # restored by the edit-away
    assert 5 in kept_ids and 4 not in kept_ids    # keeper removal hand-off
    assert 6 not in kept_ids and 7 in kept_ids
