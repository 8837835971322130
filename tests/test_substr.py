"""Exact repeated-substring spans vs the DuckDB substr oracle, plus
constructed-corpus edge cases (no duplication at all, shared-prefix merge,
sub-L docs)."""

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data

from agentic_doc_ray.functions.substr import repeated_substring_spans

SF = "/root/testdata/sf0.001"

ORACLE = """
WITH pos AS (
  SELECT doc_id, i AS pos, substr(text, i, {L}) AS gram
  FROM {tbl}, UNNEST(generate_series(1, length(text) - {Lm1})) AS t(i)
  WHERE length(text) >= {L}
), dup AS (
  SELECT gram FROM pos GROUP BY gram HAVING count(*) > 1
), marked AS (
  SELECT p.doc_id, p.pos FROM pos p JOIN dup d USING (gram)
), grp AS (
  SELECT doc_id, pos,
    CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {Lm1}
    THEN 1 ELSE 0 END AS brk FROM marked
), island AS (
  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
    ROWS UNBOUNDED PRECEDING) AS g FROM grp
)
SELECT doc_id, min(pos) AS span_start, max(pos) + {Lm1} AS span_end
FROM island GROUP BY doc_id, g
"""


def _norm(df):
    return (
        df.sort_values(["doc_id", "span_start"]).reset_index(drop=True)[
            ["doc_id", "span_start", "span_end"]
        ]
    )


def test_matches_oracle_on_corpus():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = _norm(repeated_substring_spans(docs).to_pandas())
    want = _norm(
        duckdb.sql(
            ORACLE.format(
                L=50, Lm1=49, tbl=f"read_parquet('{SF}/documents.parquet')"
            )
        ).df()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _rand_text(seed, n):
    import random
    import string

    return "".join(random.Random(seed).choices(string.ascii_lowercase, k=n))


def test_constructed_cases():
    shared = "x" * 30 + "SHARED-PAYLOAD-" + "y" * 30  # 75 chars > L
    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "A" * 10 + shared + "B" * 10,
            "C" * 25 + shared + "D" * 3,
            "unique-" + _rand_text(7, 200),
            "short",  # < L: contributes nothing
            "",  # empty doc
        ],
    }
    docs = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = _norm(repeated_substring_spans(docs, L=20).to_pandas())
    con = duckdb.connect()
    con.register("tdocs", pa.Table.from_pydict(rows))
    want = _norm(con.sql(ORACLE.format(L=20, Lm1=19, tbl="tdocs")).df())
    assert set(got["doc_id"]) == {1, 2}
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_substring_dup_stats():
    from agentic_doc_ray.functions.substr import substring_dup_stats

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = (
        substring_dup_stats(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH spans AS ({ORACLE.format(L=50, Lm1=49, tbl=f"read_parquet('{SF}/documents.parquet')")}),
        per_doc AS (
          SELECT doc_id, CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_chars
          FROM spans GROUP BY doc_id
        )
        SELECT d.doc_id, COALESCE(p.dup_chars, 0) AS dup_chars,
          length(d.text) AS n_chars,
          COALESCE(p.dup_chars, 0) * 1000 // greatest(length(d.text), 1) AS dup_per_mille
        FROM read_parquet('{SF}/documents.parquet') d LEFT JOIN per_doc p USING (doc_id)
        ORDER BY d.doc_id
        """
    ).df()
    assert (got["dup_chars"] > 0).any()
    pd.testing.assert_frame_equal(
        got[["doc_id", "dup_chars", "n_chars", "dup_per_mille"]],
        want.reset_index(drop=True),
        check_dtype=False,
    )


def test_distributed_route_bit_equal():
    """broadcast_limit=0 forces the hash-range semi-join route (the 100-TB
    path that never collects the candidate set on the driver); it must be
    bit-equal to the broadcast route AND the SQL oracle."""
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = _norm(
        repeated_substring_spans(docs, broadcast_limit=0).to_pandas()
    )
    want = _norm(
        duckdb.sql(
            ORACLE.format(
                L=50, Lm1=49, tbl=f"read_parquet('{SF}/documents.parquet')"
            )
        ).df()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_no_duplication_is_empty():
    rows = {
        "doc_id": [1, 2],
        "text": [_rand_text(1, 120), _rand_text(2, 120).upper()],
    }
    docs = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = repeated_substring_spans(docs, L=30).to_pandas()
    assert len(got) == 0


def test_ngram_novelty_rule_and_short_docs(ray_session):
    """Novelty counts per-doc DISTINCT sampled grams and corpus-unique
    ones; docs shorter than L report (0, 0); batch layout can't matter
    (gram hashes are canonical)."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.substr import ngram_novelty

    shared = "SHARED-GRAM-BLOCK-" * 3            # appears in docs 1 and 2
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                shared + "alpha-unique-tail-one",
                shared + "beta-unique-tail-two!",
                "tiny",                            # < L=8 chars -> (0, 0)
                "completely-different-content-x",
            ],
        }
    )
    # replica of the rule with literal substrings
    L, stride = 8, 4
    grams = {
        d: {
            t.column("text")[i].as_py()[p : p + L]
            for p in range(0, max(len(t.column("text")[i].as_py()) - L + 1, 0), stride)
        }
        for i, d in enumerate([1, 2, 3, 4])
    }
    from collections import Counter

    df = Counter(g for gs in grams.values() for g in gs)
    expect = {
        d: (sum(1 for g in gs if df[g] == 1), len(gs)) for d, gs in grams.items()
    }
    for parallelism in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parallelism)
        got = {
            r["doc_id"]: (r["n_unique"], r["n_grams"])
            for r in ngram_novelty(ds).take_all()
        }
        assert got == expect
    assert expect[3] == (0, 0)
    assert expect[4][0] == expect[4][1] > 0       # fully novel doc


def test_strip_repeated_substrings_rule(ray_session):
    """Every char covered by a corpus-repeated L-gram span is removed;
    clean docs pass through; layout can't matter."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.substr import (
        repeated_substring_spans,
        strip_repeated_substrings,
    )

    block = "Z" * 60                       # repeated 60-char block (L=50)
    texts = [
        "head-" + block + "-tail-one-" + "x" * 40,
        "other-" + block + "-tail-two-" + "y" * 40,
        "completely clean document " + "q" * 40,
        "short",
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})

    # replica: strip the exact spans the span op reports
    spans = {}
    for r in repeated_substring_spans(ray.data.from_arrow(t)).take_all():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    expect = {}
    for i, txt in enumerate(texts):
        keep = bytearray()
        cut = {p for a, b in spans.get(i, []) for p in range(a - 1, b)}
        for p, ch in enumerate(txt.encode()):
            if p not in cut:
                keep.append(ch)
        expect[i] = (keep.decode(), sum(b - a + 1 for a, b in spans.get(i, [])))
    assert expect[0][1] > 0 and expect[1][1] > 0    # the block was cut
    assert expect[2][1] == 0 and expect[3][1] == 0
    assert block not in expect[0][0]
    for parallelism in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parallelism)
        got = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in strip_repeated_substrings(ds).take_all()
        }
        assert got == expect


def test_substring_counts_exact_overlapping():
    """wimbd count probe: overlapping occurrences, per-doc distinct
    counts, absent queries omitted — against the brute-force SQL plan."""
    import duckdb
    import pandas as pd
    import ray.data

    from agentic_doc_ray.functions.substr import substring_counts

    sf = "/root/testdata/sf0.001"
    qs = ["data", "order scan", "aaa-not-present", "a"]
    ds = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(6)
    got = (
        substring_counts(ds, qs).to_pandas().sort_values("query").reset_index(drop=True)
    )
    qvals = ", ".join(f"('{q}')" for q in qs)
    want = duckdb.sql(
        f"""
        WITH q(query) AS (VALUES {qvals}),
        pos AS (
          SELECT d.doc_id, q.query,
                 unnest(range(1, greatest(length(d.text) - length(q.query) + 1, 0) + 1)) AS i
          FROM read_parquet('{sf}/documents.parquet') d CROSS JOIN q
        ), hit AS (
          SELECT p.doc_id, p.query FROM pos p
          JOIN read_parquet('{sf}/documents.parquet') d USING (doc_id)
          WHERE substr(d.text, CAST(p.i AS INTEGER), length(p.query)) = p.query
        )
        SELECT query, CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM hit GROUP BY query ORDER BY query
        """
    ).df()
    assert "aaa-not-present" not in set(got.query_ if hasattr(got, 'query_') else got["query"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_substring_counts_overlap_semantics():
    """'aa' in 'aaaa' counts 3 (all window positions)."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.substr import substring_counts

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["aaaa", "xaax"]})
    )
    got = {r["query"]: r for r in substring_counts(ds, ["aa"]).take_all()}
    assert got["aa"]["n_occurrences"] == 4 and got["aa"]["n_docs"] == 2


def test_source_diversity_planted(ray_session):
    """A template-farm source (one string repeated) shows few types over
    many occurrences; a diverse source shows types ~= occurrences; a
    source of sub-L docs reports (0, 0, 0). Checked against a
    brute-force literal-substring recount."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.substr import source_diversity

    template = "BUY-NOW-CHEAP-DEALS-CLICK-HERE-TODAY!"
    rows = (
        [{"doc_id": i, "text": template, "source": "farm"} for i in range(6)]
        + [
            {"doc_id": 10, "text": "the quick brown fox jumps over dogs", "source": "blog"},
            {"doc_id": 11, "text": "entirely different words appear here", "source": "blog"},
            {"doc_id": 12, "text": "tiny", "source": "short"},
        ]
    )
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()), ("source", pa.string())]
        ),
    )

    def brute(src_rows, L=8, stride=4):
        types, occ = set(), 0
        for r in src_rows:
            txt = r["text"]
            for i in range(0, max(len(txt) - L + 1, 0), stride):
                types.add(txt[i : i + L])
                occ += 1
        return len(types), occ

    for n_blocks in (1, 4):
        got = {
            r["source"]: r
            for r in source_diversity(
                ray.data.from_arrow(t).repartition(n_blocks)
            ).take_all()
        }
        for src in ("farm", "blog", "short"):
            ty, oc = brute([r for r in rows if r["source"] == src])
            assert got[src]["n_gram_types"] == ty, (src, got[src])
            assert got[src]["n_gram_occurrences"] == oc
            want_pm = ty * 1000 // oc if oc else 0
            assert got[src]["types_per_mille"] == want_pm
        # the farm's types collapse to one doc's worth
        assert got["farm"]["n_gram_occurrences"] == 6 * got["farm"]["n_gram_types"]
        assert got["short"]["n_gram_occurrences"] == 0


def test_winnow_fingerprints_match_scalar_oracle():
    """Vectorized sliding-window winnowing == the independent scalar
    replica, bit for bit, over the sf0.001 corpus."""
    import pyarrow.parquet as pq

    from agentic_doc_ray.functions.substr import (
        winnow_fingerprints,
        winnow_oracle,
    )

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    got = (
        winnow_fingerprints(docs, L=8, window=8)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = (
        winnow_oracle(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            L=8,
            window=8,
        )
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_winnow_guarantee_and_density():
    """The winnowing theorem: docs sharing a substring of length >=
    window + L - 1 share a fingerprint; density stays near 2/(w+1)."""
    from agentic_doc_ray.functions.substr import winnow_fingerprints

    L, w = 8, 4
    shared = "the quick brown fox jumps over the lazy dog 0123"
    assert len(shared) >= w + L - 1
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "AAAA " + shared + " BBBB",
                    "xyzzy plugh " + shared + " quux",
                    "completely unrelated content with no overlap at all",
                ],
            }
        )
    )
    fp = winnow_fingerprints(ds, L=L, window=w).to_pandas()
    s1 = set(fp[fp.doc_id == 1].gram_hash)
    s2 = set(fp[fp.doc_id == 2].gram_hash)
    assert s1 & s2, "shared substring must share a fingerprint"
    # density: kept positions per doc ~ 2/(w+1) of gram positions (loose)
    n3 = len(fp[fp.doc_id == 3])
    grams3 = len("completely unrelated content with no overlap at all") - L + 1
    assert 0 < n3 <= grams3


def test_winnow_short_docs_emit_nothing():
    from agentic_doc_ray.functions.substr import winnow_fingerprints

    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": [1, 2], "text": ["tiny", "also small"]}
        )
    )
    out = winnow_fingerprints(ds, L=8, window=8).to_pandas()
    assert len(out) == 0
