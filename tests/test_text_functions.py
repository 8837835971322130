"""Text-analysis operators vs DuckDB oracles on the real testdata."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from agentic_doc_ray.functions import text as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _duck(sql):
    return duckdb.sql(sql.replace("documents", f"read_parquet('{SF}/documents.parquet')")).df()


def test_token_counts_match_sql(docs_ds):
    got = T.token_counts(docs_ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _duck(
        """
        SELECT doc_id,
               CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
                    ELSE len(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_tokens
        FROM documents ORDER BY doc_id
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_text_stats_match_sql(docs_ds):
    got = T.text_stats(docs_ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _duck(
        """
        SELECT doc_id,
               length(text) AS n_chars,
               CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
                    ELSE len(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_tokens,
               len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
               len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
               len(regexp_extract_all(text, '[0-9]')) AS n_digit,
               len(regexp_extract_all(text, '[.!?,;:]')) * 1000
                   // greatest(length(text), 1) AS punct_per_mille
        FROM documents ORDER BY doc_id
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lang_id_known_strings():
    t = pa.Table.from_pydict(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the cat and the dog went to the house of a friend",
                "der hund und die katze ist ein tier und das ist gut",
                "el perro y la casa que es una cosa por la noche",
            ],
        }
    )
    out = T.lang_id(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["en", "de", "es"]


def test_lang_id_deterministic(docs_ds):
    a = T.lang_id(docs_ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = T.lang_id(docs_ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_fingerprint_order_sensitive_and_deterministic():
    t = pa.Table.from_pydict(
        {"doc_id": [1, 2, 3], "text": ["a b c", "c b a", "a b c"]}
    )
    out = T.fingerprints(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    fps = out["fingerprint"].tolist()
    assert fps[0] == fps[2]  # same text, same fingerprint
    assert fps[0] != fps[1]  # order matters


def test_top_bigrams_match_sql(docs_ds):
    got = (
        T.top_bigrams(docs_ds, k=50)
        .to_pandas()
        .sort_values(["n", "bigram"], ascending=[False, True])
        .reset_index(drop=True)
    )
    want = _duck(
        """
        WITH toks AS (
          SELECT regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS t
          FROM documents
          WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        )
        SELECT bigram, count(*) AS n FROM (
          SELECT t[i] || ' ' || t[i+1] AS bigram
          FROM toks, UNNEST(generate_series(1, len(t)-1)) AS r(i)
          WHERE len(t) >= 2
        ) GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pmi_collocations_match_sql(docs_ds):
    got = (
        T.pmi_collocations(docs_ds, min_count=3, k=50)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    want = (
        _duck(
            """
        WITH toks AS (
          SELECT regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS t
          FROM documents
          WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        ), uni AS (
          SELECT token, count(*) AS c FROM (SELECT unnest(t) AS token FROM toks) GROUP BY 1
        ), bi AS (
          SELECT w1, w2, count(*) AS c12 FROM (
            SELECT t[i] AS w1, t[i+1] AS w2
            FROM toks, UNNEST(generate_series(1, len(t)-1)) AS r(i) WHERE len(t) >= 2
          ) GROUP BY 1, 2
        ), tot AS (SELECT (SELECT sum(c) FROM uni) AS n, (SELECT sum(c12) FROM bi) AS b)
        SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
          (CAST(b.c12 AS DOUBLE) * CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)) /
          (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE) * CAST(t.b AS DOUBLE)) AS score
        FROM bi b CROSS JOIN tot t
        JOIN uni u1 ON u1.token = b.w1
        JOIN uni u2 ON u2.token = b.w2
        WHERE b.c12 >= 3
        ORDER BY score DESC, w1, w2 LIMIT 50
        """
        )
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    # exact: integer counts AND the pinned-association double score
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_distinctive_terms_match_sql():
    d = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    got = (
        T.distinctive_terms(d, k=5, min_tf=2)
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    want = (
        _duck(
            """
        WITH toks AS (
          SELECT source, unnest(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
          FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        ), st AS (SELECT source, token, count(*) AS tf_s FROM toks GROUP BY 1, 2),
        tg AS (SELECT token, count(*) AS tf_g FROM toks GROUP BY 1),
        ns AS (SELECT source, count(*) AS n_s FROM toks GROUP BY 1),
        tot AS (SELECT count(*) AS n FROM toks),
        scored AS (
          SELECT st.source, st.token, st.tf_s, tg.tf_g,
                 (st.tf_s * t.n) // (tg.tf_g * ns.n_s) AS lift
          FROM st JOIN tg USING (token) JOIN ns USING (source) CROSS JOIN tot t
          WHERE st.tf_s >= 2
        )
        SELECT source, token, tf_s, tf_g, lift, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY lift DESC, token) AS BIGINT) AS rank
          FROM scored
        ) WHERE rank <= 5 ORDER BY source, rank
        """
        )
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_vocab_growth_match_sql(docs_ds):
    got = T.vocab_growth(docs_ds).to_pandas()
    want = _duck(
        """
        WITH b AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
        ck AS (SELECT k, mn - 1 + ((mx - mn + 1) * k) // 10 AS hi
               FROM b, UNNEST(generate_series(1, 10)) AS t(k)),
        toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
          FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        ), firstocc AS (SELECT token, min(doc_id) AS fd FROM toks GROUP BY 1)
        SELECT k AS checkpoint, hi AS doc_id_hi,
          (SELECT count(*) FROM documents d WHERE d.doc_id <= ck.hi) AS n_docs,
          (SELECT count(*) FROM toks t WHERE t.doc_id <= ck.hi) AS n_tokens,
          (SELECT count(*) FROM firstocc f WHERE f.fd <= ck.hi) AS vocab_size
        FROM ck ORDER BY k
        """
    )
    assert got["vocab_size"].is_monotonic_increasing
    assert got["n_tokens"].iloc[-1] > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_fingerprint_vectorized_matches_scalar_horner():
    # The vectorized Σ crc32(tok)·B^e mod M must equal the sequential
    # Horner fold it replaced, including empty/whitespace-only docs.
    import zlib

    def scalar_fp(t):
        MOD = (1 << 61) - 1
        h = 0
        for tok in (t or "").split():
            h = (h * 1_000_003 + zlib.crc32(tok.encode())) % MOD
        return h

    texts = ["a b c", "", "   ", "single", "tok " * 300, "\t\n a  b \n", "a"]
    t = pa.Table.from_pydict({"doc_id": list(range(len(texts))), "text": texts})
    from agentic_doc_ray.functions.text import fingerprint_batch

    got = fingerprint_batch(t).column("fingerprint").to_pylist()
    assert got == [scalar_fp(x) for x in texts]


def test_repetition_stats_planted_duplicates():
    import pyarrow as pa

    from agentic_doc_ray.functions.text import repetition_stats_batch

    t = pa.Table.from_pydict(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a\nb\nc",             # no dups
                "x\nx\nx\ny",          # 3 dup lines of 4
                "",                      # empty -> zeros
                "p\n\n\np\nq",         # empty lines ignored; p duplicated
            ],
        }
    )
    out = {r["doc_id"]: r for r in repetition_stats_batch(t).to_pylist()}
    assert out[1] == {"doc_id": 1, "n_lines": 3, "n_dup_lines": 0, "dup_line_per_mille": 0}
    assert out[2] == {"doc_id": 2, "n_lines": 4, "n_dup_lines": 3, "dup_line_per_mille": 750}
    assert out[3] == {"doc_id": 3, "n_lines": 0, "n_dup_lines": 0, "dup_line_per_mille": 0}
    assert out[4] == {"doc_id": 4, "n_lines": 3, "n_dup_lines": 2, "dup_line_per_mille": 666}


def test_redact_pii_patterns():
    from agentic_doc_ray.functions.text import redact_pii_batch

    t = pa.Table.from_pydict(
        {
            "doc_id": [1, 2],
            "text": [
                "mail a.b+c@ex-ample.co.uk, call (212) 555-1234 or 555-123-4567, "
                "ssn 123-45-6789, ip 10.0.0.255 done",
                "no pii here at all",
            ],
        }
    )
    out = redact_pii_batch(t).to_pylist()
    r = out[0]
    assert "<EMAIL>" in r["text"] and "<PHONE>" in r["text"]
    assert "<SSN>" in r["text"] and "<IP>" in r["text"]
    assert "a.b+c@" not in r["text"] and "123-45-6789" not in r["text"]
    assert r["n_pii"] == 5
    assert out[1]["text"] == "no pii here at all" and out[1]["n_pii"] == 0


def test_token_commonness_matches_sql(docs_ds):
    got = (
        T.token_commonness(docs_ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _duck(
        """
        WITH tv AS (
          SELECT doc_id, unnest(regexp_split_to_array(
            regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
          FROM documents
          WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        ), vocab AS (SELECT token, count(*) AS cnt FROM tv GROUP BY token),
        scored AS (
          SELECT t.doc_id, CAST(sum(v.cnt) AS BIGINT) AS freq_sum,
                 count(*) AS n_tokens
          FROM tv t JOIN vocab v USING (token) GROUP BY t.doc_id)
        SELECT d.doc_id, coalesce(s.freq_sum, 0) AS freq_sum,
               coalesce(s.n_tokens, 0) AS n_tokens
        FROM documents d LEFT JOIN scored s USING (doc_id) ORDER BY doc_id
        """
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_token_commonness_edge_cases_and_vocab_cap():
    # empty / whitespace-only docs score (0, 0); the vocabulary cap keeps
    # the most frequent tokens and out-of-cap tokens score 0 (logged)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a a a b", "", "   \t\n", "a rare"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    full = {
        r["doc_id"]: (r["freq_sum"], r["n_tokens"])
        for r in T.token_commonness(ds).take_all()
    }
    # counts: a=4, b=1, rare=1
    assert full == {1: (4 + 4 + 4 + 1, 4), 2: (0, 0), 3: (0, 0), 4: (4 + 1, 2)}
    capped = {
        r["doc_id"]: (r["freq_sum"], r["n_tokens"])
        for r in T.token_commonness(ds, max_vocab=1).take_all()
    }
    # only 'a' stays in vocab; b/rare -> OOV score 0, n_tokens unchanged
    assert capped == {1: (12, 4), 2: (0, 0), 3: (0, 0), 4: (4, 2)}


def test_normalize_text_composes_lowers_and_collapses():
    # composed and decomposed spellings of the same word converge to one
    # byte sequence (NFC), case and whitespace runs are canonicalized
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["  Café  DELUXE\t", "Café deluxe", "plain   ascii "],
                pa.string(),
            ),
        }
    )
    got = {
        r["doc_id"]: r["text"]
        for r in T.normalize_text(ray.data.from_arrow(t)).take_all()
    }
    assert got[1] == got[2] == "café deluxe"
    assert got[3] == "plain ascii"


def test_chunk_windows_matches_replica():
    """Vectorized windowing == per-doc Python replica on edge-case docs:
    empty, whitespace-only, single token, exactly-window, window+1, long,
    and runs of mixed whitespace separators."""
    import pyarrow as pa

    from agentic_doc_ray.functions.text import chunk_windows_batch

    rows = [
        (1, "a b c d e f g h i j"),
        (2, ""),
        (3, " \t \n "),
        (4, "one"),
        (5, "  x\t\ty  z\n w  "),
        (6, " ".join(f"t{i}" for i in range(7))),
        (7, " ".join(f"u{i}" for i in range(8))),
        (8, " ".join(f"v{i}" for i in range(23))),
    ]

    def replica(window, stride):
        out = []
        for did, text in rows:
            toks = text.split()
            n = len(toks)
            if n == 0:
                continue
            nc = 1 if n <= window else 1 + -(-(n - window) // stride)
            for k in range(nc):
                s, e = k * stride, min(k * stride + window, n)
                out.append((did, k, s, e, e - s, " ".join(toks[s:e])))
        return out

    t = pa.table(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )
    for w, s in [(7, 5), (3, 3), (4, 2), (64, 48)]:
        got = [
            tuple(r.values())
            for r in chunk_windows_batch(t, window=w, stride=s).to_pylist()
        ]
        assert got == replica(w, s), (w, s)


def test_chunk_windows_all_empty_batch_keeps_schema():
    import pyarrow as pa

    from agentic_doc_ray.functions.text import chunk_windows_batch

    t = pa.table({"doc_id": pa.array([9], pa.int64()), "text": [""]})
    out = chunk_windows_batch(t)
    assert out.num_rows == 0
    assert out.schema.names == [
        "doc_id", "chunk_idx", "start_tok", "end_tok", "n_tokens", "chunk_text",
    ]


def test_bigram_lm_distributed_matches_replica():
    """Distributed two-exchange bigram LM == single-process replica, bit
    for bit, on edge cases: empty doc, whitespace-only, single token,
    repeated text (nll=0: every bigram deterministic given its first
    token there), and the sum is batching-independent (2-row blocks)."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import bigram_lm_oracle, bigram_lm_score

    rows = [
        (1, "the cat sat on the mat"),
        (2, ""),
        (3, "   \t "),
        (4, "one"),
        (5, "a b a b a b"),
        (6, "the cat sat on the hat"),
        (7, "x y"),
        (8, "x y"),
    ]
    t = pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    want = bigram_lm_oracle(t).to_pylist()

    ds = ray.data.from_arrow(t).repartition(4)
    got = sorted(bigram_lm_score(ds).take_all(), key=lambda r: r["doc_id"])
    assert got == sorted(want, key=lambda r: r["doc_id"])

    by_id = {r["doc_id"]: r for r in got}
    assert by_id[2]["n_bigrams"] == 0 and by_id[2]["nll_micro"] == 0
    assert by_id[4]["n_bigrams"] == 0
    # docs 7/8 are identical 2-token docs: "x y" is the only x-bigram in
    # the corpus, so p(y|x)=1 and nll is exactly 0
    assert by_id[7]["nll_micro"] == 0 and by_id[8]["nll_micro"] == 0
    # every bigram is in-vocab without a cap
    assert all(r["n_scored"] == r["n_bigrams"] for r in got)
    # "the"->{cat: 2/4? no: the cat x2, the mat, the hat} gives doc 1 a
    # strictly positive nll
    assert by_id[1]["nll_micro"] > 0


def test_bigram_lm_vocab_cap_counts_oov():
    """With max_vocab=1 the cap keeps only the most frequent bigram /
    first-token; out-of-cap bigrams are counted as OOV, never scored —
    and the replica applies the identical cap rule."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import bigram_lm_oracle, bigram_lm_score

    t = pa.table(
        {"doc_id": [1, 2], "text": ["a b a b a b", "c d"]}
    )
    want = bigram_lm_oracle(t, max_vocab=1).to_pylist()
    got = sorted(
        bigram_lm_score(ray.data.from_arrow(t), max_vocab=1).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert got == sorted(want, key=lambda r: r["doc_id"])
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[2]["n_bigrams"] == 1 and by_id[2]["n_scored"] == 0
    assert by_id[1]["n_scored"] < by_id[1]["n_bigrams"]


def test_domain_prior_matches_duckdb():
    """Distributed domain stats == SQL group/count-distinct, including a
    domain whose docs are all copies (src_n_distinct=1) and a null-free
    unique domain; annotation covers every row."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import domain_prior

    t = pa.table(
        {
            "doc_id": list(range(1, 8)),
            "text": ["dup", "dup", "dup", "u1", "u2", "", ""],
            "source": ["spam.com", "spam.com", "spam.com",
                       "good.org", "good.org", "empty.net", "empty.net"],
        }
    )
    got = (
        domain_prior(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
        WITH s AS (
          SELECT source, count(*) AS src_n_docs,
                 count(DISTINCT md5(text)) AS src_n_distinct
          FROM t GROUP BY source
        )
        SELECT d.doc_id, d.source, s.src_n_docs, s.src_n_distinct
        FROM t d JOIN s USING (source) ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, check_exact=True,
    )
    assert got.loc[got["source"] == "spam.com", "src_n_distinct"].iloc[0] == 1
    assert got.loc[got["source"] == "empty.net", "src_n_distinct"].iloc[0] == 1


def test_compression_stats_signal_and_batching():
    """Repetitive text compresses far better than high-entropy text (the
    signal a Gopher-style filter cuts on); batch-local op is trivially
    batching-independent; empty text handled."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import (
        compression_stats,
        compression_stats_batch,
    )

    import random

    rng = random.Random(7)
    noisy = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(600))
    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["spam spam spam " * 40, noisy, ""],
        }
    )
    want = compression_stats_batch(t).to_pylist()
    got = sorted(
        compression_stats(ray.data.from_arrow(t).repartition(3)).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert got == want
    by_id = {r["doc_id"]: r for r in got}
    # same length, wildly different compressibility
    assert by_id[1]["n_bytes"] == 600 and by_id[2]["n_bytes"] == 600
    assert by_id[1]["n_compressed"] * 5 < by_id[2]["n_compressed"]
    assert by_id[3]["n_bytes"] == 0


def test_split_sentences_matches_duckdb():
    """Vectorized sentence split == DuckDB zipped-unnest oracle on edge
    cases: multi-terminator runs, abbreviation dots, trailing terminator,
    empty/whitespace docs, no-terminator doc."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import split_sentences

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "Hello world. How are you?  Fine! Done",
                "No punct here",
                "",
                "  \t ",
                "A.B. test. x",
                "Multi... dots?! yes.  End with bang!  ",
            ],
        }
    )
    got = (
        split_sentences(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values(["doc_id", "sent_idx"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        r"""
        WITH segs AS (
          SELECT doc_id,
            unnest(regexp_split_to_array(text, '[.!?]+\s+|[.!?]+$')) AS seg,
            unnest(generate_series(1, len(regexp_split_to_array(
              text, '[.!?]+\s+|[.!?]+$')))) AS i
          FROM t
        ), kept AS (
          SELECT doc_id,
            regexp_replace(seg, '^\s+|\s+$', '', 'g') AS sentence, i
          FROM segs
          WHERE regexp_replace(seg, '^\s+|\s+$', '', 'g') <> ''
        )
        SELECT doc_id, CAST(row_number() OVER (
          PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT) AS sent_idx,
        sentence FROM kept ORDER BY doc_id, sent_idx
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, check_exact=True,
    )
    assert list(got.loc[got["doc_id"] == 5, "sentence"]) == ["A.B", "test", "x"]
    assert 3 not in set(got["doc_id"]) and 4 not in set(got["doc_id"])


_GOPHER_ORACLE_SQL = r"""
WITH base AS (
  SELECT doc_id, text, regexp_replace(text, '^\s+|\s+$', '', 'g') AS trimmed FROM documents
), words AS (
  SELECT doc_id, unnest(regexp_split_to_array(trimmed, '\s+')) AS w FROM base WHERE trimmed <> ''
), wstats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(length(w)) AS BIGINT) AS word_len_sum,
         CAST(sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha_words,
         CAST(count(DISTINCT CASE WHEN lower(w) IN ('the','be','to','of','and','that','have','with') THEN lower(w) END) AS BIGINT) AS n_stopwords
  FROM words GROUP BY doc_id
), lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM base
), lstats AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN line <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN line <> '' AND (line LIKE '-%' OR line LIKE '•%') THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet_lines,
         CAST(sum(CASE WHEN line <> '' AND line LIKE '%...' THEN 1 ELSE 0 END) AS BIGINT) AS n_ellipsis_lines
  FROM lines GROUP BY doc_id
), syms AS (
  SELECT doc_id,
         CAST((length(text) - length(replace(text, '#', ''))) +
              (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_sym
  FROM base
)
SELECT b.doc_id,
  coalesce(w.n_words, 0) AS n_words,
  coalesce(w.word_len_sum, 0) AS word_len_sum,
  coalesce(w.n_alpha_words, 0) AS n_alpha_words,
  coalesce(w.n_stopwords, 0) AS n_stopwords,
  s.n_sym,
  coalesce(l.n_lines, 0) AS n_lines,
  coalesce(l.n_bullet_lines, 0) AS n_bullet_lines,
  coalesce(l.n_ellipsis_lines, 0) AS n_ellipsis_lines,
  CAST(coalesce(w.n_words,0) BETWEEN 50 AND 100000 AS BIGINT) AS flag_word_count,
  CAST(coalesce(w.n_words,0) > 0 AND 3*coalesce(w.n_words,0) <= coalesce(w.word_len_sum,0) AND coalesce(w.word_len_sum,0) <= 10*coalesce(w.n_words,0) AS BIGINT) AS flag_mean_word_len,
  CAST(10*s.n_sym <= coalesce(w.n_words,0) AS BIGINT) AS flag_symbol_ratio,
  CAST(10*coalesce(l.n_bullet_lines,0) <= 9*coalesce(l.n_lines,0) AS BIGINT) AS flag_bullet_lines,
  CAST(10*coalesce(l.n_ellipsis_lines,0) <= 3*coalesce(l.n_lines,0) AS BIGINT) AS flag_ellipsis_lines,
  CAST(coalesce(w.n_words,0) > 0 AND 5*coalesce(w.n_alpha_words,0) >= 4*coalesce(w.n_words,0) AS BIGINT) AS flag_alpha_words,
  CAST(coalesce(w.n_stopwords,0) >= 2 AS BIGINT) AS flag_stopwords,
  CAST(coalesce(w.n_words,0) BETWEEN 50 AND 100000
   AND coalesce(w.n_words,0) > 0 AND 3*coalesce(w.n_words,0) <= coalesce(w.word_len_sum,0) AND coalesce(w.word_len_sum,0) <= 10*coalesce(w.n_words,0)
   AND 10*s.n_sym <= coalesce(w.n_words,0)
   AND 10*coalesce(l.n_bullet_lines,0) <= 9*coalesce(l.n_lines,0)
   AND 10*coalesce(l.n_ellipsis_lines,0) <= 3*coalesce(l.n_lines,0)
   AND 5*coalesce(w.n_alpha_words,0) >= 4*coalesce(w.n_words,0)
   AND coalesce(w.n_stopwords,0) >= 2 AS BIGINT) AS keep
FROM base b
LEFT JOIN wstats w USING (doc_id)
LEFT JOIN lstats l USING (doc_id)
JOIN syms s USING (doc_id)
ORDER BY doc_id
"""


def _gopher_adversarial_table():
    """One doc per rule, each engineered to FAIL exactly that rule (plus a
    passing doc and degenerate empties), so every flag is exercised in
    both polarities — the synth corpus is single-line and symbol-free."""
    good_words = ("the quick brown fox jumps over the lazy dog and that "
                  "one has to be of sound mind with every word here ") * 3
    docs = [
        good_words,  # passes everything
        "the be to of",  # < 50 words
        " ".join(["ab"] * 60),  # mean word len < 3 (and no stopwords)
        ("the be " + "# " * 20 + "word " * 50),  # symbol ratio > 0.1
        "\n".join(["- bullet %d the be" % i for i in range(10)]),  # 100% bullets
        "\n".join(["trailing the be %d..." % i for i in range(10)]),  # 100% ellipsis
        ("the be " + "1234 " * 60),  # alpha fraction < 0.8
        " ".join(["word%d" % i for i in range(60)]),  # 0 stopwords
        "",  # empty doc
        "   \n  ",  # whitespace-only
        "•the be\nplain line the of and that have with " + "pad " * 50,
    ]
    return pa.table({"doc_id": list(range(len(docs))), "text": docs})


def test_gopher_flags_adversarial_vs_duckdb():
    t = _gopher_adversarial_table()
    got = (
        T.gopher_quality_flags_batch(t)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(_GOPHER_ORACLE_SQL).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # each engineered failure hits its intended rule
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "keep"] == 1
    assert by_id.loc[1, "flag_word_count"] == 0
    assert by_id.loc[2, "flag_mean_word_len"] == 0
    assert by_id.loc[3, "flag_symbol_ratio"] == 0
    assert by_id.loc[4, "flag_bullet_lines"] == 0
    assert by_id.loc[5, "flag_ellipsis_lines"] == 0
    assert by_id.loc[6, "flag_alpha_words"] == 0
    assert by_id.loc[7, "flag_stopwords"] == 0
    assert (by_id.loc[[1, 2, 3, 4, 5, 6, 7, 8, 9], "keep"] == 0).all()
    # unicode bullet counts toward the bullet-line tally (1 of 2 lines,
    # under the 90% threshold so the flag itself still passes)
    assert by_id.loc[10, "n_bullet_lines"] == 1
    assert by_id.loc[10, "flag_bullet_lines"] == 1


def test_gopher_flags_batching_independent():
    t = _gopher_adversarial_table()
    whole = T.gopher_quality_flags_batch(t).sort_by("doc_id")
    parts = pa.concat_tables(
        [T.gopher_quality_flags_batch(t.slice(i, 3)) for i in range(0, t.num_rows, 3)]
    ).sort_by("doc_id")
    assert whole.equals(parts)


def test_gopher_flags_real_docs_vs_duckdb(docs_ds):
    got = (
        T.gopher_quality_flags(docs_ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _duck(_GOPHER_ORACLE_SQL)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_dedup_lines_rule_and_block_independence():
    """Intra-doc line dedup: first occurrence of each non-empty line
    survives, empty lines always survive, docs rebuilt in order — and the
    result is identical under any batch layout (the op is doc-local)."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import dedup_lines

    texts = [
        "a\nb\na\n\nb\n\nc",   # dups of a and b removed, empties kept
        "",                      # single empty line -> unchanged
        "x\nx\nx",              # two repeats removed
        "only",                 # no newline -> unchanged
        "\n\n",                  # all-empty lines -> unchanged
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    expect = {
        0: ("a\nb\n\n\nc", 2),
        1: ("", 0),
        2: ("x", 2),
        3: ("only", 0),
        4: ("\n\n", 0),
    }
    for parallelism in (1, 5):
        ds = ray.data.from_arrow(t).repartition(parallelism)
        got = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in dedup_lines(ds).take_all()
        }
        assert got == expect


def test_source_divergence_distributed_matches_replica():
    """Distributed per-source KL == single-process replica bit for bit,
    including edge cases (empty doc, whitespace-only source, one-token
    source, a source identical to the corpus mix scoring near zero on
    shared tokens), batching-independent (repartition 5)."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import (
        source_divergence,
        source_divergence_oracle,
    )

    rows = [
        (1, "the cat sat on the mat", "a"),
        (2, "", "a"),
        (3, "dogs chase cats daily", "b"),
        (4, "the cat sat on the hat", "b"),
        (5, "   \t ", "c"),
        (6, "one", "d"),
        (7, "the the the the", "e"),
    ]
    t = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "source": [r[2] for r in rows],
        }
    )
    want = sorted(source_divergence_oracle(t).to_pylist(), key=lambda r: r["source"])
    ds = ray.data.from_arrow(t).repartition(5)
    got = sorted(source_divergence(ds).take_all(), key=lambda r: r["source"])
    assert got == want
    by = {r["source"]: r for r in got}
    # whitespace-only source contributes no tokens: NO row (both sides)
    assert "c" not in by
    # single-token source diverges hard from the corpus distribution
    assert by["d"]["n_tokens"] == 1 and by["d"]["kl_micro"] > 0


def test_source_divergence_vocab_cap_logged():
    """Out-of-cap tokens are EXCLUDED from both sides (not silently
    zeroed): with max_vocab=2 only the 2 most frequent tokens count."""
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import (
        source_divergence,
        source_divergence_oracle,
    )

    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["a a a b b rare1 rare2", "a b b"],
            "source": ["s1", "s2"],
        }
    )
    want = sorted(
        source_divergence_oracle(t, max_vocab=2).to_pylist(),
        key=lambda r: r["source"],
    )
    got = sorted(
        source_divergence(ray.data.from_arrow(t).repartition(2), max_vocab=2)
        .take_all(),
        key=lambda r: r["source"],
    )
    assert got == want
    by = {r["source"]: r for r in got}
    assert by["s1"]["n_tokens"] == 5  # rare1/rare2 excluded by the cap


def test_keyword_tag_counts_vs_sql(docs_ds):
    """Dictionary tagging: non-overlapping counts in long format must
    equal the SQL replace-shrinkage oracle; the never-matching probe
    keyword must emit no rows."""
    got = (
        T.keyword_tag_counts(docs_ds)
        .to_pandas()
        .sort_values(["doc_id", "keyword"])
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT d.doc_id, k.kw AS keyword,
               CAST((length(d.text) - length(replace(d.text, k.kw, ''))) // length(k.kw) AS BIGINT) AS n
        FROM documents d
        CROSS JOIN (VALUES ('table'), ('hash'), ('merge'), ('window'),
                    ('fast table'), ('quantum')) k(kw)
        WHERE length(d.text) - length(replace(d.text, k.kw, '')) > 0
        ORDER BY d.doc_id, keyword
        """
    )
    assert len(got) > 0
    assert "quantum" not in set(got["keyword"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_keyword_tag_counts_overlap_and_phrase():
    """Hand-pinned counts: phrase matching, adjacency, and the
    left-to-right non-overlapping rule."""
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "fast table fast table hash",
                        "tabletable table",
                        "no match here",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    got = {
        (r["doc_id"], r["keyword"]): r["n"]
        for r in T.keyword_tag_counts(
            ds, keywords=("table", "hash", "fast table")
        ).take_all()
    }
    assert got[(1, "fast table")] == 2
    assert got[(1, "table")] == 2
    assert got[(1, "hash")] == 1
    assert got[(2, "table")] == 3
    assert (3, "table") not in got


def test_c4_quality_flags_edge_cases():
    """C4 rules on hostile inputs: empty doc, whitespace-only lines,
    quote-terminated line, mixed-case javascript, brace + lorem overlap."""
    import pyarrow as pa

    from agentic_doc_ray.functions.text import (
        c4_clean_batch,
        c4_quality_flags_batch,
    )

    batch = pa.Table.from_pydict(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "",
                    "   \n\t\n  ",
                    'He said "hello there my good friend."\n'
                    "Second proper sentence with enough words.\n"
                    "Third one also has sufficient words here.",
                    "Enable JavaScript to see all this content now.\n"
                    "short.\nno terminal punct line with many words",
                    "lorem IPSUM inside { braces }.\n"
                    "A full sentence with enough words one.\n"
                    "A full sentence with enough words two.\n"
                    "A full sentence with enough words three.",
                ],
                pa.string(),
            ),
        }
    )
    out = c4_quality_flags_batch(batch).to_pydict()
    assert out["n_lines"] == [1, 3, 3, 3, 4]
    # doc 2: all three lines kept (quote counts as terminal punct);
    # doc 4: the lorem line itself passes the LINE filter (6 words,
    # terminal period) — it's the doc-level gate that rejects the doc
    assert out["n_kept_lines"] == [0, 0, 3, 0, 4]
    # doc 3: the javascript line is excluded even though it would pass
    assert out["n_js_lines"] == [0, 0, 0, 1, 0]
    assert out["has_lorem_ipsum"] == [0, 0, 0, 0, 1]
    assert out["has_code_brace"] == [0, 0, 0, 0, 1]
    # doc 2 keeps (3 sentences: ". ." + quote line has 2 periods)
    assert out["n_sentences"][2] >= 3
    assert out["keep"] == [0, 0, 1, 0, 0]

    cleaned = c4_clean_batch(batch).to_pydict()
    assert cleaned["doc_id"] == [2]
    assert cleaned["text"][0].count("\n") == 2  # three kept lines rejoined


def test_mink_prob_matches_replica_and_bounds():
    """Min-K%: distributed == single-process replica bit-for-bit across
    an adversarial repartition, and the selected mean NLL (mean of the
    WORST k% bigrams) never falls below the doc's overall mean NLL."""
    import pyarrow.parquet as pq
    import ray.data

    from agentic_doc_ray.functions.text import (
        bigram_lm_oracle,
        mink_prob_oracle,
        mink_prob_score,
    )

    sf = "/root/testdata/sf0.001"
    d = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    got = (
        mink_prob_score(d.repartition(9))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = mink_prob_oracle(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=True)

    lm = bigram_lm_oracle(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    both = want.merge(lm, on="doc_id")
    sel = both[both["k_sel"] > 0]
    assert len(sel) > 100
    assert (
        sel["mink_mean_micro"] >= sel["nll_micro"] // sel["n_scored_y"]
    ).all()
    # k_sel is ceil(20% of n_scored)
    assert (sel["k_sel"] == -(-sel["n_scored_x"] * 20 // 100)).all()


def test_code_quality_flags_planted():
    """Each BigCode rule binds on a planted doc: a minified blob (long
    line), a data table (long mean line), symbol soup (low alnum), and a
    clean passage that passes everything."""
    texts = [
        "x" * 1500,                               # one 1500-char line
        ("y" * 150 + "\n") * 4 + "y" * 150,       # 5 lines, mean 150
        "(((***)))\n[[[///]]]",                   # alnum fraction 0
        "def f(x):\n    return x + 1\n",          # clean
        "",                                       # empty: all-zero stats
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(5), pa.int64()), "text": texts}
        )
    )
    got = (
        T.code_quality_flags(ds)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0, "flag_max_line"] == 0 and got.loc[0, "max_line_len"] == 1500
    assert got.loc[1, "flag_mean_line"] == 0 and got.loc[1, "flag_max_line"] == 1
    assert got.loc[2, "flag_alnum"] == 0 and got.loc[2, "n_alnum"] == 0
    assert got.loc[3, "keep"] == 1
    # empty text: one zero-length line, alnum flag fails (nonempty rule)
    assert got.loc[4, "n_lines"] == 1 and got.loc[4, "keep"] == 0
    assert got.loc[3, "n_lines"] == 3  # trailing newline -> empty 3rd part
    assert (got["keep"] == (
        got["flag_max_line"] & got["flag_mean_line"] & got["flag_alnum"]
    )).all()


def test_cooccurrence_counts_planted():
    """Window semantics on a tiny corpus: pairs within +/-2, canonical
    order, self-pairs excluded, counts summed across docs."""
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": ["b a b", "a c a"],
            }
        )
    )
    got = {
        (r["tok_a"], r["tok_b"]): r["n"]
        for r in T.cooccurrence_counts(ds, window=2, k=100).take_all()
    }
    # doc0: offsets1 (b,a),(a,b); offset2 (b,b) self -> drop => ab:2
    # doc1: offsets1 (a,c),(c,a); offset2 (a,a) self -> drop => ac:2
    assert got == {("a", "b"): 2, ("a", "c"): 2}


def test_source_vocab_overlap_planted():
    """Three planted sources with known vocab sets: exact intersection /
    union counts and floor per-mille Jaccard; zero-overlap pair omitted."""
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "source": ["s1", "s1", "s2", "s3"],
                "text": [
                    "a b c",
                    "c d",            # s1 vocab {a,b,c,d}
                    "c d e",          # s2 vocab {c,d,e}
                    "zzz",            # s3 vocab {zzz} — disjoint
                ],
            }
        )
    ).repartition(2)
    got = {
        (r["source_a"], r["source_b"]): r
        for r in T.source_vocab_overlap(ds).take_all()
    }
    assert set(got) == {("s1", "s2")}
    r = got[("s1", "s2")]
    assert r["n_a"] == 4 and r["n_b"] == 3 and r["n_common"] == 2
    assert r["jaccard_per_mille"] == 1000 * 2 // 5


def test_mixed_lang_flags_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import (
        mixed_lang_flags,
        mixed_lang_flags_batch,
    )

    en = "the cat and the dog are in the house with a ball"
    de = "der Hund und die Katze sind nicht in das Haus mit einem Ball"
    t = pa.table(
        {
            "doc_id": pa.array(["mixed", "pure", "empty"], pa.string()),
            "text": pa.array([en + " " + de, en + " " + en, ""], pa.string()),
        }
    )
    got = (
        mixed_lang_flags(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        mixed_lang_flags_batch(t)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()
    by = got.set_index("doc_id")
    assert bool(by.loc["mixed", "mixed"]) is True
    assert bool(by.loc["pure", "mixed"]) is False
    assert bool(by.loc["empty", "mixed"]) is False


def test_script_ratios_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import script_ratios

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["ab1 2c!", "", "日本語 text"],
        }
    )
    got = (
        script_ratios(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # "ab1 2c!": 7 chars, 3 alpha, 2 digit, 1 space, 1 other
    assert got.loc[1].tolist() == [7, 3, 2, 1, 1, 1000 * 3 // 7]
    assert got.loc[2].tolist() == [0, 0, 0, 0, 0, 0]
    # "日本語 text": 8 chars, 4 alpha, 0 digit, 1 space, 3 other
    assert got.loc[3].tolist() == [8, 4, 0, 1, 3, 1000 * 4 // 8]


def test_lang_pivot_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import lang_pivot

    t = pa.table(
        {
            "source": ["a", "a", "a", "b"],
            "lang": ["en", "en", "xx", "de"],
        }
    )
    got = (
        lang_pivot(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["a"].tolist() == [0, 2, 0, 0, 0, 1]
    assert got.loc["b"].tolist() == [1, 0, 0, 0, 0, 0]


def test_cluster_top_terms_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import cluster_top_terms

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": [
                "apple apple apple pie",
                "apple apple tart pie",
                "apple pie pie crumble",
                "rocket rocket engine",
                "rocket engine engine thrust",
                "rocket thrust nozzle engine",
            ],
        }
    )
    labels = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "cluster": pa.array([0, 0, 0, 1, 1, 1], pa.int64()),
        }
    )
    got = cluster_top_terms(
        ray.data.from_arrow(docs).repartition(3),
        ray.data.from_arrow(labels).repartition(2),
        k_top=2,
        min_tf=2,
    ).to_pandas()
    top = got[got["rank"] == 1].set_index("cluster")["token"].to_dict()
    assert top[0] in {"apple", "pie"}      # cluster-0 vocabulary only
    assert top[1] in {"rocket", "engine"}  # cluster-1 vocabulary only
    # lift of a cluster-exclusive token: tf_g == tf, so lift = N // n_c
    ex = got[(got["cluster"] == 0) & (got["token"] == "apple")]
    assert not ex.empty
    r = ex.iloc[0]
    assert r["tf"] == 6 and r["tf_g"] == 6


def test_neg_sampling_table_brute_force():
    import math

    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import neg_sampling_table

    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": [
                "a a a a b b c",
                "b b a d",
                " a  b ",
                "",
            ],
        }
    )
    got = (
        neg_sampling_table(ray.data.from_arrow(t).repartition(3), k=3)
        .to_pandas()
        .set_index("token")
    )
    # counts: a=6 b=5 c=1 d=1 -> top-3 = a, b, c (count desc, token asc)
    assert list(got.index) == ["a", "b", "c"]
    w = {tok: math.isqrt(n * math.isqrt(n)) for tok, n in [("a", 6), ("b", 5), ("c", 1)]}
    assert got.loc["a", "weight"] == w["a"]
    assert got.loc["b", "weight"] == w["b"]
    assert got.loc["c", "weight"] == w["c"]
    # half-open cumulative ranges tile [0, total)
    assert got.loc["a", "cum_lo"] == 0
    assert got.loc["a", "cum_hi"] == w["a"]
    assert got.loc["b", "cum_lo"] == w["a"]
    assert got.loc["c", "cum_hi"] == w["a"] + w["b"] + w["c"]


def test_normalized_dedup_keep_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.dedup import normalized_dedup_keep

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": [
                "Hello, World!",
                "hello world",          # same after normalization
                "HELLO ... WORLD",      # same
                "hello world 2",        # different (digit)
                "unrelated text",
            ],
        }
    )
    got = (
        normalized_dedup_keep(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("doc_id")["n_variants"]
        .to_dict()
    )
    assert got == {1: 3, 4: 1, 5: 1}


def test_char_ngram_lang_id_matches_replica():
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.text import char_lang_id_oracle, char_ngram_lang_id

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    got = (
        char_ngram_lang_id(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        char_lang_id_oracle(tbl)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # classifier actually separates: every doc with >= 1 hit got a real lang
    assert (got.loc[got["n_hits"] > 0, "lang_pred"] != "und").all()


def test_trigram_backoff_hand_case_and_replica():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import (
        trigram_backoff_oracle,
        trigram_backoff_score,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "a b c a b c",   # trigram "a b c" seen twice
                "a b x",         # "a b x" unseen at trigram level? no - counted
                "zz",            # too short: zero trigrams
            ],
        }
    )
    got = (
        trigram_backoff_score(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        trigram_backoff_oracle(t)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    r3 = got.set_index("doc_id").loc[3]
    assert r3["n_trigrams"] == 0 and r3["nll_micro"] == 0
    # doc 1: all 4 trigrams in-table -> no backoff
    r1 = got.set_index("doc_id").loc[1]
    assert r1["n_trigrams"] == 4 and r1["n_scored"] == 4
    assert r1["n_backoff2"] == 0 and r1["n_backoff1"] == 0
    # hand-check one position: "a b c" count=2, "a b" count=3 ->
    # S = 2/3; "b c a" =1, "b c"=2 -> 1/2; "c a b"=1, "c a"=1 -> 1;
    # second "a b c" -> 2/3 again
    exp = -(round(np.log2(2 / 3) * 1e6) * 2 + round(np.log2(1 / 2) * 1e6) + 0)
    assert r1["nll_micro"] == exp


def test_trigram_backoff_levels():
    """Backoff levels actually bind: an unseen trigram with a seen
    (w2,w3) bigram scores at level 2; unseen bigram + seen unigram at
    level 1."""
    import pyarrow as pa

    from agentic_doc_ray.functions.text import trigram_backoff_oracle

    # holdout split: doc 2 trains (doc_id % 2 == 0), odd docs score
    t = pa.table(
        {
            "doc_id": pa.array([2, 1, 3], pa.int64()),
            "text": [
                "p q r s",       # TRAIN: trigrams "p q r", "q r s"
                "s p q",         # "s p q" not trained; bigram "p q" is
                "w p z",         # nothing trained but "p" -> level 1 + OOV
            ],
        }
    )
    out = trigram_backoff_oracle(t, train_mod=2).to_pandas().set_index("doc_id")
    d1 = out.loc[1]
    assert d1["n_trigrams"] == 1 and d1["n_scored"] == 1
    assert d1["n_backoff2"] == 1  # backed off to the (p q) bigram level
    d3 = out.loc[3]
    # "w p z": trigram/bigram unseen; w3 = "z" unseen too -> unscored
    assert d3["n_trigrams"] == 1 and d3["n_scored"] == 0
    # train doc scores itself fully at level 3
    d2 = out.loc[2]
    assert d2["n_scored"] == d2["n_trigrams"] == 2
    assert d2["n_backoff2"] == 0 and d2["n_backoff1"] == 0


def test_char_entropy_properties():
    import math

    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import char_entropy, char_entropy_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "aaaaaaa",        # zero entropy
                "ab" * 8,         # exactly 1 bit/char
                "",               # empty -> 0 by rule
                "abcd",           # exactly 2 bits/char
            ],
        }
    )
    got = (
        char_entropy(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "entropy_micro"] == 0 and got.loc[1, "n_distinct_chars"] == 1
    assert got.loc[2, "entropy_micro"] == 1_000_000
    assert got.loc[3, "entropy_micro"] == 0 and got.loc[3, "n_chars"] == 0
    assert got.loc[4, "entropy_micro"] == 2_000_000
    # distributed == single-process replica (bit-equal)
    want = char_entropy_batch(t).to_pandas().set_index("doc_id")
    assert got.equals(want)


def test_phrase_merge_greedy_chain():
    import numpy as np
    import pyarrow as pa

    from agentic_doc_ray.functions.text import _phrase_merge_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "a b c d",    # chain: (a b) and (b c) and (c d) all phrases
                "x a b y",
                "",
            ],
        }
    )
    phrases = np.array(["a b", "b c", "c d"], dtype=object)
    out = _phrase_merge_batch(t, phrases).to_pandas().set_index("doc_id")
    # greedy left-to-right: merge (a b), skip (b c), merge (c d)
    assert out.loc[1, "text_merged"] == "a_b c_d"
    assert out.loc[1, "n_merges"] == 2
    assert out.loc[2, "text_merged"] == "x a_b y"
    assert out.loc[2, "n_merges"] == 1
    assert out.loc[3, "text_merged"] == "" and out.loc[3, "n_merges"] == 0


def test_phrase_merge_distributed_matches_replica():
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.text import phrase_merge, phrase_merge_oracle

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    got = (
        phrase_merge(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        phrase_merge_oracle(tbl)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert (got["n_merges"] > 0).any()  # phrases actually fire


def test_doc_ttr_planted():
    import pyarrow as pa
    import ray.data

    from agentic_doc_ray.functions.text import doc_ttr

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["a a a a", "a b c d", ""],
        }
    )
    got = doc_ttr(ray.data.from_arrow(t).repartition(2)).to_pandas().set_index("doc_id")
    assert got.loc[1].tolist() == [4, 1, 250]
    assert got.loc[2].tolist() == [4, 4, 1000]
    assert got.loc[3].tolist() == [0, 0, 0]


def test_alias_table_invariants():
    """Exact mass conservation: each token's acceptance mass plus the
    mass it receives as an alias equals k * weight (the defining alias
    property), and the replica matches the distributed build."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.text import alias_table, alias_table_oracle

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    got = (
        alias_table(ray.data.from_arrow(tbl).repartition(3), k=16)
        .to_pandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    want = alias_table_oracle(tbl, k=16).to_pandas()
    assert got.equals(want)

    total = int(got["total"].iloc[0])
    k = len(got)
    mass = defaultdict(int)
    for r in got.itertuples():
        mass[r.token] += r.accept_num
        if r.alias_token != r.token:
            mass[r.alias_token] += total - r.accept_num
    # reconstruct weights: mass[token] == weight * k exactly
    import math

    import duckdb

    cnt = duckdb.sql(
        "SELECT token, count(*) n FROM (SELECT unnest(regexp_split_to_array("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token "
        "FROM read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> '') GROUP BY 1 "
        "ORDER BY n DESC, token LIMIT 16"
    ).df()
    for tok, n in zip(cnt["token"], cnt["n"]):
        w = math.isqrt(int(n) * math.isqrt(int(n)))
        assert mass[tok] == w * k, tok
    assert sum(mass.values()) == total * k
