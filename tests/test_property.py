"""Property-based tests (hypothesis): the pipeline's local transform chain
must equal the oracle for ARBITRARY valid corpora, not just the fixture
families. Runs the stage functions directly (no Ray session per example);
one seeded example goes through the full Ray pipeline in test_pipeline.py.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from agentic_doc_ray.config import EngineConfig
from agentic_doc_ray.oracle import parse_corpus_oracle
from agentic_doc_ray.schema import CORPUS_SCHEMA
from agentic_doc_ray.stages.explode import explode_spans
from agentic_doc_ray.stages.html_strip import strip_html_batch
from agentic_doc_ray.stages.layout_parse import LayoutParseActor
from agentic_doc_ray.stages.reassemble import merge_bucket_group
from agentic_doc_ray.textparse import strip_html

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)
_kind = st.sampled_from(["text", "html", "pdf_page", "image"])


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(0, 6))
    doc_ids, spans_col = [], []
    for d in range(n_docs):
        n_spans = draw(st.integers(0, 12))
        spans = []
        offsets = list(range(n_spans))
        # permute offsets: input list order must not matter
        perm = draw(st.permutations(offsets))
        for off in perm:
            spans.append(
                {
                    "kind": draw(_kind),
                    "text": draw(_text),
                    "media_ref": draw(st.sampled_from(["", "media://x/1"])),
                    "offset": off,
                }
            )
        doc_ids.append(f"doc-{d}")
        spans_col.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=CORPUS_SCHEMA
    )


def _local_pipeline(corpus: pa.Table, cfg: EngineConfig) -> list[dict]:
    """The stage chain composed locally, with adversarial batch slicing."""
    pages = strip_html_batch(explode_spans(corpus, cfg))
    actor = LayoutParseActor(cfg)
    chunk_tables = [
        t
        for t in (
            actor(pages.slice(i, 3)) for i in range(0, max(1, pages.num_rows), 3)
        )
        if t.num_rows
    ]
    if not chunk_tables:
        return []
    chunks = pa.concat_tables(chunk_tables)
    merged = merge_bucket_group(chunks, cfg)
    return sorted(merged.to_pylist(), key=lambda r: r["doc_id"])


@settings(max_examples=40, deadline=None, derandomize=True)
@given(corpus=corpora(), split=st.integers(1, 5))
def test_pipeline_equals_oracle_on_arbitrary_corpora(corpus, split):
    cfg = EngineConfig(split_size=split)
    got = _local_pipeline(corpus, cfg)
    want = sorted(
        parse_corpus_oracle(corpus, cfg).to_pylist(), key=lambda r: r["doc_id"]
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["doc_id"] == w["doc_id"]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
        ] == [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in w["spans"]]
        assert g["markdown"] == w["markdown"]
        assert g["errors"] == w["errors"]
        assert g["end_page_idx"] == w["end_page_idx"]
        assert g["doc_type"] == w["doc_type"]


@settings(max_examples=100, deadline=None, derandomize=True)
@given(html=st.text(max_size=500))
def test_strip_html_total_and_deterministic(html):
    a = strip_html(html)
    assert a == strip_html(html)
    assert isinstance(a, str)


@settings(max_examples=100, deadline=None, derandomize=True)
@given(text=_text, kind=_kind, off=st.integers(0, 1000))
def test_parse_page_never_throws_and_ids_unique(text, kind, off):
    from agentic_doc_ray.textparse import parse_page

    chunks = parse_page("d", off, kind, text, "m")
    ids = [c.chunk_id for c in chunks]
    assert len(set(ids)) == len(ids)
    for c in chunks:
        l, t, r, b = c.bbox
        assert 0.0 <= l < r <= 1.0 and 0.0 <= t < b <= 1.0


@settings(max_examples=30, deadline=None, derandomize=True)
@given(texts=st.lists(_text, min_size=1, max_size=20))
def test_token_counts_cross_engine(texts):
    """Arrow kernels and DuckDB must agree on ARBITRARY unicode text — both
    sides use RE2 with an explicit regex trim (duckdb trim() strips only
    spaces; arrow utf8_trim_whitespace strips unicode whitespace; a previous
    version diverged on leading \\t/\\n, caught by this fuzz)."""
    import duckdb

    from agentic_doc_ray.functions.text import token_count_batch

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = token_count_batch(t)["n_tokens"].to_pylist()
    want = duckdb.sql(
        "SELECT CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0 "
        "ELSE len(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n "
        "FROM t ORDER BY doc_id"
    ).df()["n"].tolist()
    assert got == want


@settings(max_examples=30, deadline=None, derandomize=True)
@given(texts=st.lists(_text, min_size=1, max_size=20))
def test_bpe_counts_cross_engine(texts):
    import duckdb

    from agentic_doc_ray.functions.text import bpe_token_count_batch

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = bpe_token_count_batch(t)["n_bpe_tokens"].to_pylist()
    want = duckdb.sql(
        "SELECT len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n "
        "FROM t ORDER BY doc_id"
    ).df()["n"].tolist()
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet=" abcdef\n\t", min_size=0, max_size=80),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=40),
)
def test_pack_sequences_fuzz_matches_oracle(texts, budget):
    import ray.data

    from agentic_doc_ray.functions.sampling import (
        pack_sequences,
        pack_sequences_oracle,
    )

    ids = [f"doc-{i:03d}" for i in range(len(texts))]
    t = pa.Table.from_pydict({"doc_id": ids, "text": texts})
    got = sorted(
        (r["pack_id"], r["doc_id"], r["position"], r["n_tokens"])
        for r in pack_sequences(
            ray.data.from_arrow(t), token_budget=budget
        ).take_all()
    )
    want = sorted(
        (r["pack_id"], r["doc_id"], r["position"], r["n_tokens"])
        for r in pack_sequences_oracle(ids, texts, token_budget=budget).to_pylist()
    )
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(alphabet=" abc\n", min_size=0, max_size=60),
        min_size=1,
        max_size=12,
    )
)
def test_repetition_stats_fuzz_matches_naive(texts):
    from collections import Counter

    from agentic_doc_ray.functions.text import repetition_stats_batch

    t = pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts}
    )
    got = {r["doc_id"]: r for r in repetition_stats_batch(t).to_pylist()}
    for i, txt in enumerate(texts):
        counts = Counter(l for l in txt.split("\n") if l != "")
        n_lines = sum(counts.values())
        n_dup = sum(c for c in counts.values() if c > 1)
        r = got[i]
        assert r["n_lines"] == n_lines
        assert r["n_dup_lines"] == n_dup
        assert r["dup_line_per_mille"] == n_dup * 1000 // max(n_lines, 1)


@settings(deadline=None, max_examples=60)
@given(
    st.lists(
        st.text(alphabet=" \tabAB.!?xy", max_size=40),
        max_size=10,
    ),
    st.integers(1, 3),
)
def test_bigram_lm_scoring_batching_invariant(texts, n_slices):
    """_lm_score_batch over the whole table == concat of arbitrary slice
    scorings (given the same count tables): the integer micro-bit design
    makes per-doc sums independent of block boundaries."""
    from agentic_doc_ray.functions.text import (
        _bigram_partial,
        _counts_to_series,
        _first_partial,
        _lm_score_batch,
    )

    t = pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts},
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    bmap = _counts_to_series(_bigram_partial(t), "bigram")
    fmap = _counts_to_series(_first_partial(t), "token")
    whole = _lm_score_batch(t, bmap, fmap).to_pylist()
    step = max(1, (len(texts) + n_slices - 1) // n_slices)
    parts = []
    for off in range(0, len(texts), step):
        parts.extend(
            _lm_score_batch(t.slice(off, step), bmap, fmap).to_pylist()
        )
    assert whole == parts


@settings(deadline=None, max_examples=60)
@given(
    st.lists(
        st.text(alphabet=" \tabAB.!?xy", max_size=40),
        max_size=10,
    )
)
def test_first_counts_derive_from_bigram_counts(texts):
    """The C_first table derived from the bigram table (split on the
    joining space, sum) must equal a dedicated first-token counting pass
    — the identity bigram_lm_score relies on to skip its second corpus
    read."""
    from agentic_doc_ray.functions.text import (
        _bigram_partial,
        _first_partial,
        _firsts_from_bigrams,
    )

    t = pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts},
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    want = {
        r["token"]: r["n"] for r in _first_partial(t).to_pylist()
    }
    got = {
        r["token"]: r["n"]
        for r in _firsts_from_bigrams(_bigram_partial(t)).to_pylist()
    }
    assert got == want


@settings(deadline=None, max_examples=60)
@given(
    st.lists(st.text(alphabet=" \tabZ.!? \n", max_size=60), max_size=8)
)
def test_split_sentences_matches_python_replica(texts):
    """Vectorized sentence split == a per-doc Python re replica (re and
    RE2 agree on this lookbehind-free pattern)."""
    import re

    from agentic_doc_ray.functions.text import split_sentences_batch

    t = pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts},
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    got = [
        (r["doc_id"], r["sent_idx"], r["sentence"])
        for r in split_sentences_batch(t).to_pylist()
    ]
    want = []
    for i, txt in enumerate(texts):
        k = 0
        for seg in re.split(r"[.!?]+\s+|[.!?]+$", txt):
            s = re.sub(r"^\s+|\s+$", "", seg)
            if s:
                want.append((i, k, s))
                k += 1
    assert got == want


def test_prefix_halves_exact_past_2_53():
    """The segmented modular sum must stay exact when a prefix sum of the
    32-bit halves crosses 2**53 — the threshold where the historical
    ``np.concatenate(([0], uint64_cumsum))`` float64 promotion started
    rounding low bits (silent batch-layout-dependent fingerprint drift in
    delta.snapshot_diff / text.fingerprint_batch / substr._gram_hashes)."""
    import numpy as np

    from agentic_doc_ray.functions.text import (
        _FP_MOD,
        _prefix_halves,
        _segment_modsum,
    )

    # 18M terms at the 61-bit max drive the hi-half cumsum to
    # 18e6 * (2^29-1) ~ 2^53.1 — past the float64 integer-exact range.
    n = 18_000_000
    contrib = np.full(n, (1 << 61) - 1, dtype=np.uint64)
    # sprinkle irregular values so neighbouring windows differ
    idx = np.arange(0, n, 97)
    contrib[idx] = (idx * np.uint64(2654435761)) % np.uint64(_FP_MOD)
    cs_hi, cs_lo = _prefix_halves(contrib)
    assert cs_hi.dtype == np.uint64 and cs_lo.dtype == np.uint64

    starts = np.array([0, n - 5, n - 1_000_003, 12_345], dtype=np.int64)
    ends = np.array([n, n, n - 3, 12_345 + 4_000_000], dtype=np.int64)
    got = _segment_modsum(cs_hi, cs_lo, starts, ends)
    for s, e, g in zip(starts, ends, got):
        want = int(sum(int(v) for v in contrib[s:e])) % _FP_MOD
        assert int(g) == want, (s, e)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab\nc ")), max_size=60
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_dedup_lines_batch_matches_pure_spec(texts):
    """dedup_lines_batch == the obvious per-doc Python rule for arbitrary
    newline-dense texts (first occurrence of each non-empty line stays,
    empty lines always stay)."""
    from agentic_doc_ray.functions.text import dedup_lines_batch

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = dedup_lines_batch(t).to_pydict()
    for i, txt in enumerate(texts):
        seen, kept, removed = set(), [], 0
        for line in txt.split("\n"):
            if line == "" or line not in seen:
                kept.append(line)
                seen.add(line)
            else:
                removed += 1
        assert got["text"][i] == "\n".join(kept)
        assert got["n_removed"][i] == removed


@settings(deadline=None, max_examples=80, derandomize=True)
@given(
    st.lists(
        st.text(
            alphabet=' \t\nabJ.!?"{xy' + "lorem ipsu",  # hits every rule
            max_size=60,
        ),
        max_size=8,
    )
)
def test_c4_flags_fuzz_matches_naive(texts):
    """Vectorized C4 flags == a pure-Python line-by-line spec on
    arbitrary (ascii) corpora, including empty docs and whitespace-only
    lines."""
    import re

    from agentic_doc_ray.functions.text import c4_quality_flags_batch

    t = pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts},
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    got = {r["doc_id"]: r for r in c4_quality_flags_batch(t).to_pylist()}
    for i, txt in enumerate(texts):
        lines = txt.split("\n")
        kept_lines, n_js = [], 0
        for ln in lines:
            tl = re.sub(r"^\s+|\s+$", "", ln)
            js = "javascript" in ln.lower()
            n_js += js
            if (
                tl
                and re.search(r'[.!?"]$', tl)
                and len(re.split(r"\s+", tl)) >= 5
                and not js
            ):
                kept_lines.append(ln)
        n_sent = sum(len(re.findall(r"[.!?]", ln)) for ln in kept_lines)
        lorem = "lorem ipsum" in txt.lower()
        brace = "{" in txt
        r = got[i]
        assert r["n_lines"] == len(lines)
        assert r["n_kept_lines"] == len(kept_lines)
        assert r["n_sentences"] == n_sent
        assert r["n_js_lines"] == n_js
        assert r["has_lorem_ipsum"] == int(lorem)
        assert r["has_code_brace"] == int(brace)
        assert r["keep"] == int(not lorem and not brace and n_sent >= 3)


@settings(deadline=None, max_examples=40, derandomize=True)
@given(
    st.lists(
        st.text(alphabet=" \tabAB.!?xy", max_size=50),
        max_size=10,
    ),
    st.integers(1, 3),
)
def test_mink_prob_batching_invariant(texts, n_slices):
    """_mink_score_batch over the whole table == concat of arbitrary
    slice scorings (same count tables): value-based fixed-count
    selection over integer micro-bits cannot depend on batch layout."""
    from agentic_doc_ray.functions.text import (
        _bigram_partial,
        _counts_to_series,
        _first_partial,
        _mink_score_batch,
    )

    t = pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts},
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    bmap = _counts_to_series(_bigram_partial(t), "bigram")
    fmap = _counts_to_series(_first_partial(t), "token")
    whole = _mink_score_batch(t, bmap, fmap, 20).to_pylist()
    n = len(texts)
    cuts = [0] + sorted((i * n) // n_slices for i in range(1, n_slices)) + [n]
    sliced = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        if b > a:
            sliced.extend(_mink_score_batch(t.slice(a, b - a), bmap, fmap, 20).to_pylist())
    assert whole == sliced
