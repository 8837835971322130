"""Text-analysis operators over the ``documents`` table.

All hot paths are vectorized Arrow kernels (``pyarrow.compute``) inside
``map_batches`` — no per-row Python in the counting stages. Counting
queries emit INTEGER metrics only, so the DuckDB oracle comparison is exact
(no float rounding divergence).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Python len(text.split()) == number of \s+ separated tokens of the trimmed
# string; mirrored in SQL as regexp_split_to_array(trim(text), '\s+').
_PUNCT_PATTERN = r"[.!?,;:]"
_UPPER_PATTERN = r"[A-Z]"
_DIGIT_PATTERN = r"[0-9]"

# Tiny per-language stopword inventories for the n-gram/stopword language-ID
# heuristic. Deterministic, order-stable.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "es": ("el", "la", "los", "que", "es", "una", "por"),
    "zh": ("de", "shi", "bu", "le", "zai", "wo", "you"),
}


def _regex_trim(text):
    # RE2 ASCII \s trim on BOTH engines: DuckDB's trim() strips only
    # spaces and Arrow's utf8_trim_whitespace strips unicode whitespace —
    # either mismatch flips token counts on leading \t/\n (fuzz-caught)
    return pc.replace_substring_regex(text, r"^\s+|\s+$", "")


def _token_count(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    trimmed = _regex_trim(text)
    n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    return pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), n).cast(
        pa.int64()
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_tokens)."""
    return pa.Table.from_arrays(
        [batch.column("doc_id"), _token_count(batch.column("text"))],
        names=["doc_id", "n_tokens"],
    )


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """Integer quality metrics per document (vectorized RE2 kernels).

    punct/upper/digit counts use the same RE2 regex engine DuckDB uses, so
    the oracle comparison is exact.
    """
    text = batch.column("text")
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = _token_count(text)
    n_punct = pc.count_substring_regex(text, _PUNCT_PATTERN).cast(pa.int64())
    n_upper = pc.count_substring_regex(text, _UPPER_PATTERN).cast(pa.int64())
    n_digit = pc.count_substring_regex(text, _DIGIT_PATTERN).cast(pa.int64())
    # integer per-mille ratios: exact in both numpy and SQL integer division
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    punct_per_mille = pc.divide(pc.multiply(n_punct, pa.scalar(1000, pa.int64())), denom)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            n_chars,
            n_tokens,
            n_punct,
            n_upper,
            n_digit,
            punct_per_mille,
        ],
        names=[
            "doc_id",
            "n_chars",
            "n_tokens",
            "n_punct",
            "n_upper",
            "n_digit",
            "punct_per_mille",
        ],
    )


class LangIdActor:
    """Stopword-ratio language ID (actor pool: patterns compiled once).

    Scores each language by whole-word stopword hits per token and picks the
    argmax, tie-broken by language code — deterministic.
    """

    def __init__(self) -> None:
        self.patterns = {
            lang: r"\b(" + "|".join(words) + r")\b"
            for lang, words in sorted(STOPWORDS.items())
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.utf8_lower(batch.column("text"))
        n_tokens = _token_count(batch.column("text")).to_numpy(zero_copy_only=False)
        denom = np.maximum(n_tokens, 1).astype(np.float64)
        best_lang = np.full(len(batch), "und", dtype=object)
        best_score = np.zeros(len(batch), dtype=np.float64)
        for lang, pat in self.patterns.items():  # sorted -> deterministic ties
            hits = pc.count_substring_regex(text, pat).to_numpy(zero_copy_only=False)
            score = hits / denom
            better = score > best_score + 1e-12
            best_score = np.where(better, score, best_score)
            best_lang = np.where(better, lang, best_lang)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(best_lang, pa.string()),
                pa.array(best_score, pa.float64()),
            ],
            names=["doc_id", "lang_pred", "stopword_ratio"],
        )


# BPE-ish lexer classes (RE2-safe: no lookahead, mirrored verbatim in the
# DuckDB oracle): letter runs, digit runs, single punctuation marks.
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_bpe_tokens): subword-style token count."""
    n = pc.count_substring_regex(batch.column("text"), _BPE_PATTERN).cast(pa.int64())
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n], names=["doc_id", "n_bpe_tokens"]
    )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003
_M61 = np.uint64(_FP_MOD)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x (uint64, any value) mod 2^61-1 — Mersenne fold, no division."""
    x = (x & _M61) + (x >> np.uint64(61))
    return np.where(x >= _M61, x - _M61, x)


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod 2^61-1 for a,b < 2^61, without 128-bit ints.

    Split both into 31/30-bit halves; 2^62 ≡ 2 and 2^61 ≡ 1 (mod M) fold
    the partial products back into uint64 range."""
    lo31 = np.uint64((1 << 31) - 1)
    a1, a0 = a >> np.uint64(31), a & lo31  # a1 < 2^30, a0 < 2^31
    b1, b0 = b >> np.uint64(31), b & lo31
    hi = _mod61((a1 * b1) << np.uint64(1))  # a1*b1*2^62 ≡ a1*b1*2
    mid = _mod61(_mod61(a1 * b0) + _mod61(a0 * b1))  # coefficient of 2^31
    m1, m0 = mid >> np.uint64(30), mid & np.uint64((1 << 30) - 1)
    midshift = _mod61(m1 + (m0 << np.uint64(31)))  # mid*2^31: m1*2^61 ≡ m1
    lo = _mod61(a0 * b0)
    return _mod61(hi + midshift + lo)


def _prefix_halves(contrib: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact uint64 prefix sums of ``contrib``'s 32-bit halves.

    Splitting 61-bit terms into 32-bit halves keeps each running sum
    inside uint64 for up to 2^35 terms. The zero seed MUST be uint64:
    ``np.concatenate(([0], cumsum))`` mixes int64 with uint64 and numpy
    promotes BOTH to float64, silently rounding away low bits once a
    prefix sum passes 2**53 (pinned by tests/test_property.py)."""
    hi, lo = contrib >> np.uint64(32), contrib & np.uint64(0xFFFFFFFF)
    cs_hi = np.concatenate((np.zeros(1, np.uint64), np.cumsum(hi)))
    cs_lo = np.concatenate((np.zeros(1, np.uint64), np.cumsum(lo)))
    return cs_hi, cs_lo


def _segment_modsum(
    cs_hi: np.ndarray, cs_lo: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> np.ndarray:
    """Σ contrib[starts:ends] mod 2^61-1 from ``_prefix_halves`` arrays."""
    seg_hi = _mod61(cs_hi[ends] - cs_hi[starts])
    seg_lo = _mod61(cs_lo[ends] - cs_lo[starts])
    two32 = np.uint64((1 << 32) % _FP_MOD)
    return _mod61(_mulmod61(seg_hi, np.broadcast_to(two32, seg_hi.shape)) + seg_lo)


_FP_POWERS = np.array([], dtype=np.uint64)  # B^i mod M, grown on demand


def _fp_powers(n: int) -> np.ndarray:
    global _FP_POWERS
    if len(_FP_POWERS) < n:
        size = max(n, 4096)
        p, acc = [], 1
        for _ in range(size):
            p.append(acc)
            acc = (acc * _FP_BASE) % _FP_MOD
        _FP_POWERS = np.array(p, dtype=np.uint64)
    return _FP_POWERS


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Deterministic document fingerprint: polynomial rolling hash over
    crc32(token) values, mod 2^61-1 (h = Σ crc32(tok_j)·B^(n-1-j) mod M;
    tokens = ASCII-\\s+ split of the trimmed text). Stable across
    runs/platforms.

    Fully vectorized: tokens flatten across the batch, crc32 is computed
    once per DISTINCT token (dictionary encode), coefficients multiply
    against precomputed base powers with a 61-bit Mersenne mulmod, and the
    per-document sums come from 32-bit-split prefix-sum differences."""
    n_rows = batch.num_rows
    out = np.zeros(n_rows, dtype=np.uint64)
    trimmed = _regex_trim(batch.column("text"))
    nonempty_mask = pc.not_equal(trimmed, "")
    rows = np.flatnonzero(
        nonempty_mask.combine_chunks().to_numpy(zero_copy_only=False)
    )
    if len(rows):
        toks = pc.split_pattern_regex(trimmed.filter(nonempty_mask), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        # crc32 once per distinct token, broadcast back via dictionary codes
        enc = flat.dictionary_encode()
        vocab = enc.dictionary.to_pylist()
        crc = np.fromiter(
            (zlib.crc32(t.encode()) for t in vocab),
            dtype=np.uint64,
            count=len(vocab),
        )
        codes = np.asarray(enc.indices.cast(pa.int64()))
        coeffs = crc[codes]
        # exponent of token j in doc d = (end_d - 1 - j)
        ends = np.cumsum(lens)
        starts = ends - lens
        parents = np.repeat(np.arange(len(lens)), lens)
        exps = ends[parents] - 1 - np.arange(len(flat))
        contrib = _mulmod61(coeffs, _fp_powers(int(lens.max()))[exps])
        # segmented modular sum via the shared exact-uint64 prefix halves
        cs_hi, cs_lo = _prefix_halves(contrib)
        out[rows] = _segment_modsum(cs_hi, cs_lo, starts, ends)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(out.astype(np.int64), pa.int64())],
        names=["doc_id", "fingerprint"],
    )


# PII patterns (RE2-safe, mirrored verbatim in the DuckDB oracle).
# Order matters: email before phone so the digits inside an address
# aren't double-redacted by a later pass.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"(\+?1[ .\-]?)?(\([0-9]{3}\)|\b[0-9]{3})[ .\-][0-9]{3}[ .\-][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def redact_pii_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, text redacted, n_pii): chained RE2
    replace kernels, one count+replace pass per pattern class — no per-row
    Python. The redaction order is part of the spec (email first)."""
    text = batch.column("text")
    n_pii = pa.nulls(len(text), pa.int64()).fill_null(0)
    for _, pat, repl in PII_PATTERNS:
        n_pii = pc.add(n_pii, pc.count_substring_regex(text, pat).cast(pa.int64()))
        text = pc.replace_substring_regex(text, pat, repl)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), text, n_pii],
        names=["doc_id", "text", "n_pii"],
    )


def redact_pii(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(redact_pii_batch, batch_format="pyarrow")


def normalize_text_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, text canonicalized): NFC -> lower ->
    collapse ``\\s+`` to one space -> trim. The standard first stage
    before hashing or exact dedup, so byte-level noise — composed vs
    decomposed accents, case, runs of whitespace — cannot defeat
    equality.

    Lower/collapse/trim are Arrow kernels (RE2 whitespace class, same as
    the DuckDB oracle's). True NFC needs composition, which this
    pyarrow's ``utf8_normalize`` cannot do (its utf8proc build leaves
    NFC == NFD — verified: composed input comes back decomposed), so NFC
    runs through ``unicodedata`` on ONLY the non-ASCII subset: a
    vectorized RE2 mask finds those rows (ASCII is NFC-invariant by
    definition), and in a web corpus that subset is the minority, so the
    per-row C call touches a sliver of the batch."""
    import unicodedata

    t = batch.column("text").combine_chunks()
    mask = pc.match_substring_regex(t, "[^\\x00-\\x7f]")
    if pc.any(mask).as_py():
        idxs = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
        fixed = pa.array(
            [
                unicodedata.normalize("NFC", v)
                for v in t.take(pa.array(idxs)).to_pylist()
            ],
            pa.string(),
        )
        t = pc.replace_with_mask(t, mask, fixed)
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), t], names=["doc_id", "text"]
    )


def normalize_text(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(normalize_text_batch, batch_format="pyarrow")


# Rae et al. 2021 (Gopher), appendix A1.1: a document must contain at
# least two of these words to pass the stop-word rule.
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags_batch(
    batch: pa.Table, stopwords: tuple[str, ...] = _GOPHER_STOPWORDS
) -> pa.Table:
    """The full Gopher document-quality rule set (Rae et al. 2021 A1.1)
    as per-doc integer counts + 0/1 flags + the conjunctive keep bit.
    The stopword inventory is corpus-dependent configuration (the paper's
    8-word English list is the default); the >=2-distinct threshold is
    fixed.

    Rules (thresholds evaluated by exact integer cross-multiplication so
    the DuckDB oracle agrees bit-for-bit — no float ratios anywhere):

      word_count      50 <= n_words <= 100_000
      mean_word_len   3 <= word_len_sum / n_words <= 10
      symbol_ratio    (#'#' + #'...') / n_words <= 0.1
      bullet_lines    lines starting with '-' or '•' <= 90% of lines
      ellipsis_lines  lines ending with '...' <= 30% of lines
      alpha_words     words containing an alphabetic char >= 80%
      stopwords       >= 2 DISTINCT words from the 8-word Gopher list

    Words = RE2 whitespace split of the trimmed text (the repo-wide
    tokenization convention, `_token_count`); lines = '\\n' split,
    empty lines excluded from the line-rule denominators. Doc-local and
    fully vectorized (Arrow kernels + numpy segment sums): 0 exchanges.
    """
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = batch.num_rows

    trimmed = _regex_trim(text)
    nonempty_doc = pc.not_equal(trimmed, "")
    toks = pc.split_pattern_regex(trimmed.filter(nonempty_doc), r"\s+")
    flat = toks.flatten()
    # map token parents back to batch row indices (empty docs have no rows)
    doc_idx = np.flatnonzero(nonempty_doc.to_numpy(zero_copy_only=False))
    parents = doc_idx[pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)]

    n_words = np.zeros(n, dtype=np.int64)
    np.add.at(n_words, parents, 1)
    word_len_sum = np.zeros(n, dtype=np.int64)
    np.add.at(
        word_len_sum, parents, pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    )
    alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(zero_copy_only=False)
    n_alpha_words = np.zeros(n, dtype=np.int64)
    np.add.at(n_alpha_words, parents[alpha], 1)

    low = pc.utf8_lower(flat)
    sw_mask = pc.is_in(low, value_set=pa.array(list(stopwords)))
    swt = pa.Table.from_arrays(
        [pa.array(parents[sw_mask.to_numpy(zero_copy_only=False)]), low.filter(sw_mask)],
        names=["d", "w"],
    )
    distinct_sw = swt.group_by(["d", "w"]).aggregate([])
    n_stopwords = np.zeros(n, dtype=np.int64)
    np.add.at(n_stopwords, distinct_sw.column("d").to_numpy(zero_copy_only=False), 1)

    n_sym = (
        pc.count_substring(text, "#").cast(pa.int64()).to_numpy(zero_copy_only=False)
        + pc.count_substring(text, "...")
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )

    lines = pc.split_pattern(text, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat_lines = lines.flatten()
    lparents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    lmask = pc.not_equal(flat_lines, "").to_numpy(zero_copy_only=False)
    n_lines = np.zeros(n, dtype=np.int64)
    np.add.at(n_lines, lparents[lmask], 1)
    bullet = pc.or_(
        pc.starts_with(flat_lines, "-"), pc.starts_with(flat_lines, "•")
    ).to_numpy(zero_copy_only=False)
    n_bullet = np.zeros(n, dtype=np.int64)
    np.add.at(n_bullet, lparents[lmask & bullet], 1)
    ell_end = pc.ends_with(flat_lines, "...").to_numpy(zero_copy_only=False)
    n_ell_end = np.zeros(n, dtype=np.int64)
    np.add.at(n_ell_end, lparents[lmask & ell_end], 1)

    f_word_count = ((n_words >= 50) & (n_words <= 100_000)).astype(np.int64)
    f_mean_word_len = (
        (n_words > 0)
        & (3 * n_words <= word_len_sum)
        & (word_len_sum <= 10 * n_words)
    ).astype(np.int64)
    f_symbol_ratio = (10 * n_sym <= n_words).astype(np.int64)
    f_bullet_lines = (10 * n_bullet <= 9 * n_lines).astype(np.int64)
    f_ellipsis_lines = (10 * n_ell_end <= 3 * n_lines).astype(np.int64)
    f_alpha_words = ((n_words > 0) & (5 * n_alpha_words >= 4 * n_words)).astype(
        np.int64
    )
    f_stopwords = (n_stopwords >= 2).astype(np.int64)
    keep = (
        f_word_count
        & f_mean_word_len
        & f_symbol_ratio
        & f_bullet_lines
        & f_ellipsis_lines
        & f_alpha_words
        & f_stopwords
    )

    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": n_words,
            "word_len_sum": word_len_sum,
            "n_alpha_words": n_alpha_words,
            "n_stopwords": n_stopwords,
            "n_sym": n_sym,
            "n_lines": n_lines,
            "n_bullet_lines": n_bullet,
            "n_ellipsis_lines": n_ell_end,
            "flag_word_count": f_word_count,
            "flag_mean_word_len": f_mean_word_len,
            "flag_symbol_ratio": f_symbol_ratio,
            "flag_bullet_lines": f_bullet_lines,
            "flag_ellipsis_lines": f_ellipsis_lines,
            "flag_alpha_words": f_alpha_words,
            "flag_stopwords": f_stopwords,
            "keep": keep,
        }
    )


def gopher_quality_flags(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(gopher_quality_flags_batch, batch_format="pyarrow")


def code_quality_flags_batch(batch: pa.Table) -> pa.Table:
    """BigCode/StarCoder-style line-stat quality rules per doc (The Stack
    §filtering: max line length, mean line length, alphanumeric fraction)
    — the code-corpus complement to the natural-language Gopher rules.
    Exact integers only: per doc ``n_lines`` (ALL "\\n"-split segments,
    empty included — that is what a code filter counts), ``max_line_len``,
    ``line_len_sum`` (chars minus newlines), ``n_alnum``,
    ``alnum_per_mille`` (floor), and the three flags + ``keep``:

      - ``flag_max_line``: longest line <= 1000 chars (minified/data blob
        detector),
      - ``flag_mean_line``: mean line length <= 100, cross-multiplied
        (``line_len_sum <= 100 * n_lines``),
      - ``flag_alnum``: alphanumeric fraction >= 1/4
        (``4 * n_alnum >= n_chars``, and nonempty).

    Vectorized: one split + one regex count across the batch, segmented
    max via ``np.maximum.at`` — batch-local, zero shuffle."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = batch.num_rows
    n_chars = pc.utf8_length(text).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_alnum = (
        pc.count_substring_regex(text, "[A-Za-z0-9]")
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    lines = pc.split_pattern(text, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = lines.flatten()
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    flat_len = pc.utf8_length(flat).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_lines = pc.list_value_length(lines).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    max_line = np.zeros(n, dtype=np.int64)
    np.maximum.at(max_line, parents, flat_len)
    line_len_sum = n_chars - (n_lines - 1)  # split yields n_newlines + 1 parts

    f_max_line = (max_line <= 1000).astype(np.int64)
    f_mean_line = (line_len_sum <= 100 * n_lines).astype(np.int64)
    f_alnum = ((n_chars > 0) & (4 * n_alnum >= n_chars)).astype(np.int64)
    keep = f_max_line & f_mean_line & f_alnum
    alnum_pm = np.where(n_chars > 0, (1000 * n_alnum) // np.maximum(n_chars, 1), 0)

    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_lines": n_lines,
            "max_line_len": max_line,
            "line_len_sum": line_len_sum,
            "n_alnum": n_alnum,
            "alnum_per_mille": alnum_pm.astype(np.int64),
            "flag_max_line": f_max_line,
            "flag_mean_line": f_mean_line,
            "flag_alnum": f_alnum,
            "keep": keep,
        }
    )


def code_quality_flags(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(code_quality_flags_batch, batch_format="pyarrow")


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition metrics per doc (integer, oracle-exact):
    n_lines (non-empty), n_dup_lines (lines whose text occurs more than
    once IN the doc, counted with multiplicity), dup_line_per_mille.

    Vectorized: one split across the batch, duplicate detection via Arrow
    group_by on (doc_index, line) — no per-row Python."""
    lines = pc.split_pattern(batch.column("text"), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = lines.flatten()
    parents = pc.list_parent_indices(lines)
    nonempty = pc.not_equal(flat, "")
    t = pa.Table.from_arrays(
        [parents.filter(nonempty), flat.filter(nonempty)], names=["d", "line"]
    )
    per_line = t.group_by(["d", "line"]).aggregate([("line", "count")])
    n = batch.num_rows
    n_lines = np.zeros(n, dtype=np.int64)
    n_dup = np.zeros(n, dtype=np.int64)
    d = per_line.column("d").to_numpy(zero_copy_only=False)
    cnt = per_line.column("line_count").to_numpy(zero_copy_only=False)
    np.add.at(n_lines, d, cnt)
    dup_mask = cnt > 1
    np.add.at(n_dup, d[dup_mask], cnt[dup_mask])
    denom = np.maximum(n_lines, 1)
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_lines": n_lines,
            "n_dup_lines": n_dup,
            "dup_line_per_mille": n_dup * 1000 // denom,
        },
        schema=pa.schema(
            [
                ("doc_id", batch.schema.field("doc_id").type),
                ("n_lines", pa.int64()),
                ("n_dup_lines", pa.int64()),
                ("dup_line_per_mille", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Dataset-level wrappers
# ---------------------------------------------------------------------------


def token_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(token_count_batch, batch_format="pyarrow")


def text_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(text_stats_batch, batch_format="pyarrow")


# Per-worker cache: LangIdActor state is 5 compiled patterns — too cheap
# for an actor pool (pool cold-start lands in every dataset execution; the
# default worker pool persists across runs).
_LANG_ID_CACHE: list = []


def _lang_id_batch(batch: pa.Table) -> pa.Table:
    if not _LANG_ID_CACHE:
        _LANG_ID_CACHE.append(LangIdActor())
    return _LANG_ID_CACHE[0](batch)


def lang_id(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(_lang_id_batch, batch_format="pyarrow")


def _tri_profile_partial(batch: pa.Table, n: int) -> pa.Table:
    """Per-batch (lang, h, cnt) partial counts of char n-gram hashes."""
    from agentic_doc_ray.functions.substr import _gram_hashes

    h, doc_idx, _, _, _ = _gram_hashes(batch.column("text"), n)
    langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
    if len(h) == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "h": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    t = pa.table(
        {
            "lang": pa.array(langs[doc_idx], pa.string()),
            "h": pa.array(h.astype(np.int64)),
        }
    )
    g = t.group_by(["lang", "h"]).aggregate([("h", "count")])
    return g.rename_columns(["lang", "h", "cnt"])


def _lang_profiles(
    docs: "ray.data.Dataset", n: int, top_m: int
) -> "dict[str, np.ndarray]":
    """Global per-language top-m n-gram-hash profiles (Cavnar–Trenkle
    training): partial counts -> one (lang, h) hash aggregate -> local
    top-m partials (valid: counts are FINAL after the aggregate) -> a
    language-keyed merge whose exchange is m-bounded per lang per block.
    The returned dict is langs x top_m hashes — kilobytes, broadcast via
    task closure."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions._exchange import str_key_sentinels

    agg = (
        docs.map_batches(lambda b: _tri_profile_partial(b, n), batch_format="pyarrow")
        .groupby(["lang", "h"], num_partitions=shuffle_partitions(8))
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def local_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        import pandas as pd

        df = batch.to_pandas()
        df = df.sort_values(["lang", "cnt", "h"], ascending=[True, False, True])
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False).head(top_m), preserve_index=False
        ).cast(batch.schema)

    prof_schema = pa.schema(
        [("lang", pa.string()), ("h", pa.int64()), ("cnt", pa.int64())]
    )

    def merge_top(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("h"), pa.scalar(-1)))
        if g.num_rows == 0:
            return prof_schema.empty_table()
        return local_top(g.cast(prof_schema))

    final = (
        agg.map_batches(local_top, batch_format="pyarrow")
        .union(
            str_key_sentinels(prof_schema, "lang", fill={"h": -1, "cnt": 0})
        )
        .groupby("lang", num_partitions=shuffle_partitions(4))
        .map_groups(merge_top, batch_format="pyarrow")
        .take_all()
    )
    out: dict[str, list] = {}
    for r in final:
        out.setdefault(r["lang"], []).append(int(r["h"]))
    return {k: np.array(sorted(v), dtype=np.int64) for k, v in out.items()}


def _char_lang_classify_batch(
    batch: pa.Table, profiles: "dict[str, np.ndarray]", n: int
) -> pa.Table:
    from agentic_doc_ray.functions.substr import _gram_hashes

    h, doc_idx, _, _, _ = _gram_hashes(batch.column("text"), n)
    h = h.astype(np.int64)
    n_docs = batch.num_rows
    n_tri = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    best_lang = np.full(n_docs, "und", dtype=object)
    best_hits = np.zeros(n_docs, dtype=np.int64)
    for lang in sorted(profiles):  # ascending -> first lang wins ties
        mask = np.isin(h, profiles[lang])
        hits = np.bincount(doc_idx[mask], minlength=n_docs).astype(np.int64)
        better = hits > best_hits
        best_hits = np.where(better, hits, best_hits)
        best_lang = np.where(better, lang, best_lang)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(best_lang, pa.string()),
            pa.array(best_hits, pa.int64()),
            pa.array(n_tri, pa.int64()),
        ],
        names=["doc_id", "lang_pred", "n_hits", "n_trigrams"],
    )


def char_ngram_lang_id(
    docs: "ray.data.Dataset", n: int = 3, top_m: int = 256
) -> "ray.data.Dataset":
    """Char n-gram-profile language ID (Cavnar & Trenkle 1994 shape): a
    supervised counterpart to the stopword `lang_id` — train per-language
    top-``top_m`` character n-gram profiles from the corpus's own labels,
    then classify each doc by how many of its n-gram OCCURRENCES hit each
    profile (argmax, ties to the ascending language code). Exact
    integers end to end; n-grams are the shared 61-bit rolling hashes
    (``substr._gram_hashes`` — content-only, batch-independent).

    Scale: training moves one (lang, h) row per distinct pair per batch
    through a hash aggregate bounded by langs x n-gram space, then an
    m-bounded top-m merge; the langs x top_m profile dict (kilobytes)
    ships in the classify closure; classification is batch-local.
    Oracle: bit-equal single-process replica (profiles are global and
    deterministic, classification is row-local)."""
    profiles = _lang_profiles(docs, n, top_m)
    return docs.map_batches(
        lambda b: _char_lang_classify_batch(b, profiles, n),
        batch_format="pyarrow",
    )


def char_lang_id_oracle(docs_tbl: pa.Table, n: int = 3, top_m: int = 256) -> pa.Table:
    """Single-process replica of ``char_ngram_lang_id`` (bit-equal: global
    counts -> (cnt desc, h asc) top-m profiles -> the same row-local
    classify kernel)."""
    part = _tri_profile_partial(docs_tbl, n)
    g = (
        part.group_by(["lang", "h"]).aggregate([("cnt", "sum")])
        .rename_columns(["lang", "h", "cnt"])
    )
    import pandas as pd

    df = g.to_pandas().sort_values(
        ["lang", "cnt", "h"], ascending=[True, False, True]
    )
    top = df.groupby("lang", sort=False).head(top_m)
    profiles = {
        lang: np.array(sorted(sub["h"].tolist()), dtype=np.int64)
        for lang, sub in top.groupby("lang")
    }
    return _char_lang_classify_batch(docs_tbl, profiles, n)


def fingerprints(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow")


def bpe_token_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(bpe_token_count_batch, batch_format="pyarrow")


def repetition_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(repetition_stats_batch, batch_format="pyarrow")


def quality_filter(
    docs: "ray.data.Dataset", min_tokens: int = 20, max_punct_per_mille: int = 100
) -> "ray.data.Dataset":
    """Training-data quality gate: keep documents passing integer-metric
    thresholds. Pure vectorized filter inside map_batches (no ds.filter
    row fn)."""

    def f(batch: pa.Table) -> pa.Table:
        stats = text_stats_batch(batch)
        keep = pc.and_(
            pc.greater_equal(stats.column("n_tokens"), min_tokens),
            pc.less_equal(stats.column("punct_per_mille"), max_punct_per_mille),
        )
        return batch.filter(keep)

    return docs.map_batches(f, batch_format="pyarrow")


def top_bigrams(docs: "ray.data.Dataset", k: int = 100) -> "ray.data.Dataset":
    """Top-k word bigrams (n-gram counting for vocabulary building).

    Bigrams form vectorized: tokens flatten across the batch with parent
    indices, adjacent tokens join in one Arrow kernel, and a same-document
    mask drops the cross-document seams. Same partial-count -> small
    groupby -> sort/limit shape as top_tokens.
    """
    from agentic_doc_ray.context import shuffle_partitions
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks_list, pa.ChunkedArray):
            toks_list = toks_list.combine_chunks()
        flat = toks_list.flatten()
        parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
        n = len(flat)
        if n < 2:
            return pa.Table.from_pydict(
                {"bigram": [], "n": []},
                schema=pa.schema([("bigram", pa.string()), ("n", pa.int64())]),
            )
        joined = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1), " "
        )
        same_doc = parents[:-1] == parents[1:]
        bigrams = joined.filter(pa.array(same_doc))
        t = pa.Table.from_arrays([bigrams], names=["bigram"])
        g = t.group_by("bigram").aggregate([("bigram", "count")])
        return g.rename_columns(["bigram", "n"])

    partials = docs.map_batches(partial, batch_format="pyarrow")
    np_ = shuffle_partitions()
    agg = partials.groupby(
        "bigram", num_partitions=np_
    ).aggregate(Sum("n", alias_name="n"))
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(k)


def top_tfidf_tokens(
    docs: "ray.data.Dataset", n_docs: int, k: int = 100
) -> "ray.data.Dataset":
    """Top-k tokens by an integer tf-idf score: tf_total * n_docs // df.

    df needs distinct docs per token; because each document is ONE input
    row, per-batch distinct (token, doc) counts sum to the global df — no
    global dedup shuffle. The exchange moves one (token, tf, df) partial
    per distinct token per batch. Integer score (floor division) keeps the
    SQL oracle comparison exact (float idf would be order-dependent)."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks)
        t = pa.Table.from_arrays([flat, parents], names=["token", "d"])
        tf = t.group_by("token").aggregate([("token", "count")]).rename_columns(
            ["token", "tf"]
        )
        df = (
            t.group_by(["token", "d"])
            .aggregate([])
            .group_by("token")
            .aggregate([("d", "count")])
            .rename_columns(["token", "df"])
        )
        return tf.join(df, keys="token")

    np_ = shuffle_partitions()
    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token", num_partitions=np_)
        .aggregate(Sum("tf", alias_name="tf"), Sum("df", alias_name="df"))
    )

    def score(batch: pa.Table) -> pa.Table:
        s = pc.divide(
            pc.multiply(batch.column("tf"), pa.scalar(n_docs, pa.int64())),
            batch.column("df"),
        )
        return pa.Table.from_arrays(
            [batch.column("token"), s.cast(pa.int64())], names=["token", "score"]
        )

    return (
        agg.map_batches(score, batch_format="pyarrow")
        .sort(["score", "token"], descending=[True, False])
        .limit(k)
    )


def cooccurrence_counts(
    docs: "ray.data.Dataset", window: int = 2, k: int = 100
) -> "ray.data.Dataset":
    """Top-k token co-occurrence pairs within a +/-``window`` word
    context — the GloVe / word2vec co-occurrence-matrix prep pass
    (Pennington et al. 2014), and the association signal behind query
    expansion and collocation features (``pmi_collocations`` is the
    scored sibling; this is the raw windowed count).

    Pairs are unordered (lexicographic canonical form, byte comparison —
    identical to DuckDB's collation-free least/greatest) and self-pairs
    are excluded. Vectorized per batch: one split, then per offset
    ``o <= window`` a shifted same-document mask pairs ``flat[i]`` with
    ``flat[i+o]`` — no per-token Python. The exchange moves one row per
    distinct pair per batch (per-batch partial counts), never one per
    occurrence; the deterministic (n DESC, tok_a, tok_b) top-k bounds the
    output. At crawl scale the distinct-pair space is the cost driver —
    cap it upstream with a vocabulary gate if needed (the ``top_tokens``
    exchange provides one)."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    pair_schema = pa.schema(
        [("tok_a", pa.string()), ("tok_b", pa.string()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        lo_parts, hi_parts = [], []
        for off in range(1, window + 1):
            if len(flat) <= off:
                continue
            same = pa.array(parents[off:] == parents[:-off])
            a = flat.slice(0, len(flat) - off).filter(same)
            b = flat.slice(off).filter(same)
            swap = pc.greater(a, b)
            lo = pc.if_else(swap, b, a)
            hi = pc.if_else(swap, a, b)
            neq = pc.not_equal(lo, hi)  # no self-pairs
            lo_parts.append(lo.filter(neq))
            hi_parts.append(hi.filter(neq))
        if not lo_parts:
            return pair_schema.empty_table()
        t = pa.Table.from_arrays(
            [pa.concat_arrays(lo_parts), pa.concat_arrays(hi_parts)],
            names=["tok_a", "tok_b"],
        )
        return (
            t.group_by(["tok_a", "tok_b"])
            .aggregate([("tok_a", "count")])
            .rename_columns(["tok_a", "tok_b", "n"])
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["tok_a", "tok_b"], num_partitions=shuffle_partitions())
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.sort(
        ["n", "tok_a", "tok_b"], descending=[True, False, False]
    ).limit(k)


def source_vocab_overlap(
    docs: "ray.data.Dataset", n_buckets: int = 64
) -> "ray.data.Dataset":
    """Pairwise vocabulary overlap between sources — the wimbd-style
    cross-corpus comparison (Elazar et al. 2024): for every source pair,
    the exact count of shared distinct tokens, each side's distinct
    vocabulary size, and the floor per-mille Jaccard. The
    which-corpora-are-redundant signal when composing a pretraining
    mixture from many crawls/dumps.

    Scale shape: batch-local distinct (source, token) partials, ONE
    token-hash bucket exchange (buckets partition the token space, so
    per-bucket distinct counts and pair counts SUM to the global
    values); inside a bucket, tokens dictionary-encode and the shared
    degree-class pair generator (``graph._wedge_pairs``) emits each
    token's source pairs with no per-token Python. Pair space is
    |sources|^2/2 — tiny — so the final fold is O(pairs). Pairs with
    zero shared tokens are omitted (matching the SQL join oracle)."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions._exchange import int_key_sentinels

    ex_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("source", pa.string()),
            ("token", pa.string()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        src = batch.column("source").filter(nonempty)
        toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks)
        t = (
            pa.Table.from_arrays(
                [src.take(parents), flat], names=["source", "token"]
            )
            .group_by(["source", "token"])
            .aggregate([])
        )
        # process-stable string bucket (hash() is salted per worker —
        # the same token MUST reach one bucket from every batch)
        from agentic_doc_ray.functions.dedup import _str_bucket

        bucket = _str_bucket(t.column("token"), n_buckets)
        return pa.Table.from_arrays(
            [bucket, t.column("source"), t.column("token")], schema=ex_schema
        )

    pair_schema = pa.schema(
        [
            ("source_a", pa.string()),
            ("source_b", pa.string()),
            ("n_common", pa.int64()),
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
        ]
    )

    def overlap_bucket(group: pa.Table) -> pa.Table:
        from agentic_doc_ray.functions.graph import _wedge_pairs

        g = group.filter(pc.not_equal(group.column("source"), ""))
        if g.num_rows == 0:
            return pair_schema.empty_table()
        # global distinct within the bucket (a (source, token) pair can
        # arrive from many batches)
        g = (
            g.select(["source", "token"])
            .group_by(["source", "token"])
            .aggregate([])
        )
        # per-source distinct vocabulary share of this bucket
        per_src = (
            g.group_by("source")
            .aggregate([("token", "count")])
            .rename_columns(["source", "n"])
        )
        srcs = sorted(per_src.column("source").to_pylist())
        n_of = {r["source"]: r["n"] for r in per_src.to_pylist()}
        order = pc.sort_indices(
            g, sort_keys=[("token", "ascending"), ("source", "ascending")]
        )
        g = g.take(order)
        tok = g.column("token").to_pandas().to_numpy(dtype=object)
        # dictionary-encode tokens to int apexes for the pair generator;
        # source ids via vectorized searchsorted (no per-row Python)
        _, apex = np.unique(tok, return_inverse=True)
        srcs_arr = np.array(srcs, dtype=object)
        nb = np.searchsorted(
            srcs_arr, g.column("source").to_pandas().to_numpy(dtype=object)
        ).astype(np.int64)
        x, y, _ = _wedge_pairs(apex.astype(np.int64), nb)
        rows = []
        if len(x):
            pair_key = x * len(srcs) + y
            uniqp, cnts = np.unique(pair_key, return_counts=True)
            for pk, c in zip(uniqp, cnts):
                a, b = srcs[int(pk) // len(srcs)], srcs[int(pk) % len(srcs)]
                rows.append(
                    {
                        "source_a": a,
                        "source_b": b,
                        "n_common": int(c),
                        "n_a": 0,
                        "n_b": 0,
                    }
                )
        # per-source sizes ride the same exchange output: attach them to
        # a canonical self-pair row so the final fold can redistribute
        for s in srcs:
            rows.append(
                {
                    "source_a": s,
                    "source_b": s,
                    "n_common": 0,
                    "n_a": int(n_of[s]),
                    "n_b": int(n_of[s]),
                }
            )
        return pa.Table.from_pylist(rows, schema=pair_schema)

    folded = (
        docs.map_batches(partial, batch_format="pyarrow")
        .union(
            int_key_sentinels(
                ex_schema, "bucket", fill={"source": "", "token": ""}
            )
        )
        .groupby("bucket", num_partitions=shuffle_partitions())
        .map_groups(overlap_bucket, batch_format="pyarrow")
        .groupby(["source_a", "source_b"], num_partitions=2)
        .aggregate(
            Sum("n_common", alias_name="n_common"),
            Sum("n_a", alias_name="n_a"),
        )
    ).take_all()  # bounded by |sources|^2 rows

    sizes = {
        r["source_a"]: int(r["n_a"])
        for r in folded
        if r["source_a"] == r["source_b"]
    }
    out = []
    for r in folded:
        a, b = r["source_a"], r["source_b"]
        if a == b:
            continue
        common = int(r["n_common"])
        if common == 0:
            continue
        na, nb_ = sizes[a], sizes[b]
        union = na + nb_ - common
        out.append(
            {
                "source_a": a,
                "source_b": b,
                "n_common": common,
                "n_a": na,
                "n_b": nb_,
                "jaccard_per_mille": 1000 * common // union,
            }
        )
    out_schema = pa.schema(
        [
            ("source_a", pa.string()),
            ("source_b", pa.string()),
            ("n_common", pa.int64()),
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("jaccard_per_mille", pa.int64()),
        ]
    )
    return ray.data.from_arrow(
        pa.Table.from_pylist(sorted(out, key=lambda r: (r["source_a"], r["source_b"])), schema=out_schema)
    )


def top_tokens(docs: "ray.data.Dataset", k: int = 100) -> "ray.data.Dataset":
    """Vocabulary building: top-k most frequent whitespace tokens.

    explode tokens vectorized -> per-batch partial counts -> small global
    groupby -> sort/limit. The shuffle moves one row per distinct token per
    batch, not one per token occurrence.
    """
    from agentic_doc_ray.context import shuffle_partitions
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        flat = toks.flatten() if not isinstance(toks, pa.ChunkedArray) else toks.combine_chunks().flatten()
        t = pa.Table.from_arrays([flat], names=["token"])
        g = t.group_by("token").aggregate([("token", "count")])
        return g.rename_columns(["token", "n"])

    partials = docs.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(
        "token", num_partitions=shuffle_partitions()
    ).aggregate(Sum("n", alias_name="n"))
    # deterministic tie-break: count desc, token asc
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


def neg_sampling_table(
    docs: "ray.data.Dataset", k: int = 4096
) -> "ray.data.Dataset":
    """word2vec negative-sampling table (Mikolov et al. 2013): the top-k
    vocabulary with EXACT integer ``count^(3/4)`` sampling weights and
    the cumulative ranges a sampler bisects into.

    weight = isqrt(n * isqrt(n)) = floor(n^0.75) computed with
    ``math.isqrt`` — no floats, so the DuckDB oracle (which uses
    ``floor(sqrt(...))``; correctly-rounded double sqrt agrees with isqrt
    for all arguments <= 2^51, i.e. token counts <= 2^34 ~ 1.7e10) is
    exact. Rows are ordered by (n DESC, token ASC); ``cum_lo``/``cum_hi``
    are the half-open prefix ranges of the weights in that order.

    Shape: the ``top_tokens`` exchange (per-batch partial counts, one row
    per distinct token per batch; the tiny global groupby) -> sort/limit
    to the k-bounded table -> driver cumsum over k rows. The collect is
    k-bounded by construction — the table is the artifact a trainer holds
    in memory — and the cap is the op's contract (tail tokens are not
    sampled), mirroring fixed-vocab practice; k and the vocabulary size
    are both in the output domain, nothing silent.
    """
    from math import isqrt

    top = top_tokens(docs, k=k).take_all()
    # deterministic order is already (n desc, token asc) from top_tokens
    rows = [(r["token"], int(r["n"])) for r in top]
    weights = [isqrt(n * isqrt(n)) for _, n in rows]
    cum = np.concatenate(([0], np.cumsum(np.array(weights, dtype=object))))
    out = pa.Table.from_pydict(
        {
            "token": [t for t, _ in rows],
            "n": pa.array([n for _, n in rows], pa.int64()),
            "weight": pa.array(weights, pa.int64()),
            "cum_lo": pa.array([int(x) for x in cum[:-1]], pa.int64()),
            "cum_hi": pa.array([int(x) for x in cum[1:]], pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def _commonness_batch(batch: pa.Table, vocab: "object") -> pa.Table:
    import pandas as pd

    trimmed = _regex_trim(batch.column("text"))
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    nonempty = pc.not_equal(trimmed, "")
    toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    # vectorized hashtable lookup; out-of-vocab (capped vocabulary) -> 0
    mapped = (
        pd.Series(flat.to_numpy(zero_copy_only=False))
        .map(vocab)
        .fillna(0)
        .to_numpy(dtype=np.int64)
    )
    # per-doc segment sums via prefix-sum differences (exact for empty
    # segments — same shape as stages/explode.py doc_type aggregation)
    starts = np.concatenate(([0], np.cumsum(lens[:-1]))) if len(lens) else np.zeros(0, np.int64)
    cs = np.concatenate(([0], np.cumsum(mapped)))
    seg = cs[starts + lens] - cs[starts] if len(lens) else np.zeros(0, np.int64)

    n_docs = batch.num_rows
    freq_sum = np.zeros(n_docs, np.int64)
    n_tokens = np.zeros(n_docs, np.int64)
    idx = np.flatnonzero(nonempty.to_numpy(zero_copy_only=False))
    freq_sum[idx] = seg
    n_tokens[idx] = lens
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(freq_sum, pa.int64()),
            pa.array(n_tokens, pa.int64()),
        ],
        names=["doc_id", "freq_sum", "n_tokens"],
    )


def token_commonness(
    docs: "ray.data.Dataset", max_vocab: int = 1 << 20
) -> "ray.data.Dataset":
    """CCNet-style unigram quality signal, integer-exact.

    Per document: ``freq_sum`` = sum over its tokens of that token's
    GLOBAL corpus frequency, and ``n_tokens`` — both integers, so the
    DuckDB oracle comparison is exact. The consumer derives the float
    quality score (mean log-frequency / perplexity proxy) from the two.

    Shape: pass 1 builds the vocabulary with the same partial-count ->
    small-groupby exchange as ``top_tokens`` (one row per distinct token
    per batch moves, never one per occurrence); the resulting (token,
    count) table — the small side — is broadcast once via ``ray.put`` and
    probed with a vectorized pandas hashtable ``map`` in pass 2. The
    corpus is scanned twice, both passes streaming.

    Scale: the vocabulary is capped at ``max_vocab`` most-frequent tokens
    (fixed-vocab LM practice); out-of-cap tokens score 0 and the
    truncation is LOGGED, never silent. At the default 2^20 cap the
    broadcast is tens of MB — one object-store copy per node.
    """
    import logging

    import ray

    from agentic_doc_ray.context import shuffle_partitions
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        t = pa.Table.from_arrays([toks.flatten()], names=["token"])
        g = t.group_by("token").aggregate([("token", "count")])
        return g.rename_columns(["token", "n"])

    np_ = shuffle_partitions()
    vocab_ds = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token", num_partitions=np_)
        .aggregate(Sum("n", alias_name="n"))
    )
    # Ray's hash-aggregate finalizer emits SCHEMA-LESS blocks for empty
    # partitions (the "new schema: ." artifact) — drop them before concat.
    # materialize() first: to_arrow_refs() on a LAZY dataset re-executes
    # the whole plan a second time for its schema fetch (limit=1 run)
    blocks = [
        b for b in ray.get(vocab_ds.materialize().to_arrow_refs()) if b.num_rows
    ]
    vocab_t = (
        pa.concat_tables(blocks)
        if blocks
        else pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    )
    if vocab_t.num_rows > max_vocab:
        logging.getLogger(__name__).warning(
            "token_commonness: vocabulary %d > cap %d; keeping the %d "
            "most frequent, out-of-cap tokens score 0",
            vocab_t.num_rows, max_vocab, max_vocab,
        )
        order = pc.sort_indices(
            vocab_t,
            sort_keys=[("n", "descending"), ("token", "ascending")],
        )
        vocab_t = vocab_t.take(order.slice(0, max_vocab))
    import pandas as pd

    vocab = pd.Series(
        vocab_t.column("n").to_numpy(zero_copy_only=False),
        index=vocab_t.column("token").to_numpy(zero_copy_only=False),
    )
    vocab_ref = ray.put(vocab)

    def score(batch: pa.Table, *, _ref=vocab_ref) -> pa.Table:
        # per-worker cache: deserialize the broadcast once per process,
        # not per batch (plain tasks; cheap state needs no actor pool)
        cache = score.__dict__
        if "vocab" not in cache:
            cache["vocab"] = ray.get(_ref)
        return _commonness_batch(batch, cache["vocab"])

    return docs.map_batches(score, batch_format="pyarrow")


def chunk_windows_batch(
    batch: pa.Table, window: int = 64, stride: int = 48
) -> pa.Table:
    """(doc_id, text) -> one row per token window: context-window chunking
    for pretraining (fixed ``window`` tokens, overlapping by ``window -
    stride``). Chunk k covers tokens [k*stride, min(k*stride+window, n));
    a doc emits ``1 + ceil((n-window)/stride)`` chunks (1 if n <= window),
    so the final chunk always ends at the last token and every token is
    covered. chunk_text is the single-space join of the window's tokens
    (canonical detokenization — the oracle reproduces it with
    array_to_string over the same regexp split).

    Fully vectorized and batch-local (zero shuffle): token slicing is one
    pc.take over the flattened token values with numpy-computed indices,
    join is one pc.binary_join.
    """
    doc_ids = batch.column("doc_id").combine_chunks()
    trimmed = _regex_trim(batch.column("text").combine_chunks())
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = (off[1:] - off[:-1]).astype(np.int64)
    # empty-trimmed docs split to [""] — they emit no chunks
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    n = np.where(empty, 0, n)

    n_chunks = np.where(
        n <= window, 1, 1 + (n - window + stride - 1) // stride
    )
    n_chunks = np.where(n > 0, n_chunks, 0)
    total_c = int(n_chunks.sum())
    out_schema = pa.schema(
        [
            ("doc_id", doc_ids.type),
            ("chunk_idx", pa.int64()),
            ("start_tok", pa.int64()),
            ("end_tok", pa.int64()),
            ("n_tokens", pa.int64()),
            ("chunk_text", pa.string()),
        ]
    )
    if total_c == 0:
        return out_schema.empty_table()

    parents = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    cbase = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
    k = np.arange(total_c, dtype=np.int64) - cbase[parents]
    start = k * stride
    end = np.minimum(start + window, n[parents])
    lens = end - start

    tok_base = off[parents] + start
    tstart = np.concatenate(([0], np.cumsum(lens)))
    idx = (
        np.arange(int(tstart[-1]), dtype=np.int64)
        - np.repeat(tstart[:-1], lens)
        + np.repeat(tok_base, lens)
    )
    taken = pc.take(toks.values, pa.array(idx, pa.int64()))
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(tstart, pa.int32()), taken
    )
    chunk_text = pc.binary_join(chunk_lists, pa.scalar(" "))
    return pa.Table.from_arrays(
        [
            pc.take(doc_ids, pa.array(parents, pa.int64())),
            pa.array(k, pa.int64()),
            pa.array(start, pa.int64()),
            pa.array(end, pa.int64()),
            pa.array(lens, pa.int64()),
            chunk_text,
        ],
        schema=out_schema,
    )


def chunk_windows(
    docs: "ray.data.Dataset", window: int = 64, stride: int = 48
) -> "ray.data.Dataset":
    """Distributed context-window chunking (see chunk_windows_batch)."""
    return docs.map_batches(
        lambda b: chunk_windows_batch(b, window=window, stride=stride),
        batch_format="pyarrow",
    )


# --- bigram language-model scoring (CCNet-style perplexity signal) ------
#
# Per-bigram log-likelihoods are rounded to INTEGER micro-bits BEFORE the
# per-doc sum: the elementwise float op (log2 of a count ratio) is
# deterministic, and integer segment sums are batching-independent, so the
# distributed run is bit-equal to the single-process replica oracle no
# matter how blocks split. (A float per-doc sum would drift in the last
# ulp with batch boundaries.)
_LM_SCALE = 1_000_000


def _bigram_partial(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> partial (bigram, n) counts for the batch."""
    trimmed = _regex_trim(batch.column("text"))
    nonempty = pc.not_equal(trimmed, "")
    toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    n = len(flat)
    if n < 2:
        return pa.table(
            {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    joined = pc.binary_join_element_wise(flat.slice(0, n - 1), flat.slice(1), " ")
    bigrams = joined.filter(pa.array(parents[:-1] == parents[1:]))
    g = pa.Table.from_arrays([bigrams], names=["bigram"]).group_by(
        "bigram"
    ).aggregate([("bigram", "count")])
    return g.rename_columns(["bigram", "n"])


def _first_partial(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> partial (token, n) counts of bigram-FIRST tokens
    (every token occurrence except each document's last)."""
    trimmed = _regex_trim(batch.column("text"))
    nonempty = pc.not_equal(trimmed, "")
    toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    n = len(flat)
    if n < 2:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    firsts = flat.slice(0, n - 1).filter(pa.array(parents[:-1] == parents[1:]))
    g = pa.Table.from_arrays([firsts], names=["token"]).group_by(
        "token"
    ).aggregate([("token", "count")])
    return g.rename_columns(["token", "n"])


def _firsts_from_bigrams(btbl: pa.Table) -> pa.Table:
    """UNCAPPED bigram counts -> bigram-first token counts. Exactly equal
    to aggregating ``_first_partial`` because every counted bigram "w1 w2"
    contributes its occurrences to C_first(w1) and tokens cannot contain
    the joining space."""
    if btbl.num_rows == 0:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    first = pc.list_element(pc.split_pattern(btbl.column("bigram"), " "), 0)
    g = (
        pa.Table.from_arrays(
            [first, btbl.column("n")], names=["token", "n"]
        )
        .group_by("token")
        .aggregate([("n", "sum")])
    )
    return g.rename_columns(["token", "n"])


def _cap_counts(t: pa.Table, key: str, max_vocab: int, label: str) -> pa.Table:
    if t.num_rows > max_vocab:
        import logging

        logging.getLogger(__name__).warning(
            "bigram_lm: %s table %d > cap %d; keeping the %d most frequent "
            "— out-of-cap entries score as OOV (counted, never silent)",
            label, t.num_rows, max_vocab, max_vocab,
        )
        order = pc.sort_indices(
            t, sort_keys=[("n", "descending"), (key, "ascending")]
        )
        t = t.take(order.slice(0, max_vocab))
    return t


def _lm_score_batch(batch: pa.Table, bmap, fmap) -> pa.Table:
    """Score one batch against broadcast count tables (pandas Series:
    bigram->count, first-token->count). All outputs integer."""
    import pandas as pd

    trimmed = _regex_trim(batch.column("text"))
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    nonempty = pc.not_equal(trimmed, "")
    toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    n = len(flat)

    n_docs = batch.num_rows
    n_bigrams = np.zeros(n_docs, np.int64)
    n_scored = np.zeros(n_docs, np.int64)
    nll_micro = np.zeros(n_docs, np.int64)
    idx = np.flatnonzero(nonempty.to_numpy(zero_copy_only=False))

    if n >= 2:
        same = parents[:-1] == parents[1:]
        joined = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1), " "
        ).filter(pa.array(same))
        firsts = flat.slice(0, n - 1).filter(pa.array(same))
        seg = parents[:-1][same]  # nonempty-doc-local parent per bigram

        nb = pd.Series(joined.to_numpy(zero_copy_only=False)).map(bmap).to_numpy(
            dtype=np.float64, na_value=np.nan
        )
        nf = pd.Series(firsts.to_numpy(zero_copy_only=False)).map(fmap).to_numpy(
            dtype=np.float64, na_value=np.nan
        )
        scored = ~(np.isnan(nb) | np.isnan(nf))
        ll_micro = np.zeros(len(nb), np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            ll = np.log2(nb[scored] / nf[scored])
        ll_micro[scored] = np.round(ll * _LM_SCALE).astype(np.int64)

        n_ne = int(parents[-1]) + 1 if n else 0
        bc = np.bincount(seg, minlength=n_ne).astype(np.int64)
        sc = np.bincount(seg, weights=scored.astype(np.float64), minlength=n_ne)
        nl = np.bincount(seg, weights=ll_micro.astype(np.float64), minlength=n_ne)
        # bincount weights are float64 — exact for the int64 magnitudes
        # here (|sum| < 2^53: micro-bits per doc cap out far below that)
        n_bigrams[idx[:n_ne]] = bc
        n_scored[idx[:n_ne]] = np.round(sc).astype(np.int64)
        nll_micro[idx[:n_ne]] = -np.round(nl).astype(np.int64)

    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_bigrams, pa.int64()),
            pa.array(n_scored, pa.int64()),
            pa.array(nll_micro, pa.int64()),
        ],
        names=["doc_id", "n_bigrams", "n_scored", "nll_micro"],
    )


def _counts_to_series(t: pa.Table, key: str):
    import pandas as pd

    return pd.Series(
        t.column("n").to_numpy(zero_copy_only=False),
        index=t.column(key).to_numpy(zero_copy_only=False),
    )


def bigram_lm_score(
    docs: "ray.data.Dataset",
    max_vocab: int = 1 << 22,
    keep_cols: tuple = (),
) -> "ray.data.Dataset":
    """Per-document bigram-LM negative log-likelihood (micro-bits), the
    CCNet-style perplexity quality signal, integer-exact end to end.

    Model: corpus MLE ``p(w2|w1) = C(w1 w2) / C_first(w1)`` trained on the
    full corpus (each doc scores against the corpus including itself —
    deterministic, no train/test split needed for a quality SIGNAL).
    ``nll_micro = -sum round(log2(p) * 1e6)`` over the doc's bigrams in
    order; ``n_scored`` counts bigrams inside the (capped) tables.

    Shape: two streaming count passes (partial per-batch group_by -> one
    small exchange each — one row per DISTINCT bigram/token per batch
    moves, never per occurrence), the count tables broadcast once via
    ray.put, then one streaming scoring pass with vectorized hashtable
    probes. Caps at ``max_vocab`` rows per table (logged, OOV counted).
    """
    import ray as _ray

    from agentic_doc_ray.context import shuffle_partitions
    from ray.data.aggregate import Sum

    np_ = shuffle_partitions()

    def collect(ds, key):
        # materialize first: to_arrow_refs on a lazy plan runs it TWICE
        # (once for blocks, once limit=1 for schema)
        blocks = [
            b for b in _ray.get(ds.materialize().to_arrow_refs()) if b.num_rows
        ]
        if not blocks:
            return pa.table(
                {key: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        return pa.concat_tables(blocks).combine_chunks()

    btbl = collect(
        docs.map_batches(_bigram_partial, batch_format="pyarrow")
        .groupby("bigram", num_partitions=np_)
        .aggregate(Sum("n", alias_name="n")),
        "bigram",
    )
    # first-token counts DERIVE from the bigram table (C_first(w1) =
    # sum_w2 C(w1 w2); tokens contain no whitespace, so w1 is the bigram
    # up to its first space) — identical counts to a dedicated pass
    # (pinned by test_property.py), one fewer corpus read + exchange
    ftbl = _firsts_from_bigrams(btbl)
    bmap = _counts_to_series(_cap_counts(btbl, "bigram", max_vocab, "bigram"), "bigram")
    fmap = _counts_to_series(_cap_counts(ftbl, "token", max_vocab, "first-token"), "token")
    bref, fref = _ray.put(bmap), _ray.put(fmap)

    def score(batch: pa.Table, *, _b=bref, _f=fref) -> pa.Table:
        cache = score.__dict__
        if "b" not in cache:
            cache["b"], cache["f"] = _ray.get(_b), _ray.get(_f)
        out = _lm_score_batch(batch, cache["b"], cache["f"])
        for c in keep_cols:  # row order is preserved 1:1 by the scorer
            out = out.append_column(c, batch.column(c))
        return out

    return docs.map_batches(score, batch_format="pyarrow")


def bigram_lm_oracle(docs_tbl: pa.Table, max_vocab: int = 1 << 22) -> pa.Table:
    """Single-process replica of ``bigram_lm_score``: the same partial
    count fns applied to the whole corpus as ONE batch (a complete
    group_by), the same cap rule, the same scoring batch fn — bit-equal
    by construction."""
    btbl = _cap_counts(_bigram_partial(docs_tbl), "bigram", max_vocab, "bigram")
    ftbl = _cap_counts(_first_partial(docs_tbl), "token", max_vocab, "first-token")
    return _lm_score_batch(
        docs_tbl,
        _counts_to_series(btbl, "bigram"),
        _counts_to_series(ftbl, "token"),
    )


_CCNET_UNIT = 10_000  # micro-bits -> centi-bits per scored bigram
_CCNET_NAMES = np.array(["head", "middle", "tail"])


def _ccnet_key(nll_micro: np.ndarray, n_scored: np.ndarray) -> np.ndarray:
    """Length-normalized perplexity key: centi-bits per scored bigram
    (integer floor division — SQL-expressible, and the /100 quantization
    bounds the key's cardinality to a few thousand distinct values so the
    boundary pass moves a DISTRIBUTION, not rows). Unscored docs key 0."""
    v = np.zeros(len(nll_micro), np.int64)
    pos = n_scored > 0
    v[pos] = nll_micro[pos] // (n_scored[pos] * _CCNET_UNIT)
    return v


def _ccnet_partial(batch: pa.Table) -> pa.Table:
    v = _ccnet_key(
        batch.column("nll_micro").to_numpy(zero_copy_only=False),
        batch.column("n_scored").to_numpy(zero_copy_only=False),
    )
    t = pa.Table.from_arrays(
        [batch.column("lang"), pa.array(v, pa.int64())], names=["lang", "ppl_cb"]
    )
    g = t.group_by(["lang", "ppl_cb"]).aggregate([("ppl_cb", "count")])
    return g.rename_columns(["lang", "ppl_cb", "n"])


def _ccnet_assign(batch: pa.Table, bounds_by_lang: dict) -> pa.Table:
    v = _ccnet_key(
        batch.column("nll_micro").to_numpy(zero_copy_only=False),
        batch.column("n_scored").to_numpy(zero_copy_only=False),
    )
    lang = batch.column("lang").to_numpy(zero_copy_only=False)
    b = np.zeros(len(v), np.int64)
    for lg in np.unique(lang):
        m = lang == lg
        b[m] = np.searchsorted(bounds_by_lang[lg], v[m], side="left")
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            batch.column("lang"),
            pa.array(v, pa.int64()),
            pa.array(_CCNET_NAMES[b]),
        ],
        names=["doc_id", "lang", "ppl_cb", "bucket"],
    )


def ccnet_buckets(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """CCNet-style per-language perplexity buckets (Wenzek et al. 2020):
    each document lands in the head / middle / tail TERCILE of its
    language's bigram-LM perplexity distribution — the canonical
    quality-stratification step before pretraining-mixture sampling.

    Shape: one LM scoring pass (``bigram_lm_score`` — two count
    exchanges + broadcast probe), materialized ONCE so the boundary pass
    and the assignment pass don't retrain the LM (the scored table is a
    few int64 columns — ~1/1000 of corpus bytes); then the same
    sketch-then-map composition as ``quantile_bins``: a (lang, key)
    DISTRIBUTION streams to the driver (bounded by key cardinality —
    the /100 quantization caps it at a few thousand per language, never
    row count), per-language tercile bounds broadcast in the task
    closure, and one vectorized searchsorted per batch. Zero row
    shuffles beyond the LM's own count exchanges.

    ``docs`` must carry (doc_id, text, lang).
    """
    from agentic_doc_ray.functions.sketches import _quantile_bounds

    scored = bigram_lm_score(docs, keep_cols=("lang",)).materialize()
    dist: dict[str, dict[int, int]] = {}
    for r in scored.map_batches(_ccnet_partial, batch_format="pyarrow").take_all():
        d = dist.setdefault(r["lang"], {})
        d[r["ppl_cb"]] = d.get(r["ppl_cb"], 0) + r["n"]
    bounds = {lg: _quantile_bounds(d, 3) for lg, d in dist.items()}

    def assign(batch: pa.Table) -> pa.Table:
        return _ccnet_assign(batch, bounds)

    return scored.map_batches(assign, batch_format="pyarrow")


def ccnet_buckets_oracle(docs_tbl: pa.Table, max_vocab: int = 1 << 22) -> pa.Table:
    """Single-process replica: the same LM oracle, the same distribution
    rule and the same assignment kernel on the whole corpus as one
    batch."""
    from agentic_doc_ray.functions.sketches import _quantile_bounds

    scored = bigram_lm_oracle(docs_tbl, max_vocab).append_column(
        "lang", docs_tbl.column("lang")
    )
    dist: dict[str, dict[int, int]] = {}
    for r in _ccnet_partial(scored).to_pylist():
        d = dist.setdefault(r["lang"], {})
        d[r["ppl_cb"]] = d.get(r["ppl_cb"], 0) + r["n"]
    bounds = {lg: _quantile_bounds(d, 3) for lg, d in dist.items()}
    return _ccnet_assign(scored, bounds)


def domain_prior(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Domain-level quality prior joined back onto every document (the
    RefinedWeb/DCLM-style domain filter input): per ``source`` domain, its
    total doc count and DISTINCT-content count (md5 keys, the exact_dedup
    contract), annotated onto each row so a downstream filter can cut
    whole low-quality / high-duplication domains.

    Shape: per-batch partial group_by (source, md5) -> ONE exchange keyed
    on the composite (one row per distinct pair per batch, never per doc)
    -> per-batch projection to per-source partials -> a second exchange
    whose key space is the DOMAIN count (tiny) -> the per-domain table is
    broadcast once and probed with a vectorized hashtable map. Documents
    themselves never shuffle.
    """
    import ray as _ray

    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions.dedup import _md5_hex
    from ray.data.aggregate import Sum

    np_ = shuffle_partitions()

    def pair_partial(batch: pa.Table) -> pa.Table:
        h = pa.array(_md5_hex(batch.column("text").to_pylist()))
        t = pa.Table.from_arrays(
            [batch.column("source"), h], names=["source", "h"]
        )
        g = t.group_by(["source", "h"]).aggregate([("h", "count")])
        return g.rename_columns(["source", "h", "n"])

    pairs = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["source", "h"], num_partitions=np_)
        .aggregate(Sum("n", alias_name="n"))
    )

    def src_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "source" not in batch.schema.names:
            # Ray's hash-aggregate finalizer emits SCHEMA-LESS blocks for
            # empty partitions — keep the typed schema alive downstream
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "src_n_docs": pa.array([], pa.int64()),
                    "src_n_distinct": pa.array([], pa.int64()),
                }
            )
        g = batch.group_by("source").aggregate(
            [("n", "sum"), ("n", "count")]
        )
        return g.rename_columns(["source", "src_n_docs", "src_n_distinct"])

    per_src = (
        pairs.map_batches(src_partial, batch_format="pyarrow")
        .groupby("source", num_partitions=shuffle_partitions(4))
        .aggregate(
            Sum("src_n_docs", alias_name="src_n_docs"),
            Sum("src_n_distinct", alias_name="src_n_distinct"),
        )
    )
    blocks = [
        b for b in _ray.get(per_src.materialize().to_arrow_refs()) if b.num_rows
    ]  # materialize: lazy to_arrow_refs re-executes the plan for schema
    src_t = (
        pa.concat_tables(blocks).combine_chunks()
        if blocks
        else pa.table(
            {
                "source": pa.array([], pa.string()),
                "src_n_docs": pa.array([], pa.int64()),
                "src_n_distinct": pa.array([], pa.int64()),
            }
        )
    )
    import pandas as pd

    nd = pd.Series(
        src_t.column("src_n_docs").to_numpy(zero_copy_only=False),
        index=src_t.column("source").to_numpy(zero_copy_only=False),
    )
    nu = pd.Series(
        src_t.column("src_n_distinct").to_numpy(zero_copy_only=False),
        index=src_t.column("source").to_numpy(zero_copy_only=False),
    )
    ref = _ray.put((nd, nu))

    def annotate(batch: pa.Table, *, _ref=ref) -> pa.Table:
        cache = annotate.__dict__
        if "m" not in cache:
            cache["m"] = _ray.get(_ref)
        nd_, nu_ = cache["m"]
        src = pd.Series(batch.column("source").to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("source"),
                pa.array(src.map(nd_).to_numpy(dtype=np.int64)),
                pa.array(src.map(nu_).to_numpy(dtype=np.int64)),
            ],
            names=["doc_id", "source", "src_n_docs", "src_n_distinct"],
        )

    return docs.map_batches(annotate, batch_format="pyarrow")


def compression_stats_batch(batch: pa.Table, level: int = 6) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_bytes, n_compressed): the
    Gopher-style compression-ratio quality signal (boilerplate and
    repetitive spam compress far better than natural prose; a consumer
    filters on n_compressed/n_bytes). zlib at a fixed level is
    deterministic for a fixed library, so the single-process replica
    oracle is bit-equal. Per-doc zlib.compress is a C call per row (the
    md5 pattern in exact_dedup); the Arrow column converts once per
    batch, not per row."""
    texts = batch.column("text").to_pylist()
    n_bytes = np.zeros(len(texts), np.int64)
    n_comp = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        raw = (t or "").encode()
        n_bytes[i] = len(raw)
        n_comp[i] = len(zlib.compress(raw, level))
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_bytes, pa.int64()),
            pa.array(n_comp, pa.int64()),
        ],
        names=["doc_id", "n_bytes", "n_compressed"],
    )


def compression_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed compression-ratio signal (see compression_stats_batch).
    Batch-local, zero shuffle."""
    return docs.map_batches(compression_stats_batch, batch_format="pyarrow")


# RE2-safe sentence boundary (no lookbehind — RE2 has none, and DuckDB
# must split identically): the terminator run is CONSUMED by the split,
# so sentences carry no trailing punctuation by definition.
_SENT_PATTERN = r"[.!?]+\s+|[.!?]+$"


def split_sentences_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> one row per sentence: (doc_id, sent_idx,
    sentence). Sentences are the ASCII-trimmed non-empty segments after
    splitting on terminator runs; sent_idx is the 0-based order within
    the document. Fully vectorized and batch-local (zero shuffle):
    one RE2 split kernel, one trim kernel, numpy run-length cumcounts."""
    doc_ids = batch.column("doc_id").combine_chunks()
    segs = pc.split_pattern_regex(
        batch.column("text").combine_chunks(), _SENT_PATTERN
    )
    if isinstance(segs, pa.ChunkedArray):
        segs = segs.combine_chunks()
    flat = segs.flatten()
    parents = pc.list_parent_indices(segs)
    trimmed = _regex_trim(flat)
    keep = pc.not_equal(trimmed, "")
    sent = trimmed.filter(keep)
    par = parents.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)

    out_schema = pa.schema(
        [
            ("doc_id", doc_ids.type),
            ("sent_idx", pa.int64()),
            ("sentence", pa.string()),
        ]
    )
    if len(par) == 0:
        return out_schema.empty_table()
    # 0-based cumcount within each parent run (parents are nondecreasing)
    change = np.concatenate(([True], par[1:] != par[:-1]))
    run_starts = np.flatnonzero(change)
    run_lens = np.diff(np.concatenate((run_starts, [len(par)])))
    sent_idx = np.arange(len(par), dtype=np.int64) - np.repeat(
        run_starts, run_lens
    )
    return pa.Table.from_arrays(
        [
            pc.take(doc_ids, pa.array(par, pa.int64())),
            pa.array(sent_idx, pa.int64()),
            sent,
        ],
        schema=out_schema,
    )


def split_sentences(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed sentence segmentation (see split_sentences_batch)."""
    return docs.map_batches(split_sentences_batch, batch_format="pyarrow")


def dedup_lines_batch(batch: pa.Table) -> pa.Table:
    """Intra-document exact duplicate-line removal (RefinedWeb rule 'exact
    line-level dedup within a document'; Penedo et al. 2023 §4.2 apply it
    before the cross-document filters). Within each document, every repeat
    of an earlier non-empty line is dropped; empty lines are never removed
    (they carry paragraph structure). Output: (doc_id, text, n_removed)
    with surviving lines rejoined by "\\n" in original order.

    Batch-local and exchange-free: a document is one row, so the rule
    never needs cross-block state — this runs at input-scan speed at any
    corpus size. Line identity is the 61-bit content fingerprint
    (``delta._fingerprint64``), the same convention as ``paragraph_dedup``
    and ``domain_boilerplate_strip``.
    """
    from agentic_doc_ray.functions.delta import _fingerprint64

    doc_ids = batch.column("doc_id").combine_chunks()
    parts = pc.split_pattern(batch.column("text").combine_chunks(), "\n")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    lines = pc.list_flatten(parts)
    fp = _fingerprint64(lines).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(lines, "").to_numpy(zero_copy_only=False)

    # First occurrence per (doc, fingerprint): lines stream in document
    # order, so pandas' hashtable 'first stays' rule IS the textual rule.
    import pandas as pd

    dup = pd.DataFrame({"p": parents, "fp": fp}).duplicated().to_numpy()
    keep = ~(dup & nonempty)

    n = batch.num_rows
    total = np.bincount(parents, minlength=n)
    kept_cnt = np.bincount(parents[keep], minlength=n)
    offsets = np.concatenate(([0], np.cumsum(kept_cnt))).astype(np.int32)
    kept_lines = lines.filter(pa.array(keep))
    rebuilt = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_lines),
        "\n",
    )
    return pa.Table.from_arrays(
        [
            doc_ids,
            rebuilt,
            pa.array((total - kept_cnt).astype(np.int64), pa.int64()),
        ],
        names=["doc_id", "text", "n_removed"],
    )


def dedup_lines(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed intra-doc line dedup (see ``dedup_lines_batch``)."""
    return docs.map_batches(dedup_lines_batch, batch_format="pyarrow")


# --- per-source unigram KL divergence (mixture-balancing signal) --------
#
# KL(P_source || P_corpus) over a capped shared vocabulary tells a data
# mixer which sources are distributionally far from the corpus mean — the
# standard signal for re-weighting pretraining mixtures (and the unigram
# special case of the DSIR importance-weight family in functions/dsir.py).
# Per-term values are rounded to INTEGER micro-bits and weighted by exact
# integer counts BEFORE summing, so the distributed run is bit-equal to
# the single-process replica regardless of batching: the only float ops
# (one division, one log2, one round per DISTINCT (source, token)) see
# identical operands in an identical order on both sides.

_KL_SCALE = 1_000_000  # micro-bits


def _kl_micro_terms(
    c_st: "np.ndarray", c_t: "np.ndarray", n_source: int, n_corpus: int
) -> "np.ndarray":
    """Integer micro-bit KL terms: c_st * round(1e6 * log2((c_st * N) /
    (N_s * c_t))) — shared verbatim by the distributed per-source group
    task and the replica oracle (operand-order identical => bit-equal)."""
    ratio = (c_st.astype(np.float64) * np.float64(n_corpus)) / (
        np.float64(n_source) * c_t.astype(np.float64)
    )
    term = np.round(np.log2(ratio) * _KL_SCALE).astype(np.int64)
    return c_st.astype(np.int64) * term


def _source_token_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial counts per (source, token) — one row per distinct
    pair moves through the exchange, never one per occurrence."""
    trimmed = _regex_trim(batch.column("text"))
    nonempty = pc.not_equal(trimmed, "")
    src = batch.column("source").filter(nonempty)
    toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    src_rep = pc.take(
        src, pa.array(np.repeat(np.arange(len(lens)), lens), pa.int64())
    )
    t = pa.Table.from_arrays([src_rep, toks.flatten()], names=["source", "token"])
    g = t.group_by(["source", "token"]).aggregate([("token", "count")])
    return g.rename_columns(["source", "token", "n"])


def _kl_vocab_table(counts: pa.Table, max_vocab: int) -> tuple:
    """(capped global (token, c_t) table, corpus total N) from a
    (token, n) count table; cap order (n DESC, token ASC) is total."""
    import logging

    if counts.num_rows > max_vocab:
        logging.getLogger(__name__).warning(
            "source_divergence: vocabulary %d > cap %d; KL restricted to "
            "the %d most frequent tokens",
            counts.num_rows, max_vocab, max_vocab,
        )
        order = pc.sort_indices(
            counts, sort_keys=[("n", "descending"), ("token", "ascending")]
        )
        counts = counts.take(order.slice(0, max_vocab))
    n_corpus = int(pc.sum(counts.column("n")).as_py() or 0)
    return counts, n_corpus


def _kl_for_source(
    source: str, grp: pa.Table, vocab: "pd.Series", n_corpus: int
) -> pa.Table:
    """One output row for one source: restrict its (token, n) counts to
    the capped vocab, then integer-exact KL micro-bits."""
    import pandas as pd

    agg = (
        grp.select(["token", "n"])
        .group_by("token")
        .aggregate([("n", "sum")])
        .rename_columns(["token", "n"])
    )
    c_t = vocab.reindex(
        agg.column("token").to_numpy(zero_copy_only=False)
    ).to_numpy()
    in_vocab = ~pd.isna(c_t)
    c_st = agg.column("n").to_numpy(zero_copy_only=False)[in_vocab]
    c_t = c_t[in_vocab].astype(np.int64)
    n_source = int(c_st.sum())
    kl = (
        int(_kl_micro_terms(c_st, c_t, n_source, n_corpus).sum())
        if n_source
        else 0
    )
    return pa.table(
        {
            "source": pa.array([source], pa.string()),
            "n_tokens": pa.array([n_source], pa.int64()),
            "kl_micro": pa.array([kl], pa.int64()),
        }
    )


def source_divergence(
    docs: "ray.data.Dataset", max_vocab: int = 1 << 20
) -> "ray.data.Dataset":
    """Per-source unigram KL divergence from the corpus distribution, in
    exact integer micro-bits (count-weighted).

    Shape — two streaming passes over the corpus, both exchanges moving
    (source, token, count) PARTIALS only (one row per distinct pair per
    batch), never token occurrences:

    1. global vocabulary: the same partial-count -> small-groupby
       exchange as ``token_commonness``, capped at ``max_vocab`` with a
       logged drop; the capped (token, c_t) table broadcasts once via
       ``ray.put`` (tens of MB at the 2^20 cap).
    2. per-source counts: partials hash-partition by SOURCE, so each
       group task sees all of one source's distinct tokens (bounded by
       the vocab cap — occurrences were collapsed before the exchange)
       and finishes N_s, the vocab restriction, and the KL sum locally.

    Output: (source, n_tokens, kl_micro) — one row per source that
    contributed at least one token. Sources whose tokens all fall
    outside the capped vocab emit n_tokens=0, kl_micro=0; sources with
    no tokens at all (empty/whitespace docs only) emit no row.
    """
    import pandas as pd

    import ray

    from agentic_doc_ray.context import partitions_for, shuffle_partitions
    from agentic_doc_ray.functions._exchange import str_key_sentinels
    from ray.data.aggregate import Sum

    def token_partial(batch: pa.Table) -> pa.Table:
        g = _source_token_counts(batch)
        t = (
            g.select(["token", "n"])
            .group_by("token")
            .aggregate([("n", "sum")])
            .rename_columns(["token", "n"])
        )
        return t

    vocab_ds = (
        docs.map_batches(token_partial, batch_format="pyarrow")
        .groupby("token", num_partitions=shuffle_partitions())
        .aggregate(Sum("n", alias_name="n"))
    )
    blocks = [
        b for b in ray.get(vocab_ds.materialize().to_arrow_refs()) if b.num_rows
    ]
    counts = (
        pa.concat_tables(blocks)
        if blocks
        else pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    )
    vocab_t, n_corpus = _kl_vocab_table(counts, max_vocab)
    vocab = pd.Series(
        vocab_t.column("n").to_numpy(zero_copy_only=False),
        index=vocab_t.column("token").to_numpy(zero_copy_only=False),
    )
    vocab_ref = ray.put(vocab)

    ex_schema = pa.schema(
        [("source", pa.string()), ("token", pa.string()), ("n", pa.int64())]
    )

    def kl_group(grp: pa.Table, *, _ref=vocab_ref, _n=n_corpus) -> pa.Table:
        source = grp.column("source")[0].as_py()
        if source.startswith("\x00"):  # exchange sentinel group
            return pa.schema(
                [
                    ("source", pa.string()),
                    ("n_tokens", pa.int64()),
                    ("kl_micro", pa.int64()),
                ]
            ).empty_table()
        cache = kl_group.__dict__
        if "vocab" not in cache:
            cache["vocab"] = ray.get(_ref)
        return _kl_for_source(source, grp, cache["vocab"], _n)

    n_hint = docs.count()
    return (
        docs.map_batches(_source_token_counts, batch_format="pyarrow")
        .union(str_key_sentinels(ex_schema, "source", fill={"token": "", "n": 0}))
        .groupby("source", num_partitions=partitions_for(n_hint))
        .map_groups(kl_group, batch_format="pyarrow")
    )


def source_divergence_oracle(tbl: pa.Table, max_vocab: int = 1 << 20) -> pa.Table:
    """Single-process replica of ``source_divergence`` sharing its batch
    helpers (`_source_token_counts`, `_kl_vocab_table`, `_kl_micro_terms`)
    — the per-term float ops see identical operands, so the distributed
    run is bit-equal."""
    import pandas as pd

    g = _source_token_counts(tbl)
    counts = (
        g.select(["token", "n"])
        .group_by("token")
        .aggregate([("n", "sum")])
        .rename_columns(["token", "n"])
    )
    vocab_t, n_corpus = _kl_vocab_table(counts, max_vocab)
    vocab = pd.Series(
        vocab_t.column("n").to_numpy(zero_copy_only=False),
        index=vocab_t.column("token").to_numpy(zero_copy_only=False),
    )
    out = []
    for source in sorted(set(g.column("source").to_pylist())):
        grp = g.filter(pc.equal(g.column("source"), source))
        out.append(_kl_for_source(source, grp, vocab, n_corpus))
    if not out:
        return pa.schema(
            [
                ("source", pa.string()),
                ("n_tokens", pa.int64()),
                ("kl_micro", pa.int64()),
            ]
        ).empty_table()
    return pa.concat_tables(out)


# Default tagging dictionary for keyword_tag_counts: drawn from the
# synthetic corpus vocabulary, plus one multi-word phrase and one
# never-matching probe (pins the zero path on both engines).
DEFAULT_KEYWORDS: tuple[str, ...] = (
    "table",
    "hash",
    "merge",
    "window",
    "fast table",
    "quantum",
)


def keyword_tag_counts(
    docs: "ray.data.Dataset", keywords: tuple[str, ...] = DEFAULT_KEYWORDS
) -> "ray.data.Dataset":
    """FlashText-style dictionary tagging: per (document, keyword) the
    number of non-overlapping occurrences, long format, zero-count rows
    dropped — the corpus-labelling primitive behind topic routing and
    blocklist scoring.

    Zero exchanges; the dictionary is closure-broadcast once per worker.
    Cost per batch is O(K) Arrow ``count_substring`` kernel passes (each
    fully vectorized over the batch), which is the right trade up to a
    few thousand keywords; beyond that the kernel-pass loop — not the
    data path — becomes the bottleneck and the stage should swap in an
    Aho-Corasick automaton built once per actor (``__init__``), same
    signature. The K-pass form is exact for any dictionary whose entries
    cannot overlap themselves (left-to-right non-overlapping counting on
    both engines).
    """
    kws = tuple(keywords)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        text = batch.column("text")
        parts = []
        for kw in kws:
            n = pc.count_substring(text, kw).cast(pa.int64())
            m = pc.greater(n, pa.scalar(0, pa.int64()))
            f_ids = ids.filter(m)
            parts.append(
                pa.Table.from_arrays(
                    [
                        f_ids,
                        pa.array([kw] * len(f_ids), pa.string()),
                        n.filter(m),
                    ],
                    names=["doc_id", "keyword", "n"],
                )
            )
        return pa.concat_tables(parts)

    return docs.map_batches(tag, batch_format="pyarrow")


def c4_quality_flags_batch(
    batch: pa.Table,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> pa.Table:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) as integer-exact flags —
    the line-level companion to the doc-level Gopher set:

      - a line is KEPT iff it ends in terminal punctuation (``.!?"``),
        has at least ``min_words_per_line`` whitespace words, and does
        not contain the word "javascript" (case-insensitive);
      - doc flags: "lorem ipsum" (case-insensitive) and the ``{``
        code brace anywhere in the doc;
      - ``keep`` = no lorem ipsum, no brace, and at least
        ``min_sentences`` terminal-punctuation marks across KEPT lines.

    Fully vectorized: one line split across the batch, per-line
    predicates as Arrow kernels, per-doc rollups as numpy segment sums —
    zero exchanges, runs at scan speed.
    """
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = batch.num_rows
    lines = pc.split_pattern(text, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = lines.flatten()
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    trimmed = pc.replace_substring_regex(flat, pattern=r"^\s+|\s+$", replacement="")
    ends_punct = pc.match_substring_regex(trimmed, pattern='[.!?"]$')
    nonempty = pc.not_equal(trimmed, "")
    words = pc.split_pattern_regex(trimmed, r"\s+")
    n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    # split of "" yields [""]: zero the word count on empty lines
    n_words = np.where(
        nonempty.to_numpy(zero_copy_only=False), n_words, 0
    )
    has_js = pc.match_substring(pc.utf8_lower(flat), "javascript")
    kept = (
        ends_punct.to_numpy(zero_copy_only=False)
        & (n_words >= min_words_per_line)
        & ~has_js.to_numpy(zero_copy_only=False)
    )
    n_sent_line = pc.count_substring_regex(
        flat, pattern="[.!?]"
    ).to_numpy(zero_copy_only=False).astype(np.int64)

    n_lines = np.zeros(n, dtype=np.int64)
    np.add.at(n_lines, parents, 1)
    n_kept = np.zeros(n, dtype=np.int64)
    np.add.at(n_kept, parents[kept], 1)
    n_sentences = np.zeros(n, dtype=np.int64)
    np.add.at(n_sentences, parents[kept], n_sent_line[kept])
    n_js = np.zeros(n, dtype=np.int64)
    js_mask = has_js.to_numpy(zero_copy_only=False)
    np.add.at(n_js, parents[js_mask], 1)

    lower_doc = pc.utf8_lower(text)
    has_lorem = pc.cast(
        pc.match_substring(lower_doc, "lorem ipsum"), pa.int64()
    ).to_numpy(zero_copy_only=False)
    has_brace = pc.cast(
        pc.match_substring(text, "{"), pa.int64()
    ).to_numpy(zero_copy_only=False)
    keep = (
        (has_lorem == 0) & (has_brace == 0) & (n_sentences >= min_sentences)
    ).astype(np.int64)
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_lines": n_lines,
            "n_kept_lines": n_kept,
            "n_sentences": n_sentences,
            "n_js_lines": n_js,
            "has_lorem_ipsum": has_lorem,
            "has_code_brace": has_brace,
            "keep": keep,
        },
        schema=pa.schema(
            [
                ("doc_id", batch.schema.field("doc_id").type),
                ("n_lines", pa.int64()),
                ("n_kept_lines", pa.int64()),
                ("n_sentences", pa.int64()),
                ("n_js_lines", pa.int64()),
                ("has_lorem_ipsum", pa.int64()),
                ("has_code_brace", pa.int64()),
                ("keep", pa.int64()),
            ]
        ),
    )


def c4_quality_flags(
    docs: "ray.data.Dataset",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> "ray.data.Dataset":
    import functools

    return docs.map_batches(
        functools.partial(
            c4_quality_flags_batch,
            min_words_per_line=min_words_per_line,
            min_sentences=min_sentences,
        ),
        batch_format="pyarrow",
    )


def c4_clean_batch(
    batch: pa.Table,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> pa.Table:
    """C4 cleaning APPLIED: keep only passing docs, with dropped lines
    removed and the survivors rejoined in order — the end stage the
    flags feed. Shares the exact rule arithmetic with
    ``c4_quality_flags_batch``."""
    flags = c4_quality_flags_batch(
        batch, min_words_per_line=min_words_per_line, min_sentences=min_sentences
    )
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lines = pc.split_pattern(text, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = lines.flatten()
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    trimmed = pc.replace_substring_regex(flat, pattern=r"^\s+|\s+$", replacement="")
    ends_punct = pc.match_substring_regex(trimmed, pattern='[.!?"]$')
    nonempty = pc.not_equal(trimmed, "")
    words = pc.split_pattern_regex(trimmed, r"\s+")
    n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = np.where(nonempty.to_numpy(zero_copy_only=False), n_words, 0)
    has_js = pc.match_substring(pc.utf8_lower(flat), "javascript")
    kept = (
        ends_punct.to_numpy(zero_copy_only=False)
        & (n_words >= min_words_per_line)
        & ~has_js.to_numpy(zero_copy_only=False)
    )
    keep_doc = flags.column("keep").to_numpy(zero_copy_only=False) == 1
    # vectorized per-doc rejoin: keep lines of surviving docs, rebuild a
    # list<string> column with per-doc offsets, join with pc.binary_join
    line_mask = kept & keep_doc[parents]
    survivors = np.flatnonzero(keep_doc)
    counts = np.bincount(
        parents[line_mask], minlength=batch.num_rows
    )[survivors]
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    values = flat.filter(pa.array(line_mask))
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values),
        "\n",
    )
    return pa.Table.from_arrays(
        [
            batch.column("doc_id").take(pa.array(survivors, pa.int64())),
            joined,
        ],
        schema=pa.schema(
            [
                ("doc_id", batch.schema.field("doc_id").type),
                ("text", pa.string()),
            ]
        ),
    )


def c4_clean(
    docs: "ray.data.Dataset",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> "ray.data.Dataset":
    import functools

    return docs.map_batches(
        functools.partial(
            c4_clean_batch,
            min_words_per_line=min_words_per_line,
            min_sentences=min_sentences,
        ),
        batch_format="pyarrow",
    )


def _mink_score_batch(batch: pa.Table, bmap, fmap, k_pct: int) -> pa.Table:
    """Min-K% membership-inference signal (Shi et al. 2023, adapted to
    the corpus bigram LM): per doc, the mean NLL of its ceil(k_pct%)
    LOWEST-probability scored bigrams. All integer micro-bits; the
    selection is by VALUE with a fixed count, so the selected SUM is
    independent of tie order and of batch boundaries — bit-equal
    replica territory."""
    import pandas as pd

    trimmed = _regex_trim(batch.column("text"))
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    nonempty = pc.not_equal(trimmed, "")
    toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    n = len(flat)

    n_docs = batch.num_rows
    n_scored = np.zeros(n_docs, np.int64)
    k_sel = np.zeros(n_docs, np.int64)
    mink_sum = np.zeros(n_docs, np.int64)
    idx = np.flatnonzero(nonempty.to_numpy(zero_copy_only=False))

    if n >= 2:
        same = parents[:-1] == parents[1:]
        joined = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1), " "
        ).filter(pa.array(same))
        firsts = flat.slice(0, n - 1).filter(pa.array(same))
        seg = parents[:-1][same]

        nb = pd.Series(joined.to_numpy(zero_copy_only=False)).map(bmap).to_numpy(
            dtype=np.float64, na_value=np.nan
        )
        nf = pd.Series(firsts.to_numpy(zero_copy_only=False)).map(fmap).to_numpy(
            dtype=np.float64, na_value=np.nan
        )
        scored = ~(np.isnan(nb) | np.isnan(nf))
        with np.errstate(invalid="ignore", divide="ignore"):
            ll = np.log2(nb[scored] / nf[scored])
        nll = -np.round(ll * _LM_SCALE).astype(np.int64)
        sseg = seg[scored]

        n_ne = int(parents[-1]) + 1 if n else 0
        sc = np.bincount(sseg, minlength=n_ne).astype(np.int64)
        ks = -(-sc * k_pct // 100)  # ceil(n_scored * k_pct / 100), int
        # per segment: take the ks[d] HIGHEST nll values. lexsort by
        # (segment, -nll); rank-within-segment = arange - seg_start
        order = np.lexsort((-nll, sseg))
        snll = nll[order]
        sseg_sorted = sseg[order]
        seg_starts = np.concatenate(
            (np.zeros(1, np.int64), np.cumsum(sc[:-1], dtype=np.int64))
        )
        rank = np.arange(len(snll), dtype=np.int64) - seg_starts[sseg_sorted]
        takemask = rank < ks[sseg_sorted]
        sums = np.bincount(
            sseg_sorted[takemask],
            weights=snll[takemask].astype(np.float64),
            minlength=n_ne,
        )
        n_scored[idx[:n_ne]] = sc
        k_sel[idx[:n_ne]] = ks
        mink_sum[idx[:n_ne]] = np.round(sums).astype(np.int64)

    mean = np.where(k_sel > 0, mink_sum // np.maximum(k_sel, 1), 0)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_scored, pa.int64()),
            pa.array(k_sel, pa.int64()),
            pa.array(mink_sum, pa.int64()),
            pa.array(mean.astype(np.int64), pa.int64()),
        ],
        names=["doc_id", "n_scored", "k_sel", "mink_nll_micro", "mink_mean_micro"],
    )


def mink_prob_score(
    docs: "ray.data.Dataset", k_pct: int = 20, max_vocab: int = 1 << 22
) -> "ray.data.Dataset":
    """Min-K% probability score over the corpus bigram LM: per document,
    the mean NLL (integer micro-bits) of its k% lowest-probability
    bigrams — the standard pretraining-data membership/contamination
    signal (a doc whose WORST tokens are still high-probability is
    likely memorized/duplicated training text).

    Same two count exchanges + broadcast probe as ``bigram_lm_score``;
    one extra per-batch segment-sorted selection, still fully
    vectorized. Oracle: bit-equal single-process replica (value-based
    selection with a fixed count is tie- and batch-independent).
    """
    import ray as _ray

    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    np_ = shuffle_partitions()

    def collect(ds, key):
        blocks = [
            b for b in _ray.get(ds.materialize().to_arrow_refs()) if b.num_rows
        ]
        if not blocks:
            return pa.table(
                {key: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        return pa.concat_tables(blocks).combine_chunks()

    btbl = collect(
        docs.map_batches(_bigram_partial, batch_format="pyarrow")
        .groupby("bigram", num_partitions=np_)
        .aggregate(Sum("n", alias_name="n")),
        "bigram",
    )
    ftbl = _firsts_from_bigrams(btbl)
    bmap = _counts_to_series(_cap_counts(btbl, "bigram", max_vocab, "bigram"), "bigram")
    fmap = _counts_to_series(_cap_counts(ftbl, "token", max_vocab, "first-token"), "token")
    bref, fref = _ray.put(bmap), _ray.put(fmap)

    def score(batch: pa.Table, *, _b=bref, _f=fref) -> pa.Table:
        cache = score.__dict__
        if "b" not in cache:
            cache["b"], cache["f"] = _ray.get(_b), _ray.get(_f)
        return _mink_score_batch(batch, cache["b"], cache["f"], k_pct)

    return docs.map_batches(score, batch_format="pyarrow")


def mink_prob_oracle(
    docs_tbl: pa.Table, k_pct: int = 20, max_vocab: int = 1 << 22
) -> pa.Table:
    """Single-process replica of ``mink_prob_score`` (same partial count
    fns over the whole corpus, same cap rule, same selection scorer)."""
    btbl = _cap_counts(_bigram_partial(docs_tbl), "bigram", max_vocab, "bigram")
    ftbl = _cap_counts(_first_partial(docs_tbl), "token", max_vocab, "first-token")
    return _mink_score_batch(
        docs_tbl,
        _counts_to_series(btbl, "bigram"),
        _counts_to_series(ftbl, "token"),
        k_pct,
    )


def pmi_collocations(
    docs: "ray.data.Dataset",
    min_count: int = 5,
    k: int = 100,
    n_buckets: int = 64,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Top-k collocations by pointwise mutual information — the classic
    phrase-mining signal (Church & Hanks 1990): bigrams whose observed
    frequency most exceeds the independence expectation,
    PMI ∝ P(w1 w2) / (P(w1)·P(w2)), ranked by the exact ratio
    c12·N² / (c1·c2·B) with a ``min_count`` support floor (PMI is
    degenerate on rare pairs).

    Scale shape: ONE fused counting exchange — tokens contain no
    whitespace, so unigram keys ("w") and bigram keys ("w1 w2") live in
    disjoint string spaces and share a single hash aggregate; per-batch
    partials bound the exchange by distinct keys per batch, never token
    occurrences. The merged table is materialized once (vocab-bounded)
    and re-scanned for the two scalar totals and the candidate filter.
    The support filter runs BEFORE the two attach exchanges, so c1/c2
    attachment ships each unigram row once plus only surviving bigrams.
    The score divides exact int64 counts in IEEE double with a pinned
    association order — DuckDB lands on bit-identical values, and ties
    at the top-k boundary break on (w1, w2).
    """
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions._exchange import int_key_sentinels
    from agentic_doc_ray.functions.delta import _fingerprint64

    np_ = num_partitions or shuffle_partitions()

    count_schema = pa.schema([("key", pa.string()), ("n", pa.int64())])

    def partial_counts(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks_list, pa.ChunkedArray):
            toks_list = toks_list.combine_chunks()
        flat = toks_list.flatten()
        keys = [flat]
        n = len(flat)
        if n >= 2:
            parents = pc.list_parent_indices(toks_list).to_numpy(
                zero_copy_only=False
            )
            joined = pc.binary_join_element_wise(
                flat.slice(0, n - 1), flat.slice(1), " "
            )
            same_doc = parents[:-1] == parents[1:]
            keys.append(joined.filter(pa.array(same_doc)))
        t = pa.Table.from_arrays(
            [pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in keys])],
            names=["key"],
        )
        g = t.group_by("key").aggregate([("key", "count")])
        return g.rename_columns(["key", "n"]).cast(count_schema)

    merged = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("key", num_partitions=np_)
        .aggregate(Sum("n", alias_name="c"))
        .materialize()  # vocab-bounded; re-scanned for totals + filters
    )

    def _is_bigram(t: pa.Table):
        return pc.match_substring(t.column("key"), " ")

    from agentic_doc_ray.context import scalar_agg

    n_total = int(
        scalar_agg(
            merged.map_batches(
                lambda t: t.filter(pc.invert(_is_bigram(t))), batch_format="pyarrow"
            ),
            "c",
        )
        or 0
    )
    b_total = int(
        scalar_agg(
            merged.map_batches(
                lambda t: t.filter(_is_bigram(t)), batch_format="pyarrow"
            ),
            "c",
        )
        or 0
    )

    def _bucket(arr) -> pa.Array:
        return pc.cast(
            pc.bit_wise_and(
                _fingerprint64(arr), pa.scalar(n_buckets - 1, pa.int64())
            ),
            pa.int32(),
        )

    ex1 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("w", pa.string()),
            ("side", pa.string()),
            ("other", pa.string()),
            ("c12", pa.int64()),
            ("c", pa.int64()),
        ]
    )

    def tag_cand1(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.and_(
                _is_bigram(batch),
                pc.greater_equal(batch.column("c"), min_count),
            )
        )
        parts = pc.split_pattern(f.column("key"), " ")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        w1 = pc.list_element(parts, 0)
        w2 = pc.list_element(parts, 1)
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(w1),
                w1,
                pa.array(["b"] * n, pa.string()),
                w2,
                f.column("c").combine_chunks(),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex1,
        )

    def tag_uni(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.invert(_is_bigram(batch)))
        key = f.column("key").combine_chunks()
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["u"] * n, pa.string()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.int64()),
                f.column("c").combine_chunks(),
            ],
            schema=ex1,
        )

    mid = pa.schema(
        [
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("c12", pa.int64()),
            ("c1", pa.int64()),
        ]
    )

    def attach1(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_b = pc.equal(g.column("side"), "b")
        b = g.filter(is_b).select(["w", "other", "c12"])
        u = g.filter(pc.equal(g.column("side"), "u")).select(["w", "c"])
        if b.num_rows == 0 or u.num_rows == 0:
            return mid.empty_table()
        j = b.join(u, keys="w", join_type="inner")
        return pa.Table.from_arrays(
            [j.column("w"), j.column("other"), j.column("c12"), j.column("c")],
            schema=mid,
        )

    with_c1 = (
        merged.map_batches(tag_cand1, batch_format="pyarrow")
        .union(merged.map_batches(tag_uni, batch_format="pyarrow"))
        .union(int_key_sentinels(ex1, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(attach1, batch_format="pyarrow")
    )

    ex2 = pa.schema(
        [
            ("bucket", pa.int32()),
            ("w", pa.string()),
            ("side", pa.string()),
            ("other", pa.string()),
            ("c12", pa.int64()),
            ("c1", pa.int64()),
            ("c", pa.int64()),
        ]
    )

    def tag_cand2(batch: pa.Table) -> pa.Table:
        w2 = batch.column("w2").combine_chunks()
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(w2),
                w2,
                pa.array(["b"] * n, pa.string()),
                batch.column("w1").combine_chunks(),
                batch.column("c12").combine_chunks(),
                batch.column("c1").combine_chunks(),
                pa.nulls(n, pa.int64()),
            ],
            schema=ex2,
        )

    def tag_uni2(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.invert(_is_bigram(batch)))
        key = f.column("key").combine_chunks()
        n = f.num_rows
        return pa.Table.from_arrays(
            [
                _bucket(key),
                key,
                pa.array(["u"] * n, pa.string()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                f.column("c").combine_chunks(),
            ],
            schema=ex2,
        )

    scored_schema = pa.schema(
        [
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("c12", pa.int64()),
            ("c1", pa.int64()),
            ("c2", pa.int64()),
            ("score", pa.float64()),
        ]
    )

    def attach2(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_b = pc.equal(g.column("side"), "b")
        b = g.filter(is_b).select(["w", "other", "c12", "c1"])
        u = g.filter(pc.equal(g.column("side"), "u")).select(["w", "c"])
        if b.num_rows == 0 or u.num_rows == 0:
            return scored_schema.empty_table()
        j = b.join(u, keys="w", join_type="inner")
        f8 = pa.float64()
        # pinned association order: ((c12 * N) * N) / ((c1 * c2) * B) —
        # each op correctly rounded, so DuckDB lands on identical doubles
        num = pc.multiply(
            pc.multiply(j.column("c12").cast(f8), pa.scalar(float(n_total))),
            pa.scalar(float(n_total)),
        )
        den = pc.multiply(
            pc.multiply(j.column("c1").cast(f8), j.column("c").cast(f8)),
            pa.scalar(float(b_total)),
        )
        return pa.Table.from_arrays(
            [
                j.column("other"),
                j.column("w"),
                j.column("c12"),
                j.column("c1"),
                j.column("c"),
                pc.divide(num, den),
            ],
            schema=scored_schema,
        )

    return (
        with_c1.map_batches(tag_cand2, batch_format="pyarrow")
        .union(merged.map_batches(tag_uni2, batch_format="pyarrow"))
        .union(int_key_sentinels(ex2, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(attach2, batch_format="pyarrow")
        .sort(["score", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def vocab_growth(
    docs: "ray.data.Dataset", n_checkpoints: int = 10
) -> pa.Table:
    """Heaps-law vocabulary growth curve: cumulative distinct-token count
    (and total token count) at ``n_checkpoints`` equal doc-id-range
    checkpoints — the V(n) ≈ K·nᵝ diagnostic that tells you whether a
    corpus is still contributing new vocabulary or has saturated (dedup /
    source-mix health at crawl scale).

    Checkpoints split the [min, max] doc_id range into equal integer
    slices (synthetic ids are dense, so range deciles == rank deciles;
    the two range scalars are the only driver-side inputs — no
    distributed selection needed). Scale shape: ONE vocab-bounded
    exchange (token → min doc_id, per-batch partials first) plus three
    K-bounded partial aggregates (tokens / docs / first-occurrences per
    checkpoint slice); the curve itself is a K-row driver cumsum.
    Everything integer-exact.
    """
    from ray.data.aggregate import Min, Sum

    from agentic_doc_ray.context import shuffle_partitions

    from agentic_doc_ray.context import scalar_agg

    docs = docs.materialize()  # consumed thrice: min + max + the bucket map
    mn = int(scalar_agg(docs, "doc_id", "min"))
    mx = int(scalar_agg(docs, "doc_id", "max"))
    K = n_checkpoints
    span = mx - mn + 1
    his = np.array([mn - 1 + (span * k) // K for k in range(1, K + 1)], np.int64)

    def _bucket_of(doc_ids: np.ndarray) -> np.ndarray:
        # slice index = first checkpoint whose hi bound covers the id
        return np.searchsorted(his, doc_ids, side="left").astype(np.int64)

    tok_schema = pa.schema([("token", pa.string()), ("fd", pa.int64())])

    def partial_first(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ids = (
            batch.column("doc_id")
            .filter(nonempty)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.Table.from_arrays(
            [flat, pa.array(ids[parents], pa.int64())], names=["token", "fd"]
        )
        g = t.group_by("token").aggregate([("fd", "min")])
        return g.rename_columns(["token", "fd"]).cast(tok_schema)

    firstocc = (
        docs.map_batches(partial_first, batch_format="pyarrow")
        .groupby("token", num_partitions=shuffle_partitions())
        .aggregate(Min("fd", alias_name="fd"))
    )

    k_schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])

    def _k_counts(doc_ids: np.ndarray) -> pa.Table:
        ks, cnts = np.unique(_bucket_of(doc_ids), return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(ks, pa.int64()), pa.array(cnts.astype(np.int64), pa.int64())],
            schema=k_schema,
        )

    def vocab_partial(batch: pa.Table) -> pa.Table:
        return _k_counts(
            batch.column("fd").combine_chunks().to_numpy(zero_copy_only=False)
        )

    def token_partial(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ids = (
            batch.column("doc_id")
            .filter(nonempty)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return _k_counts(ids[parents])

    def doc_partial(batch: pa.Table) -> pa.Table:
        return _k_counts(
            batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        )

    def _curve(ds) -> np.ndarray:
        rows = (
            ds.groupby("k", num_partitions=2)
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )  # K-bounded
        per = np.zeros(K, np.int64)
        for r in rows:
            per[int(r["k"])] = int(r["n"])
        return np.cumsum(per)

    vocab = _curve(firstocc.map_batches(vocab_partial, batch_format="pyarrow"))
    toks = _curve(docs.map_batches(token_partial, batch_format="pyarrow"))
    ndocs = _curve(docs.map_batches(doc_partial, batch_format="pyarrow"))

    return pa.Table.from_pydict(
        {
            "checkpoint": pa.array(np.arange(1, K + 1, dtype=np.int64), pa.int64()),
            "doc_id_hi": pa.array(his, pa.int64()),
            "n_docs": pa.array(ndocs, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "vocab_size": pa.array(vocab, pa.int64()),
        }
    )


def distinctive_terms(
    docs: "ray.data.Dataset",
    k: int = 10,
    min_tf: int = 3,
    num_partitions: int | None = None,
) -> pa.Table:
    """Per-source distinctive vocabulary: the top-k tokens by integer
    LIFT — (tf_s/N_s) / (tf_g/N), the "what words characterize this
    domain" report behind source-mix debugging. Scored as the exact
    floor division (tf_s · N) // (tf_g · N_s) (same integer-score trick
    as ``top_tfidf_tokens``; int64-safe while tf_s·N < 2^63, i.e. to
    ~3e9 corpus tokens for a token with tf_s=1 — beyond that, scale
    both totals down together), with a ``min_tf`` support floor and
    (lift DESC, token ASC) rank order.

    Scale shape: per-batch (source, token) partials feed ONE composite
    hash aggregate (bounded by |sources|×|vocab|, never occurrences);
    global token counts attach through one token-keyed bucketed
    exchange; per-source totals are a source-cardinality-bounded
    collect (source is a bounded dimension, like nation). Buckets emit
    only their local per-source top-k, so the driver's final exact
    selection sees ≤ k × buckets × |sources| candidate rows.
    """
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions._exchange import int_key_sentinels
    from agentic_doc_ray.functions.delta import _fingerprint64

    np_ = num_partitions or shuffle_partitions()
    n_buckets = 64

    part_schema = pa.schema(
        [("source", pa.string()), ("token", pa.string()), ("tf", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks)
        src = batch.column("source").filter(nonempty).combine_chunks().take(parents)
        t = pa.Table.from_arrays([src, flat], names=["source", "token"])
        g = t.group_by(["source", "token"]).aggregate([("token", "count")])
        return g.rename_columns(["source", "token", "tf"]).cast(part_schema)

    st = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "token"], num_partitions=np_)
        .aggregate(Sum("tf", alias_name="tf_s"))
        .materialize()  # |sources| x |vocab| bounded; consumed 3x below
    )

    # per-source totals: bounded-dimension collect (like the nation
    # broadcasts in joins.py)
    src_rows = (
        st.map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("source"), b.column("tf_s")], names=["source", "n"]
            )
            .group_by("source")
            .aggregate([("n", "sum")])
            .rename_columns(["source", "n"]),
            batch_format="pyarrow",
        )
        .groupby("source", num_partitions=2)
        .aggregate(Sum("n", alias_name="n_s"))
        .take_all()
    )
    n_s_map = {r["source"]: int(r["n_s"]) for r in src_rows}
    n_total = sum(n_s_map.values())

    ex = pa.schema(
        [
            ("bucket", pa.int32()),
            ("token", pa.string()),
            ("side", pa.string()),
            ("source", pa.string()),
            ("tf", pa.int64()),
        ]
    )

    def _bucket(arr) -> pa.Array:
        return pc.cast(
            pc.bit_wise_and(
                _fingerprint64(arr), pa.scalar(n_buckets - 1, pa.int64())
            ),
            pa.int32(),
        )

    def tag_st(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater_equal(batch.column("tf_s"), min_tf))
        tok = f.column("token").combine_chunks()
        return pa.Table.from_arrays(
            [
                _bucket(tok),
                tok,
                pa.array(["s"] * f.num_rows, pa.string()),
                f.column("source").combine_chunks(),
                f.column("tf_s").combine_chunks(),
            ],
            schema=ex,
        )

    def tag_tg(batch: pa.Table) -> pa.Table:
        # global tf partials per token from the same merged table
        g = (
            pa.Table.from_arrays(
                [batch.column("token"), batch.column("tf_s")],
                names=["token", "tf"],
            )
            .group_by("token")
            .aggregate([("tf", "sum")])
        )
        tok = g.column("token").combine_chunks()
        return pa.Table.from_arrays(
            [
                _bucket(tok),
                tok,
                pa.array(["g"] * g.num_rows, pa.string()),
                pa.nulls(g.num_rows, pa.string()),
                g.column("tf_sum").combine_chunks(),
            ],
            schema=ex,
        )

    cand_schema = pa.schema(
        [
            ("source", pa.string()),
            ("token", pa.string()),
            ("tf_s", pa.int64()),
            ("tf_g", pa.int64()),
            ("lift", pa.int64()),
        ]
    )

    def score_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "sent"))
        is_s = pc.equal(g.column("side"), "s")
        s = g.filter(is_s).select(["token", "source", "tf"])
        tg = (
            g.filter(pc.equal(g.column("side"), "g"))
            .select(["token", "tf"])
            .group_by("token")  # partials from several st batches
            .aggregate([("tf", "sum")])
            .rename_columns(["token", "tf_g"])
        )
        if s.num_rows == 0 or tg.num_rows == 0:
            return cand_schema.empty_table()
        j = s.join(tg, keys="token", join_type="inner")
        srcs = j.column("source").to_pylist()
        tf_s = j.column("tf").to_numpy(zero_copy_only=False)
        tf_g = j.column("tf_g").to_numpy(zero_copy_only=False)
        n_s = np.array([n_s_map[x] for x in srcs], dtype=np.int64)
        lift = (tf_s * np.int64(n_total)) // (tf_g * n_s)
        t = pa.Table.from_arrays(
            [
                j.column("source"),
                j.column("token"),
                pa.array(tf_s, pa.int64()),
                pa.array(tf_g, pa.int64()),
                pa.array(lift, pa.int64()),
            ],
            schema=cand_schema,
        )
        # bucket-local top-k per source: the global merge sees
        # <= k x buckets x |sources| rows
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("source", "ascending"),
                ("lift", "descending"),
                ("token", "ascending"),
            ],
        )
        t = t.take(order)
        src_np = np.asarray(t.column("source").to_pylist(), dtype=object)
        new_grp = np.concatenate(([True], src_np[1:] != src_np[:-1]))
        grp_id = np.cumsum(new_grp) - 1
        pos = np.arange(len(src_np)) - np.concatenate(
            ([0], np.flatnonzero(new_grp[1:]) + 1)
        )[grp_id]
        return t.filter(pa.array(pos < k))

    cands = (
        st.map_batches(tag_st, batch_format="pyarrow")
        .union(st.map_batches(tag_tg, batch_format="pyarrow"))
        .union(int_key_sentinels(ex, "bucket", fill={"side": "sent"}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(score_bucket, batch_format="pyarrow")
        .take_all()
    )  # <= k x buckets x |sources|

    import pandas as pd

    df = pd.DataFrame(cands)
    if df.empty:
        return cand_schema.empty_table().append_column(
            "rank", pa.array([], pa.int64())
        )
    df = df.sort_values(
        ["source", "lift", "token"], ascending=[True, False, True]
    ).reset_index(drop=True)
    df["rank"] = df.groupby("source").cumcount() + 1
    df = df[df["rank"] <= k]
    return pa.Table.from_pandas(
        df[["source", "token", "tf_s", "tf_g", "lift", "rank"]],
        preserve_index=False,
    )


# ---------------------------------------------------------------------------
# Mixed-language detection (language-consistency cleaning signal)
# ---------------------------------------------------------------------------


def _lang_of_column(text: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Stopword-ratio language id per string (the ``LangIdActor`` rule,
    factored so halves of documents can be scored independently)."""
    low = pc.utf8_lower(text)
    n_tokens = _token_count(text).to_numpy(zero_copy_only=False)
    denom = np.maximum(n_tokens, 1).astype(np.float64)
    best_lang = np.full(len(low), "und", dtype=object)
    best_score = np.zeros(len(low), dtype=np.float64)
    for lang, words in sorted(STOPWORDS.items()):
        pat = r"\b(" + "|".join(words) + r")\b"
        hits = pc.count_substring_regex(low, pat).to_numpy(zero_copy_only=False)
        score = hits / denom
        better = score > best_score + 1e-12
        best_score = np.where(better, score, best_score)
        best_lang = np.where(better, lang, best_lang)
    return best_lang


def mixed_lang_flags_batch(batch: pa.Table) -> pa.Table:
    """Per-doc kernel (shared with the replica oracle): language-id the
    FIRST and SECOND half of each document (split at the whitespace
    nearest the midpoint, so no token straddles the cut) and flag docs
    whose halves disagree with both halves confidently identified — the
    mixed-language / template-switch cleaning signal (Dolma-style)."""
    texts = batch.column("text").to_pylist()
    heads, tails = [], []
    for t in texts:
        t = t or ""
        mid = len(t) // 2
        cut = t.rfind(" ", 0, mid + 1)
        if cut <= 0:
            cut = mid
        heads.append(t[:cut])
        tails.append(t[cut:])
    lang_head = _lang_of_column(pa.array(heads, pa.string()))
    lang_tail = _lang_of_column(pa.array(tails, pa.string()))
    mixed = (
        (lang_head != lang_tail) & (lang_head != "und") & (lang_tail != "und")
    )
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(lang_head, pa.string()),
            pa.array(lang_tail, pa.string()),
            pa.array(mixed, pa.bool_()),
        ],
        names=["doc_id", "lang_head", "lang_tail", "mixed"],
    )


def mixed_lang_flags(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed mixed-language flags (see ``mixed_lang_flags_batch``):
    per-doc deterministic, batch-local, zero exchanges; regex scoring is
    Arrow-kernel vectorized over both halves."""
    return docs.map_batches(mixed_lang_flags_batch, batch_format="pyarrow")


def script_ratios(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Character-class profile per doc (the Dolma/CCNet script filter
    signal): counts of ASCII letters, digits, whitespace, other — plus
    the ASCII-letter per-mille share. All four counts are Arrow-regex
    kernels (RE2 char classes DuckDB's regexp_replace mirrors exactly);
    batch-local, zero exchanges. Output (doc_id, n_chars, n_alpha,
    n_digit, n_space, n_other, alpha_permille)."""

    def flags(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text).cast(pa.int64())
        n_alpha = pc.count_substring_regex(text, r"[A-Za-z]").cast(pa.int64())
        n_digit = pc.count_substring_regex(text, r"[0-9]").cast(pa.int64())
        n_space = pc.count_substring_regex(text, r"\s").cast(pa.int64())
        n_other = pc.subtract(
            n_chars, pc.add(pc.add(n_alpha, n_digit), n_space)
        )
        denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
        alpha_pm = pc.divide(pc.multiply(n_alpha, pa.scalar(1000, pa.int64())), denom)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                n_chars,
                n_alpha,
                n_digit,
                n_space,
                n_other,
                alpha_pm,
            ],
            names=[
                "doc_id", "n_chars", "n_alpha", "n_digit", "n_space",
                "n_other", "alpha_permille",
            ],
        )

    return docs.map_batches(flags, batch_format="pyarrow")


def lang_pivot(
    docs: "ray.data.Dataset", langs: tuple[str, ...] = ("de", "en", "es", "fr", "zh")
) -> "ray.data.Dataset":
    """Crosstab/pivot: per-source doc counts in WIDE form, one column per
    language — (source, n_de, n_en, ...) plus n_other for anything
    outside the fixed column set (pivots need a closed column universe;
    the long form is ``lang_doc_stats``).

    Shape: per-batch vectorized one-hot partials -> one tiny
    ``groupby(source).aggregate(Sum per column)`` — the aggregate path,
    no sentinels needed, exchange rows bounded by sources x batches."""
    from ray.data.aggregate import Sum

    cols = [f"n_{l}" for l in langs]

    def partial(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        src = batch.column("source")
        arrays = [src]
        known = np.zeros(len(lang), bool)
        for l in langs:
            m = lang == l
            known |= m
            arrays.append(pa.array(m.astype(np.int64)))
        arrays.append(pa.array((~known).astype(np.int64)))
        t = pa.Table.from_arrays(arrays, names=["source"] + cols + ["n_other"])
        return (
            t.group_by("source")
            .aggregate([(c, "sum") for c in cols + ["n_other"]])
            .rename_columns(["source"] + cols + ["n_other"])
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(*[Sum(c, alias_name=c) for c in cols + ["n_other"]])
    )


def cluster_top_terms(
    docs: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    k_top: int = 10,
    min_tf: int = 3,
    num_partitions: int | None = None,
) -> pa.Table:
    """BERTopic-style topic keywords: per embedding-CLUSTER top-k tokens
    by integer lift (tf_c/N_c) / (tf_g/N), scored as the exact floor
    division (tf_c·N)//(tf_g·N_c) — the "what is this cluster about"
    report that turns k-means assignments into a topic model. ``labels``
    is any (vec_id, cluster) dataset (e.g. ``similarity.kmeans``);
    vec_id joins doc_id.

    Scale shape (the ``distinctive_terms`` skeleton with a label join in
    front): per-batch (doc_id, token, cnt) partials meet the label rows
    in ONE doc-bucketed exchange (tokens ship pre-counted, text never
    does); per-(cluster, token) tf via one composite hash aggregate;
    per-cluster totals are a k-bounded collect; global token counts
    attach through one token-keyed exchange whose buckets emit only
    their local per-cluster top-k."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions._exchange import int_key_sentinels
    from agentic_doc_ray.functions.delta import _fingerprint64

    np_ = num_partitions or shuffle_partitions()
    n_buckets = 64

    at_schema = pa.schema(
        [
            ("dbucket", pa.int32()),
            ("doc_id", pa.int64()),
            ("side", pa.string()),
            ("token", pa.string()),
            ("cnt", pa.int64()),
            ("cluster", pa.int64()),
        ]
    )

    def doc_tokens(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        nonempty = pc.not_equal(trimmed, "")
        toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks)
        ids = (
            batch.column("doc_id")
            .cast(pa.int64())
            .filter(nonempty)
            .combine_chunks()
            .take(parents)
        )
        t = pa.Table.from_arrays([ids, flat], names=["doc_id", "token"])
        g = t.group_by(["doc_id", "token"]).aggregate([("token", "count")])
        g = g.rename_columns(["doc_id", "token", "cnt"])
        did = g.column("doc_id")
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(did, pa.scalar(63, pa.int64())), pa.int32()),
                did,
                pa.array(["t"] * g.num_rows, pa.string()),
                g.column("token"),
                g.column("cnt").cast(pa.int64()),
                pa.array(np.full(g.num_rows, -1, np.int64)),
            ],
            schema=at_schema,
        )

    def label_rows(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").cast(pa.int64())
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(vid, pa.scalar(63, pa.int64())), pa.int32()),
                vid,
                pa.array(["l"] * batch.num_rows, pa.string()),
                pa.array([""] * batch.num_rows, pa.string()),
                pa.array(np.zeros(batch.num_rows, np.int64)),
                batch.column("cluster").cast(pa.int64()),
            ],
            schema=at_schema,
        )

    ct_part_schema = pa.schema(
        [("cluster", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
    )

    def attach(group: pa.Table) -> pa.Table:
        g = group.filter(pc.not_equal(group.column("side"), "s"))
        is_l = pc.equal(g.column("side"), "l")
        lab = g.filter(is_l)
        tok = g.filter(pc.invert(is_l))
        if lab.num_rows == 0 or tok.num_rows == 0:
            return ct_part_schema.empty_table()
        l_ids = lab.column("doc_id").to_numpy(zero_copy_only=False)
        l_cl = lab.column("cluster").to_numpy(zero_copy_only=False)
        order = np.argsort(l_ids)
        l_ids, l_cl = l_ids[order], l_cl[order]
        t_ids = tok.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(l_ids, t_ids)
        pos = np.clip(pos, 0, len(l_ids) - 1)
        hit = l_ids[pos] == t_ids  # inner join: unlabeled docs drop
        t2 = tok.filter(pa.array(hit)).append_column(
            "cl", pa.array(l_cl[pos[hit]], pa.int64())
        )
        g2 = (
            t2.select(["cl", "token", "cnt"])
            .group_by(["cl", "token"])
            .aggregate([("cnt", "sum")])
        )
        return g2.rename_columns(["cluster", "token", "tf"]).cast(ct_part_schema)

    ct = (
        docs.map_batches(doc_tokens, batch_format="pyarrow")
        .union(labels.map_batches(label_rows, batch_format="pyarrow"))
        .union(
            int_key_sentinels(
                at_schema, "dbucket", fill={"doc_id": -1, "side": "s", "cluster": -1}
            )
        )
        .groupby("dbucket", num_partitions=np_)
        .map_groups(attach, batch_format="pyarrow")
        .groupby(["cluster", "token"], num_partitions=np_)
        .aggregate(Sum("tf", alias_name="tf"))
        .materialize()  # |clusters| x |vocab| bounded; consumed twice below
    )

    # per-cluster totals: k-bounded collect (like nation broadcasts)
    nc_rows = (
        ct.map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("cluster"), b.column("tf")], names=["cluster", "n"]
            )
            .group_by("cluster")
            .aggregate([("n", "sum")])
            .rename_columns(["cluster", "n"]),
            batch_format="pyarrow",
        )
        .groupby("cluster", num_partitions=2)
        .aggregate(Sum("n", alias_name="n_c"))
        .take_all()
    )
    n_c_map = {int(r["cluster"]): int(r["n_c"]) for r in nc_rows}
    n_total = sum(n_c_map.values())

    ex = pa.schema(
        [
            ("bucket", pa.int32()),
            ("token", pa.string()),
            ("cluster", pa.int64()),
            ("tf", pa.int64()),
        ]
    )

    def tag_ct(batch: pa.Table) -> pa.Table:
        tok = batch.column("token").combine_chunks()
        bucket = pc.cast(
            pc.bit_wise_and(
                _fingerprint64(tok), pa.scalar(n_buckets - 1, pa.int64())
            ),
            pa.int32(),
        )
        return pa.Table.from_arrays(
            [bucket, tok, batch.column("cluster"), batch.column("tf")],
            schema=ex,
        )

    out_schema = pa.schema(
        [
            ("cluster", pa.int64()),
            ("token", pa.string()),
            ("tf", pa.int64()),
            ("tf_g", pa.int64()),
            ("lift", pa.int64()),
        ]
    )

    def score_bucket(group: pa.Table) -> pa.Table:
        g = group.filter(pc.greater_equal(group.column("cluster"), 0))
        if g.num_rows == 0:
            return out_schema.empty_table()
        import pandas as pd

        df = g.select(["token", "cluster", "tf"]).to_pandas()
        ftg = df.groupby("token")["tf"].transform("sum")
        df = df[df["tf"] >= min_tf].copy()
        if df.empty:
            return out_schema.empty_table()
        df["tf_g"] = ftg[df.index]
        n_c = df["cluster"].map(n_c_map).to_numpy(np.int64)
        df["lift"] = (
            df["tf"].to_numpy(np.int64) * n_total
        ) // (df["tf_g"].to_numpy(np.int64) * n_c)
        df = df.sort_values(["cluster", "lift", "token"], ascending=[True, False, True])
        df = df.groupby("cluster").head(k_top)
        return pa.Table.from_pandas(
            df[["cluster", "token", "tf", "tf_g", "lift"]], preserve_index=False
        ).cast(out_schema)

    cands = (
        ct.map_batches(tag_ct, batch_format="pyarrow")
        .union(int_key_sentinels(ex, "bucket", fill={"cluster": -1, "token": ""}))
        .groupby("bucket", num_partitions=np_)
        .map_groups(score_bucket, batch_format="pyarrow")
        .take_all()
    )
    import pandas as pd

    df = pd.DataFrame(cands)
    if df.empty:
        return out_schema.empty_table()
    df = df.sort_values(["cluster", "lift", "token"], ascending=[True, False, True])
    df = df.groupby("cluster").head(k_top)
    df["rank"] = df.groupby("cluster").cumcount() + 1
    return pa.Table.from_pandas(
        df[["cluster", "token", "tf", "tf_g", "lift", "rank"]],
        preserve_index=False,
    ).cast(out_schema.append(pa.field("rank", pa.int64())))


# ---------------------------------------------------------------------------
# Trigram stupid-backoff LM (Brants et al. 2007)
# ---------------------------------------------------------------------------


def _trigram_partial(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> partial (trigram, n) counts (same-doc windows)."""
    trimmed = _regex_trim(batch.column("text"))
    nonempty = pc.not_equal(trimmed, "")
    toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    n = len(flat)
    if n < 3:
        return pa.table(
            {"trigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    same = (parents[:-2] == parents[1:-1]) & (parents[1:-1] == parents[2:])
    joined = pc.binary_join_element_wise(
        flat.slice(0, n - 2), flat.slice(1, n - 2), flat.slice(2), " "
    ).filter(pa.array(same))
    g = pa.Table.from_arrays([joined], names=["trigram"]).group_by(
        "trigram"
    ).aggregate([("trigram", "count")])
    return g.rename_columns(["trigram", "n"])


def _unigram_partial(batch: pa.Table) -> pa.Table:
    trimmed = _regex_trim(batch.column("text"))
    nonempty = pc.not_equal(trimmed, "")
    toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    g = pa.Table.from_arrays([toks.flatten()], names=["token"]).group_by(
        "token"
    ).aggregate([("token", "count")])
    return g.rename_columns(["token", "n"])


# stupid backoff discount: alpha = 0.4 per backoff level (Brants 2007)
_SB_ALPHA = 0.4


def _sb_score_batch(batch: pa.Table, tmap, bmap, umap, n_total: int) -> pa.Table:
    """Score one batch against broadcast trigram/bigram/unigram count
    Series. Per trigram position (w1 w2 w3), stupid backoff:
      S = C(w1w2w3)/C(w1w2)          if the trigram is in the table
        = 0.4 * C(w2w3)/C(w2)        elif the (w2 w3) bigram is
        = 0.16 * C(w3)/N             elif w3 is
        = unscored (OOV)             otherwise
    nll_micro = -sum round(log2(S)*1e6); backoff level counts emitted."""
    import pandas as pd

    trimmed = _regex_trim(batch.column("text"))
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    nonempty = pc.not_equal(trimmed, "")
    toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    n = len(flat)

    n_docs = batch.num_rows
    n_tri = np.zeros(n_docs, np.int64)
    n_scored = np.zeros(n_docs, np.int64)
    n_bo2 = np.zeros(n_docs, np.int64)
    n_bo1 = np.zeros(n_docs, np.int64)
    nll_micro = np.zeros(n_docs, np.int64)
    idx = np.flatnonzero(nonempty.to_numpy(zero_copy_only=False))

    if n >= 3:
        same = (parents[:-2] == parents[1:-1]) & (parents[1:-1] == parents[2:])
        w1 = flat.slice(0, n - 2).filter(pa.array(same))
        w2 = flat.slice(1, n - 2).filter(pa.array(same))
        w3 = flat.slice(2).filter(pa.array(same))
        seg = parents[:-2][same]

        tri = pc.binary_join_element_wise(w1, w2, w3, " ")
        big12 = pc.binary_join_element_wise(w1, w2, " ")
        big23 = pc.binary_join_element_wise(w2, w3, " ")

        def probe(arr, series):
            return pd.Series(arr.to_numpy(zero_copy_only=False)).map(
                series
            ).to_numpy(dtype=np.float64, na_value=np.nan)

        ct = probe(tri, tmap)
        cb12 = probe(big12, bmap)
        cb23 = probe(big23, bmap)
        cu2 = probe(w2, umap)
        cu3 = probe(w3, umap)

        lvl3 = ~np.isnan(ct) & ~np.isnan(cb12)
        lvl2 = ~lvl3 & ~np.isnan(cb23) & ~np.isnan(cu2)
        lvl1 = ~lvl3 & ~lvl2 & ~np.isnan(cu3)
        scored = lvl3 | lvl2 | lvl1

        s = np.full(len(seg), np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            s[lvl3] = ct[lvl3] / cb12[lvl3]
            s[lvl2] = _SB_ALPHA * cb23[lvl2] / cu2[lvl2]
            s[lvl1] = _SB_ALPHA * _SB_ALPHA * cu3[lvl1] / float(n_total)
            ll = np.log2(s[scored])
        ll_micro = np.zeros(len(seg), np.int64)
        ll_micro[scored] = np.round(ll * _LM_SCALE).astype(np.int64)

        n_ne = int(parents[-1]) + 1 if n else 0
        # bincount float64 weights: exact for these magnitudes (< 2^53)
        n_tri[idx[:n_ne]] = np.bincount(seg, minlength=n_ne).astype(np.int64)
        n_scored[idx[:n_ne]] = np.round(
            np.bincount(seg, weights=scored.astype(np.float64), minlength=n_ne)
        ).astype(np.int64)
        n_bo2[idx[:n_ne]] = np.round(
            np.bincount(seg, weights=lvl2.astype(np.float64), minlength=n_ne)
        ).astype(np.int64)
        n_bo1[idx[:n_ne]] = np.round(
            np.bincount(seg, weights=lvl1.astype(np.float64), minlength=n_ne)
        ).astype(np.int64)
        nll_micro[idx[:n_ne]] = -np.round(
            np.bincount(seg, weights=ll_micro.astype(np.float64), minlength=n_ne)
        ).astype(np.int64)

    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_tri, pa.int64()),
            pa.array(n_scored, pa.int64()),
            pa.array(n_bo2, pa.int64()),
            pa.array(n_bo1, pa.int64()),
            pa.array(nll_micro, pa.int64()),
        ],
        names=[
            "doc_id", "n_trigrams", "n_scored", "n_backoff2", "n_backoff1",
            "nll_micro",
        ],
    )


def trigram_backoff_score(
    docs: "ray.data.Dataset",
    max_vocab: int = 1 << 22,
    train_mod: "int | None" = None,
) -> "ray.data.Dataset":
    """Per-document trigram stupid-backoff NLL (Brants et al. 2007) in
    integer micro-bits — the higher-order LM quality signal beside
    ``bigram_lm_score``. Raw-count backoff S(w3|w1w2) with alpha = 0.4
    per level.

    ``train_mod=None`` trains the count tables on the full corpus
    (CCNet-style self-scored quality signal — note every in-corpus
    trigram is then in-table, so backoff binds only via the vocab cap);
    ``train_mod=m`` trains on the ``doc_id % m == 0`` holdout so
    out-of-train trigrams genuinely back off — the eval-style run.

    Shape: THREE streaming count passes (per-batch distinct partials ->
    one small exchange each), tables capped at ``max_vocab`` (logged;
    out-of-cap lookups back off, never silently score), broadcast once
    via ray.put, then one streaming scoring pass with vectorized
    hashtable probes. Deterministic: float ops are fixed-order per
    trigram position, so the single-process replica is bit-equal."""
    import ray as _ray

    from agentic_doc_ray.context import shuffle_partitions
    from ray.data.aggregate import Sum

    np_ = shuffle_partitions()

    train = docs
    if train_mod is not None:
        def _train_filter(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % train_mod == 0))

        train = docs.map_batches(_train_filter, batch_format="pyarrow")

    def collect(ds, key):
        blocks = [
            b for b in _ray.get(ds.materialize().to_arrow_refs()) if b.num_rows
        ]
        if not blocks:
            return pa.table(
                {key: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        return pa.concat_tables(blocks).combine_chunks()

    # ONE fused count pass + ONE exchange for all three orders (the
    # pmi_collocations trick): tokens cannot contain whitespace, so the
    # uni/bi/trigram key spaces are DISJOINT by construction (space count
    # = order - 1) and one hash aggregate counts them all; the collected
    # table splits back by space count. 3 corpus reads + 3 exchanges ->
    # 1 + 1 (measured 10.6 s -> see STATUS).
    def _fused_partial(batch: pa.Table) -> pa.Table:
        parts = [
            _unigram_partial(batch).rename_columns(["gram", "n"]),
            _bigram_partial(batch).rename_columns(["gram", "n"]),
            _trigram_partial(batch).rename_columns(["gram", "n"]),
        ]
        return pa.concat_tables(parts)

    fused = collect(
        train.map_batches(_fused_partial, batch_format="pyarrow")
        .groupby("gram", num_partitions=np_)
        .aggregate(Sum("n", alias_name="n")),
        "gram",
    )
    spaces = pc.count_substring(fused.column("gram"), " ")
    utbl = fused.filter(pc.equal(spaces, 0)).rename_columns(["token", "n"])
    btbl = fused.filter(pc.equal(spaces, 1)).rename_columns(["bigram", "n"])
    ttbl = fused.filter(pc.equal(spaces, 2)).rename_columns(["trigram", "n"])
    n_total = int(pc.sum(utbl.column("n")).as_py() or 0)
    tmap = _counts_to_series(_cap_counts(ttbl, "trigram", max_vocab, "trigram"), "trigram")
    bmap = _counts_to_series(_cap_counts(btbl, "bigram", max_vocab, "bigram"), "bigram")
    umap = _counts_to_series(_cap_counts(utbl, "token", max_vocab, "unigram"), "token")
    tref, bref, uref = _ray.put(tmap), _ray.put(bmap), _ray.put(umap)

    def score(batch: pa.Table, *, _t=tref, _b=bref, _u=uref) -> pa.Table:
        cache = score.__dict__
        if "t" not in cache:
            cache["t"], cache["b"], cache["u"] = (
                _ray.get(_t), _ray.get(_b), _ray.get(_u)
            )
        return _sb_score_batch(batch, cache["t"], cache["b"], cache["u"], n_total)

    return docs.map_batches(score, batch_format="pyarrow")


def trigram_backoff_oracle(
    docs_tbl: pa.Table,
    max_vocab: int = 1 << 22,
    train_mod: "int | None" = None,
) -> pa.Table:
    """Single-process replica of ``trigram_backoff_score`` (same partials,
    same caps, same holdout split, same fixed-order float scoring —
    bit-equal)."""
    train_tbl = docs_tbl
    if train_mod is not None:
        ids = docs_tbl.column("doc_id").to_numpy(zero_copy_only=False)
        train_tbl = docs_tbl.filter(pa.array(ids % train_mod == 0))

    def agg(part_fn, key):
        t = part_fn(train_tbl)
        if t.num_rows == 0:
            return t
        g = t.group_by(key).aggregate([("n", "sum")])
        return g.rename_columns([key, "n"])

    ttbl = agg(_trigram_partial, "trigram")
    btbl = agg(_bigram_partial, "bigram")
    utbl = agg(_unigram_partial, "token")
    n_total = int(pc.sum(utbl.column("n")).as_py() or 0) if utbl.num_rows else 0
    tmap = _counts_to_series(_cap_counts(ttbl, "trigram", max_vocab, "trigram"), "trigram")
    bmap = _counts_to_series(_cap_counts(btbl, "bigram", max_vocab, "bigram"), "bigram")
    umap = _counts_to_series(_cap_counts(utbl, "token", max_vocab, "unigram"), "token")
    return _sb_score_batch(docs_tbl, tmap, bmap, umap, n_total)


def char_entropy_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Shannon entropy of the byte distribution in micro-bits
    (the Gopher/Dolma randomness signal: ~0 for repeated filler, high
    for natural text; ASCII enforced like the substr family). Exact-ish:
    H = log2(n) - (sum c_i log2 c_i)/n evaluated in fixed operation
    order per doc, rounded to integer micro-bits — batch-independent, so
    the single-process replica is bit-equal."""
    arr = batch.column("text")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    if buf.size and buf.max() > 127:
        raise ValueError("char_entropy requires ASCII text")
    n_docs = batch.num_rows
    lens = np.diff(offsets)
    n = buf.size
    ent_micro = np.zeros(n_docs, np.int64)
    n_distinct = np.zeros(n_docs, np.int64)
    if n:
        doc_idx = np.searchsorted(offsets[1:], np.arange(n), side="right")
        key = doc_idx * 256 + buf.astype(np.int64)
        uk, ucnt = np.unique(key, return_counts=True)
        udoc = uk >> 8
        n_distinct = np.bincount(udoc, minlength=n_docs).astype(np.int64)
        clogc = ucnt.astype(np.float64) * np.log2(ucnt.astype(np.float64))
        s = np.bincount(udoc, weights=clogc, minlength=n_docs)
        nz = lens > 0
        h = np.zeros(n_docs, np.float64)
        h[nz] = np.log2(lens[nz].astype(np.float64)) - s[nz] / lens[nz]
        ent_micro = np.round(h * 1_000_000).astype(np.int64)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(lens.astype(np.int64)),
            pa.array(n_distinct),
            pa.array(ent_micro),
        ],
        names=["doc_id", "n_chars", "n_distinct_chars", "entropy_micro"],
    )


def char_entropy(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Batch-local, zero exchanges — runs at scan speed."""
    return docs.map_batches(char_entropy_batch, batch_format="pyarrow")


def _phrase_merge_batch(batch: pa.Table, phrases: "np.ndarray") -> pa.Table:
    """Greedy left-to-right non-overlapping merge of phrase bigrams
    (word2phrase apply): within each maximal run of consecutive matching
    pairs, pairs at EVEN offsets merge (the exact greedy outcome),
    vectorized with run-id arithmetic — no per-token Python."""
    trimmed = _regex_trim(batch.column("text"))
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    nonempty = pc.not_equal(trimmed, "")
    toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    n = len(flat)
    n_docs = batch.num_rows
    idx = np.flatnonzero(nonempty.to_numpy(zero_copy_only=False))
    n_ne = len(idx)

    merged_text = np.full(n_docs, "", dtype=object)
    n_merges = np.zeros(n_docs, np.int64)

    if n:
        flat_np = flat.to_numpy(zero_copy_only=False).astype(object)
        m_full = np.zeros(n, dtype=bool)
        if n >= 2 and len(phrases):
            same = parents[:-1] == parents[1:]
            joined = pc.binary_join_element_wise(
                flat.slice(0, n - 1), flat.slice(1), " "
            ).to_numpy(zero_copy_only=False)
            match = same & np.isin(joined, phrases)
            # greedy: select even offsets within each run of matches
            run_start = match & ~np.concatenate(([False], match[:-1]))
            run_id = np.cumsum(run_start)
            pos = np.arange(len(match))
            first_of_run = np.zeros(int(run_id.max()) + 1, np.int64)
            first_of_run[run_id[run_start]] = pos[run_start]
            offset = pos - first_of_run[run_id]
            m_full[: n - 1] = match & (offset % 2 == 0)
        sel_idx = np.flatnonzero(m_full)
        vals = flat_np.copy()
        if len(sel_idx):
            vals[sel_idx] = vals[sel_idx] + "_" + flat_np[sel_idx + 1]
        skip = np.zeros(n, dtype=bool)
        skip[1:] = m_full[:-1]
        keep = ~skip
        kept_vals = vals[keep]
        kept_parents = parents[keep]
        counts = np.bincount(kept_parents, minlength=n_ne)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(kept_vals, pa.string())
        )
        joined_docs = pc.binary_join(la, " ").to_numpy(zero_copy_only=False)
        merged_text[idx[: len(joined_docs)]] = joined_docs
        mg = np.bincount(parents[m_full], minlength=n_ne).astype(np.int64)
        n_merges[idx[: len(mg)]] = mg

    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(merged_text, pa.string()),
            pa.array(n_merges, pa.int64()),
        ],
        names=["doc_id", "text_merged", "n_merges"],
    )


def phrase_merge(
    docs: "ray.data.Dataset", min_count: int = 3, k: int = 50
) -> "ray.data.Dataset":
    """word2phrase-style phrase merging (Mikolov et al. 2013 §4 applied):
    the top-``k`` bigrams with count >= ``min_count`` become phrases;
    every document is re-tokenized with greedy left-to-right
    non-overlapping merges (``a b`` -> ``a_b``). Output: the merged text
    (whitespace-normalized token join) + merge count per doc.

    Shape: phrase selection reuses the ``top_bigrams`` exchange
    (k-bounded result, broadcast in the closure); the merge pass is
    batch-local and bit-equal to the single-process replica (the greedy
    outcome is a pure function of the token sequence and the global
    phrase set)."""
    top = top_bigrams(docs, k=k).take_all()
    phrases = np.array(
        [r["bigram"] for r in top if r["n"] >= min_count], dtype=object
    )
    return docs.map_batches(
        lambda b: _phrase_merge_batch(b, phrases), batch_format="pyarrow"
    )


def phrase_merge_oracle(
    docs_tbl: pa.Table, min_count: int = 3, k: int = 50
) -> pa.Table:
    """Single-process replica of ``phrase_merge`` (same deterministic
    phrase set — (n desc, bigram asc) top-k — and the same batch
    kernel)."""
    part = _bigram_partial(docs_tbl)
    g = (
        part.group_by("bigram").aggregate([("n", "sum")])
        .rename_columns(["bigram", "n"])
    )
    import pandas as pd

    df = g.to_pandas().sort_values(
        ["n", "bigram"], ascending=[False, True]
    ).head(k)
    phrases = np.array(
        df.loc[df["n"] >= min_count, "bigram"].tolist(), dtype=object
    )
    return _phrase_merge_batch(docs_tbl, phrases)


def doc_ttr_batch(batch: pa.Table) -> pa.Table:
    """Per-doc type-token ratio kernel (see ``doc_ttr``); module-level so
    composed scans (``quality_composite``) reuse it."""
    import pandas as pd

    trimmed = _regex_trim(batch.column("text"))
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    nonempty = pc.not_equal(trimmed, "")
    toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    n_docs = batch.num_rows
    idx = np.flatnonzero(nonempty.to_numpy(zero_copy_only=False))
    n_tok = np.zeros(n_docs, np.int64)
    n_typ = np.zeros(n_docs, np.int64)
    if len(flat):
        codes, _ = pd.factorize(flat.to_numpy(zero_copy_only=False))
        key = parents.astype(np.int64) * (codes.max() + 1) + codes
        uk = np.unique(key)
        n_ne = int(parents[-1]) + 1
        n_tok[idx[:n_ne]] = np.bincount(parents, minlength=n_ne)
        n_typ[idx[:n_ne]] = np.bincount(
            (uk // (codes.max() + 1)).astype(np.int64), minlength=n_ne
        )
    ttr = 1000 * n_typ // np.maximum(n_tok, 1)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_tok),
            pa.array(n_typ),
            pa.array(ttr.astype(np.int64)),
        ],
        names=["doc_id", "n_tokens", "n_types", "ttr_per_mille"],
    )


def doc_ttr(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-doc lexical diversity: type-token ratio (distinct tokens /
    tokens, floor per-mille) — the template/spam repetitiveness signal
    at the word level (char_entropy's token-level sibling). Batch-local,
    vectorized distinct via factorize + (doc, code) unique."""
    return docs.map_batches(doc_ttr_batch, batch_format="pyarrow")


def quality_composite(
    docs: "ray.data.Dataset",
    stopwords: "tuple[str, ...]" = _GOPHER_STOPWORDS,
    ent_threshold_micro: int = 2_000_000,
    ttr_threshold_pm: int = 300,
) -> "ray.data.Dataset":
    """Composed quality SCORE (the ranking complement to the gating
    pipelines): per doc, ``score = 4*gopher_keep + 2*ent_ok + ttr_ok``
    where ent_ok = byte entropy >= 2 bits/char and ttr_ok = type-token
    ratio >= 0.3 — three independent signal families (rule set, char
    distribution, lexical diversity) fused into ONE zero-exchange
    streaming scan; all three kernels are batch-local and already
    oracle-pinned individually."""

    def f(batch: pa.Table) -> pa.Table:
        keep = gopher_quality_flags_batch(batch, stopwords).column("keep")
        ent = char_entropy_batch(batch).column("entropy_micro")
        ttr = doc_ttr_batch(batch).column("ttr_per_mille")
        ent_ok = pc.cast(
            pc.greater_equal(ent, pa.scalar(ent_threshold_micro, pa.int64())),
            pa.int64(),
        )
        ttr_ok = pc.cast(
            pc.greater_equal(ttr, pa.scalar(ttr_threshold_pm, pa.int64())),
            pa.int64(),
        )
        keep64 = pc.cast(keep, pa.int64())
        score = pc.add(
            pc.add(
                pc.multiply(keep64, pa.scalar(4, pa.int64())),
                pc.multiply(ent_ok, pa.scalar(2, pa.int64())),
            ),
            ttr_ok,
        )
        return pa.Table.from_arrays(
            [batch.column("doc_id"), keep64, ent_ok, ttr_ok, score],
            names=["doc_id", "gopher_keep", "ent_ok", "ttr_ok", "score"],
        )

    return docs.map_batches(f, batch_format="pyarrow")


def token_burstiness(
    docs: "ray.data.Dataset", min_df: int = 3, k: int = 200
) -> "ray.data.Dataset":
    """Church–Gale burstiness per token: collection frequency vs document
    frequency (cf*1000//df) — high values mark tokens that pile into few
    documents (codes, boilerplate, spam vocab) vs evenly-spread function
    words. Exact integers; deterministic (burstiness DESC, token) top-k.

    Shape: one corpus pass emits per-batch (token, cf, df) partials — a
    document is one ROW, so per-batch distinct-doc counts SUM to the
    global df; one token-keyed aggregate, k-bounded output."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = _regex_trim(batch.column("text"))
        if isinstance(trimmed, pa.ChunkedArray):
            trimmed = trimmed.combine_chunks()
        nonempty = pc.not_equal(trimmed, "")
        toks_list = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
        if isinstance(toks_list, pa.ChunkedArray):
            toks_list = toks_list.combine_chunks()
        flat = toks_list.flatten()
        parents = pc.list_parent_indices(toks_list)
        t = pa.Table.from_arrays(
            [flat, parents], names=["token", "p"]
        )
        cf = t.group_by("token").aggregate([("token", "count")])
        dfp = (
            t.group_by(["token", "p"]).aggregate([])
            .group_by("token")
            .aggregate([("p", "count")])
        )
        m = cf.rename_columns(["token", "cf"]).join(
            dfp.rename_columns(["token", "df"]), keys="token"
        )
        return m.cast(
            pa.schema(
                [("token", pa.string()), ("cf", pa.int64()), ("df", pa.int64())]
            )
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token", num_partitions=shuffle_partitions())
        .aggregate(Sum("cf", alias_name="cf"), Sum("df", alias_name="df"))
    )

    def score(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.greater_equal(batch.column("df"), pa.scalar(min_df, pa.int64()))
        )
        if f.num_rows == 0:
            return pa.schema(
                [
                    ("token", pa.string()),
                    ("cf", pa.int64()),
                    ("df", pa.int64()),
                    ("burstiness", pa.int64()),
                ]
            ).empty_table()
        b = pc.divide(
            pc.multiply(f.column("cf"), pa.scalar(1000, pa.int64())),
            f.column("df"),
        )
        return f.append_column("burstiness", b.cast(pa.int64()))

    return (
        agg.map_batches(score, batch_format="pyarrow")
        .sort(["burstiness", "token"], descending=[True, False])
        .limit(k)
    )


def alias_table(
    docs: "ray.data.Dataset", k: int = 512
) -> "ray.data.Dataset":
    """Walker/Vose ALIAS sampling table over the negative-sampling
    weights (O(1) draws for the trainer): exact integer construction —
    slot i accepts its own token when ``u * total < accept_num[i]``
    (u uniform over [0, total), slot uniform over k), else yields
    ``alias_token[i]``. Deterministic: stacks are ascending-index FIFO
    deques over the (n DESC, token) vocabulary order.

    Builds on ``neg_sampling_table``'s k-bounded exchange; construction
    is driver-side over k rows (the table IS the driver-resident
    artifact). Invariant pinned in tests: sum of each token's acceptance
    mass + alias contributions == k * weight exactly."""
    from collections import deque

    rows = neg_sampling_table(docs, k=k).take_all()
    tokens = [r["token"] for r in rows]
    w = [int(r["weight"]) for r in rows]
    n = len(w)
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "slot": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "accept_num": pa.array([], pa.int64()),
                    "alias_token": pa.array([], pa.string()),
                    "total": pa.array([], pa.int64()),
                }
            )
        )
    total = sum(w)
    # scaled_i = w_i * n, compared against total (exact rationals)
    scaled = [x * n for x in w]
    small = deque(i for i in range(n) if scaled[i] < total)
    large = deque(i for i in range(n) if scaled[i] >= total)
    accept = [total] * n  # full slots accept always
    alias = list(range(n))
    while small and large:
        s = small.popleft()
        l = large[0]
        accept[s] = scaled[s]
        alias[s] = l
        scaled[l] -= total - scaled[s]
        if scaled[l] < total:
            large.popleft()
            small.append(l)
    return ray.data.from_arrow(
        pa.table(
            {
                "slot": pa.array(range(n), pa.int64()),
                "token": pa.array(tokens, pa.string()),
                "accept_num": pa.array(accept, pa.int64()),
                "alias_token": pa.array([tokens[a] for a in alias], pa.string()),
                "total": pa.array([total] * n, pa.int64()),
            }
        )
    )


def alias_table_oracle(docs_tbl: pa.Table, k: int = 512) -> pa.Table:
    """Single-process replica of ``alias_table``: pure top-k counts ->
    the same integer Vose construction (bit-equal)."""
    import pandas as pd

    part = _unigram_partial(docs_tbl)
    g = (
        part.group_by("token").aggregate([("n", "sum")])
        .rename_columns(["token", "n"])
    )
    df = g.to_pandas().sort_values(["n", "token"], ascending=[False, True]).head(k)
    from math import isqrt

    from collections import deque

    tokens = df["token"].tolist()
    w = [isqrt(int(n) * isqrt(int(n))) for n in df["n"]]
    n = len(w)
    total = sum(w)
    scaled = [x * n for x in w]
    small = deque(i for i in range(n) if scaled[i] < total)
    large = deque(i for i in range(n) if scaled[i] >= total)
    accept = [total] * n
    alias = list(range(n))
    while small and large:
        s = small.popleft()
        l = large[0]
        accept[s] = scaled[s]
        alias[s] = l
        scaled[l] -= total - scaled[s]
        if scaled[l] < total:
            large.popleft()
            small.append(l)
    return pa.table(
        {
            "slot": pa.array(range(n), pa.int64()),
            "token": pa.array(tokens, pa.string()),
            "accept_num": pa.array(accept, pa.int64()),
            "alias_token": pa.array([tokens[a] for a in alias], pa.string()),
            "total": pa.array([total] * n, pa.int64()),
        }
    )


def langid_agreement(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Method-agreement confusion table between the two language
    identifiers (stopword-ratio ``lang_id`` vs trigram-profile
    ``char_ngram_lang_id``), keyed by the gold label: one row per
    (lang, stopword_pred, ngram_pred) with its doc count — the eval
    table that decides which lang-ID gates a cleaning run. Both
    classifiers are row-local kernels, so after the shared profile
    training they run in ONE fused pass over the corpus (no joins:
    the former plan streamed the docs three times and paid two
    doc-keyed hash_join exchanges to reunite per-row columns that
    were never apart); counts collapse per batch before a tiny
    aggregate."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    profiles = _lang_profiles(docs, 3, 256)

    def partial(batch: pa.Table) -> pa.Table:
        sw = _lang_id_batch(batch)
        ng = _char_lang_classify_batch(batch, profiles, 3)
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "sw_pred": sw.column("lang_pred"),
                "ng_pred": ng.column("lang_pred"),
            }
        )
        g = t.group_by(["lang", "sw_pred", "ng_pred"]).aggregate(
            [("lang", "count")]
        )
        return g.rename_columns(["lang", "sw_pred", "ng_pred", "n"])

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "sw_pred", "ng_pred"], num_partitions=shuffle_partitions(4))
        .aggregate(Sum("n", alias_name="n"))
    )


def lang_fertility(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Tokenizer fertility by language: BPE-lexer tokens per 1000 chars
    per lang (the multilingual tokenizer-budget signal — languages with
    high fertility cost more context per character). Exact integers;
    per-batch (lang, tokens, chars) partials -> one tiny aggregate."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(batch.column("text"), _BPE_PATTERN).cast(
            pa.int64()
        )
        chars = pc.utf8_length(batch.column("text")).cast(pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("lang"), toks, chars], names=["lang", "t", "c"]
        )
        g = t.group_by("lang").aggregate([("t", "sum"), ("c", "sum"), ("t", "count")])
        return g.rename_columns(["lang", "t", "c", "n"])

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang", num_partitions=shuffle_partitions(4))
        .aggregate(
            Sum("t", alias_name="n_bpe_tokens"),
            Sum("c", alias_name="n_chars"),
            Sum("n", alias_name="n_docs"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.column("n_bpe_tokens").combine_chunks().cast(pa.int64())
        c = batch.column("n_chars").combine_chunks().cast(pa.int64())
        fert = pc.divide(
            pc.multiply(t, pa.scalar(1000, pa.int64())),
            pc.max_element_wise(c, pa.scalar(1, pa.int64())),
        )
        return pa.Table.from_arrays(
            [
                batch.column("lang").combine_chunks(),
                batch.column("n_docs").combine_chunks().cast(pa.int64()),
                t,
                c,
                fert.cast(pa.int64()),
            ],
            names=["lang", "n_docs", "n_bpe_tokens", "n_chars", "fertility_per_mille"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")
