"""BPE vocabulary training (Sennrich et al. 2016) — the canonical
tokenizer-building step of an LLM data pipeline.

Scale shape (how production BPE is actually trained): the corpus-sized
work is ONE distributed word-frequency count — per-batch vectorized
partial counts, then a small groupby whose exchange moves one row per
distinct word per batch, never one per occurrence. Merge learning then
runs driver-local over the (word, freq) table: distinct words grow
sub-linearly in corpus size (Heaps' law) and are additionally capped at
``max_words`` (dropped tail is logged — the repo's no-silent-caps rule),
so the driver holds kilobytes-to-megabytes regardless of corpus bytes.
This mirrors the reference tokenizer trainers (GPT-2 BPE, SentencePiece)
which all learn merges from a word-frequency table, not from raw text.

Determinism: word counts are exact integers; the cap is taken under the
total order (count desc, word asc); each merge step picks the max-count
pair with (left, right) ascending as tie-break — so the merge list is a
pure function of the corpus and ``bpe_train_oracle`` (same kernels,
single process) reproduces it bit-for-bit.

No end-of-word marker is appended (documented deviation from Sennrich's
``</w>``): merges therefore never straddle the word boundary, which is
the property the oracle pins.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.context import shuffle_partitions
from agentic_doc_ray.functions.text import _regex_trim

logger = logging.getLogger(__name__)

MERGE_SCHEMA = pa.schema(
    [
        ("rank", pa.int64()),
        ("left", pa.string()),
        ("right", pa.string()),
        ("pair_count", pa.int64()),
    ]
)


def _count_batch(batch: pa.Table) -> pa.Table:
    """Vectorized per-batch (word, n) partial counts."""
    trimmed = _regex_trim(batch.column("text"))
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    nonempty = pc.not_equal(trimmed, "")
    toks = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    t = pa.Table.from_arrays([toks.flatten()], names=["word"])
    g = t.group_by("word").aggregate([("word", "count")])
    return g.rename_columns(["word", "n"])


def word_counts(
    docs: "ray.data.Dataset", max_words: int = 100_000
) -> pa.Table:
    """Exact (word, n) for the ``max_words`` most frequent words, ordered
    (n desc, word asc). One small exchange; the tail drop is logged."""
    from ray.data.aggregate import Sum

    np_ = shuffle_partitions()
    agg = (
        docs.map_batches(_count_batch, batch_format="pyarrow")
        .groupby("word", num_partitions=np_)
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = (
        agg.sort(["n", "word"], descending=[True, False])
        .limit(max_words + 1)
        .take_all()
    )
    if len(rows) > max_words:
        logger.warning(
            "word_counts: vocabulary capped at %d words; tail dropped "
            "(first dropped: %r)",
            max_words,
            rows[max_words]["word"],
        )
        rows = rows[:max_words]
    return pa.Table.from_pydict(
        {
            "word": [r["word"] for r in rows],
            "n": [int(r["n"]) for r in rows],
        },
        schema=pa.schema([("word", pa.string()), ("n", pa.int64())]),
    )


def _learn_merges(
    words: list[str], freqs: list[int], n_merges: int, min_count: int
) -> pa.Table:
    """Driver-local merge learning over the word-frequency table."""
    seqs = [tuple(w) for w in words]
    out = {"rank": [], "left": [], "right": [], "pair_count": []}
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, f in zip(seqs, freqs):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        left, right = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        best = counts[(left, right)]
        if best < min_count:
            break
        out["rank"].append(rank)
        out["left"].append(left)
        out["right"].append(right)
        out["pair_count"].append(best)
        merged = left + right
        new_seqs = []
        for seq in seqs:
            if len(seq) < 2:
                new_seqs.append(seq)
                continue
            acc = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    acc.append(merged)
                    i += 2
                else:
                    acc.append(seq[i])
                    i += 1
            new_seqs.append(tuple(acc))
        seqs = new_seqs
    return pa.Table.from_pydict(out, schema=MERGE_SCHEMA)


def bpe_train(
    docs: "ray.data.Dataset",
    n_merges: int = 50,
    max_words: int = 100_000,
    min_count: int = 2,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges from a (doc_id, text) corpus.

    Returns (rank, left, right, pair_count) — the ordered merge table a
    tokenizer applies at encode time."""
    wc = word_counts(docs, max_words=max_words)
    return _learn_merges(
        wc.column("word").to_pylist(),
        wc.column("n").to_pylist(),
        n_merges,
        min_count,
    )


_WORD_CACHE_CAP = 1_000_000  # per-worker encode-cache entries (logged on hit)


def _encode_len(word: str, ranks: dict) -> int:
    """Token count of one word under the merge table (GPT-2 ``bpe()``
    order: repeatedly merge every occurrence of the lowest-rank pair).
    Pure per-word — batching cannot change it."""
    seq = list(word)
    while len(seq) >= 2:
        best = None
        best_rank = None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (seq[i], seq[i + 1])
        if best is None:
            break
        left, right = best
        acc = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                acc.append(left + right)
                i += 2
            else:
                acc.append(seq[i])
                i += 1
        seq = acc
    return len(seq)


def _encode_batch(batch: pa.Table, ranks: dict, cache: dict) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_words, n_bpe_tokens).

    Vectorized word explode (same RE2 kernels as training, so the word
    inventory matches the merge table exactly); the per-word merge loop
    runs once per DISTINCT word (dictionary-encode + per-worker cache —
    Heaps-bounded, capped at _WORD_CACHE_CAP with a log), then per-doc
    sums are one ``np.bincount``.
    """
    import numpy as np

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
    n_words = np.zeros(n_docs, np.int64)
    n_tokens = np.zeros(n_docs, np.int64)
    idx = np.flatnonzero(nonempty.to_numpy(zero_copy_only=False))

    if len(flat):
        d = flat.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        codes = d.indices.to_numpy(zero_copy_only=False)
        lens = np.empty(len(uniq), np.int64)
        for u, w in enumerate(uniq):
            got = cache.get(w)
            if got is None:
                got = _encode_len(w, ranks)
                if len(cache) < _WORD_CACHE_CAP:
                    cache[w] = got
                elif len(cache) == _WORD_CACHE_CAP:
                    cache[w] = got  # tip over once so the log fires once
                    logger.warning(
                        "bpe_encode: per-worker word cache reached %d "
                        "entries; further distinct words encode uncached",
                        _WORD_CACHE_CAP,
                    )
            lens[u] = got
        n_ne = int(parents[-1]) + 1
        n_words[idx[:n_ne]] = np.bincount(parents, minlength=n_ne)
        n_tokens[idx[:n_ne]] = np.round(
            np.bincount(
                parents, weights=lens[codes].astype(np.float64), minlength=n_ne
            )
        ).astype(np.int64)
        # float64 bincount weights are exact here: per-doc token sums stay
        # far below 2^53

    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_words, pa.int64()),
            pa.array(n_tokens, pa.int64()),
        ],
        names=["doc_id", "n_words", "n_bpe_tokens"],
    )


def _ranks(merges: pa.Table) -> dict:
    return {
        (l, r): k
        for k, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(), merges.column("right").to_pylist())
        )
    }


def bpe_encode_counts(
    docs: "ray.data.Dataset", merges: pa.Table
) -> "ray.data.Dataset":
    """Apply a learned merge table to the corpus: per-doc word and
    BPE-token counts — the tokenizer-application step that prices a
    corpus in tokens under the trained vocabulary.

    Shape: the merge table is tiny (n_merges rows) and broadcast once via
    ``ray.put``; encoding is a stateless task stage (per-worker rank dict
    + word cache rebuilt from the broadcast on first touch — cheap state,
    so tasks beat an actor pool's per-execution cold start). Zero
    exchanges; output streams.
    """
    import ray as _ray

    mref = _ray.put((merges.column("left").to_pylist(), merges.column("right").to_pylist()))

    def enc(batch: pa.Table, *, _m=mref) -> pa.Table:
        cache = enc.__dict__
        if "ranks" not in cache:
            left, right = _ray.get(_m)
            cache["ranks"] = {p: k for k, p in enumerate(zip(left, right))}
            cache["words"] = {}
        return _encode_batch(batch, cache["ranks"], cache["words"])

    return docs.map_batches(enc, batch_format="pyarrow")


def bpe_encode_oracle(docs_tbl: pa.Table, merges: pa.Table) -> pa.Table:
    """Single-process replica of ``bpe_encode_counts`` — the same word
    kernels and per-word merge loop on the whole corpus as one batch;
    bit-equal because per-word encoding is batching-independent."""
    return _encode_batch(docs_tbl, _ranks(merges), {})


def bpe_train_oracle(
    docs: pa.Table,
    n_merges: int = 50,
    max_words: int = 100_000,
    min_count: int = 2,
) -> pa.Table:
    """Single-process replica: the SAME Arrow counting kernels (so RE2
    whitespace semantics match exactly), the same cap order and the same
    merge loop — bit-equal to the distributed run."""
    counted = _count_batch(docs)
    g = counted.group_by("word").aggregate([("n", "sum")])
    idx = pc.sort_indices(
        g,
        sort_keys=[("n_sum", "descending"), ("word", "ascending")],
    )[: max_words]
    g = g.take(idx)
    return _learn_merges(
        g.column("word").to_pylist(),
        [int(x) for x in g.column("n_sum").to_pylist()],
        n_merges,
        min_count,
    )
