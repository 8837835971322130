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

    np_ = shuffle_partitions(8)
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
