"""Unigram-LM tokenizer training (Kudo 2018, the SentencePiece unigram
model) — the second tokenizer trainer beside ``functions/bpe.py``.

Algorithm: seed a large candidate vocabulary (frequent substrings),
then iterate EM — E-step Viterbi-segments every word under the current
piece scores, M-step recounts piece usage from those segmentations —
pruning low-usage pieces down to the target size.

Scale shape (mirrors BPE's): the corpus-sized work is the ONE
distributed word-frequency count (``bpe.word_counts``, Heaps-bounded,
capped with a logged drop). Each EM round then runs DISTRIBUTED over
the word table: piece scores broadcast once via ``ray.put``, per-batch
Viterbi + usage partials (one row per distinct (batch, piece)), and a
tiny piece-keyed groupby — the corpus itself is never re-scanned.

Determinism (bit-equal replica): usage counts are exact integers;
scores are integer micro-bits ``round(1e6 * log2(count/total))``
computed by ONE shared helper on identically-ordered arrays; Viterbi
maximizes the integer score sum with a fixed tie-break (prefer the
LONGER last piece); pruning uses the total order (usage desc, piece
asc) and always retains single characters (coverage guarantee).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray
import ray.data

logger = logging.getLogger(__name__)

VOCAB_SCHEMA = pa.schema(
    [
        ("piece", pa.string()),
        ("count", pa.int64()),
        ("score_micro", pa.int64()),
    ]
)

_SCALE = 1_000_000


def _scores_from_counts(pieces: list[str], counts: list[int]) -> dict[str, int]:
    """Integer micro-bit log-probs, identical operand order on both the
    distributed and replica sides (counts floored at 1 so single-char
    coverage pieces never lose their score)."""
    c = np.maximum(np.asarray(counts, dtype=np.int64), 1)
    total = int(c.sum())
    s = np.round(np.log2(c / np.float64(total)) * _SCALE).astype(np.int64)
    return dict(zip(pieces, s.tolist()))


def _seed_vocab(
    words: list[str],
    freqs: list[int],
    max_piece_len: int,
    seed_size: int,
) -> tuple[list[str], list[int]]:
    """Candidate pieces: every substring up to ``max_piece_len`` weighted
    by word frequency, top ``seed_size`` under (count desc, piece asc),
    plus ALL single characters (always kept)."""
    counts: dict[str, int] = {}
    for w, f in zip(words, freqs):
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + f
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[: max(0, seed_size - len(chars))]
    kept = sorted(chars) + [p for p, _ in multi]
    kept.sort()
    return kept, [counts[p] for p in kept]


def _viterbi(word: str, scores: dict[str, int], max_piece_len: int) -> list[str]:
    """Best segmentation under integer piece scores; ties prefer the
    longer last piece (smaller split point). Single chars are always in
    ``scores``, so every word is segmentable."""
    L = len(word)
    NEG = -(1 << 62)
    best = [NEG] * (L + 1)
    back = [0] * (L + 1)
    best[0] = 0
    for i in range(1, L + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j] == NEG:
                continue
            s = scores.get(word[j:i])
            if s is None:
                continue
            cand = best[j] + s
            # j ascends and we overwrite only on strict improvement, so
            # ties keep the smallest j = the longest last piece
            if cand > best[i]:
                best[i], back[i] = cand, j
    out = []
    i = L
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _usage_from_words(
    words: list[str],
    freqs: list[int],
    scores: dict[str, int],
    max_piece_len: int,
) -> dict[str, int]:
    """M-step partial: piece usage counts from Viterbi segmentations,
    occurrence-weighted — shared by the batch task and the replica."""
    usage: dict[str, int] = {}
    for w, f in zip(words, freqs):
        for p in _viterbi(w, scores, max_piece_len):
            usage[p] = usage.get(p, 0) + f
    return usage


def _prune(
    usage: dict[str, int], vocab_size: int
) -> tuple[list[str], list[int]]:
    """Keep single chars + the top multi-char pieces by (usage desc,
    piece asc); returns piece-sorted lists."""
    chars = sorted(p for p in usage if len(p) == 1)
    multi = sorted(
        ((p, c) for p, c in usage.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[: max(0, vocab_size - len(chars))]
    kept = chars + [p for p, _ in multi]
    kept.sort()
    return kept, [usage[p] for p in kept]


def unigram_train(
    docs: "ray.data.Dataset",
    vocab_size: int = 512,
    n_iters: int = 3,
    max_piece_len: int = 6,
    seed_size: int = 4096,
    max_words: int = 100_000,
) -> "ray.data.Dataset":
    """Train a unigram-LM tokenizer vocabulary; returns one row per kept
    piece: (piece, count, score_micro), count = final-round Viterbi
    usage, score_micro = its integer log2-prob.

    One corpus-scale exchange (word counts) + ``n_iters`` small
    exchanges over piece-usage partials; scores broadcast per round.
    """
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions._exchange import str_key_sentinels
    from agentic_doc_ray.functions.bpe import word_counts

    wc = word_counts(docs, max_words=max_words)
    words = wc.column("word").to_pylist()
    freqs = [int(x) for x in wc.column("n").to_pylist()]
    if not words:
        return ray.data.from_arrow(VOCAB_SCHEMA.empty_table())

    pieces, counts = _seed_vocab(words, freqs, max_piece_len, seed_size)
    word_ds = ray.data.from_arrow(wc).repartition(shuffle_partitions(8))
    part_schema = pa.schema([("piece", pa.string()), ("n", pa.int64())])

    usage: dict[str, int] = dict(zip(pieces, counts))
    for it in range(n_iters):
        scores_ref = ray.put(_scores_from_counts(pieces, counts))

        def partial(batch: pa.Table, *, _ref=scores_ref, _mpl=max_piece_len) -> pa.Table:
            cache = partial.__dict__
            if "scores" not in cache:
                cache["scores"] = ray.get(_ref)
            u = _usage_from_words(
                batch.column("word").to_pylist(),
                [int(x) for x in batch.column("n").to_pylist()],
                cache["scores"],
                _mpl,
            )
            items = sorted(u.items())
            return pa.Table.from_pydict(
                {
                    "piece": [p for p, _ in items],
                    "n": [c for _, c in items],
                },
                schema=part_schema,
            )

        agg = (
            word_ds.map_batches(partial, batch_format="pyarrow")
            # sentinel pieces are NUL-prefixed: can never collide with a
            # real piece, summed to 0 and absent from `usage` lookups
            .union(str_key_sentinels(part_schema, "piece", fill={"n": 0}))
            .groupby("piece", num_partitions=shuffle_partitions(8))
            .aggregate(Sum("n", alias_name="n"))
        )
        usage = {
            r["piece"]: int(r["n"])
            for r in agg.take_all()
            if not r["piece"].startswith("\x00") and int(r["n"]) > 0
        }
        # coverage floor: chars stay even if a round starved them
        for p in pieces:
            if len(p) == 1 and p not in usage:
                usage[p] = 0
        pieces, counts = _prune(usage, vocab_size)

    scores = _scores_from_counts(pieces, counts)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "piece": pieces,
                "count": counts,
                "score_micro": [scores[p] for p in pieces],
            },
            schema=VOCAB_SCHEMA,
        )
    )


def unigram_train_oracle(
    docs_tbl: pa.Table,
    vocab_size: int = 512,
    n_iters: int = 3,
    max_piece_len: int = 6,
    seed_size: int = 4096,
    max_words: int = 100_000,
) -> pa.Table:
    """Single-process replica sharing every helper — bit-equal because
    usage counts are exact integers and scores come from the one shared
    micro-bit helper on identically-ordered arrays."""
    import pyarrow.compute as pc

    from agentic_doc_ray.functions.bpe import _count_batch

    g = _count_batch(docs_tbl)
    g = (
        g.group_by("word")
        .aggregate([("n", "sum")])
        .rename_columns(["word", "n"])
    )
    order = pc.sort_indices(
        g, sort_keys=[("n", "descending"), ("word", "ascending")]
    )
    g = g.take(order.slice(0, max_words))
    words = g.column("word").to_pylist()
    freqs = [int(x) for x in g.column("n").to_pylist()]
    if not words:
        return VOCAB_SCHEMA.empty_table()
    pieces, counts = _seed_vocab(words, freqs, max_piece_len, seed_size)
    for _ in range(n_iters):
        scores = _scores_from_counts(pieces, counts)
        usage = _usage_from_words(words, freqs, scores, max_piece_len)
        usage = {p: c for p, c in usage.items() if c > 0}
        for p in pieces:
            if len(p) == 1 and p not in usage:
                usage[p] = 0
        pieces, counts = _prune(usage, vocab_size)
    scores = _scores_from_counts(pieces, counts)
    return pa.Table.from_pydict(
        {
            "piece": pieces,
            "count": counts,
            "score_micro": [scores[p] for p in pieces],
        },
        schema=VOCAB_SCHEMA,
    )


def unigram_encode_counts(
    docs: "ray.data.Dataset",
    vocab: pa.Table,
    max_piece_len: int = 6,
) -> "ray.data.Dataset":
    """Apply a trained unigram vocabulary: per document, the Viterbi
    token count and character coverage — the tokenizer-fertility signal
    (chars per token) a data pipeline tracks per corpus slice.

    The vocabulary broadcasts once via ``ray.put`` (vocab-sized); each
    batch segments its distinct words through a per-worker word cache
    (Heaps-bounded, same pattern as ``bpe_encode_counts``) and sums
    occurrence-weighted token counts per doc — batch-local, zero
    exchanges. Output: (doc_id, n_chars, n_tokens).
    """
    import pyarrow.compute as pc

    from agentic_doc_ray.functions.text import _regex_trim

    scores = dict(
        zip(vocab.column("piece").to_pylist(), vocab.column("score_micro").to_pylist())
    )
    sref = ray.put(scores)

    def enc(batch: pa.Table, *, _ref=sref, _mpl=max_piece_len) -> pa.Table:
        cache = enc.__dict__
        if "scores" not in cache:
            cache["scores"] = ray.get(_ref)
            cache["words"] = {}
        sc, wcache = cache["scores"], cache["words"]
        trimmed = _regex_trim(batch.column("text"))
        out_tok, out_chars = [], []
        for txt in trimmed.to_pylist():
            toks = (txt or "").split()
            n_tok = 0
            for w in toks:
                n = wcache.get(w)
                if n is None:
                    n = len(_viterbi(w, sc, _mpl))
                    if len(wcache) < 1 << 20:
                        wcache[w] = n
                n_tok += n
            out_tok.append(n_tok)
            out_chars.append(sum(len(w) for w in toks))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").to_pylist(),
                "n_chars": out_chars,
                "n_tokens": out_tok,
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_chars", pa.int64()),
                    ("n_tokens", pa.int64()),
                ]
            ),
        )

    return docs.map_batches(enc, batch_format="pyarrow")


def unigram_encode_oracle(
    docs_tbl: pa.Table, vocab: pa.Table, max_piece_len: int = 6
) -> pa.Table:
    """Single-process replica of ``unigram_encode_counts`` (same Viterbi
    + same whitespace split; per-doc deterministic => bit-equal)."""
    from agentic_doc_ray.functions.text import _regex_trim

    scores = dict(
        zip(vocab.column("piece").to_pylist(), vocab.column("score_micro").to_pylist())
    )
    trimmed = _regex_trim(docs_tbl.column("text"))
    rows = {"doc_id": [], "n_chars": [], "n_tokens": []}
    for d, txt in zip(docs_tbl.column("doc_id").to_pylist(), trimmed.to_pylist()):
        toks = (txt or "").split()
        rows["doc_id"].append(d)
        rows["n_chars"].append(sum(len(w) for w in toks))
        rows["n_tokens"].append(
            sum(len(_viterbi(w, scores, max_piece_len)) for w in toks)
        )
    return pa.Table.from_pydict(
        rows,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("n_chars", pa.int64()), ("n_tokens", pa.int64())]
        ),
    )
