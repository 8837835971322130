"""Unigram-LM tokenizer training: Viterbi determinism, coverage,
distributed EM == bit-equal replica."""

import pyarrow as pa
import pyarrow.parquet as pq

from agentic_doc_ray.functions.unigram import (
    _scores_from_counts,
    _seed_vocab,
    _viterbi,
    unigram_train,
    unigram_train_oracle,
)

SF = "/root/testdata/sf0.001"


def test_viterbi_prefers_high_score_and_long_last():
    scores = _scores_from_counts(["a", "b", "ab", "abb"], [1, 1, 100, 100])
    # "abb" as one piece beats any split (one log-prob vs sums of them)
    assert _viterbi("abb", scores, 6) == ["abb"]
    # unseen word falls back to chars
    assert _viterbi("ba", scores, 6) == ["b", "a"]
    # fewer pieces win when scores make it strictly better
    assert _viterbi("abba", scores, 6) == ["abb", "a"]
    # true tie ("ab"+"ab" vs "abb"? no — "abab": "ab"+"ab" beats any
    # char mix; deterministic either way): pin the output
    assert _viterbi("abab", scores, 6) == ["ab", "ab"]


def test_seed_vocab_keeps_all_chars():
    pieces, counts = _seed_vocab(["aab", "bc"], [2, 1], 3, seed_size=4)
    assert {p for p in pieces if len(p) == 1} == {"a", "b", "c"}
    assert pieces == sorted(pieces)
    assert all(c > 0 for c in counts)


def test_segmentation_covers_every_word():
    """Every trained vocab must segment every corpus word exactly (the
    single-char retention guarantee)."""
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    vocab = unigram_train_oracle(tbl, vocab_size=64, n_iters=2)
    scores = dict(
        zip(vocab.column("piece").to_pylist(), vocab.column("score_micro").to_pylist())
    )
    from agentic_doc_ray.functions.bpe import _count_batch

    words = _count_batch(tbl).column("word").to_pylist()[:500]
    for w in words:
        segs = _viterbi(w, scores, 6)
        assert "".join(segs) == w


def test_distributed_matches_replica():
    import pandas as pd
    import ray.data

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(6)
    got = unigram_train(ds, vocab_size=128, n_iters=2).to_pandas().reset_index(drop=True)
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = unigram_train_oracle(tbl, vocab_size=128, n_iters=2).to_pandas().reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_encode_distributed_matches_replica():
    """Tokenizer application: distributed Viterbi encode == replica;
    fertility (chars/token) is finite and > 1 on the synthetic corpus."""
    import pandas as pd
    import ray.data

    from agentic_doc_ray.functions.unigram import (
        unigram_encode_counts,
        unigram_encode_oracle,
    )

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    vocab = unigram_train_oracle(tbl, vocab_size=128, n_iters=2)
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(6)
    got = (
        unigram_encode_counts(ds, vocab)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        unigram_encode_oracle(tbl, vocab)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got.n_tokens.sum() > 0
    assert got.n_chars.sum() > got.n_tokens.sum()  # multi-char pieces won


# --- hypothesis: EM determinism under arbitrary corpora/batching --------

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcd", min_size=1, max_size=8)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(_doc, min_size=1, max_size=8),
    nparts=st.integers(1, 5),
    vocab_size=st.integers(8, 64),
)
def test_unigram_em_batching_independent(texts, nparts, vocab_size):
    """The distributed EM equals the single-process replica bit for bit
    on arbitrary corpora, regardless of partitioning."""
    import pandas as pd
    import ray.data

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = (
        unigram_train(
            ray.data.from_arrow(t).repartition(nparts),
            vocab_size=vocab_size,
            n_iters=2,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    want = unigram_train_oracle(t, vocab_size=vocab_size, n_iters=2).to_pandas()
    if len(got) == 0 and len(want) == 0:
        # an empty Ray dataset drops its schema in to_pandas (known Ray
        # artifact); both sides agree the vocab is empty
        return
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
