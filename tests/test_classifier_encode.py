"""BPE encoding, the hashed-centroid classifier and CCNet buckets vs
their single-process replica oracles, at several partitionings."""

import numpy as np
import pyarrow as pa
import ray.data

from agentic_doc_ray.functions.bpe import (
    _encode_len,
    _ranks,
    bpe_encode_counts,
    bpe_encode_oracle,
    bpe_train,
    bpe_train_oracle,
)
from agentic_doc_ray.functions.classifier import (
    classifier_gated_sample,
    quality_classifier,
    quality_classifier_oracle,
)
from agentic_doc_ray.functions.text import ccnet_buckets, ccnet_buckets_oracle


def _docs_tbl():
    rng = np.random.default_rng(7)
    texts, langs = [], []
    en_words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    de_words = ["der", "schnelle", "braune", "fuchs", "springt", "faul", "hund"]
    for i in range(40):
        if i % 3 == 0:
            words, lang = de_words, "de"
        else:
            words, lang = en_words, "en"
        n = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(words, n)) if n else "")
        langs.append(lang)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def test_encode_len_merge_order():
    # ranks: (e,s) then (es,t) — 'newest' -> n e w es t -> n e w est = 4
    merges = pa.Table.from_pydict(
        {"left": ["e", "es"], "right": ["s", "t"]}
    )
    ranks = _ranks(merges)
    assert _encode_len("newest", ranks) == 4
    assert _encode_len("widest", ranks) == 4
    assert _encode_len("low", ranks) == 3  # no merge applies
    assert _encode_len("", ranks) == 0
    assert _encode_len("e", ranks) == 1


def test_bpe_encode_matches_oracle_any_partitioning():
    t = _docs_tbl()
    merges = bpe_train_oracle(t, n_merges=20)
    want = bpe_encode_oracle(t, merges).to_pylist()
    # sanity: token count <= word-char count and >= word count
    for r, txt in zip(want, t.column("text").to_pylist()):
        words = txt.split()
        assert r["n_words"] == len(words)
        assert r["n_bpe_tokens"] >= len(words)
        assert r["n_bpe_tokens"] <= sum(len(w) for w in words)
    dist_merges = bpe_train(ray.data.from_arrow(t), n_merges=20)
    assert dist_merges.to_pylist() == merges.to_pylist()
    for parts in (1, 7):
        got = (
            bpe_encode_counts(
                ray.data.from_arrow(t).repartition(parts), dist_merges
            )
            .to_pandas()
            .sort_values("doc_id")
            .to_dict("records")
        )
        assert got == want


def test_classifier_matches_oracle_and_separates():
    t = _docs_tbl()
    want = quality_classifier_oracle(t).to_pylist()
    by_id = {r["doc_id"]: r for r in want}
    langs = t.column("lang").to_pylist()
    texts = t.column("text").to_pylist()
    # separable vocabularies: every non-empty doc classifies to its label
    for i, (lg, tx) in enumerate(zip(langs, texts)):
        if tx:
            assert by_id[i]["pred"] == ("en" if lg == "en" else "other")
    for parts in (1, 7):
        got = (
            quality_classifier(ray.data.from_arrow(t).repartition(parts))
            .to_pandas()
            .sort_values("doc_id")
            .to_dict("records")
        )
        assert got == want


def test_gated_sample_is_the_hash_filtered_scoring():
    import hashlib

    t = _docs_tbl()
    scored = {r["doc_id"]: r for r in quality_classifier_oracle(t).to_pylist()}
    rates = {"en": 900, "other": 250}
    want = sorted(
        d
        for d, r in scored.items()
        if int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16) % 1000
        < rates[r["pred"]]
    )
    for parts in (1, 7):
        got = classifier_gated_sample(
            ray.data.from_arrow(t).repartition(parts)
        ).to_pandas()
        assert sorted(got.doc_id) == want
        # surviving rows carry the replica's exact scores
        assert all(
            scored[d]["score"] == s for d, s in zip(got.doc_id, got.score)
        )


def test_classifier_degenerate_single_class():
    # all-negative corpus: N_pos = 0 zeroes the cross-multiplied weight
    # vector (w = N_neg*S_pos - N_pos*S_neg = 0), so every doc scores 0
    # and falls to the negative class; still bit-equal to the replica
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(["der hund läuft"] * 5 + [""], pa.string()),
            "lang": pa.array(["de"] * 6, pa.string()),
        }
    )
    want = quality_classifier_oracle(t).to_pylist()
    for r in want:
        assert r["pred"] == "other"
        assert r["score"] == 0
    got = (
        quality_classifier(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .to_dict("records")
    )
    assert got == want


def test_ccnet_buckets_matches_oracle_and_terciles():
    t = _docs_tbl()
    want = ccnet_buckets_oracle(t).to_pylist()
    # per language, every bucket name is valid and head <= middle <= tail keys
    for lg in ("en", "de"):
        rows = [r for r in want if r["lang"] == lg]
        assert rows
        hi_head = max(
            (r["ppl_cb"] for r in rows if r["bucket"] == "head"), default=-1
        )
        lo_tail = min(
            (r["ppl_cb"] for r in rows if r["bucket"] == "tail"),
            default=1 << 62,
        )
        assert hi_head <= lo_tail
    for parts in (1, 7):
        got = (
            ccnet_buckets(ray.data.from_arrow(t).repartition(parts))
            .to_pandas()
            .sort_values("doc_id")
            .to_dict("records")
        )
        assert got == sorted(want, key=lambda r: r["doc_id"])
