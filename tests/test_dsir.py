"""DSIR importance weights vs the single-process replica oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from agentic_doc_ray.functions.dsir import (
    _log_ratio_vector,
    dsir_weights,
    dsir_weights_oracle,
)


def _tbl():
    rng = np.random.default_rng(3)
    en = ["the", "of", "and", "model", "data", "train"]
    de = ["der", "und", "von", "modell", "daten"]
    rows = []
    for i in range(30):
        words, lang = (en, "en") if i % 2 else (de, "de")
        n = int(rng.integers(0, 25))
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(words, n)) if n else "",
                "lang": lang,
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
        ),
    )


def test_matches_replica_any_partitioning():
    t = _tbl()
    want = dsir_weights_oracle(t).to_pylist()
    for parts in (1, 6):
        got = (
            dsir_weights(ray.data.from_arrow(t).repartition(parts))
            .to_pandas()
            .sort_values("doc_id")
            .to_dict("records")
        )
        assert got == want


def test_target_docs_score_higher_and_empty_doc_zero():
    t = _tbl()
    rows = {r["doc_id"]: r for r in dsir_weights_oracle(t).to_pylist()}
    langs = dict(zip(t.column("doc_id").to_pylist(), t.column("lang").to_pylist()))
    per_feat = {
        d: r["log_ratio_micro"] / r["n_feats"]
        for d, r in rows.items()
        if r["n_feats"]
    }
    en = [v for d, v in per_feat.items() if langs[d] == "en"]
    de = [v for d, v in per_feat.items() if langs[d] == "de"]
    assert en and de and np.mean(en) > np.mean(de)
    for d, r in rows.items():
        if r["n_feats"] == 0:
            assert r["log_ratio_micro"] == 0


def test_select_matches_replica_and_enriches_target():
    from agentic_doc_ray.functions.dsir import dsir_select, dsir_select_oracle

    t = _tbl()
    want = dsir_select_oracle(t, k=10).to_pylist()
    assert len(want) == 10
    for parts in (1, 6):
        got = dsir_select(ray.data.from_arrow(t).repartition(parts), k=10).take_all()
        assert got == want
    langs = dict(zip(t.column("doc_id").to_pylist(), t.column("lang").to_pylist()))
    frac = sum(langs[r["doc_id"]] == "en" for r in want) / len(want)
    base = sum(l == "en" for l in langs.values()) / t.num_rows
    assert frac > base  # selection is target-enriched
    # k larger than the corpus returns every doc, still deterministic
    assert dsir_select_oracle(t, k=10_000).num_rows == t.num_rows


def test_log_ratio_vector_smoothing():
    # no counts at all: every feature's ratio is log(1/D)-log(1/D) = 0
    empty = pa.table(
        {
            "label": pa.array([], pa.int8()),
            "j": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )
    assert (_log_ratio_vector(empty) == 0).all()
