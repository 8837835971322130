"""Benchmark harness. Prints ONE JSON line:

    {"metric": "extract_sf_corpus", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <dir>, "num_cpus": N,
     "docs_per_sec": ...}

Headline: the flagship extraction pipeline (corpus -> parsed docs ->
parquet sink) over the corpus derived from $GRAFT_SF_DIR (default sf0.1).

--scaling: runs the headline twice in FRESH processes at num_cpus=8 and 32
on the same input and reports both plus efficiency = (t8/t32)/4 — the
sandbox stand-in for N vs 4N nodes (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# corpus replication: fixed overhead (session + scheduling) must not
# dominate, or the headline measures Ray startup, not the pipeline. The
# default x8 corpus (~40k docs at sf0.1) is the recorded protocol;
# --scaling uses x64.
REPL = int(os.environ.get("GRAFT_BENCH_REPL", "8"))


def _scaling_result(n_fused: int = 3, n_skew: int = 2) -> dict:
    def run(ncpu: int, skew: bool = False) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_REPL=os.environ.get("GRAFT_BENCH_REPL", "64"),
            GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        if skew:
            env["GRAFT_BENCH_SKEW"] = "1"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # three alternating trials per level, min per level: the host is a
    # time-shared VM and single trials vary ~2x under neighbor load — the
    # 32-CPU level is hit hardest (it needs all hyperthreads at once, so
    # steal time lands squarely on it)
    lo, hi = 8, 32
    trials_lo, trials_hi = [], []
    for _ in range(n_fused):  # genuinely alternate so both levels sample
        trials_lo.append(run(lo))  # the same noise regime
        trials_hi.append(run(hi))
    r_lo = min(trials_lo, key=lambda r: r["value"])
    r_hi = min(trials_hi, key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)

    # skew-path protocol (VERDICT r03 #5): the fused headline has zero
    # exchanges, so it cannot surface multi-node shuffle risk. Run the
    # size-aware adaptive pipeline over the mega-doc-heavy corpus (1% of
    # docs at 10^4 spans — span mass dominated by the two-phase salted
    # split/merge branch) at both levels too.
    sk_lo, sk_hi = [], []
    for _ in range(n_skew):
        sk_lo.append(run(lo, skew=True))
        sk_hi.append(run(hi, skew=True))
    s_lo = min(sk_lo, key=lambda r: r["value"])
    s_hi = min(sk_hi, key=lambda r: r["value"])
    s_eff = (s_lo["value"] / s_hi["value"]) / (hi / lo)
    return {
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "skew_sec_8": s_lo["value"],
        "skew_sec_32": s_hi["value"],
        "skew_spans_per_sec_8": s_lo.get("spans_per_sec"),
        "skew_spans_per_sec_32": s_hi.get("spans_per_sec"),
        "skew_scaling_efficiency": round(s_eff, 3),
        "sf": SF_DIR,
    }


def _scaling() -> None:
    print(json.dumps(_scaling_result()))


def main() -> None:
    if "--scaling" in sys.argv:
        _scaling()
        return

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    from agentic_doc_ray.context import tune_context

    tune_context()

    from agentic_doc_ray.config import EngineConfig
    from agentic_doc_ray.pipelines import extract_corpus
    from agentic_doc_ray.synth import corpus_path_for

    # untimed: corpus synthesis is cached; one read warms the page cache and
    # a small extract warms the Ray worker pool (process startup + imports
    # otherwise land inside the first timed pipeline)
    skew_mode = bool(os.environ.get("GRAFT_BENCH_SKEW"))
    if skew_mode:
        from agentic_doc_ray.synth import skewed_corpus_path_for

        corpus_path = skewed_corpus_path_for(SF_DIR)
    elif REPL > 1:
        from agentic_doc_ray.synth import replicated_corpus_path_for

        corpus_path = replicated_corpus_path_for(SF_DIR, REPL)
    else:
        corpus_path = corpus_path_for(SF_DIR)
    n_docs = ray.data.read_parquet(corpus_path).count()
    # batch size ~ n_docs/(cpus*5): big corpora get big batches (fewer
    # tasks -> less per-task IPC, the sandbox's bottleneck), small corpora
    # still fan out across every core
    bs = max(128, min(4000, n_docs // (NUM_CPUS * 5)))
    if skew_mode:
        # skew protocol: IDENTICAL plan shape at every CPU level (block
        # count fixed by the data, not the cluster — the multi-node
        # analogue), batches sized for span mass rather than doc count.
        # np=8 measured best at BOTH levels: exchange fixed cost scales
        # with partition count, and 16 merge tasks already saturate the
        # mega span mass
        bs = 2048
        cfg = EngineConfig(
            parse_concurrency=(1, max(2, NUM_CPUS - 4)),
            parse_batch_size=bs,
            explode_batch_size=bs,
            reassemble_num_partitions=8,
        )
    else:
        cfg = EngineConfig(
            parse_concurrency=(1, max(2, NUM_CPUS - 4)),
            parse_batch_size=bs,
            explode_batch_size=bs,
            reassemble_num_partitions=max(8, NUM_CPUS // 2),
        )
    extract_corpus(ray.data.read_parquet(corpus_path).limit(200), cfg).count()

    timings: dict[str, float] = {}
    # --only <substr> [...]: time only matching queries (targeted perf
    # iteration without paying for the whole suite); headline always runs
    only = (
        sys.argv[sys.argv.index("--only") + 1 :]
        if "--only" in sys.argv
        else None
    )

    def timed(name: str, fn, trials: int = 1) -> None:
        if only and name != "extract" and not any(s in name for s in only):
            return
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        # the host is a time-shared VM with visible steal time: identical
        # runs vary up to ~8x under neighbor load, so a single slow trial
        # says little. Re-trial once and keep the min — bounded extra cost,
        # large variance reduction (BASELINE.md).
        if trials == 1 and best < 30.0:
            t0 = time.perf_counter()
            fn()
            dt2 = time.perf_counter() - t0
            worst = max(best, dt2)
            best = min(best, dt2)
            if worst > 3 * best:
                # the two trials disagree wildly — a steal spike hit one of
                # them; a third tie-breaker costs little and saves the stat
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # --- headline: full extraction with parquet sink ----------------------
    sink = f"/tmp/bench_out/{os.path.basename(os.path.normpath(SF_DIR))}-{NUM_CPUS}"

    def headline() -> None:
        shutil.rmtree(sink, ignore_errors=True)
        ds = (
            ray.data.read_parquet(corpus_path, override_num_blocks=32)
            if skew_mode
            else ray.data.read_parquet(corpus_path)
        )
        if skew_mode:
            # the skew protocol times the size-aware adaptive router: mega
            # docs take the salted two-phase split/merge branch
            from agentic_doc_ray.pipelines import extract_corpus_adaptive

            extract_corpus_adaptive(ds, cfg).write_parquet(sink)
        else:
            extract_corpus(ds, cfg).write_parquet(sink)

    # min of 2 steady-state runs: the sandbox host is time-shared and single
    # runs vary >2x under neighbor load; min approximates uncontended time
    timed("extract", headline, trials=2)

    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        out = {
            "metric": "extract_sf_corpus_skew" if skew_mode else "extract_sf_corpus",
            "value": timings["extract"],
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_docs": n_docs,
            "repl": 1 if skew_mode else REPL,
            "docs_per_sec": round(n_docs / timings["extract"], 1),
        }
        if skew_mode:
            import pyarrow.compute as _pc
            import pyarrow.parquet as _pq
            import glob as _glob

            n_spans = sum(
                _pc.sum(
                    _pc.list_value_length(_pq.read_table(f, columns=["spans"])["spans"])
                ).as_py()
                for f in _glob.glob(os.path.join(corpus_path, "*.parquet"))
            )
            out["n_spans"] = n_spans
            out["spans_per_sec"] = round(n_spans / timings["extract"], 1)
        print(json.dumps(out))
        ray.shutdown()
        return

    # --- size-aware router: same corpus through extract_corpus_adaptive
    # (small docs -> fused path, mega docs -> two-phase exchange); times
    # the router's overhead vs the plain fused headline
    def adaptive() -> None:
        from agentic_doc_ray.pipelines import extract_corpus_adaptive

        extract_corpus_adaptive(
            ray.data.read_parquet(corpus_path), cfg
        ).count()

    timed("extract_adaptive", adaptive)

    # --- structured table extraction over the flagship span stream
    def table_cells_q() -> None:
        from agentic_doc_ray.functions.tables import table_cells
        from agentic_doc_ray.pipelines import extract_flat_spans

        table_cells(
            extract_flat_spans(ray.data.read_parquet(corpus_path), cfg)
        ).count()

    timed("table_cells", table_cells_q)

    def outline_q() -> None:
        from agentic_doc_ray.functions.tables import doc_outline
        from agentic_doc_ray.pipelines import extract_corpus

        doc_outline(
            extract_corpus(ray.data.read_parquet(corpus_path), cfg)
        ).count()

    timed("doc_outline", outline_q)

    # --- secondary pipelines ----------------------------------------------
    docs = lambda: ray.data.read_parquet(  # noqa: E731
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )

    from agentic_doc_ray.functions import analytics as A
    from agentic_doc_ray.functions import dedup as D
    from agentic_doc_ray.functions import text as T

    timed("token_counts", lambda: T.token_counts(docs()).count())
    timed("lang_id", lambda: T.lang_id(docs()).count())
    timed("keyword_tag_counts", lambda: T.keyword_tag_counts(docs()).count())
    from agentic_doc_ray.context import partitions_for as _pfor

    n_doc_rows = docs().count()  # metadata-only; sizes exchange widths
    timed(
        "exact_dedup",
        lambda: D.exact_dedup(
            docs(), shuffle_partitions=_pfor(n_doc_rows)
        ).count(),
    )
    timed(
        "minhash_dedup",
        lambda: D.minhash_dedup_pairs(
            docs().map_batches(
                lambda b: b.set_column(
                    b.schema.get_field_index("doc_id"),
                    "doc_id",
                    b["doc_id"].cast("string"),
                ),
                batch_format="pyarrow",
            ),
            threshold=0.9,
        ).count(),
    )
    timed("simhash", lambda: D.simhashes(docs()).count())
    timed("token_commonness", lambda: T.token_commonness(docs()).count())

    def cms_q() -> None:
        from agentic_doc_ray.functions.sketches import cms_token_counts

        cms_token_counts(docs(), ["hash", "join", "vector", "window"])

    timed("cms_token_counts", cms_q)
    timed("bigram_lm_nll", lambda: T.bigram_lm_score(docs()).count())
    timed("pmi_collocations", lambda: T.pmi_collocations(docs()).count())
    timed("vocab_growth", lambda: T.vocab_growth(docs()).num_rows)

    def distinctive_q() -> None:
        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet",
            columns=["doc_id", "text", "source"],
        )
        T.distinctive_terms(d, k=10, min_tf=3).num_rows

    timed("distinctive_terms", distinctive_q)
    timed("mink_prob", lambda: T.mink_prob_score(docs()).count())
    from agentic_doc_ray.functions.cdc import cdc_dedup_stats as _cdc

    timed("cdc_dedup_stats", lambda: _cdc(docs()).count())

    def streaming_dedup_q() -> None:
        from agentic_doc_ray.functions.streaming import streaming_dedup_keep

        streaming_dedup_keep(docs()).count()

    timed("streaming_dedup", streaming_dedup_q)

    def _cdc_transfer() -> None:
        from agentic_doc_ray.functions.cdc import cdc_transfer_stats
        from agentic_doc_ray.functions.delta import synth_second_crawl

        d = docs()
        cdc_transfer_stats(d, synth_second_crawl(docs())).count()

    timed("cdc_transfer_stats", _cdc_transfer)
    timed(
        "source_divergence",
        lambda: T.source_divergence(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet",
                columns=["doc_id", "text", "source"],
            )
        ).count(),
    )

    def domain_q() -> None:
        T.domain_prior(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet",
                columns=["doc_id", "text", "source"],
            )
        ).count()

    timed("domain_prior", domain_q)
    timed("compression_stats", lambda: T.compression_stats(docs()).count())
    timed("split_sentences", lambda: T.split_sentences(docs()).count())

    def bpe_q() -> None:
        from agentic_doc_ray.functions.bpe import bpe_train

        bpe_train(docs(), n_merges=50)

    timed("bpe_train", bpe_q)

    def unigram_q() -> None:
        from agentic_doc_ray.functions.unigram import unigram_train

        unigram_train(docs(), vocab_size=256, n_iters=3).count()

    timed("unigram_train", unigram_q)

    def unigram_encode_q() -> None:
        import pyarrow as _pa

        import ray as _ray

        from agentic_doc_ray.functions.unigram import (
            unigram_encode_counts,
            unigram_train,
        )

        vocab = _pa.concat_tables(
            [
                b
                for b in _ray.get(
                    unigram_train(docs(), vocab_size=256, n_iters=2)
                    .materialize()
                    .to_arrow_refs()
                )
                if b.num_rows
            ]
        )
        unigram_encode_counts(docs(), vocab).count()

    timed("unigram_encode", unigram_encode_q)

    def bpe_encode_q() -> None:
        from agentic_doc_ray.functions.bpe import bpe_encode_counts, bpe_train

        merges = bpe_train(docs(), n_merges=50)
        bpe_encode_counts(docs(), merges).count()

    timed("bpe_encode", bpe_encode_q)

    docs_lang = lambda: ray.data.read_parquet(  # noqa: E731
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def classifier_q() -> None:
        from agentic_doc_ray.functions.classifier import quality_classifier

        quality_classifier(docs_lang()).count()

    timed("quality_classifier", classifier_q)
    timed("ccnet_buckets", lambda: T.ccnet_buckets(docs_lang()).count())

    def dsir_q() -> None:
        from agentic_doc_ray.functions.dsir import dsir_weights

        dsir_weights(docs_lang()).count()

    timed("dsir_weights", dsir_q)

    def image_dup_q() -> None:
        from agentic_doc_ray.functions.phash import (
            image_dup_pairs,
            synth_ppm_dup_media_table,
        )

        media = ray.data.from_arrow(
            synth_ppm_dup_media_table(
                f"{SF_DIR}/documents.parquet", limit=512
            )
        )
        image_dup_pairs(media).count()

    timed("image_dup_pairs", image_dup_q)

    def scene_cuts_q() -> None:
        from agentic_doc_ray.functions.video import (
            synth_ppm_video_table,
            video_scene_cuts,
        )

        frames = ray.data.from_arrow(
            synth_ppm_video_table(f"{SF_DIR}/documents.parquet", limit=48)
        )
        video_scene_cuts(frames, threshold=8).count()

    timed("video_scene_cuts", scene_cuts_q)

    def audio_segments_q() -> None:
        from agentic_doc_ray.functions.multimodal import (
            audio_segments,
            synth_pcm_table,
        )

        media = ray.data.from_arrow(
            synth_pcm_table(f"{SF_DIR}/documents.parquet", limit=96)
        )
        audio_segments(media).count()

    timed("audio_segments", audio_segments_q)

    def video_scenes_q() -> None:
        from agentic_doc_ray.functions.video import (
            synth_ppm_video_table,
            video_scenes,
        )

        frames = ray.data.from_arrow(
            synth_ppm_video_table(f"{SF_DIR}/documents.parquet", limit=48)
        )
        video_scenes(frames, threshold=8).count()

    timed("video_scenes", video_scenes_q)

    def captions_q() -> None:
        from agentic_doc_ray.functions.captions import harvest_captions
        from agentic_doc_ray.pipelines import extract_corpus

        harvest_captions(
            extract_corpus(ray.data.read_parquet(corpus_path), cfg)
        ).count()

    timed("caption_pairs", captions_q)

    def interleave_q() -> None:
        from agentic_doc_ray.functions.interleave import interleave_stats

        interleave_stats(ray.data.read_parquet(corpus_path)).count()

    timed("interleave_stats", interleave_q)

    def snapshot_diff_q() -> None:
        from agentic_doc_ray.functions.delta import (
            snapshot_diff,
            synth_second_crawl,
        )

        d = docs()
        snapshot_diff(
            d, synth_second_crawl(d), num_partitions=_pfor(2 * n_doc_rows)
        ).count()

    timed("snapshot_diff", snapshot_diff_q)

    docs_str = lambda: docs().map_batches(  # noqa: E731
        lambda b: b.set_column(
            b.schema.get_field_index("doc_id"),
            "doc_id",
            b["doc_id"].cast("string"),
        ),
        batch_format="pyarrow",
    )

    def cc_q() -> None:
        from agentic_doc_ray.functions.graph import connected_components

        connected_components(
            D.verified_dedup_pairs(docs_str(), exact_threshold=0.8)
            .select_columns(["doc_a", "doc_b"])
        ).count()

    timed("dedup_components", cc_q)

    def pagerank_q() -> None:
        from agentic_doc_ray.functions.pagerank import link_edges, pagerank

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        n = d.count()
        pagerank(
            d.map_batches(
                lambda b: link_edges(b.column("doc_id"), n),
                batch_format="pyarrow",
            ),
            n_iter=5,
        ).count()

    timed("pagerank", pagerank_q)

    def triangle_q() -> None:
        from agentic_doc_ray.functions.graph import triangle_counts

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        triangle_counts(d, d.count()).count()

    timed("triangle_counts", triangle_q)

    def link_pred_q() -> None:
        from agentic_doc_ray.functions.graph import link_prediction

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        link_prediction(d, d.count(), k=100).count()

    timed("link_prediction", link_pred_q)

    def kcore_q() -> None:
        from agentic_doc_ray.functions.graph import kcore

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        kcore(d, d.count()).count()

    timed("kcore_numbers", kcore_q)

    def anchor_q() -> None:
        from agentic_doc_ray.functions.graph import anchor_texts

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        anchor_texts(d, d.count()).count()

    timed("anchor_texts", anchor_q)

    def clustering_q() -> None:
        from agentic_doc_ray.functions.graph import clustering_coefficient

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        clustering_coefficient(d, d.count()).count()

    timed("clustering_coefficient", clustering_q)

    def avg_nbr_deg_q() -> None:
        from agentic_doc_ray.functions.graph import avg_neighbor_degree

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        avg_neighbor_degree(d, d.count()).count()

    timed("avg_neighbor_degree", avg_nbr_deg_q)

    def zorder_q() -> None:
        from agentic_doc_ray.functions.scans import zorder_layout

        zorder_layout(SF_DIR).count()

    timed("zorder_layout", zorder_q)

    def qty_disc_cov_q() -> None:
        from agentic_doc_ray.functions.analytics import qty_discount_covariance

        qty_discount_covariance(SF_DIR).count()

    timed("qty_discount_covariance", qty_disc_cov_q)

    def code_quality_q() -> None:
        from agentic_doc_ray.functions.text import code_quality_flags

        code_quality_flags(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("code_quality_flags", code_quality_q)

    def cooccurrence_q() -> None:
        from agentic_doc_ray.functions.text import cooccurrence_counts

        cooccurrence_counts(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("cooccurrence_counts", cooccurrence_q)

    def copurchase_q() -> None:
        from agentic_doc_ray.functions.analytics import copurchase_pairs

        copurchase_pairs(SF_DIR).count()

    timed("copurchase_pairs", copurchase_q)

    def moving_avg_q() -> None:
        from agentic_doc_ray.functions.analytics import revenue_moving_avg

        revenue_moving_avg(SF_DIR).count()

    timed("revenue_moving_avg", moving_avg_q)

    def scd2_q() -> None:
        from agentic_doc_ray.functions.analytics import scd2_history

        scd2_history(SF_DIR).count()

    timed("scd2_history", scd2_q)

    def ref_integrity_q() -> None:
        from agentic_doc_ray.functions.profile import (
            referential_integrity_check,
        )

        referential_integrity_check(SF_DIR).count()

    timed("referential_integrity", ref_integrity_q)

    def revenue_gini_q() -> None:
        from agentic_doc_ray.functions.scans import revenue_gini

        revenue_gini(SF_DIR).count()

    timed("revenue_gini", revenue_gini_q)

    def degree_histogram_q() -> None:
        from agentic_doc_ray.functions.graph import degree_histogram

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        degree_histogram(d, d.count()).count()

    timed("degree_histogram", degree_histogram_q)

    def vocab_overlap_q() -> None:
        from agentic_doc_ray.functions.text import source_vocab_overlap

        source_vocab_overlap(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet",
                columns=["doc_id", "text", "source"],
            )
        ).count()

    timed("source_vocab_overlap", vocab_overlap_q)

    def changepoint_q() -> None:
        from agentic_doc_ray.functions.analytics import revenue_changepoint

        revenue_changepoint(SF_DIR).count()

    timed("revenue_changepoint", changepoint_q)

    def hard_negatives_q() -> None:
        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq

        from agentic_doc_ray.functions.similarity import hard_negatives

        t = _pq.read_table(
            f"{SF_DIR}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        qt = t.filter(pc.less(t["vec_id"], 5))
        hard_negatives(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet",
                columns=["vec_id", "embedding", "label"],
            ),
            np.array(qt["embedding"].to_pylist(), dtype=np.float64),
            [int(x) for x in qt["vec_id"].to_pylist()],
            [int(x) for x in qt["label"].to_pylist()],
        ).num_rows

    timed("hard_negatives", hard_negatives_q)

    def soft_dedup_q() -> None:
        from agentic_doc_ray.functions.dedup import soft_dedup_weights

        soft_dedup_weights(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("soft_dedup_weights", soft_dedup_q)

    def dup_hist_q() -> None:
        from agentic_doc_ray.functions.dedup import dup_cluster_histogram

        dup_cluster_histogram(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("dup_cluster_histogram", dup_hist_q)

    def pareto_q() -> None:
        from agentic_doc_ray.functions.analytics import pareto_front

        pareto_front(SF_DIR).count()

    timed("pareto_front", pareto_q)

    def mutual_knn_q() -> None:
        from agentic_doc_ray.functions.similarity import mutual_knn_pairs

        mutual_knn_pairs(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            k=5,
        ).count()

    timed("mutual_knn_pairs", mutual_knn_q)

    def upsample_q() -> None:
        from agentic_doc_ray.functions.sampling import upsample_sources

        upsample_sources(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
            ),
            {"src0": 2500, "src1": 1700, "src2": 900, "src3": 400},
        ).count()

    timed("upsample_sources", upsample_q)

    def cross_source_q() -> None:
        from agentic_doc_ray.functions.dedup import cross_source_duplicates

        cross_source_duplicates(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "source"]
            )
        ).count()

    timed("cross_source_duplicates", cross_source_q)

    def savings_q() -> None:
        from agentic_doc_ray.functions.dedup import dedup_savings_by_source

        dedup_savings_by_source(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet",
                columns=["doc_id", "text", "source", "n_chars"],
            )
        ).count()

    timed("dedup_savings_by_source", savings_q)

    def affinity_q() -> None:
        from agentic_doc_ray.functions.similarity import centroid_affinity

        centroid_affinity(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["embedding", "label"]
            )
        ).num_rows

    timed("centroid_affinity", affinity_q)

    def span_corruption_q() -> None:
        from agentic_doc_ray.functions.sampling import span_corruption

        span_corruption(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("span_corruption", span_corruption_q)

    def mixed_lang_q() -> None:
        from agentic_doc_ray.functions.text import mixed_lang_flags

        mixed_lang_flags(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("mixed_lang_flags", mixed_lang_q)

    def embedding_clusters_q() -> None:
        from agentic_doc_ray.functions.similarity import embedding_clusters

        embedding_clusters(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            k=5,
        ).count()

    timed("embedding_clusters", embedding_clusters_q)

    def dataset_card_q() -> None:
        from agentic_doc_ray.functions.profile import dataset_card

        dataset_card(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "source"]
            )
        ).count()

    timed("dataset_card", dataset_card_q)

    def latest_state_q() -> None:
        from agentic_doc_ray.functions.analytics import user_latest_state

        user_latest_state(SF_DIR).count()

    timed("user_latest_state", latest_state_q)

    def mixture_plan_q() -> None:
        from agentic_doc_ray.functions.sampling import mixture_plan

        mixture_plan(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["source", "text"]
            ),
            budget_tokens=200_000,
        ).num_rows

    timed("mixture_plan", mixture_plan_q)

    def assortativity_q() -> None:
        from agentic_doc_ray.functions.graph import degree_assortativity

        docs = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        degree_assortativity(docs, n_docs=docs.count()).num_rows

    timed("degree_assortativity", assortativity_q)

    def script_ratios_q() -> None:
        from agentic_doc_ray.functions.text import script_ratios

        script_ratios(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("script_ratios", script_ratios_q)

    def lang_pivot_q() -> None:
        from agentic_doc_ray.functions.text import lang_pivot

        lang_pivot(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["source", "lang"]
            )
        ).count()

    timed("lang_pivot", lang_pivot_q)

    def rollup_q() -> None:
        from agentic_doc_ray.functions.profile import rollup_counts

        rollup_counts(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["source", "lang", "text"]
            )
        ).num_rows

    timed("rollup_counts", rollup_q)

    def cluster_terms_q() -> None:
        from agentic_doc_ray.functions.similarity import kmeans
        from agentic_doc_ray.functions.text import cluster_top_terms

        labels = kmeans(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            k=8,
            n_iter=5,
        )
        cluster_top_terms(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            labels,
        ).num_rows

    timed("cluster_top_terms", cluster_terms_q)

    def seg_pr_q() -> None:
        from agentic_doc_ray.functions.scans import segment_percent_rank

        segment_percent_rank(SF_DIR).count()

    timed("segment_percent_rank", seg_pr_q)

    def graph_modularity_q() -> None:
        from agentic_doc_ray.functions.graph import (
            graph_modularity,
            label_propagation,
        )
        from agentic_doc_ray.functions.pagerank import link_edges

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        n = d.count()
        edges = d.map_batches(
            lambda b: link_edges(b.column("doc_id"), n), batch_format="pyarrow"
        )
        graph_modularity(d, n, label_propagation(edges, n_iter=4)).count()

    timed("graph_modularity", graph_modularity_q)

    def char_lang_id_q() -> None:
        from agentic_doc_ray.functions.text import char_ngram_lang_id

        char_ngram_lang_id(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"]
            )
        ).count()

    timed("char_lang_id", char_lang_id_q)

    def normalized_dedup_q() -> None:
        from agentic_doc_ray.functions.dedup import normalized_dedup_keep

        normalized_dedup_keep(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("normalized_dedup", normalized_dedup_q)

    def label_mrr_q() -> None:
        from agentic_doc_ray.functions.similarity import label_mrr

        label_mrr(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet",
                columns=["vec_id", "embedding", "label"],
            ),
            k=5,
        ).count()

    timed("label_mrr", label_mrr_q)

    def balanced_shards_q() -> None:
        from agentic_doc_ray.functions.sampling import balanced_shards

        balanced_shards(SF_DIR, k=8).count()

    timed("balanced_shards", balanced_shards_q)

    def trigram_backoff_q() -> None:
        from agentic_doc_ray.functions.text import trigram_backoff_score

        trigram_backoff_score(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            train_mod=2,
        ).count()

    timed("trigram_backoff", trigram_backoff_q)

    def full_join_q() -> None:
        from agentic_doc_ray.functions.join_api import hash_join

        hash_join(
            ray.data.read_parquet(
                f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"]
            ),
            ray.data.read_parquet(
                f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
            ),
            left_on="o_custkey",
            right_on="user_id",
            how="full",
        ).count()

    timed("generic_full_join", full_join_q)

    def group_quantiles_q() -> None:
        from agentic_doc_ray.functions.analytics import group_quantiles

        group_quantiles(SF_DIR).count()

    timed("group_quantiles", group_quantiles_q)

    def char_entropy_q() -> None:
        from agentic_doc_ray.functions.text import char_entropy

        char_entropy(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("char_entropy", char_entropy_q)

    def ks_drift_q() -> None:
        from agentic_doc_ray.functions.delta import ks_drift

        ks_drift(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet",
                columns=["doc_id", "text", "source"],
            )
        ).count()

    timed("ks_drift", ks_drift_q)

    def two_hop_q() -> None:
        from agentic_doc_ray.functions.graph import two_hop_reach

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        two_hop_reach(d, d.count()).count()

    timed("two_hop_reach", two_hop_q)

    def copurchase_triples_q() -> None:
        from agentic_doc_ray.functions.analytics import copurchase_triples

        copurchase_triples(SF_DIR, min_support=2).count()

    timed("copurchase_triples", copurchase_triples_q)

    def phrase_merge_q() -> None:
        from agentic_doc_ray.functions.text import phrase_merge

        phrase_merge(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("phrase_merge", phrase_merge_q)

    def conversion_lags_q() -> None:
        from agentic_doc_ray.functions.analytics import conversion_lags

        conversion_lags(SF_DIR).count()

    timed("conversion_lags", conversion_lags_q)

    def common_prefix_q() -> None:
        from agentic_doc_ray.functions.profile import source_common_prefix

        source_common_prefix(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["source", "text"]
            )
        ).count()

    timed("source_common_prefix", common_prefix_q)

    def rolling_users_q() -> None:
        from agentic_doc_ray.functions.analytics import rolling_active_users

        rolling_active_users(SF_DIR).count()

    timed("rolling_active_users", rolling_users_q)

    def new_users_q() -> None:
        from agentic_doc_ray.functions.analytics import daily_new_users

        daily_new_users(SF_DIR).count()

    timed("daily_new_users", new_users_q)

    def doc_ttr_q() -> None:
        from agentic_doc_ray.functions.text import doc_ttr

        doc_ttr(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("doc_ttr", doc_ttr_q)

    def burstiness_q() -> None:
        from agentic_doc_ray.functions.text import token_burstiness

        token_burstiness(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("token_burstiness", burstiness_q)

    def kind_transitions_q() -> None:
        from agentic_doc_ray.functions.interleave import kind_transitions
        from agentic_doc_ray.pipelines import extract_corpus, read_corpus
        from agentic_doc_ray.synth import corpus_path_for

        kind_transitions(
            extract_corpus(read_corpus(corpus_path_for(SF_DIR)))
        ).count()

    timed("kind_transitions", kind_transitions_q)

    def error_rate_q() -> None:
        from agentic_doc_ray.functions.interleave import error_rate_by_source
        from agentic_doc_ray.pipelines import extract_corpus, read_corpus
        from agentic_doc_ray.synth import corpus_path_for

        error_rate_by_source(
            extract_corpus(read_corpus(corpus_path_for(SF_DIR))), SF_DIR
        ).count()

    timed("error_rate_by_source", error_rate_q)

    def suffix_q() -> None:
        from agentic_doc_ray.functions.profile import source_common_suffix

        source_common_suffix(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["source", "text"]
            )
        ).count()

    timed("source_common_suffix", suffix_q)

    def class_sep_q() -> None:
        from agentic_doc_ray.functions.similarity import class_separability

        class_separability(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet",
                columns=["vec_id", "embedding", "label"],
            )
        ).num_rows

    timed("class_separability", class_sep_q)

    def langid_agreement_q() -> None:
        from agentic_doc_ray.functions.text import langid_agreement

        langid_agreement(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet",
                columns=["doc_id", "text", "lang"],
            )
        ).count()

    timed("langid_agreement", langid_agreement_q)

    def rfm_q() -> None:
        from agentic_doc_ray.functions.analytics import rfm_segments

        rfm_segments(SF_DIR).count()

    timed("rfm_segments", rfm_q)

    def simhash_pairs_q() -> None:
        from agentic_doc_ray.functions.dedup import (
            simhash_dup_pairs,
            simhash_plant_batch,
        )

        simhash_dup_pairs(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ).map_batches(simhash_plant_batch, batch_format="pyarrow")
        ).count()

    timed("simhash_dup_pairs", simhash_pairs_q)

    def packing_stats_q() -> None:
        from agentic_doc_ray.functions.sampling import packing_stats

        packing_stats(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("packing_stats", packing_stats_q)

    def lang_fertility_q() -> None:
        from agentic_doc_ray.functions.text import lang_fertility

        lang_fertility(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["lang", "text"]
            )
        ).count()

    timed("lang_fertility", lang_fertility_q)

    def order_audit_q() -> None:
        from agentic_doc_ray.functions.analytics import order_total_audit

        order_total_audit(SF_DIR).count()

    timed("order_total_audit", order_audit_q)

    def length_outliers_q() -> None:
        from agentic_doc_ray.functions.analytics import length_outliers_by_source

        length_outliers_by_source(SF_DIR).count()

    timed("length_outliers_by_source", length_outliers_q)

    def near_dup_matrix_q() -> None:
        from agentic_doc_ray.functions.dedup import near_dup_source_matrix

        near_dup_source_matrix(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet",
                columns=["doc_id", "text", "source"],
            )
        ).count()

    timed("near_dup_source_matrix", near_dup_matrix_q)

    def prefix_dedup_q() -> None:
        from agentic_doc_ray.functions.dedup import prefix_dedup_clusters

        prefix_dedup_clusters(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()

    timed("prefix_dedup_clusters", prefix_dedup_q)

    def extraction_yield_q() -> None:
        from agentic_doc_ray.functions.interleave import extraction_yield
        from agentic_doc_ray.pipelines import extract_corpus, read_corpus
        from agentic_doc_ray.synth import corpus_path_for

        c = read_corpus(corpus_path_for(SF_DIR))
        extraction_yield(extract_corpus(c), c).count()

    timed("extraction_yield", extraction_yield_q)

    def activity_conc_q() -> None:
        from agentic_doc_ray.functions.analytics import activity_concentration

        activity_concentration(SF_DIR).count()

    timed("activity_concentration", activity_conc_q)

    def cocitation_q() -> None:
        from agentic_doc_ray.functions.graph import cocitation_counts

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"]
        )
        cocitation_counts(d, d.count()).count()

    timed("cocitation_counts", cocitation_q)

    def quality_composite_q() -> None:
        from agentic_doc_ray.functions.text import quality_composite

        quality_composite(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            stopwords=("the", "a", "data", "value"),
        ).count()

    timed("quality_composite", quality_composite_q)

    def order_gap_q() -> None:
        from agentic_doc_ray.functions.analytics import order_gap_quantiles

        order_gap_quantiles(SF_DIR).count()

    timed("order_gap_quantiles", order_gap_q)

    def neg_sampling_q() -> None:
        from agentic_doc_ray.functions.text import neg_sampling_table

        neg_sampling_table(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            k=512,
        ).count()

    timed("neg_sampling_table", neg_sampling_q)

    def generic_join_q() -> None:
        from agentic_doc_ray.functions.join_api import hash_join

        hash_join(
            ray.data.read_parquet(
                f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"]
            ),
            ray.data.read_parquet(
                f"{SF_DIR}/customer.parquet",
                columns=["c_custkey", "c_name", "c_mktsegment"],
            ),
            left_on="o_custkey",
            right_on="c_custkey",
            how="inner",
            broadcast_threshold=0,  # force the exchange route (the scale path)
        ).count()

    timed("generic_join_bucketed", generic_join_q)

    def leakage_split_q() -> None:
        from agentic_doc_ray.functions.dedup import verified_dedup_pairs
        from agentic_doc_ray.functions.sampling import leakage_free_split

        pairs = verified_dedup_pairs(
            docs_str(), exact_threshold=0.8
        ).select_columns(["doc_a", "doc_b"])
        leakage_free_split(docs_str(), pairs, val_pct=10).count()

    timed("leakage_free_split", leakage_split_q)

    def bm25_q() -> None:
        from agentic_doc_ray.functions.retrieval import bm25_topk

        bm25_topk(
            docs(),
            {"q0": ["hash", "join"], "q1": ["window", "stream"], "q2": ["vector"]},
            k=10,
        ).count()

    timed("bm25_topk", bm25_q)

    def rrf_q() -> None:
        from agentic_doc_ray.functions.retrieval import rrf_fusion

        rrf_fusion(
            docs(),
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            {"q0": ["hash", "join"], "q1": ["window", "stream"], "q2": ["vector"]},
            {"q0": 0, "q1": 1, "q2": 2},
            k=10,
        )

    timed("rrf_fusion", rrf_q)
    timed(
        "dedup_keep",
        lambda: D.dedup_keep(
            docs(), shuffle_partitions=_pfor(n_doc_rows)
        ).count(),
    )

    def paragraph_dedup_q() -> None:
        from agentic_doc_ray.functions.paragraphs import paragraph_dedup

        paragraph_dedup(docs(), num_partitions=_pfor(8 * n_doc_rows)).count()

    timed("paragraph_dedup", paragraph_dedup_q)

    def sentence_dedup_q() -> None:
        from agentic_doc_ray.functions.paragraphs import sentence_dedup

        sentence_dedup(docs(), num_partitions=_pfor(10 * n_doc_rows)).count()

    timed("sentence_dedup", sentence_dedup_q)
    timed("repetition_stats", lambda: T.repetition_stats(docs()).count())
    timed("c4_quality_flags", lambda: T.c4_quality_flags(docs()).count())

    from agentic_doc_ray.functions import sampling as SA

    timed("pack_sequences", lambda: SA.pack_sequences(docs()).count())

    def kmeans_q() -> None:
        from agentic_doc_ray.functions.similarity import kmeans

        kmeans(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            k=8,
            n_iter=3,
        ).count()

    timed("kmeans", kmeans_q)
    timed("lineitem_q1", lambda: A.lineitem_pricing_summary(SF_DIR).count())
    timed(
        "pruned_revenue_scan", lambda: A.pruned_revenue_scan(SF_DIR).count()
    )
    timed("events_hourly", lambda: A.events_hourly(SF_DIR).count())
    timed("events_sliding", lambda: A.events_sliding(SF_DIR).count())
    timed("sessionize", lambda: A.sessionize(SF_DIR).count())
    timed("asof_join", lambda: A.purchase_prior_view(SF_DIR).count())

    from agentic_doc_ray.functions.joins import order_priority_revenue

    timed("hash_join", lambda: order_priority_revenue(SF_DIR).count())

    def similarity() -> None:
        import numpy as np
        import pyarrow.parquet as pq

        from agentic_doc_ray.functions.similarity import brute_force_topk

        t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
        qs = np.array(t["embedding"].to_pylist()[:8], dtype=np.float64)
        brute_force_topk(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            qs,
            list(range(8)),
            k=10,
        )

    timed("similarity_topk", similarity)

    def similarity_pq() -> None:
        import numpy as np
        import pyarrow.parquet as pq

        from agentic_doc_ray.functions.similarity import pq_topk

        t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
        qs = np.array(t["embedding"].to_pylist()[:8], dtype=np.float64)
        pq_topk(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            qs,
            list(range(8)),
            k=10,
        )

    timed("similarity_topk_pq", similarity_pq)

    def random_projection_q() -> None:
        from agentic_doc_ray.functions.similarity import random_projection

        random_projection(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            out_dim=16,
            seed=7,
        ).count()

    timed("random_projection", random_projection_q)

    def hamming_topk_q() -> None:
        from agentic_doc_ray.functions.similarity import hamming_topk

        hamming_topk(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            n_queries=8,
            k=10,
        )

    timed("hamming_topk", hamming_topk_q)

    def sq8_q() -> None:
        from agentic_doc_ray.functions.similarity import sq8_quantize

        sq8_quantize(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            )
        ).count()

    timed("sq8_codes", sq8_q)

    def sq8_topk_q() -> None:
        from agentic_doc_ray.functions.similarity import sq8_topk

        sq8_topk(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            n_queries=8,
            k=10,
        )

    timed("sq8_topk", sq8_topk_q)

    def fuzzy_contam_q() -> None:
        import pyarrow.parquet as _pq

        from agentic_doc_ray.functions.dedup import fuzzy_contamination

        bench_texts = [
            t
            for i, t in enumerate(
                _pq.read_table(
                    f"{SF_DIR}/documents.parquet", columns=["text"]
                ).column("text").to_pylist()
            )
            if i % 50 == 0
        ]
        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        fuzzy_contamination(d, bench_texts).count()

    timed("fuzzy_contamination", fuzzy_contam_q)
    timed("event_transitions", lambda: A.event_transitions(SF_DIR).count())

    def knn_join_q() -> None:
        from agentic_doc_ray.functions.similarity import knn_join

        knn_join(
            ray.data.read_parquet(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            k=5,
        ).count()

    timed("knn_join", knn_join_q)

    from agentic_doc_ray.functions import joins as J
    from agentic_doc_ray.functions import ranking as R
    from agentic_doc_ray.functions import scans as SC

    timed("late_events", lambda: SC.late_events(SF_DIR).count())
    timed("cumulative_spend", lambda: SC.user_cumulative_spend(SF_DIR).count())
    timed("topk_per_group", lambda: R.top_orders_per_segment(SF_DIR).count())
    timed(
        "heavy_hitters",
        lambda: R.heavy_hitter_tokens(docs(), per_mille=2).count(),
    )
    timed(
        "heavy_hitter_ngrams",
        lambda: R.heavy_hitter_ngrams(docs(), n=3, per_million=200).count(),
    )
    timed("anti_join", lambda: J.customers_without_urgent(SF_DIR).count())
    timed(
        "customer_order_dist",
        lambda: J.customer_order_distribution(SF_DIR).count(),
    )
    timed(
        "large_qty_orders",
        lambda: J.large_quantity_orders(SF_DIR).count(),
    )
    timed("four_table_join", lambda: J.nation_returned_revenue(SF_DIR).count())
    timed(
        "regional_supplier_volume",
        lambda: J.regional_supplier_volume(SF_DIR).count(),
    )
    timed(
        "large_volume_customer",
        lambda: J.large_volume_customer(SF_DIR).count(),
    )
    timed(
        "nation_trade_volume",
        lambda: J.nation_trade_volume(SF_DIR).count(),
    )
    timed(
        "order_priority_check",
        lambda: J.order_priority_check(SF_DIR).count(),
    )
    timed(
        "nation_market_share",
        lambda: J.nation_market_share(SF_DIR).count(),
    )
    timed(
        "top_supplier_revenue",
        lambda: J.top_revenue_supplier(SF_DIR).count(),
    )
    timed(
        "small_quantity_revenue",
        lambda: J.small_quantity_revenue(SF_DIR).count(),
    )
    timed(
        "brand_bracket_revenue",
        lambda: J.brand_bracket_revenue(SF_DIR).count(),
    )
    timed(
        "idle_rich_customers",
        lambda: J.idle_rich_customers(SF_DIR).count(),
    )
    timed(
        "waiting_supplier_check",
        lambda: J.waiting_supplier_check(SF_DIR).count(),
    )
    timed(
        "brand_supplier_counts",
        lambda: J.brand_supplier_counts(SF_DIR).count(),
    )
    timed(
        "min_cost_supplier",
        lambda: J.min_cost_supplier(SF_DIR).count(),
    )
    timed(
        "important_part_values",
        lambda: J.important_part_values(SF_DIR).count(),
    )
    timed(
        "excess_stock_suppliers",
        lambda: J.excess_stock_suppliers(SF_DIR).count(),
    )
    timed("funnel", lambda: A.funnel_counts(SF_DIR).count())
    timed("cohort_retention", lambda: A.cohort_retention(SF_DIR).count())
    timed("event_paths", lambda: A.user_event_paths(SF_DIR).count())
    timed("rollup", lambda: A.order_priority_status_rollup(SF_DIR).count())
    timed("pivot", lambda: A.user_event_pivot(SF_DIR).count())
    timed("histogram", lambda: A.event_value_histogram(SF_DIR).count())

    def index_q() -> None:
        from agentic_doc_ray.functions.index import build_inverted_index

        build_inverted_index(docs(), num_partitions=_pfor(50 * n_doc_rows)).count()

    timed("inverted_index", index_q)
    timed("bloom_semi_join", lambda: J.urgent_revenue_bloom(SF_DIR).count())
    timed("interval_join", lambda: A.purchase_sessions(SF_DIR).count())
    timed("global_rank", lambda: SC.global_rank(SF_DIR).count())
    timed("shuffle_positions", lambda: SC.shuffle_positions(SF_DIR).count())
    timed("on_time_hourly", lambda: SC.on_time_hourly(SF_DIR).count())

    def substr_q() -> None:
        from agentic_doc_ray.functions.substr import repeated_substring_spans

        repeated_substring_spans(
            docs(), num_partitions=_pfor(100 * n_doc_rows)
        ).count()

    timed("substr_spans", substr_q)

    def winnow_q() -> None:
        from agentic_doc_ray.functions.substr import winnow_fingerprints

        winnow_fingerprints(docs(), L=8, window=8).count()

    timed("winnow_fingerprints", winnow_q)

    def substr_count_q() -> None:
        from agentic_doc_ray.functions.substr import substring_counts

        substring_counts(docs(), ["data", "order scan", "join", "a"]).count()

    timed("substring_counts", substr_count_q)

    def keep_best_q() -> None:
        import pyarrow as pa

        from agentic_doc_ray.functions.graph import near_dedup_keep_best

        scored = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        pairs = D.verified_dedup_pairs(
            docs().map_batches(
                lambda b: b.set_column(
                    b.schema.get_field_index("doc_id"),
                    "doc_id",
                    b["doc_id"].cast(pa.string()),
                ),
                batch_format="pyarrow",
            ),
            exact_threshold=0.8,
        ).select_columns(["doc_a", "doc_b"])
        near_dedup_keep_best(scored, pairs).count()

    timed("near_dedup_keep_best", keep_best_q)

    def novelty_q() -> None:
        from agentic_doc_ray.functions.substr import ngram_novelty

        ngram_novelty(docs()).count()

    timed("ngram_novelty", novelty_q)

    def source_div_q() -> None:
        from agentic_doc_ray.functions.substr import source_diversity

        source_diversity(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet",
                columns=["doc_id", "text", "source"],
            )
        ).count()

    timed("source_diversity", source_div_q)

    def dedup_lines_q() -> None:
        from agentic_doc_ray.functions.text import dedup_lines

        dedup_lines(docs()).count()

    timed("dedup_lines", dedup_lines_q)

    def temp_mix_q() -> None:
        from agentic_doc_ray.functions.sampling import temperature_mixture_sample

        src = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
        )
        temperature_mixture_sample(src).count()

    timed("temperature_mixture", temp_mix_q)
    timed("shipping_priority", lambda: J.shipping_priority(SF_DIR).count())

    def scorecard_q() -> None:
        from agentic_doc_ray.functions.curation import domain_scorecard

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "source", "text"]
        )
        domain_scorecard(d).count()

    timed("domain_scorecard", scorecard_q)

    def substr_strip_q() -> None:
        from agentic_doc_ray.functions.substr import strip_repeated_substrings

        strip_repeated_substrings(
            docs(), num_partitions=_pfor(100 * n_doc_rows)
        ).count()

    timed("substr_strip", substr_strip_q)

    def incr_curation_q() -> None:
        from agentic_doc_ray.functions.curation import incremental_curation_keep
        from agentic_doc_ray.functions.delta import synth_second_crawl

        d = docs()
        incremental_curation_keep(
            d,
            synth_second_crawl(d),
            stopwords=("the", "a", "data", "value"),
            n_rows_hint=n_doc_rows,
        ).count()

    timed("incremental_curation", incr_curation_q)
    timed("late_shipment_priority", lambda: J.late_shipment_priority(SF_DIR).count())
    timed("promo_revenue_share", lambda: J.promo_revenue_share(SF_DIR).count())

    def budget_q() -> None:
        from agentic_doc_ray.functions.scans import token_budget_select

        token_budget_select(SF_DIR, budget_tokens=120_000).count()

    timed("token_budget_select", budget_q)

    def curation_q() -> None:
        from agentic_doc_ray.functions.curation import curation_keep

        d = docs()
        curation_keep(
            d, stopwords=("the", "a", "data", "value"), n_rows_hint=d.count()
        ).count()

    timed("curation_keep", curation_q)

    def source_cap_q() -> None:
        from agentic_doc_ray.functions.scans import source_capped_select

        source_capped_select(SF_DIR, cap_tokens=8_000).count()

    timed("source_capped_select", source_cap_q)

    def shard_manifest_q() -> None:
        from agentic_doc_ray.functions.scans import shard_manifest

        shard_manifest(SF_DIR, shard_size=64).count()

    timed("shard_manifest", shard_manifest_q)

    def curation_dag_q() -> None:
        from agentic_doc_ray.functions.curation import curation_pipeline

        d = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet",
            columns=["doc_id", "text", "source", "n_chars"],
        )
        curation_pipeline(
            d,
            stopwords=("the", "a", "data", "value"),
            cap_tokens=8_000,
            shard_size=64,
            n_rows_hint=d.count(),
        ).count()

    timed("curation_pipeline", curation_dag_q)

    # session-10 additions (the exchange-latency-bound hits/graph_walks
    # stay out of the suite for the same reason as scc — see OPERATORS.md)
    def pca_q() -> None:
        from agentic_doc_ray.functions.similarity import pca_project

        pca_project(SF_DIR).count()

    timed("pca_project", pca_q)

    def fuzzy_q() -> None:
        from agentic_doc_ray.functions.fuzzyjoin import fuzzy_pairs

        fuzzy_pairs(
            ray.data.read_parquet(
                f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_name"]
            ),
            "c_custkey",
            "c_name",
        ).count()

    timed("fuzzy_name_pairs", fuzzy_q)
    timed("event_outliers", lambda: A.event_outliers(SF_DIR).count())
    timed("revenue_trend", lambda: A.revenue_trend(SF_DIR).count())

    # end-of-suite probe: the SAME zero-exchange query as the early
    # "interleave_stats" entry. The ratio probe_late/interleave_stats is
    # the session-AGING factor (Ray 2.49 cold-spawns aggregator/actor
    # state per execution and slows as the session accumulates them) —
    # it lets a reader separate operator cost from harness aging when
    # comparing late-suite entries against standalone runs (BASELINE.md).
    timed("probe_late", interleave_q)

    headline_sec = timings["extract"]
    out = {
        "metric": "extract_sf_corpus",
        "value": headline_sec,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / headline_sec, 1),
    }
    ray.shutdown()
    # VERDICT r04 #6: the external record (BENCH_rNN.json) must carry the
    # >=0.8 scaling evidence itself, not via BASELINE.md prose. A pared
    # protocol (2 fused + 1 skew trial pairs, min per level) runs in
    # fresh subprocesses AFTER the suite session shuts down; skip with
    # GRAFT_BENCH_NO_SCALING=1 when iterating locally or via --only.
    if not os.environ.get("GRAFT_BENCH_NO_SCALING") and not only:
        out["scaling"] = _scaling_result(n_fused=2, n_skew=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
