"""Dataset splitting / sampling / sequence packing for training pipelines.

All three are deterministic functions of the data (never of block layout or
a RNG stream), so distributed output is reproducible and oracle-checkable:

  - ``train_val_split`` / ``stratified_sample`` key on
    ``int(md5(doc_id)[:4], 16) % 100`` — a content-stable percentile that
    DuckDB reproduces exactly (the classic "salt and hash, don't sample
    randomly" pattern: resumable, and a rerun sees the same split);
  - ``pack_sequences`` greedy-packs documents into fixed token budgets
    WITHIN doc_id-hash buckets (sorted by doc_id inside each bucket), so
    the packing is independent of batch/block boundaries — the at-scale
    shape (global greedy packing is inherently serial; per-bucket packing
    is the standard practice and shuffles one small row per doc).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from agentic_doc_ray.functions._digest import md5_per_mille
from agentic_doc_ray.functions.text import _token_count


def _pct(doc_ids) -> np.ndarray:
    """Stable percentile 0..99 per doc_id (md5-based; SQL-reproducible;
    vectorized single-block MD5 — see ``_digest``)."""
    from agentic_doc_ray.functions._digest import md5_per_cent

    return md5_per_cent(doc_ids)


def train_val_split(
    docs: "ray.data.Dataset", val_pct: int = 10
) -> "ray.data.Dataset":
    """Tag each doc 'train' / 'val' by its stable hash percentile."""

    def tag(batch: pa.Table) -> pa.Table:
        pct = _pct(batch.column("doc_id"))
        split = np.where(pct < val_pct, "val", "train")
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(split, pa.string())],
            names=["doc_id", "split"],
        )

    return docs.map_batches(tag, batch_format="pyarrow")


def stratified_sample(
    docs: "ray.data.Dataset", by: str, pct: int = 20
) -> "ray.data.Dataset":
    """Keep ~pct% of each stratum (deterministic hash sample; exact at the
    row level so distributed output == the SQL predicate)."""

    def keep(batch: pa.Table) -> pa.Table:
        p = _pct(batch.column("doc_id"))
        return batch.filter(pa.array(p < pct)).select(["doc_id", by])

    return docs.map_batches(keep, batch_format="pyarrow")


_N_PACK_BUCKETS = 64


def pack_sequences(
    docs: "ray.data.Dataset", token_budget: int = 1024
) -> "ray.data.Dataset":
    """Greedy-pack documents into sequences of <= token_budget tokens.

    Output: one row per doc — (pack_id, doc_id, position, n_tokens).
    Docs longer than the budget get their own pack (never split).
    Packing runs per crc32(doc_id)%64 bucket over doc_id-sorted members,
    so the result is independent of block layout; only (bucket, doc_id,
    n_tokens) rows move through the exchange, never text.
    """
    from agentic_doc_ray.context import shuffle_partitions

    def keyed(batch: pa.Table) -> pa.Table:
        ids = [str(x) for x in batch.column("doc_id").to_pylist()]
        bucket = pa.array(
            [zlib.crc32(d.encode()) % _N_PACK_BUCKETS for d in ids], pa.int32()
        )
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.string()),
                _token_count(batch.column("text")),
                bucket,
            ],
            names=["doc_id", "n_tokens", "bucket"],
        )

    def pack_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("doc_id"))
        ids = pc.take(group.column("doc_id"), order).to_pylist()
        toks = pc.take(group.column("n_tokens"), order).to_numpy(
            zero_copy_only=False
        )
        bucket = int(group.column("bucket")[0].as_py())
        pack_ids, positions = [], []
        seq = 0
        used = 0
        pos = 0
        for t in toks:
            # sequential by nature: one compare + add per doc
            if pos > 0 and used + t > token_budget:
                seq += 1
                used = 0
                pos = 0
            pack_ids.append(f"{bucket}-{seq}")
            positions.append(pos)
            used += int(t)
            pos += 1
        return pa.Table.from_pydict(
            {
                "pack_id": pack_ids,
                "doc_id": ids,
                "position": np.array(positions, dtype=np.int64),
                "n_tokens": toks.astype(np.int64),
            },
            schema=pa.schema(
                [
                    ("pack_id", pa.string()),
                    ("doc_id", pa.string()),
                    ("position", pa.int64()),
                    ("n_tokens", pa.int64()),
                ]
            ),
        )

    np_ = shuffle_partitions()
    return (
        docs.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket", num_partitions=np_)
        .map_groups(pack_bucket, batch_format="pyarrow")
    )


def pack_sequences_oracle(
    doc_ids: list[str], texts: list[str], token_budget: int = 1024
) -> pa.Table:
    """Single-process replica of pack_sequences (materialized oracle)."""
    t = pa.Table.from_pydict(
        {"doc_id": [str(d) for d in doc_ids], "text": texts}
    )
    ids = t.column("doc_id").to_pylist()
    toks = _token_count(t.column("text")).to_numpy(zero_copy_only=False)
    by_bucket: dict[int, list[tuple[str, int]]] = {}
    for d, n in zip(ids, toks):
        by_bucket.setdefault(zlib.crc32(d.encode()) % _N_PACK_BUCKETS, []).append(
            (d, int(n))
        )
    rows = []
    for bucket in sorted(by_bucket):
        members = sorted(by_bucket[bucket])
        seq = used = pos = 0
        for d, n in members:
            if pos > 0 and used + n > token_budget:
                seq += 1
                used = 0
                pos = 0
            rows.append(
                {
                    "pack_id": f"{bucket}-{seq}",
                    "doc_id": d,
                    "position": pos,
                    "n_tokens": n,
                }
            )
            used += n
            pos += 1
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("pack_id", pa.string()),
                ("doc_id", pa.string()),
                ("position", pa.int64()),
                ("n_tokens", pa.int64()),
            ]
        ),
    )


def sample_k_per_group(
    docs: "ray.data.Dataset", by: str = "lang", k: int = 10
) -> "ray.data.Dataset":
    """EXACTLY k uniform samples per group via bottom-k-by-hash: keep the
    k rows with the smallest (md5(doc_id), doc_id) per group — the
    deterministic, mergeable alternative to reservoir sampling (a hash of
    the row id is a uniform draw, and bottom-k of a uniform draw is a
    uniform fixed-size sample; Broder's min-wise sampling argument).

    Per-batch partial bottom-k bounds the exchange at groups x k rows per
    batch; the per-group final sees only those partials. Reruns and
    re-partitions reproduce the identical sample — resumable by
    construction, SQL-reproducible (row_number over md5).
    """
    from agentic_doc_ray.context import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        from agentic_doc_ray.functions._digest import md5_hex_vec

        ids = pc.cast(batch.column("doc_id"), pa.string())
        df = pd.DataFrame(
            {
                "g": batch.column(by).to_pandas(),
                # full-hexdigest batch MD5, byte-equal to hashlib — the
                # sort key the SQL oracle reproduces with DuckDB md5()
                "h": md5_hex_vec(ids),
                "doc_id": ids.to_pandas(),
            }
        )
        df = df.sort_values(["g", "h", "doc_id"])
        return pa.Table.from_pandas(
            df.groupby("g", sort=False).head(k), preserve_index=False
        )

    def final(group):
        g = group.sort_values(["h", "doc_id"]).head(k).reset_index(drop=True)
        g["sample_rank"] = g.index + 1
        return g[["g", "doc_id", "sample_rank"]].rename(columns={"g": by})

    # partial emits >=1 row per non-empty input batch, so the exchange's
    # first block is never empty (the empty-first-block guard is not
    # needed here — same justification as top_orders_per_segment)
    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("g", num_partitions=shuffle_partitions(4))
        .map_groups(final, batch_format="pandas")
    )


def mixture_sample(
    docs: "ray.data.Dataset",
    weights: dict[str, int],
    default_per_mille: int = 0,
) -> "ray.data.Dataset":
    """Dataset mixing: keep ~weights[source]/1000 of each source's docs.

    The standard pretraining-mixture knob (upsample wiki, downsample raw
    web) as a DETERMINISTIC hash-rate filter: a doc survives iff its
    stable md5 per-mille < its source's weight. No shuffle, no RNG state
    — embarrassingly parallel, rerun-stable on any partitioning, and the
    SQL predicate reproduces it row-for-row. The source->threshold probe
    is one vectorized hashtable ``map`` per batch.
    """
    import pandas as pd

    wseries = pd.Series(weights, dtype=np.int64)

    def keep(batch: pa.Table) -> pa.Table:
        pm = md5_per_mille(batch.column("doc_id"))
        thr = (
            pd.Series(batch.column("source").to_numpy(zero_copy_only=False))
            .map(wseries)
            .fillna(default_per_mille)
            .to_numpy(dtype=np.int64)
        )
        return batch.filter(pa.array(pm < thr)).select(["doc_id", "source"])

    return docs.map_batches(keep, batch_format="pyarrow")

def temperature_mixture_sample(
    docs: "ray.data.Dataset", tau: float = 0.5
) -> "ray.data.Dataset":
    """Temperature-scaled mixture sampling (the multilingual/pretraining
    rebalance of Lample & Conneau 2019 §3.1 / XLM-R: sample source s with
    probability ∝ n_s^tau). Rewritten as a deterministic per-doc
    acceptance rate so no RNG state exists: a doc of source s survives iff
    its stable md5 per-mille < floor(1000 * (min_n / n_s)^(1-tau)) — the
    smallest source keeps everything, bigger sources are flattened toward
    it. Only tau=0.5 is offered because (x)^0.5 is IEEE-754 sqrt, the one
    power that is CORRECTLY ROUNDED on every platform — numpy here and
    DuckDB in the oracle produce the identical double, so the floor'd
    per-mille threshold (and therefore the kept set) is bit-reproducible.

    Shape: per-batch partial source counts -> one tiny exchange keyed by
    source -> the per-source table is collected (bounded by DOMAIN
    cardinality, not rows) and broadcast once -> vectorized hash-gate
    filter. Documents themselves never shuffle.
    """
    if tau != 0.5:
        raise NotImplementedError(
            "only tau=0.5 (IEEE-sqrt, bit-reproducible) is supported"
        )
    import pandas as pd
    import ray as _ray

    from agentic_doc_ray.context import shuffle_partitions
    from ray.data.aggregate import Sum

    def src_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["source"]).group_by("source").aggregate(
            [("source", "count")]
        )
        return g.rename_columns(["source", "n"])

    per_src = (
        docs.map_batches(src_partial, batch_format="pyarrow")
        .groupby("source", num_partitions=shuffle_partitions(4))
        .aggregate(Sum("n", alias_name="n"))
    )
    blocks = [
        b for b in _ray.get(per_src.materialize().to_arrow_refs()) if b.num_rows
    ]  # materialize: lazy to_arrow_refs re-executes the plan for schema
    if not blocks:
        return docs.map_batches(
            lambda b: b.select(["doc_id", "source"]), batch_format="pyarrow"
        )
    src_t = pa.concat_tables(blocks).combine_chunks()
    n = src_t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    min_n = float(n.min())
    pm = np.floor(1000.0 * np.sqrt(min_n / n)).astype(np.int64)
    rates = pd.Series(
        pm, index=src_t.column("source").to_numpy(zero_copy_only=False)
    )
    ref = _ray.put(rates)

    def keep(batch: pa.Table, *, _ref=ref) -> pa.Table:
        cache = keep.__dict__
        if "r" not in cache:
            cache["r"] = _ray.get(_ref)
        h = md5_per_mille(batch.column("doc_id"))
        thr = (
            pd.Series(batch.column("source").to_numpy(zero_copy_only=False))
            .map(cache["r"])
            .fillna(0)
            .to_numpy(dtype=np.int64)
        )
        return batch.filter(pa.array(h < thr)).select(["doc_id", "source"])

    return docs.map_batches(keep, batch_format="pyarrow")


def leakage_free_split(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    val_pct: int = 10,
) -> "ray.data.Dataset":
    """Near-duplicate-AWARE train/val split: the stable md5 percentile
    gate is applied to each document's duplicate-COMPONENT id (canonical
    min member via connected components over the verified pairs), so
    near-duplicate documents can never straddle the split — the standard
    defense against train/eval leakage that a plain per-doc hash split
    does not give you. Unpaired documents are their own singleton
    component and split exactly like ``train_val_split``.

    Shape: CC over the pair-bounded graph (2 exchanges/round), then the
    (doc -> component) table joins back onto the corpus ids through the
    generic ``hash_join`` (auto-broadcast when the dup set is small, one
    bucketed exchange otherwise); the gate itself is batch-local.
    Output: (doc_id, component, split).
    """
    from agentic_doc_ray.functions.graph import connected_components
    from agentic_doc_ray.functions.join_api import hash_join

    comp = connected_components(pairs)

    ids = docs.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )
    joined = hash_join(
        ids, comp, left_on="doc_id", right_on="doc_id", how="left"
    )

    def gate(batch: pa.Table) -> pa.Table:
        doc_ids = [str(d) for d in batch.column("doc_id").to_pylist()]
        comps = [
            str(c) if c is not None else doc_ids[i]
            for i, c in enumerate(batch.column("component").to_pylist())
        ]
        pct = _pct(comps)
        split = np.where(pct < val_pct, "val", "train")
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                pa.array(comps, pa.string()),
                pa.array(split, pa.string()),
            ],
            names=["doc_id", "component", "split"],
        )

    return joined.map_batches(gate, batch_format="pyarrow")


def fim_transform(
    docs: "ray.data.Dataset", transform_pct: int = 50
) -> "ray.data.Dataset":
    """Fill-in-the-middle transform (Bavarian et al. 2022) for code/text
    pretraining: a deterministic md5 percentile gate picks
    ``transform_pct`` of documents; each picked doc is split at two
    md5-derived character offsets and re-emitted in PSM order —
    ``<PRE>prefix<SUF>suffix<MID>middle`` — so the model learns infilling;
    the rest pass through unchanged (mode 'orig').

    Deterministic function of content alone (no RNG stream): the gate is
    the repo-standard ``int(md5(doc_id)[:4], 16) % 100`` percentile and
    the two cuts come from the NEXT two md5 nibbles groups mod (len+1) —
    a rerun, a resume, or a different block layout reproduces byte-equal
    output, and DuckDB's md5/substring land on the same strings (both
    sides slice by code points). Batch-local, zero exchanges.
    """

    def transform(batch: pa.Table) -> pa.Table:
        ids = [str(d) for d in batch.column("doc_id").to_pylist()]
        texts = batch.column("text").to_pylist()
        out_mode, out_text = [], []
        for d, t in zip(ids, texts):
            h = hashlib.md5(d.encode()).hexdigest()
            if int(h[:4], 16) % 100 < transform_pct:
                L = len(t)
                c1 = int(h[4:8], 16) % (L + 1)
                c2 = int(h[8:12], 16) % (L + 1)
                lo, hi = min(c1, c2), max(c1, c2)
                out_mode.append("psm")
                out_text.append(
                    "<PRE>" + t[:lo] + "<SUF>" + t[hi:] + "<MID>" + t[lo:hi]
                )
            else:
                out_mode.append("orig")
                out_text.append(t)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.string()),
                "mode": pa.array(out_mode, pa.string()),
                "fim_text": pa.array(out_text, pa.string()),
            }
        )

    return docs.map_batches(transform, batch_format="pyarrow")


def upsample_sources(
    docs: "ray.data.Dataset",
    factors_permille: dict[str, int],
    default_permille: int = 1000,
) -> "ray.data.Dataset":
    """Deterministic per-source UP/DOWN-sampling with epoch indices — the
    multilingual/low-resource mixture rebalance where a source with factor
    2500 contributes each doc 2.5x (2 full copies + a stable-hash 50%
    chance of a third; factor 400 keeps 40% of docs once). Output
    (doc_id, source, epoch) with epoch 0..n_copies-1 — downstream packing
    can salt sequence order by epoch so repeated copies don't collide.

    Zero exchanges, no RNG state: n_copies = f//1000 plus one more iff the
    doc's stable md5 per-mille < f%1000 (the same gate as
    ``mixture_sample``, SQL-reproducible). The repeat is a vectorized
    ``take``; rows never leave their batch."""

    def expand(batch: pa.Table) -> pa.Table:
        import pandas as pd

        h = md5_per_mille(batch.column("doc_id"))
        f = (
            pd.Series(batch.column("source").to_pylist())
            .map(factors_permille)
            .fillna(default_permille)
            .to_numpy(dtype=np.int64)
        )
        n_copies = f // 1000 + (h < f % 1000)
        idx = np.repeat(np.arange(len(h), dtype=np.int64), n_copies)
        starts = np.concatenate(([0], np.cumsum(n_copies)))[:-1]
        epoch = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, n_copies)
        out = batch.select(["doc_id", "source"]).take(pa.array(idx))
        return out.append_column("epoch", pa.array(epoch, pa.int64()))

    return docs.map_batches(expand, batch_format="pyarrow")




def _splitmix64_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 — a deterministic hash
    stream (no RNG state), same constants as the exchange sentinel mixer."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x2545F4914F6CDD1D)
    return z ^ (z >> np.uint64(31))


def span_corruption_batch(
    batch: pa.Table, density_permille: int = 150, span_len: int = 3
) -> pa.Table:
    """T5-style span corruption of one batch (the pure per-doc kernel —
    shared by the distributed wrapper and the single-process replica
    oracle, which must be byte-equal).

    Whitespace tokens are grouped into aligned ``span_len`` spans; a span
    is masked iff splitmix64(md5(doc_id) ^ span_idx) per-mille <
    ``density_permille`` (expected noise = density/1000, mean masked-run
    length >= span_len). Consecutive masked tokens collapse into ONE
    ``<extra_id_k>`` sentinel (k = run order); the target is the inverse
    sequence ``<extra_id_0> dropped... <extra_id_1> ...`` — the
    (inputs, targets) pair of Raffel et al. 2020 §3.1.4."""
    ids = [str(d) for d in batch.column("doc_id").to_pylist()]
    texts = batch.column("text").to_pylist()
    out_in, out_tgt, out_n = [], [], []
    for d, t in zip(ids, texts):
        toks = (t or "").split()
        n = len(toks)
        if n == 0:
            out_in.append("")
            out_tgt.append("")
            out_n.append(0)
            continue
        seed = np.uint64(int(hashlib.md5(d.encode()).hexdigest()[:16], 16))
        n_spans = -(-n // span_len)
        h = _splitmix64_vec(np.arange(n_spans, dtype=np.uint64) ^ seed)
        masked_span = (h % np.uint64(1000)) < np.uint64(density_permille)
        masked = masked_span[np.arange(n) // span_len]
        run_start = masked & np.concatenate(([True], ~masked[:-1]))
        k_of = np.cumsum(run_start) - 1  # sentinel index per position
        inp, tgt = [], []
        for i, tok in enumerate(toks):
            if masked[i]:
                if run_start[i]:
                    s = f"<extra_id_{int(k_of[i])}>"
                    inp.append(s)
                    tgt.append(s)
                tgt.append(tok)
            else:
                inp.append(tok)
        out_in.append(" ".join(inp))
        out_tgt.append(" ".join(tgt))
        out_n.append(int(masked.sum()))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.string()),
            "input_text": pa.array(out_in, pa.string()),
            "target_text": pa.array(out_tgt, pa.string()),
            "n_masked_tokens": pa.array(out_n, pa.int64()),
        }
    )


def span_corruption(
    docs: "ray.data.Dataset",
    density_permille: int = 150,
    span_len: int = 3,
) -> "ray.data.Dataset":
    """Distributed T5 span-corruption transform (see
    ``span_corruption_batch``): per-doc deterministic, batch-local, zero
    exchanges — rerun/resume/block layout all byte-equal."""

    def transform(batch: pa.Table) -> pa.Table:
        return span_corruption_batch(batch, density_permille, span_len)

    return docs.map_batches(transform, batch_format="pyarrow")


def mixture_plan(
    docs: "ray.data.Dataset", budget_tokens: int
) -> pa.Table:
    """Pretraining-mixture PLANNING: integer waterfilling of a total token
    budget across sources — each source contributes min(its available
    tokens, the waterline), the waterline chosen by the classic ascending
    sweep: sources sorted by availability (name tie-break), each takes
    ``min(avail, remaining // remaining_sources)``. Small sources are
    fully taken, large ones are capped equally — the max-min fair
    allocation every mixture designer starts from. Output (source,
    avail_tokens, alloc_tokens); integer remainders stay unallocated
    (documented, deterministic).

    Scale shape: per-batch (source, token-sum) partials through one tiny
    source-keyed ``groupby().aggregate()``; the sweep runs on the
    collected per-source table — bounded by SOURCE CARDINALITY, never by
    rows (the nation-broadcast precedent)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions
    from agentic_doc_ray.functions.text import _token_count

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("source"), _token_count(batch.column("text"))],
            names=["source", "n"],
        )
        return (
            t.group_by("source").aggregate([("n", "sum")]).rename_columns(
                ["source", "n"]
            )
        )

    per_src = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source", num_partitions=shuffle_partitions(4))
        .aggregate(Sum("n", alias_name="n"))
    )
    blocks = [
        b for b in _ray.get(per_src.materialize().to_arrow_refs()) if b.num_rows
    ]
    if not blocks:
        return pa.Table.from_pydict(
            {
                "source": pa.array([], pa.string()),
                "avail_tokens": pa.array([], pa.int64()),
                "alloc_tokens": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(blocks).combine_chunks()
    rows = sorted(
        zip(t.column("source").to_pylist(), t.column("n").to_pylist()),
        key=lambda r: (r[1], r[0]),
    )
    remaining = int(budget_tokens)
    alloc: dict[str, int] = {}
    for i, (src, avail) in enumerate(rows):
        share = remaining // (len(rows) - i)
        take = min(int(avail), share)
        alloc[src] = take
        remaining -= take
    out = sorted((src, int(avail), alloc[src]) for src, avail in rows)
    return pa.Table.from_pydict(
        {
            "source": pa.array([r[0] for r in out], pa.string()),
            "avail_tokens": pa.array([r[1] for r in out], pa.int64()),
            "alloc_tokens": pa.array([r[2] for r in out], pa.int64()),
        }
    )


def balanced_shards(sf_dir: str, k: int = 8) -> "ray.data.Dataset":
    """Size-balanced shard assignment (the LPT-flavored export layout):
    documents in (n_chars DESC, doc_id DESC) order are dealt onto ``k``
    shards in SNAKE (boustrophedon) order — round r goes left-to-right
    when r is even, right-to-left when odd — so consecutive size ranks
    never pile on one shard and per-shard byte totals stay within one
    document of each other for near-uniform sizes.

    Rank comes from ``scans.global_rank`` (value-range partition + driver
    prefix sums — no global sort, one exchange); the snake formula is a
    pure function of the rank, so assignment is deterministic and
    batch-independent. Output: (doc_id, n_chars, shard) per document.
    """
    from agentic_doc_ray.functions.scans import global_rank

    ranked = global_rank(sf_dir)
    n = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()

    def assign(batch: pa.Table) -> pa.Table:
        asc = batch.column("global_rank").to_numpy(zero_copy_only=False)
        r0 = (n - asc).astype(np.int64)  # 0-based DESC rank (ties: id desc)
        rnd, idx = r0 // k, r0 % k
        shard = np.where(rnd % 2 == 0, idx, k - 1 - idx)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("n_chars"),
                pa.array(shard.astype(np.int64)),
            ],
            names=["doc_id", "n_chars", "shard"],
        )

    return ranked.map_batches(assign, batch_format="pyarrow")


def packing_stats(
    docs: "ray.data.Dataset", token_budget: int = 1024
) -> "ray.data.Dataset":
    """Sequence-packing efficiency audit over ``pack_sequences``: per
    pack, member count, used tokens and waste = max(0, budget − used)
    (over-budget single-doc packs waste 0 — they were never splittable).
    The fill-rate distribution is the signal that tunes the budget.
    Per-batch pack partials -> one tiny pack-keyed aggregate."""
    from ray.data.aggregate import Sum

    from agentic_doc_ray.context import shuffle_partitions

    packed = pack_sequences(docs, token_budget=token_budget)

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["pack_id", "n_tokens"])
            .group_by("pack_id")
            .aggregate([("n_tokens", "sum"), ("n_tokens", "count")])
        )
        return g.rename_columns(["pack_id", "used_tokens", "n_docs"])

    agg = (
        packed.map_batches(partial, batch_format="pyarrow")
        .groupby("pack_id", num_partitions=shuffle_partitions(8))
        .aggregate(
            Sum("used_tokens", alias_name="used_tokens"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        used = batch.column("used_tokens").combine_chunks().cast(pa.int64())
        waste = pc.max_element_wise(
            pc.subtract(pa.scalar(token_budget, pa.int64()), used),
            pa.scalar(0, pa.int64()),
        )
        return pa.Table.from_arrays(
            [
                batch.column("pack_id").combine_chunks(),
                batch.column("n_docs").combine_chunks().cast(pa.int64()),
                used,
                waste,
            ],
            names=["pack_id", "n_docs", "used_tokens", "waste"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")
