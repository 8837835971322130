"""Text-format source/sink roundtrips (JSONL, CSV).

The reference ingests local files through connector listings
(reference connectors.py:47-120); this module covers the tabular text
formats a data-engineering user reaches for beyond Parquet. Each
roundtrip is: Dataset -> partitioned sink under /tmp -> fresh Dataset
from the written files -> stats — oracled against the ORIGINAL parquet
table, so the check pins that the sink+source pair is lossless.

Scale shape: sinks write one file per block (resumable, never one giant
file); reads stream per file. The stats pass is batch-local; the only
driver-side data is the output path string.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_COLS = ["doc_id", "text", "lang", "source"]


def _stats_batch(batch: pa.Table) -> pa.Table:
    return pa.Table.from_arrays(
        [
            batch.column("doc_id").cast(pa.int64()),
            batch.column("lang").cast(pa.string()),
            batch.column("source").cast(pa.string()),
            pc.utf8_length(batch.column("text")).cast(pa.int64()),
        ],
        names=["doc_id", "lang", "source", "n_chars"],
    )


def _roundtrip(sf_dir: str, fmt: str) -> "ray.data.Dataset":
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/agentic_textio/{tag}/{fmt}"
    shutil.rmtree(out, ignore_errors=True)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=_COLS
    )
    if fmt == "jsonl":
        docs.write_json(out)
        back = ray.data.read_json(out)
    elif fmt == "csv":
        docs.write_csv(out)
        back = ray.data.read_csv(out)
    else:  # pragma: no cover - two formats wired
        raise ValueError(f"unknown format {fmt!r}")
    return back.map_batches(_stats_batch, batch_format="pyarrow")


def jsonl_roundtrip_stats(sf_dir: str) -> "ray.data.Dataset":
    """documents -> newline-delimited JSON files -> fresh read -> per-doc
    stats; lossless iff the stats match the parquet-side oracle (JSON
    escaping covers embedded newlines/quotes in text)."""
    return _roundtrip(sf_dir, "jsonl")


def csv_roundtrip_stats(sf_dir: str) -> "ray.data.Dataset":
    """documents -> CSV files (Arrow quoting) -> fresh read -> per-doc
    stats; pins that quoted multi-line text survives the CSV dialect."""
    return _roundtrip(sf_dir, "csv")


def partitioned_parquet_roundtrip(sf_dir: str) -> "ray.data.Dataset":
    """Partitioned-sink discipline as a tested surface: write documents
    as hive-partitioned parquet (one directory per ``lang``, one file per
    block inside — the resumable layout where a failed run skips finished
    partitions), then read back ONLY selected partitions via partition
    pruning and emit per-doc stats. Lossless + pruned iff the stats match
    the parquet-side oracle filtered to the same languages.
    """
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/agentic_textio/{tag}/part_parquet"
    shutil.rmtree(out, ignore_errors=True)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=_COLS
    )
    docs.write_parquet(out, partition_cols=["lang"])
    keep = ["en", "de"]
    # partition pruning by path: only the kept lang= directories are ever
    # listed or opened (the other partitions' files never leave storage);
    # the partition key itself re-attaches as a per-directory constant
    sides = []
    for lang in keep:
        part = ray.data.read_parquet(
            f"{out}/lang={lang}", columns=["doc_id", "text", "source"]
        )

        def attach(batch: pa.Table, *, _lang=lang) -> pa.Table:
            return batch.append_column(
                "lang", pa.array([_lang] * batch.num_rows, pa.string())
            )

        sides.append(part.map_batches(attach, batch_format="pyarrow"))
    back = sides[0].union(*sides[1:]) if len(sides) > 1 else sides[0]
    return back.map_batches(_stats_batch, batch_format="pyarrow")
