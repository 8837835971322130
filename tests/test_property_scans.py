"""Property tests: the distributed scan/rank/heavy-hitter operators equal
naive single-process oracles on arbitrary generated inputs.

Each example writes a tiny parquet table (the operators take sf_dir, the
same read path production uses) and runs the full Ray pipeline — few
examples, real coverage of the partition/prefix/merge seams.
"""

import collections
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

from agentic_doc_ray.functions.ranking import heavy_hitter_tokens
from agentic_doc_ray.functions.scans import (
    _JITTER_MOD,
    _JITTER_MULT,
    global_rank,
    late_events,
    user_cumulative_spend,
)

_TMP = "/tmp/prop_scans"


def _write(table: pa.Table, name: str) -> str:
    d = os.path.join(_TMP, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, f"{name.split('-')[0]}.parquet"))
    return d


# --- late_events vs naive ---------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),  # ts offset seconds
        st.sampled_from(["view", "purchase"]),
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
)


def _events_table(rows):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    return pa.Table.from_pydict(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [base + np.timedelta64(r[0] * 1_000_000, "us") for r in rows]
            ),
            "user_id": pa.array([i % 5 for i in range(len(rows))], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([round(r[2], 2) for r in rows], pa.float64()),
        }
    )


@given(events_strategy)
@settings(max_examples=12, deadline=None, derandomize=True)
def test_late_events_matches_naive(rows):
    t = _events_table(rows)
    d = _write(t, f"events-{abs(hash(tuple(r[0] for r in rows))) % 997}")
    got = (
        late_events(d).to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # naive: sort by (arrival, id), running exclusive max of ts
    ids = np.arange(len(rows), dtype=np.int64)
    ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    jitter = ((ids * _JITTER_MULT) % _JITTER_MOD).astype("timedelta64[s]")
    arrival = ts + jitter
    order = np.lexsort((ids, arrival))
    wm = {}
    running = None
    for i in order:
        wm[int(i)] = running
        running = ts[i] if running is None else max(running, ts[i])
    late = {
        i: (w is not None and (w - ts[i]) > np.timedelta64(5, "m"))
        for i, w in wm.items()
    }
    assert list(got["event_id"]) == list(range(len(rows)))
    assert [bool(x) for x in got["is_late"]] == [late[i] for i in range(len(rows))]
    naive_wm = [wm[i] for i in range(len(rows))]
    got_wm = [
        None if pd.isna(x) else np.datetime64(x, "us") for x in got["watermark_ts"]
    ]
    assert got_wm == naive_wm


@given(events_strategy)
@settings(max_examples=10, deadline=None, derandomize=True)
def test_cumulative_spend_matches_naive(rows):
    t = _events_table(rows)
    d = _write(t, f"events-{abs(hash(('c',) + tuple(r[0] for r in rows))) % 997}")
    got = user_cumulative_spend(d).to_pandas()
    df = t.to_pandas()
    if got.empty:  # an empty Dataset round-trips with no columns
        assert (df["event_type"] == "purchase").sum() == 0
        return
    got = got.sort_values("event_id").reset_index(drop=True)
    p = df[df["event_type"] == "purchase"].copy()
    p["cents"] = (p["value"] * 100).round().astype("int64")
    p = p.sort_values(["user_id", "ts", "event_id"])
    p["n_purchases"] = p.groupby("user_id").cumcount() + 1
    p["cum_spend"] = p.groupby("user_id")["cents"].cumsum() / 100.0
    want = p.sort_values("event_id").reset_index(drop=True)
    assert list(got["event_id"]) == list(want["event_id"])
    assert list(got["n_purchases"]) == list(want["n_purchases"])
    assert list(got["cum_spend"]) == list(want["cum_spend"])


# --- global_rank vs argsort -------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=80)
)
@settings(max_examples=10, deadline=None, derandomize=True)
def test_global_rank_matches_argsort(lengths):
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(lengths)), pa.int64()),
            "text": pa.array(["x" * n for n in lengths], pa.string()),
            "n_chars": pa.array(lengths, pa.int64()),
        }
    )
    d = _write(t, f"documents-{abs(hash(tuple(lengths))) % 997}")
    got = global_rank(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    order = sorted(range(len(lengths)), key=lambda i: (lengths[i], i))
    want_rank = {doc: r + 1 for r, doc in enumerate(order)}
    assert list(got["global_rank"]) == [want_rank[i] for i in range(len(lengths))]


# --- heavy hitters vs Counter ----------------------------------------------


def test_empty_edge_cases():
    # zero purchases: the filter empties the stream before the shuffle
    t = _events_table([(0, "view", 1.0), (60, "view", 2.0)])
    d = _write(t, "events-nopurchase")
    assert len(user_cumulative_spend(d).to_pandas()) == 0
    # all docs shorter than L: zero hash rows before the shuffle
    from agentic_doc_ray.functions.substr import repeated_substring_spans

    docs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["ab", "cd"])}
        )
    )
    assert len(repeated_substring_spans(docs, L=30).to_pandas()) == 0
    # all-empty texts: no tokens, no candidates
    docs2 = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": pa.array([1], pa.int64()), "text": pa.array([""])}
        )
    )
    assert len(heavy_hitter_tokens(docs2, per_mille=1).to_pandas()) == 0


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"]),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=550, max_value=2000),  # capacity incl. truncating range
)
@settings(max_examples=10, deadline=None, derandomize=True)
def test_heavy_hitters_match_counter(docs_tokens, capacity):
    texts = [" ".join(toks) for toks in docs_tokens]
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    got = heavy_hitter_tokens(ds, per_mille=100, capacity=capacity).to_pandas()
    counts = collections.Counter(tok for toks in docs_tokens for tok in toks)
    n = sum(counts.values())
    thresh = max(1, -(-n * 100 // 1000))
    want = {tok: c for tok, c in counts.items() if c >= thresh}
    if got.empty:
        assert want == {}
        return
    assert dict(zip(got["token"], got["n"])) == want
