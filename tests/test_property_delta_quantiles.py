"""Property tests for the local resolve kernels of snapshot_diff and
quantile_bins (module-level fns, no Ray session per example): the
vectorized per-bucket diff must equal a brute-force dict diff for
arbitrary snapshot pairs (including >2^53 fingerprints, which would
silently collide under a float64 merge), and the quantile boundary rule
must equal the expanded-array quantile_disc definition.
"""

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from agentic_doc_ray.functions.delta import _EX_SCHEMA, _diff_bucket, _fingerprint64
from agentic_doc_ray.functions.sketches import _quantile_bounds
from agentic_doc_ray.functions.text import _FP_BASE, _FP_MOD


def _fp_ref(s: str) -> int:
    """Pure-Python byte polynomial: h = Σ (b+1)·B^(len-1-j) mod 2^61-1."""
    h = 0
    for b in s.encode():
        h = (h * _FP_BASE + b + 1) % _FP_MOD
    return h


@settings(max_examples=150, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80),
        max_size=12,
    ),
    skip=st.integers(0, 3),
)
def test_fingerprint64_matches_reference_and_slices(texts, skip):
    arr = pa.array(texts, pa.string())
    got = _fingerprint64(arr).to_pylist()
    assert got == [_fp_ref(t) for t in texts]
    # sliced arrays carry a nonzero arr.offset — the buffer math must hold
    sl = arr.slice(min(skip, len(arr)))
    assert _fingerprint64(sl).to_pylist() == [_fp_ref(t) for t in texts[min(skip, len(texts)):]]

_fp = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_side_map = st.dictionaries(st.integers(0, 40), _fp, max_size=25)


def _group_table(a: dict, b: dict, n_sent: int) -> pa.Table:
    rows = (
        [(0, d, "a", f) for d, f in a.items()]
        + [(0, d, "b", f) for d, f in b.items()]
        + [(0, -1, "sent", 0)] * n_sent
    )
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int32()),
            pa.array([r[1] for r in rows], pa.int64()),
            pa.array([r[2] for r in rows], pa.string()),
            pa.array([r[3] for r in rows], pa.int64()),
        ],
        schema=_EX_SCHEMA,
    )


@settings(max_examples=200, deadline=None)
@given(a=_side_map, b=_side_map, n_sent=st.integers(0, 2))
def test_diff_bucket_equals_bruteforce(a, b, n_sent):
    out = _diff_bucket(_group_table(a, b, n_sent))
    got = sorted(
        zip(out.column("doc_id").to_pylist(), out.column("change").to_pylist())
    )
    want = sorted(
        [(d, "removed") for d in a if d not in b]
        + [(d, "added") for d in b if d not in a]
        + [(d, "changed") for d in a if d in b and a[d] != b[d]]
    )
    assert got == want


def test_diff_bucket_big_fingerprints_not_float_collided():
    # 2^53 and 2^53+1 are equal as float64; the nullable-Int64 merge must
    # still see them as a change
    t = _group_table({7: 2**53}, {7: 2**53 + 1}, 1)
    out = _diff_bucket(t)
    assert out.column("change").to_pylist() == ["changed"]


@settings(max_examples=200, deadline=None)
@given(
    dist=st.dictionaries(
        st.integers(-(10**6), 10**6), st.integers(1, 9), min_size=0, max_size=30
    ),
    n_bins=st.integers(2, 12),
)
def test_quantile_bounds_equals_expanded_quantile_disc(dist, n_bins):
    got = _quantile_bounds(dist, n_bins).tolist()
    expanded = np.sort(
        np.repeat(
            np.array(sorted(dist), dtype=np.int64),
            np.array([dist[v] for v in sorted(dist)], dtype=np.int64),
        )
    )
    n = len(expanded)
    if n == 0:
        assert got == []
        return
    want = [
        int(expanded[max(1, math.ceil(i / n_bins * n)) - 1])
        for i in range(1, n_bins)
    ]
    assert got == want
