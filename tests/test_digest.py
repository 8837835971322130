"""Vectorized single-block MD5 (``functions/_digest.py``) equals hashlib
byte-for-byte — the oracle-compat constraint: every md5-gated operator's
SQL oracle recomputes the same digest with DuckDB's ``md5()``."""

import hashlib
import random
import string

import numpy as np
import pyarrow as pa

from agentic_doc_ray.functions._digest import (
    md5_per_cent,
    md5_per_mille,
    md5_prefix_vec,
)


def _want(strs, nb):
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[:nb], "big") for s in strs],
        np.uint64,
    )


def test_prefix_matches_hashlib_mixed_lengths():
    random.seed(7)
    strs = ["", "a", "doc_000123", "x" * 55, "y" * 56, "z" * 200, "héllo wörld"]
    strs += [
        "".join(random.choices(string.printable, k=random.randint(0, 80)))
        for _ in range(300)
    ]
    col = pa.array(strs)
    for nb in (1, 2, 4, 8):
        assert (md5_prefix_vec(col, nb) == _want(strs, nb)).all()


def test_uniform_fast_path_and_gates():
    strs = [f"doc_{i:05d}" for i in range(1000)]
    col = pa.array(strs)
    assert (md5_prefix_vec(col, 2) == _want(strs, 2)).all()
    pm = np.array(
        [int(hashlib.md5(s.encode()).hexdigest()[:4], 16) for s in strs], np.int64
    )
    assert (md5_per_mille(col) == pm % 1000).all()
    assert (md5_per_cent(col) == pm % 100).all()


def test_sliced_chunked_and_nonstring():
    strs = [f"id{i}" for i in range(100)]
    ca = pa.chunked_array([pa.array(strs[:60]).slice(10, 40), pa.array(strs[60:])])
    flat = strs[10:50] + strs[60:]
    assert (md5_prefix_vec(ca, 2) == _want(flat, 2)).all()
    # integer ids hash as str(int) — the legacy str(d) behavior
    ints = pa.chunked_array([pa.array([1, 22, 333], pa.int64())])
    assert (md5_prefix_vec(ints, 2) == _want(["1", "22", "333"], 2)).all()
    assert len(md5_prefix_vec(pa.array([], pa.string()), 2)) == 0
