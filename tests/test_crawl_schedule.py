"""Politeness crawl schedule: spacing invariant + SQL-parity total order."""

import numpy as np

from agentic_doc_ray.functions.scans import crawl_schedule

SF = "/root/testdata/sf0.001"


def test_schedule_is_a_permutation_with_politeness_spacing():
    got = crawl_schedule(SF).to_pandas().sort_values("position")
    n_src = got["source"].nunique()
    # positions form a valid schedule: unique, and per source strictly
    # increasing with gaps of exactly n_sources
    assert got["position"].is_unique
    for _, sub in got.groupby("source"):
        pos = np.sort(sub["position"].to_numpy())
        assert (np.diff(pos) == n_src).all()
    # any prefix of the schedule touches each source at most
    # ceil(len(prefix)/n_src)+1 times (round-robin property)
    prefix = got.head(3 * n_src + 1)
    counts = prefix["source"].value_counts()
    assert counts.max() <= 4
    # rank-within-source order follows doc_id
    for _, sub in got.groupby("source"):
        s = sub.sort_values("position")
        assert (np.diff(s["doc_id"].to_numpy()) > 0).all()
