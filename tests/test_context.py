"""Session-tuning invariants: shuffle width vs the aggregator-fleet
CPU-reservation arithmetic (see context.shuffle_partitions docstring)."""

import pytest

from agentic_doc_ray.context import shuffle_partitions


@pytest.fixture
def _np_env(monkeypatch):
    def set_env(v):
        monkeypatch.setenv("ADR_SHUFFLE_PARTITIONS", str(v))

    return set_env


def _cpus():
    import ray

    return int(ray.cluster_resources().get("CPU", 4))


def test_default_cap_is_cluster_cpus(ray_session):
    assert shuffle_partitions() == max(2, _cpus())
    assert shuffle_partitions(2) == 2


def test_env_override_widens_past_cpus(ray_session, _np_env):
    # An explicit override may exceed the CPU count (a real cluster has
    # more cores than this session reports) ...
    cpus = _cpus()
    _np_env(2 * cpus)
    assert shuffle_partitions() == 2 * cpus


def test_env_override_clamped_at_deadlock_ceiling(ray_session, _np_env):
    # ... but never past 4x CPUs: each exchange's aggregator fleet
    # reserves np/16 CPUs in total regardless of fleet size, so two
    # in-flight exchanges at np > 4x CPUs reserve more than half the
    # cluster and a multi-exchange plan deadlocks (measured: minhash at
    # ADR_SHUFFLE_PARTITIONS=64 under the 8-CPU driver gate hung; the
    # clamped run completes green).
    cpus = _cpus()
    _np_env(100 * cpus)
    assert shuffle_partitions() == 4 * cpus
    # requested still wins below the cap
    assert shuffle_partitions(2) == 2
