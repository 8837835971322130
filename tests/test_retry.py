"""Retry ladder + logging styles (ref parse.py:743-750, utils.py:267-291)."""

import random

import pytest

from agentic_doc_ray.config import EngineConfig, settings_from_env
from agentic_doc_ray.retry import (
    RetryableError,
    call_with_retries,
    log_retry_failure,
    retry_wait_seconds,
)


def test_retries_only_retryable_until_budget():
    calls = []
    slept = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RetryableError("transient")
        return "ok"

    assert (
        call_with_retries(
            flaky, max_retries=3, retry_logging_style="none", sleep=slept.append
        )
        == "ok"
    )
    assert len(calls) == 3 and len(slept) == 2

    # budget exhausted -> the last RetryableError propagates
    calls.clear()
    with pytest.raises(RetryableError):
        call_with_retries(
            lambda: (_ for _ in ()).throw(RetryableError("always")),
            max_retries=2,
            retry_logging_style="none",
            sleep=lambda s: None,
        )

    # non-retryable errors propagate immediately, no sleep
    slept.clear()
    with pytest.raises(IOError):
        call_with_retries(
            lambda: (_ for _ in ()).throw(IOError("fatal")),
            max_retries=5,
            retry_logging_style="none",
            sleep=slept.append,
        )
    assert slept == []


def test_wait_is_exponential_jitter_capped():
    rng = random.Random(7)
    w1 = retry_wait_seconds(1, rng=rng, jitter=0)
    w2 = retry_wait_seconds(2, rng=rng, jitter=0)
    w3 = retry_wait_seconds(3, rng=rng, jitter=0)
    assert (w1, w2, w3) == (1.0, 1.5, 2.25)  # exp_base 1.5, initial 1
    assert retry_wait_seconds(100, rng=rng, jitter=0, max_wait=60) == 60.0
    w = retry_wait_seconds(1, rng=random.Random(0), jitter=10)
    assert 1.0 <= w <= 11.0


def test_logging_styles(capsys, caplog):
    import logging

    with caplog.at_level(logging.DEBUG, logger="agentic_doc_ray.retry"):
        log_retry_failure("fn", 2, ValueError("boom"), "log_msg")
    assert "failed on attempt 2" in caplog.text and "boom" in caplog.text

    log_retry_failure("fn", 3, ValueError("x"), "inline_block")
    assert "███" in capsys.readouterr().out  # yellow block, 3 cells

    log_retry_failure("fn", 1, ValueError("x"), "none")
    assert capsys.readouterr().out == ""

    with pytest.raises(ValueError, match="Invalid retry logging style"):
        log_retry_failure("fn", 1, ValueError("x"), "loud")
    with pytest.raises(ValueError, match="Invalid retry logging style"):
        call_with_retries(lambda: 1, retry_logging_style="loud")


def test_config_surface():
    cfg = EngineConfig(retry_logging_style="inline_block", max_retry_wait_time=5)
    assert cfg.max_retry_wait_time == 5
    with pytest.raises(ValueError, match="Invalid retry logging style"):
        EngineConfig(retry_logging_style="loud")
    env_cfg = settings_from_env(
        {"RETRY_LOGGING_STYLE": "none", "MAX_RETRY_WAIT_TIME": "30"}
    )
    assert env_cfg.retry_logging_style == "none"
    assert env_cfg.max_retry_wait_time == 30


def test_connector_fetch_retries_transient_failures():
    """End-to-end through the Ray fan-out: a connector whose fetch fails
    transiently twice still lands its file; a permanently-failing one is
    dropped with a log (ref parse.py:166-190)."""
    from agentic_doc_ray.sources.connectors import read_connector_corpus

    class FlakyConnector:
        def list_files(self, path=None, pattern=None):
            return ["good", "dead"]

        def fetch(self, fid):
            if fid == "dead":
                raise IOError("404")  # non-retryable: dropped immediately
            import os
            import tempfile

            # per-attempt marker survives across Ray task retries of the
            # same batch because it lives on disk, not in actor state
            marker = os.path.join(tempfile.gettempdir(), "flaky_marker")
            with open(marker, "a") as fh:
                fh.write("x")
            if os.path.getsize(marker) < 3:
                raise RetryableError("transient")
            return b"good text payload at last"

    import os
    import tempfile

    marker = os.path.join(tempfile.gettempdir(), "flaky_marker")
    if os.path.exists(marker):
        os.unlink(marker)
    cfg = EngineConfig(max_retries=3, max_retry_wait_time=0,
                       retry_logging_style="none")
    rows = read_connector_corpus(FlakyConnector(), config=cfg).take_all()
    assert [r["doc_id"] for r in rows] == ["good"]
    assert rows[0]["spans"][0]["text"] == "good text payload at last"
