"""Retry machinery with the reference's logging styles.

The reference retries its remote parse request with tenacity —
exponential-jitter wait (exp_base 1.5, initial 1 s, capped at
``max_retry_wait_time``, +U(0,10) jitter), ``stop_after_attempt
(max_retries)``, retrying only ``RetryableError``, and an ``after``
callback that logs each failed attempt in one of three styles
(``retry_logging_style``: log_msg | inline_block | none —
utils.py:267-291, parse.py:743-750, config.py:104-118).

In this engine the parse is local compute (nothing transient to retry;
Ray's ``max_task_retries``/``max_restarts`` cover worker death), so the
retry surface lives where remote I/O actually happens: connector/URL
downloads (sources/connectors.py, sources/files.py). A connector whose
``fetch`` raises ``RetryableError`` gets the full reference ladder;
any other exception is non-retryable and falls through to the
drop-with-log contract (parse.py:166-190).
"""

from __future__ import annotations

import logging
import random
import time

_LOGGER = logging.getLogger(__name__)

RETRY_LOGGING_STYLES = ("log_msg", "inline_block", "none")


class RetryableError(Exception):
    """Marker for transient failures worth retrying (the reference's
    RetryableError wraps rate-limit / 5xx responses)."""


def log_retry_failure(
    func_name: str,
    attempt_number: int,
    exception: BaseException,
    style: str = "log_msg",
) -> None:
    """One failed attempt -> one log event (ref utils.py:267-291)."""
    if style == "log_msg":
        _LOGGER.debug(
            "'%s' failed on attempt %d. Error: '%s'.",
            func_name,
            attempt_number,
            exception,
        )
    elif style == "inline_block":
        # yellow progress block updating on the same line (ref :280-286)
        print(f"\r\033[33m{'█' * attempt_number}\033[0m", end="", flush=True)
    elif style == "none":
        pass
    else:
        raise ValueError(f"Invalid retry logging style: {style}")


def retry_wait_seconds(
    attempt_number: int,
    *,
    initial: float = 1.0,
    exp_base: float = 1.5,
    max_wait: float = 60.0,
    jitter: float = 10.0,
    rng: random.Random | None = None,
) -> float:
    """tenacity.wait_exponential_jitter semantics (ref parse.py:744-746):
    min(initial * exp_base**(n-1), max_wait) + U(0, jitter), the sum
    capped at max_wait."""
    base = min(initial * exp_base ** (attempt_number - 1), max_wait)
    j = (rng or random).uniform(0, jitter)
    return min(base + j, max_wait)


def call_with_retries(
    fn,
    *args,
    max_retries: int = 3,
    max_retry_wait_time: float = 60.0,
    retry_logging_style: str = "log_msg",
    sleep=time.sleep,
    rng: random.Random | None = None,
    **kwargs,
):
    """Run ``fn(*args, **kwargs)`` with the reference's retry ladder.

    Only ``RetryableError`` retries (ref retry_if_exception_type,
    parse.py:748); anything else propagates immediately. ``max_retries``
    is the total attempt budget (stop_after_attempt). ``sleep``/``rng``
    are injectable so tests stay instant and deterministic.
    """
    if retry_logging_style not in RETRY_LOGGING_STYLES:
        raise ValueError(f"Invalid retry logging style: {retry_logging_style}")
    attempts = max(1, int(max_retries))
    for attempt in range(1, attempts + 1):
        try:
            return fn(*args, **kwargs)
        except RetryableError as exc:
            log_retry_failure(
                getattr(fn, "__name__", "unknown_function"),
                attempt,
                exc,
                retry_logging_style,
            )
            if attempt == attempts:
                raise
            sleep(
                retry_wait_seconds(
                    attempt, max_wait=max_retry_wait_time, rng=rng
                )
            )
