"""Retry with exponential backoff (reference R1:
verizon_table_migration_Rakesh_filters.py:19-36 — 3 tries, 5 s initial
delay, 2x backoff, applied to the sink write). Same semantics, plus an
injectable sleep for fast tests and typed exception filtering."""

from __future__ import annotations

import functools
import logging
import time
from typing import Callable, Iterable, Type

logger = logging.getLogger(__name__)


def retry(
    retries: int = 3,
    delay: float = 5.0,
    backoff: float = 2.0,
    exceptions: Iterable[Type[BaseException]] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
):
    """Decorator: retry the wrapped callable up to ``retries`` times,
    sleeping ``delay`` then ``delay*backoff``... between attempts.
    Re-raises the last failure."""
    exc_tuple = tuple(exceptions)

    def deco(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            attempt, wait = 0, delay
            while True:
                try:
                    return func(*args, **kwargs)
                except exc_tuple as exc:
                    attempt += 1
                    if attempt >= retries:
                        raise
                    logger.warning(
                        "attempt %d/%d of %s failed (%s); retrying in %.1fs",
                        attempt, retries, func.__name__, exc, wait)
                    sleep(wait)
                    wait *= backoff

        return wrapper

    return deco
