"""Wall-clock timers.

Parity with the reference's matlab-style timers (wave_utils/include/wave/
utils/time.hpp:22-29 tic/toc/mtoc/time_now). ``Timer`` additionally
synchronizes outstanding device work before reading the clock so TPU kernels
are timed correctly (jax dispatch is async).
"""

from __future__ import annotations

import time
from typing import Optional

import jax


def time_now() -> float:
    return time.monotonic()


def tic() -> float:
    """Start a timer; returns an opaque tick to pass to :func:`toc`."""
    return time.monotonic()


def toc(t: float) -> float:
    """Seconds since ``tic()`` (reference ``toc``)."""
    return time.monotonic() - t


def mtoc(t: float) -> float:
    """Milliseconds since ``tic()`` (reference ``mtoc``)."""
    return (time.monotonic() - t) * 1e3


class Timer:
    """Context-manager timer that blocks on device completion.

    >>> with Timer() as t:
    ...     result = jitted_fn(x)
    ...     t.block_on(result)
    >>> t.elapsed  # seconds
    """

    def __init__(self) -> None:
        self.elapsed: Optional[float] = None
        self._result = None

    def __enter__(self) -> "Timer":
        self._start = time.monotonic()
        return self

    def block_on(self, pytree) -> None:
        self._result = pytree

    def __exit__(self, *exc) -> bool:
        if self._result is not None:
            jax.block_until_ready(self._result)
        self.elapsed = time.monotonic() - self._start
        return False
