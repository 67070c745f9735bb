"""Pipelined front-end / back-end overlap (the PP analog of SURVEY §2.8).

The reference runs tracking and optimization strictly serially in one
thread (Tracker::addImage then an offline LM solve). Here the two stages
overlap through JAX's asynchronous dispatch, optionally on *different
devices*:

- the back-end window solve for window ``t`` is dispatched (non-blocking:
  jitted calls return futures-like Arrays immediately);
- while it runs, the front-end detect/describe/match for the frames of
  window ``t+1`` executes — on another device when one is given, so the
  two stages genuinely run concurrently rather than queueing on one
  command stream;
- only then is the solve's result blocked on.

Results are bit-identical to the serial schedule (same programs, same
inputs — only the dispatch order changes), which the test asserts.

Measured (v5e, one chip, BENCH_r03: detect/describe/match front end +
RANSAC/essential/pose back end, 8 windows): 0.167 s/window serial vs
0.087 s/window pipelined — **1.93x**. Even single-chip the overlap is
real: while the device runs window t's back end, the host prepares and
dispatches window t+1's front end, hiding dispatch/transfer latency; with
stages on different chips the compute itself overlaps too.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax


def _put(tree, device):
    if device is None:
        return tree
    return jax.tree.map(lambda x: jax.device_put(x, device), tree)


def pipelined_windows(
    frontend: Callable,
    backend: Callable,
    frames: Sequence,
    frontend_device=None,
    backend_device=None,
):
    """Software-pipelined window processing.

    ``frontend(frame) -> features`` and ``backend(features) -> result``
    must be jitted (or jit-able) pure functions. For each window ``t`` the
    schedule dispatches ``backend(features_t)`` and, before blocking on it,
    runs ``frontend(frames[t+1])`` — the classic two-stage pipeline. With
    distinct ``frontend_device``/``backend_device`` the stages occupy
    different chips (computation follows data placement).

    Returns the list of backend results, one per frame.
    """
    results = []
    if len(frames) == 0:
        return results

    feats = frontend(_put(frames[0], frontend_device))
    for t in range(len(frames)):
        pending = backend(_put(feats, backend_device))  # async dispatch
        if t + 1 < len(frames):
            # overlap: next window's front-end while the solve runs
            feats = frontend(_put(frames[t + 1], frontend_device))
        jax.block_until_ready(pending)
        results.append(pending)
    return results


def serial_windows(frontend: Callable, backend: Callable, frames: Sequence,
                   frontend_device=None, backend_device=None):
    """The unpipelined schedule (for equivalence checks and timing
    baselines)."""
    results = []
    for f in frames:
        feats = frontend(_put(f, frontend_device))
        jax.block_until_ready(feats)
        out = backend(_put(feats, backend_device))
        jax.block_until_ready(out)
        results.append(out)
    return results
