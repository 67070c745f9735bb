"""Tracing / profiling utilities.

Parity-and-beyond for the reference's minimal instrumentation (§5.1 of
SURVEY.md: tic/toc timers + public diagnostic counters like
FeatureDetector::num_keypoints_detected). Here:

- :func:`profile_trace` wraps ``jax.profiler.trace`` for TensorBoard-style
  device traces;
- :class:`Counters` carries named diagnostic counters *inside* jitted
  pipelines as a pytree (returned as arrays — never printed from device
  code), the functional replacement for the reference's mutable members;
- :func:`annotate` names a region for the profiler.
"""

from __future__ import annotations

import contextlib
from typing import Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler region (with annotate("detect"): ...)."""
    return jax.profiler.TraceAnnotation(name)


class Counters(dict):
    """Named scalar counters accumulated through a jitted pipeline.

    >>> c = Counters.zeros("keypoints", "matches")
    >>> c = c.add(keypoints=jnp.sum(mask))
    """

    @staticmethod
    def zeros(*names: str, dtype=jnp.int32) -> "Counters":
        return Counters({n: jnp.zeros((), dtype) for n in names})

    def add(self, **updates) -> "Counters":
        out = Counters(self)
        for k, v in updates.items():
            out[k] = out.get(k, 0) + v
        return out

    def as_floats(self) -> Dict[str, float]:
        return {k: float(v) for k, v in self.items()}


jax.tree_util.register_pytree_node(
    Counters,
    lambda c: (tuple(c.values()), tuple(c.keys())),
    lambda keys, vals: Counters(zip(keys, vals)),
)
