"""Device mesh construction.

The topology module for multi-chip/multi-host runs: one place that builds the
``jax.sharding.Mesh`` and names the axes the rest of the framework shards
over. (New component — see package docstring; the reference has no
distributed layer.)
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Axis sizes; -1 on dp means "all remaining devices"."""

    dp: int = -1  # observation/factor-bank sharding
    tp: int = 1  # map-state (landmark-block) sharding

    def validate(self):
        if self.tp <= 0:
            raise ValueError("tp must be >= 1")


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a 2D ('dp', 'tp') mesh over the available devices.

    Axis order puts tp innermost so landmark-block collectives ride the
    fastest ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    tp = config.tp
    dp = config.dp if config.dp > 0 else n // tp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))
