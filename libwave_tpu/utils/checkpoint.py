"""Checkpoint / resume for long-running solves and pipelines.

The reference's only serialization is the VO dataset directory format and
CSV export (§5.4 of SURVEY.md); optimizer state is never checkpointed. For
multi-hour distributed runs the framework needs periodic snapshots: any
pytree of arrays (solver state, tracker state, trajectory) round-trips
through a single ``.npz`` file, with pytree structure stored alongside so
NamedTuple/dataclass states reconstruct exactly.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_checkpoint(path: str, pytree) -> None:
    """Snapshot a pytree of arrays to ``<path>`` (npz)."""
    leaves, treedef = jax.tree.flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp.npz"  # savez appends .npz unless already suffixed
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, like):
    """Restore a snapshot into the structure of ``like`` (same pytree
    shape; arrays replace the leaves)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp

    return jax.tree.unflatten(treedef, [jnp.asarray(x) for x in restored])


def latest_checkpoint(directory: str, prefix: str = "ckpt_"):
    """Newest checkpoint path under ``directory`` or None."""
    if not os.path.isdir(directory):
        return None
    cands = [
        f for f in os.listdir(directory)
        if f.startswith(prefix) and f.endswith(".npz")
    ]
    if not cands:
        return None
    cands.sort()
    return os.path.join(directory, cands[-1])
