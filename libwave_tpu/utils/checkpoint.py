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


def solve_with_checkpoints(
    solve_chunk,
    state,
    total_iterations: int,
    directory: str,
    every: int = 5,
    prefix: str = "ckpt_",
    resume: bool = True,
):
    """Periodic solver-state snapshots around a chunked solve loop
    (SURVEY §5.3-5.4: the failure-recovery story for long distributed
    runs — snapshot + deterministic replay).

    ``solve_chunk(state, carry, num_iterations) -> (state, carry)`` runs
    ``num_iterations`` solver iterations (a jitted solve with a reduced
    iteration budget; ``carry`` threads solver scalars like the LM lambda
    between chunks, and must be a pytree of arrays or None). After each
    chunk the (state, carry, iteration) triple lands in
    ``directory/<prefix><iter>.npz`` via an atomic rename; with ``resume``
    the newest snapshot is loaded and the loop continues from its
    iteration count.

    Returns (state, carry, start_iteration_of_last_run).
    """
    os.makedirs(directory, exist_ok=True)
    carry = None
    start = 0
    if resume:
        latest = latest_checkpoint(directory, prefix)
        if latest is not None:
            start = int(os.path.basename(latest)[len(prefix):-4])
            state, carry = _load_state_carry(latest, state)
    it = start
    while it < total_iterations:
        n = min(every, total_iterations - it)
        state, carry = solve_chunk(state, carry, n)
        it += n
        _save_state_carry(
            os.path.join(directory, f"{prefix}{it:08d}.npz"), state, carry
        )
    return state, carry, start


def _save_state_carry(path, state, carry):
    # tuple order matters: state leaves first, carry leaves after (the
    # loader splits by the state's leaf count)
    save_checkpoint(path, (state, carry))


def _load_state_carry(path, like_state):
    """Restore (state, carry). The carry structure is recovered from the
    file's leaf count: leaves beyond the state's belong to the carry, whose
    treedef was stored flat alongside."""
    data = np.load(path)
    import jax.numpy as jnp

    state_leaves, state_def = jax.tree.flatten(like_state)
    n = len(state_leaves)
    leaves = []
    i = 0
    while f"leaf_{i}" in data:
        leaves.append(jnp.asarray(data[f"leaf_{i}"]))
        i += 1
    state = jax.tree.unflatten(state_def, leaves[:n])
    carry_leaves = leaves[n:]
    carry = tuple(carry_leaves) if carry_leaves else None
    return state, carry
