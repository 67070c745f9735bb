"""Static-control-flow iteration for the registration solvers.

The reference's matchers iterate until a transform epsilon
(wave_matching/src/icp.cpp:75-133 via PCL's internal loops). A literal
``lax.while_loop`` port costs a device->host sync per iteration to evaluate
the predicate — catastrophic through remote TPU runtimes (the repo's design
rule #2, already applied in ``optim.schur.pcg``). Here the loop is a fixed
``max_iter``-trip ``lax.scan``; each trip runs the body under ``lax.cond``
gated on a carried ``live`` flag, so converged trips reduce to a cheap
identity branch on device with zero host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def converged_scan(body, init_state, max_iter: int, t_eps: float, dtype):
    """while-loop semantics with static control flow.

    ``body(state) -> (new_state, delta)`` runs at least once and stops
    contributing once ``delta <= t_eps`` (the reference's transform-epsilon
    rule); ``dtype`` is the dtype of ``delta``. Returns
    ``(state, iterations)`` where ``iterations`` counts body executions.
    """

    def step(carry, _):
        state, it, live = carry

        def run(s):
            return body(s)

        def freeze(s):
            return s, jnp.asarray(0.0, dtype)

        state, delta = jax.lax.cond(live, run, freeze, state)
        it = it + live.astype(jnp.int32)
        live = live & (delta > t_eps)
        return (state, it, live), None

    (state, iters, _), _ = jax.lax.scan(
        step, (init_state, jnp.asarray(0, jnp.int32), jnp.asarray(True)),
        None, length=max_iter,
    )
    return state, iters
