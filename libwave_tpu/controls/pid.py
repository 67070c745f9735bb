"""Functional PID controller.

Parity with the reference's scalar PID (wave_controls/include/wave/controls/
pid.hpp:12, src/pid.cpp:5 ``update``): proportional + integral(error·dt) +
derivative((e - e_prev)/dt). State is an explicit pytree so controllers nest in
``lax.scan`` loops and batch with ``vmap`` (e.g. the quadrotor's cascaded
attitude/position controllers run as one fused scan on device).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PIDGains(NamedTuple):
    k_p: jnp.ndarray
    k_i: jnp.ndarray
    k_d: jnp.ndarray


class PIDState(NamedTuple):
    error_prev: jnp.ndarray
    error_sum: jnp.ndarray


def pid_init(shape=(), dtype=jnp.float32) -> PIDState:
    z = jnp.zeros(shape, dtype=dtype)
    return PIDState(error_prev=z, error_sum=z)


def pid_update(gains: PIDGains, state: PIDState, setpoint, actual, dt):
    """One PID step; returns (output, new_state). Broadcasts over batch."""
    error = setpoint - actual
    error_sum = state.error_sum + error * dt
    p = gains.k_p * error
    i = gains.k_i * error_sum
    d = gains.k_d * (error - state.error_prev) / dt
    return p + i + d, PIDState(error_prev=error, error_sum=error_sum)
