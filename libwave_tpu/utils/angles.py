"""Angle wrapping utilities.

Capability parity with the reference's ``wave_utils`` angles component
(wave_utils/include/wave/utils/angles.hpp:47-57, src/angles.cpp): ``wrapToPi``
maps any angle into (-pi, pi], ``wrapToTwoPi`` into [0, 2*pi). Implemented as
branch-free, batched jnp ops (usable under jit/vmap/grad, unlike the
reference's scalar fmod loops).
"""

import jax.numpy as jnp

__all__ = ["wrap_to_pi", "wrap_to_two_pi"]


def wrap_to_pi(theta):
    """Wrap angle(s) to the interval (-pi, pi].

    Parity: ``wave::wrapToPi`` (angles.hpp:47). Elementwise over any shape.
    """
    theta = jnp.asarray(theta)
    two_pi = 2.0 * jnp.pi
    wrapped = theta - two_pi * jnp.floor((theta + jnp.pi) / two_pi)
    # floor maps pi -> pi (correct); -pi -> wraps to pi as well, matching the
    # half-open (-pi, pi] convention.
    return wrapped


def wrap_to_two_pi(theta):
    """Wrap angle(s) to the interval [0, 2*pi).

    Parity: ``wave::wrapToTwoPi`` (angles.hpp:57). Elementwise over any shape.
    """
    theta = jnp.asarray(theta)
    two_pi = 2.0 * jnp.pi
    return theta - two_pi * jnp.floor(theta / two_pi)
