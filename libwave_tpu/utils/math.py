"""Small math helpers rounding out wave_utils parity.

Parity: wave_utils math.hpp/cpp ``fltcmp`` (:15), ``median`` (:25),
``vec2mat``/``mat2vec`` (:52-73, column-major fill), ``randf``/``randi``
(keyed jax RNG instead of libc rand).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fltcmp(f1, f2, threshold: float = 1e-4):
    """-1/0/+1 comparison with tolerance (math.cpp:15)."""
    f1 = jnp.asarray(f1)
    f2 = jnp.asarray(f2)
    eq = jnp.abs(f1 - f2) <= threshold
    return jnp.where(eq, 0, jnp.where(f1 > f2, 1, -1))


def median(v: jnp.ndarray) -> jnp.ndarray:
    """Median with even-length mean-of-middle-two (math.cpp:25)."""
    return jnp.median(jnp.asarray(v))


def vec2mat(x, rows: int, cols: int) -> jnp.ndarray:
    """Column-major reshape (math.cpp:52 fills column by column)."""
    return jnp.asarray(x).reshape(cols, rows).T


def mat2vec(A) -> jnp.ndarray:
    """Column-major flatten (math.cpp:66)."""
    return jnp.asarray(A).T.reshape(-1)


def randf(key: jax.Array, lo: float, hi: float, shape=()):
    """Uniform floats in [lo, hi) (math.cpp randf, keyed RNG)."""
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def randi(key: jax.Array, lo: int, hi: int, shape=()):
    """Uniform ints in [lo, hi) (math.cpp randi, keyed RNG)."""
    return jax.random.randint(key, shape, lo, hi)
