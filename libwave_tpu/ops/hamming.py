"""Tiled Hamming-distance kernel (descriptor matching hot path).

The brute-force matcher's inner loop — the O(N^2) Hamming table the
reference computes inside cv::BFMatcher::knnMatch
(wave_vision/src/matcher/brute_force_matcher.cpp:176) — as a Pallas kernel:
the descriptor banks are tiled into VMEM blocks and each (TM, TN) output
tile accumulates XOR+popcount over the word axis entirely on the VPU,
without materializing the (N1, N2, W) intermediate XLA would form.

Descriptors are packed uint32 words ((N, W), W = bits/32). Off-TPU the
kernel runs in interpreter mode (tests), so one code path serves both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TM = 128
_TN = 128


def _kernel(a_ref, b_ref, out_ref):
    # a_ref: (TM, W) uint32; b_ref: (TN, W) uint32; out: (TM, TN) int32
    # One (TM, TN, W) VMEM tile of XORs + popcounts, reduced over the word
    # axis — lane-aligned on the last dim, no per-word broadcasts.
    # Per-word unrolled accumulation (measured faster than one (TM, TN, W)
    # XOR tile on v5e: 2.7 vs 3.4 ms at 2048^2 x 16). XLA's fused lowering
    # of the same math is still ~1.6x faster for the *full-matrix* output;
    # this kernel exists as the building block for the fused
    # distance-plus-top-2 matcher (ratio test needs only the 2 best per
    # row), where skipping the (N1, N2) HBM write is the actual win.
    W = a_ref.shape[1]
    acc = jnp.zeros((a_ref.shape[0], b_ref.shape[0]), dtype=jnp.int32)
    for w in range(W):
        x = a_ref[:, w][:, None] ^ b_ref[:, w][None, :]
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:, :] = acc


def _pad_rows(x, mult):
    pad = (-x.shape[0]) % mult
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(d1, d2, interpret):
    n1, W = d1.shape
    n2 = d2.shape[0]
    a = _pad_rows(d1, _TM)
    b = _pad_rows(d2, _TN)
    grid = (a.shape[0] // _TM, b.shape[0] // _TN)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[0]), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, W), lambda i, j: (i, 0)),
            pl.BlockSpec((_TN, W), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((_TM, _TN), lambda i, j: (i, j)),
        interpret=interpret,
    )(a, b)
    return out[:n1, :n2]


def hamming_distance_pallas(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """(N1, W) x (N2, W) packed uint32 -> (N1, N2) int32 Hamming distances.

    Uses the compiled TPU kernel on TPU backends and interpreter mode
    elsewhere (numerically identical).
    """
    interpret = jax.default_backend() != "tpu"
    return _run(d1, d2, interpret)
