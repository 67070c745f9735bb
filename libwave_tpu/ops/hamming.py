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
import numpy as np
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
    # (Matrix-output kernel: superseded on the matcher hot path by the
    # fused top-2 kernel below; kept for callers that need the full table.)
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


# ---------------------------------------------------------------------------
# Fused distance + per-row top-2 (the ratio-test matcher's real need).
#
# Measured on the real TPU vs the fused-XLA full-matrix + top_k path
# (256-bit descriptors, square banks): 2048^2 1.17x, 4096^2 1.04x,
# 8192^2 **9.5x** (51.0 -> 5.4 ms), 16384^2 **21.2x** (240.8 -> 11.4 ms) —
# once the (N1, N2, W) intermediate outgrows what XLA keeps fused, the
# matrix path pays the full HBM round-trip this kernel never takes.
# ---------------------------------------------------------------------------

_T2M = 128  # query rows per program
_T2N = 512  # reference columns per inner step

_BIG = np.int32(1 << 24)


def _top2_kernel(a_ref, b_ref, m2_ref, d1_ref, d2_ref, i1_ref, *, n2, tn):
    """Per-row running top-2 over the reference bank, entirely in VMEM —
    the (N1, N2) distance matrix never exists. a: (TM, W) uint32 queries;
    b: (N2p, W) uint32 references (whole bank resident); m2: (N2p, 1) int32
    validity. Outputs (TM, 1): best dist, second dist, best index."""
    TM, W = a_ref.shape
    n_tiles = b_ref.shape[0] // tn

    def tile(j, carry):
        d1, d2, i1 = carry
        b = b_ref[pl.ds(j * tn, tn), :]  # (tn, W)
        m2 = m2_ref[pl.ds(j * tn, tn), 0]  # (tn,)
        acc = jnp.zeros((TM, tn), jnp.int32)
        for w in range(W):
            x = a_ref[:, w][:, None] ^ b[:, w][None, :]
            acc = acc + jax.lax.population_count(x).astype(jnp.int32)
        cols = j * tn + jax.lax.broadcasted_iota(jnp.int32, (TM, tn), 1)
        live = (cols < n2) & (m2[None, :] > 0)
        acc = jnp.where(live, acc, _BIG)
        d1_t = jnp.min(acc, axis=1)
        # first-occurrence argmin via the iota-min trick (no argmin lowering)
        i1_t = jnp.min(
            jnp.where(acc == d1_t[:, None], cols, _BIG), axis=1
        )
        masked = jnp.where(cols == i1_t[:, None], _BIG, acc)
        d2_t = jnp.min(masked, axis=1)
        # merge running top-2 with the tile's top-2
        nd1 = jnp.minimum(d1, d1_t)
        ni1 = jnp.where(d1_t < d1, i1_t, i1)
        nd2 = jnp.minimum(jnp.minimum(d2, d2_t), jnp.maximum(d1, d1_t))
        return nd1, nd2, ni1

    init = (
        jnp.full((TM,), _BIG, jnp.int32),
        jnp.full((TM,), _BIG, jnp.int32),
        jnp.zeros((TM,), jnp.int32),
    )
    d1, d2, i1 = jax.lax.fori_loop(0, n_tiles, tile, init)
    d1_ref[:, 0] = d1
    d2_ref[:, 0] = d2
    i1_ref[:, 0] = i1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_top2(d1, d2, mask2, interpret):
    n1, W = d1.shape
    n2 = d2.shape[0]
    a = _pad_rows(d1, _T2M)
    tn = min(_T2N, max(128, 1 << (n2 - 1).bit_length()))
    b = _pad_rows(d2, tn)
    m2 = _pad_rows(mask2.astype(jnp.int32)[:, None], tn)
    grid = (a.shape[0] // _T2M,)
    out_shape = [
        jax.ShapeDtypeStruct((a.shape[0], 1), jnp.int32) for _ in range(3)
    ]
    best, second, idx = pl.pallas_call(
        functools.partial(_top2_kernel, n2=n2, tn=tn),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_T2M, W), lambda i: (i, 0)),
            pl.BlockSpec((b.shape[0], W), lambda i: (0, 0)),
            pl.BlockSpec((b.shape[0], 1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_T2M, 1), lambda i: (i, 0)) for _ in range(3)
        ],
        interpret=interpret,
    )(a, b, m2)
    return best[:n1, 0], second[:n1, 0], idx[:n1, 0]


def hamming_top2(d1: jnp.ndarray, d2: jnp.ndarray,
                 mask2: jnp.ndarray | None = None):
    """Fused Hamming + per-row top-2: (N1, W) x (N2, W) packed uint32 ->
    (best (N1,), second (N1,), idx (N1,)) int32 — the knnMatch(k=2) the
    ratio test needs (brute_force_matcher.cpp:176), without ever writing
    the (N1, N2) matrix to HBM. ``mask2`` invalidates reference rows
    (their distance becomes a large sentinel).

    Compiled TPU kernel on TPU backends, interpreter elsewhere.
    """
    if mask2 is None:
        mask2 = jnp.ones((d2.shape[0],), jnp.int32)
    interpret = jax.default_backend() != "tpu"
    return _run_top2(d1, d2, mask2, interpret)
