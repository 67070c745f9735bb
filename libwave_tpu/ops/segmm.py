"""Segmented reduce/broadcast as tiled one-hot matmuls (MXU path).

The Schur CG matvec's landmark-side crossings (optim/schur.py) are index
operations: a permutation gather into landmark-sorted order for the
reduce, and a ``y[lm_idx]`` gather for the broadcast. XLA lowers both to
HBM gathers at a measured ~1.9 ns/element on v5e — an op-issue-rate
floor, nowhere near the HBM roofline, and it neither vectorizes further
nor improves when solves are vmapped (the floor is per element, so
batched backends saturate; BENCH_r03's 1.7x at B=8).

These kernels replace the index ops with dense compute: the segment
indicator S[m, k] = (lm_idx[k] == m) is generated tile-by-tile in VMEM
(never materialized in HBM) and applied as a matmul —

    reduce:    out (C, M) = v (C, K) @ S^T
    broadcast: out (C, K) = y (C, M) @ S

Work is K*M compares + MACs instead of K gathered elements, so this wins
exactly in the small-M regime (the batched-window backend: M ~ 2k,
K ~ 12k slots per window) and loses for map-scale M — callers gate on M
(see optim.schur.use_onehot_segments). Unlike the log-shift scan path,
no landmark-sorted permutation or shift masks are needed: the bank is
consumed directly in pose-ELL order.

Off-TPU the kernels run in interpreter mode (tests); numerics are exact
f32 sums (0/1 masks, f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TK = 512  # observation slots per tile
_TM = 512  # landmark slots per tile


def _pad_axis(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _reduce_kernel(idx_ref, v_ref, out_ref, *, tm):
    # grid (num_m, num_k), k innermost: the (C, TM) output block stays
    # resident while partial sums accumulate over observation tiles.
    m, k = pl.program_id(0), pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[0, :]  # (TK,)
    rows = tm * m + jax.lax.broadcasted_iota(
        jnp.int32, (tm, idx.shape[0]), 0
    )
    mask = (rows == idx[None, :]).astype(v_ref.dtype)  # (TM, TK)
    out_ref[...] += jax.lax.dot_general(
        v_ref[...], mask,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def _seg_reduce(vals, idx, num_segments, interpret):
    C, K = vals.shape
    v = _pad_axis(vals, _TK, 1)
    ix = _pad_axis(
        idx.astype(jnp.int32)[None, :], _TK, 1
    )  # padded slots -> 0; they must carry zero vals (ELL padding does)
    Mp = num_segments + (-num_segments) % _TM
    grid = (Mp // _TM, v.shape[1] // _TK)
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, tm=_TM),
        out_shape=jax.ShapeDtypeStruct((C, Mp), vals.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TK), lambda m, k: (0, k)),
            pl.BlockSpec((C, _TK), lambda m, k: (0, k)),
        ],
        out_specs=pl.BlockSpec((C, _TM), lambda m, k: (0, m)),
        interpret=interpret,
    )(ix, v)
    return out[:, :num_segments]


def seg_reduce_onehot(vals: jnp.ndarray, idx: jnp.ndarray,
                      num_segments: int) -> jnp.ndarray:
    """(C, K) values + (K,) segment ids -> (C, M) per-segment sums via
    tiled one-hot matmuls. Padding slots must carry zero values (their
    id is free to point anywhere live)."""
    interpret = jax.default_backend() != "tpu"
    return _seg_reduce(vals, idx, num_segments, interpret)


def _broadcast_kernel(idx_ref, y_ref, out_ref, *, tm):
    # grid (num_k, num_m), m innermost: the (C, TK) output block stays
    # resident while the segment table streams through.
    k, m = pl.program_id(0), pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[0, :]  # (TK,)
    rows = tm * m + jax.lax.broadcasted_iota(
        jnp.int32, (tm, idx.shape[0]), 0
    )
    mask = (rows == idx[None, :]).astype(y_ref.dtype)  # (TM, TK)
    out_ref[...] += jax.lax.dot_general(
        y_ref[...], mask,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _seg_broadcast(y, idx, interpret):
    C, M = y.shape
    K = idx.shape[0]
    yp = _pad_axis(y, _TM, 1)
    ix = _pad_axis(idx.astype(jnp.int32)[None, :], _TK, 1)
    grid = (ix.shape[1] // _TK, yp.shape[1] // _TM)
    out = pl.pallas_call(
        functools.partial(_broadcast_kernel, tm=_TM),
        out_shape=jax.ShapeDtypeStruct((C, ix.shape[1]), y.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TK), lambda k, m: (0, k)),
            pl.BlockSpec((C, _TM), lambda k, m: (0, m)),
        ],
        out_specs=pl.BlockSpec((C, _TK), lambda k, m: (0, k)),
        interpret=interpret,
    )(ix, yp)
    return out[:, :K]


def seg_broadcast_onehot(y: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(C, M) per-segment values + (K,) segment ids -> (C, K) gathered
    view ``y[:, idx]`` via tiled one-hot matmuls (ids beyond M broadcast
    zeros)."""
    interpret = jax.default_backend() != "tpu"
    return _seg_broadcast(y, idx, interpret)
