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

Work is K*M compares + MACs instead of K gathered elements, so this is a
small-M-regime tool (the batched-window backend: M ~ 2k, K ~ 12k slots
per window) and loses for map-scale M. On-chip at those shapes the
standalone reduce/broadcast kernels TIE the isolated XLA gathers (both
~0.5-0.9 ms — a per-op latency floor, not bandwidth); the measured win
comes from the fused dense-Schur builder below, which restructures the
computation so the crossing happens once per LM iteration instead of
once per CG iteration. The standalone kernels ship as library
primitives. Unlike the log-shift scan path, no landmark-sorted
permutation or shift masks are needed: the bank is consumed directly in
pose-ELL order.

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


def on_tpu_backend() -> bool:
    """True when compute will actually land on a TPU: honors a
    ``jax.default_device`` override (a TPU-backend process timing a
    CPU-device denominator must NOT pick the TPU kernels)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", "tpu") == "tpu"
    return jax.default_backend() == "tpu"


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
    return _seg_reduce(vals, idx, num_segments, not on_tpu_backend())


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
    return _seg_broadcast(y, idx, not on_tpu_backend())


# ---------------------------------------------------------------------------
# Fused dense-Schur G/A builder.
#
# The dense reduced system (optim.schur.dense_reduced_system) needs the
# (N*Dj, 3M) scatter G of per-observation W blocks and A = G Hll^-1. The
# XLA scatter-add building G is the batched back-end's single biggest cost
# (measured 47 of 82 ms per LM iteration at B=32 on v5e); here each pose
# row of G is a (Pmax x TM) one-hot matmul on the MXU — pose-ELL rows
# scatter only into their own row, so the one-hot work is N*Pmax*M, tiny —
# and Hll^-1 is applied in-kernel, so A needs no second pass and the
# output layout (N, Dj, 3, M) makes G/A's 2D reshape transpose-free.
# ---------------------------------------------------------------------------

# symmetric-3x3 component index for (j, l), both triangles (schur._SYM3_AT)
_SYM3_AT = {
    (0, 0): 0, (0, 1): 1, (0, 2): 2,
    (1, 0): 1, (1, 1): 3, (1, 2): 4,
    (2, 0): 2, (2, 1): 4, (2, 2): 5,
}

_GTM = 1024  # landmark columns per program
_GPB = 8  # poses per program


def _g_a_kernel(idx_ref, w_ref, h_ref, g_ref, a_ref, *, tm, dj, pb):
    # Grid (NB, num_m), m innermost: the pose batch's W/idx blocks stay
    # resident while landmark tiles stream. Per pose: the one-hot tile is
    # built in VMEM and applied as one (C, Pmax) @ (Pmax, TM) MXU dot.
    # Poses whose slots touch no landmark in this tile skip the dot
    # entirely (data-dependent pl.when on a scalar reduce) — at map scale
    # the pose/landmark incidence is sparse and most (pose, tile) pairs
    # are empty, so the skip converts the kernel's K*M dense work back
    # into ~K*band work without any host-side tile bookkeeping.
    m = pl.program_id(1)
    base = tm * m
    h = h_ref[...]  # (6, TM) symmetric components
    for p in range(pb):
        idx = idx_ref[0, p]  # (Pmaxp,)
        hit = jnp.any((idx >= base) & (idx < base + tm))

        @pl.when(hit)
        def _(p=p, idx=idx):
            w = w_ref[0, p]  # (C = dj*3, Pmaxp)
            cols = base + jax.lax.broadcasted_iota(
                jnp.int32, (idx.shape[0], tm), 1
            )
            mask = (idx[:, None] == cols).astype(w.dtype)  # (Pmax, TM)
            # Precision keyed off the operand dtype, NOT the caller's
            # context: f32 operands need the full fp32 contract (a bf16
            # one-pass here rounds every G entry by ~4e-3, which the
            # downstream Hpp - S_sub cancellation amplifies into broken
            # LM steps — measured); bf16 storage mode wants plain bf16
            # MACs (the callers' f32_matmuls "highest" context would
            # request an fp32 contract on bf16 operands, which Mosaic
            # rejects). f32 accumulation in both cases.
            prec = (
                jax.lax.Precision.DEFAULT
                if w.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            )
            g = jnp.dot(
                w, mask, preferred_element_type=jnp.float32, precision=prec
            )
            g_ref[0, p] = g.astype(g_ref.dtype)
            # A[dj, l] = sum_j g[dj, j] * Hinv[j, l] per landmark column
            hf = h.astype(jnp.float32)
            rows = []
            for d in range(dj):
                for l in range(3):
                    rows.append(
                        sum(
                            g[d * 3 + j] * hf[_SYM3_AT[(j, l)]]
                            for j in range(3)
                        )
                    )
            a_ref[0, p] = jnp.stack(rows).astype(a_ref.dtype)

        @pl.when(jnp.logical_not(hit))
        def _(p=p):
            g_ref[0, p] = jnp.zeros_like(g_ref[0, p])
            a_ref[0, p] = jnp.zeros_like(a_ref[0, p])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dense_g_a(W, lm_slot, hinv, interpret):
    C, N, Pmax = W.shape
    dj = C // 3
    M = hinv.shape[1]
    pb = _GPB
    NB = -(-N // pb)
    Wp = jnp.moveaxis(_pad_axis(W, 128, 2), 1, 0)  # (N, C, Pmaxp)
    Wp = _pad_axis(Wp, pb * NB, 0).reshape(NB, pb, C, -1)
    # pose-padding rows get id -1 (never hits a tile -> skipped + zeroed);
    # slot padding keeps id 0 but W there is zero, so it contributes zeros
    ix = _pad_axis(lm_slot.astype(jnp.int32), 128, 1)
    if NB * pb != N:
        ix = jnp.concatenate(
            [ix, jnp.full((NB * pb - N, ix.shape[1]), -1, jnp.int32)]
        )
    ix = ix.reshape(NB, pb, -1)
    hp = _pad_axis(hinv.astype(W.dtype), _GTM, 1)
    Mp = hp.shape[1]
    grid = (NB, Mp // _GTM)
    g, a = pl.pallas_call(
        functools.partial(_g_a_kernel, tm=_GTM, dj=dj, pb=pb),
        out_shape=[
            jax.ShapeDtypeStruct((NB, pb, C, Mp), W.dtype) for _ in range(2)
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, pb, ix.shape[2]), lambda n, m: (n, 0, 0)),
            pl.BlockSpec((1, pb, C, Wp.shape[3]), lambda n, m: (n, 0, 0, 0)),
            pl.BlockSpec((6, _GTM), lambda n, m: (0, m)),
        ],
        out_specs=[
            pl.BlockSpec((1, pb, C, _GTM), lambda n, m: (n, 0, 0, m))
            for _ in range(2)
        ],
        interpret=interpret,
    )(ix, Wp, hp)
    g = g.reshape(NB * pb, C, Mp)
    a = a.reshape(NB * pb, C, Mp)
    return g[:N, :, :M], a[:N, :, :M]


def dense_g_a_onehot(W: jnp.ndarray, lm_slot: jnp.ndarray,
                     hinv: jnp.ndarray):
    """Fused dense-Schur G/A build: ``W`` (Dj*3, N, Pmax) pose-ELL blocks
    (component-major, padding slots zero), ``lm_slot`` (N, Pmax) landmark
    ids, ``hinv`` (6, M) inverted landmark blocks (symmetric components).

    ``lm_slot`` entries outside ``[0, M)`` contribute zeros (and skip
    compute) — chunked callers pass ``lm_slot - chunk_start`` with a
    ``hinv`` column slice to build G/A one landmark range at a time
    without ever materializing the full matrices.

    Returns ``(G, A)`` each (N, Dj*3, M) with rows ordered (dj, j) so that
    ``x.reshape(N, Dj, 3, M).reshape(N*Dj, 3*M)`` is the 2D operand of
    ``S_sub = A2 @ G2.T`` with no transpose."""
    return _dense_g_a(W, lm_slot, hinv, not on_tpu_backend())
