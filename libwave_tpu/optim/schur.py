"""Schur-complement elimination of landmarks + preconditioned CG.

Device-side analog of the reference's Ceres configuration — SPARSE_SCHUR with
the SCHUR_JACOBI preconditioner (wave_optimization/src/ceres/ba.cpp:49-52):

- landmark (point) blocks are eliminated with closed-form symmetric 3x3
  inverses;
- the reduced camera system ``S dx_p = b̃`` is solved *matrix-free*: each CG
  matvec is two sweeps over the observation bank (by landmark, then by
  pose) — O(K) work, no DNxDN matrix formed;
- the preconditioner is the block diagonal of S (SCHUR_JACOBI), computed in
  O(K) from the self-terms only.

TPU layout design (the perf decisions in this file, in order of impact):

1. **Component-major storage.** Per-observation block tensors like
   ``(K, 6, 3)`` are catastrophic on TPU — the trailing ``(6, 3)`` dims tile
   to ``(8, 128)`` registers, a ~57x HBM blowup. Everything per-observation
   is stored component-major (``W`` is ``(D*3, ...)``, residuals ``(2, ...)``,
   landmark blocks are 6 symmetric components ``(6, M)``) and the small
   block algebra is written out as fused elementwise VPU ops over K-wide
   lanes.

2. **Pose-ELL ("dense by pose") observation order.** XLA gathers cost
   ~2.5 ns/element on v5e — they dominate everything else here. Observations
   are packed rectangular, ``Pmax`` padded slots per pose (zero weight on
   padding), so the per-observation *pose-side* state gather becomes a free
   broadcast of ``(C, N, 1)`` over slots, and the pose-side segment
   reduction becomes a dense ``sum`` over the slot axis. This kills 4 of
   the 6 index operations per CG matvec.

3. **Log-shift segmented reduction on the landmark side.** The remaining
   per-landmark reduction runs over a precomputed landmark-sorted
   permutation: one (3, K) gather, then ceil(log2(Lmax)) masked
   shift-and-add passes (a segmented Hillis-Steele scan with static
   boundary masks), then one small gather at segment ends. Measured ~3x
   faster than gather-table (ELL) reductions, and exact (tree-order sums).

All shapes are static; CG runs a fixed iteration count under ``lax.scan``
with convergence masking, so the whole solve jits and shards. When the
observation bank is sharded across devices (libwave_tpu.parallel), the flat
segment-sum fallback path is used instead and its partial sums psum over
the mesh. Pose blocks are D-dimensional (6 for pure BA, 15 for VIO's
pose+vel+bias states).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as onp


class EllLayout(NamedTuple):
    """Static index machinery for the pose-ELL observation order.

    Built host-side by :func:`pack_observations`. All fields are arrays so
    the layout can ride inside jit-traced problem pytrees; static quantities
    (number of shift passes, Pmax) are encoded in shapes.
    """

    sigma: jnp.ndarray  # (K,) permutation: ELL-flat order -> landmark-sorted
    shift_masks: jnp.ndarray  # (S, K) 1.0 where slot k-2^s is same landmark
    seg_last: jnp.ndarray  # (M,) landmark-sorted position of each lm's last obs
    has_obs: jnp.ndarray  # (M,) 1.0 for landmarks with >= 1 observation


def pack_observations(pose_idx, lm_idx, num_poses, num_landmarks, *arrays,
                      min_pmax=1):
    """Host-side: reorder + pad an observation bank into pose-ELL order.

    Pads each pose's observations to the common Pmax (rectangular bank,
    ``K_ell = num_poses * Pmax``); padding rows MUST be masked by the caller
    with zero weights — the returned ``pad_mask`` is 1.0 on real rows.
    ``arrays`` are per-observation arrays (K, ...) to reorder+pad with zeros.

    Returns ``(pose_idx, lm_idx, pad_mask, ell_layout, *packed_arrays)``.
    """
    pose_idx = onp.asarray(pose_idx)
    lm_idx = onp.asarray(lm_idx)
    counts = onp.bincount(pose_idx, minlength=num_poses)
    Pmax = max(int(counts.max()), min_pmax)
    K_ell = num_poses * Pmax

    # slot index of every original observation
    order = onp.argsort(pose_idx, kind="stable")
    slot = onp.full(K_ell, -1, dtype=onp.int64)  # -> original obs or -1
    write = 0
    pos = 0
    for n in range(num_poses):
        c = int(counts[n])
        slot[n * Pmax:n * Pmax + c] = order[pos:pos + c]
        pos += c
    pad_mask = (slot >= 0).astype(onp.float64)
    safe = onp.where(slot >= 0, slot, 0)

    if lm_idx.shape[0] == 0:  # empty bank (e.g. an observation-free shard)
        lm_ell = onp.zeros(K_ell, dtype=onp.int32)
    else:
        lm_ell = onp.where(slot >= 0, lm_idx[safe], 0).astype(onp.int32)
    pose_ell = onp.repeat(onp.arange(num_poses, dtype=onp.int32), Pmax)

    packed = []
    for a in arrays:
        a = onp.asarray(a)
        if a.shape[0] == 0:
            out = onp.zeros((K_ell,) + a.shape[1:], dtype=a.dtype)
        else:
            out = a[safe] * pad_mask.reshape(
                (K_ell,) + (1,) * (a.ndim - 1)
            ).astype(a.dtype)
        packed.append(jnp.asarray(out))

    ell = build_ell_layout(lm_ell, num_landmarks)
    return (
        jnp.asarray(pose_ell),
        jnp.asarray(lm_ell),
        jnp.asarray(pad_mask),
        ell,
        *packed,
    )


def build_ell_layout(lm_idx, num_landmarks) -> EllLayout:
    """Host-side landmark-reduction machinery for a (rectangular,
    pose-ordered) observation bank: the landmark-sorted permutation, the
    per-shift same-segment masks, and segment-end positions."""
    lm_idx = onp.asarray(lm_idx)
    K = lm_idx.shape[0]
    sigma = onp.argsort(lm_idx, kind="stable").astype(onp.int32)
    ids = lm_idx[sigma]
    counts = onp.bincount(lm_idx, minlength=num_landmarks)
    max_run = max(int(counts.max()), 1)
    S = max(int(onp.ceil(onp.log2(max_run))), 1) if max_run > 1 else 0

    masks = onp.zeros((max(S, 1), K), dtype=onp.float32)
    for s in range(S):
        d = 1 << s
        masks[s, d:] = (ids[d:] == ids[:-d]).astype(onp.float32)
    if S == 0:
        masks = masks[:0]

    last = onp.full(num_landmarks, 0, dtype=onp.int64)
    has = onp.zeros(num_landmarks, dtype=onp.float32)
    for pos, m in enumerate(ids):
        last[m] = pos
        has[m] = 1.0
    return EllLayout(
        sigma=jnp.asarray(sigma),
        shift_masks=jnp.asarray(masks),
        seg_last=jnp.asarray(last.astype(onp.int32)),
        has_obs=jnp.asarray(has),
    )


import dataclasses as _dataclasses


@jax.tree_util.register_static
@_dataclasses.dataclass(frozen=True)
class BandPlan:
    """Static covisibility-band metadata for the explicit-S build.

    ``entries`` is a tuple of ``(c0, c1, ((plo, phi), ...))``: landmark
    column range [c0, c1) is observed only by poses inside the listed
    contiguous ranges. Registered static (hashable aux data, no array
    leaves), so it rides inside a jitted problem pytree and the banded
    build unrolls at trace time with static slices. Built host-side by
    :func:`compute_band_plan`; only meaningful when landmark ids carry
    trajectory locality (any real mapper's creation order).
    """

    entries: tuple


def compute_band_plan(lm_ell, pad_mask, num_poses: int, num_landmarks: int,
                      chunk_cols: int = 1024, max_ranges: int = 4,
                      gap_tol: int = 4) -> BandPlan:
    """Host-side: partition landmark columns into ``chunk_cols``-wide
    ranges and record, per range, the contiguous pose runs that observe
    it. The explicit-S build then contracts only (pose-run x column-range)
    blocks — the TPU-dense form of the sparse Schur structure every SLAM
    covisibility graph has. Runs separated by <= ``gap_tol`` poses merge
    (a few zero rows beat another matmul dispatch); if more than
    ``max_ranges`` runs remain, the smallest gaps merge first. With no
    locality this degenerates to one full-range entry per chunk — exactly
    the plain chunked build, never worse."""
    lm = onp.asarray(lm_ell).reshape(num_poses, -1)
    valid = onp.asarray(pad_mask).reshape(num_poses, -1) > 0
    entries = []
    for c0 in range(0, num_landmarks, chunk_cols):
        c1 = min(c0 + chunk_cols, num_landmarks)
        hits = ((lm >= c0) & (lm < c1) & valid).any(axis=1)
        poses = onp.nonzero(hits)[0]
        if poses.size == 0:
            continue
        # contiguous runs with gap merging
        breaks = onp.nonzero(onp.diff(poses) > gap_tol + 1)[0]
        runs = []
        start = 0
        for b in breaks:
            runs.append((int(poses[start]), int(poses[b]) + 1))
            start = b + 1
        runs.append((int(poses[start]), int(poses[-1]) + 1))
        while len(runs) > max_ranges:
            gaps = [runs[i + 1][0] - runs[i][1] for i in range(len(runs) - 1)]
            i = int(onp.argmin(gaps))
            runs[i] = (runs[i][0], runs[i + 1][1])
            del runs[i + 1]
        entries.append((c0, c1, tuple(runs)))
    return BandPlan(entries=tuple(entries))


def ell_seg_reduce(vals, ell: EllLayout):
    """Per-landmark sums of ``vals`` (C, K) given the precomputed layout:
    gather into landmark-sorted order, segmented Hillis-Steele up-sweep with
    static boundary masks, then read each segment's inclusive total at its
    end position. Exact (pure adds), ~3x faster than gather-table reduces.
    Returns (C, M)."""
    v = jnp.take(vals, ell.sigma, axis=-1)
    for s in range(ell.shift_masks.shape[0]):
        d = 1 << s
        shifted = jnp.pad(v, ((0, 0), (d, 0)))[:, :-d]
        v = v + shifted * ell.shift_masks[s]
    out = jnp.take(v, ell.seg_last, axis=-1)
    return out * ell.has_obs


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / determinant) for
    block-layout ``(..., 3, 3)`` inputs. Pure VPU elementwise math."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


# Symmetric-3x3 component order: [00, 01, 02, 11, 12, 22].
_SYM3 = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
_SYM3_AT = {  # (i, j) -> component index, both triangles
    (0, 0): 0, (0, 1): 1, (0, 2): 2,
    (1, 0): 1, (1, 1): 3, (1, 2): 4,
    (2, 0): 2, (2, 1): 4, (2, 2): 5,
}


def sym3_inv(s):
    """Inverse of symmetric 3x3 in component form: s, out are (6, ...)."""
    a, b, c, d, e, f = s[0], s[1], s[2], s[3], s[4], s[5]
    A11 = d * f - e * e
    A12 = c * e - b * f
    A13 = b * e - c * d
    A22 = a * f - c * c
    A23 = b * c - a * e
    A33 = a * d - b * b
    det = a * A11 + b * A12 + c * A13
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    return jnp.stack([A11, A12, A13, A22, A23, A33]) * inv_det


def sym3_matvec(s, v):
    """y = S v for symmetric components s (6, ...) and v (3, ...)."""
    return jnp.stack(
        [
            s[0] * v[0] + s[1] * v[1] + s[2] * v[2],
            s[1] * v[0] + s[3] * v[1] + s[4] * v[2],
            s[2] * v[0] + s[4] * v[1] + s[5] * v[2],
        ]
    )


def cho_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD inverse via Cholesky triangular solves (for the (N, D, D)
    preconditioner blocks — avoids general LU pivoting)."""
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True
    )
    return jnp.swapaxes(Linv, -1, -2) @ Linv


def _tri_indices(D):
    """Upper-triangle (i, j) pairs for a DxD symmetric block."""
    return [(i, j) for i in range(D) for j in range(i, D)]


def _assemble_sym(comps, D):
    """(T, N) upper-triangle components -> (N, D, D) symmetric blocks."""
    rows = [[None] * D for _ in range(D)]
    for c, (i, j) in zip(comps, _tri_indices(D)):
        rows[i][j] = c
        rows[j][i] = c
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )  # (N, D, D)


def _embed_block(H, D):
    """Zero-pad (N, Dj, Dj) blocks into the top-left of (N, D, D)."""
    Dj = H.shape[-1]
    if Dj == D:
        return H
    return jnp.pad(H, ((0, 0), (0, D - Dj), (0, D - Dj)))


def _pad_cols(x, D):
    """Zero-pad (N, Dj) tangent data up to (N, D)."""
    if x.shape[-1] == D:
        return x
    return jnp.pad(x, ((0, 0), (0, D - x.shape[-1])))


class SchurBlocks(NamedTuple):
    """Normal-equation blocks for a BA-structured problem (component-major).

    Two observation layouts share this container, distinguished by
    ``W.ndim``:
    - pose-ELL (fast, single device): W is (D*3, N, Pmax), ``ell`` holds the
      landmark-reduction machinery, pose reductions are dense sums;
    - flat (sharded path): W is (D*3, K), reductions are segment-sums over
      ``pose_idx`` / sorted ``lm_idx`` whose partials psum over the mesh.

    ``C/ci/cj`` hold pose-pose off-diagonal couplings from pose-graph factors
    (odometry between-factors): H[ci, cj] += C, H[cj, ci] += C^T. They ride
    along in the matrix-free Schur matvec; ``None``-like empty banks are
    zero-length arrays.

    **Sharded ELL mode** (``axis_name`` set, requires ``ell``): the blocks
    were built inside ``shard_map`` from a per-device observation bank
    covering a contiguous block of ``N / axis_size`` poses (W is
    (D*3, Nb, Pmax), lm_idx is the local bank), while Hpp/bp/bl/Hll_inv and
    all CG vectors are global-shaped and replicated. Landmark-side
    reductions psum partials over the mesh; pose-side reductions all_gather
    the local block — the distributed-matvec pattern of SURVEY.md §5.7.
    """

    Hpp: jnp.ndarray  # (N, D, D) pose diagonal blocks (damped)
    Hll_inv: jnp.ndarray  # (6, M) inverted landmark blocks, sym components
    W: jnp.ndarray  # (D*3, N, Pmax) [ELL] or (D*3, K) [flat]
    bp: jnp.ndarray  # (N, D)
    bl: jnp.ndarray  # (3, M)
    pose_idx: jnp.ndarray  # (K,) — non-decreasing (obs sorted by pose)
    lm_idx: jnp.ndarray  # (K,)
    lm_perm: jnp.ndarray  # (K,) permutation sorting obs by landmark (flat)
    lm_sorted: jnp.ndarray  # (K,) lm_idx[lm_perm] (flat)
    free_pose: jnp.ndarray  # (N,) or (N, D): 1.0 free, 0.0 gauge-fixed
    ell: object  # EllLayout | None
    C: jnp.ndarray  # (F, D, D) pose-pose cross blocks
    ci: jnp.ndarray  # (F,)
    cj: jnp.ndarray  # (F,)
    axis_name: object = None  # str | None — mesh axis for sharded ELL mode


def _seg_lm(blocks: SchurBlocks, vals):
    """Reduce (C, K)/(C, N, Pmax) by landmark into (C, M). Sharded ELL:
    each device reduces its local bank, partials psum over the mesh."""
    C = vals.shape[0]
    flat = vals.reshape(C, -1)
    if blocks.ell is not None:
        out = ell_seg_reduce(flat, blocks.ell)
        if blocks.axis_name is not None:
            out = jax.lax.psum(out, blocks.axis_name)
        return out
    return jax.vmap(
        lambda v: jax.ops.segment_sum(
            v[blocks.lm_perm], blocks.lm_sorted,
            num_segments=blocks.bl.shape[-1], indices_are_sorted=True,
        )
    )(flat)


def _seg_pose(blocks: SchurBlocks, vals):
    """Reduce by pose into (C, N): dense slot sum (ELL) or segment-sum.
    Sharded ELL: the local (C, Nb) block all_gathers into (C, N)."""
    if blocks.ell is not None:
        out = jnp.sum(vals, axis=-1)  # (C, Nb, Pmax) -> (C, Nb)
        if blocks.axis_name is not None:
            out = jax.lax.all_gather(
                out, blocks.axis_name, axis=1, tiled=True
            )
        return out
    return jax.vmap(
        lambda v: jax.ops.segment_sum(
            v, blocks.pose_idx, num_segments=blocks.bp.shape[0],
            indices_are_sorted=True,
        )
    )(vals)


def build_normal_equations(
    r, J_pose, J_lm, weights, pose_idx, lm_idx, num_poses, num_landmarks,
    damping, free_pose,
    extra_Hpp=None, extra_bp=None, couplings=None,
    ell: EllLayout | None = None, pose_dim: int | None = None,
    axis_name: str | None = None, sum_dtype=None,
) -> SchurBlocks:
    """Assemble damped normal-equation blocks from a linearized observation
    bank (the TPU analog of sparse assembly).

    Accepts three input layouts:
      - pose-ELL component-major (fast path; requires ``ell``): r (2, N,
        Pmax), J_pose (2, D, N, Pmax), J_lm (2, 3, N, Pmax), weights
        (N, Pmax);
      - flat component-major: r (2, K), J_pose (2, D, K), J_lm (2, 3, K);
      - flat block layout (converted): r (K, 2), J_pose (K, 2, D),
        J_lm (K, 2, 3).

    ``weights`` fold in validity masks, padding masks and robust-loss
    weights. ``damping`` is the LM lambda; diagonals are damped
    multiplicatively (Marquardt scaling) with an additive floor for rank
    safety.

    ``pose_dim``: full tangent dimension D of the pose blocks when the
    observation Jacobian only touches the first ``J_pose.shape[1]`` of them
    (VIO: reprojection touches [omega, dp] = 6 of the 15-dim keyframe
    blocks). The untouched rows/cols are *structural* zeros — skipped in
    Python, never materialized.

    Flat-path TPU note: ``pose_idx`` must be non-decreasing (observations
    emitted in pose order — all problem builders do this); landmark-side
    reductions go through a sort permutation computed here. Sorted
    segment-sums lower to fast vectorized reductions instead of serialized
    scatter-adds (~6x measured on v5e).

    ``axis_name`` (requires ``ell``, call inside shard_map): the inputs are a
    per-device bank covering a contiguous block of ``num_poses / axis_size``
    poses. Pose-side sums all_gather into global (num_poses, ...) blocks,
    landmark-side sums psum; ``extra_Hpp``/``extra_bp``/``couplings`` and
    ``free_pose`` must be global-shaped and replicated (pose-graph factors
    are evaluated redundantly on every device — they are tiny next to the
    observation bank).

    ``sum_dtype`` (mixed-precision stiff-Hessian path, dense solver only):
    cast the pose-block sums ``Hpp``/``bp``/``C`` to this dtype (float64)
    BEFORE folding in ``extra_Hpp``/``extra_bp``. Rationale: on stiff VIO
    chains the IMU contributions are ~7e8 while vision information is
    ~1e2 — co-located f32 entries annihilate the vision term entirely
    (1e2/7e8 < f32 eps) and 20 Hz keyframe windows silently diverge on
    chip while CPU f64 is fine (the round-4 "information capping"
    workaround). Each individual f32 block carries full relative
    precision, so summing in f64 and factorizing in f64
    (:func:`dense_schur_solve`) restores f64-parity while the flop-heavy
    linearization and the G/A MXU matmuls stay f32. Requires
    ``utils.precision.allow_explicit_f64()`` (called at import by optim
    modules). The matrix-free PCG path ignores the wide blocks' extra
    precision — use with the dense solver.
    """
    if axis_name is not None and ell is None:
        raise ValueError("axis_name requires the pose-ELL layout")
    K = pose_idx.shape[0]
    if r.ndim == 2 and r.shape[0] == K and J_pose.shape[0] == K:
        # block layout -> flat component-major
        r = r.T  # (2, K)
        J_pose = jnp.moveaxis(J_pose, 0, -1)  # (2, Dj, K)
        J_lm = jnp.moveaxis(J_lm, 0, -1)  # (2, 3, K)
    Dj = J_pose.shape[1]  # tangent dims touched by observations
    D = pose_dim if pose_dim is not None else Dj
    dtype = r.dtype

    if ell is None:
        lm_perm = jnp.argsort(lm_idx)
        lm_sorted = lm_idx[lm_perm]
    else:
        lm_perm = lm_idx  # unused on the ELL path; keep pytree shape stable
        lm_sorted = lm_idx

    w = weights  # (..., K) or (N, Pmax)
    wJp = J_pose * w  # (2, Dj, ...)

    # W[i*3+j] = sum_a Jp[a, i] w Jl[a, j]  (only the Dj touched rows)
    W = jnp.stack(
        [
            wJp[0, i] * J_lm[0, j] + wJp[1, i] * J_lm[1, j]
            for i in range(Dj)
            for j in range(3)
        ]
    )  # (Dj*3, ...)

    tri_p = _tri_indices(Dj)
    Hpp_k = jnp.stack(
        [wJp[0, i] * J_pose[0, j] + wJp[1, i] * J_pose[1, j] for i, j in tri_p]
    )
    Hll_k = jnp.stack(
        [
            w * (J_lm[0, i] * J_lm[0, j] + J_lm[1, i] * J_lm[1, j])
            for i, j in _SYM3
        ]
    )
    bp_k = -(wJp[0] * r[0] + wJp[1] * r[1])  # (Dj, ...)
    wJl = J_lm * w
    bl_k = -(wJl[0] * r[0] + wJl[1] * r[1])  # (3, ...)

    if ell is not None:
        # Inputs may be pose-ELL shaped (C, Nb, Pmax) or flat (C, K) in ELL
        # order; reshaping is free (the bank is rectangular by construction).
        nb = (
            num_poses if axis_name is None
            else num_poses // jax.lax.axis_size(axis_name)
        )

        def seg_pose(vals):
            out = jnp.sum(vals.reshape(vals.shape[0], nb, -1), axis=-1)
            if axis_name is not None:
                out = jax.lax.all_gather(out, axis_name, axis=1, tiled=True)
            return out

        def seg_lm(vals):
            out = ell_seg_reduce(vals.reshape(vals.shape[0], -1), ell)
            if axis_name is not None:
                out = jax.lax.psum(out, axis_name)
            return out
    else:
        seg_pose = lambda vals: jax.vmap(
            lambda v: jax.ops.segment_sum(
                v, pose_idx, num_segments=num_poses, indices_are_sorted=True
            )
        )(vals)
        seg_lm = lambda vals: jax.vmap(
            lambda v: jax.ops.segment_sum(
                v[lm_perm], lm_sorted, num_segments=num_landmarks,
                indices_are_sorted=True,
            )
        )(vals)

    Hpp = _embed_block(_assemble_sym(seg_pose(Hpp_k), Dj), D)  # (N, D, D)
    Hll = seg_lm(Hll_k)  # (6, M)
    bp = _pad_cols(seg_pose(bp_k).T, D)  # (N, D)
    bl = seg_lm(bl_k)  # (3, M)

    if ell is not None:
        W = W.reshape(Dj * 3, nb, -1)  # matvec broadcasting layout

    # fold in pose-graph factor contributions (diagonal + rhs); under
    # sum_dtype the summation happens in the wide dtype (see docstring)
    if sum_dtype is not None:
        Hpp = Hpp.astype(sum_dtype)
        bp = bp.astype(sum_dtype)
    if extra_Hpp is not None:
        Hpp = Hpp + extra_Hpp.astype(Hpp.dtype)
    if extra_bp is not None:
        bp = bp + extra_bp.astype(bp.dtype)

    # Additive damping floor: must sit well above the dtype's cancellation
    # noise or degenerate blocks (unobserved landmarks) make the Schur
    # complement numerically indefinite and Cholesky NaNs out.
    floor = 1e-6 if dtype == jnp.float32 else 1e-10

    # Marquardt scaling on pose blocks: diag *= (1 + lambda) + floor.
    eye = jnp.eye(D, dtype=Hpp.dtype)
    diag = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp = Hpp + eye * (damping * diag + floor)[..., None, :]

    # Same damping on the landmark blocks, in component form (diagonal
    # components are 0, 3, 5).
    diag_ix = jnp.asarray([0, 3, 5])
    Hll = Hll.at[diag_ix].add(damping * Hll[diag_ix] + floor)
    Hll_inv = sym3_inv(Hll)

    if couplings is None:
        C = jnp.zeros((0, D, D), dtype=Hpp.dtype)
        ci = jnp.zeros((0,), dtype=jnp.int32)
        cj = jnp.zeros((0,), dtype=jnp.int32)
    else:
        C, ci, cj = couplings
        C = C.astype(Hpp.dtype)
    return SchurBlocks(
        Hpp=Hpp, Hll_inv=Hll_inv, W=W, bp=bp, bl=bl,
        pose_idx=pose_idx, lm_idx=lm_idx, lm_perm=lm_perm,
        lm_sorted=lm_sorted, free_pose=free_pose, ell=ell,
        C=C, ci=ci, cj=cj, axis_name=axis_name,
    )


def _project(x, free_pose):
    """Zero out gauge-fixed coordinates (Ceres SetParameterBlockConstant,
    ba_test.cpp:156-161). ``free_pose`` is (N,) to fix whole blocks, or
    (N, D) to fix individual tangent columns (e.g. freeze only the pose part
    of a combined VIO state, leaving velocity/bias free)."""
    if free_pose.ndim == 1:
        return x * free_pose[:, None]
    return x * free_pose


def local_pose_block(x, num_poses: int, axis_name: str | None):
    """(x_local, nb): this device's contiguous pose block of replicated
    (N, ...) data under sharded ELL mode; identity when axis_name is None."""
    if axis_name is None:
        return x, num_poses
    nb = num_poses // jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(x, me * nb, nb, axis=0), nb


def _broadcast_pose(blocks: SchurBlocks, x):
    """Per-observation view of per-pose data x (N, D): a free broadcast
    (D, N, 1) on the ELL path, a gather on the flat path. Sharded ELL:
    slice the device's contiguous pose block out of the replicated x."""
    if blocks.ell is not None:
        if blocks.axis_name is not None:
            nb = blocks.W.shape[1]
            me = jax.lax.axis_index(blocks.axis_name)
            x = jax.lax.dynamic_slice_in_dim(x, me * nb, nb, axis=0)
        return x.T[:, :, None]  # (D, Nb, 1) broadcasts over Pmax
    return jnp.take(x.T, blocks.pose_idx, axis=-1)  # (D, K)


def _gather_lm(blocks: SchurBlocks, y):
    """Per-observation view of per-landmark data y (3, M)."""
    yk = jnp.take(y, blocks.lm_idx, axis=-1)  # (3, K)
    if blocks.ell is not None:
        return yk.reshape((3,) + blocks.W.shape[1:])  # (3, N, Pmax)
    return yk


def _w_t_apply(W, xk):
    """utx[j] = sum_i W[i*3+j] xk[i] over the Dj observation-touched rows."""
    Dj = W.shape[0] // 3
    return jnp.stack(
        [sum(W[i * 3 + j] * xk[i] for i in range(Dj)) for j in range(3)]
    )


def _w_apply(W, yk):
    """uy[i] = sum_j W[i*3+j] yk[j] -> (Dj, ...)."""
    Dj = W.shape[0] // 3
    return jnp.stack(
        [sum(W[i * 3 + j] * yk[j] for j in range(3)) for i in range(Dj)]
    )


def schur_matvec(blocks: SchurBlocks, x: jnp.ndarray) -> jnp.ndarray:
    """S x = Hpp x - U Hll^-1 U^T x, matrix-free. x: (N, D) -> (N, D)."""
    D = blocks.bp.shape[1]
    x = _project(x, blocks.free_pose)
    # Hpp x — N is small, keep block layout
    out = jnp.einsum("nij,nj->ni", blocks.Hpp, x)
    # U^T x: per observation W_k^T x[pose_k], summed by landmark
    xk = _broadcast_pose(blocks, x)
    utx = _seg_lm(blocks, _w_t_apply(blocks.W, xk))  # (3, M)
    y = sym3_matvec(blocks.Hll_inv, utx)  # (3, M)
    # U y: per observation W_k y[lm_k], summed by pose
    yk = _gather_lm(blocks, y)
    uy = _seg_pose(blocks, _w_apply(blocks.W, yk))  # (Dj, N)
    out = out - _pad_cols(uy.T, D)
    # pose-pose couplings from pose-graph factors
    if blocks.C.shape[0] > 0:
        cx_j = jnp.einsum("fij,fj->fi", blocks.C, x[blocks.cj])  # (F, D)
        cx_i = jnp.einsum("fji,fj->fi", blocks.C, x[blocks.ci])  # C^T x_i
        out = out + jax.ops.segment_sum(
            cx_j, blocks.ci, num_segments=x.shape[0]
        )
        out = out + jax.ops.segment_sum(
            cx_i, blocks.cj, num_segments=x.shape[0]
        )
    return _project(out, blocks.free_pose)


def schur_rhs(blocks: SchurBlocks) -> jnp.ndarray:
    """b̃ = bp - U Hll^-1 bl."""
    D = blocks.bp.shape[1]
    y = sym3_matvec(blocks.Hll_inv, blocks.bl)  # (3, M)
    yk = _gather_lm(blocks, y)
    uy = _seg_pose(blocks, _w_apply(blocks.W, yk))  # (Dj, N)
    return _project(blocks.bp - _pad_cols(uy.T, D), blocks.free_pose)


def _schur_self_blocks(blocks: SchurBlocks) -> jnp.ndarray:
    """Exact per-pose self terms ``sum_k W_k Hll_inv[lm_k] W_k^T`` as
    (N, Dj, Dj) blocks — one f32 VPU sweep over the observation bank.
    Shared by the SCHUR_JACOBI preconditioner and the bf16 explicit-S
    build (which overwrites its diagonal with these: the ``Hpp - sub``
    diagonal cancellation amplifies bf16 storage error catastrophically,
    while off-diagonal blocks subtract from ~zero and tolerate it)."""
    W = blocks.W
    Dj = W.shape[0] // 3
    hk = jnp.take(blocks.Hll_inv, blocks.lm_idx, axis=-1)  # (6, K)
    if blocks.ell is not None:
        hk = hk.reshape((6,) + W.shape[1:])
    # T[i, l] = sum_j W[i, j] Hinv[j, l]
    T = [
        [
            sum(W[i * 3 + j] * hk[_SYM3_AT[(j, l)]] for j in range(3))
            for l in range(3)
        ]
        for i in range(Dj)
    ]
    # self[i, i'] = sum_l T[i, l] W[i', l]
    self_k = jnp.stack(
        [
            sum(T[i][l] * W[i2 * 3 + l] for l in range(3))
            for i, i2 in _tri_indices(Dj)
        ]
    )
    return _assemble_sym(_seg_pose(blocks, self_k), Dj)  # (N, Dj, Dj)


def schur_jacobi_preconditioner(blocks: SchurBlocks) -> jnp.ndarray:
    """Inverted block diagonal of S (the SCHUR_JACOBI preconditioner):
    P_i = (Hpp_i - sum_k W_k Hll_inv[lm_k] W_k^T)^{-1}, self-terms only."""
    D = blocks.bp.shape[1]
    sub = _embed_block(_schur_self_blocks(blocks), D)  # (N, D, D)
    S_diag = blocks.Hpp - sub
    # Gauge-fixed coordinates get identity rows/cols so CG stays
    # well-defined on their (projected-out) subspace.
    eye = jnp.eye(D, dtype=S_diag.dtype)
    if blocks.free_pose.ndim == 1:
        m = jnp.broadcast_to(blocks.free_pose[:, None], S_diag.shape[:2])
    else:
        m = blocks.free_pose
    S_diag = m[:, :, None] * S_diag * m[:, None, :]
    S_diag = S_diag + eye * (1.0 - m)[..., None, :] * eye
    # small diagonal lift for safety
    S_diag = S_diag + 1e-10 * eye
    return cho_inverse(S_diag)


def _sym3_full(s):
    """(6, M) symmetric components -> (M, 3, 3) full blocks."""
    M = s.shape[-1]
    out = jnp.stack(
        [
            jnp.stack([s[0], s[1], s[2]], axis=-1),
            jnp.stack([s[1], s[3], s[4]], axis=-1),
            jnp.stack([s[2], s[4], s[5]], axis=-1),
        ],
        axis=-2,
    )
    return out  # (M, 3, 3)


def dense_reduced_system(blocks: SchurBlocks,
                         max_g_bytes: float | None = None,
                         op_dtype=None, bands: BandPlan | None = None,
                         _force_path: str | None = None) -> jnp.ndarray:
    """Materialize the reduced camera matrix S = Hpp - U Hll^-1 U^T plus
    pose-pose couplings as one dense (N, D, N, D) tensor.

    U rides in a dense (N*Dj, 3M) scatter G; the subtraction is a single
    MXU matmul A @ G^T with A = G Hll^-1. No gauge projection is applied —
    :func:`dense_schur_solve` adds it for solving, while marginalization
    callers (pipelines.windowed_vio/_ba) consume the raw system.

    Memory: G is itemsize*N*Dj*3M bytes. When ``max_g_bytes`` is set and
    the full G would exceed it, the build runs CHUNKED over landmark
    column ranges (kernel path only): per chunk the one-hot builder emits
    G/A slices (ids outside the chunk skip compute and contribute zeros)
    and ``S_sub += A_c @ G_c^T`` accumulates — S (quadratic in N*D only)
    is the sole persistent buffer, so map-scale M never materializes a
    multi-GB G. Without the cap the auto solver switch (optim.ba) gates
    on the full-G footprint.

    ``op_dtype`` (explicit-PCG operator mode, kernel path only): run the
    G/A build and the A @ G^T contraction in this storage dtype
    (bfloat16) with f32 MXU accumulation. ONLY valid when S is consumed
    as a CG *operator* (optim.ba explicit_s): CG computes its residuals
    against the same perturbed S̃, so it exactly solves (S+E) dx = b̃ — a
    slightly-rotated Gauss-Newton step whose quality LM's cost-based
    acceptance already polices, and whose fixed point (dx -> 0 as b̃ ->
    0) is unchanged. rhs/back-substitution/cost all stay f32. NOT for
    dense_schur_solve factorizations or marginalization, where S's
    entries are the product.

    ``bands`` (kernel path only): a static :class:`BandPlan`. The build
    then contracts only (pose-run x landmark-column-range) blocks — each
    range's G/A slices cover just the poses that observe it, the partial
    products accumulate into static squares of S_sub, and cross blocks
    between the (<= max_ranges) pose runs of one column range are added
    explicitly with their transposes. Exact for any plan produced by
    :func:`compute_band_plan`; work drops from K*M one-hot + (ND)^2*3M
    contraction to the covisibility band's share of both.

    ``_force_path`` ("kernel" | "xla", tests only) overrides the backend
    gate so the kernel-path code (banded/chunked builds) is exercised on
    CPU via the interpret-mode kernel."""
    if blocks.axis_name is not None:
        raise ValueError("dense_reduced_system is single-device only")
    D = blocks.bp.shape[1]
    N = blocks.Hpp.shape[0]
    M = blocks.bl.shape[-1]
    Dj = blocks.W.shape[0] // 3
    # S inherits the (possibly widened, see build_normal_equations
    # sum_dtype) pose-block dtype; the G/A matmuls stay in the observation
    # bank's dtype (f32 on the MXU) — their entries are vision-scale and
    # individually precise, only the summation needs the headroom.
    dtype = blocks.bp.dtype
    wdtype = blocks.W.dtype

    # per-observation W blocks -> dense G. On TPU with the pose-ELL
    # layout, the XLA scatter-add building G is the batched back-end's
    # dominant cost (47 of 82 ms per LM iteration at B=32 on v5e); the
    # fused one-hot-matmul kernel builds G AND A = G Hll^-1 on the MXU
    # instead (each pose row scatters only into itself, so the one-hot
    # work is N*Pmax*M).
    from libwave_tpu.ops.segmm import dense_g_a_onehot, on_tpu_backend

    use_kernel = blocks.ell is not None and (
        _force_path == "kernel"
        or (_force_path is None and on_tpu_backend())
    )
    if use_kernel:

        Pmax = blocks.W.shape[2]
        lm_slot = blocks.lm_idx.reshape(N, Pmax)
        Wop = blocks.W if op_dtype is None else blocks.W.astype(op_dtype)
        Hop = (
            blocks.Hll_inv if op_dtype is None
            else blocks.Hll_inv.astype(op_dtype)
        )
        # A @ G.T with f32 accumulation regardless of storage dtype. bf16
        # operands need explicit DEFAULT precision (the f32_matmuls
        # "highest" context would request an fp32 contract on them); f32
        # operands pin HIGHEST explicitly so correctness never depends on
        # the caller having entered f32_matmuls.
        mm_prec = (
            jax.lax.Precision.DEFAULT if op_dtype is not None
            else jax.lax.Precision.HIGHEST
        )
        mm = lambda a, g: jax.lax.dot_general(
            a, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )
        g_bytes = jnp.dtype(wdtype).itemsize * N * Dj * 3 * M
        if bands is not None:
            # covisibility-banded build: per landmark-column range, G/A
            # slices over just its observing pose runs; static-slice
            # accumulation into S_sub (squares + cross blocks)
            S_sub = jnp.zeros((N * Dj, N * Dj), jnp.float32)
            for (c0, c1, ranges) in bands.entries:
                Hc = Hop[:, c0:c1]
                ga = []
                for (plo, phi) in ranges:
                    g3, a3 = dense_g_a_onehot(
                        Wop[:, plo:phi], lm_slot[plo:phi] - c0, Hc
                    )
                    R = phi - plo
                    ga.append(
                        ((plo, phi),
                         g3.reshape(R * Dj, -1),
                         a3.reshape(R * Dj, -1))
                    )
                for i, ((alo, ahi), Gi, Ai) in enumerate(ga):
                    for ((blo, bhi), Gj, Aj) in ga[i:]:
                        blk = mm(Ai, Gj)
                        S_sub = S_sub.at[
                            alo * Dj:ahi * Dj, blo * Dj:bhi * Dj
                        ].add(blk)
                        if (blo, bhi) != (alo, ahi):
                            S_sub = S_sub.at[
                                blo * Dj:bhi * Dj, alo * Dj:ahi * Dj
                            ].add(blk.T)
        elif max_g_bytes is not None and g_bytes > max_g_bytes:
            # chunked: S_sub accumulates, G/A chunks are transient
            chunks = int(-(-g_bytes // max_g_bytes))
            CM = -(-M // chunks)
            S_sub = jnp.zeros((N * Dj, N * Dj), jnp.float32)
            for c in range(0, M, CM):
                cm = min(CM, M - c)
                g3, a3 = dense_g_a_onehot(
                    Wop, lm_slot - c, Hop[:, c:c + cm]
                )
                Gc = g3.reshape(N * Dj, 3 * cm)
                Ac = a3.reshape(N * Dj, 3 * cm)
                S_sub = S_sub + mm(Ac, Gc)
        else:
            g3, a3 = dense_g_a_onehot(Wop, lm_slot, Hop)
            # rows are (dj, j)-ordered: the 2D flatten is transpose-free
            # and consistent between A and G, which is all S_sub needs
            G = g3.reshape(N * Dj, 3 * M)
            A = a3.reshape(N * Dj, 3 * M)
            S_sub = mm(A, G)
        S = jnp.zeros((N, D, N, D), dtype)
        sub4 = S_sub.reshape(N, Dj, N, Dj).astype(dtype)
        S = S.at[:, :Dj, :, :Dj].add(-sub4)
        ar = jnp.arange(N)
        if op_dtype is not None:
            # Replace the bf16-contracted DIAGONAL blocks with the exact
            # f32 self-term sweep: S's diagonal is Hpp - sub with heavy
            # cancellation (the two terms nearly cancel in well-observed
            # directions), so bf16 storage error there breaks LM steps
            # outright (measured: first step rejected at cost 2.9e5),
            # while off-diagonal blocks have no such cancellation and
            # tolerate the ~0.5% rounding. One extra VPU sweep.
            exact = _schur_self_blocks(blocks).astype(dtype)
            S = S.at[ar, :Dj, ar, :Dj].add(sub4[ar, :, ar, :] - exact)
        S = S.at[ar, :, ar, :].add(blocks.Hpp)
        if blocks.C.shape[0] > 0:
            S = S.at[blocks.ci, :, blocks.cj, :].add(blocks.C)
            S = S.at[blocks.cj, :, blocks.ci, :].add(
                jnp.swapaxes(blocks.C, -1, -2)
            )
        return S
    else:
        if blocks.ell is not None:
            Pmax = blocks.W.shape[2]
            Wb = blocks.W.reshape(Dj, 3, N, Pmax).transpose(2, 3, 0, 1)
            lm_slot = blocks.lm_idx.reshape(N, Pmax)
            G4 = jnp.zeros((N, M, Dj, 3), wdtype).at[
                jnp.arange(N)[:, None], lm_slot
            ].add(Wb)
        else:
            K = blocks.lm_idx.shape[0]
            Wb = blocks.W.reshape(Dj, 3, K).transpose(2, 0, 1)  # (K, Dj, 3)
            G4 = jnp.zeros((N, M, Dj, 3), wdtype).at[
                blocks.pose_idx, blocks.lm_idx
            ].add(Wb)
        G = G4.transpose(0, 2, 1, 3).reshape(N * Dj, M * 3)
        Hinv = _sym3_full(blocks.Hll_inv)  # (M, 3, 3)
        A = jnp.einsum(
            "amj,mjk->amk", G.reshape(N * Dj, M, 3), Hinv
        ).reshape(N * Dj, M * 3)
    S_sub = A @ G.T  # (N*Dj, N*Dj) — the MXU-bound step

    # embed into the full (N, D, N, D) system
    S = jnp.zeros((N, D, N, D), dtype)
    sub4 = S_sub.reshape(N, Dj, N, Dj).astype(dtype)
    S = S.at[:, :Dj, :, :Dj].add(-sub4)
    # pose diagonal blocks (damped as built) on the block diagonal
    S = S.at[jnp.arange(N), :, jnp.arange(N), :].add(blocks.Hpp)
    # pose-pose couplings (between/IMU factors)
    if blocks.C.shape[0] > 0:
        S = S.at[blocks.ci, :, blocks.cj, :].add(blocks.C)
        S = S.at[blocks.cj, :, blocks.ci, :].add(
            jnp.swapaxes(blocks.C, -1, -2)
        )
    return S


def chol_solve_mixed(Se, rhs):
    """SPD solve ``Se X = rhs`` — shared by the f32 and widened-f64 paths.

    Precision notes from the stiff-VIO bring-up (v5e, n=1800): (1) the
    exact f64 factorization is REQUIRED — f32-factorize + f64-residual
    iterative refinement diverges on stiff windows (measured ATE 5.4 m vs
    0.075 m; kappa_eq * eps32 >= 1 so the refinement doesn't contract);
    (2) XLA's f64 Cholesky runs ~132 ms at n=1800 (vs 6 ms f32) and a
    hand-blocked right-looking variant with MXU matmul trailing updates
    measures the SAME 139 ms — the cost is intrinsic to f64 panel math,
    not XLA's schedule, so the native call stays. ``rhs`` is (n, k);
    returns (n, k) in Se's dtype."""
    L = jnp.linalg.cholesky(Se)
    y = jax.lax.linalg.triangular_solve(
        L, rhs, left_side=True, lower=True
    )
    return jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )


def dense_schur_solve(blocks: SchurBlocks, b: jnp.ndarray) -> jnp.ndarray:
    """Explicit reduced camera system + dense Cholesky — the TPU analog of
    Ceres' DENSE_SCHUR, and the fast path for small/medium pose counts.

    The matrix-free PCG above is gather/VPU-bound and, on stiff
    chain-coupled graphs (VIO), needs O(N) iterations for block-Jacobi to
    propagate information. Here S from :func:`dense_reduced_system` solves
    by Cholesky: for N*D in the hundreds-to-few-thousands this is one
    large matmul versus tens of serial CG sweeps.

    Not usable in sharded ELL mode (S couples poses across devices through
    shared landmarks); the caller keeps PCG there.

    x: (N, D) solution of S x = b with gauge-fixed coordinates pinned.
    """
    D = blocks.bp.shape[1]
    N = blocks.Hpp.shape[0]
    dtype = blocks.bp.dtype
    S = dense_reduced_system(blocks)

    # gauge projection: pinned coordinates get identity rows/cols
    if blocks.free_pose.ndim == 1:
        m = jnp.broadcast_to(blocks.free_pose[:, None], (N, D))
    else:
        m = blocks.free_pose
    mf = m.reshape(-1)
    Sf = S.reshape(N * D, N * D)
    Sf = mf[:, None] * Sf * mf[None, :]
    Sf = Sf + jnp.diag(1.0 - mf)

    # Jacobi equilibration before the Cholesky: stiff IMU chains put
    # ~1e9-1e10 entries next to ~1e2 vision information in the same
    # matrix; in f32 the raw factorization's rounding noise then rivals
    # the weak information and the solve silently degrades (measured on
    # 20 Hz keyframe VIO windows). Scaling to a unit diagonal costs two
    # rank-1 row/col passes and restores the conditioning headroom.
    dg = jnp.diagonal(Sf)
    d = 1.0 / jnp.sqrt(jnp.where(dg > 0, dg, 1.0))
    Se = d[:, None] * Sf * d[None, :]
    Se = Se + (1e-7 if dtype == jnp.float32 else 1e-14) * jnp.eye(
        N * D, dtype=dtype
    )

    bf = (b.reshape(-1) * mf) * d
    # f32 path: plain Cholesky; widened (f64) path: f32-factorization +
    # f64 iterative refinement (see chol_solve_mixed — the f64 Cholesky
    # itself is 21x slower on TPU while f64 matmuls are fast)
    x = chol_solve_mixed(Se, bf[:, None])
    return (x[:, 0] * d * mf).reshape(N, D)


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray


def pcg(blocks: SchurBlocks, b, max_iters: int = 100, tol: float = 1e-8,
        S4: jnp.ndarray | None = None) -> CGResult:
    """Preconditioned conjugate gradients on the reduced camera system.

    Runs exactly ``max_iters`` iterations under ``lax.scan`` with
    convergence *masking* instead of a data-dependent ``while_loop`` —
    static control flow is the TPU rule (SURVEY.md §7): a while predicate
    would force a device->host sync every iteration, which through a remote
    runtime costs more than the iteration itself. Masking is applied to the
    scalar step sizes only (alpha/beta -> 0 freezes x, r, rz; p decays to z
    harmlessly since alpha stays 0), which keeps the loop body at two
    reductions and zero extra array traffic.

    ``S4`` (explicit-S mode): the materialized reduced system from
    :func:`dense_reduced_system`. The Krylov iterates are numerically
    IDENTICAL to the matrix-free path (same operator, same SCHUR_JACOBI
    preconditioner — now read off S's block diagonal for free), but each
    matvec is one dense (N*D, N*D) einsum instead of ~30 gather/shift ops
    over the observation bank. Matrix-free CG on this problem class is
    op-issue-latency bound, not bandwidth bound (measured v5e, 10k lm /
    60k obs: ~0.58 ms per matvec against a ~5.8 MB S) — materializing S
    once per LM iteration via the fused one-hot MXU kernel and sweeping
    CG against it is the single biggest headline-path win (optim.ba
    gates it as ``explicit_s``)."""
    if S4 is not None:
        N, D = b.shape
        Pd = S4[jnp.arange(N), :, jnp.arange(N), :]  # (N, D, D)
        eye = jnp.eye(D, dtype=S4.dtype)
        if blocks.free_pose.ndim == 1:
            m = jnp.broadcast_to(blocks.free_pose[:, None], (N, D))
        else:
            m = blocks.free_pose
        Pd = m[:, :, None] * Pd * m[:, None, :]
        Pd = Pd + eye * (1.0 - m)[..., None, :] + 1e-10 * eye
        P = cho_inverse(Pd)

        def matvec(x):
            x = _project(x, blocks.free_pose)
            return _project(
                jnp.einsum("nimj,mj->ni", S4, x), blocks.free_pose
            )
    else:
        P = schur_jacobi_preconditioner(blocks)
        matvec = lambda p: schur_matvec(blocks, p)

    def apply_P(v):
        return _project(
            jnp.einsum("nij,nj->ni", P, _project(v, blocks.free_pose)),
            blocks.free_pose,
        )

    b = _project(b, blocks.free_pose)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_P(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    rr0 = jnp.vdot(b, b)
    thresh_sq = (tol * tol) * rr0

    def body(state, _):
        x, r, z, p, rz, rr, it = state
        live = rr > thresh_sq
        Sp = matvec(p)
        denom = jnp.vdot(p, Sp)
        alpha = jnp.where(
            live, rz / jnp.where(denom == 0, 1.0, denom), 0.0
        )
        x = x + alpha * p
        r = r - alpha * Sp
        z_new = apply_P(r)
        rz_new = jnp.vdot(r, z_new)
        rr = jnp.vdot(r, r)
        beta = jnp.where(live, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = z_new + beta * p
        rz = jnp.where(live, rz_new, rz)
        it = it + live.astype(jnp.int32)
        return (x, r, z_new, p, rz, rr, it), None

    init = (x0, r0, z0, p0, rz0, rr0, jnp.asarray(0))
    (x, r, _, _, _, rr, it), _ = jax.lax.scan(
        body, init, None, length=max_iters
    )
    return CGResult(x=x, iterations=it, residual_norm=jnp.sqrt(rr))


def back_substitute(blocks: SchurBlocks, dx_pose: jnp.ndarray) -> jnp.ndarray:
    """dx_lm = Hll^-1 (bl - U^T dx_pose). Returns (M, 3)."""
    xk = _broadcast_pose(blocks, _project(dx_pose, blocks.free_pose))
    utx = _seg_lm(blocks, _w_t_apply(blocks.W, xk))  # (3, M)
    return sym3_matvec(blocks.Hll_inv, blocks.bl - utx).T
