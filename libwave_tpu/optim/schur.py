"""Schur-complement elimination of landmarks + preconditioned CG.

Device-side analog of the reference's Ceres configuration — SPARSE_SCHUR with
the SCHUR_JACOBI preconditioner (wave_optimization/src/ceres/ba.cpp:49-52):

- landmark (point) blocks are eliminated with batched 3x3 inverses;
- the reduced camera system ``S dx_p = b̃`` is solved *matrix-free*: each CG
  matvec is two segment-sum sweeps over the observation bank (gather by
  landmark, gather by pose) — O(K) work, no 6Nx6N matrix formed;
- the preconditioner is the block diagonal of S (SCHUR_JACOBI), computed in
  O(K) from the self-terms only.

All shapes are static; CG runs a fixed iteration count under ``lax.scan``
with convergence masking, so the whole solve jits and shards (the
segment-sums become psum-able partial reductions when the observation bank
is sharded across devices — see libwave_tpu.parallel). Pose blocks are
D-dimensional (6 for pure BA, 15 for VIO's pose+vel+bias states).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as onp


def ell_tables(pose_idx, lm_idx, num_poses: int, num_landmarks: int):
    """Host-side construction of ELL (padded dense) index tables.

    ``obs_of_pose[n, :]`` lists the observation rows of pose n (padded with
    K, a dummy row index); similarly ``obs_of_lm``. Reductions over these
    rectangular tables are dense gathers + sums — measured ~2x faster than
    scatter-based segment sums on v5e for the BA matvec. Returns
    (obs_of_pose (N, Pmax), obs_of_lm (M, Lmax)) as jnp arrays.
    """
    pose_idx = onp.asarray(pose_idx)
    lm_idx = onp.asarray(lm_idx)
    K = pose_idx.shape[0]

    def table(idx, num_segments):
        counts = onp.bincount(idx, minlength=num_segments)
        Lmax = max(int(counts.max()), 1)
        t = onp.full((num_segments, Lmax), K, dtype=onp.int32)
        cur = onp.zeros(num_segments, dtype=onp.int64)
        for k, seg in enumerate(idx):
            t[seg, cur[seg]] = k
            cur[seg] += 1
        return jnp.asarray(t)

    return table(pose_idx, num_poses), table(lm_idx, num_landmarks)


def _ell_reduce(vals, table):
    """Sum rows of ``vals`` (K, ...) grouped by an ELL table (S, Lmax) padded
    with index K (a zero dummy row is appended)."""
    pad = jnp.zeros((1,) + vals.shape[1:], vals.dtype)
    padded = jnp.concatenate([vals, pad], axis=0)
    return jnp.sum(padded[table], axis=1)


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    Much cheaper than LU on TPU for the (M, 3, 3) landmark blocks — pure
    VPU elementwise math, no pivoting, trivially fusible.
    """
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


def cho_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD inverse via Cholesky triangular solves (for the (N, 6, 6)
    preconditioner blocks — avoids general LU pivoting)."""
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True
    )
    return jnp.swapaxes(Linv, -1, -2) @ Linv


class SchurBlocks(NamedTuple):
    """Normal-equation blocks for a BA-structured problem.

    ``C/ci/cj`` hold pose-pose off-diagonal couplings from pose-graph factors
    (odometry between-factors): H[ci, cj] += C, H[cj, ci] += C^T. They ride
    along in the matrix-free Schur matvec; ``None``-like empty banks are
    zero-length arrays.
    """

    Hpp: jnp.ndarray  # (N, 6, 6) pose diagonal blocks (damped)
    Hll_inv: jnp.ndarray  # (M, 3, 3) inverted landmark blocks (damped)
    W: jnp.ndarray  # (K, 6, 3) per-observation pose-landmark coupling
    bp: jnp.ndarray  # (N, 6)
    bl: jnp.ndarray  # (M, 3)
    pose_idx: jnp.ndarray  # (K,) — MUST be non-decreasing (obs sorted by pose)
    lm_idx: jnp.ndarray  # (K,)
    lm_perm: jnp.ndarray  # (K,) permutation sorting obs by landmark
    lm_sorted: jnp.ndarray  # (K,) lm_idx[lm_perm]
    free_pose: jnp.ndarray  # (N,) 1.0 for free poses, 0.0 for gauge-fixed
    obs_of_pose: object  # (N, Pmax) ELL table or None (sharded path)
    obs_of_lm: object  # (M, Lmax) ELL table or None
    C: jnp.ndarray  # (F, 6, 6) pose-pose cross blocks
    ci: jnp.ndarray  # (F,)
    cj: jnp.ndarray  # (F,)


def build_normal_equations(
    r, J_pose, J_lm, weights, pose_idx, lm_idx, num_poses, num_landmarks,
    damping, free_pose,
    extra_Hpp=None, extra_bp=None, couplings=None,
    obs_of_pose=None, obs_of_lm=None,
) -> SchurBlocks:
    """Assemble damped normal-equation blocks from a linearized observation
    bank via segment-sums (the TPU analog of sparse assembly).

    ``weights`` (K,) fold in both validity masks and robust-loss weights.
    ``damping`` is the LM lambda; diagonals are damped multiplicatively
    (Marquardt scaling) with an additive floor for rank safety.

    TPU note: ``pose_idx`` must be non-decreasing (observations emitted in
    pose order — all problem builders do this); landmark-side reductions go
    through a sort permutation computed here. Sorted segment-sums lower to
    fast vectorized reductions instead of serialized scatter-adds (~6x
    measured on v5e).
    """
    lm_perm = jnp.argsort(lm_idx)
    lm_sorted = lm_idx[lm_perm]

    if obs_of_pose is not None:
        seg_pose = lambda vals: _ell_reduce(vals, obs_of_pose)
    else:
        seg_pose = lambda vals: jax.ops.segment_sum(
            vals, pose_idx, num_segments=num_poses, indices_are_sorted=True
        )
    if obs_of_lm is not None:
        seg_lm = lambda vals: _ell_reduce(vals, obs_of_lm)
    else:
        seg_lm = lambda vals: jax.ops.segment_sum(
            vals[lm_perm], lm_sorted, num_segments=num_landmarks,
            indices_are_sorted=True,
        )
    w = weights[:, None, None]
    JpT = jnp.swapaxes(J_pose, -1, -2)  # (K, 6, 2)
    JlT = jnp.swapaxes(J_lm, -1, -2)  # (K, 3, 2)

    Hpp_k = (JpT * w) @ J_pose  # (K, 6, 6)
    Hll_k = (JlT * w) @ J_lm  # (K, 3, 3)
    W = (JpT * w) @ J_lm  # (K, 6, 3)
    bp_k = -jnp.einsum("kij,kj->ki", JpT * w, r)  # (K, 6)
    bl_k = -jnp.einsum("kij,kj->ki", JlT * w, r)  # (K, 3)

    Hpp = seg_pose(Hpp_k)
    Hll = seg_lm(Hll_k)
    bp = seg_pose(bp_k)
    bl = seg_lm(bl_k)

    # fold in pose-graph factor contributions (diagonal + rhs)
    if extra_Hpp is not None:
        Hpp = Hpp + extra_Hpp
    if extra_bp is not None:
        bp = bp + extra_bp

    dtype = r.dtype

    # Additive damping floor: must sit well above the dtype's cancellation
    # noise or degenerate blocks (unobserved landmarks) make the Schur
    # complement numerically indefinite and Cholesky NaNs out.
    floor = 1e-6 if dtype == jnp.float32 else 1e-10

    def damp(H, n):
        # Marquardt scaling: diag *= (1 + lambda), plus additive floor.
        eye = jnp.eye(n, dtype=dtype)
        diag = jnp.diagonal(H, axis1=-2, axis2=-1)  # (B, n)
        add = damping * diag + floor
        return H + eye * add[..., None, :]

    Hpp = damp(Hpp, Hpp.shape[-1])
    Hll = damp(Hll, 3)

    D = Hpp.shape[-1]
    Hll_inv = inv3x3(Hll)
    if couplings is None:
        C = jnp.zeros((0, D, D), dtype=dtype)
        ci = jnp.zeros((0,), dtype=jnp.int32)
        cj = jnp.zeros((0,), dtype=jnp.int32)
    else:
        C, ci, cj = couplings
    return SchurBlocks(
        Hpp=Hpp, Hll_inv=Hll_inv, W=W, bp=bp, bl=bl,
        pose_idx=pose_idx, lm_idx=lm_idx, lm_perm=lm_perm,
        lm_sorted=lm_sorted, free_pose=free_pose,
        obs_of_pose=obs_of_pose, obs_of_lm=obs_of_lm,
        C=C, ci=ci, cj=cj,
    )


def _project(x, free_pose):
    """Zero out gauge-fixed coordinates (Ceres SetParameterBlockConstant,
    ba_test.cpp:156-161). ``free_pose`` is (N,) to fix whole blocks, or
    (N, D) to fix individual tangent columns (e.g. freeze only the pose part
    of a combined VIO state, leaving velocity/bias free)."""
    if free_pose.ndim == 1:
        return x * free_pose[:, None]
    return x * free_pose


def schur_matvec(blocks: SchurBlocks, x: jnp.ndarray) -> jnp.ndarray:
    """S x = Hpp x - U Hll^-1 U^T x, matrix-free. x: (N, 6) -> (N, 6)."""
    x = _project(x, blocks.free_pose)
    # Hpp x
    out = jnp.einsum("nij,nj->ni", blocks.Hpp, x)
    # U^T x: per observation W_k^T x[pose_k], summed by landmark (through
    # the precomputed sort permutation -> fast sorted reduction)
    xk = x[blocks.pose_idx]  # (K, 6)
    utx_k = jnp.einsum("kij,ki->kj", blocks.W, xk)  # (K, 3)
    if blocks.obs_of_lm is not None:
        utx = _ell_reduce(utx_k, blocks.obs_of_lm)
    else:
        utx = jax.ops.segment_sum(
            utx_k[blocks.lm_perm], blocks.lm_sorted,
            num_segments=blocks.bl.shape[0], indices_are_sorted=True,
        )
    y = jnp.einsum("mij,mj->mi", blocks.Hll_inv, utx)  # (M, 3)
    # U y: per observation W_k y[lm_k], summed by pose
    uy_k = jnp.einsum("kij,kj->ki", blocks.W, y[blocks.lm_idx])  # (K, 6)
    if blocks.obs_of_pose is not None:
        uy = _ell_reduce(uy_k, blocks.obs_of_pose)
    else:
        uy = jax.ops.segment_sum(
            uy_k, blocks.pose_idx, num_segments=x.shape[0],
            indices_are_sorted=True,
        )
    out = out - uy
    # pose-pose couplings from pose-graph factors
    if blocks.C.shape[0] > 0:
        cx_j = jnp.einsum("fij,fj->fi", blocks.C, x[blocks.cj])  # (F, 6)
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
    y = jnp.einsum("mij,mj->mi", blocks.Hll_inv, blocks.bl)
    uy_k = jnp.einsum("kij,kj->ki", blocks.W, y[blocks.lm_idx])
    if blocks.obs_of_pose is not None:
        uy = _ell_reduce(uy_k, blocks.obs_of_pose)
    else:
        uy = jax.ops.segment_sum(
            uy_k, blocks.pose_idx, num_segments=blocks.bp.shape[0],
            indices_are_sorted=True,
        )
    return _project(blocks.bp - uy, blocks.free_pose)


def schur_jacobi_preconditioner(blocks: SchurBlocks) -> jnp.ndarray:
    """Inverted block diagonal of S (the SCHUR_JACOBI preconditioner):
    P_i = (Hpp_i - sum_k W_k Hll_inv[lm_k] W_k^T)^{-1}, self-terms only."""
    Wk = blocks.W
    self_k = Wk @ blocks.Hll_inv[blocks.lm_idx] @ jnp.swapaxes(Wk, -1, -2)
    if blocks.obs_of_pose is not None:
        sub = _ell_reduce(self_k, blocks.obs_of_pose)
    else:
        sub = jax.ops.segment_sum(
            self_k, blocks.pose_idx, num_segments=blocks.Hpp.shape[0],
            indices_are_sorted=True,
        )
    S_diag = blocks.Hpp - sub
    # Gauge-fixed coordinates get identity rows/cols so CG stays
    # well-defined on their (projected-out) subspace.
    eye = jnp.eye(S_diag.shape[-1], dtype=S_diag.dtype)
    if blocks.free_pose.ndim == 1:
        m = jnp.broadcast_to(
            blocks.free_pose[:, None], S_diag.shape[:2]
        )
    else:
        m = blocks.free_pose
    S_diag = m[:, :, None] * S_diag * m[:, None, :]
    S_diag = S_diag + eye * (1.0 - m)[..., None, :] * eye
    # small diagonal lift for safety
    S_diag = S_diag + 1e-10 * eye
    return cho_inverse(S_diag)


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray


def pcg(blocks: SchurBlocks, b, max_iters: int = 100, tol: float = 1e-8) -> CGResult:
    """Preconditioned conjugate gradients on the reduced camera system.

    Runs exactly ``max_iters`` iterations under ``lax.scan`` with
    convergence *masking* (updates freeze once the residual is below tol)
    instead of a data-dependent ``while_loop`` — static control flow is the
    TPU rule (SURVEY.md §7): a while predicate would force a device->host
    sync every iteration, which through a remote runtime costs more than the
    iteration itself.
    """
    P = schur_jacobi_preconditioner(blocks)

    def apply_P(v):
        return _project(
            jnp.einsum("nij,nj->ni", P, _project(v, blocks.free_pose)),
            blocks.free_pose,
        )

    b = _project(b, blocks.free_pose)
    b_norm = jnp.sqrt(jnp.vdot(b, b))
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_P(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    thresh = tol * (b_norm + 1e-30)

    def body(state, _):
        x, r, z, p, rz, it, done = state
        Sp = schur_matvec(blocks, p)
        denom = jnp.vdot(p, Sp)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x_new = x + alpha * p
        r_new = r - alpha * Sp
        z_new = apply_P(r_new)
        rz_new = jnp.vdot(r_new, z_new)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p_new = z_new + beta * p

        keep = ~done
        x = jnp.where(keep, x_new, x)
        r = jnp.where(keep, r_new, r)
        z = jnp.where(keep, z_new, z)
        p = jnp.where(keep, p_new, p)
        rz = jnp.where(keep, rz_new, rz)
        it = it + keep.astype(jnp.int32)
        done = done | (jnp.sqrt(jnp.vdot(r, r)) <= thresh)
        return (x, r, z, p, rz, it, done), None

    init = (x0, r0, z0, p0, rz0, jnp.asarray(0), b_norm <= thresh)
    (x, r, _, _, _, it, _), _ = jax.lax.scan(body, init, None, length=max_iters)
    return CGResult(x=x, iterations=it, residual_norm=jnp.sqrt(jnp.vdot(r, r)))


def back_substitute(blocks: SchurBlocks, dx_pose: jnp.ndarray) -> jnp.ndarray:
    """dx_lm = Hll^-1 (bl - U^T dx_pose)."""
    xk = _project(dx_pose, blocks.free_pose)[blocks.pose_idx]
    utx_k = jnp.einsum("kij,ki->kj", blocks.W, xk)
    if blocks.obs_of_lm is not None:
        utx = _ell_reduce(utx_k, blocks.obs_of_lm)
    else:
        utx = jax.ops.segment_sum(
            utx_k[blocks.lm_perm], blocks.lm_sorted,
            num_segments=blocks.bl.shape[0], indices_are_sorted=True,
        )
    return jnp.einsum("mij,mj->mi", blocks.Hll_inv, blocks.bl - utx)
