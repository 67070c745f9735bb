"""Distributed pose-graph optimization: trajectory-block (sequence-parallel)
partitioning with explicit halo/separator exchange.

This is the framework's sequence/context-parallel subsystem (SURVEY.md §5.7):
a long trajectory is split into contiguous keyframe blocks, one per device on
a 1-D ``('sp',)`` mesh. Where ``parallel.dist_ba`` lets GSPMD insert
collectives from sharding annotations, this module writes the communication
pattern out by hand with ``shard_map`` — the two idiomatic halves of the TPU
scaling playbook:

- **halo exchange** (``jax.lax.ppermute``): odometry factors crossing a block
  boundary need the neighboring block's poses; each device sends its block to
  both neighbors, so factors whose endpoints sit in adjacent blocks stay
  local after one bidirectional permute over the ICI ring;
- **separator exchange** (``jax.lax.psum``): long-range loop closures touch a
  small static set of "separator" poses (the distributed-BA/pose-graph notion
  of separators). Each device scatters the separators it owns into a shared
  (S, ...) table that one psum replicates everywhere; transpose contributions
  flow back through a second psum.

Factor ownership: each between-factor lives on the device owning pose ``i``
(its block), padded to a fixed per-device capacity with zero-weight slots.
The solver itself is the same GN + block-Jacobi PCG as
``optim.pose_graph.solve_pose_graph`` — identical math, communicating matvec
— so single-device and distributed solves agree to float tolerance.

The reference has no counterpart (single-process, shared-memory:
wave_matching/include/wave/matching/multi_matcher.hpp:30 is its whole
parallel surface); the design follows the keyframe-block decomposition of
distributed pose-graph/BA literature mapped onto the TPU collective set.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as onp
from jax.sharding import Mesh, PartitionSpec as P

from libwave_tpu.geometry import so3
from libwave_tpu.optim.pose_graph import (
    BetweenBank,
    PoseGraphConfig,
    PriorBank,
    _between_residual,
    _prior_residual,
)
from libwave_tpu.utils.precision import f32_matmuls


class BlockPoseGraph(NamedTuple):
    """Host-partitioned pose graph, everything block-shaped (leading axis =
    n_blocks, sharded over 'sp').

    Per-factor endpoint addressing is *extended-local*: index into the
    (3*Nb,) concatenation [prev block | own block | next block], or —
    for long-range closures — negative-free index into the separator table
    via ``j_sep`` with ``j_ext`` pointing at a dummy slot and
    ``use_sep`` = 1.
    """

    # poses, block-shaped
    q: jnp.ndarray  # (B, Nb, 4)
    p: jnp.ndarray  # (B, Nb, 3)
    free: jnp.ndarray  # (B, Nb) 1.0 = free, 0.0 = gauge-fixed/padding
    # between factors, block-shaped banks padded to Fb per block
    f_il: jnp.ndarray  # (B, Fb) owner-local index of pose i in [0, Nb)
    f_jext: jnp.ndarray  # (B, Fb) extended-local index of pose j in [0, 3Nb)
    f_jsep: jnp.ndarray  # (B, Fb) separator-table index of j (0 if unused)
    f_use_sep: jnp.ndarray  # (B, Fb) 1.0 where j resolves via separators
    f_dq: jnp.ndarray  # (B, Fb, 4)
    f_dp: jnp.ndarray  # (B, Fb, 3)
    f_sqrt_info: jnp.ndarray  # (B, Fb, 6) zero rows on padding slots
    # priors, block-shaped banks padded to Pb per block
    pr_il: jnp.ndarray  # (B, Pb)
    pr_q: jnp.ndarray  # (B, Pb, 4)
    pr_p: jnp.ndarray  # (B, Pb, 3)
    pr_sqrt_info: jnp.ndarray  # (B, Pb, 6)
    # separator machinery (S = number of long-range-referenced poses, >= 1)
    sep_block: jnp.ndarray  # (S,) owning block of each separator pose
    sep_local: jnp.ndarray  # (S,) its local index there
    sep_mask: jnp.ndarray  # (S,) 1.0 on real separators (slot 0 is dummy)


def partition_pose_graph(
    q,
    p,
    between: BetweenBank,
    priors: PriorBank | None,
    n_blocks: int,
    free=None,
) -> BlockPoseGraph:
    """Host-side partitioner: contiguous keyframe blocks + factor ownership.

    Pads N to ``n_blocks * Nb`` with frozen dummy poses and each block's
    factor/prior banks to common capacities with zero-information slots.
    """
    q = onp.asarray(q)
    p = onp.asarray(p)
    n = q.shape[0]
    dtype = p.dtype
    nb = -(-n // n_blocks)  # ceil
    n_pad = n_blocks * nb

    if free is None:
        if priors is not None:
            free_np = onp.ones(n, dtype)
        else:
            free_np = onp.ones(n, dtype)
            free_np[0] = 0.0
    else:
        free_np = onp.asarray(free, dtype).copy()

    def pad_poses(x, fill):
        out = onp.full((n_pad,) + x.shape[1:], fill, dtype=x.dtype)
        out[:n] = x
        return out

    qp = pad_poses(q, 0.0)
    qp[n:, 0] = 1.0  # identity quaternions on padding
    pp = pad_poses(p, 0.0)
    fp = pad_poses(free_np, 0.0)  # padding poses frozen

    i = onp.asarray(between.i)
    j = onp.asarray(between.j)
    own = i // nb
    jblk = j // nb
    span = jblk - own

    # separators: targets of long-range (|span| >= 2) factors; slot 0 is a
    # dummy so the table is never empty and padded factors have a target
    long_range = onp.abs(span) >= 2
    sep_ids = onp.unique(j[long_range]) if long_range.any() else onp.empty(
        0, dtype=j.dtype
    )
    sep_block = onp.concatenate([[0], sep_ids // nb]).astype(onp.int32)
    sep_local = onp.concatenate([[0], sep_ids % nb]).astype(onp.int32)
    sep_mask = onp.concatenate(
        [[0.0], onp.ones(len(sep_ids))]
    ).astype(dtype)
    sep_slot = {int(g): s + 1 for s, g in enumerate(sep_ids)}

    counts = onp.bincount(own, minlength=n_blocks)
    Fb = max(int(counts.max()), 1)
    f_il = onp.zeros((n_blocks, Fb), onp.int32)
    f_jext = onp.zeros((n_blocks, Fb), onp.int32)
    f_jsep = onp.zeros((n_blocks, Fb), onp.int32)
    f_use = onp.zeros((n_blocks, Fb), dtype)
    f_dq = onp.zeros((n_blocks, Fb, 4), dtype)
    f_dq[..., 0] = 1.0
    f_dp = onp.zeros((n_blocks, Fb, 3), dtype)
    f_si = onp.zeros((n_blocks, Fb, 6), dtype)
    cursor = onp.zeros(n_blocks, onp.int64)
    bdq = onp.asarray(between.dq)
    bdp = onp.asarray(between.dp)
    bsi = onp.asarray(between.sqrt_info)
    for f in range(i.shape[0]):
        b = int(own[f])
        c = int(cursor[b])
        cursor[b] += 1
        f_il[b, c] = int(i[f]) - b * nb
        s = int(span[f])
        if abs(s) <= 1:
            # extended-local: [prev | own | next] => offset (s + 1) * nb
            f_jext[b, c] = (s + 1) * nb + int(j[f]) - int(jblk[f]) * nb
        else:
            f_jext[b, c] = nb  # dummy: own block slot 0 (value unused)
            f_jsep[b, c] = sep_slot[int(j[f])]
            f_use[b, c] = 1.0
        f_dq[b, c] = bdq[f]
        f_dp[b, c] = bdp[f]
        f_si[b, c] = bsi[f]

    if priors is not None:
        pi = onp.asarray(priors.i)
        pown = pi // nb
        pc = onp.bincount(pown, minlength=n_blocks)
        Pb = max(int(pc.max()), 1)
        pr_il = onp.zeros((n_blocks, Pb), onp.int32)
        pr_q = onp.zeros((n_blocks, Pb, 4), dtype)
        pr_q[..., 0] = 1.0
        pr_p = onp.zeros((n_blocks, Pb, 3), dtype)
        pr_si = onp.zeros((n_blocks, Pb, 6), dtype)
        cur = onp.zeros(n_blocks, onp.int64)
        for f in range(pi.shape[0]):
            b = int(pown[f])
            c = int(cur[b])
            cur[b] += 1
            pr_il[b, c] = int(pi[f]) - b * nb
            pr_q[b, c] = onp.asarray(priors.q)[f]
            pr_p[b, c] = onp.asarray(priors.p)[f]
            pr_si[b, c] = onp.asarray(priors.sqrt_info)[f]
    else:
        Pb = 1
        pr_il = onp.zeros((n_blocks, Pb), onp.int32)
        pr_q = onp.zeros((n_blocks, Pb, 4), dtype)
        pr_q[..., 0] = 1.0
        pr_p = onp.zeros((n_blocks, Pb, 3), dtype)
        pr_si = onp.zeros((n_blocks, Pb, 6), dtype)

    return BlockPoseGraph(
        q=jnp.asarray(qp.reshape(n_blocks, nb, 4)),
        p=jnp.asarray(pp.reshape(n_blocks, nb, 3)),
        free=jnp.asarray(fp.reshape(n_blocks, nb)),
        f_il=jnp.asarray(f_il),
        f_jext=jnp.asarray(f_jext),
        f_jsep=jnp.asarray(f_jsep),
        f_use_sep=jnp.asarray(f_use),
        f_dq=jnp.asarray(f_dq),
        f_dp=jnp.asarray(f_dp),
        f_sqrt_info=jnp.asarray(f_si),
        pr_il=jnp.asarray(pr_il),
        pr_q=jnp.asarray(pr_q),
        pr_p=jnp.asarray(pr_p),
        pr_sqrt_info=jnp.asarray(pr_si),
        sep_block=jnp.asarray(sep_block),
        sep_local=jnp.asarray(sep_local),
        sep_mask=jnp.asarray(sep_mask),
    )


def _halo_exchange(x, axis_name):
    """[prev | own | next] along the block ring. x: (Nb, ...) per device ->
    (3Nb, ...). Ring wrap-around slots are only ever addressed by factors
    that genuinely cross that boundary; the partitioner never emits those
    for the first/last block."""
    n_dev = jax.lax.axis_size(axis_name)
    fwd = [(k, (k + 1) % n_dev) for k in range(n_dev)]
    bwd = [(k, (k - 1) % n_dev) for k in range(n_dev)]
    prev = jax.lax.ppermute(x, axis_name, fwd)  # from block b-1
    nxt = jax.lax.ppermute(x, axis_name, bwd)  # from block b+1
    return jnp.concatenate([prev, x, nxt], axis=0)


def _halo_return(ext, axis_name):
    """Transpose of :func:`_halo_exchange`: route the prev/next thirds of an
    extended accumulator back to their owners and add. ext: (3Nb, ...) ->
    (Nb, ...)."""
    n_dev = jax.lax.axis_size(axis_name)
    nb = ext.shape[0] // 3
    fwd = [(k, (k + 1) % n_dev) for k in range(n_dev)]
    bwd = [(k, (k - 1) % n_dev) for k in range(n_dev)]
    # what I accumulated for my *previous* neighbor's poses goes backward
    from_next = jax.lax.ppermute(ext[:nb], axis_name, bwd)
    from_prev = jax.lax.ppermute(ext[2 * nb:], axis_name, fwd)
    return ext[nb:2 * nb] + from_prev + from_next


def _sep_gather(x, g: BlockPoseGraph, axis_name):
    """Replicated separator table from per-device block data.
    x: (Nb, C). Returns (S, C)."""
    me = jax.lax.axis_index(axis_name)
    mine = (g.sep_block == me).astype(x.dtype) * g.sep_mask  # (S,)
    vals = jnp.take(x, g.sep_local, axis=0) * mine[:, None]
    return jax.lax.psum(vals, axis_name)


def _sep_return(acc, g: BlockPoseGraph, x_shape_nb, axis_name):
    """Transpose of :func:`_sep_gather`: psum the (S, C) accumulator and
    scatter-add my owned separators' rows into a (Nb, C) block."""
    total = jax.lax.psum(acc, axis_name)  # (S, C)
    me = jax.lax.axis_index(axis_name)
    mine = (g.sep_block == me).astype(acc.dtype) * g.sep_mask
    out = jnp.zeros((x_shape_nb, acc.shape[-1]), acc.dtype)
    return out.at[g.sep_local].add(total * mine[:, None])


@f32_matmuls
def solve_pose_graph_blocks(
    g: BlockPoseGraph,
    mesh: Mesh,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    axis_name: str = "sp",
):
    """GN + PCG over the partitioned graph, one block per device.

    Returns block-shaped (q, p, info) with the same values (to float
    tolerance) as ``optim.pose_graph.solve_pose_graph`` on the unpartitioned
    problem.

    The compiled ``jit(shard_map(...))`` executable is cached on
    (mesh, axis_name, cfg) — repeated solves with the same configuration hit
    the cache instead of re-tracing (jit still specializes per block shape).

    The number of blocks must equal the mesh's device count: shard_map hands
    each device exactly one block and the halo neighbors are block-adjacent
    devices — more blocks than devices would silently drop trajectory.
    """
    n_blocks = g.q.shape[0]
    n_dev = int(mesh.devices.size)
    if n_blocks != n_dev:
        raise ValueError(
            f"graph has {n_blocks} blocks but mesh has {n_dev} devices; "
            "partition_pose_graph(n_blocks=...) must match the mesh size "
            "(one block per device — halo neighbors are device-adjacent)"
        )
    mapped = _block_solver(mesh, axis_name, cfg)
    q, p, trace = mapped(g)
    return q, p, {"cost_trace": trace, "final_cost": trace[-1]}


@lru_cache(maxsize=None)
def _block_solver(mesh: Mesh, axis_name: str, cfg: PoseGraphConfig):
    """Build (once per (mesh, axis_name, cfg)) the jit(shard_map) solver."""
    spec_b = P(axis_name)

    def local_solver(g):
        # shard_map rank: every leading block axis is consumed -> (Nb, ...)
        g = jax.tree.map(lambda x: x[0], g._replace(
            sep_block=g.sep_block[None], sep_local=g.sep_local[None],
            sep_mask=g.sep_mask[None],
        ))
        nb = g.q.shape[0]
        dtype = g.p.dtype
        eye6 = jnp.eye(6, dtype=dtype)
        fmask = g.free[:, None]
        w = g.f_sqrt_info  # zero rows silence padded slots entirely

        def resolve_j(ext_q, ext_p, sep_q, sep_p):
            """Per-factor (qj, pj) from halo or separator tables."""
            qj_h = jnp.take(ext_q, g.f_jext, axis=0)  # (Fb, 4)
            pj_h = jnp.take(ext_p, g.f_jext, axis=0)
            qj_s = jnp.take(sep_q, g.f_jsep, axis=0)
            pj_s = jnp.take(sep_p, g.f_jsep, axis=0)
            use = g.f_use_sep[:, None]
            return (
                jnp.where(use > 0, qj_s, qj_h),
                jnp.where(use > 0, pj_s, pj_h),
            )

        def gn_step(carry, _):
            q, p = carry
            ext_q = _halo_exchange(q, axis_name)
            ext_p = _halo_exchange(p, axis_name)
            sep_q = _sep_gather(q, g, axis_name)
            sep_p = _sep_gather(p, g, axis_name)
            qi, pi = jnp.take(q, g.f_il, axis=0), jnp.take(p, g.f_il, axis=0)
            qj, pj = resolve_j(ext_q, ext_p, sep_q, sep_p)

            def one(qi, pi, qj, pj, dq, dp, si):
                def res(xi_i, xi_j):
                    return _between_residual(
                        so3.quat_boxplus(qi, xi_i[0:3]), pi + xi_i[3:6],
                        so3.quat_boxplus(qj, xi_j[0:3]), pj + xi_j[3:6],
                        dq, dp, si,
                    )

                z = jnp.zeros(6, dtype=dtype)
                return (
                    res(z, z),
                    jax.jacfwd(res, argnums=0)(z, z),
                    jax.jacfwd(res, argnums=1)(z, z),
                )

            r_b, Ji, Jj = jax.vmap(one)(
                qi, pi, qj, pj, g.f_dq, g.f_dp, w
            )
            # priors are purely local
            pq = jnp.take(q, g.pr_il, axis=0)
            ppos = jnp.take(p, g.pr_il, axis=0)

            def onep(qi, pi, q0, p0, si):
                def res(xi):
                    return _prior_residual(
                        so3.quat_boxplus(qi, xi[0:3]), pi + xi[3:6], q0, p0, si
                    )

                z = jnp.zeros(6, dtype=dtype)
                return res(z), jax.jacfwd(res)(z)

            r_p, Jp = jax.vmap(onep)(
                pq, ppos, g.pr_q, g.pr_p, g.pr_sqrt_info
            )

            def scatter_i(y):  # (Fb, 6) J_i^T y -> local poses
                t = jnp.einsum("fab,fa->fb", Ji, y)
                return jax.ops.segment_sum(t, g.f_il, num_segments=nb)

            def scatter_j(y):  # J_j^T y -> halo + separator owners
                t = jnp.einsum("fab,fa->fb", Jj, y)
                ext = jnp.zeros((3 * nb, 6), dtype).at[g.f_jext].add(
                    t * (1.0 - g.f_use_sep)[:, None]
                )
                out = _halo_return(ext, axis_name)
                acc = jnp.zeros(
                    (g.sep_mask.shape[0], 6), dtype
                ).at[g.f_jsep].add(t * g.f_use_sep[:, None])
                return out + _sep_return(acc, g, nb, axis_name)

            grad = scatter_i(r_b) + scatter_j(r_b)
            grad = grad + jax.ops.segment_sum(
                jnp.einsum("fab,fa->fb", Jp, r_p), g.pr_il, num_segments=nb
            )

            # block-Jacobi preconditioner: J_i^T J_i at i, J_j^T J_j at j
            def scatter_blk_j(Bk):  # (Fb, 6, 6) -> (Nb, 6, 6) at j owners
                ext = jnp.zeros((3 * nb, 36), dtype).at[g.f_jext].add(
                    Bk.reshape(-1, 36) * (1.0 - g.f_use_sep)[:, None]
                )
                out = _halo_return(ext, axis_name)
                acc = jnp.zeros(
                    (g.sep_mask.shape[0], 36), dtype
                ).at[g.f_jsep].add(Bk.reshape(-1, 36) * g.f_use_sep[:, None])
                out = out + _sep_return(acc, g, nb, axis_name)
                return out.reshape(nb, 6, 6)

            Dblk = jax.ops.segment_sum(
                jnp.einsum("fab,fac->fbc", Ji, Ji), g.f_il, num_segments=nb
            )
            Dblk = Dblk + scatter_blk_j(
                jnp.einsum("fab,fac->fbc", Jj, Jj)
            )
            Dblk = Dblk + jax.ops.segment_sum(
                jnp.einsum("fab,fac->fbc", Jp, Jp), g.pr_il, num_segments=nb
            )
            Dblk = Dblk + (cfg.damping + 1e-10) * eye6
            Dblk = jnp.where(
                (g.free > 0)[:, None, None], Dblk, eye6[None, :, :]
            )
            Pinv = jnp.linalg.inv(Dblk)

            def Hv(v):
                v = v * fmask
                ext_v = _halo_exchange(v, axis_name)
                sep_v = _sep_gather(v, g, axis_name)
                vi = jnp.take(v, g.f_il, axis=0)
                vj_h = jnp.take(ext_v, g.f_jext, axis=0)
                vj_s = jnp.take(sep_v, g.f_jsep, axis=0)
                vj = jnp.where(g.f_use_sep[:, None] > 0, vj_s, vj_h)
                y = jnp.einsum("fab,fb->fa", Ji, vi) + jnp.einsum(
                    "fab,fb->fa", Jj, vj
                )
                out = scatter_i(y) + scatter_j(y)
                yp = jnp.einsum(
                    "fab,fb->fa", Jp, jnp.take(v, g.pr_il, axis=0)
                )
                out = out + jax.ops.segment_sum(
                    jnp.einsum("fab,fa->fb", Jp, yp),
                    g.pr_il, num_segments=nb,
                )
                return (out + cfg.damping * v) * fmask

            def apply_P(v):
                return jnp.einsum("nij,nj->ni", Pinv, v * fmask) * fmask

            def dot(a, b):  # global inner product
                return jax.lax.psum(jnp.vdot(a, b), axis_name)

            b = -grad * fmask
            x = jnp.zeros_like(b)
            r = b
            z = apply_P(r)
            pdir = z
            rz = dot(r, z)
            rr = dot(b, b)
            thresh = (cfg.cg_tol**2) * rr

            def cg_body(state, _):
                x, r, z, pdir, rz, rr = state
                live = rr > thresh
                Hp = Hv(pdir)
                denom = dot(pdir, Hp)
                alpha = jnp.where(
                    live, rz / jnp.where(denom == 0, 1.0, denom), 0.0
                )
                x = x + alpha * pdir
                r = r - alpha * Hp
                z_new = apply_P(r)
                rz_new = dot(r, z_new)
                rr = dot(r, r)
                beta = jnp.where(
                    live, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0
                )
                pdir = z_new + beta * pdir
                rz = jnp.where(live, rz_new, rz)
                return (x, r, z_new, pdir, rz, rr), None

            (x, *_), _ = jax.lax.scan(
                cg_body, (x, r, z, pdir, rz, rr), None,
                length=cfg.cg_max_iters,
            )
            dx = x * fmask
            q_new = so3.quat_boxplus(q, dx[:, 0:3])
            p_new = p + dx[:, 3:6]

            # cost at the new state (psum of local factor costs)
            ext_q = _halo_exchange(q_new, axis_name)
            ext_p = _halo_exchange(p_new, axis_name)
            sep_q = _sep_gather(q_new, g, axis_name)
            sep_p = _sep_gather(p_new, g, axis_name)
            qj2, pj2 = resolve_j(ext_q, ext_p, sep_q, sep_p)
            r2 = _between_residual(
                jnp.take(q_new, g.f_il, axis=0),
                jnp.take(p_new, g.f_il, axis=0),
                qj2, pj2, g.f_dq, g.f_dp, w,
            )
            rp2 = _prior_residual(
                jnp.take(q_new, g.pr_il, axis=0),
                jnp.take(p_new, g.pr_il, axis=0),
                g.pr_q, g.pr_p, g.pr_sqrt_info,
            )
            cost = jax.lax.psum(
                0.5 * (jnp.sum(r2 * r2) + jnp.sum(rp2 * rp2)), axis_name
            )
            return (q_new, p_new), cost

        (q, p), trace = jax.lax.scan(
            gn_step, (g.q, g.p), None, length=cfg.max_iterations
        )
        return q[None], p[None], trace

    in_specs = BlockPoseGraph(
        q=spec_b, p=spec_b, free=spec_b,
        f_il=spec_b, f_jext=spec_b, f_jsep=spec_b, f_use_sep=spec_b,
        f_dq=spec_b, f_dp=spec_b, f_sqrt_info=spec_b,
        pr_il=spec_b, pr_q=spec_b, pr_p=spec_b, pr_sqrt_info=spec_b,
        sep_block=P(), sep_local=P(), sep_mask=P(),
    )
    return jax.jit(
        jax.shard_map(
            local_solver, mesh=mesh,
            in_specs=(in_specs,), out_specs=(spec_b, spec_b, P()),
        )
    )


def unpartition(q_blocks, p_blocks, n: int):
    """Block-shaped (B, Nb, ...) -> flat (n, ...) trajectory."""
    q = q_blocks.reshape(-1, q_blocks.shape[-1])[:n]
    p = p_blocks.reshape(-1, p_blocks.shape[-1])[:n]
    return q, p
