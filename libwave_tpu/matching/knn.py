"""Nearest-neighbour search as chunked MXU matmuls.

The TPU replacement for PCL's kd-trees (used inside
pcl::IterativeClosestPoint's correspondence estimation): squared distances
``|p|^2 - 2 p.q + |q|^2`` computed as a (N, 3) x (3, C) matmul per target
chunk with a running (min, argmin) — dense, branch-free, and fast on the MXU
for the downsampled cloud sizes registration uses (<= tens of thousands of
points). Verified against an exact O(N*M) oracle in tests (the "host C++
exact oracle" strategy of SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from libwave_tpu.utils.precision import f32_matmuls

_INF = float("inf")  # plain float: no backend init at import time


@f32_matmuls
def nearest_neighbor(query, query_mask, target, target_mask, chunk: int = 2048):
    """For each query point, index + squared distance of its nearest valid
    target point. Returns (idx (N,), dist2 (N,)); masked queries get idx 0
    and dist2 inf.
    """
    N = query.shape[0]
    M = target.shape[0]
    chunk = min(chunk, M)
    num_chunks = -(-M // chunk)
    pad = num_chunks * chunk - M
    tgt = jnp.concatenate(
        [target, jnp.zeros((pad, 3), target.dtype)], axis=0
    )
    tmask = jnp.concatenate([target_mask, jnp.zeros((pad,), bool)], axis=0)
    q2 = jnp.sum(query * query, axis=-1)  # (N,)

    def body(carry, c):
        best_d, best_i = carry
        t = jax.lax.dynamic_slice_in_dim(tgt, c * chunk, chunk, axis=0)
        tm = jax.lax.dynamic_slice_in_dim(tmask, c * chunk, chunk, axis=0)
        t2 = jnp.sum(t * t, axis=-1)
        d2 = q2[:, None] - 2.0 * (query @ t.T) + t2[None, :]  # (N, chunk)
        d2 = jnp.where(tm[None, :], d2, _INF)
        i = jnp.argmin(d2, axis=1)
        d = jnp.take_along_axis(d2, i[:, None], axis=1)[:, 0]
        take = d < best_d
        return (
            jnp.where(take, d, best_d),
            jnp.where(take, (c * chunk + i).astype(jnp.int32), best_i),
        ), None

    init = (jnp.full((N,), _INF, dtype=query.dtype), jnp.zeros((N,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
    best_d = jnp.where(query_mask, best_d, _INF)
    return best_i, jnp.maximum(best_d, 0.0)


@f32_matmuls
def knn(query, query_mask, target, target_mask, k: int, chunk: int = 2048):
    """k nearest valid targets per query. Returns (idx (N, k), dist2 (N, k)).

    Maintains a running top-k across chunks via concatenate + top_k.
    """
    N = query.shape[0]
    M = target.shape[0]
    chunk = min(chunk, M)
    num_chunks = -(-M // chunk)
    pad = num_chunks * chunk - M
    tgt = jnp.concatenate([target, jnp.zeros((pad, 3), target.dtype)], axis=0)
    tmask = jnp.concatenate([target_mask, jnp.zeros((pad,), bool)], axis=0)
    q2 = jnp.sum(query * query, axis=-1)

    def body(carry, c):
        best_d, best_i = carry  # (N, k) each
        t = jax.lax.dynamic_slice_in_dim(tgt, c * chunk, chunk, axis=0)
        tm = jax.lax.dynamic_slice_in_dim(tmask, c * chunk, chunk, axis=0)
        t2 = jnp.sum(t * t, axis=-1)
        d2 = q2[:, None] - 2.0 * (query @ t.T) + t2[None, :]
        d2 = jnp.where(tm[None, :], d2, _INF)
        ii = jnp.broadcast_to(
            (c * chunk + jnp.arange(chunk))[None, :], d2.shape
        ).astype(jnp.int32)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, ii], axis=1)
        negd, sel = jax.lax.top_k(-cat_d, k)
        return (-negd, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (
        jnp.full((N, k), _INF, dtype=query.dtype),
        jnp.zeros((N, k), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
    best_d = jnp.where(query_mask[:, None], best_d, _INF)
    return best_i, jnp.maximum(best_d, 0.0)
