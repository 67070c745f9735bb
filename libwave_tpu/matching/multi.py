"""Batched multi-matching: N registrations in flight at once.

Capability parity with the reference's ``MultiMatcher<T, R>`` thread pool
(wave_matching/include/wave/matching/multi_matcher.hpp:30-95,
impl/multi_matcher_impl.hpp:29-62: N worker threads over a mutex/condvar job
queue, insert(id, src, tgt) / getResult). On TPU the pool is simply ``vmap``:
a batch of (ref, target) cloud pairs registers simultaneously on one chip,
and sharding the batch axis over a mesh spreads pairs across devices (the
distributed replacement for hardware_concurrency threads).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libwave_tpu.matching.icp import ICPParams, icp_match
from libwave_tpu.matching.pointcloud import PointCloud


def multi_match(refs: PointCloud, targets: PointCloud,
                params: ICPParams = ICPParams(), matcher=icp_match):
    """Register a batch of pairs. ``refs``/``targets`` carry a leading batch
    axis on points (B, N, 3) and mask (B, N). Returns the batched matcher
    result (e.g. ICPResult with leading batch dims).

    Shard the batch axis over a mesh ('dp') to distribute pairs across
    devices (or call :func:`multi_match_sharded`, which does the placement).
    """
    return jax.vmap(lambda r, rm, t, tm: matcher(
        PointCloud(points=r, mask=rm), PointCloud(points=t, mask=tm), params
    ))(refs.points, refs.mask, targets.points, targets.mask)


def multi_match_sharded(refs: PointCloud, targets: PointCloud, mesh: Mesh,
                        params: ICPParams = ICPParams(), matcher=icp_match,
                        axis_name: str = "dp"):
    """The MultiMatcher's multi-DEVICE promotion: place the pair batch over
    the mesh axis and let GSPMD run each device's pairs locally — the
    reference's ``hardware_concurrency`` worker threads
    (multi_matcher.hpp:30) become chips. The batch size must divide the
    mesh axis size; every per-pair computation is independent, so no
    collectives are inserted on the hot path.

    Returns the batched result with the batch axis sharded over the mesh
    (gather with ``jax.device_get`` / read per-shard as needed).
    """
    B = refs.points.shape[0]
    n_dev = int(mesh.shape[axis_name])
    if B % n_dev != 0:
        raise ValueError(
            f"batch of {B} pairs must be divisible by the {n_dev} devices "
            f"on mesh axis '{axis_name}'; pad with masked pairs"
        )
    sh = NamedSharding(mesh, P(axis_name))

    def put(cloud):
        return PointCloud(
            points=jax.device_put(cloud.points, sh),
            mask=jax.device_put(cloud.mask, sh),
        )

    f = jax.jit(lambda r, t: multi_match(r, t, params, matcher))
    return f(put(refs), put(targets))
