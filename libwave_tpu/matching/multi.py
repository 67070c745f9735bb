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

from libwave_tpu.matching.icp import ICPParams, icp_match
from libwave_tpu.matching.pointcloud import PointCloud


def multi_match(refs: PointCloud, targets: PointCloud,
                params: ICPParams = ICPParams(), matcher=icp_match):
    """Register a batch of pairs. ``refs``/``targets`` carry a leading batch
    axis on points (B, N, 3) and mask (B, N). Returns the batched matcher
    result (e.g. ICPResult with leading batch dims).

    Shard the batch axis over a mesh ('dp') to distribute pairs across
    devices.
    """
    return jax.vmap(lambda r, rm, t, tm: matcher(
        PointCloud(points=r, mask=rm), PointCloud(points=t, mask=tm), params
    ))(refs.points, refs.mask, targets.points, targets.mask)
