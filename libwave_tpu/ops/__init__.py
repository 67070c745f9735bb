"""Pallas TPU kernels for hot ops.

Where XLA's automatic fusion is not enough, ops here are hand-tiled Pallas
kernels (SURVEY.md §2.8: "Pallas kernels: tiled FAST/BRISK over image
blocks, Hamming top-k matching..."). Each kernel has a reference jnp
implementation it is tested against, and interpret-mode fallback off-TPU.
"""

from libwave_tpu.ops.hamming import hamming_distance_pallas  # noqa: F401
