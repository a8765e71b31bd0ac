"""Differentiable distance transforms and models built on them.

- ``soft``: squared EDT of a continuous "height field" (soft occupancy),
  exact hard-min with a memory-lean custom VJP, or smooth softmin
  (temperature > 0) — the capability the CPU reference cannot offer
  (its argmin is baked into sequential scans).
- ``distance_net``: a per-voxel MLP head trained with a
  distance-transform loss — the flagship end-to-end model used by
  bench/driver entry points.
- ``unet3d``: 3-D conv U-Net (MXU convs, optional bf16 compute) trained
  by distance-field regression; spatially sharded convs use ppermute
  halo exchange.
"""

from edt_tpu.models.soft import edtsq_from_heights, soft_edtsq, soft_sdfsq

__all__ = ["edtsq_from_heights", "soft_edtsq", "soft_sdfsq"]
