"""edt_tpu — TPU-native multi-label anisotropic Euclidean Distance Transform.

A from-scratch JAX/XLA/Pallas framework with the capability set of the
reference CPU library ``edt`` (seung-lab/euclidean-distance-transform-3d):
multi-label anisotropic EDT of 1D/2D/3D volumes, signed distance fields,
voxel-connectivity-graph variants, and fast per-label extraction — plus what
the CPU library cannot do: differentiable (soft) distance transforms and
multi-chip sharded execution over a TPU mesh.

Public NumPy-facing API (drop-in for the reference package ``edt``):
  edt, edtsq, sdf, sdfsq,
  edt1d, edt1dsq, edt2d, edt2dsq, edt3d, edt3dsq,
  each, runs, draw, erase, transfer, reshape

Device-native (jittable, jnp in/out) API lives in ``edt_tpu.jax_api``;
differentiable transforms in ``edt_tpu.models``; sharded multi-chip
execution in ``edt_tpu.parallel``.
"""

from edt_tpu.api import (
    edt,
    edtsq,
    sdf,
    sdfsq,
    edt1d,
    edt1dsq,
    edt2d,
    edt2dsq,
    edt3d,
    edt3dsq,
    binary_edt,
    binary_edtsq,
)
from edt_tpu.rle import each, runs, draw, erase, transfer, reshape

__version__ = "0.2.0"

__all__ = [
    "edt", "edtsq", "sdf", "sdfsq",
    "edt1d", "edt1dsq", "edt2d", "edt2dsq", "edt3d", "edt3dsq",
    "binary_edt", "binary_edtsq",
    "each", "runs", "draw", "erase", "transfer", "reshape",
    "__version__",
]
