"""Multi-chip / multi-host execution over a JAX device mesh."""

from edt_tpu.parallel.sharded import (
    edtsq_sharded,
    edt_sharded,
    sdf_sharded,
    edtsq_voxel_graph_sharded,
)

__all__ = [
    "edtsq_sharded",
    "edt_sharded",
    "sdf_sharded",
    "edtsq_voxel_graph_sharded",
]
