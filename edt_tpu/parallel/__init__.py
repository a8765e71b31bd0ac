"""Multi-chip / multi-host execution over a JAX device mesh."""

from edt_tpu.parallel.sharded import (
    default_mesh,
    edtsq_sharded,
    edtsq_sharded_auto,
    edt_sharded,
    sdf_sharded,
    edtsq_voxel_graph_sharded,
)

__all__ = [
    "default_mesh",
    "edtsq_sharded",
    "edtsq_sharded_auto",
    "edt_sharded",
    "sdf_sharded",
    "edtsq_voxel_graph_sharded",
]
