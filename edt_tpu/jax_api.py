"""Device-native API: jittable, jnp-in/jnp-out, composable with jax
transforms (jit/grad/vmap/shard_map).

    import edt_tpu.jax_api as edtj
    d2 = edtj.edtsq(labels, (1.0, 1.0, 1.0), black_border=True)

For the NumPy drop-in API use the top-level edt_tpu module instead.
"""

from edt_tpu.ops.compose import (
    edt,
    edtsq,
    sdf,
    sdfsq,
    default_minplus_fn,
    default_parabolic_fn,
)
from edt_tpu.ops.voxel_graph import edtsq_voxel_graph_jnp
from edt_tpu.models.soft import (
    edtsq_from_heights,
    soft_edtsq,
    soft_sdfsq,
    default_barrier,
)
from edt_tpu.parallel.sharded import (
    default_mesh,
    edtsq_sharded,
    edtsq_sharded_auto,
    edt_sharded,
    sdf_sharded,
    edtsq_voxel_graph_sharded,
)

__all__ = [
    "edt", "edtsq", "sdf", "sdfsq",
    "default_minplus_fn", "default_parabolic_fn",
    "edtsq_voxel_graph_jnp",
    "edtsq_from_heights", "soft_edtsq", "soft_sdfsq", "default_barrier",
    "default_mesh", "edtsq_sharded", "edtsq_sharded_auto", "edt_sharded",
    "sdf_sharded", "edtsq_voxel_graph_sharded",
]
