"""Wall-count sentinel values — the single source of truth.

Wall fields stream into the walled argmin kernel as integer COUNTS
(distance in voxels to the nearest label-boundary wall,
edt_tpu.models.soft._wall_counts); a count at or above the sentinel means
"open side" and reads as an INF wall. The sentinel must exceed any
legitimate count (n + 1), which is why int16 counts require n <= 16000
(enforced at the kernel entry, pallas_kernels.minplus_argmin_pallas).

Kept in a leaf module with no jax/pallas imports so both the kernel layer
(ops.pallas_kernels) and the model layer (models.soft) import the same
literals instead of keeping duplicates in sync by test assertion.
"""

WALL_SENT16 = 30000
WALL_SENT32 = 1 << 30
