"""Core TPU-native EDT operators.

- ``core``:   segment bookkeeping, first-axis closed-form pass, masked
              min-plus (tropical) parabolic pass — pure jnp, exact.
- ``compose``: N-D composition (x/y/z axis sweeps) — the jittable entry.
- ``pallas_kernels``: hand-tiled Pallas TPU kernels for the hot min-plus op.
- ``voxel_graph``: 2x-upsampled connectivity-gated variant.
"""
