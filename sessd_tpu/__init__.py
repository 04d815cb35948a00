"""SE-SSD TPU: a TPU-native (JAX/XLA/Pallas) re-design of SE-SSD (CVPR 2021).

Brand-new framework with the capabilities of Vegeta2020/SE-SSD (a Det3D-based
LiDAR-only 3D detector with self-ensembling teacher/student training), built
idiomatically for TPU:

- host data pipeline emits fixed-capacity padded voxel tensors;
- one jitted train step holds teacher forward + student forward + all losses
  (ODIoU, consistency, IoU-pred, focal) + the EMA update;
- the spconv backbone is replaced by a gather-matmul sparse conv engine whose
  rulebooks are built on-device with sort/searchsorted (no CUDA, no dense grid);
- rotated-box IoU / NMS / ODIoU are vectorized XLA (with Pallas variants for
  the hot paths) instead of CUDA extensions;
- scaling is a `jax.sharding.Mesh` data axis under jit (XLA emits the
  gradient all-reduce), not NCCL process groups.
"""

__version__ = "0.1.0"
