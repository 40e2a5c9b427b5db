"""kinet_tpu — a TPU-native multi-object-tracking framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Kinet/TrackFormer
(reference: LuisCossioUOH/Kinet): DETR and Deformable-DETR detection,
track-query tracking (TrackFormer), and the image-free kinematic tracking
family (KineT), built TPU-first:

- all model code is functional (flax.linen) and jit/pjit-compiled with
  static shapes (padded batches + validity masks instead of the reference's
  variable-length NestedTensor concats),
- multi-scale deformable attention is a Pallas TPU kernel with an XLA
  gather fallback as the correctness oracle,
- Hungarian matching runs on-device (JAX Jonker-Volgenant) instead of a
  per-step host sync,
- scaling is a jax.sharding Mesh + shard_map/pjit data-parallel step
  (reference: NCCL DDP, src/train.py:89-91).
"""

__version__ = "0.1.0"
