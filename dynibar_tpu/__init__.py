"""dynibar_tpu — a TPU-native dynamic-scene image-based-rendering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of google/dynibar
(DynIBaR, CVPR 2023): per-scene training and novel space-time view rendering
of dynamic videos via time-invariant static + time-varying dynamic IBR models
with a learned motion-trajectory field.

Design stance (differs from the reference's CUDA/torch architecture):
  * the whole render core is one pure function compiled by XLA — ray
    sampling, trajectory evaluation, epipolar projection, bilinear feature
    gathering, view aggregation, ray-transformer attention and dual-field
    alpha compositing all fuse into a single program;
  * all shapes are static (rays, samples, views are compile-time constants);
    ragged view counts from the reference become pad-to-max + validity masks;
  * scaling is a `jax.sharding.Mesh` with rays as the sharded batch axis —
    the reference's nn.DataParallel / NCCL path maps to XLA collectives.
"""

__version__ = "0.1.0"

from dynibar_tpu.config import DynibarConfig, RenderSettings  # noqa: F401
