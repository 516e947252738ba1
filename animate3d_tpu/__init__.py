"""animate3d_tpu — a TPU-native (JAX/Flax/Pallas) framework for text-guided
animation of static 3D assets.

Capability target: yanqinJiang/Animate3D (two-stage pipeline):
  1. MV-VDM — multi-view video diffusion (MVDream-style cross-view spatial
     attention + AnimateDiff-style temporal motion modules + spatiotemporal
     attention + IP-Adapter / first-frame-clean I2V conditioning).
  2. 4D Gaussian-splat optimization — K-planes deformation field fitted to the
     generated multi-view video, with optional 4D-SDS refinement, ARAP
     regularization, and mesh / FBX export tooling.

Everything on the compute path is jit-compiled JAX; hot kernels (attention,
gaussian rasterization) are Pallas TPU kernels with XLA fallbacks; scaling is
expressed via jax.sharding Meshes rather than NCCL-style process groups.
"""

__version__ = "0.1.0"

from animate3d_tpu.core.registry import register, find, registered  # noqa: F401
