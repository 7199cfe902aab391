"""patchmatchnet_tpu — a TPU-native (JAX/XLA/Pallas) multi-view stereo framework.

Provides the full capability surface of PatchmatchNet (CVPR 2021): learned,
coarse-to-fine, iterative differentiable PatchMatch depth estimation from
calibrated multi-view images, plus the surrounding pipeline — dataset loading,
training, inference, photometric/geometric depth fusion to colored point
clouds, dataset converters and COLMAP interop.

Design is TPU-first: NHWC layouts, static shapes, functional flax modules,
`jax.sharding`-based data parallelism, and Pallas kernels for the gather-heavy
bilinear sampling ops at the core of the PatchMatch loop.
"""

__version__ = "0.1.0"
