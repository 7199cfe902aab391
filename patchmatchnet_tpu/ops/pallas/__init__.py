"""Pallas TPU kernels with jnp-reference fallbacks."""

from patchmatchnet_tpu.ops.pallas.similarity_kernel import warped_group_similarity

__all__ = ["warped_group_similarity"]
