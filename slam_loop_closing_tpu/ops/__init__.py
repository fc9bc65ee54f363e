"""Batched numeric primitives: Lie-group ops, camera models, epipolar geometry,
RANSAC, feature detection/description, and descriptor matching.

Everything here is a pure function over fixed-shape arrays, safe under
``jax.jit`` / ``vmap`` / ``shard_map``; the hot paths have Pallas TPU kernels.
"""
