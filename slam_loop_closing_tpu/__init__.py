"""slam_loop_closing_tpu — a TPU-native SLAM loop-closing / SfM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
C++/OpenCV pipeline (F-Fer/SLAM-Loop-Closing):

* ``ops``      — batched geometry, feature, and matching primitives
                 (Pallas kernels for the hot paths: FAST, rBRIEF, Hamming matmul).
* ``models``   — user-facing pipelines: ``LoopClosingSystem`` (ORB multi-loop
                 detector, reference loop_closing.hpp:29-80), ``SfMPipeline``
                 (the main.cpp SfM backend), camera calibration.
* ``parallel`` — device-mesh sharding (pjit/shard_map) of the front-end,
                 all-pairs similarity, and RANSAC verification over ICI.
* ``utils``    — host-side IO: video extraction, OBJ/txt writers, logging,
                 checkpoints.

The compute path is functional and jit-friendly: fixed-shape padded arrays with
validity masks everywhere, so every stage runs under ``jax.jit`` / ``vmap`` /
``shard_map`` on TPU.
"""

import jax as _jax

# Geometry correctness requires full-f32 matmuls: TPU's default bf16 MXU
# passes lose ~3 decimal digits, which is fatal for 8-point/DLT solves. The
# framework's throughput-critical matmuls (descriptor matching) request their
# own precision explicitly (int8 / preferred_element_type), so the global
# default costs nothing on the hot path.
_jax.config.update("jax_default_matmul_precision", "highest")

from slam_loop_closing_tpu import config as config

__version__ = "0.1.0"

__all__ = ["config", "__version__"]
