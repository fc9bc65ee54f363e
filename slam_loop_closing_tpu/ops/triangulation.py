"""Gated two-view triangulation: batched DLT + the reference's acceptance
gates, with per-rejection-class counters.

TPU-native replacement for the triangulation block of the reference's
keyframe loop (main.cpp:1221-1346): ``cv::triangulatePoints`` on the inlier
matches followed by per-point filters — cheirality in both views, relative
depth within [MIN_DEPTH, MAX_DEPTH] x baseline, parallax >= MIN_PARALLAX_DEG,
reprojection <= MAX_REPROJ_ERROR px in both views — and counters for each
rejection class (printed at main.cpp:1343-1346; we return them so the logger
can reproduce those lines). All gates are vectorized masks over the fixed-size
match array.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_loop_closing_tpu.config import TriangulationConfig
from slam_loop_closing_tpu.ops import camera as camera_ops
from slam_loop_closing_tpu.ops import epipolar, lie


class TriangulationResult(NamedTuple):
    X: jax.Array          # [N, 3] world points (junk where not accepted)
    accept: jax.Array     # [N] bool — passed every gate
    depths1: jax.Array    # [N] camera-1 depths
    n_input: jax.Array    # int32 candidate count
    n_behind: jax.Array   # int32 rejected: behind a camera
    n_depth: jax.Array    # int32 rejected: depth outside [min,max]*baseline
    n_parallax: jax.Array  # int32 rejected: parallax below threshold
    n_reproj: jax.Array   # int32 rejected: reprojection error too large


@functools.partial(jax.jit, static_argnames=("cfg",))
def triangulate_gated(K: jax.Array,
                      R1: jax.Array, t1: jax.Array,
                      R2: jax.Array, t2: jax.Array,
                      x1: jax.Array, x2: jax.Array,
                      uv1: jax.Array, uv2: jax.Array,
                      mask: jax.Array,
                      cfg: TriangulationConfig = TriangulationConfig()
                      ) -> TriangulationResult:
    """Triangulate matched pairs between two posed views and gate them.

    Args:
      K: [3, 3] intrinsics (for the pixel reprojection gate).
      R1, t1, R2, t2: world->camera poses of the two views.
      x1, x2: [N, 2] matched points in NORMALIZED camera coordinates.
      uv1, uv2: [N, 2] the same matches in PIXEL coordinates.
      mask: [N] bool valid-match mask (RANSAC inliers).
    """
    # Inhomogeneous linear triangulation (3x3 closed form): ~10x faster on
    # TPU than the batched 4x4-SVD DLT; the depth/parallax/reproj gates
    # below and the later bundle adjustment govern final quality.
    X = epipolar.triangulate_linear(R1, t1, R2, t2, x1, x2)

    z1 = epipolar.depths(R1, t1, X)
    z2 = epipolar.depths(R2, t2, X)
    in_front = (z1 > 0) & (z2 > 0)

    C1 = lie.camera_center(R1, t1)
    C2 = lie.camera_center(R2, t2)
    baseline = jnp.maximum(jnp.linalg.norm(C2 - C1), 1e-12)
    rel_depth = z1 / baseline
    depth_ok = (rel_depth >= cfg.min_depth_rel) & (rel_depth <= cfg.max_depth_rel)

    par = epipolar.parallax_angle_deg(C1, C2, X)
    parallax_ok = par >= cfg.min_parallax_deg

    e1 = camera_ops.reproj_error_batch(K, R1, t1, X, uv1)
    e2 = camera_ops.reproj_error_batch(K, R2, t2, X, uv2)
    reproj_ok = (e1 <= cfg.max_reproj_error_px) & (e2 <= cfg.max_reproj_error_px)

    accept = mask & in_front & depth_ok & parallax_ok & reproj_ok

    # Rejection counters, attributed in the reference's gate order
    # (main.cpp:1261-1341): behind -> depth -> parallax -> reproj.
    def cnt(m):
        return jnp.sum(m.astype(jnp.int32))

    behind = mask & ~in_front
    depth_rej = mask & in_front & ~depth_ok
    par_rej = mask & in_front & depth_ok & ~parallax_ok
    reproj_rej = mask & in_front & depth_ok & parallax_ok & ~reproj_ok

    return TriangulationResult(
        X=X, accept=accept, depths1=z1,
        n_input=cnt(mask), n_behind=cnt(behind), n_depth=cnt(depth_rej),
        n_parallax=cnt(par_rej), n_reproj=cnt(reproj_rej))
