"""Map outlier removal: vectorized masks + in-place invalidation.

TPU-native replacement for the reference's outlier-removal stage
(main.cpp:1557-1659, threshold at main.cpp:51). The reference marks points
that are (a) behind any observing camera, (b) reproject worse than
OUTLIER_REPROJ_THRESHOLD px in any observation, or (c) farther from the
camera centroid than max(distance_floor, distance_scale x max camera spread),
then compacts the point array and remaps observation indices. On fixed-shape
TPU arrays we *invalidate* instead of compacting — every consumer is already
mask-aware, so compaction (a data-dependent reshape) is unnecessary on
device; the host-side OBJ writer simply drops invalid points, which preserves
the reference's observable output exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_loop_closing_tpu.config import OutlierConfig
from slam_loop_closing_tpu.ops import lie
from slam_loop_closing_tpu.ops.ba import Observations, reprojection_errors


class OutlierResult(NamedTuple):
    point_valid: jax.Array   # [P] bool updated validity
    obs_valid: jax.Array     # [O] bool observations of surviving points
    n_points_before: jax.Array
    n_outliers: jax.Array    # total points removed (each counted once)
    n_behind: jax.Array      # points rejected: behind some camera
    n_reproj: jax.Array      # points rejected: reprojection error
    n_far: jax.Array         # points rejected: too far from camera centroid
    distance_threshold: jax.Array  # the max(floor, scale*spread) used


@functools.partial(jax.jit, static_argnames=("cfg",))
def remove_outliers(K: jax.Array, cam_params: jax.Array, cam_valid: jax.Array,
                    points: jax.Array, point_valid: jax.Array,
                    obs: Observations,
                    cfg: OutlierConfig = OutlierConfig()) -> OutlierResult:
    """Compute the reference's three outlier criteria as batched masks."""
    num_points = points.shape[0]

    Rs, ts = lie.params_to_pose_batch(cam_params)

    # (a) behind any observing camera: per-observation depth z <= 0.
    Xc_z = jnp.einsum("oj,oj->o", Rs[obs.cam, 2, :], points[obs.point]) \
        + ts[obs.cam, 2]
    behind_obs = obs.valid & (Xc_z <= 0.0)
    behind_pt = jnp.zeros((num_points,), bool).at[obs.point].max(behind_obs)

    # (b) reprojection error above threshold in any observation.
    errs = reprojection_errors(K, cam_params, points, obs)
    bad_obs = obs.valid & (errs > cfg.reproj_threshold_px)
    reproj_pt = jnp.zeros((num_points,), bool).at[obs.point].max(bad_obs)

    # (c) distance from the camera centroid (main.cpp:1601):
    # > max(floor, scale * max camera spread).
    centers = lie.camera_center_batch(Rs, ts)           # [N, 3]
    cmask = cam_valid[:, None]
    ncam = jnp.maximum(jnp.sum(cam_valid.astype(jnp.float32)), 1.0)
    centroid = jnp.sum(jnp.where(cmask, centers, 0.0), axis=0) / ncam
    spread = jnp.where(cam_valid,
                       jnp.linalg.norm(centers - centroid, axis=-1), 0.0)
    max_dist = jnp.maximum(cfg.distance_floor,
                           cfg.distance_scale * jnp.max(spread))
    far_pt = jnp.linalg.norm(points - centroid, axis=-1) > max_dist

    outlier = point_valid & (behind_pt | reproj_pt | far_pt)
    new_point_valid = point_valid & ~outlier
    new_obs_valid = obs.valid & new_point_valid[obs.point]

    cnt = lambda m: jnp.sum(m.astype(jnp.int32))
    return OutlierResult(
        point_valid=new_point_valid,
        obs_valid=new_obs_valid,
        n_points_before=cnt(point_valid),
        n_outliers=cnt(outlier),
        n_behind=cnt(point_valid & behind_pt),
        n_reproj=cnt(point_valid & reproj_pt),
        n_far=cnt(point_valid & far_pt),
        distance_threshold=max_dist,
    )
