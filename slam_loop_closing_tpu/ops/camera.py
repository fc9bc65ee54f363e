"""Pinhole camera model: projection, 5-coefficient distortion, and its Newton
inverse.

TPU-native replacement for the reference's ``projectPoint`` (main.cpp:149-165),
``computeSingleReprojError`` (main.cpp:227-246), and the ``cv::undistort``
call sites (main.cpp:1114,1145). Instead of undistorting whole images, the
default path undistorts *keypoint coordinates only* via an iterative Newton
inverse of the distortion model — geometrically equivalent for this pipeline
and far cheaper; a full-image remap lives in :mod:`..ops.image` for parity.

All functions are single-point; ``vmap`` for batches. Points are (x, y) pixel
coordinates; 3D points are world coordinates; poses are world->camera (R, t).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BEHIND_CAMERA_ERROR = 1e9  # reference main.cpp:238 returns 1e9 if z <= 0


def project(K: jax.Array, R: jax.Array, t: jax.Array, X: jax.Array) -> jax.Array:
    """Pinhole projection K @ (R @ X + t) -> (u, v) (reference main.cpp:149-165).

    Returns (u, v, z_cam): callers gate on z_cam for cheirality.
    """
    Xc = R @ X + t
    z = Xc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = K[0, 0] * Xc[0] / z_safe + K[0, 2]
    v = K[1, 1] * Xc[1] / z_safe + K[1, 2]
    return jnp.stack([u, v, z])


def reproj_error(K: jax.Array, R: jax.Array, t: jax.Array,
                 X: jax.Array, obs: jax.Array) -> jax.Array:
    """Pixel reprojection error, 1e9 if behind camera (main.cpp:227-246)."""
    uvz = project(K, R, t, X)
    err = jnp.linalg.norm(uvz[:2] - obs)
    return jnp.where(uvz[2] <= 0.0, BEHIND_CAMERA_ERROR, err)


def distort_normalized(xy: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply the OpenCV 5-coefficient model (k1,k2,p1,p2,k3) to normalized
    camera coordinates ``xy`` (the forward model behind cv::undistort)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[0], xy[1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd])


def undistort_normalized(xy_dist: jax.Array, dist: jax.Array,
                         iterations: int = 8) -> jax.Array:
    """Invert :func:`distort_normalized` with damped fixed-point/Newton
    iterations (the same compensation loop OpenCV's undistortPoints runs).

    ``iterations`` is static so the loop unrolls under jit.
    """
    def body(_, xy):
        k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
        x, y = xy[0], xy[1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        inv_radial = 1.0 / jnp.where(jnp.abs(radial) < 1e-8, 1e-8, radial)
        return jnp.stack([(xy_dist[0] - dx) * inv_radial,
                          (xy_dist[1] - dy) * inv_radial])

    return jax.lax.fori_loop(0, iterations, body, xy_dist)


def pixel_to_normalized(K: jax.Array, uv: jax.Array) -> jax.Array:
    return jnp.stack([(uv[0] - K[0, 2]) / K[0, 0], (uv[1] - K[1, 2]) / K[1, 1]])


def normalized_to_pixel(K: jax.Array, xy: jax.Array) -> jax.Array:
    return jnp.stack([K[0, 0] * xy[0] + K[0, 2], K[1, 1] * xy[1] + K[1, 2]])


def undistort_points(K: jax.Array, dist: jax.Array, uv: jax.Array) -> jax.Array:
    """Undistort pixel keypoints: pixel -> normalized -> Newton inverse ->
    pixel (with the same K). Equivalent to detecting on a cv::undistort'ed
    image for point measurements (reference main.cpp:1114,1145)."""
    xy = pixel_to_normalized(K, uv)
    xy_u = undistort_normalized(xy, dist)
    return normalized_to_pixel(K, xy_u)


def distort_points(K: jax.Array, dist: jax.Array, uv: jax.Array) -> jax.Array:
    """Forward distortion of ideal pixel coordinates."""
    xy = pixel_to_normalized(K, uv)
    xy_d = distort_normalized(xy, dist)
    return normalized_to_pixel(K, xy_d)


# Batched conveniences -------------------------------------------------------

project_batch = jax.vmap(project, in_axes=(None, None, None, 0))
reproj_error_batch = jax.vmap(reproj_error, in_axes=(None, None, None, 0, 0))
undistort_points_batch = jax.vmap(undistort_points, in_axes=(None, None, 0))
distort_points_batch = jax.vmap(distort_points, in_axes=(None, None, 0))
