"""SO(3)/SE(3) operations: differentiable Rodrigues exp/log maps and pose
parameterization.

TPU-native replacement for the reference's ``cv::Rodrigues``-based pose
parameter ops (reference main.cpp:120-146 ``poseToParams``/``paramsToPose``)
and ``rotationError`` (main.cpp:262-268). Unlike the reference, which
differentiates these numerically with central differences (main.cpp:391-407),
every function here is smooth JAX code, so Jacobians come from autodiff.

Conventions (matching the reference):
* Poses are world->camera: ``x_cam = R @ X_world + t``.
* Pose params are 6-vectors ``[rvec; t]`` with ``R = exp(rvec)``.
* Relative edge: ``R_to = R_rel @ R_from``, ``t_to = R_rel @ t_from + t_rel``
  (reference main.cpp:78-86).

All functions operate on a single element; map over leading batch dims with
``jax.vmap`` (they are written to be vmap-safe: no data-dependent control
flow, singularities handled with Taylor-series branches selected by
``jnp.where`` on *both* the value and its inputs so gradients stay finite).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [w]_x of a 3-vector."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy]),
        jnp.stack([wz, z, -wx]),
        jnp.stack([-wy, wx, z]),
    ])


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`."""
    return jnp.stack([W[2, 1], W[0, 2], W[1, 0]])


def so3_exp(rvec: jax.Array) -> jax.Array:
    """Rodrigues' formula: axis-angle 3-vector -> rotation matrix.

    Smooth at theta = 0 via 2nd-order Taylor of sin(t)/t and (1-cos t)/t^2.
    """
    theta_sq = jnp.dot(rvec, rvec)
    small = theta_sq < 1e-8
    # Double-where pattern: the untaken branch must also be NaN-free under
    # autodiff, so the generic branch gets a safe (nonzero) theta.
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / theta_sq_safe)
    W = hat(rvec)
    return jnp.eye(3, dtype=rvec.dtype) + a * W + b * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle 3-vector (inverse Rodrigues).

    Robust at theta -> 0 (Taylor) and theta -> pi (diagonal extraction).
    AUTODIFF-SAFE: theta comes from ``atan2(sin, cos)``, never ``arccos``,
    whose derivative diverges at theta = 0 — with arccos the PGO edge
    Jacobians turn NaN exactly at convergence (R_pred^T R_to -> I).
    """
    trace = jnp.clip(jnp.trace(R), -1.0, 3.0)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - R.T) * 0.5  # = sin(theta) * axis
    sin_sq = jnp.dot(w, w)
    sin_theta = jnp.sqrt(sin_sq + 1e-30)
    theta = jnp.arctan2(sin_theta, cos_theta)

    near_zero = (sin_sq < 1e-10) & (cos_theta > 0.0)
    near_pi = theta > jnp.pi - 1e-3
    # Generic: rvec = theta / sin(theta) * w; near zero the Taylor series
    # theta/sin(theta) = 1 + sin^2/6 + O(sin^4) is a smooth polynomial in R.
    sin_safe = jnp.where(near_zero, 1.0, sin_theta)
    factor = jnp.where(near_zero, 1.0 + sin_sq / 6.0, theta / sin_safe)
    rvec_generic = factor * w

    # Near pi: axis from the largest diagonal of (R + I)/2 = aa^T (theta=pi).
    A = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.clip(jnp.diagonal(A), 0.0, 1.0)
    k = jnp.argmax(diag)
    axis_unnorm = A[:, k] / jnp.sqrt(jnp.maximum(diag[k], 1e-12))
    axis = axis_unnorm / jnp.maximum(jnp.linalg.norm(axis_unnorm), 1e-12)
    # Fix the sign so that exp(theta * axis) matches R: use w = 2 sin(theta) a;
    # near pi sin(theta) ~ 0 so w is unreliable — choose sign from the
    # off-diagonal that best matches. Sign ambiguity at exactly pi is benign
    # (exp(pi a) == exp(-pi a)).
    sign = jnp.where(jnp.dot(axis, w) < 0.0, -1.0, 1.0)
    rvec_pi = theta * axis * sign

    return jnp.where(near_pi, rvec_pi, rvec_generic)


def rotation_error(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Geodesic angle ||log(R1 @ R2^T)|| in radians (reference main.cpp:262-268)."""
    return jnp.linalg.norm(so3_log(R1 @ R2.T))


def pose_to_params(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> 6-vector [rvec; t] (reference main.cpp:120-132)."""
    return jnp.concatenate([so3_log(R), t])


def params_to_pose(p: jax.Array) -> tuple[jax.Array, jax.Array]:
    """6-vector [rvec; t] -> (R, t) (reference main.cpp:136-146)."""
    return so3_exp(p[:3]), p[3:]


def compose(R_rel: jax.Array, t_rel: jax.Array,
            R_from: jax.Array, t_from: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Chain a relative pose onto an absolute one (reference main.cpp:1216-1219):
    ``R_to = R_rel @ R_from``, ``t_to = R_rel @ t_from + t_rel``."""
    return R_rel @ R_from, R_rel @ t_from + t_rel


def relative(R_from: jax.Array, t_from: jax.Array,
             R_to: jax.Array, t_to: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Relative pose such that ``compose(rel, from) == to``."""
    R_rel = R_to @ R_from.T
    t_rel = t_to - R_rel @ t_from
    return R_rel, t_rel


def invert(R: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of a world->camera pose."""
    Rt = R.T
    return Rt, -Rt @ t


def camera_center(R: jax.Array, t: jax.Array) -> jax.Array:
    """Camera center in world coordinates: C = -R^T t (reference main.cpp:983)."""
    return -R.T @ t


def slerp_rvec(rvec: jax.Array, alpha: jax.Array) -> jax.Array:
    """Fractional rotation exp(alpha * log R) in axis-angle form — the
    linear-in-axis-angle interpolation used by ``simplePoseCorrection``
    (reference main.cpp:451-492)."""
    return alpha * rvec


# Batched conveniences -------------------------------------------------------

so3_exp_batch = jax.vmap(so3_exp)
so3_log_batch = jax.vmap(so3_log)
pose_to_params_batch = jax.vmap(pose_to_params)
params_to_pose_batch = jax.vmap(params_to_pose)
compose_batch = jax.vmap(compose)
camera_center_batch = jax.vmap(camera_center)
