"""Alternating bundle adjustment: motion-only and structure-only Gauss-Newton
over ALL cameras / ALL points simultaneously.

TPU-native replacement for the reference's ``refineCameraPoseGN``
(main.cpp:632-743), ``refinePointGN`` (main.cpp:757-858),
``computeReprojectionError`` (main.cpp:871-896) and
``alternatingBundleAdjustment`` (main.cpp:905-943). The reference loops over
cameras and points one at a time with numeric Jacobians (hot loop #4). Here
the whole observation set is one SoA array; each pass is:

1. one vmapped autodiff Jacobian over all observations ([O, 2, 6] or
   [O, 2, 3] blocks),
2. a segment-sum scatter assembling per-camera 6x6 (or per-point 3x3) normal
   equations,
3. one batched tiny-Cholesky solve updating every camera (or point) at once.

Each camera/point sub-problem is independent given the other group fixed —
exactly the structure the reference exploits, but embarrassingly parallel
here. Observations are SoA with a validity mask (SURVEY.md §2.5):
``obs_cam [O] int32, obs_point [O] int32, obs_uv [O, 2] float32,
obs_valid [O] bool``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_loop_closing_tpu.config import BaConfig
from slam_loop_closing_tpu.ops import epipolar, lie


class Observations(NamedTuple):
    cam: jax.Array    # [O] int32 camera index
    point: jax.Array  # [O] int32 point index
    uv: jax.Array     # [O, 2] float32 pixel measurement
    valid: jax.Array  # [O] bool


def _project_params(K: jax.Array, cam_params: jax.Array,
                    X: jax.Array) -> jax.Array:
    """Projection as a smooth function of the 6-vector camera params (the
    function whose autodiff Jacobian replaces the reference's central
    differences, main.cpp:676-696)."""
    R, t = lie.params_to_pose(cam_params)
    Xc = R @ X + t
    z = Xc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return jnp.stack([K[0, 0] * Xc[0] / z_safe + K[0, 2],
                      K[1, 1] * Xc[1] / z_safe + K[1, 2]])


def _obs_residual(K, cam_params, X, uv):
    return _project_params(K, cam_params, X) - uv


def reprojection_errors(K: jax.Array, cam_params: jax.Array, points: jax.Array,
                        obs: Observations) -> jax.Array:
    """[O] pixel reprojection error per observation (0 where invalid)."""
    r = jax.vmap(_obs_residual, in_axes=(None, 0, 0, 0))(
        K, cam_params[obs.cam], points[obs.point], obs.uv)
    e = jnp.linalg.norm(r, axis=-1)
    return jnp.where(obs.valid, e, 0.0)


def mean_reprojection_error(K, cam_params, points, obs: Observations):
    """Mean pixel error over valid observations (reference
    ``computeReprojectionError`` main.cpp:871-896 — the printed quality
    metric before/after BA, main.cpp:1543-1555)."""
    e = reprojection_errors(K, cam_params, points, obs)
    n = jnp.sum(obs.valid.astype(jnp.float32))
    return jnp.sum(e) / jnp.maximum(n, 1.0)


def _per_obs_jacobians_cam(K, cam_params, points, obs: Observations):
    """[O, 2] residuals and [O, 2, 6] Jacobians wrt the observing camera."""
    def one(cp, X, uv):
        r = _obs_residual(K, cp, X, uv)
        J = jax.jacfwd(_obs_residual, argnums=1)(K, cp, X, uv)
        return r, J
    r, J = jax.vmap(one)(cam_params[obs.cam], points[obs.point], obs.uv)
    r = jnp.where(obs.valid[:, None], r, 0.0)
    J = jnp.where(obs.valid[:, None, None], J, 0.0)
    return r, J


def _per_obs_jacobians_point(K, cam_params, points, obs: Observations):
    """[O, 2] residuals and [O, 2, 3] Jacobians wrt the observed point."""
    def one(cp, X, uv):
        r = _obs_residual(K, cp, X, uv)
        J = jax.jacfwd(_obs_residual, argnums=2)(K, cp, X, uv)
        return r, J
    r, J = jax.vmap(one)(cam_params[obs.cam], points[obs.point], obs.uv)
    r = jnp.where(obs.valid[:, None], r, 0.0)
    J = jnp.where(obs.valid[:, None, None], J, 0.0)
    return r, J


def _solve_damped(H: jax.Array, g: jax.Array, damping: float) -> jax.Array:
    """Batched solve of (H + damping*I) delta = -g for tiny blocks
    ([B, d, d], [B, d]) — the LM step of the reference with its fixed
    damping (main.cpp:676, 800). 3x3 blocks (the per-point solves, tens of
    thousands per iteration) use the closed-form adjugate solve; larger
    blocks (the ~hundred 6x6 camera solves) go through the LU custom call."""
    d = H.shape[-1]
    Hd = H + damping * jnp.eye(d, dtype=H.dtype)[None]
    if d == 3:
        return -epipolar._solve3x3(Hd, g)
    return -jnp.linalg.solve(Hd, g[..., None])[..., 0]


@functools.partial(jax.jit, static_argnames=("iterations", "damping",
                                             "min_observations"))
def refine_cameras(K: jax.Array, cam_params: jax.Array, points: jax.Array,
                   obs: Observations, fixed_mask: jax.Array | None = None,
                   iterations: int = 5, damping: float = 1e-3,
                   min_observations: int = 10) -> jax.Array:
    """Motion-only GN for ALL cameras at once (reference
    ``refineCameraPoseGN`` main.cpp:632-743, vmapped per SURVEY.md §2.7).

    Cameras with fewer than ``min_observations`` valid observations are left
    untouched (main.cpp:648); ``fixed_mask`` ([N] bool) additionally freezes
    cameras (the reference fixes camera 0 during BA).
    """
    n = cam_params.shape[0]
    counts = jnp.zeros((n,), jnp.int32).at[obs.cam].add(
        obs.valid.astype(jnp.int32))
    movable = counts >= min_observations
    if fixed_mask is not None:
        movable = movable & ~fixed_mask

    def _errs(cp):
        e = reprojection_errors(K, cp, points, obs) ** 2
        return jnp.zeros((n,), cp.dtype).at[obs.cam].add(e)

    def body(_, carry):
        cp, err_cp = carry
        r, J = _per_obs_jacobians_cam(K, cp, points, obs)
        # H_c = sum_o J_o^T J_o, g_c = sum_o J_o^T r_o  (per camera)
        JTJ = jnp.einsum("oik,oil->okl", J, J)
        JTr = jnp.einsum("oik,oi->ok", J, r)
        H = jnp.zeros((n, 6, 6), cp.dtype).at[obs.cam].add(JTJ)
        g = jnp.zeros((n, 6), cp.dtype).at[obs.cam].add(JTr)
        delta = _solve_damped(H, g, damping)
        delta = jnp.where(movable[:, None], delta, 0.0)
        # LM acceptance per camera: keep the step only if that camera's
        # total squared error improves and stays finite (points behind the
        # camera give exploding 1/z Jacobians that otherwise diverge to NaN).
        # The incumbent's error is carried, not recomputed.
        cand = cp + delta
        err_cand = _errs(cand)
        better = (err_cand <= err_cp) & jnp.all(jnp.isfinite(cand), axis=1)
        return (jnp.where(better[:, None], cand, cp),
                jnp.where(better, err_cand, err_cp))

    out, _ = jax.lax.fori_loop(0, iterations, body,
                               (cam_params, _errs(cam_params)))
    return out


@functools.partial(jax.jit, static_argnames=("iterations", "damping",
                                             "min_observations"))
def refine_points(K: jax.Array, cam_params: jax.Array, points: jax.Array,
                  obs: Observations, point_valid: jax.Array | None = None,
                  iterations: int = 5, damping: float = 1e-3,
                  min_observations: int = 2) -> jax.Array:
    """Structure-only GN for ALL points at once (reference ``refinePointGN``
    main.cpp:757-858, vmapped)."""
    p = points.shape[0]
    counts = jnp.zeros((p,), jnp.int32).at[obs.point].add(
        obs.valid.astype(jnp.int32))
    movable = counts >= min_observations
    if point_valid is not None:
        movable = movable & point_valid

    def _errs(pts):
        e = reprojection_errors(K, cam_params, pts, obs) ** 2
        return jnp.zeros((p,), pts.dtype).at[obs.point].add(e)

    def body(_, carry):
        pts, err_pts = carry
        r, J = _per_obs_jacobians_point(K, cam_params, pts, obs)
        JTJ = jnp.einsum("oik,oil->okl", J, J)
        JTr = jnp.einsum("oik,oi->ok", J, r)
        H = jnp.zeros((p, 3, 3), pts.dtype).at[obs.point].add(JTJ)
        g = jnp.zeros((p, 3), pts.dtype).at[obs.point].add(JTr)
        delta = _solve_damped(H, g, damping)
        delta = jnp.where(movable[:, None], delta, 0.0)
        # per-point LM acceptance (see refine_cameras)
        cand = pts + delta
        err_cand = _errs(cand)
        better = (err_cand <= err_pts) & jnp.all(jnp.isfinite(cand), axis=1)
        return (jnp.where(better[:, None], cand, pts),
                jnp.where(better, err_cand, err_pts))

    out, _ = jax.lax.fori_loop(0, iterations, body, (points, _errs(points)))
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "outer_iterations"))
def alternating_ba(K: jax.Array, cam_params: jax.Array, points: jax.Array,
                   obs: Observations, point_valid: jax.Array | None = None,
                   cfg: BaConfig = BaConfig(),
                   outer_iterations: int | None = None):
    """Alternating BA (reference main.cpp:905-943): each outer iteration
    refines every camera (cameras independent, points fixed) then every point
    (points independent, cameras fixed). Camera 0 stays fixed as the gauge.

    Returns (cam_params, points, per-outer-iter mean reprojection error).
    """
    outer = cfg.outer_iterations if outer_iterations is None else outer_iterations
    n = cam_params.shape[0]
    fixed = jnp.zeros((n,), bool).at[0].set(True)

    def body(carry, _):
        cp, pts = carry
        cp = refine_cameras(K, cp, pts, obs, fixed,
                            cfg.camera_gn_iterations, cfg.camera_damping,
                            cfg.min_camera_observations)
        pts = refine_points(K, cp, pts, obs, point_valid,
                            cfg.point_gn_iterations, cfg.point_damping,
                            cfg.min_point_observations)
        return (cp, pts), mean_reprojection_error(K, cp, pts, obs)

    (cp, pts), errs = jax.lax.scan(body, (cam_params, points), None,
                                   length=outer)
    return cp, pts, errs
