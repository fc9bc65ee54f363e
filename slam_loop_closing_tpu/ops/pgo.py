"""Pose-graph optimization: batched Gauss-Newton / Levenberg-Marquardt with
analytic (autodiff) Jacobians, plus the linear drift-spread correction.

TPU-native replacement for the reference's ``optimizePoseGraph``
(main.cpp:282-445) and ``simplePoseCorrection`` (main.cpp:451-492). The
reference evaluates a NUMERIC central-difference Jacobian — 2 x params full
residual re-evaluations per iteration (its hot loop #3, main.cpp:391-407) —
and solves dense Cholesky per iteration. Here:

* residuals are a pure function of the [N, 6] pose parameters, so per-edge
  Jacobian blocks come from one vmapped ``jax.jacfwd`` (exact, and ~params/2
  times cheaper than central differences);
* the normal equations are assembled by segment-sum scatter of [6, 6] blocks
  (every edge in parallel);
* small problems (N <= cfg.dense_solver_max_poses) use a dense Cholesky
  solve; large ones (the 10k-pose north-star config, BASELINE.json
  configs[4]) switch to matrix-free preconditioned CG whose Hx product is
  two gathers + a batched [6,12] block multiply + a scatter-add per edge —
  O(E) memory instead of O(N^2).

Residual convention per edge (identical to the reference, main.cpp:334-359):
``r = sqrt(w) * [log(R_pred^T R_to); t_to - (R_rel t_from + t_rel)]`` with
``R_pred = R_rel R_from``. Pose 0 is gauge-fixed (main.cpp:300: pose 0 not
part of the parameter vector); we keep an [N, 6] parameter array and project
pose 0's update to zero, which is equivalent and keeps shapes uniform.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_loop_closing_tpu.config import PgoConfig
from slam_loop_closing_tpu.ops import lie


class PoseGraph(NamedTuple):
    """Edge list as SoA arrays (fixed capacity; pad with mask=False)."""

    e_from: jax.Array   # [E] int32
    e_to: jax.Array     # [E] int32
    R_rel: jax.Array    # [E, 3, 3]
    t_rel: jax.Array    # [E, 3]
    weight: jax.Array   # [E] float32 (reference: 1 sequential, 10 loop)
    mask: jax.Array     # [E] bool


def edge_residual(p_from: jax.Array, p_to: jax.Array, R_rel: jax.Array,
                  t_rel: jax.Array, weight: jax.Array) -> jax.Array:
    """6-vector residual of one edge given 6-vector pose params
    (reference main.cpp:334-359)."""
    R_from, t_from = lie.params_to_pose(p_from)
    R_to, t_to = lie.params_to_pose(p_to)
    R_pred = R_rel @ R_from
    r_rot = lie.so3_log(R_pred.T @ R_to)
    r_t = t_to - (R_rel @ t_from + t_rel)
    return jnp.sqrt(weight) * jnp.concatenate([r_rot, r_t])


def residuals(params: jax.Array, g: PoseGraph) -> jax.Array:
    """[E, 6] stacked residuals (masked edges -> 0)."""
    r = jax.vmap(edge_residual)(params[g.e_from], params[g.e_to],
                                g.R_rel, g.t_rel, g.weight)
    return jnp.where(g.mask[:, None], r, 0.0)


def total_cost(params: jax.Array, g: PoseGraph) -> jax.Array:
    """Sum of squared residuals (the cost the reference prints every 5
    iterations, main.cpp:432-435)."""
    return jnp.sum(residuals(params, g) ** 2)


def _edge_jacobians(params: jax.Array, g: PoseGraph):
    """Per-edge Jacobian blocks J_from, J_to: each [E, 6, 6], by one vmapped
    forward-mode autodiff of :func:`edge_residual`."""
    jac = jax.vmap(jax.jacfwd(edge_residual, argnums=(0, 1)))(
        params[g.e_from], params[g.e_to], g.R_rel, g.t_rel, g.weight)
    Jf, Jt = jac
    Jf = jnp.where(g.mask[:, None, None], Jf, 0.0)
    Jt = jnp.where(g.mask[:, None, None], Jt, 0.0)
    return Jf, Jt


def _gradient_and_diag(params: jax.Array, g: PoseGraph, Jf, Jt, r):
    """g_i = sum_e J_e,i^T r_e and the [N, 6, 6] diagonal blocks of H."""
    n = params.shape[0]
    gf = jnp.einsum("eij,ei->ej", Jf, r)
    gt = jnp.einsum("eij,ei->ej", Jt, r)
    grad = (jnp.zeros((n, 6), params.dtype)
            .at[g.e_from].add(gf).at[g.e_to].add(gt))
    Hff = jnp.einsum("eij,eik->ejk", Jf, Jf)
    Htt = jnp.einsum("eij,eik->ejk", Jt, Jt)
    diag = (jnp.zeros((n, 6, 6), params.dtype)
            .at[g.e_from].add(Hff).at[g.e_to].add(Htt))
    return grad, diag


def _dense_step(params, g: PoseGraph, damping):
    """One LM step via dense normal equations + Cholesky (small N)."""
    n = params.shape[0]
    r = residuals(params, g)
    Jf, Jt = _edge_jacobians(params, g)
    grad, diag = _gradient_and_diag(params, g, Jf, Jt, r)
    Hft = jnp.einsum("eij,eik->ejk", Jf, Jt)
    H = jnp.zeros((n, 6, n, 6), params.dtype)
    H = H.at[g.e_from, :, g.e_from, :].add(
        jnp.einsum("eij,eik->ejk", Jf, Jf))
    H = H.at[g.e_to, :, g.e_to, :].add(jnp.einsum("eij,eik->ejk", Jt, Jt))
    H = H.at[g.e_from, :, g.e_to, :].add(Hft)
    H = H.at[g.e_to, :, g.e_from, :].add(jnp.swapaxes(Hft, 1, 2))
    Hm = H.reshape(n * 6, n * 6)
    bm = grad.reshape(n * 6)
    # LM damping lambda = damping * tr(H) / dim (reference main.cpp:411).
    lam = damping * jnp.trace(Hm) / (n * 6)
    Hm = Hm + lam * jnp.eye(n * 6, dtype=params.dtype)
    # Gauge fix pose 0: identity rows/cols, zero rhs.
    fix = jnp.arange(6)
    Hm = Hm.at[fix, :].set(0.0).at[:, fix].set(0.0)
    Hm = Hm.at[fix, fix].set(1.0)
    bm = bm.at[fix].set(0.0)
    L, low = jax.scipy.linalg.cho_factor(Hm)
    delta = jax.scipy.linalg.cho_solve((L, low), -bm).reshape(n, 6)
    return delta


def _hvp(v, g: PoseGraph, Jf, Jt, lam, diag_lam):
    """Matrix-free (H + lam I) v using per-edge blocks: [N, 6] -> [N, 6]."""
    n = v.shape[0]
    vf = v[g.e_from]
    vt = v[g.e_to]
    # y_e = J_e v = Jf vf + Jt vt  in residual space [E, 6]
    y = jnp.einsum("eij,ej->ei", Jf, vf) + jnp.einsum("eij,ej->ei", Jt, vt)
    out = (jnp.zeros((n, 6), v.dtype)
           .at[g.e_from].add(jnp.einsum("eij,ei->ej", Jf, y))
           .at[g.e_to].add(jnp.einsum("eij,ei->ej", Jt, y)))
    out = out + lam * v
    del diag_lam
    # Gauge fix: pose 0 row behaves as identity.
    return out.at[0].set(v[0])


def _pcg_step(params, g: PoseGraph, damping, cg_iterations):
    """One LM step via block-Jacobi preconditioned CG (large N; O(E) memory)."""
    n = params.shape[0]
    r = residuals(params, g)
    Jf, Jt = _edge_jacobians(params, g)
    grad, diag = _gradient_and_diag(params, g, Jf, Jt, r)
    tr = jnp.sum(jax.vmap(jnp.trace)(diag))
    lam = damping * tr / (n * 6)
    # Block-Jacobi preconditioner: inverse of damped diagonal blocks.
    eye6 = jnp.eye(6, dtype=params.dtype)
    Minv = jnp.linalg.inv(diag + lam * eye6[None])
    Minv = Minv.at[0].set(eye6)

    b = (-grad).at[0].set(0.0)

    def precond(x):
        return jnp.einsum("nij,nj->ni", Minv, x)

    def mv(x):
        return _hvp(x, g, Jf, Jt, lam, None)

    x0 = jnp.zeros_like(b)

    def body(carry, _):
        x, res, z, p = carry
        Ap = mv(p)
        rz = jnp.sum(res * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
        x = x + alpha * p
        res_new = res - alpha * Ap
        z_new = precond(res_new)
        beta = jnp.sum(res_new * z_new) / jnp.maximum(rz, 1e-20)
        p_new = z_new + beta * p
        return (x, res_new, z_new, p_new), None

    res0 = b - mv(x0)
    z0 = precond(res0)
    (x, _, _, _), _ = jax.lax.scan(body, (x0, res0, z0, z0), None,
                                   length=cg_iterations)
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "num_iterations"))
def optimize_pose_graph(params: jax.Array, g: PoseGraph,
                        cfg: PgoConfig = PgoConfig(),
                        num_iterations: int | None = None):
    """Gauss-Newton/LM PGO (reference ``optimizePoseGraph`` main.cpp:282-445).

    Args:
      params: [N, 6] pose parameters ([rvec; t] per pose, pose 0 fixed).
      g: edge list.
    Returns (optimized params [N, 6], per-iteration cost [iters+1]).
    Early convergence (max |delta| < cfg.convergence_tol, main.cpp:424) is
    handled by freezing updates once reached — jit-friendly fixed trip count.
    """
    iters = cfg.max_iterations if num_iterations is None else num_iterations
    n = params.shape[0]
    use_dense = n <= cfg.dense_solver_max_poses

    def body(carry, _):
        p, done = carry
        if use_dense:
            delta = _dense_step(p, g, cfg.damping)
        else:
            delta = _pcg_step(p, g, cfg.damping, cfg.cg_iterations)
        delta = delta.at[0].set(0.0)
        max_update = jnp.max(jnp.abs(delta))
        p_new = jnp.where(done, p, p + delta)
        done = done | (max_update < cfg.convergence_tol)
        return (p_new, done), total_cost(p_new, g)

    cost0 = total_cost(params, g)
    (p_final, _), costs = jax.lax.scan(
        body, (params, jnp.asarray(False)), None, length=iters)
    return p_final, jnp.concatenate([cost0[None], costs])


def build_trajectory_graph(poses_params: jax.Array, loop_from: jax.Array,
                           loop_to: jax.Array, R_loop: jax.Array,
                           t_loop: jax.Array,
                           loop_weight: float = 10.0) -> PoseGraph:
    """The reference's graph shape (main.cpp:1440-1470): K-1 sequential edges
    with weight 1 measured from the current pose chain, plus one loop edge
    with weight ``loop_weight``."""
    n = poses_params.shape[0]
    Rs, ts = lie.params_to_pose_batch(poses_params)
    e_from = jnp.arange(n - 1, dtype=jnp.int32)
    e_to = e_from + 1
    R_rel, t_rel = jax.vmap(lie.relative)(Rs[:-1], ts[:-1], Rs[1:], ts[1:])
    g = PoseGraph(
        e_from=jnp.concatenate([e_from, loop_from[None].astype(jnp.int32)]),
        e_to=jnp.concatenate([e_to, loop_to[None].astype(jnp.int32)]),
        R_rel=jnp.concatenate([R_rel, R_loop[None]]),
        t_rel=jnp.concatenate([t_rel, t_loop[None]]),
        weight=jnp.concatenate([jnp.ones(n - 1),
                                jnp.asarray([loop_weight], jnp.float32)]),
        mask=jnp.ones(n, bool),
    )
    return g


@jax.jit
def simple_pose_correction(params: jax.Array, loop_past: jax.Array,
                           loop_curr: jax.Array, R_loop: jax.Array) -> jax.Array:
    """Linear drift spread (reference ``simplePoseCorrection``
    main.cpp:451-492): rotation drift between the loop-predicted and current
    pose of ``loop_curr`` is distributed linearly (in axis-angle) over frames
    past+1..curr; translations untouched (scale ambiguity, main.cpp:487).

    ``R_loop`` maps pose[past] to the loop-measured pose of curr:
    ``R_measured = R_loop @ R_past``.
    """
    n = params.shape[0]
    Rs, ts = lie.params_to_pose_batch(params)
    R_measured = R_loop @ Rs[loop_past]
    # Drift: rotation taking current estimate to measured.
    R_drift = R_measured @ Rs[loop_curr].T
    drift_vec = lie.so3_log(R_drift)

    idx = jnp.arange(n)
    span = jnp.maximum((loop_curr - loop_past).astype(jnp.float32), 1.0)
    alpha = jnp.clip((idx - loop_past).astype(jnp.float32) / span, 0.0, 1.0)
    # Apply fractional drift to each pose in the chain.
    def apply(a, R):
        dR = lie.so3_exp(lie.slerp_rvec(drift_vec, a))
        return dR @ R
    Rs_new = jax.vmap(apply)(alpha, Rs)
    new_params = jax.vmap(lie.pose_to_params)(Rs_new, ts)
    # Only poses strictly after `loop_past` move (main.cpp:480).
    move = (idx > loop_past)[:, None]
    return jnp.where(move, new_params, params)
