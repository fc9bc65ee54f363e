"""Pose-graph optimization tests: synthetic loop-closure graphs with exact
ground truth (SURVEY.md §4), covering the dense-Cholesky and matrix-free PCG
solver paths and the linear drift-spread correction."""

import numpy as np
import jax.numpy as jnp
import pytest

from slam_loop_closing_tpu.config import PgoConfig
from slam_loop_closing_tpu.ops import lie, pgo


def rotz(a):
    return np.array([[np.cos(a), -np.sin(a), 0.0],
                     [np.sin(a), np.cos(a), 0.0],
                     [0.0, 0.0, 1.0]])


def circle_graph(rng, n, noise=0.03, loop_weight=10.0):
    """Noisy circular trajectory + exact relative edges + one loop edge."""
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    clean = [(rotz(a), np.array([np.cos(a), np.sin(a), 0.0])) for a in angles]
    params = []
    for i, a in enumerate(angles):
        rv = np.array([0, 0, a]) + rng.normal(0, noise, 3) * (i > 0)
        t = clean[i][1] + rng.normal(0, noise, 3) * (i > 0)
        params.append(np.concatenate([rv, t]))
    ef, et, Rr, tr = [], [], [], []
    pairs = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1)]
    for i, j in pairs:
        R1, t1 = clean[i]
        R2, t2 = clean[j]
        Rrel = R2 @ R1.T
        ef.append(i), et.append(j), Rr.append(Rrel), tr.append(t2 - Rrel @ t1)
    g = pgo.PoseGraph(
        e_from=jnp.asarray(ef, jnp.int32), e_to=jnp.asarray(et, jnp.int32),
        R_rel=jnp.asarray(np.array(Rr), jnp.float32),
        t_rel=jnp.asarray(np.array(tr), jnp.float32),
        weight=jnp.concatenate([jnp.ones(n - 1),
                                jnp.asarray([loop_weight], jnp.float32)]),
        mask=jnp.ones(n, bool))
    return jnp.asarray(np.array(params), jnp.float32), g, clean


def test_edge_residual_zero_at_truth(rng):
    params, g, _ = circle_graph(rng, 10, noise=0.0)
    assert float(pgo.total_cost(params, g)) < 1e-8


def test_dense_converges(rng):
    params, g, clean = circle_graph(rng, 20)
    c0 = float(pgo.total_cost(params, g))
    out, costs = pgo.optimize_pose_graph(params, g)
    assert np.all(np.isfinite(np.asarray(costs)))
    assert float(costs[-1]) < 1e-8 * max(c0, 1.0)
    # Optimized poses must match ground truth (pose 0 anchors the gauge).
    Rs, ts = lie.params_to_pose_batch(out)
    for i in (5, 19):
        err = float(lie.rotation_error(Rs[i], jnp.asarray(clean[i][0],
                                                          jnp.float32)))
        assert err < 1e-3


def test_pcg_matches_dense(rng):
    params, g, _ = circle_graph(rng, 20)
    dense, _ = pgo.optimize_pose_graph(params, g)
    cfg = PgoConfig(dense_solver_max_poses=5)  # force the PCG path
    cg, costs = pgo.optimize_pose_graph(params, g, cfg)
    assert float(costs[-1]) < 1e-8
    np.testing.assert_allclose(np.asarray(cg), np.asarray(dense), atol=1e-3)


def test_masked_edges_ignored(rng):
    params, g, _ = circle_graph(rng, 10)
    # Append a nonsense edge with mask False: results must be unchanged.
    bad = pgo.PoseGraph(
        e_from=jnp.concatenate([g.e_from, jnp.asarray([3], jnp.int32)]),
        e_to=jnp.concatenate([g.e_to, jnp.asarray([7], jnp.int32)]),
        R_rel=jnp.concatenate([g.R_rel, jnp.eye(3)[None]]),
        t_rel=jnp.concatenate([g.t_rel, jnp.asarray([[9.0, 9.0, 9.0]])]),
        weight=jnp.concatenate([g.weight, jnp.asarray([5.0])]),
        mask=jnp.concatenate([g.mask, jnp.asarray([False])]))
    out_a, _ = pgo.optimize_pose_graph(params, g)
    out_b, _ = pgo.optimize_pose_graph(params, bad)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_pose0_fixed(rng):
    params, g, _ = circle_graph(rng, 12)
    out, _ = pgo.optimize_pose_graph(params, g)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(params[0]),
                               atol=1e-7)


def test_simple_pose_correction(rng):
    """Drift spread: after correction the final pose matches the
    loop-measured rotation; intermediate poses move fractionally."""
    n = 10
    params, g, clean = circle_graph(rng, n, noise=0.0)
    # Inject rotation drift into poses 1..n-1 (grows along the chain).
    drift = np.array([0.0, 0.0, 0.2], np.float32)
    p = np.asarray(params).copy()
    for i in range(1, n):
        a = drift * (i / (n - 1))
        Ri = np.asarray(lie.so3_exp(jnp.asarray(a))) @ np.asarray(
            lie.so3_exp(jnp.asarray(p[i, :3])))
        p[i, :3] = np.asarray(lie.so3_log(jnp.asarray(Ri)))
    p = jnp.asarray(p)
    # Loop edge: measured relation between pose 0 and pose n-1 is the clean one.
    R_loop = jnp.asarray(clean[n - 1][0] @ clean[0][0].T, jnp.float32)
    corrected = pgo.simple_pose_correction(
        p, jnp.asarray(0), jnp.asarray(n - 1), R_loop)
    R_last, _ = lie.params_to_pose(corrected[n - 1])
    err = float(lie.rotation_error(R_last, jnp.asarray(clean[n - 1][0],
                                                       jnp.float32)))
    assert err < 1e-4
    # Pose 0 (and anything <= loop_past) untouched.
    np.testing.assert_allclose(np.asarray(corrected[0]), np.asarray(p[0]),
                               atol=1e-7)
