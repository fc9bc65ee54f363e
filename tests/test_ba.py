"""Bundle-adjustment tests on synthetic scenes with exact ground truth, plus
triangulation gating and outlier removal."""

import numpy as np
import jax.numpy as jnp

from slam_loop_closing_tpu.config import OutlierConfig, TriangulationConfig
from slam_loop_closing_tpu.ops import ba, lie, outliers, triangulation

K_np = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def synthetic_scene(rng, num_cams=5, num_points=60, cam_noise=0.01,
                    point_noise=0.05):
    pts_gt = rng.uniform([-2, -2, 4], [2, 2, 8],
                         (num_points, 3)).astype(np.float32)
    cams_gt = []
    for i in range(num_cams):
        rv = rng.normal(0, 0.05, 3)
        t = np.array([0.3 * i, 0.0, 0.0]) + rng.normal(0, 0.05, 3)
        cams_gt.append(np.concatenate([rv, t]))
    cams_gt = np.array(cams_gt, np.float32)
    Rs = np.asarray(lie.so3_exp_batch(jnp.asarray(cams_gt[:, :3])))
    oc = np.repeat(np.arange(num_cams), num_points).astype(np.int32)
    op = np.tile(np.arange(num_points), num_cams).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", Rs[oc], pts_gt[op]) + cams_gt[oc, 3:]
    uv = np.stack([500.0 * Xc[:, 0] / Xc[:, 2] + 320.0,
                   500.0 * Xc[:, 1] / Xc[:, 2] + 240.0], -1).astype(np.float32)
    obs = ba.Observations(jnp.asarray(oc), jnp.asarray(op), jnp.asarray(uv),
                          jnp.ones(len(oc), bool))
    cams0 = cams_gt.copy()
    cams0[1:] += rng.normal(0, cam_noise, (num_cams - 1, 6)).astype(np.float32)
    pts0 = pts_gt + rng.normal(0, point_noise, pts_gt.shape).astype(np.float32)
    return cams_gt, pts_gt, cams0, pts0, obs


class TestBa:
    def test_mean_reproj_zero_at_truth(self, rng):
        cams_gt, pts_gt, _, _, obs = synthetic_scene(rng)
        e = float(ba.mean_reprojection_error(
            jnp.asarray(K_np), jnp.asarray(cams_gt), jnp.asarray(pts_gt), obs))
        assert e < 1e-3

    def test_refine_cameras_recovers_truth(self, rng):
        cams_gt, pts_gt, cams0, _, obs = synthetic_scene(rng)
        out = ba.refine_cameras(jnp.asarray(K_np), jnp.asarray(cams0),
                                jnp.asarray(pts_gt), obs, iterations=10)
        np.testing.assert_allclose(np.asarray(out), cams_gt, atol=5e-3)

    def test_refine_points_recovers_truth(self, rng):
        cams_gt, pts_gt, _, pts0, obs = synthetic_scene(rng)
        out = ba.refine_points(jnp.asarray(K_np), jnp.asarray(cams_gt),
                               jnp.asarray(pts0), obs, iterations=10)
        np.testing.assert_allclose(np.asarray(out), pts_gt, atol=5e-3)

    def test_alternating_ba_reduces_error(self, rng):
        _, _, cams0, pts0, obs = synthetic_scene(rng)
        Kj = jnp.asarray(K_np)
        e0 = float(ba.mean_reprojection_error(Kj, jnp.asarray(cams0),
                                              jnp.asarray(pts0), obs))
        cp, pp, errs = ba.alternating_ba(Kj, jnp.asarray(cams0),
                                         jnp.asarray(pts0), obs)
        errs = np.asarray(errs)
        assert np.all(np.isfinite(errs))
        assert errs[-1] < 0.3 * e0
        assert np.all(np.diff(errs) < 1e-3)  # non-increasing (tolerance)

    def test_camera0_gauge_fixed(self, rng):
        _, _, cams0, pts0, obs = synthetic_scene(rng)
        cp, _, _ = ba.alternating_ba(jnp.asarray(K_np), jnp.asarray(cams0),
                                     jnp.asarray(pts0), obs)
        np.testing.assert_allclose(np.asarray(cp[0]), cams0[0], atol=1e-7)

    def test_invalid_observations_ignored(self, rng):
        cams_gt, pts_gt, cams0, _, obs = synthetic_scene(rng)
        # Corrupt a scattered half of the measurements, marked invalid (so
        # every camera keeps enough valid observations to refine).
        bad_uv = np.asarray(obs.uv).copy()
        o = len(bad_uv)
        pick = rng.choice(o, o // 2, replace=False)
        bad_uv[pick] += 500.0
        valid = np.ones(o, bool)
        valid[pick] = False
        obs_bad = ba.Observations(obs.cam, obs.point, jnp.asarray(bad_uv),
                                  jnp.asarray(valid))
        out = ba.refine_cameras(jnp.asarray(K_np), jnp.asarray(cams0),
                                jnp.asarray(pts_gt), obs_bad, iterations=10)
        np.testing.assert_allclose(np.asarray(out), cams_gt, atol=1e-2)


class TestTriangulationGates:
    def test_accepts_good_rejects_behind(self, rng):
        # Two cameras looking down +z, points in front and behind.
        R1 = jnp.eye(3)
        t1 = jnp.zeros(3)
        R2 = jnp.eye(3)
        t2 = jnp.asarray([-1.0, 0.0, 0.0])  # baseline 1 along x
        pts = np.concatenate([
            rng.uniform([-1, -1, 4], [1, 1, 8], (20, 3)),
        ]).astype(np.float32)
        x1 = pts[:, :2] / pts[:, 2:]
        Xc2 = pts + np.array([-1.0, 0, 0])
        x2 = Xc2[:, :2] / Xc2[:, 2:]
        uv1 = x1 * 500.0 + np.array([320.0, 240.0])
        uv2 = x2 * 500.0 + np.array([320.0, 240.0])
        res = triangulation.triangulate_gated(
            jnp.asarray(K_np), R1, t1, R2, t2,
            jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.ones(20, bool))
        assert int(jnp.sum(res.accept)) == 20
        np.testing.assert_allclose(np.asarray(res.X), pts, atol=1e-2)

    def test_parallax_gate(self, rng):
        # Tiny baseline => parallax below 1 degree => rejected.
        R1 = jnp.eye(3)
        t1 = jnp.zeros(3)
        R2 = jnp.eye(3)
        t2 = jnp.asarray([-1e-3, 0.0, 0.0])
        pts = rng.uniform([-1, -1, 4], [1, 1, 8], (10, 3)).astype(np.float32)
        x1 = pts[:, :2] / pts[:, 2:]
        Xc2 = pts + np.array([-1e-3, 0, 0])
        x2 = Xc2[:, :2] / Xc2[:, 2:]
        uv1 = (x1 * 500.0 + np.array([320.0, 240.0])).astype(np.float32)
        uv2 = (x2 * 500.0 + np.array([320.0, 240.0])).astype(np.float32)
        res = triangulation.triangulate_gated(
            jnp.asarray(K_np), R1, t1, R2, t2, jnp.asarray(x1),
            jnp.asarray(x2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(10, bool))
        assert int(res.n_parallax) + int(res.n_depth) == 10
        assert int(jnp.sum(res.accept)) == 0


class TestOutliers:
    def test_far_and_reproj_outliers_flagged(self, rng):
        cams_gt, pts_gt, _, _, obs = synthetic_scene(rng)
        pts = pts_gt.copy()
        pts[0] = [500.0, 500.0, 500.0]     # far from centroid AND bad reproj
        pv = jnp.ones(len(pts), bool)
        cv = jnp.ones(len(cams_gt), bool)
        res = outliers.remove_outliers(
            jnp.asarray(K_np), jnp.asarray(cams_gt), cv, jnp.asarray(pts),
            pv, obs)
        assert not bool(res.point_valid[0])
        assert bool(jnp.all(res.point_valid[1:]))
        # observations of the dead point die with it
        dead_obs = np.asarray(obs.point) == 0
        assert not np.any(np.asarray(res.obs_valid)[dead_obs])
        assert np.all(np.asarray(res.obs_valid)[~dead_obs])
