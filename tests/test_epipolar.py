import numpy as np
import jax.numpy as jnp

from slam_loop_closing_tpu.ops import epipolar
from fixtures.synthetic import two_view_scene


def _normalized(scene):
    K = scene["K"]
    x1 = (scene["uv1"] - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
    x2 = (scene["uv2"] - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
    return jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)


def _essential_gt(scene):
    t, R = scene["t"], scene["R"]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return tx @ R


def test_eight_point_recovers_E(rng):
    scene = two_view_scene(rng, n_points=60)
    x1, x2 = _normalized(scene)
    w = jnp.ones(x1.shape[0], jnp.float32)
    E = np.asarray(epipolar.essential_eight_point(x1, x2, w))
    E_gt = _essential_gt(scene)
    E = E / np.linalg.norm(E)
    E_gt = E_gt / np.linalg.norm(E_gt)
    if np.sum(E * E_gt) < 0:
        E = -E
    np.testing.assert_allclose(E, E_gt, atol=2e-3)


def test_sampson_error_zero_for_inliers(rng):
    scene = two_view_scene(rng, n_points=60)
    x1, x2 = _normalized(scene)
    E = jnp.asarray(_essential_gt(scene), jnp.float32)
    errs = np.asarray(epipolar.sampson_error(E, x1, x2))
    assert errs.max() < 1e-8


def test_recover_pose_from_gt_E(rng):
    scene = two_view_scene(rng, n_points=60)
    x1, x2 = _normalized(scene)
    E = jnp.asarray(_essential_gt(scene), jnp.float32)
    mask = jnp.ones(x1.shape[0], bool)
    R, t, pose_mask, n = epipolar.recover_pose(E, x1, x2, mask)
    np.testing.assert_allclose(np.asarray(R), scene["R"], atol=1e-3)
    t_gt = scene["t"] / np.linalg.norm(scene["t"])
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)
    assert int(n) == x1.shape[0]


def test_triangulate_dlt_exact(rng):
    scene = two_view_scene(rng, n_points=40)
    x1, x2 = _normalized(scene)
    R1 = jnp.eye(3, dtype=jnp.float32)
    t1 = jnp.zeros(3, jnp.float32)
    R2 = jnp.asarray(scene["R"], jnp.float32)
    t2 = jnp.asarray(scene["t"], jnp.float32)
    X = np.asarray(epipolar.triangulate_dlt(R1, t1, R2, t2, x1, x2))
    np.testing.assert_allclose(X, scene["X"], atol=5e-2)


def test_masked_upper_median():
    vals = jnp.asarray([5.0, 1.0, 9.0, 3.0, 100.0], jnp.float32)
    mask = jnp.asarray([True, True, True, True, False])
    # sorted valid = [1,3,5,9], count=4 -> index 2 -> 5 (reference upper median)
    assert float(epipolar.masked_upper_median(vals, mask)) == 5.0
    empty = jnp.zeros(5, bool)
    assert float(epipolar.masked_upper_median(vals, empty)) == 0.0


def test_median_displacement(rng):
    pts1 = jnp.zeros((5, 2), jnp.float32)
    pts2 = jnp.asarray([[3, 4], [0, 1], [6, 8], [0, 2], [0, 0]], jnp.float32)
    mask = jnp.ones(5, bool)
    # displacements [5,1,10,2,0] sorted [0,1,2,5,10], n/2=2 -> 2
    assert float(epipolar.median_displacement(pts1, pts2, mask)) == 2.0


def test_parallax_angle(rng):
    C1 = jnp.asarray([0.0, 0.0, 0.0])
    C2 = jnp.asarray([1.0, 0.0, 0.0])
    X = jnp.asarray([[0.5, 0.0, 0.5]])
    ang = float(epipolar.parallax_angle_deg(C1, C2, X)[0])
    np.testing.assert_allclose(ang, 90.0, atol=1e-3)


def test_triangulation_matches_opencv(rng):
    cv2 = __import__("cv2")
    scene = two_view_scene(rng, n_points=30, noise_px=0.5)
    x1, x2 = _normalized(scene)
    P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = np.hstack([scene["R"], scene["t"].reshape(3, 1)])
    Xh = cv2.triangulatePoints(P1, P2, np.asarray(x1).T.astype(np.float64),
                               np.asarray(x2).T.astype(np.float64))
    X_cv = (Xh[:3] / Xh[3]).T
    X_ours = np.asarray(epipolar.triangulate_dlt(
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(scene["R"], jnp.float32), jnp.asarray(scene["t"], jnp.float32),
        x1, x2))
    np.testing.assert_allclose(X_ours, X_cv, atol=5e-2)
