import numpy as np
import jax.numpy as jnp

from slam_loop_closing_tpu.ops import camera
from slam_loop_closing_tpu.config import CameraConfig
from fixtures.synthetic import two_view_scene


def test_project_matches_numpy(rng):
    scene = two_view_scene(rng, n_points=50)
    K = jnp.asarray(scene["K"], jnp.float32)
    R = jnp.asarray(scene["R"], jnp.float32)
    t = jnp.asarray(scene["t"], jnp.float32)
    X = jnp.asarray(scene["X"], jnp.float32)
    uvz = camera.project_batch(K, R, t, X)
    np.testing.assert_allclose(np.asarray(uvz[:, :2]), scene["uv2"], atol=1e-2)
    assert np.all(np.asarray(uvz[:, 2]) > 0)


def test_reproj_error_zero_on_exact(rng):
    scene = two_view_scene(rng, n_points=20)
    K = jnp.asarray(scene["K"], jnp.float32)
    R = jnp.asarray(scene["R"], jnp.float32)
    t = jnp.asarray(scene["t"], jnp.float32)
    errs = camera.reproj_error_batch(K, R, t,
                                     jnp.asarray(scene["X"], jnp.float32),
                                     jnp.asarray(scene["uv2"], jnp.float32))
    assert float(jnp.max(errs)) < 0.05


def test_reproj_error_behind_camera():
    K = jnp.eye(3, dtype=jnp.float32) * 100
    e = camera.reproj_error(K, jnp.eye(3, dtype=jnp.float32),
                            jnp.zeros(3, jnp.float32),
                            jnp.array([0.0, 0.0, -1.0]),
                            jnp.array([0.0, 0.0]))
    assert float(e) == camera.BEHIND_CAMERA_ERROR


def test_distort_undistort_roundtrip(rng):
    cfg = CameraConfig()
    K = jnp.asarray(cfg.K, jnp.float32)
    dist = jnp.asarray(cfg.dist_coeffs, jnp.float32)
    uv = jnp.asarray(rng.uniform(200, 900, size=(50, 2)), jnp.float32)
    distorted = camera.distort_points_batch(K, dist, uv)
    undistorted = camera.undistort_points_batch(K, dist, distorted)
    np.testing.assert_allclose(np.asarray(undistorted), np.asarray(uv),
                               atol=0.05)


def test_undistort_matches_opencv(rng):
    cv2 = __import__("cv2")
    cfg = CameraConfig()
    K = cfg.K
    dist = cfg.dist_coeffs
    pts = rng.uniform(300, 800, size=(40, 2)).astype(np.float64)
    ref = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
    ours = camera.undistort_points_batch(
        jnp.asarray(K, jnp.float32), jnp.asarray(dist, jnp.float32),
        jnp.asarray(pts, jnp.float32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0.1)
