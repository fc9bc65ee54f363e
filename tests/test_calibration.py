"""Calibration-tool tests: synthetic chessboard renders with known K ->
recovered intrinsics must match (the tool the reference ships as its second
executable, calibrate.cpp)."""

import numpy as np
import pytest

from slam_loop_closing_tpu.config import CalibrationConfig
from slam_loop_closing_tpu.models import calibration


def render_chessboard(K, R, t, rows, cols, square, h, w, ss=2):
    """Rasterize a chessboard plane (z=0 world) under a pinhole camera by
    inverse-mapping every pixel through the plane homography. ``ss``:
    supersampling factor for soft edges."""
    H = K @ np.stack([R[:, 0], R[:, 1], t], axis=1)
    Hinv = np.linalg.inv(H)
    ys, xs = np.mgrid[0:h * ss, 0:w * ss] / ss
    pix = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)])
    world = Hinv @ pix
    X = world[0] / world[2]
    Y = world[1] / world[2]
    # squares span exactly [0, cols*square] x [0, rows*square]; outside = gray
    ix = np.floor(X / square).astype(int)
    iy = np.floor(Y / square).astype(int)
    img = np.where((ix + iy) % 2 == 0, 1.0, 0.0)
    inside = ((X > 0) & (X < cols * square)
              & (Y > 0) & (Y < rows * square))
    img = np.where(inside, img, 0.5)
    img = img.reshape(h * ss, w * ss).astype(np.float32)
    img = img.reshape(h, ss, w, ss).mean((1, 3))
    return img


@pytest.fixture(scope="module")
def chessboard_set():
    """6 views of a 9x6-inner-corner board (reference geometry,
    calibrate.cpp:9-10) with known K."""
    h, w = 240, 320
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    rows, cols = 6, 9   # inner corners; squares = (rows+1)x(cols+1)
    square = 0.03
    rng = np.random.default_rng(2)
    images = []
    for i in range(6):
        # mild tilts around a frontal view, board centered in front
        rv = rng.uniform(-0.25, 0.25, 3) * np.array([1, 1, 0.5])
        ang = np.linalg.norm(rv)
        axis = rv / max(ang, 1e-9)
        Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                       [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * Kx @ Kx
        center = np.array([(cols) * square / 2, (rows) * square / 2, 0.0])
        C = center + R.T @ np.array([rng.uniform(-0.02, 0.02),
                                     rng.uniform(-0.02, 0.02),
                                     -rng.uniform(0.55, 0.75)])
        t = -R @ C
        images.append(render_chessboard(K, R, t, rows + 1, cols + 1, square,
                                        h, w))
    return K, images


class TestCornerDetection:
    def test_finds_inner_corners(self, chessboard_set):
        K, images = chessboard_set
        g, layout = calibration.find_chessboard(images[0], 6, 9)
        assert g is not None, "chessboard not found"
        assert g.shape == (54, 2)

    def test_corner_accuracy(self, chessboard_set):
        """Detected corners must be sub-pixel close to the projected
        ground-truth grid (checked via homography residual)."""
        K, images = chessboard_set
        g, (r, c) = calibration.find_chessboard(images[0], 6, 9)
        gy, gx = np.mgrid[0:r, 0:c]
        obj = np.stack([gx.ravel() * 0.03, gy.ravel() * 0.03], 1)
        H = calibration.homography_dlt(obj, g)
        ph = np.concatenate([obj, np.ones((len(obj), 1))], 1) @ H.T
        proj = ph[:, :2] / ph[:, 2:]
        err = np.linalg.norm(proj - g, axis=1)
        assert np.median(err) < 1.0, f"median corner error {np.median(err)}"


class TestTwoScaleRetry:
    def test_downscaled_detection(self, chessboard_set):
        """The reference retries detection at half resolution
        (calibrate.cpp:70-79). Pixel-scale checkerboard noise creates saddle
        points everywhere at full resolution (detection fails) but is
        constant under stride-2 subsampling — the half-scale pass must find
        the board and scale corners back accurately."""
        K, images = chessboard_set
        img = images[0].copy()
        ys, xs = np.mgrid[0:img.shape[0], 0:img.shape[1]]
        noisy = np.clip(img + 0.35 * ((xs + ys) % 2) - 0.175, 0, 1
                        ).astype(np.float32)
        g, layout = calibration.find_chessboard(noisy, 6, 9)
        assert g is not None, "half-scale retry did not find the board"
        # corners must be full-resolution coordinates, close to the clean
        # detection
        g_clean, _ = calibration.find_chessboard(img, 6, 9)
        err = np.linalg.norm(np.sort(g, axis=0) - np.sort(g_clean, axis=0),
                             axis=1)
        assert np.median(err) < 2.0, f"median corner error {np.median(err)}"


class TestSubpixRefine:
    def test_refine_improves_perturbed_corners(self, chessboard_set):
        """cornerSubPix-equivalent: corners perturbed by ~1.5 px must be
        pulled back to sub-pixel accuracy on the clean image."""
        import jax.numpy as jnp

        K, images = chessboard_set
        g, _ = calibration.find_chessboard(images[0], 6, 9)
        rng = np.random.default_rng(0)
        pert = g + rng.uniform(-1.5, 1.5, g.shape).astype(np.float32)
        ref = np.asarray(calibration.refine_corners_subpix(
            jnp.asarray(images[0]), jnp.asarray(pert), 5, 30, 1e-3))
        before = np.linalg.norm(pert - g, axis=1).mean()
        after = np.linalg.norm(ref - g, axis=1).mean()
        assert after < 0.5 * before, f"{before:.3f} -> {after:.3f}"


class TestCalibration:
    def test_recovers_intrinsics(self, chessboard_set):
        K_gt, images = chessboard_set
        res = calibration.calibrate_camera(
            images, CalibrationConfig(board_cols=9, board_rows=6,
                                      square_size_m=0.03),
            log=lambda *a: None)
        assert res.num_images >= 4
        assert res.rms < 1.0, f"RMS {res.rms}"
        assert abs(res.K[0, 0] - K_gt[0, 0]) / K_gt[0, 0] < 0.05
        assert abs(res.K[1, 1] - K_gt[1, 1]) / K_gt[1, 1] < 0.05
        assert abs(res.K[0, 2] - K_gt[0, 2]) < 12.0
        assert abs(res.K[1, 2] - K_gt[1, 2]) < 12.0
