"""Camera calibration: chessboard saddle-point detection + Zhang-method
intrinsics with joint GN refinement.

TPU-native replacement for the reference's ``calibrate`` executable
(calibrate.cpp:5-150): ``findChessboardCornersSB`` + ``cornerSubPix`` +
``cv::calibrateCamera``. Differences by design (SURVEY.md §2.10):

* corner detection is a dense saddle-point response over the whole image
  (chessboard X-corners are saddle points of intensity: det(Hessian) < 0
  with strong curvature both ways) — one fused XLA program per image instead
  of OpenCV's native scanline search; subpixel refinement by quadratic fit;
* grid ordering tries both orientations (9x6 / 6x9 like calibrate.cpp:65-108)
  via a PCA-aligned row clustering;
* calibration is Zhang's method: per-image DLT homographies, closed-form
  intrinsics init from the absolute-conic constraints, extrinsics from H,
  then one joint Gauss-Newton refinement of (fx, fy, cx, cy, k1, k2, p1,
  p2, k3) + per-image poses with autodiff Jacobians (the reference's
  ``cv::calibrateCamera`` runs the same pipeline natively);
* headless: corner-overlay PNGs instead of imshow (calibrate.cpp:114-125).

The RMS reprojection error printed at the end matches cv::calibrateCamera's
definition (calibrate.cpp:139-147).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_loop_closing_tpu.config import CalibrationConfig
from slam_loop_closing_tpu.ops import image as image_ops
from slam_loop_closing_tpu.ops import lie


# ---------------------------------------------------------------------------
# saddle-point corner detection
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("sigma",))
def saddle_response(img: jax.Array, sigma: float = 2.0) -> jax.Array:
    """Dense chessboard-corner response: ``-det(Hessian)`` of the smoothed
    image, zeroed where non-positive. X-corners are intensity saddles, so
    ``Ixx * Iyy - Ixy^2`` is strongly negative there and near zero on edges
    and flats (edges have one zero curvature direction)."""
    g = image_ops.gaussian_blur(img, sigma)
    # central differences
    gy, gx = jnp.gradient(g)
    gyy, gyx = jnp.gradient(gy)
    gxy, gxx = jnp.gradient(gx)
    det = gxx * gyy - 0.25 * (gxy + gyx) ** 2
    return jnp.maximum(-det, 0.0)


@functools.partial(jax.jit, static_argnames=("num_corners",))
def detect_saddle_points(img: jax.Array, num_corners: int):
    """Top-K saddle points with 5x5 NMS and quadratic subpixel refinement.
    Returns (xy [K, 2] float32, response [K], valid [K])."""
    resp = saddle_response(img)
    h, w = resp.shape
    local_max = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME")
    peaks = jnp.where(resp >= local_max, resp, 0.0)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 4) & (ys < h - 4) & (xs >= 4) & (xs < w - 4)
    peaks = jnp.where(interior, peaks, 0.0)
    vals, idx = jax.lax.top_k(peaks.ravel(), num_corners)
    py = idx // w
    px = idx % w

    # Quadratic subpixel: fit a paraboloid to the 3x3 response neighborhood.
    def refine(y, x):
        n = jax.lax.dynamic_slice(resp, (y - 1, x - 1), (3, 3))
        dx = (n[1, 2] - n[1, 0]) * 0.5
        dy = (n[2, 1] - n[0, 1]) * 0.5
        dxx = n[1, 2] - 2.0 * n[1, 1] + n[1, 0]
        dyy = n[2, 1] - 2.0 * n[1, 1] + n[0, 1]
        ox = jnp.where(jnp.abs(dxx) > 1e-12, -dx / dxx, 0.0)
        oy = jnp.where(jnp.abs(dyy) > 1e-12, -dy / dyy, 0.0)
        return jnp.clip(ox, -1.0, 1.0), jnp.clip(oy, -1.0, 1.0)

    ox, oy = jax.vmap(refine)(jnp.maximum(py, 1), jnp.maximum(px, 1))
    xy = jnp.stack([px.astype(jnp.float32) + ox,
                    py.astype(jnp.float32) + oy], -1)
    return xy, vals, vals > 0.0


@jax.jit
def xcorner_scores(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Chessboard X-corner polarity check (ChESS-style): at a true inner
    corner the two diagonal quadrant pairs have opposite intensity and each
    pair agrees with itself. Board-boundary corners (one quadrant =
    background) score low — this is what separates the 54 inner corners from
    edge artifacts. Returns a [K] score (higher = more X-corner-like),
    max-pooled over two probe radii."""
    def at(pt, dx, dy):
        return image_ops.bilinear_sample(img, pt + jnp.asarray([dx, dy]))

    def one(pt):
        def score(d):
            a = at(pt, d, d)
            b = at(pt, -d, -d)
            c = at(pt, d, -d)
            e = at(pt, -d, d)
            return jnp.abs(a + b - c - e) - jnp.abs(a - b) - jnp.abs(c - e)
        return jnp.maximum(score(3.0), score(5.0))

    return jax.vmap(one)(xy)


@functools.partial(jax.jit, static_argnames=("window", "iterations"))
def refine_corners_subpix(img: jax.Array, xy: jax.Array, window: int = 11,
                          iterations: int = 30, eps: float = 1e-3
                          ) -> jax.Array:
    """``cv::cornerSubPix`` equivalent (calibrate.cpp:85-86: 11x11 window,
    30 iterations, eps 1e-3), vmapped over all corners.

    Classic gradient-orthogonality iteration: at a saddle point every window
    pixel's gradient is orthogonal to its offset from the corner, so p
    solves ``sum(w g g^T) p = sum(w g g^T q)`` over window pixels q with
    Gaussian weights w. ``window`` is the half-size like OpenCV's
    cv::Size(11, 11) (search side = 2*11+1). Iteration stops (freezes) per
    corner once the update drops below ``eps``."""
    gy, gx = jnp.gradient(img)
    half = window
    d = jnp.arange(-half, half + 1, dtype=jnp.float32)
    dxs, dys = jnp.meshgrid(d, d)
    offs = jnp.stack([dxs.ravel(), dys.ravel()], -1)        # [W, 2]
    wgt = jnp.exp(-(offs[:, 0] ** 2 + offs[:, 1] ** 2)
                  / (2.0 * (half / 2.0) ** 2))

    def one(p0):
        def body(carry, _):
            p, frozen = carry
            q = p[None, :] + offs                            # [W, 2]
            gxs = jax.vmap(lambda pt: image_ops.bilinear_sample(gx, pt))(q)
            gys = jax.vmap(lambda pt: image_ops.bilinear_sample(gy, pt))(q)
            gxx = jnp.sum(wgt * gxs * gxs)
            gxy = jnp.sum(wgt * gxs * gys)
            gyy = jnp.sum(wgt * gys * gys)
            A = jnp.array([[gxx, gxy], [gxy, gyy]])
            b = jnp.stack([
                jnp.sum(wgt * (gxs * gxs * q[:, 0] + gxs * gys * q[:, 1])),
                jnp.sum(wgt * (gxs * gys * q[:, 0] + gys * gys * q[:, 1]))])
            ok = jnp.abs(jnp.linalg.det(A)) > 1e-12
            new_p = jnp.where(
                ok, jnp.linalg.solve(A + 1e-12 * jnp.eye(2), b), p)
            move = jnp.linalg.norm(new_p - p)
            # clamp runaway updates (flat windows) and freeze on convergence
            new_p = jnp.where(move < 2.0, new_p, p)
            new_p = jnp.where(frozen, p, new_p)
            return (new_p, frozen | (move < eps)), None

        (p, _), _ = jax.lax.scan(body, (p0, jnp.asarray(False)), None,
                                 length=iterations)
        return p

    return jax.vmap(one)(xy)


def order_grid(xy: np.ndarray, rows: int, cols: int) -> np.ndarray | None:
    """Order detected corners into a row-major [rows*cols, 2] grid (host
    helper; mirrors the both-orientations retry of calibrate.cpp:65-108).

    Two stages: (1) PCA-frame row clustering with gap-based splits for the
    initial guess, (2) homography-guided refinement — fit H from the current
    assignment, re-assign every lattice slot to its nearest detected corner,
    iterate. Stage 2 fixes the row mis-partitions PCA clustering makes under
    perspective tilt. Returns None if the points don't form the grid."""
    n = rows * cols
    if len(xy) < n:
        return None
    pts = xy[:n].astype(np.float64)
    c = pts.mean(0)
    _, _, vt = np.linalg.svd(pts - c, full_matrices=False)
    ax = (pts - c) @ vt.T  # PCA frame: ax[:,0] = long axis
    # rows: split the short-axis ordering at the (rows-1) largest gaps
    order = np.argsort(ax[:, 1])
    short = ax[order, 1]
    gaps = np.diff(short)
    cut_positions = np.sort(np.argsort(gaps)[-(rows - 1):]) + 1
    rows_idx = np.split(order, cut_positions)
    if any(len(r) != cols for r in rows_idx):
        # fall back to equal-count split
        rows_idx = np.array_split(order, rows)
        if any(len(r) != cols for r in rows_idx):
            return None
    grid = np.concatenate(
        [r[np.argsort(ax[r, 0])] for r in rows_idx])
    assign = pts[grid]

    # Homography-guided refinement.
    gy, gx = np.mgrid[0:rows, 0:cols]
    obj = np.stack([gx.ravel().astype(np.float64),
                    gy.ravel().astype(np.float64)], 1)
    for _ in range(5):
        H = homography_dlt(obj, assign)
        ph = np.concatenate([obj, np.ones((n, 1))], 1) @ H.T
        pred = ph[:, :2] / ph[:, 2:]
        # nearest detected corner per lattice slot (greedy one-to-one)
        d = np.linalg.norm(pred[:, None, :] - pts[None, :, :], axis=2)
        new_assign_idx = np.full(n, -1)
        used = np.zeros(len(pts), bool)
        for slot in np.argsort(d.min(1)):
            cand = np.argsort(d[slot])
            for j in cand:
                if not used[j]:
                    new_assign_idx[slot] = j
                    used[j] = True
                    break
        new_assign = pts[new_assign_idx]
        if np.allclose(new_assign, assign):
            assign = new_assign
            break
        assign = new_assign
    # final sanity: residual of the fitted homography
    H = homography_dlt(obj, assign)
    ph = np.concatenate([obj, np.ones((n, 1))], 1) @ H.T
    pred = ph[:, :2] / ph[:, 2:]
    if np.max(np.linalg.norm(pred - assign, axis=1)) > 3.0:
        return None
    return assign.astype(np.float32)


def find_chessboard(img: np.ndarray, rows: int, cols: int,
                    cfg: CalibrationConfig = CalibrationConfig()):
    """Detect + order the inner-corner grid; tries both orientations AND two
    detection scales like the reference (9x6 / 6x9 at full and half
    resolution, corners scaled back, calibrate.cpp:65-108), then refines
    every corner on the ORIGINAL image with the cornerSubPix-equivalent
    (calibrate.cpp:85-86, using cfg.refine_window / refine_iterations /
    refine_eps). Returns ([rows*cols, 2] corners row-major, (rows, cols)) or
    (None, None)."""
    n = rows * cols
    full = jnp.asarray(img, jnp.float32)
    for scale in (1, 2):
        imgj = full if scale == 1 else full[::2, ::2]
        xy, resp, valid = detect_saddle_points(imgj, 3 * n)
        keep = np.array(valid)
        xy = np.asarray(xy)
        # Polarity filter: drop saddle responses that are not X-corners
        # (board boundary / background artifacts), then keep the strongest n.
        xs = np.asarray(xcorner_scores(imgj, jnp.asarray(xy)))
        keep &= xs > 0.25
        xy = xy[keep]
        for r, c in ((rows, cols), (cols, rows)):
            g = order_grid(xy, r, c)
            if g is not None and _grid_plausible(g, r, c):
                if scale > 1:
                    g = g * scale  # scale corners back (calibrate.cpp:79-84)
                g = np.asarray(refine_corners_subpix(
                    full, jnp.asarray(g, jnp.float32), cfg.refine_window,
                    cfg.refine_iterations, cfg.refine_eps))
                return g.astype(np.float32), (r, c)
    return None, None


def _grid_plausible(grid: np.ndarray, rows: int, cols: int) -> bool:
    g = grid.reshape(rows, cols, 2)
    dr = np.linalg.norm(np.diff(g, axis=0), axis=-1)
    dc = np.linalg.norm(np.diff(g, axis=1), axis=-1)
    if dr.size == 0 or dc.size == 0:
        return False
    return (dr.std() < 0.35 * dr.mean()) and (dc.std() < 0.35 * dc.mean())


# ---------------------------------------------------------------------------
# Zhang initialization
# ---------------------------------------------------------------------------

def homography_dlt(obj_xy: np.ndarray, img_xy: np.ndarray) -> np.ndarray:
    """Normalized DLT homography world-plane -> image (host numpy; runs once
    per calibration image)."""
    def norm_pts(p):
        c = p.mean(0)
        s = np.sqrt(2.0) / np.mean(np.linalg.norm(p - c, axis=1))
        T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1]])
        ph = np.concatenate([p, np.ones((len(p), 1))], 1)
        return (ph @ T.T)[:, :2], T

    a, Ta = norm_pts(obj_xy)
    b, Tb = norm_pts(img_xy)
    rows = []
    for (X, Y), (u, v) in zip(a, b):
        rows.append([-X, -Y, -1, 0, 0, 0, u * X, u * Y, u])
        rows.append([0, 0, 0, -X, -Y, -1, v * X, v * Y, v])
    _, _, vt = np.linalg.svd(np.asarray(rows))
    H = vt[-1].reshape(3, 3)
    H = np.linalg.inv(Tb) @ H @ Ta
    return H / H[2, 2]


def intrinsics_from_homographies(Hs: list[np.ndarray],
                                 image_size: tuple[int, int]) -> np.ndarray:
    """Zhang's closed-form K from >= 2 homographies (absolute-conic
    constraints v12 b = 0, (v11 - v22) b = 0). Falls back to a principal-
    point-centered guess if the system is degenerate."""
    def v(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j]])

    rows = []
    for H in Hs:
        rows.append(v(H, 0, 1))
        rows.append(v(H, 0, 0) - v(H, 1, 1))
    A = np.asarray(rows)
    _, s, vt = np.linalg.svd(A)
    b = vt[-1]
    B11, B12, B22, B13, B23, B33 = b
    try:
        cy = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 ** 2)
        lam = B33 - (B13 ** 2 + cy * (B12 * B13 - B11 * B23)) / B11
        fx = np.sqrt(lam / B11)
        fy = np.sqrt(lam * B11 / (B11 * B22 - B12 ** 2))
        cx = -B13 * fx ** 2 / lam
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        if not np.all(np.isfinite(K)) or fx <= 0 or fy <= 0:
            raise FloatingPointError
        return K
    except FloatingPointError:
        h, w = image_size
        f = 1.2 * max(h, w)
        return np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])


def extrinsics_from_homography(K: np.ndarray, H: np.ndarray):
    """Per-image (R, t) from H = K [r1 r2 t] (Zhang), with SVD
    orthogonalization of the rotation."""
    A = np.linalg.inv(K) @ H
    lam = 1.0 / np.linalg.norm(A[:, 0])
    r1 = lam * A[:, 0]
    r2 = lam * A[:, 1]
    r3 = np.cross(r1, r2)
    t = lam * A[:, 2]
    R = np.stack([r1, r2, r3], axis=1)
    u, _, vt = np.linalg.svd(R)
    R = u @ vt
    if np.linalg.det(R) < 0:
        R = -R
    if (R[:, :2] * np.stack([r1, r2], 1)).sum() < 0:
        R, t = -R, -t
    return R, t


# ---------------------------------------------------------------------------
# joint GN refinement (the cv::calibrateCamera LM stage)
# ---------------------------------------------------------------------------

class CalibrationResult(NamedTuple):
    K: np.ndarray
    dist: np.ndarray        # (k1, k2, p1, p2, k3)
    rms: float
    per_image_poses: list[tuple[np.ndarray, np.ndarray]]
    num_images: int


def _project_calib(intr: jax.Array, pose: jax.Array,
                   X: jax.Array) -> jax.Array:
    """Project one board point with intrinsics vector
    [fx, fy, cx, cy, k1, k2, p1, p2, k3] and pose [rvec; t]."""
    R = lie.so3_exp(pose[:3])
    Xc = R @ X + pose[3:]
    x = Xc[0] / Xc[2]
    y = Xc[1] / Xc[2]
    k1, k2, p1, p2, k3 = intr[4], intr[5], intr[6], intr[7], intr[8]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([intr[0] * xd + intr[2], intr[1] * yd + intr[3]])


@functools.partial(jax.jit, static_argnames=("iterations",))
def refine_calibration(intr0: jax.Array, poses0: jax.Array, obj: jax.Array,
                       img_pts: jax.Array, iterations: int = 20):
    """Joint LM over intrinsics (9) + per-image poses (M x 6): full dense
    normal equations via autodiff Jacobians (problem size is tiny —
    9 + 6M params; one fused device solve per iteration)."""
    m = poses0.shape[0]
    n = obj.shape[0]

    def residuals(flat):
        intr = flat[:9]
        poses = flat[9:].reshape(m, 6)

        def per_image(pose, pts):
            return jax.vmap(lambda X, uv: _project_calib(intr, pose, X) - uv
                            )(obj, pts)
        r = jax.vmap(per_image)(poses, img_pts)   # [m, n, 2]
        return r.reshape(-1)

    flat0 = jnp.concatenate([intr0, poses0.reshape(-1)])

    def body(flat, _):
        r = residuals(flat)
        J = jax.jacfwd(residuals)(flat)
        H = J.T @ J
        g = J.T @ r
        lam = 1e-3 * jnp.trace(H) / H.shape[0]
        delta = jnp.linalg.solve(H + lam * jnp.eye(H.shape[0]), -g)
        new = flat + delta
        better = jnp.sum(residuals(new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, new, flat), None

    flat, _ = jax.lax.scan(body, flat0, None, length=iterations)
    r = residuals(flat)
    rms = jnp.sqrt(jnp.mean(r ** 2) * 2.0)  # per-point (u,v) pairs
    return flat[:9], flat[9:].reshape(m, 6), rms


def calibrate_camera(images: list[np.ndarray], cfg: CalibrationConfig
                     = CalibrationConfig(), log=print) -> CalibrationResult:
    """Full calibration from chessboard images (the ``calibrate`` tool,
    calibrate.cpp:5-150)."""
    rows, cols = cfg.board_rows, cfg.board_cols
    sq = cfg.square_size_m
    grids = []
    layouts = []
    for i, img in enumerate(images):
        g, layout = find_chessboard(img, rows, cols, cfg)
        if g is None:
            log(f"Image {i}: chessboard not found, skipping")
            continue
        grids.append(g)
        layouts.append(layout)
        log(f"Image {i}: found {layout[0]}x{layout[1]} corners")
    if len(grids) < 2:
        raise ValueError("need at least 2 usable chessboard images")

    Hs = []
    objs = []
    for g, (r, c) in zip(grids, layouts):
        gy, gx = np.mgrid[0:r, 0:c]
        obj = np.stack([gx.ravel() * sq, gy.ravel() * sq], 1)
        objs.append(obj)
        Hs.append(homography_dlt(obj, g))

    h, w = images[0].shape
    K0 = intrinsics_from_homographies(Hs, (h, w))
    poses0 = []
    for H in Hs:
        R, t = extrinsics_from_homography(K0, H)
        poses0.append(np.concatenate([
            np.asarray(lie.so3_log(jnp.asarray(R, jnp.float32))), t]))

    intr0 = jnp.asarray([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2],
                         0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    obj3 = jnp.asarray(np.concatenate(
        [objs[0], np.zeros((len(objs[0]), 1))], 1), jnp.float32)
    img_pts = jnp.asarray(np.stack(grids), jnp.float32)
    poses0 = jnp.asarray(np.stack(poses0), jnp.float32)

    intr, poses, rms = refine_calibration(
        intr0, poses0, obj3, img_pts, cfg.lm_iterations)
    intr = np.asarray(intr, np.float64)
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1.0]])
    dist = intr[4:9]
    pose_list = []
    for p in np.asarray(poses):
        R = np.asarray(lie.so3_exp(jnp.asarray(p[:3])))
        pose_list.append((R, p[3:]))
    log(f"Calibration RMS reprojection error: {float(rms):.4f} px")
    log(f"K =\n{K}")
    log(f"distCoeffs = {dist}")
    return CalibrationResult(K=K, dist=dist, rms=float(rms),
                             per_image_poses=pose_list,
                             num_images=len(grids))


def run_cli(args) -> int:
    """CLI entry (slam-tpu calibrate)."""
    from slam_loop_closing_tpu.utils import io as io_utils

    img_dir = Path(args.images)
    paths = sorted(img_dir.glob("*.png"))
    if not paths:
        raise SystemExit(f"no .png images in {img_dir} (calibrate.cpp:25)")
    images = [io_utils.load_frame_gray(p) for p in paths]
    cfg = CalibrationConfig(board_cols=args.cols, board_rows=args.rows,
                            square_size_m=args.square_size)
    result = calibrate_camera(images, cfg)
    if args.output_overlays:
        _write_overlays(images, cfg, Path(args.output_overlays))
    return 0


def _write_overlays(images, cfg, out_dir: Path):
    """Corner-overlay PNGs (replaces the reference's 500 ms imshow,
    calibrate.cpp:114-125)."""
    from PIL import Image, ImageDraw

    out_dir.mkdir(parents=True, exist_ok=True)
    for i, img in enumerate(images):
        g, _ = find_chessboard(img, cfg.board_rows, cfg.board_cols, cfg)
        im = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)
                             ).convert("RGB")
        if g is not None:
            d = ImageDraw.Draw(im)
            for x, y in g:
                d.ellipse([x - 3, y - 3, x + 3, y + 3], outline=(255, 0, 0))
        im.save(str(out_dir / f"corners_{i:02d}.png"))
