"""Synthetic-scene generators: known 3D points + known camera trajectories
give exact ground truth for E, (R, t), triangulation, PGO, and BA
(the test strategy SURVEY.md §4 calls for — the reference has no tests).

All geometry follows the framework/reference convention: world->camera poses,
``x_cam = R @ X + t``.
"""

from __future__ import annotations

import numpy as np


def rotation_from_axis_angle(axis: np.ndarray, angle: float) -> np.ndarray:
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def random_rotation(rng: np.random.Generator, max_angle: float = np.pi) -> np.ndarray:
    axis = rng.normal(size=3)
    angle = rng.uniform(-max_angle, max_angle)
    return rotation_from_axis_angle(axis, angle)


def project_points(K, R, t, X):
    """[N,3] world points -> [N,2] pixels (+ depth array)."""
    Xc = X @ R.T + t
    z = Xc[:, 2]
    uv = Xc[:, :2] / z[:, None]
    uv = uv @ np.diag([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])
    return uv, z


def two_view_scene(rng: np.random.Generator, n_points: int = 100,
                   noise_px: float = 0.0, n_outliers: int = 0,
                   fx: float = 800.0, fy: float = 800.0,
                   cx: float = 640.0, cy: float = 360.0,
                   baseline: float = 1.0, rot_deg: float = 8.0):
    """Two calibrated views of a random point cloud in front of both cameras.

    Returns dict with K, R (relative cam1->cam2), t (unit norm), world points
    X, pixel observations uv1/uv2, and an inlier mask (False rows are
    synthetic outlier correspondences).
    """
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    # Points in a box in front of camera 1 (z in [4, 10]).
    X = np.stack([
        rng.uniform(-3, 3, n_points),
        rng.uniform(-2, 2, n_points),
        rng.uniform(4, 10, n_points),
    ], axis=1)
    R1, t1 = np.eye(3), np.zeros(3)
    axis = rng.normal(size=3)
    R_rel = rotation_from_axis_angle(axis, np.deg2rad(rot_deg))
    t_rel = rng.normal(size=3)
    t_rel = t_rel / np.linalg.norm(t_rel) * baseline
    # Keep all points in front of camera 2: nudge translation if needed.
    Xc2 = X @ R_rel.T + t_rel
    if (Xc2[:, 2] <= 0.5).any():
        t_rel[2] += 0.5 - Xc2[:, 2].min() + 0.1
        t_rel = t_rel / np.linalg.norm(t_rel) * baseline
        Xc2 = X @ R_rel.T + t_rel
        X = X[Xc2[:, 2] > 0.5]
        n_points = len(X)

    uv1, z1 = project_points(K, R1, t1, X)
    uv2, z2 = project_points(K, R_rel, t_rel, X)
    if noise_px > 0:
        uv1 = uv1 + rng.normal(scale=noise_px, size=uv1.shape)
        uv2 = uv2 + rng.normal(scale=noise_px, size=uv2.shape)
    inlier_mask = np.ones(n_points, dtype=bool)
    if n_outliers > 0:
        pick = rng.choice(n_points, size=n_outliers, replace=False)
        uv2[pick] = np.stack([
            rng.uniform(0, 2 * cx, n_outliers),
            rng.uniform(0, 2 * cy, n_outliers),
        ], axis=1)
        inlier_mask[pick] = False
    return dict(K=K, R=R_rel, t=t_rel, X=X, uv1=uv1, uv2=uv2,
                inliers=inlier_mask)


def circular_trajectory(n_poses: int, radius: float = 5.0,
                        closes_loop: bool = True):
    """Cameras on a circle looking at the center — classic loop-closure
    trajectory. Returns world->camera (R[i], t[i]) arrays."""
    Rs, ts = [], []
    for i in range(n_poses):
        ang = 2 * np.pi * i / n_poses if closes_loop else np.pi * i / n_poses
        C = np.array([radius * np.cos(ang), 0.0, radius * np.sin(ang)])
        # look-at the origin: z axis toward -C
        z = -C / np.linalg.norm(C)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z])  # rows = camera axes in world
        t = -R_wc @ C
        Rs.append(R_wc)
        ts.append(t)
    return np.stack(Rs), np.stack(ts)


def multi_view_scene(rng: np.random.Generator, n_poses: int = 12,
                     n_points: int = 200, noise_px: float = 0.0,
                     fx: float = 800.0, fy: float = 800.0,
                     cx: float = 640.0, cy: float = 360.0,
                     radius: float = 5.0):
    """A circular trajectory around a central point cloud with full
    visibility — ground truth for PGO/BA tests."""
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    X = np.stack([
        rng.uniform(-1.5, 1.5, n_points),
        rng.uniform(-1.5, 1.5, n_points),
        rng.uniform(-1.5, 1.5, n_points),
    ], axis=1)
    Rs, ts = circular_trajectory(n_poses, radius=radius)
    obs = np.zeros((n_poses, n_points, 2))
    vis = np.zeros((n_poses, n_points), dtype=bool)
    for i in range(n_poses):
        uv, z = project_points(K, Rs[i], ts[i], X)
        if noise_px > 0:
            uv = uv + rng.normal(scale=noise_px, size=uv.shape)
        obs[i] = uv
        vis[i] = z > 0.1
    return dict(K=K, Rs=Rs, ts=ts, X=X, obs=obs, vis=vis)
