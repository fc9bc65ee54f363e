"""KITTI adapter tests: ground-truth loop pairs from a tiny synthetic pose
file, and the tolerance-windowed recall metric the benchmark reports."""

import numpy as np

from slam_loop_closing_tpu.utils import kitti


def _square_loop_poses(n_side=30, step=1.0):
    """Cam-to-world poses tracing a closed square: the last frames return to
    within a meter of the first ones."""
    poses = []
    pos = np.zeros(3)
    dirs = [np.array([1.0, 0, 0]), np.array([0, 0, 1.0]),
            np.array([-1.0, 0, 0]), np.array([0, 0, -1.0])]
    for leg in range(4):
        for _ in range(n_side):
            P = np.eye(3, 4)
            P[:, 3] = pos
            poses.append(P)
            pos = pos + dirs[leg] * step
    return np.stack(poses)


def test_gt_loop_pairs_from_synthetic_poses(tmp_path):
    poses = _square_loop_poses()
    # exercise the file format round trip the benchmark uses
    (tmp_path / "poses").mkdir()
    np.savetxt(tmp_path / "poses" / "00.txt", poses.reshape(len(poses), 12))
    loaded = kitti.load_gt_poses(tmp_path, "00")
    np.testing.assert_allclose(loaded, poses)
    pairs = kitti.gt_loop_pairs(loaded, dist_thresh=2.0, min_gap=100)
    assert pairs, "square loop must close"
    # every gt pair joins the end of the lap to its start
    for i, j in pairs:
        assert i - j >= 100
        assert i >= 110 and j <= 10


def test_loop_recall_tolerance_window():
    gt = [(118, 0), (119, 1)]
    # exact hit + a detection 3 frames off: full recall at tol=5
    assert kitti.loop_recall([(118, 0), (116, 4)], gt, tol=5) == 1.0
    # only one gt pair matched exactly at tol=0
    assert kitti.loop_recall([(118, 0), (110, 9)], gt, tol=0) == 0.5
    assert kitti.loop_recall([], gt, tol=5) == 0.0
    assert kitti.loop_recall([(1, 2)], [], tol=5) == 0.0


def test_loop_precision_tolerance_window():
    gt = [(118, 0), (119, 1)]
    # both predictions near a gt pair: full precision
    assert kitti.loop_precision([(118, 0), (116, 4)], gt, tol=5) == 1.0
    # one of two predictions is far from any gt pair
    assert kitti.loop_precision([(118, 0), (60, 9)], gt, tol=5) == 0.5
    assert kitti.loop_precision([], gt, tol=5) == 0.0
    assert kitti.loop_precision([(1, 2)], [], tol=5) == 0.0
