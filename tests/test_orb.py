"""ORB front-end tests: FAST corners, orientation, rBRIEF rotation
invariance, and matching recall on synthetic warps (the quality-level parity
contract of SURVEY.md §4 — the reference has no tests of its own)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slam_loop_closing_tpu.config import OrbConfig
from slam_loop_closing_tpu.ops import descriptors as desc_ops
from slam_loop_closing_tpu.ops import matching, orb


def checkerboard_scene(rng, h=160, w=200, num_blobs=40):
    """Random bright square blobs on a dark background — strong corners."""
    img = np.zeros((h, w), np.float32)
    for _ in range(num_blobs):
        y = rng.integers(20, h - 30)
        x = rng.integers(20, w - 30)
        s = rng.integers(4, 10)
        img[y:y + s, x:x + s] = rng.uniform(0.6, 1.0)
    return img


def rotate_image(img, angle_rad):
    """Nearest-neighbor rotation about the image center (test-only helper)."""
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    c, s = np.cos(-angle_rad), np.sin(-angle_rad)
    sx = c * (xs - cx) - s * (ys - cy) + cx
    sy = s * (xs - cx) + c * (ys - cy) + cy
    sxi = np.clip(np.round(sx).astype(int), 0, w - 1)
    syi = np.clip(np.round(sy).astype(int), 0, h - 1)
    out = img[syi, sxi]
    out[(sx < 0) | (sx > w - 1) | (sy < 0) | (sy > h - 1)] = 0.0
    return out.astype(np.float32)


class TestDetect:
    def test_finds_corners_of_square(self):
        img = np.zeros((64, 64), np.float32)
        img[24:40, 24:40] = 1.0
        cfg = OrbConfig(num_features=50, num_levels=1, border=8)
        feats = orb.detect_and_describe(jnp.asarray(img), cfg)
        kp = feats.keypoints
        xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
        assert len(xy) >= 4
        corners = np.array([[24, 24], [24, 39], [39, 24], [39, 39]])
        for c in corners:
            d = np.linalg.norm(xy - c[None, :], axis=1).min()
            assert d <= 2.0, f"corner {c} missed (nearest {d})"

    def test_fixed_capacity_and_masks(self, rng):
        img = checkerboard_scene(rng)
        cfg = OrbConfig(num_features=300, num_levels=2)
        feats = orb.detect_and_describe(jnp.asarray(img), cfg)
        assert feats.keypoints.xy.shape == (300, 2)
        assert feats.descriptors.shape == (300, 8)
        assert feats.signed.shape == (300, 256)
        valid = np.asarray(feats.keypoints.valid)
        # invalid rows must be zero in the signed layout (matmul-safe padding)
        assert np.all(np.asarray(feats.signed)[~valid] == 0)
        assert valid.sum() > 50

    def test_batch_matches_single(self, rng):
        imgs = np.stack([checkerboard_scene(rng), checkerboard_scene(rng)])
        cfg = OrbConfig(num_features=100, num_levels=1)
        batch = orb.detect_and_describe_batch(jnp.asarray(imgs), cfg)
        single = orb.detect_and_describe(jnp.asarray(imgs[1]), cfg)
        # top_k tie-breaking may differ between batched and unbatched XLA
        # lowerings, so compare the keypoint SETS, not the ordering.
        def kp_set(xy, valid):
            pts = np.asarray(xy)[np.asarray(valid)]
            return set(map(tuple, pts.astype(int).tolist()))
        sa = kp_set(batch.keypoints.xy[1], batch.keypoints.valid[1])
        sb = kp_set(single.keypoints.xy, single.keypoints.valid)
        overlap = len(sa & sb) / max(len(sa | sb), 1)
        assert overlap >= 0.9, f"keypoint set overlap {overlap:.2f}"


class TestOrientation:
    def test_gradient_patch_angle(self):
        # Patch brighter toward +x => centroid along +x => angle ~ 0.
        img = np.tile(np.linspace(0, 1, 64, dtype=np.float32), (64, 1))
        ang = orb.orientation(jnp.asarray(img),
                              jnp.asarray([[32.0, 32.0]]),
                              jnp.asarray([True]))
        assert abs(float(ang[0])) < 0.1
        # Rotate gradient 90 deg: brighter toward +y => angle ~ pi/2.
        ang90 = orb.orientation(jnp.asarray(img.T),
                                jnp.asarray([[32.0, 32.0]]),
                                jnp.asarray([True]))
        assert abs(float(ang90[0]) - np.pi / 2) < 0.1

    def test_rotation_equivariance(self, rng):
        img = checkerboard_scene(rng, h=200, w=200)
        theta = 0.5
        rot = rotate_image(img, theta)
        # A keypoint at the center maps to itself.
        a0 = float(orb.orientation(jnp.asarray(img),
                                   jnp.asarray([[99.5, 99.5]]),
                                   jnp.asarray([True]))[0])
        a1 = float(orb.orientation(jnp.asarray(rot),
                                   jnp.asarray([[99.5, 99.5]]),
                                   jnp.asarray([True]))[0])
        diff = (a1 - a0 - theta + np.pi) % (2 * np.pi) - np.pi
        # nearest-neighbor rotation resampling perturbs the centroid a bit
        assert abs(diff) < 0.25


class TestDescriptors:
    def test_pattern_deterministic(self):
        p1 = orb.make_pattern(17)
        p2 = orb.make_pattern(17)
        assert np.array_equal(p1, p2)
        assert orb.make_pattern(18).shape == (256, 2, 2)
        assert not np.array_equal(p1, orb.make_pattern(18))

    def test_pack_roundtrip(self, rng):
        bits = (rng.random((10, 256)) > 0.5).astype(np.uint8)
        packed = desc_ops.bits_to_packed(jnp.asarray(bits))
        back = desc_ops.packed_to_bits(packed)
        assert np.array_equal(np.asarray(back), bits)

    def test_matching_recall_under_rotation(self, rng):
        """>=40% of keypoints must match correctly between a frame and its
        30-degree-rotated copy — the rBRIEF rotation-invariance contract."""
        img = checkerboard_scene(rng, h=240, w=240, num_blobs=60)
        theta = np.pi / 6
        rot = rotate_image(img, theta)
        cfg = OrbConfig(num_features=200, num_levels=1)
        fa = orb.detect_and_describe(jnp.asarray(img), cfg)
        fb = orb.detect_and_describe(jnp.asarray(rot), cfg)

        m = matching.nn_matches_2xmin(fa.signed, fa.keypoints.valid,
                                      fb.signed, fb.keypoints.valid)
        # Ground truth: keypoint a at xy maps into frame b by the rotation.
        h, w = img.shape
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        xy_a = np.asarray(fa.keypoints.xy)
        c, s = np.cos(theta), np.sin(theta)
        gt_x = c * (xy_a[:, 0] - cx) - s * (xy_a[:, 1] - cy) + cx
        gt_y = s * (xy_a[:, 0] - cx) + c * (xy_a[:, 1] - cy) + cy
        xy_b = np.asarray(fb.keypoints.xy)
        mask = np.asarray(m.mask)
        idx = np.asarray(m.idx)
        matched = np.flatnonzero(mask)
        assert len(matched) >= 20
        err = np.hypot(xy_b[idx[matched], 0] - gt_x[matched],
                       xy_b[idx[matched], 1] - gt_y[matched])
        inb = ((gt_x[matched] > 0) & (gt_x[matched] < w - 1)
               & (gt_y[matched] > 0) & (gt_y[matched] < h - 1))
        correct = (err < 3.0)[inb]
        # 30-bin rotation quantization + nearest sampling (the OpenCV-ORB
        # discretization) costs a few recall points vs exact bilinear
        assert correct.mean() >= 0.3, f"recall {correct.mean():.2f}"
