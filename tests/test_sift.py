"""SIFT front-end tests: detection on synthetic blobs, descriptor
normalization invariants, and matching recall under rotation (the quality
contract, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slam_loop_closing_tpu.config import SiftConfig
from slam_loop_closing_tpu.ops import matching, sift

from tests.test_orb import checkerboard_scene, rotate_image


@pytest.fixture(scope="module")
def cfg():
    return SiftConfig(num_features=200, num_octaves=2)


class TestDetect:
    def test_fixed_capacity(self, rng, cfg):
        img = checkerboard_scene(rng, h=160, w=200)
        f = sift.detect_and_describe(jnp.asarray(img), cfg)
        assert f.xy.shape == (200, 2)
        assert f.descriptors.shape == (200, 128)
        assert int(jnp.sum(f.valid)) > 20

    def test_descriptors_normalized(self, rng, cfg):
        img = checkerboard_scene(rng, h=160, w=200)
        f = sift.detect_and_describe(jnp.asarray(img), cfg)
        d = np.asarray(f.descriptors)[np.asarray(f.valid)]
        norms = np.linalg.norm(d, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
        # clip-at-0.2 then renormalize => entries can exceed 0.2 but stay
        # well below an unclipped spike
        assert d.max() <= 0.5

    def test_blank_image_no_keypoints(self, cfg):
        f = sift.detect_and_describe(jnp.zeros((128, 128)), cfg)
        assert int(jnp.sum(f.valid)) == 0


class TestMatching:
    def test_recall_under_rotation(self, rng, cfg):
        img = checkerboard_scene(rng, h=200, w=200, num_blobs=50)
        theta = np.pi / 8
        rot = rotate_image(img, theta)
        fa = sift.detect_and_describe(jnp.asarray(img), cfg)
        fb = sift.detect_and_describe(jnp.asarray(rot), cfg)
        m = matching.ratio_matches_l2(fa.descriptors, fa.valid,
                                      fb.descriptors, fb.valid, ratio=0.8)
        matched = np.flatnonzero(np.asarray(m.mask))
        assert len(matched) >= 10
        h, w = img.shape
        cy, cx = (h - 1) / 2, (w - 1) / 2
        xa = np.asarray(fa.xy)
        xb = np.asarray(fb.xy)
        c, s = np.cos(theta), np.sin(theta)
        gt_x = c * (xa[:, 0] - cx) - s * (xa[:, 1] - cy) + cx
        gt_y = s * (xa[:, 0] - cx) + c * (xa[:, 1] - cy) + cy
        idx = np.asarray(m.idx)
        err = np.hypot(xb[idx[matched], 0] - gt_x[matched],
                       xb[idx[matched], 1] - gt_y[matched])
        inb = ((gt_x[matched] > 0) & (gt_x[matched] < w - 1)
               & (gt_y[matched] > 0) & (gt_y[matched] < h - 1))
        correct = (err < 4.0)[inb]
        assert correct.mean() >= 0.4, f"recall {correct.mean():.2f}"
