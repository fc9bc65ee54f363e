import numpy as np
import jax
import jax.numpy as jnp

from slam_loop_closing_tpu.config import RansacConfig
from slam_loop_closing_tpu.ops import ransac
from fixtures.synthetic import two_view_scene


def _normalized(scene):
    K = scene["K"]
    x1 = (scene["uv1"] - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
    x2 = (scene["uv2"] - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
    return jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)


def test_ransac_clean_scene(rng):
    scene = two_view_scene(rng, n_points=80, noise_px=0.3)
    x1, x2 = _normalized(scene)
    mask = jnp.ones(x1.shape[0], bool)
    cfg = RansacConfig(num_hypotheses=128)
    res = ransac.estimate_essential_ransac(x1, x2, mask, jax.random.key(0),
                                           focal=800.0, cfg=cfg)
    assert bool(res.ok)
    assert int(res.num_inliers) >= 70
    np.testing.assert_allclose(np.asarray(res.R), scene["R"], atol=2e-2)
    t_gt = scene["t"] / np.linalg.norm(scene["t"])
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=3e-2)


def test_ransac_with_outliers(rng):
    scene = two_view_scene(rng, n_points=100, noise_px=0.3, n_outliers=40)
    x1, x2 = _normalized(scene)
    mask = jnp.ones(x1.shape[0], bool)
    cfg = RansacConfig(num_hypotheses=512)
    res = ransac.estimate_essential_ransac(x1, x2, mask, jax.random.key(1),
                                           focal=800.0, cfg=cfg)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    gt = scene["inliers"]
    # nearly all true inliers kept, nearly all outliers rejected
    assert inl[gt].mean() > 0.9
    assert inl[~gt].mean() < 0.1
    np.testing.assert_allclose(np.asarray(res.R), scene["R"], atol=5e-2)


def test_ransac_rejects_degenerate(rng):
    # fewer than 8 valid points -> not ok
    scene = two_view_scene(rng, n_points=20)
    x1, x2 = _normalized(scene)
    mask = jnp.arange(20) < 5
    res = ransac.estimate_essential_ransac(x1, x2, mask, jax.random.key(2),
                                           focal=800.0,
                                           cfg=RansacConfig(num_hypotheses=64))
    assert not bool(res.ok)


def test_hypotheses_for_matches_classic_bound():
    # H is the smallest integer with (1 - w^8)^H <= 1 - confidence
    for conf, w in [(0.999, 0.5), (0.999, 0.585), (0.99, 0.7)]:
        h = ransac.hypotheses_for(conf, w, 8)
        assert (1.0 - w ** 8) ** h <= 1.0 - conf + 1e-12
        assert (1.0 - w ** 8) ** (h - 1) > 1.0 - conf


def test_confidence_drives_budget_when_unset():
    # num_hypotheses=0 derives the budget from confidence (the wiring of
    # RansacConfig.confidence); explicit budgets win.
    derived = ransac.resolved_hypotheses(RansacConfig(num_hypotheses=0))
    assert derived == ransac.hypotheses_for(0.999, 0.585, 8)
    hi = ransac.resolved_hypotheses(
        RansacConfig(num_hypotheses=0, confidence=0.99999))
    assert hi > derived
    assert ransac.resolved_hypotheses(RansacConfig(num_hypotheses=64)) == 64


def test_ransac_derived_budget_runs(rng):
    scene = two_view_scene(rng, n_points=80, noise_px=0.3)
    x1, x2 = _normalized(scene)
    mask = jnp.ones(x1.shape[0], bool)
    cfg = RansacConfig(num_hypotheses=0, confidence=0.99,
                       design_inlier_ratio=0.7)
    res = ransac.estimate_essential_ransac(x1, x2, mask, jax.random.key(0),
                                           focal=800.0, cfg=cfg)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.R), scene["R"], atol=5e-2)


def test_ransac_barely_enough_valid_points(rng):
    # num_valid only slightly >= 8: approx_max_k can emit masked indices;
    # the per-hypothesis sample-validity guard must keep the result sane
    # (either a real model from the 9 valid rows or ok=False -- never a
    # model fit on invalid zero rows that then reports ok).
    scene = two_view_scene(rng, n_points=64, noise_px=0.1)
    x1, x2 = _normalized(scene)
    mask = jnp.arange(64) < 9
    res = ransac.estimate_essential_ransac(
        x1, x2, mask, jax.random.key(5), focal=800.0,
        cfg=RansacConfig(num_hypotheses=256, min_inliers=8))
    inl = np.asarray(res.inliers)
    assert not inl[9:].any()  # invalid rows can never be inliers
    if bool(res.ok):
        np.testing.assert_allclose(np.asarray(res.R), scene["R"], atol=8e-2)


def test_ransac_pairs_vmap(rng):
    scenes = [two_view_scene(rng, n_points=50, noise_px=0.2) for _ in range(3)]
    x1 = jnp.stack([_normalized(s)[0] for s in scenes])
    x2 = jnp.stack([_normalized(s)[1] for s in scenes])
    mask = jnp.ones(x1.shape[:2], bool)
    keys = jax.random.split(jax.random.key(3), 3)
    res = ransac.estimate_essential_ransac_pairs(
        x1, x2, mask, keys, focal=800.0, cfg=RansacConfig(num_hypotheses=128))
    assert res.R.shape == (3, 3, 3)
    for i, s in enumerate(scenes):
        np.testing.assert_allclose(np.asarray(res.R[i]), s["R"], atol=5e-2)
