"""Batched essential-matrix RANSAC.

TPU-native replacement for ``cv::findEssentialMat(RANSAC, prob=0.999,
thresh=1.0)`` + ``cv::recoverPose`` (reference main.cpp:568-618). OpenCV runs
an adaptive sequential hypothesize-and-verify loop; on TPU, data-dependent
iteration counts defeat jit, so we evaluate a *fixed batch* of hypotheses in
parallel:

1. sample ``H`` 8-point minimal sets at once (Gumbel-top-k over the validity
   mask gives distinct valid indices per hypothesis with no rejection loop);
2. solve all ``H`` epipolar models as one batched Householder-QR nullspace
   (exact for minimal samples — no SVD, no essential projection at this
   stage, see the in-function note);
3. score all ``H x N`` Sampson errors in one shot and argmax the inlier count;
4. locally optimize the winner (LO-RANSAC: iterated weighted 8-point refit on
   the running inlier set), then recover (R, t) by cheirality vote.

Budget math: the no-outlier-free-sample probability is (1 - w^8)^H for
inlier ratio w. H = 512 keeps it below the reference's 1 - 0.999 for
w >= ~0.58 ((6.9 / 512)^(1/8)); real keyframe pairs that pass the
pipeline's gates sit well above that, and the refit-on-inliers step mops up
marginal hypotheses. For genuinely low-ratio regimes (w near the 0.3
acceptance floor) raise ``num_hypotheses`` — full 0.999 confidence at
w = 0.3 needs H ~ 1e5, which is still one batched call on TPU if you want
it. The whole routine is jit/vmap-friendly, so verification of many
candidate loop pairs runs as one batched call (SURVEY.md section 2.4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_loop_closing_tpu.config import RansacConfig
from slam_loop_closing_tpu.ops import epipolar


def hypotheses_for(confidence: float, inlier_ratio: float,
                   sample_size: int = 8) -> int:
    """Minimum fixed hypothesis budget H with the classic RANSAC guarantee
    ``(1 - w^s)^H <= 1 - confidence`` (reference main.cpp:589's prob=0.999
    recast for a fixed batch — the adaptive-iteration stop the reference
    gets from OpenCV). This is what ``RansacConfig.confidence`` drives when
    ``num_hypotheses`` is left 0."""
    import math

    w = min(max(inlier_ratio, 1e-6), 1.0 - 1e-6)
    miss = 1.0 - w ** sample_size
    return max(1, math.ceil(math.log(max(1.0 - confidence, 1e-12))
                            / math.log(miss)))


def resolved_hypotheses(cfg: RansacConfig) -> int:
    """The hypothesis budget a config actually runs: an explicit
    ``num_hypotheses`` wins; 0 derives it from ``confidence`` at the
    config's design inlier ratio (see :func:`hypotheses_for`)."""
    if cfg.num_hypotheses:
        return cfg.num_hypotheses
    return hypotheses_for(cfg.confidence, cfg.design_inlier_ratio,
                          cfg.min_points)


class EssentialResult(NamedTuple):
    """Result of :func:`estimate_essential_ransac` (all device arrays)."""

    E: jax.Array            # [3, 3] essential matrix
    R: jax.Array            # [3, 3] relative rotation (cam1 -> cam2)
    t: jax.Array            # [3] unit-norm relative translation
    inliers: jax.Array      # [N] bool Sampson-inlier mask
    num_inliers: jax.Array  # int32
    pose_inliers: jax.Array     # [N] bool inliers passing cheirality
    num_pose_inliers: jax.Array  # int32
    ok: jax.Array           # bool: reference gates (>=8 pts, >=min_inliers)


def _sample_minimal_sets(key: jax.Array, mask: jax.Array, num_hypotheses: int,
                         sample_size: int,
                         quality: jax.Array | None = None) -> jax.Array:
    """[H, sample_size] distinct valid indices per hypothesis via Gumbel top-k.

    With ``quality`` (higher = more confident match), sampling is
    PROSAC-style progressive (Chum & Matas 2005, recast for a fixed batch):
    hypothesis h draws uniformly from the top ``m_h`` matches by quality,
    where ``m_h`` grows geometrically from 4x the sample size to the full
    valid count across the batch. Early hypotheses exploit the confident
    matches (at a 0.3 inlier ratio overall, the top-ranked pool is typically
    2-3x purer, turning a hopeless 512-sample budget into a reliable one);
    late hypotheses recover plain RANSAC so the guarantee degrades to
    uniform if quality is uncorrelated with correctness. Rank-based, so any
    monotone quality (negative Hamming distance, negative L2) works."""
    n = mask.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, n), dtype=jnp.float32)
    if quality is None:
        g = jnp.where(mask[None, :], g, -jnp.inf)
    else:
        q = jnp.where(mask, quality.astype(jnp.float32), -jnp.inf)
        order = jnp.argsort(-q)
        rank = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        nv = jnp.sum(mask.astype(jnp.int32)).astype(jnp.float32)
        pool0 = jnp.float32(4 * sample_size)
        frac = (jnp.arange(num_hypotheses, dtype=jnp.float32)[:, None]
                / max(num_hypotheses - 1, 1))
        pool = pool0 * (jnp.maximum(nv, pool0) / pool0) ** frac   # [H, 1]
        allowed = (rank[None, :].astype(jnp.float32) < pool) & mask[None, :]
        g = jnp.where(allowed, g, -jnp.inf)
    # approx_max_k: the TPU-native top-k (exact top_k sorts each of the H
    # rows — measured as a dominant RANSAC cost at N=4000). For gumbel
    # SAMPLING approximate selection changes nothing: any k distinct
    # high-noise entries are an equally valid random sample.
    _, idx = jax.lax.approx_max_k(g, sample_size, recall_target=0.95)
    return idx


def estimate_essential_ransac(
    x1: jax.Array,
    x2: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    focal: jax.Array | float,
    cfg: RansacConfig = RansacConfig(),
    quality: jax.Array | None = None,
) -> EssentialResult:
    """Batched-RANSAC essential matrix between two normalized point sets.

    Args:
      x1, x2: [N, 2] matched points in normalized camera coordinates.
      mask:   [N] bool validity (padded entries False).
      key:    PRNG key for hypothesis sampling.
      focal:  mean focal length in pixels — converts ``cfg.threshold_px``
              into normalized units, matching OpenCV's internal scaling.
      cfg:    static config (hypothesis budget, gates).
      quality: optional [N] match confidence (higher = better, e.g. negative
              descriptor distance) enabling PROSAC-style progressive
              sampling — essential when the inlier ratio is low (see
              :func:`_sample_minimal_sets`).
    """
    n = x1.shape[0]
    num_valid = jnp.sum(mask.astype(jnp.int32))
    thresh_sq = (cfg.threshold_px / focal) ** 2

    num_h = resolved_hypotheses(cfg)
    idx = _sample_minimal_sets(key, mask, num_h, cfg.min_points, quality)
    p1 = x1[idx]  # [H, 8, 2]
    p2 = x2[idx]
    # Minimal-sample models: exact nullspace of the [8, 9] design via
    # Householder QR of A^T (epipolar.nullspace_8x9) — stable (no A^T A
    # conditioning squaring), ~2.6x faster than the batched SVD, and scored
    # RAW, without projecting onto the essential manifold: forcing singular
    # values to (s, s, 0) perturbs a noisy minimal-sample model so much that
    # inlier recall at the 1 px threshold drops ~3x (measured on synthetic
    # two-view scenes with 0.7 px noise). Only the *winner* is projected.
    Fs = epipolar.nullspace_8x9(epipolar.epipolar_design(p1, p2))
    Fs = Fs.reshape(num_h, 3, 3)

    errs = jax.vmap(epipolar.sampson_error, in_axes=(0, None, None))(
        Fs, x1, x2)  # [H, N]
    inlier_mat = (errs < thresh_sq) & mask[None, :]
    counts = jnp.sum(inlier_mat.astype(jnp.int32), axis=1)  # [H]
    # Guard degenerate hypotheses. Per-hypothesis: approx_max_k over a
    # heavily -inf-masked Gumbel row can return masked indices when few
    # entries are finite (num_valid barely >= 8, tiny PROSAC pools), which
    # would put invalid zero correspondences into the minimal sample — zero
    # the count of any hypothesis whose sample touches an invalid row.
    # Global: num_valid < 8 produces garbage E everywhere.
    sample_ok = jnp.all(mask[idx], axis=1)                   # [H]
    counts = jnp.where(sample_ok, counts, 0)
    counts = jnp.where(num_valid >= cfg.min_points, counts, 0)
    best = jnp.argmax(counts)

    # Local optimization (LO-RANSAC): starting from the raw winner's inlier
    # set, iterate weighted 8-point refit -> essential projection -> re-score.
    # A minimal-sample model overfits its 8 points, so its inlier set is a
    # biased subsample; one refit typically recovers only ~60-70% of the true
    # inliers, while 2-3 iterations converge to ~98% (measured on synthetic
    # scenes at 0.3-0.7 px noise). Each iteration is one [N, 9] SVD — cheap
    # next to the H-hypothesis stage. The returned model is the best-scoring
    # one seen, including the projected raw winner.
    cur_inliers = inlier_mat[best]
    E = epipolar.project_to_essential(Fs[best])
    inliers = (epipolar.sampson_error(E, x1, x2) < thresh_sq) & mask
    num_inliers = jnp.sum(inliers.astype(jnp.int32))
    for _ in range(cfg.refit_iters):
        w = cur_inliers.astype(x1.dtype)
        E_r = epipolar.essential_eight_point(x1, x2, w)
        r_inliers = (epipolar.sampson_error(E_r, x1, x2) < thresh_sq) & mask
        r_count = jnp.sum(r_inliers.astype(jnp.int32))
        take = r_count >= num_inliers
        E = jnp.where(take, E_r, E)
        inliers = jnp.where(take, r_inliers, inliers)
        num_inliers = jnp.maximum(r_count, num_inliers)
        cur_inliers = r_inliers

    R, t, pose_inliers, num_pose = epipolar.recover_pose(E, x1, x2, inliers)

    ok = (num_valid >= cfg.min_points) & (num_inliers >= cfg.min_inliers)
    return EssentialResult(E=E, R=R, t=t, inliers=inliers,
                           num_inliers=num_inliers, pose_inliers=pose_inliers,
                           num_pose_inliers=num_pose, ok=ok)


@functools.partial(jax.jit, static_argnames=("cfg",))
def estimate_essential_ransac_pairs(
    x1: jax.Array, x2: jax.Array, mask: jax.Array, keys: jax.Array,
    focal: jax.Array | float, cfg: RansacConfig = RansacConfig(),
    quality: jax.Array | None = None,
) -> EssentialResult:
    """vmap of :func:`estimate_essential_ransac` over a leading pair axis —
    verification of all candidate loop pairs in parallel (the reference's
    sequential hot loop #2, main.cpp:1362-1421, flattened). Jitted at module
    level so repeat calls at one shape reuse the compiled program."""
    if quality is None:
        return jax.vmap(
            lambda a, b, m, k: estimate_essential_ransac(a, b, m, k, focal,
                                                         cfg)
        )(x1, x2, mask, keys)
    return jax.vmap(
        lambda a, b, m, k, q: estimate_essential_ransac(a, b, m, k, focal,
                                                        cfg, q)
    )(x1, x2, mask, keys, quality)
