"""SIFT-class float front-end: DoG pyramid detector + 4x4x8
gradient-histogram descriptor, as fixed-shape batched array ops.

TPU-native replacement for ``cv::SIFT::create(4000)`` + ``detectAndCompute``
(reference main.cpp:497-504), at QUALITY parity, not bit parity (SURVEY.md §7
"hard parts": bit-exactness vs the CPU reference is impossible; the contract
is matching recall). Differences from cv::SIFT by design:

* extrema are detected on the full DoG stack with vectorized 26-neighbor
  comparisons (no per-pixel scanning), then top-K'd into a fixed keypoint
  budget per octave — static shapes under jit;
* orientation is the dominant bin of a 36-bin Gaussian-weighted gradient
  histogram over the keypoint's scale-proportional window (single peak; the
  reference can emit multiple keypoints per peak);
* the descriptor samples a rotated 16x16 gradient grid (4x4 cells x 8
  orientation bins, bilinear sampling, soft bin assignment), L2-normalized,
  clipped at 0.2, renormalized — the standard SIFT recipe;
* everything vmaps over keypoints and over frames.

Matching uses :func:`..matching.ratio_matches_l2` (the reference's
BFMatcher(NORM_L2) + knn2 + Lowe ratio, main.cpp:509-534).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_loop_closing_tpu.config import SiftConfig
from slam_loop_closing_tpu.ops import image as image_ops


class SiftFeatures(NamedTuple):
    xy: jax.Array          # [K, 2] level-0 pixel coords
    scale: jax.Array       # [K] absolute sigma
    angle: jax.Array       # [K] radians
    response: jax.Array    # [K] |DoG|
    valid: jax.Array       # [K] bool
    descriptors: jax.Array  # [K, 128] float32, L2-normalized


def _gaussian_stack(img: jax.Array, num_scales: int, sigma0: float):
    """One octave's Gaussian stack [S+3, H, W] with geometric sigma steps.
    Sigmas are static Python floats (gaussian_blur kernel sizes must be
    compile-time constants)."""
    import math

    k = 2.0 ** (1.0 / num_scales)
    levels = [image_ops.gaussian_blur(img, sigma0)]
    sig_prev = sigma0
    for s in range(1, num_scales + 3):
        sig_total = sigma0 * (k ** s)
        sig_extra = math.sqrt(max(sig_total ** 2 - sig_prev ** 2, 1e-6))
        levels.append(image_ops.gaussian_blur(levels[-1], sig_extra))
        sig_prev = sig_total
    return jnp.stack(levels)


def _extrema_response(dog: jax.Array) -> jax.Array:
    """[S+2, H, W] -> response map where a pixel is a 26-neighborhood
    extremum of the DoG stack (interior scales only), else 0."""
    s, h, w = dog.shape

    def ring_max_min(x):
        # 3x3x3 neighborhood max/min excluding center, via shifted slices of
        # a padded stack (all-parallel; no pixel loops).
        p = jnp.pad(x, 1, constant_values=-jnp.inf)
        q = jnp.pad(x, 1, constant_values=jnp.inf)
        mx = None
        mn = None
        for ds in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if ds == 0 and dy == 0 and dx == 0:
                        continue
                    a = jax.lax.dynamic_slice(p, (1 + ds, 1 + dy, 1 + dx),
                                              (s, h, w))
                    b = jax.lax.dynamic_slice(q, (1 + ds, 1 + dy, 1 + dx),
                                              (s, h, w))
                    mx = a if mx is None else jnp.maximum(mx, a)
                    mn = b if mn is None else jnp.minimum(mn, b)
        return mx, mn

    nb_max, nb_min = ring_max_min(dog)
    is_max = dog > nb_max
    is_min = dog < nb_min
    resp = jnp.where(is_max | is_min, jnp.abs(dog), 0.0)
    # interior scales only
    resp = resp.at[0].set(0.0).at[-1].set(0.0)
    return resp


def _edge_mask(dog_level: jax.Array, edge_threshold: float) -> jax.Array:
    """Reject edge responses: principal-curvature ratio test on the 2x2
    spatial Hessian (tr^2/det < (r+1)^2/r)."""
    gy, gx = jnp.gradient(dog_level)
    gyy, _ = jnp.gradient(gy)
    gxy, gxx = jnp.gradient(gx)
    tr = gxx + gyy
    det = gxx * gyy - gxy * gxy
    r = edge_threshold
    ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    return ok


@functools.partial(jax.jit, static_argnames=("cfg", "budget", "octave"))
def _detect_octave(img: jax.Array, octave: int, budget: int,
                   cfg: SiftConfig):
    """Detect top-``budget`` DoG keypoints in one octave. Returns fixed-size
    (xy level0, sigma, response, valid, grad_mag, grad_ang, xy_octave)."""
    s = cfg.scales_per_octave
    gauss = _gaussian_stack(img, s, cfg.sigma0)           # [S+3, H, W]
    dog = gauss[1:] - gauss[:-1]                          # [S+2, H, W]
    resp = _extrema_response(dog)
    # contrast gate (cv uses contrast_threshold/scales at the candidate)
    resp = jnp.where(jnp.abs(dog) >= cfg.contrast_threshold / s, resp, 0.0)
    # edge gate per interior level
    for lvl in range(1, s + 1):
        resp = resp.at[lvl].set(
            jnp.where(_edge_mask(dog[lvl], cfg.edge_threshold),
                      resp[lvl], 0.0))
    h, w = img.shape
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    border = 8
    interior = ((ys[:, None] >= border) & (ys[:, None] < h - border)
                & (xs[None, :] >= border) & (xs[None, :] < w - border))
    resp = jnp.where(interior[None], resp, 0.0)

    flat = resp.reshape(-1)
    vals, idx = jax.lax.top_k(flat, budget)
    lvl = idx // (h * w)
    rem = idx % (h * w)
    y = (rem // w).astype(jnp.float32)
    x = (rem % w).astype(jnp.float32)
    valid = vals > 0.0
    k = 2.0 ** (1.0 / s)
    sigma = cfg.sigma0 * (k ** lvl.astype(jnp.float32)) * (2.0 ** octave)
    xy0 = jnp.stack([x, y], -1) * (2.0 ** octave)
    # gradient maps of the middle Gaussian level (descriptor source)
    g = gauss[s // 2 + 1]
    gy, gx = jnp.gradient(g)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ang = jnp.arctan2(gy, gx)
    return xy0, sigma, vals, valid, mag, ang, jnp.stack([x, y], -1)


def _orientation_and_descriptor(mag: jax.Array, ang: jax.Array,
                                xy: jax.Array, sigma_oct: jax.Array,
                                valid: jax.Array):
    """Dominant orientation + 4x4x8 descriptor for each keypoint from the
    octave's gradient maps ([K] vmapped)."""
    def one(pt, sig, ok):
        # --- orientation: 36-bin histogram over a round window -----------
        r = 8  # fixed sample radius in grid units; scaled by sigma below
        offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
        gy, gx_ = jnp.meshgrid(offs, offs, indexing="ij")
        scale = jnp.maximum(sig, 1.0) * 0.5
        pos = pt[None, None, :] + jnp.stack([gx_, gy], -1) * scale
        m = image_ops.bilinear_sample(mag, pos)
        a = image_ops.bilinear_sample(ang, pos)
        wgt = jnp.exp(-(gx_ ** 2 + gy ** 2) / (2.0 * (r * 0.5) ** 2))
        bins = jnp.floor((a + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32)
        bins = jnp.clip(bins, 0, 35)
        hist = jnp.zeros(36).at[bins.ravel()].add((m * wgt).ravel())
        # smooth the circular histogram
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        theta = (jnp.argmax(hist).astype(jnp.float32) + 0.5) / 36.0 \
            * 2 * jnp.pi - jnp.pi

        # --- descriptor: rotated 16x16 grid -> 4x4 cells x 8 bins --------
        g16 = (jnp.arange(16, dtype=jnp.float32) - 7.5)
        gy16, gx16 = jnp.meshgrid(g16, g16, indexing="ij")
        c, s = jnp.cos(theta), jnp.sin(theta)
        rx = c * gx16 - s * gy16
        ry = s * gx16 + c * gy16
        pos = pt[None, None, :] + jnp.stack([rx, ry], -1) * scale
        m = image_ops.bilinear_sample(mag, pos)
        a = image_ops.bilinear_sample(ang, pos) - theta
        wgt = jnp.exp(-(gx16 ** 2 + gy16 ** 2) / (2.0 * 8.0 ** 2))
        mw = m * wgt
        # soft orientation binning (linear split between 2 adjacent bins)
        af = (a + jnp.pi) / (2 * jnp.pi) * 8.0
        b0 = jnp.floor(af).astype(jnp.int32) % 8
        b1 = (b0 + 1) % 8
        f = af - jnp.floor(af)
        cell_y = jnp.clip(jnp.floor((gy16 + 8.0) / 4.0), 0, 3).astype(jnp.int32)
        cell_x = jnp.clip(jnp.floor((gx16 + 8.0) / 4.0), 0, 3).astype(jnp.int32)
        cell = cell_y * 4 + cell_x
        desc = jnp.zeros(128)
        desc = desc.at[(cell * 8 + b0).ravel()].add((mw * (1 - f)).ravel())
        desc = desc.at[(cell * 8 + b1).ravel()].add((mw * f).ravel())
        # normalize, clip, renormalize (illumination invariance)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
        desc = jnp.minimum(desc, 0.2)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
        z = jnp.zeros(128)
        return jnp.where(ok, theta, 0.0), jnp.where(ok, desc, z)

    return jax.vmap(one)(xy, sigma_oct, valid)


def _level_budgets(total: int, num_octaves: int) -> list[int]:
    inv = [2.0 ** -o for o in range(num_octaves)]
    s = sum(inv)
    out = [int(round(total * v / s)) for v in inv]
    out[0] += total - sum(out)
    return out


def detect_and_describe(img: jax.Array,
                        cfg: SiftConfig = SiftConfig()) -> SiftFeatures:
    """Full SIFT on one [H, W] float32 frame -> fixed-size features (total
    capacity exactly ``cfg.num_features``, main.cpp:502's budget)."""
    budgets = _level_budgets(cfg.num_features, cfg.num_octaves)
    octave_img = img
    parts = []
    for o in range(cfg.num_octaves):
        if budgets[o] > 0 and min(octave_img.shape) >= 32:
            xy0, sigma, respv, valid, mag, ang, xy_oct = _detect_octave(
                octave_img, o, budgets[o], cfg)
            theta, desc = _orientation_and_descriptor(
                mag, ang, xy_oct, sigma / (2.0 ** o), valid)
            parts.append((xy0, sigma, theta, respv, valid, desc))
        else:
            b = max(budgets[o], 0)
            parts.append((jnp.zeros((b, 2)), jnp.zeros(b), jnp.zeros(b),
                          jnp.zeros(b), jnp.zeros(b, bool),
                          jnp.zeros((b, 128))))
        h, w = octave_img.shape
        octave_img = image_ops.resize_bilinear(octave_img, h // 2, w // 2)

    cat = lambda *xs: jnp.concatenate(xs, 0)
    xy, sc, th, rv, va, de = jax.tree.map(cat, *parts)
    return SiftFeatures(xy=xy, scale=sc, angle=th, response=rv, valid=va,
                        descriptors=de)


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_and_describe_batch(imgs: jax.Array,
                              cfg: SiftConfig = SiftConfig()) -> SiftFeatures:
    """Module-level jit so repeat calls at one shape reuse the cache instead
    of re-tracing the whole pyramid."""
    return jax.vmap(lambda im: detect_and_describe(im, cfg))(imgs)
