"""ORB: oriented-FAST keypoints + rotated-BRIEF 256-bit descriptors.

TPU-native replacement for ``cv::ORB`` (declared in the reference at
loop_closing.hpp:72; README.md:112-115: "2000 max features, 256-bit binary
descriptors"). A CPU ORB walks keypoints one at a time; here every stage is a
fixed-shape batched array op so the whole frame's keypoints are processed in
parallel on the VPU/MXU, and the same code vmaps over a batch of frames:

1. :mod:`.fast` gives dense FAST-9 scores -> NMS -> top-K keypoints per
   pyramid level (fixed per-level budgets, so shapes are static under jit);
2. :func:`orientation` computes the intensity-centroid angle over a circular
   31x31 patch (the "oriented" in oFAST) for all keypoints at once;
3. :func:`brief_descriptors` samples 256 pre-blurred point pairs per keypoint,
   rotated by the keypoint angle (rBRIEF), and packs the comparison bits into
   ``[K, 8] uint32``.

The BRIEF sampling pattern is a deterministic Gaussian pattern (original BRIEF
paper's sigma = patch/5 recipe) generated from ``OrbConfig.pattern_seed`` —
NOT OpenCV's learned pattern, so descriptors are not bit-compatible with
cv::ORB; parity is at the matching-quality level (SURVEY.md §4 "quality-level
tests, not bitwise").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_loop_closing_tpu.config import OrbConfig
from slam_loop_closing_tpu.ops import descriptors as desc_ops
from slam_loop_closing_tpu.ops import fast as fast_ops
from slam_loop_closing_tpu.ops import image as image_ops

PATCH_RADIUS = 15  # patch_size 31 -> radius 15 (cv::ORB HARRIS patchSize)


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one frame (padded, mask-valid)."""

    xy: jax.Array        # [K, 2] float32 (x, y) in level-0 pixel coords
    response: jax.Array  # [K] float32 detector response
    angle: jax.Array     # [K] float32 radians
    octave: jax.Array    # [K] int32 pyramid level
    valid: jax.Array     # [K] bool


class OrbFeatures(NamedTuple):
    keypoints: Keypoints
    descriptors: jax.Array  # [K, 8] uint32 packed 256-bit rBRIEF
    signed: jax.Array       # [K, 256] int8 +-1 (MXU matmul layout)


def make_pattern(seed: int, bits: int = 256, patch_size: int = 31) -> np.ndarray:
    """Deterministic BRIEF sampling pattern: [bits, 2, 2] float32 (two (x, y)
    offsets per bit), i.i.d. Gaussian with sigma = patch/5, clipped to the
    patch (BRIEF G-II pattern). Host-side, computed once per config."""
    rng = np.random.default_rng(seed)
    sigma = patch_size / 5.0
    lim = patch_size // 2
    pts = rng.normal(0.0, sigma, size=(bits, 2, 2))
    return np.clip(pts, -lim, lim).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("patch_radius",))
def orientation(img: jax.Array, xy: jax.Array, valid: jax.Array,
                patch_radius: int = PATCH_RADIUS) -> jax.Array:
    """Intensity-centroid orientation for all keypoints at once.

    ``theta = atan2(m01, m10)`` with moments over a circular patch
    (IC_Angle in cv::ORB). Patches are gathered with one dynamic-slice per
    keypoint (vmapped -> a single XLA gather), weights are the circular mask.
    Returns [K] float32 radians (0 for invalid keypoints).
    """
    d = 2 * patch_radius + 1
    offs = jnp.arange(-patch_radius, patch_radius + 1, dtype=jnp.float32)
    circ = (offs[:, None] ** 2 + offs[None, :] ** 2) <= patch_radius ** 2

    h, w = img.shape

    def one(pt):
        x0 = jnp.clip(pt[0].astype(jnp.int32) - patch_radius, 0, w - d)
        y0 = jnp.clip(pt[1].astype(jnp.int32) - patch_radius, 0, h - d)
        patch = jax.lax.dynamic_slice(img, (y0, x0), (d, d))
        pw = jnp.where(circ, patch, 0.0)
        m10 = jnp.sum(pw * offs[None, :])   # x moment
        m01 = jnp.sum(pw * offs[:, None])   # y moment
        return jnp.arctan2(m01, m10)

    ang = jax.vmap(one)(xy)
    return jnp.where(valid, ang, 0.0)


@jax.jit
def brief_descriptors(img_blurred: jax.Array, xy: jax.Array, angle: jax.Array,
                      valid: jax.Array, pattern: jax.Array) -> jax.Array:
    """Rotated-BRIEF bits for all keypoints: [K, 256] uint8 {0, 1}.

    ``pattern`` is [256, 2, 2] offsets; each pair is rotated by the keypoint
    angle, sampled bilinearly from the pre-blurred image, and compared.
    Invalid keypoints get all-zero bits (their packed descriptors are later
    masked out of matching anyway).
    """
    c, s = jnp.cos(angle), jnp.sin(angle)          # [K]
    rot = jnp.stack([jnp.stack([c, -s], -1),
                     jnp.stack([s, c], -1)], -2)    # [K, 2, 2]
    # pattern offsets are (x, y); rotate then translate to keypoint.
    # [K, 256, 2, 2] = einsum over the offset coordinate.
    rotated = jnp.einsum("kab,pqb->kpqa", rot, pattern)
    pos = rotated + xy[:, None, None, :]            # [K, 256, 2, 2]
    samples = image_ops.bilinear_sample(img_blurred, pos)  # [K, 256, 2]
    bits = (samples[..., 0] < samples[..., 1]).astype(jnp.uint8)
    return jnp.where(valid[:, None], bits, jnp.uint8(0))


def _level_budgets(num_features: int, num_levels: int,
                   scale_factor: float) -> list[int]:
    """Per-level keypoint budgets proportional to 1/scale**level (the same
    geometric distribution cv::ORB uses), summing exactly to num_features."""
    inv = [scale_factor ** -i for i in range(num_levels)]
    total = sum(inv)
    budgets = [int(round(num_features * v / total)) for v in inv]
    budgets[0] += num_features - sum(budgets)
    return budgets


def detect_and_describe(img: jax.Array, cfg: OrbConfig = OrbConfig(),
                        pattern: jax.Array | None = None) -> OrbFeatures:
    """Full ORB on one grayscale [H, W] float32 frame -> fixed-size features.

    Pyramid levels are separate static shapes (each jit-compiles once);
    keypoint coordinates are mapped back to level-0 pixels. Total keypoint
    capacity is exactly ``cfg.num_features``.
    """
    if pattern is None:
        pattern = jnp.asarray(make_pattern(cfg.pattern_seed,
                                           cfg.descriptor_bits,
                                           cfg.patch_size))
    levels = image_ops.pyramid(img, cfg.num_levels, cfg.scale_factor)
    budgets = _level_budgets(cfg.num_features, cfg.num_levels,
                             cfg.scale_factor)

    parts = []
    for lvl, (level_img, budget) in enumerate(zip(levels, budgets)):
        if budget <= 0:
            continue
        parts.append(_detect_level(level_img, lvl, budget, pattern, cfg))

    cat = lambda *xs: jnp.concatenate(xs, axis=0)
    xy, resp, ang, octv, val, bits = jax.tree.map(cat, *parts)
    packed = desc_ops.bits_to_packed(bits)
    # Invalid rows are all-zero in the signed layout so padded descriptors
    # contribute dot = 0 in the Hamming matmul (matching.py's contract).
    signed = jnp.where(val[:, None], desc_ops.bits_to_signed(bits),
                       jnp.int8(0))
    kps = Keypoints(xy=xy, response=resp, angle=ang, octave=octv, valid=val)
    return OrbFeatures(keypoints=kps, descriptors=packed, signed=signed)


@functools.partial(jax.jit, static_argnames=("level", "budget", "cfg"))
def _detect_level(level_img: jax.Array, level: int, budget: int,
                  pattern: jax.Array, cfg: OrbConfig):
    thr = cfg.fast_threshold / 255.0
    xy, resp, valid = fast_ops.detect(
        level_img, threshold=thr, num_features=budget,
        nms_radius=cfg.nms_radius, border=cfg.border)
    ang = orientation(level_img, xy, valid)
    blurred = image_ops.gaussian_blur(level_img, 2.0)
    bits = brief_descriptors(blurred, xy, ang, valid, pattern)
    scale = cfg.scale_factor ** level
    xy0 = xy * scale
    octv = jnp.full(xy.shape[:1], level, jnp.int32)
    return xy0, resp, ang, octv, valid, bits


def detect_and_describe_batch(imgs: jax.Array,
                              cfg: OrbConfig = OrbConfig()) -> OrbFeatures:
    """vmap of :func:`detect_and_describe` over a [B, H, W] frame batch —
    the whole video front-end as one jitted program (SURVEY.md §2.11 DP axis:
    this is the function that shards over the device mesh by frame)."""
    pattern = jnp.asarray(make_pattern(cfg.pattern_seed, cfg.descriptor_bits,
                                       cfg.patch_size))
    return jax.vmap(lambda im: detect_and_describe(im, cfg, pattern))(imgs)
