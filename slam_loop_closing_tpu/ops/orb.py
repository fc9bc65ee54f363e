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


PATCH = 32          # patch side; rotated BRIEF offsets clip to the patch
_PC = PATCH // 2 - 1  # nominal patch center (15) for integer keypoints


def extract_patches(img: jax.Array, xy: jax.Array,
                    patch: int = PATCH) -> tuple[jax.Array, jax.Array]:
    """[K, patch, patch] pixel patches around integer keypoints + [K, 2]
    actual (cx, cy) center offsets (differ from the nominal center only when
    the slice clamps at an image border).

    This is the performance keystone of the ORB front-end: ONE contiguous
    dynamic-slice per keypoint, after which orientation moments become an
    MXU matmul and BRIEF sampling a patch-local gather — versus bilinear
    gathers into the full-resolution image per pattern point, which is
    HBM-gather-bound (~100 ms/frame at 1080p measured on v5e)."""
    h, w = img.shape

    def one(pt):
        xi = pt[0].astype(jnp.int32)
        yi = pt[1].astype(jnp.int32)
        x0 = jnp.clip(xi - _PC, 0, w - patch)
        y0 = jnp.clip(yi - _PC, 0, h - patch)
        p = jax.lax.dynamic_slice(img, (y0, x0), (patch, patch))
        return p, jnp.stack([(pt[0] - x0.astype(pt.dtype)),
                             (pt[1] - y0.astype(pt.dtype))])

    return jax.vmap(one)(xy)


def extract_patches_fast(img: jax.Array, xy: jax.Array) -> jax.Array:
    """[K, 32, 32] patches via the fastest available path: the pipelined-DMA
    Pallas kernel on TPU (~5x the vmapped-dynamic-slice gather, whose
    per-slice DMA latency is exposed serially — ~2.2 us/keypoint on v5e
    regardless of slice shape or dtype), the XLA gather elsewhere.
    Both are value-identical for interior keypoints (border keypoints are
    excluded by the detector's ``border`` margin before this runs)."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    if pallas_kernels.use_pallas():
        return pallas_kernels.extract_patches_pallas(img, xy)
    return extract_patches(img, xy)[0]


def _orientation_moment_weights(patch: int = PATCH,
                                radius: int = PATCH_RADIUS) -> np.ndarray:
    """[patch*patch, 2] weights such that ``patch_flat @ W = (m10, m01)``
    over the circular window centered at the nominal center."""
    offs = np.arange(patch, dtype=np.float32) - _PC
    dy = offs[:, None] * np.ones((1, patch), np.float32)
    dx = np.ones((patch, 1), np.float32) * offs[None, :]
    circ = (dx ** 2 + dy ** 2) <= radius ** 2
    w10 = np.where(circ, dx, 0.0).reshape(-1)
    w01 = np.where(circ, dy, 0.0).reshape(-1)
    return np.stack([w10, w01], axis=1)


@jax.jit
def orientation_from_patches(patches: jax.Array, valid: jax.Array,
                             weights: jax.Array) -> jax.Array:
    """Intensity-centroid angles for all patches at once: the (m10, m01)
    moments are ONE [K, P*P] @ [P*P, 2] MXU matmul."""
    k = patches.shape[0]
    flat = patches.reshape(k, -1)
    m = jax.lax.dot_general(flat, weights,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    ang = jnp.arctan2(m[:, 1], m[:, 0])
    return jnp.where(valid, ang, 0.0)


@jax.jit
def brief_from_patches(patches: jax.Array, centers: jax.Array,
                       angle: jax.Array, valid: jax.Array,
                       pattern: jax.Array) -> jax.Array:
    """Rotated-BRIEF bits sampled INSIDE the per-keypoint patches:
    [K, 256] uint8. Bilinear interpolation via 4 patch-local
    take_along_axis gathers (each row touches one 9 KB patch — cache-local,
    unlike image-wide gathers)."""
    k, p, _ = patches.shape
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.stack([jnp.stack([c, -s], -1),
                     jnp.stack([s, c], -1)], -2)          # [K, 2, 2]
    rotated = jnp.einsum("kab,pqb->kpqa", rot, pattern)   # [K, 256, 2, 2]
    pos = rotated + centers[:, None, None, :]             # patch coords
    x = jnp.clip(pos[..., 0], 0.0, p - 1.001)
    y = jnp.clip(pos[..., 1], 0.0, p - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    flat = patches.reshape(k, p * p)
    base = (yi * p + xi).reshape(k, -1)                   # [K, 512]

    def take(off):
        return jnp.take_along_axis(flat, base + off, axis=1).reshape(
            k, -1, 2)

    v00 = take(0)
    v01 = take(1)
    v10 = take(p)
    v11 = take(p + 1)
    fx = fx.reshape(k, -1, 2)
    fy = fy.reshape(k, -1, 2)
    samples = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
               + fy * ((1 - fx) * v10 + fx * v11))        # [K, 256, 2]
    bits = (samples[..., 0] < samples[..., 1]).astype(jnp.uint8)
    return jnp.where(valid[:, None], bits, jnp.uint8(0))


def make_brief_bin_matrices(pattern: np.ndarray, num_bins: int = 30,
                            patch: int = PATCH) -> np.ndarray:
    """[num_bins, patch*patch, 512] one-hot sampling matrices: bin b's matrix
    maps a flattened patch to the 512 nearest-pixel samples of the pattern
    rotated by ``2*pi*b/num_bins``. Column layout: [0:256] = point A of each
    pair, [256:512] = point B.

    This is the OpenCV-ORB discretization (rotation quantized to 12-degree
    steps, nearest-pixel lookup) recast for the MXU: descriptor sampling
    becomes ``patch @ G[bin]`` instead of per-point gathers — measured ~20x
    faster at 1080p on v5e (gathers are the TPU's weak spot; matmuls are
    its strength). Rotated positions that leave the 32-px patch clip to its
    edge (~2% of the Gaussian pattern mass; keeps the gather-heaviest
    buffer — the patches — at 1 KB each)."""
    out = np.zeros((num_bins, patch * patch, 512), np.float32)
    for b in range(num_bins):
        th = 2.0 * np.pi * b / num_bins
        c, s = np.cos(th), np.sin(th)
        rot = np.array([[c, -s], [s, c]], np.float32)
        pts = pattern @ rot.T          # [256, 2, 2] offsets rotated
        pos = pts + _PC                # patch coords, center at (_PC, _PC)
        xi = np.clip(np.round(pos[..., 0]).astype(int), 0, patch - 1)
        yi = np.clip(np.round(pos[..., 1]).astype(int), 0, patch - 1)
        flat_idx = yi * patch + xi     # [256, 2]
        cols = np.arange(256)
        out[b, flat_idx[:, 0], cols] = 1.0
        out[b, flat_idx[:, 1], cols + 256] = 1.0
    return out


@jax.jit
def brief_from_patches_binned(patches: jax.Array, angle: jax.Array,
                              valid: jax.Array, D: jax.Array) -> jax.Array:
    """Rotated-BRIEF bits via quantized rotation + difference matmuls:
    [K, 256] uint8. For each orientation bin, the keypoints in that bin are
    run through a [K, P*P] @ [P*P, 256] MXU matmul against the bin's
    DIFFERENCE matrix (+1 at each pair's point B, -1 at point A — see
    :func:`brief_matrices`), producing one [K, 256] table of
    ``sample_B - sample_A``; ``bit = diff > 0``. Half the FLOPs of sampling
    A and B separately, and provably the same bits: the ±1 columns are
    exact in bf16 and each dot is the f32 difference of the two
    bf16-rounded pixels, whose sign equals the direct comparison's.
    No gathers anywhere.

    The per-bin GEMMs run UNMASKED and the bin mask selects among the
    [K, 256] OUTPUTS (``where(bins == b, dot, diff)``): masking the
    [K, 1024] INPUT instead materializes 30 masked copies of the patch
    block — 4x the per-bin mask traffic — and measured 1.8x slower at the
    1080p headline shape (benchmarks/exp_frontend_xla.py). Bitwise the
    same bits either way."""
    k = patches.shape[0]
    num_bins = D.shape[0]
    flat = patches.reshape(k, -1).astype(jnp.bfloat16)
    step = 2.0 * jnp.pi / num_bins
    bins = jnp.mod(jnp.round(angle / step).astype(jnp.int32), num_bins)
    diff = jnp.zeros((k, 256), jnp.float32)
    for b in range(num_bins):
        dot = jax.lax.dot_general(
            flat, D[b].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        diff = jnp.where((bins == b)[:, None], dot, diff)
    bits = (diff > 0.0).astype(jnp.uint8)
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


_G_CACHE: dict = {}


def brief_matrices(cfg: OrbConfig) -> jax.Array:
    """Cached [bins, P*P, 256] DIFFERENCE matrices for a config: bin b's
    matrix has +1 at pair j's point-B pixel and -1 at its point-A pixel
    (columns where both land on the same pixel are zero — bit 0, exactly
    the ``A < B`` strict comparison's tie behavior)."""
    key = (cfg.pattern_seed, cfg.descriptor_bits, cfg.patch_size,
           cfg.brief_bins)
    if key not in _G_CACHE:
        pat = make_pattern(cfg.pattern_seed, cfg.descriptor_bits,
                           cfg.patch_size)
        # ensure_compile_time_eval: this may be reached while tracing an
        # outer jit (e.g. a caller jits a whole pipeline around
        # detect_and_describe_batch); without it the cache would capture
        # that trace's tracer and poison every later call.
        with jax.ensure_compile_time_eval():
            g = make_brief_bin_matrices(pat, cfg.brief_bins)
            _G_CACHE[key] = jnp.asarray(g[..., 256:] - g[..., :256])
    return _G_CACHE[key]


def detect_and_describe(img: jax.Array, cfg: OrbConfig = OrbConfig(),
                        pattern: jax.Array | None = None) -> OrbFeatures:
    """Full ORB on one grayscale [H, W] float32 frame -> fixed-size features.

    Pyramid levels are separate static shapes (each jit-compiles once);
    keypoint coordinates are mapped back to level-0 pixels. Total keypoint
    capacity is exactly ``cfg.num_features``. ``pattern`` here is the
    prebuilt bin-matrix stack (see :func:`brief_matrices`); None = cached
    default for the config.
    """
    if pattern is None:
        pattern = brief_matrices(cfg)
    levels = image_ops.pyramid(img, cfg.num_levels, cfg.scale_factor)
    budgets = _level_budgets(cfg.num_features, cfg.num_levels,
                             cfg.scale_factor)

    parts = []
    for lvl, (level_img, budget) in enumerate(zip(levels, budgets)):
        if budget <= 0:
            continue
        parts.append(_detect_level(level_img, lvl, budget, cfg))

    cat = lambda *xs: jnp.concatenate(xs, axis=0)
    xy, resp, octv, val, patches = jax.tree.map(cat, *parts)
    # Orientation + BRIEF run ONCE over the concatenated all-level patch
    # set: identical values to per-level runs (both are row-independent),
    # but the 30 bin GEMMs execute once at [num_features, 1024] instead of
    # num_levels times at small-K shapes — fewer, better-shaped MXU calls.
    mw = jnp.asarray(_orientation_moment_weights())
    ang = orientation_from_patches(patches, val, mw)
    bits = brief_from_patches_binned(patches, ang, val, pattern)
    packed = desc_ops.bits_to_packed(bits)
    # Invalid rows are all-zero in the signed layout so padded descriptors
    # contribute dot = 0 in the Hamming matmul (matching.py's contract).
    signed = jnp.where(val[:, None], desc_ops.bits_to_signed(bits),
                       jnp.int8(0))
    kps = Keypoints(xy=xy, response=resp, angle=ang, octave=octv, valid=val)
    return OrbFeatures(keypoints=kps, descriptors=packed, signed=signed)


@functools.partial(jax.jit, static_argnames=("level", "budget", "cfg"))
def _detect_level(level_img: jax.Array, level: int, budget: int,
                  cfg: OrbConfig):
    """Per-level detection + patch extraction: (xy level0, response,
    octave, valid, patches). Orientation and BRIEF run later on the
    concatenated all-level patch set (see :func:`detect_and_describe`)."""
    thr = cfg.fast_threshold / 255.0
    # ONE patch extraction from the blurred level serves both the
    # orientation moments and the binned-rotation BRIEF matmuls (the
    # intensity centroid on the blurred image differs negligibly from raw).
    # Blur matches cv::ORB's descriptor prefilter exactly: GaussianBlur
    # 7x7, sigma 2 (radius 3, not the default 3*sigma truncation); on TPU
    # it is fused into the FAST score+NMS Pallas pass (one band DMA serves
    # both), elsewhere it runs as a separate XLA blur.
    xy, resp, valid, blurred = fast_ops.detect_with_blur(
        level_img, threshold=thr, num_features=budget,
        nms_radius=cfg.nms_radius, border=cfg.border,
        grid_cell=cfg.grid_cell, blur_sigma=2.0, blur_radius=3)
    patches = extract_patches_fast(blurred, xy)
    scale = cfg.scale_factor ** level
    xy0 = xy * scale
    octv = jnp.full(xy.shape[:1], level, jnp.int32)
    return xy0, resp, octv, valid, patches


@functools.partial(jax.jit, static_argnames=("cfg",))
def _detect_batch(imgs: jax.Array, pattern: jax.Array,
                  cfg: OrbConfig) -> OrbFeatures:
    return jax.vmap(lambda im: detect_and_describe(im, cfg, pattern))(imgs)


def detect_and_describe_batch(imgs: jax.Array,
                              cfg: OrbConfig = OrbConfig()) -> OrbFeatures:
    """vmap of :func:`detect_and_describe` over a [B, H, W] frame batch —
    the whole video front-end as one jitted program (SURVEY.md §2.11 DP axis:
    this is the function that shards over the device mesh by frame). The jit
    lives at module level so repeat calls at one shape reuse the cache
    instead of re-tracing."""
    return _detect_batch(imgs, brief_matrices(cfg), cfg)
