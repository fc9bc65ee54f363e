"""FAST-9/16 corner detection as dense, fixed-shape array ops.

TPU-native replacement for the corner stage of ``cv::ORB`` (declared at
reference loop_closing.hpp:72; README.md:112-115). A CPU FAST implementation
walks pixels and early-exits per pixel; that shape of code cannot use a
vector unit. Here the whole frame is processed as 16 shifted copies of the
image (one per Bresenham-circle offset), giving dense [H, W] score maps that
XLA fuses into a handful of VPU passes — every pixel is tested in parallel,
and the same code runs under vmap over a batch of frames.

Pipeline: :func:`fast_score_map` -> :func:`nms` (3x3) -> :func:`select_topk`
(fixed keypoint budget with validity mask, README.md:114's "2000 max
features").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 — the 16 FAST offsets (dy, dx), clockwise
# from 12 o'clock.
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC = 9  # FAST-9: need 9 contiguous circle pixels all brighter/darker


def _shifted_ring(img: jax.Array) -> jax.Array:
    """[16, H, W]: the image translated by each circle offset, so that
    ``ring[k, y, x] = img[y + dy_k, x + dx_k]`` (zero-padded borders; callers
    mask the border region anyway)."""
    h, w = img.shape
    pad = 3
    p = jnp.pad(img, pad)
    return jnp.stack([
        jax.lax.dynamic_slice(p, (pad + dy, pad + dx), (h, w))
        for dy, dx in CIRCLE
    ])


@functools.partial(jax.jit, static_argnames=("threshold",))
def fast_score_map(img: jax.Array, threshold: float = 20.0 / 255.0) -> jax.Array:
    """Dense FAST-9 corner score, [H, W] float32 (0 = not a corner).

    A pixel is a corner if >= 9 *contiguous* circle pixels are all brighter
    than ``center + t`` or all darker than ``center - t``. The contiguity
    test runs as a min-filter over a length-9 circular window of the 16
    bright/dark margins: ``max_k min_{i in window(k)} margin_i > 0``. That
    max-min value is also the corner score — the largest threshold at which
    the pixel remains a corner (the same "strength" semantics OpenCV uses),
    so NMS can rank directly on it.
    """
    ring = _shifted_ring(img)                      # [16, H, W]
    bright = ring - img[None] - threshold          # margin above center + t
    dark = img[None] - ring - threshold            # margin below center - t

    def arc_strength(margin):
        # circular windows: stack margin twice, take min over each 9-window
        m2 = jnp.concatenate([margin, margin[:ARC - 1]], axis=0)  # [24, H, W]
        windows = jnp.stack([
            jnp.min(jax.lax.dynamic_slice_in_dim(m2, k, ARC, axis=0), axis=0)
            for k in range(16)
        ])                                          # [16, H, W]
        return jnp.max(windows, axis=0)

    score = jnp.maximum(arc_strength(bright), arc_strength(dark))
    score = jnp.maximum(score, 0.0)
    # Zero the 3-pixel border (ring reads zero-padding there).
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(interior, score, 0.0)


@functools.partial(jax.jit, static_argnames=("radius",))
def nms(score: jax.Array, radius: int = 1) -> jax.Array:
    """Non-maximum suppression: keep score only where it equals the local
    max over a (2r+1)^2 window (reduce_window max — one fused XLA op)."""
    k = 2 * radius + 1
    local_max = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")
    return jnp.where(score >= local_max, score, 0.0)


@functools.partial(jax.jit, static_argnames=("num_features", "border"))
def select_topk(score: jax.Array, num_features: int, border: int = 19):
    """Top-K corner selection into fixed-size arrays.

    Returns (xy [K, 2] float32 pixel coords, response [K], valid [K] bool).
    Padded slots have valid=False. ``border`` excludes keypoints whose
    descriptor patch would leave the image (reference ORB does the same via
    its edgeThreshold).
    """
    h, w = score.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ok = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    masked = jnp.where(ok, score, 0.0)
    flat = masked.ravel()
    resp, idx = jax.lax.top_k(flat, num_features)
    y = (idx // w).astype(jnp.float32)
    x = (idx % w).astype(jnp.float32)
    valid = resp > 0.0
    xy = jnp.stack([x, y], axis=-1)
    return xy, resp, valid


@functools.partial(jax.jit, static_argnames=("num_features", "border",
                                             "bands"))
def select_topk_banded(score: jax.Array, num_features: int, border: int = 19,
                       bands: int = 16):
    """Top-K selection via horizontal bands: each band contributes its local
    top-(K/bands + slack), then one small top-K merges the candidates.

    A flat top-K over the whole 2M-pixel score map costs ~4 ms/frame on
    v5e; banded selection runs the big reduction over rows in parallel.
    Band caps also spread keypoints spatially (the grid adaptation OpenCV's
    ORB applies on purpose). Returns (xy, response, valid) like
    :func:`select_topk`."""
    h, w = score.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ok = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    masked = jnp.where(ok, score, 0.0)
    pad_h = (-h) % bands
    if pad_h:
        masked = jnp.pad(masked, ((0, pad_h), (0, 0)))
    bh = (h + pad_h) // bands
    per_band = -(-num_features // bands) + 32  # slack for uneven density
    flat_b = masked.reshape(bands, bh * w)
    resp_b, idx_b = jax.lax.top_k(flat_b, per_band)      # [bands, per_band]
    band_base = (jnp.arange(bands) * bh * w)[:, None]
    gidx = (idx_b + band_base).reshape(-1)
    resp_all = resp_b.reshape(-1)
    resp, sel = jax.lax.top_k(resp_all, num_features)    # small merge
    idx = gidx[sel]
    y = (idx // w).astype(jnp.float32)
    x = (idx % w).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1), resp, resp > 0.0


@functools.partial(jax.jit, static_argnames=("num_features", "border",
                                             "cell"))
def select_topk_grid(score: jax.Array, num_features: int, border: int = 19,
                     cell: int = 8):
    """Top-K with at most one keypoint per ``cell x cell`` grid cell: the
    per-cell argmax shrinks the top-K input by cell^2 (a flat top-K over the
    2M-pixel score map costs ~4 ms/frame on v5e; this runs the heavy
    reduction as cheap reshaped maxes). One-per-cell is the same grid
    adaptation OpenCV's ORB applies to spread keypoints spatially.
    Returns (xy, response, valid) like :func:`select_topk`.

    The per-cell argmax is ONE max-reduction pass: each positive score's
    int32 bit pattern (monotonic in the float for non-negative values) has
    its low position bits replaced by the INVERTED in-cell pixel index, so
    the cell max carries its own argmax — lowest flat index on ties,
    identical to an explicit iota-min — and the reduction decomposes into
    two reshaped maxes with NO [hb, cell, wb, cell] transpose (the
    relayout dominated this stage's cost at 1080p). Responses are re-read
    exactly from the score map afterwards (one tiny [K] gather), so the
    low-bit truncation only affects ranking between scores within
    2^-(23-posbits) relative — far below detector noise."""
    h, w = score.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ok = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    masked = jnp.where(ok, score, 0.0)
    ph, pw = (-h) % cell, (-w) % cell
    if ph or pw:
        masked = jnp.pad(masked, ((0, ph), (0, pw)))
    hp, wp = h + ph, w + pw
    hb, wb = hp // cell, wp // cell

    posbits = max(1, (cell * cell - 1).bit_length())
    posmask = (1 << posbits) - 1
    invpos = ((cell * cell - 1)
              - (jnp.arange(hp, dtype=jnp.int32)[:, None] % cell) * cell
              - (jnp.arange(wp, dtype=jnp.int32)[None, :] % cell))
    bits = jax.lax.bitcast_convert_type(masked, jnp.int32)
    packed = jnp.where(masked > 0.0, (bits & ~posmask) | invpos, 0)
    rowmax = jnp.max(packed.reshape(hb, cell, wp), axis=1)       # [hb, wp]
    cmax = jnp.max(rowmax.reshape(hb, wb, cell), axis=2).ravel()  # [hb*wb]

    pk, sel = jax.lax.top_k(cmax, num_features)      # small top-K
    valid = pk > 0
    pos = (cell * cell - 1) - (pk & posmask)
    cy = sel // wb
    cx = sel % wb
    y = cy * cell + pos // cell
    x = cx * cell + pos % cell
    # exact responses: one [K] gather from the map (y, x are in-bounds of
    # the unpadded score for every valid row; invalid rows clamp to 0,0)
    yc = jnp.where(valid, y, 0)
    xc = jnp.where(valid, x, 0)
    resp = jnp.where(valid, score[yc, xc], 0.0)
    return (jnp.stack([x.astype(jnp.float32), y.astype(jnp.float32)],
                      axis=-1), resp, valid)


@functools.partial(jax.jit, static_argnames=("threshold", "num_features",
                                             "nms_radius", "border",
                                             "grid_cell"))
def detect(img: jax.Array, threshold: float = 20.0 / 255.0,
           num_features: int = 2000, nms_radius: int = 1, border: int = 19,
           grid_cell: int = 0):
    """Full FAST detection: score -> NMS -> fixed-budget top-K. On TPU the
    score+NMS stage runs as the fused row-tiled Pallas kernel (3x3 NMS
    only). ``grid_cell > 0`` switches to grid-adapted selection (at most one
    keypoint per cell — spreads features and runs ~1.6x faster at 1080p;
    changes which keypoints are picked, so it is opt-in)."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    if nms_radius == 1 and pallas_kernels.use_pallas():
        suppressed = pallas_kernels.fast_score_nms(img, threshold)
    else:
        suppressed = nms(fast_score_map(img, threshold), nms_radius)
    if grid_cell > 0:
        return select_topk_grid(suppressed, num_features, border, grid_cell)
    # (select_topk_banded measured slower than the flat top-k on v5e —
    # TPU top_k cost scales with n, not k — so the flat path stays default.)
    return select_topk(suppressed, num_features, border)


@functools.partial(jax.jit, static_argnames=("threshold", "num_features",
                                             "nms_radius", "border",
                                             "grid_cell", "blur_sigma",
                                             "blur_radius"))
def detect_with_blur(img: jax.Array, threshold: float = 20.0 / 255.0,
                     num_features: int = 2000, nms_radius: int = 1,
                     border: int = 19, grid_cell: int = 0,
                     blur_sigma: float = 2.0, blur_radius: int = 3):
    """:func:`detect` that also returns the descriptor-prefilter Gaussian
    blur of ``img``: (xy, response, valid, blurred). On TPU the blur is
    fused into the FAST score+NMS Pallas pass (the band is already VMEM-
    resident — a separate full-image blur dispatch disappears from the ORB
    front-end); elsewhere it falls back to detect + image.gaussian_blur.
    Blur values differ from the XLA path only within ``blur_radius`` px of
    the image border (zero vs reflect padding), which descriptor patches
    never read (``border`` >= 19)."""
    from slam_loop_closing_tpu.ops import image as image_ops
    from slam_loop_closing_tpu.ops import pallas_kernels

    if nms_radius == 1 and pallas_kernels.use_pallas():
        suppressed, blurred = pallas_kernels.fast_score_nms_blur(
            img, threshold, blur_sigma, blur_radius)
    else:
        suppressed = nms(fast_score_map(img, threshold), nms_radius)
        blurred = image_ops.gaussian_blur(img, blur_sigma, blur_radius)
    if grid_cell > 0:
        sel = select_topk_grid(suppressed, num_features, border, grid_cell)
    else:
        sel = select_topk(suppressed, num_features, border)
    return sel + (blurred,)
