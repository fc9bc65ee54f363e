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


def _chain_sigmas(num_scales: int, sigma0: float) -> tuple[float, ...]:
    """Incremental blur sigmas for one octave's Gaussian chain (static
    Python floats: blur kernel sizes must be compile-time constants)."""
    import math

    k = 2.0 ** (1.0 / num_scales)
    out = [sigma0]
    sig_prev = sigma0
    for s in range(1, num_scales + 3):
        sig_total = sigma0 * (k ** s)
        out.append(math.sqrt(max(sig_total ** 2 - sig_prev ** 2, 1e-6)))
        sig_prev = sig_total
    return tuple(out)


def _gaussian_stack(img: jax.Array, num_scales: int, sigma0: float):
    """One octave's Gaussian stack [S+3, H, W] with geometric sigma steps.

    On TPU the whole chain runs as one fused Pallas pass
    (:func:`..pallas_kernels.gauss_stack_pallas` — intermediate levels never
    round-trip HBM); elsewhere, chained separable XLA blurs."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    sig = _chain_sigmas(num_scales, sigma0)
    if (pallas_kernels.use_pallas()
            and min(img.shape) > pallas_kernels.gauss_stack_halo(sig)):
        return pallas_kernels.gauss_stack_pallas(img, sig)
    levels = [image_ops.gaussian_blur(img, sig[0])]
    for s_extra in sig[1:]:
        levels.append(image_ops.gaussian_blur(levels[-1], s_extra))
    return jnp.stack(levels)


_BORDER = 8  # detector border frame (keypoints this close to an edge are
             # dropped; cv::SIFT uses SIFT_IMG_BORDER=5 — 8 keeps the gate
             # stencils interior and is well under the descriptor's margin)


def _extrema_response(dog: jax.Array) -> jax.Array:
    """[S+2, H, W] -> response map where a pixel is a 26-neighborhood
    extremum of the DoG stack (interior scales only), else 0.

    The 26-neighbor extreme (center excluded) is built from SEPARABLE
    shifted-slice passes — 8 elementwise reductions instead of 26 shifted
    reads per comparator. max/min are exact, so this is bitwise identical
    to comparing against each neighbor individually. Interior-only scale
    planes are assembled by concatenation (an ``.at[0].set`` on the stack
    would copy all of it)."""

    def nb(x, fill):
        op = jnp.maximum if fill == -jnp.inf else jnp.minimum
        px = jnp.pad(x, ((0, 0), (0, 0), (1, 1)), constant_values=fill)
        row3 = op(op(px[:, :, :-2], px[:, :, 1:-1]), px[:, :, 2:])
        py = jnp.pad(row3, ((0, 0), (1, 1), (0, 0)), constant_values=fill)
        full9 = op(op(py[:, :-2, :], py[:, 1:-1, :]), py[:, 2:, :])
        # center plane, center pixel excluded: the two neighbor rows' 3-tap
        # maxes plus the center row's left/right pixels
        excl = op(op(py[:, :-2, :], py[:, 2:, :]),
                  op(px[:, :, :-2], px[:, :, 2:]))
        # interior scales only: planes s-1 / s+1 contribute their full 3x3
        return op(op(full9[:-2], full9[2:]), excl[1:-1])

    inner = dog[1:-1]
    is_max = inner > nb(dog, -jnp.inf)
    is_min = inner < nb(dog, jnp.inf)
    resp_in = jnp.where(is_max | is_min, jnp.abs(inner), 0.0)
    zero = jnp.zeros_like(dog[:1])
    return jnp.concatenate([zero, resp_in, zero])


def _edge_mask(dog_levels: jax.Array, edge_threshold: float) -> jax.Array:
    """Reject edge responses: principal-curvature ratio test on the 2x2
    spatial Hessian (tr^2/det < (r+1)^2/r). Operates on the whole
    [L, H, W] interior-level stack in one pass (per-axis ``jnp.gradient``
    never mixes the level axis, so values match the per-level form
    bitwise)."""
    gy = jnp.gradient(dog_levels, axis=1)
    gx = jnp.gradient(dog_levels, axis=2)
    gyy = jnp.gradient(gy, axis=1)
    gxy = jnp.gradient(gx, axis=1)
    gxx = jnp.gradient(gx, axis=2)
    tr = gxx + gyy
    det = gxx * gyy - gxy * gxy
    r = edge_threshold
    ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    return ok


def _gated_response(img: jax.Array, cfg: SiftConfig):
    """One octave's ``(gauss [S+3, H, W], resp [S, H, W])`` where resp plane
    ``j`` is the gated |DoG| extremum response of interior DoG plane
    ``j + 1`` (26-neighbor extremum AND contrast AND edge AND border gates
    applied; everything else 0). On TPU the whole thing is ONE fused Pallas
    pass (:func:`..pallas_kernels.gauss_stack_resp_pallas`) — the gates ride
    the VMEM-resident blur chain instead of re-streaming the DoG stack
    through HBM; elsewhere the vectorized XLA pipeline below. Interior
    responses are bitwise-identical between the two (tested)."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    s = cfg.scales_per_octave
    sig = _chain_sigmas(s, cfg.sigma0)
    thr = cfg.contrast_threshold / s
    if (pallas_kernels.use_pallas()
            and min(img.shape) > pallas_kernels.gauss_resp_halo(sig)):
        return pallas_kernels.gauss_stack_resp_pallas(
            img, sig, s, thr, cfg.edge_threshold, border=_BORDER)
    gauss = _gaussian_stack(img, s, cfg.sigma0)           # [S+3, H, W]
    dog = gauss[1:] - gauss[:-1]                          # [S+2, H, W]
    resp = _extrema_response(dog)
    # contrast gate (cv uses contrast_threshold/scales at the candidate)
    resp = jnp.where(jnp.abs(dog) >= thr, resp, 0.0)
    # edge gate, all interior levels in one pass (an ``.at[lvl].set`` loop
    # would copy the whole stack once per level)
    ok = _edge_mask(dog[1:s + 1], cfg.edge_threshold)
    resp_in = jnp.where(ok, resp[1:s + 1], 0.0)           # [S, H, W]
    h, w = img.shape
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    interior = ((ys[:, None] >= _BORDER) & (ys[:, None] < h - _BORDER)
                & (xs[None, :] >= _BORDER) & (xs[None, :] < w - _BORDER))
    return gauss, jnp.where(interior[None], resp_in, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg", "budget", "octave"))
def _detect_octave(img: jax.Array, octave: int, budget: int,
                   cfg: SiftConfig):
    """Detect top-``budget`` DoG keypoints in one octave. Returns fixed-size
    (xy level0, sigma, response, valid, grad_mag, grad_ang, xy_octave)."""
    s = cfg.scales_per_octave
    # resp holds INTERIOR DoG planes only (plane j <-> DoG plane j+1); the
    # first/last planes can never host an extremum and are never emitted
    gauss, resp = _gated_response(img, cfg)
    h, w = img.shape

    if cfg.grid_cell > 0:
        # One keypoint per spatial cell, max over scale: the top-K input
        # shrinks S*cell^2-fold (a flat top-K over the 10M-element
        # 1080p DoG stack costs ~ms; TPU top_k scales with n), and
        # multi-scale duplicates of the same blob collapse to one.
        cell = cfg.grid_cell
        L = resp.shape[0]
        ph, pw = (-h) % cell, (-w) % cell
        rp = jnp.pad(resp, ((0, 0), (0, ph), (0, pw)))
        hb, wb = (h + ph) // cell, (w + pw) // cell
        cells = rp.reshape(L, hb, cell, wb, cell).transpose(1, 3, 0, 2, 4)
        cells = cells.reshape(hb * wb, L * cell * cell)
        cmax = jnp.max(cells, axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 1)
        carg = jnp.min(jnp.where(cells == cmax[:, None], iota,
                                 L * cell * cell), axis=1)
        vals, sel = jax.lax.top_k(cmax, budget)
        flat_in = carg[sel]
        lvl = flat_in // (cell * cell) + 1   # resp plane j <-> DoG plane j+1
        rem = flat_in % (cell * cell)
        cy = sel // wb
        cx = sel % wb
        y = (cy * cell + rem // cell).astype(jnp.float32)
        x = (cx * cell + rem % cell).astype(jnp.float32)
    else:
        flat = resp.reshape(-1)
        if flat.shape[0] >= (1 << 20):
            # exact top_k sorts the whole stack (a 1080p octave is ~10M
            # elements — tens of ms); approx_max_k's TPU bin-reduction is
            # ~10x faster, and a 0.95-recall selection among near-threshold
            # DoG responses is well inside the detector's quality-parity
            # contract (the misses are the weakest responses)
            vals, idx = jax.lax.approx_max_k(flat, budget,
                                             recall_target=0.95)
        else:
            vals, idx = jax.lax.top_k(flat, budget)
        lvl = idx // (h * w) + 1             # resp plane j <-> DoG plane j+1
        rem = idx % (h * w)
        y = (rem // w).astype(jnp.float32)
        x = (rem % w).astype(jnp.float32)
    valid = vals > 0.0

    # Subpixel refinement: 3D quadratic fit of the DoG about the extremum
    # (the cv::SIFT adjustLocalExtrema step). Integer-pixel keypoints carry
    # +-0.5 px of correspondence noise, which at OpenCV's 1.0 px RANSAC
    # threshold costs a large fraction of true inliers; the quadratic
    # offset recovers ~subpixel localization. Offsets are clamped to
    # +-0.5 (cv iterates and re-centers; one clamped step captures most of
    # the correction with static shapes).
    lc = jnp.clip(lvl, 1, s)
    yi = jnp.clip(y.astype(jnp.int32), 1, h - 2)
    xi = jnp.clip(x.astype(jnp.int32), 1, w - 2)

    # One advanced-indexing gather for all K 3x3x3 DoG neighborhoods: a
    # vmapped dynamic_slice lowers to one serialized DMA per keypoint
    # (~2.2 us exposed latency each — 4.6 ms/frame at SIFT-4000/1080p),
    # while a single XLA gather runs in ~1.4 ms. The DoG stack itself is
    # never materialized: the gather fetches the 4 surrounding GAUSSIAN
    # planes ([K, 4, 3, 3]) and differences them — identical values
    # (dog[p] = gauss[p+1] - gauss[p]) for one fewer [S+2, H, W] HBM
    # round-trip.
    d3 = jnp.arange(-1, 2)
    d4 = jnp.arange(-1, 3)
    g4 = gauss[lc[:, None, None, None] + d4[:, None, None],
               yi[:, None, None, None] + d3[None, :, None],
               xi[:, None, None, None] + d3[None, None, :]]  # [K, 4, 3, 3]
    c = g4[:, 1:] - g4[:, :-1]                               # [K, 3, 3, 3]
    gx = 0.5 * (c[:, 1, 1, 2] - c[:, 1, 1, 0])
    gy = 0.5 * (c[:, 1, 2, 1] - c[:, 1, 0, 1])
    gs = 0.5 * (c[:, 2, 1, 1] - c[:, 0, 1, 1])
    dxx = c[:, 1, 1, 2] - 2 * c[:, 1, 1, 1] + c[:, 1, 1, 0]
    dyy = c[:, 1, 2, 1] - 2 * c[:, 1, 1, 1] + c[:, 1, 0, 1]
    dss = c[:, 2, 1, 1] - 2 * c[:, 1, 1, 1] + c[:, 0, 1, 1]
    dxy = 0.25 * (c[:, 1, 2, 2] - c[:, 1, 2, 0]
                  - c[:, 1, 0, 2] + c[:, 1, 0, 0])
    dxs = 0.25 * (c[:, 2, 1, 2] - c[:, 2, 1, 0]
                  - c[:, 0, 1, 2] + c[:, 0, 1, 0])
    dys = 0.25 * (c[:, 2, 2, 1] - c[:, 2, 0, 1]
                  - c[:, 0, 2, 1] + c[:, 0, 0, 1])
    hm = (jnp.stack([jnp.stack([dxx, dxy, dxs], -1),
                     jnp.stack([dxy, dyy, dys], -1),
                     jnp.stack([dxs, dys, dss], -1)], -2)
          + 1e-8 * jnp.eye(3))                             # [K, 3, 3]
    gvec = jnp.stack([gx, gy, gs], -1)                     # [K, 3]
    offs = -jnp.linalg.solve(hm, gvec[..., None])[..., 0]
    offs = jnp.where(jnp.isfinite(offs), offs, 0.0)
    offs = jnp.clip(offs, -0.5, 0.5)                       # [K, 3] dx,dy,ds
    x = x + jnp.where(valid, offs[:, 0], 0.0)
    y = y + jnp.where(valid, offs[:, 1], 0.0)
    k = 2.0 ** (1.0 / s)
    sigma = (cfg.sigma0
             * (k ** (lvl.astype(jnp.float32)
                      + jnp.where(valid, offs[:, 2], 0.0)))
             * (2.0 ** octave))
    xy0 = jnp.stack([x, y], -1) * (2.0 ** octave)
    # gradient maps of the middle Gaussian level (descriptor source)
    g = gauss[s // 2 + 1]
    gy, gx = jnp.gradient(g)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ang = jnp.arctan2(gy, gx)
    return xy0, sigma, vals, valid, mag, ang, jnp.stack([x, y], -1)


import math as _math

PATCH = 40
# Descriptor support: the |u|,|v| < 10 grid-unit window spans a rotated
# square of half-width 10*scale px — circumscribed radius
# 10*scale*sqrt(2). The patch center sits at (19, 19), so full coverage
# needs scale <= 19 / (10*sqrt(2)) ~ 1.34; the raw 0.5*sigma scale reaches
# ~1.8 at the largest in-octave sigma (subpixel ds included). The effective
# descriptor scale is therefore CAPPED at _SCALE_CAP below: with the cap,
# patch-local sampling is value-identical to image-wide sampling
# (image-border clamping included); without it the rotated corners of the
# largest-sigma keypoints would be silently truncated (direction-dependent
# descriptor bias). The cap shrinks the spatial window symmetrically for
# those keypoints instead — consistent across images, so matching is
# unaffected in a way truncation is not.
_SCALE_CAP = (PATCH // 2 - 1) / (10.0 * _math.sqrt(2.0))


def _extract_grad_patches(mag: jax.Array, ang: jax.Array, xy: jax.Array,
                          patch: int = PATCH):
    """One contiguous [patch, patch] window per keypoint from the magnitude
    AND angle maps + the keypoint's position inside its patch. Same
    keystone as orb.extract_patches: after this, every descriptor quantity
    is patch-local instead of an image-wide gather (gathers are the
    dominant SIFT cost at 1080p). On TPU the windows come from the
    pipelined-DMA Pallas gather (pallas_kernels.extract_patches_pallas —
    vmapped dynamic_slice exposes ~2.2 us of DMA latency per slice, ~9 ms
    per 1080p frame at SIFT-4000; the ring kernel hides it); elsewhere a
    vmapped dynamic-slice. Both paths are value-identical (same clipped
    integer window origins)."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    h, w = mag.shape
    pc = patch // 2 - 1

    if pallas_kernels.use_pallas():
        pm = pallas_kernels.extract_patches_pallas(mag, xy, patch=patch,
                                                   center=pc)
        pa = pallas_kernels.extract_patches_pallas(ang, xy, patch=patch,
                                                   center=pc)
        x0 = jnp.clip(xy[:, 0].astype(jnp.int32), pc, w - patch + pc) - pc
        y0 = jnp.clip(xy[:, 1].astype(jnp.int32), pc, h - patch + pc) - pc
        ctr = jnp.stack([xy[:, 0] - x0.astype(xy.dtype),
                         xy[:, 1] - y0.astype(xy.dtype)], axis=-1)
        return pm, pa, ctr

    def one(pt):
        xi = pt[0].astype(jnp.int32)
        yi = pt[1].astype(jnp.int32)
        x0 = jnp.clip(xi - pc, 0, w - patch)
        y0 = jnp.clip(yi - pc, 0, h - patch)
        pm = jax.lax.dynamic_slice(mag, (y0, x0), (patch, patch))
        pa = jax.lax.dynamic_slice(ang, (y0, x0), (patch, patch))
        ctr = jnp.stack([pt[0] - x0.astype(pt.dtype),
                         pt[1] - y0.astype(pt.dtype)])
        return pm, pa, ctr

    return jax.vmap(one)(xy)


def _orientation_and_descriptor(mag: jax.Array, ang: jax.Array,
                                xy: jax.Array, sigma_oct: jax.Array,
                                valid: jax.Array):
    """Dominant orientation + 4x4x8 descriptor for each keypoint — the
    classic PER-PIXEL formulation (Lowe's original recipe, and what cv::SIFT
    computes): iterate over the keypoint's patch pixels (STATIC positions),
    rotate each pixel's offset into the descriptor frame arithmetically,
    and soft-assign its gradient into the histograms. Zero gathers — every
    quantity is an elementwise [K, P*P] array and the histograms are small
    masked-reduction loops. The previous grid-sampling formulation needed
    ~10M data-dependent gathers per frame (take_along_axis or vmapped
    bilinear, both ~4 ns/element on TPU) and dominated the whole SIFT
    front-end at 1080p (~190 of 280 ms/frame)."""
    pm, pa, ctrs = _extract_grad_patches(mag, ang, xy)
    k = pm.shape[0]
    p = pm.shape[1]
    pmf = pm.reshape(k, p * p)
    paf = pa.reshape(k, p * p)
    # capped so the rotated descriptor window stays inside the patch — see
    # the _SCALE_CAP note at the PATCH definition
    scale = jnp.minimum(jnp.maximum(sigma_oct, 1.0) * 0.5, _SCALE_CAP)  # [K]

    # static patch pixel offsets relative to each keypoint's position
    pix = jnp.arange(p, dtype=jnp.float32)
    py_, px_ = jnp.meshgrid(pix, pix, indexing="ij")
    pxf = px_.ravel()[None]                                  # [1, P*P]
    pyf = py_.ravel()[None]
    du = pxf - ctrs[:, 0:1]                                  # [K, P*P]
    dv = pyf - ctrs[:, 1:2]
    inv_s = 1.0 / scale[:, None]
    # pixel offset in descriptor-grid units (before rotation)
    gu = du * inv_s
    gv = dv * inv_s

    # --- orientation: 36-bin histogram over a round window ---------------
    r = 8.0
    wgt_o = jnp.exp(-(gu ** 2 + gv ** 2) / (2.0 * (r * 0.5) ** 2))
    in_o = (jnp.abs(gu) <= r) & (jnp.abs(gv) <= r)
    mw = jnp.where(in_o, pmf * wgt_o, 0.0)
    bins = jnp.clip(jnp.floor((paf + jnp.pi) / (2 * jnp.pi) * 36)
                    .astype(jnp.int32), 0, 35)
    hist = jnp.stack([jnp.sum(jnp.where(bins == b, mw, 0.0), axis=1)
                      for b in range(36)], axis=1)           # [K, 36]
    hist = (jnp.roll(hist, 1, axis=1) + hist
            + jnp.roll(hist, -1, axis=1)) / 3.0
    theta = ((jnp.argmax(hist, axis=1).astype(jnp.float32) + 0.5) / 36.0
             * 2 * jnp.pi - jnp.pi)                          # [K]

    # --- descriptor: rotate pixels into the oriented frame ---------------
    c, s = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    u = c * gu + s * gv                                      # [K, P*P]
    v = -s * gu + c * gv
    wgt_d = jnp.exp(-(u ** 2 + v ** 2) / (2.0 * 8.0 ** 2))
    in_d = (jnp.abs(u) < 10.0) & (jnp.abs(v) < 10.0)
    mwd = jnp.where(in_d, pmf * wgt_d, 0.0)
    # cell coordinates: centers at 0..3 in each axis
    cu = u / 4.0 + 1.5
    cv = v / 4.0 + 1.5
    af = (paf - theta[:, None] + jnp.pi) / (2 * jnp.pi) * 8.0
    af = jnp.mod(af, 8.0)
    # trilinear soft assignment: tent weights over (cell_x, cell_y, bin)
    cells = jnp.arange(4, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(cu[:, :, None] - cells))  # [K,PP,4]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(cv[:, :, None] - cells))
    parts = []
    for b in range(8):
        d = jnp.abs(af - b)
        wb = jnp.maximum(0.0, 1.0 - jnp.minimum(d, 8.0 - d))  # [K, P*P]
        mb = mwd * wb
        # [K, 4cy, 4cx] = sum over pixels of mb * wy * wx
        cell_kij = jnp.einsum("kp,kpi,kpj->kij", mb, wy, wx)
        parts.append(cell_kij)
    desc = jnp.stack(parts, axis=-1).reshape(k, 128)   # [K, cy*cx*8] layout
    # normalize, clip, renormalize (illumination invariance)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-8)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-8)
    theta = jnp.where(valid, theta, 0.0)
    desc = jnp.where(valid[:, None], desc, 0.0)
    return theta, desc


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
        # the descriptor slices a PATCH x PATCH window, so an octave must be
        # at least that tall/wide to participate
        if budgets[o] > 0 and min(octave_img.shape) >= PATCH:
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
    """Batched SIFT in ``cfg.batch_chunk``-frame chunks via ``lax.map``:
    the chunking bounds the transient Gaussian/DoG stacks to
    [chunk, S+2, H, W] (a flat 96-frame vmap at 1080p needs ~15 GB of HBM
    temps and fails to fit). Module-level jit so repeat calls at one shape
    reuse the cache instead of re-tracing the whole pyramid."""
    b = imgs.shape[0]
    c = max(1, min(cfg.batch_chunk, b))
    pad = (-b) % c
    if pad:
        imgs = jnp.concatenate(
            [imgs, jnp.zeros((pad, *imgs.shape[1:]), imgs.dtype)])
    out = jax.lax.map(
        lambda ch: jax.vmap(lambda im: detect_and_describe(im, cfg))(ch),
        imgs.reshape(-1, c, *imgs.shape[1:]))
    return jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:])[:b], out)
