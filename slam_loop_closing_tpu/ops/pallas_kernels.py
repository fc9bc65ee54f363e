"""Pallas TPU kernels for the hot paths: the Hamming-matmul matcher and the
fused FAST-9 corner scorer.

These are the "signature components" of the TPU-native design (SURVEY.md §7
steps 3-4; BASELINE.json north star: "tiled XOR+popcount Hamming-distance
matmul ... fused Pallas kernels over image tiles"). The XLA reference
implementations live in :mod:`.matching` / :mod:`.fast`; these kernels fuse
the distance matmul with its row reduction so the [M, N] distance matrix
never leaves VMEM, and fuse FAST score + NMS into one pass over the image.

Encoding note (SURVEY.md §7 "popcount on TPU"): descriptors are +-1 int8
vectors, so Hamming = (BITS - q.t^T) / 2 rides the 128x128 MXU as an int8
matmul — measured against the SWAR popcount oracle in tests. On non-TPU
backends the kernels run in Pallas interpret mode (tests) or fall back to
the XLA implementations (dispatch via :func:`use_pallas` at the call sites
in :mod:`.fast` and :mod:`.matching`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_loop_closing_tpu.ops.descriptors import BITS

_BIG = 2 ** 30  # python int: jnp scalars would be captured as pallas consts


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Hamming row-min kernel: distances + nearest neighbor without HBM round-trip
# ---------------------------------------------------------------------------

def _hamming_nn_kernel(q_ref, t_ref, tvalid_ref, d1_ref, idx_ref):
    """One query tile [TM, 256] vs the FULL target set [N, 256] resident in
    VMEM: MXU matmul -> [TM, N] distances (VMEM only) -> masked row
    min + NN index. The [TM, N] block never reaches HBM.
    Mosaic's tpu.matmul does not accept int8 operands on this toolchain, so
    the +-1 vectors are cast to bf16 — exact for the {-1, +1} alphabet with
    f32 accumulation (|dot| <= 256 = 2^8 is exactly representable), and
    still rides the MXU."""
    # precision pinned to DEFAULT: the package-wide
    # jax_default_matmul_precision="highest" would make Mosaic emit a
    # contract precision it cannot lower for bf16 operands ("Bad lhs type");
    # DEFAULT is exact anyway for the +-1 alphabet.
    dots = jax.lax.dot_general(
        q_ref[...].astype(jnp.bfloat16), t_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32).astype(jnp.int32)   # [TM, N]
    dist = (BITS - dots) >> 1
    dist = jnp.where(tvalid_ref[...] != 0, dist, _BIG)  # tvalid is [1, N]
    # Outputs stay 2-D ([TM, 1]): Mosaic rejects 1-D VMEM outputs under a
    # grid ("Bad lhs type" at the feeding matmul). The NN index is computed
    # with pure min-reductions (argmin's Mosaic lowering miscompiles in this
    # kernel): idx = min column index among entries equal to the row min —
    # identical tie-breaking (lowest index) to argmin.
    d1 = jnp.min(dist, axis=1, keepdims=True)
    d1_ref[...] = d1
    n = dist.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    idx_ref[...] = jnp.min(jnp.where(dist == d1, col, n),
                           axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def hamming_nn(signed_q: jax.Array, signed_t: jax.Array,
               valid_t: jax.Array, tile_m: int = 256,
               interpret: bool = False):
    """Nearest target per query row: ([M] d1, [M] idx) over Hamming distance.

    ``signed_q`` [M, 256] int8, ``signed_t`` [N, 256] int8 (N padded to a
    lane multiple by the caller or here), ``valid_t`` [N] bool. Query-side
    validity is applied by the caller (invalid query rows produce d1 =
    BITS/2 against zero rows; callers mask them as before).
    """
    m, bits = signed_q.shape
    n = signed_t.shape[0]
    # pad N to 128 lanes, M to the tile
    n_pad = (-n) % 128
    m_pad = (-m) % tile_m
    if n_pad:
        signed_t = jnp.pad(signed_t, ((0, n_pad), (0, 0)))
        valid_t = jnp.pad(valid_t, (0, n_pad))
    if m_pad:
        signed_q = jnp.pad(signed_q, ((0, m_pad), (0, 0)))
    np_, mp = n + n_pad, m + m_pad

    grid = (mp // tile_m,)
    d1, idx = pl.pallas_call(
        _hamming_nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, bits), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, bits), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(signed_q, signed_t, valid_t.astype(jnp.int32)[None, :])
    return d1[:m, 0], idx[:m, 0]


def good_count_pair_pallas(signed_q, valid_q, signed_t, valid_t,
                           scale: float = 2.0, interpret: bool = False):
    """Drop-in for :func:`..matching.good_count_pair` using the fused NN
    kernel (same 2 x min rule, README.md:116-117)."""
    d1, idx = hamming_nn(signed_q, signed_t, valid_t, interpret=interpret)
    row_ok = valid_q & (d1 < _BIG // 2)
    dmin = jnp.min(jnp.where(row_ok, d1, _BIG))
    # max(2*min, 30) floor — must mirror matching.nn_matches_2xmin exactly
    thr = jnp.maximum((dmin * scale).astype(d1.dtype), 30)
    return jnp.sum((row_ok & (d1 < thr)).astype(jnp.int32))


# ---------------------------------------------------------------------------
# fused FAST-9 score + NMS kernel
# ---------------------------------------------------------------------------

from slam_loop_closing_tpu.ops.fast import ARC, CIRCLE  # noqa: E402


_PAD = 8  # halo padding; 8 keeps every dynamic row start sublane-aligned


def _fast_kernel(img_hbm, score_ref, block_ref, sem, *, threshold: float,
                 h: int, w: int, tile_h: int, batched: bool):
    """Row-tiled fused FAST-9 score + 3x3 NMS. The padded image stays in
    HBM; each grid step DMAs ONE 8-aligned [TH+16, W+16] block into VMEM
    scratch (whole-image VMEM residency blows the 16 MB budget once the call
    is batched over frames) and takes the 16 ring-shifted views as static
    in-register slices. Tiling bounds live margin buffers to O(TH x W).
    ``batched``: leading frame axis in the grid (pallas_call over ANY-space
    inputs cannot be vmapped, so batching is a grid dimension here)."""
    if batched:
        b = pl.program_id(0)
        i = pl.program_id(1)
        src = img_hbm.at[b]
    else:
        i = pl.program_id(0)
        src = img_hbm
    row0 = i * tile_h          # multiple of tile_h (itself a multiple of 8)
    the = tile_h + 2           # one extra row each side for the NMS halo
    we = w + 2

    # DMA the aligned superset block: padded rows [row0, row0 + tile_h + 16)
    # cover unpadded rows [row0 - 8, row0 + tile_h + 8).
    dma = pltpu.make_async_copy(
        src.at[pl.ds(row0, tile_h + 16), :], block_ref, sem)
    dma.start()
    dma.wait()
    # bf16 compute: halves the VMEM footprint of the 32 live margin buffers
    # and doubles VPU throughput; score precision ~3 decimal digits is ample
    # for corner ranking (pixel values are 8-bit to begin with).
    block = block_ref[...].astype(jnp.bfloat16)

    def shifted(dy, dx):
        # unpadded row (row0 - 1 + dy + k) -> block row (7 + dy + k); static.
        return block[7 + dy: 7 + dy + the, _PAD - 1 + dx: _PAD - 1 + dx + we]

    center = shifted(0, 0)
    bright_margins = []
    dark_margins = []
    for dy, dx in CIRCLE:
        r = shifted(dy, dx)
        bright_margins.append(r - center - threshold)
        dark_margins.append(center - r - threshold)

    def arc_strength(margins):
        ext = margins + margins[:ARC - 1]
        best = None
        for k in range(16):
            mn = ext[k]
            for j in range(1, ARC):
                mn = jnp.minimum(mn, ext[k + j])
            best = mn if best is None else jnp.maximum(best, mn)
        return best

    score = jnp.maximum(jnp.maximum(arc_strength(bright_margins),
                                    arc_strength(dark_margins)), 0.0)
    # back to f32 before NMS: pltpu.roll has no bf16 lowering
    score = score.astype(jnp.float32)
    # zero outside the global 3-px interior (ring reads zero padding there)
    ys = jax.lax.broadcasted_iota(jnp.int32, (the, we), 0) + row0 - 1
    xs = jax.lax.broadcasted_iota(jnp.int32, (the, we), 1) - 1
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    score = jnp.where(interior, score, 0.0)

    # fused 3x3 NMS on the extended tile, then crop the halo
    local_max = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            # circular shift is safe: wrapped values land outside the
            # interior crop or compare against zeroed borders
            # (pltpu.roll requires non-negative shifts)
            shifted_s = pltpu.roll(score, (-dy) % the, 0)
            shifted_s = pltpu.roll(shifted_s, (-dx) % we, 1)
            local_max = jnp.maximum(local_max, shifted_s)
    out = jnp.where(score >= local_max, score, 0.0)
    cropped = out[1:1 + tile_h, 1:1 + w]
    score_ref[...] = cropped[None] if batched else cropped


def _fast_call_single(img, threshold, tile_h, interpret):
    h, w = img.shape
    hp = (-h) % tile_h
    # DMA slices must be 128-lane aligned: pad the width up to a multiple.
    wp_extra = (-(w + 2 * _PAD)) % 128
    padded = jnp.pad(img, ((_PAD, _PAD + hp), (_PAD, _PAD + wp_extra)))
    out = pl.pallas_call(
        functools.partial(_fast_kernel, threshold=threshold, h=h, w=w,
                          tile_h=tile_h, batched=False),
        grid=((h + hp) // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h + hp, w), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 16, w + 2 * _PAD + wp_extra), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out[:h]


def _fast_call_batched(imgs, threshold, tile_h, interpret):
    b, h, w = imgs.shape
    hp = (-h) % tile_h
    wp_extra = (-(w + 2 * _PAD)) % 128
    padded = jnp.pad(imgs, ((0, 0), (_PAD, _PAD + hp),
                            (_PAD, _PAD + wp_extra)))
    out = pl.pallas_call(
        functools.partial(_fast_kernel, threshold=threshold, h=h, w=w,
                          tile_h=tile_h, batched=True),
        grid=(b, (h + hp) // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tile_h, w), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h + hp, w), imgs.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 16, w + 2 * _PAD + wp_extra), imgs.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out[:, :h]


@functools.partial(jax.jit, static_argnames=("threshold", "tile_h",
                                             "interpret"))
def fast_score_nms(img: jax.Array, threshold: float = 20.0 / 255.0,
                   tile_h: int = 32, interpret: bool = False) -> jax.Array:
    """Fused FAST-9 score + 3x3 NMS, [H, W] -> [H, W], row-tiled.

    vmap-safe: pallas_call over an ANY-memory-space input cannot be vmapped,
    so a custom batching rule reroutes vmap to a grid-batched kernel."""
    assert tile_h % 8 == 0, "tile_h must be sublane-aligned"

    @jax.custom_batching.custom_vmap
    def run(x):
        return _fast_call_single(x, threshold, tile_h, interpret)

    @run.def_vmap
    def _rule(axis_size, in_batched, xs):
        del axis_size
        return _fast_call_batched(xs, threshold, tile_h, interpret), True

    return run(img)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def use_pallas() -> bool:
    """Pallas kernels compile only on real TPU; elsewhere the XLA reference
    paths run (bit-identical semantics, tested against each other)."""
    return _is_tpu()
