"""Descriptor matching on the MXU: Hamming / L2 brute-force matching and the
all-pairs frame-similarity matrix.

TPU-native replacement for the reference's matcher hot loops:

* ``cv::BFMatcher(NORM_L2).knnMatch`` + Lowe ratio (main.cpp:509-534) ->
  :func:`l2sq_matrix` + :func:`knn2` + :func:`ratio_matches`.
* ``cv::BFMatcher(NORM_HAMMING)`` + "keep dist < 2 x min dist"
  (loop_closing.hpp:40,73; README.md:116-117) -> :func:`hamming_matrix` +
  :func:`nn_matches_2xmin`.
* the O(K^2) loop-closure similarity search (main.cpp:1362-1421;
  README.md:119-126) -> :func:`all_pairs_good_counts`, which evaluates every
  candidate frame pair as batched int8 matmuls.

The core trick (SURVEY.md §7 "popcount on TPU"): with descriptors encoded as
+-1 int8 vectors, ``dot(a, b) = bits - 2 * hamming(a, b)``, so Hamming
distance rides the 128x128 systolic array as an int8 matmul instead of a
scalar XOR/popcount loop — this is where the Gpairs/sec headline metric
lives. Invalid (padded) rows are all-zero in the signed layout, giving
``dot = 0`` -> ``dist = bits/2``; correctness always comes from the explicit
validity masks, never from the padding values.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_loop_closing_tpu.ops.descriptors import BITS

BIG = jnp.int32(2 ** 30)
BIG_F = 1e30


def hamming_matrix(signed_q: jax.Array, signed_t: jax.Array) -> jax.Array:
    """[M, 256] x [N, 256] int8 +-1 -> [M, N] int32 Hamming distances via one
    MXU matmul: ``ham = (BITS - q @ t^T) / 2``."""
    dots = jax.lax.dot_general(
        signed_q, signed_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (BITS - dots) >> 1


def l2sq_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """[M, D] x [N, D] float -> [M, N] squared L2 via the GEMM expansion
    ``|a|^2 - 2ab + |b|^2`` (one MXU matmul + rank-1 corrections)."""
    dots = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    na = jnp.sum(a.astype(jnp.float32) ** 2, axis=1)
    nb = jnp.sum(b.astype(jnp.float32) ** 2, axis=1)
    return jnp.maximum(na[:, None] - 2.0 * dots + nb[None, :], 0.0)


def _mask_dist(dist: jax.Array, valid_q: jax.Array,
               valid_t: jax.Array) -> jax.Array:
    big = BIG if jnp.issubdtype(dist.dtype, jnp.integer) else jnp.asarray(
        BIG_F, dist.dtype)
    dist = jnp.where(valid_t[None, :], dist, big)
    return jnp.where(valid_q[:, None], dist, big)


class Knn2(NamedTuple):
    idx1: jax.Array  # [M] int32 nearest-neighbor index
    d1: jax.Array    # [M] nearest distance
    d2: jax.Array    # [M] second-nearest distance


def knn2(dist: jax.Array, valid_q: jax.Array, valid_t: jax.Array) -> Knn2:
    """Per-query top-2 nearest neighbors (the k=2 of cv::knnMatch), computed
    as two masked row-min reductions (cheaper than a sort on TPU)."""
    d = _mask_dist(dist, valid_q, valid_t)
    idx1 = jnp.argmin(d, axis=1).astype(jnp.int32)
    d1 = jnp.take_along_axis(d, idx1[:, None], axis=1)[:, 0]
    n = d.shape[1]
    cols = jnp.arange(n, dtype=jnp.int32)
    d_wo = jnp.where(cols[None, :] == idx1[:, None],
                     BIG if jnp.issubdtype(d.dtype, jnp.integer)
                     else jnp.asarray(BIG_F, d.dtype), d)
    d2 = jnp.min(d_wo, axis=1)
    return Knn2(idx1=idx1, d1=d1, d2=d2)


class Matches(NamedTuple):
    """Fixed-shape match set: one (optional) target index per query row."""

    idx: jax.Array    # [M] int32 target index (meaningful only where mask)
    dist: jax.Array   # [M] match distance
    mask: jax.Array   # [M] bool
    count: jax.Array  # int32 number of matches


def ratio_matches(dist: jax.Array, valid_q: jax.Array, valid_t: jax.Array,
                  ratio: float) -> Matches:
    """Lowe-ratio-test matching (reference main.cpp:509-534): keep the NN when
    ``d1 < ratio * d2``. Distances are compared in the metric given (use
    squared L2 with ``ratio**2``; callers here pass linear-metric wrappers)."""
    k = knn2(dist, valid_q, valid_t)
    d1f = k.d1.astype(jnp.float32)
    d2f = k.d2.astype(jnp.float32)
    mask = valid_q & (d1f < ratio * d2f) & (d1f < BIG_F / 2)
    return Matches(idx=k.idx1, dist=k.d1, mask=mask,
                   count=jnp.sum(mask.astype(jnp.int32)))


def _ratio_from_knn2(d1, idx1, d2, valid_q, ratio_eff) -> Matches:
    """Ratio-test Matches from fused top-2 results (same rule as
    :func:`ratio_matches`; the kernels already applied target validity)."""
    d1f = d1.astype(jnp.float32)
    mask = valid_q & (d1f < ratio_eff * d2.astype(jnp.float32)) & (
        d1f < BIG_F / 2)
    return Matches(idx=idx1, dist=d1, mask=mask,
                   count=jnp.sum(mask.astype(jnp.int32)))


def ratio_matches_l2(desc_q: jax.Array, valid_q: jax.Array, desc_t: jax.Array,
                     valid_t: jax.Array, ratio: float) -> Matches:
    """SIFT-path matcher: squared-L2 GEMM + ratio test on squared distances
    (``d1 < r*d2  <=>  d1^2 < r^2*d2^2``), matching cv::BFMatcher NORM_L2.
    On TPU the fused Pallas top-2 kernel runs (the [M, N] distance matrix
    never leaves VMEM — the dominant find_loop cost at SIFT-4000)."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    if pallas_kernels.use_pallas():
        d1, idx1, d2 = pallas_kernels.l2_knn2(desc_q, desc_t, valid_t)
        return _ratio_from_knn2(d1, idx1, d2, valid_q, ratio * ratio)
    return ratio_matches(l2sq_matrix(desc_q, desc_t), valid_q, valid_t,
                         ratio * ratio)


def ratio_matches_hamming(signed_q: jax.Array, valid_q: jax.Array,
                          signed_t: jax.Array, valid_t: jax.Array,
                          ratio: float) -> Matches:
    """ORB-path ratio matcher (Hamming knn2 + Lowe ratio), fused on TPU."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    if pallas_kernels.use_pallas():
        d1, idx1, d2 = pallas_kernels.hamming_knn2(signed_q, signed_t,
                                                   valid_t)
        return _ratio_from_knn2(d1, idx1, d2, valid_q, ratio)
    return ratio_matches(hamming_matrix(signed_q, signed_t), valid_q,
                         valid_t, ratio)


def nn_matches_2xmin(signed_q: jax.Array, valid_q: jax.Array,
                     signed_t: jax.Array, valid_t: jax.Array,
                     scale: float = 2.0) -> Matches:
    """Version-A ORB matching rule (README.md:116-117): NN match per query
    descriptor, keep matches with ``dist < scale * min_dist`` where min_dist
    is the minimum NN distance over this pair's matches. On TPU the fused
    Pallas NN kernel supplies (d1, idx) without an HBM distance matrix."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    if pallas_kernels.use_pallas():
        d1, idx1 = pallas_kernels.hamming_nn(signed_q, signed_t, valid_t)
    else:
        dist = hamming_matrix(signed_q, signed_t)
        d = _mask_dist(dist, valid_q, valid_t)
        idx1 = jnp.argmin(d, axis=1).astype(jnp.int32)
        d1 = jnp.take_along_axis(d, idx1[:, None], axis=1)[:, 0]
    row_ok = valid_q & (d1 < BIG // 2)
    dmin = jnp.min(jnp.where(row_ok, d1, BIG))
    # max(2*min, 30): with a strict '< 2*min' a single perfect duplicate
    # (min dist 0 — common once descriptors are discretized) collapses the
    # threshold and rejects every real match; the max(2*min, 30) floor is
    # the standard OpenCV-matcher convention for 256-bit ORB.
    thr = jnp.maximum((dmin * scale).astype(d1.dtype), 30)
    mask = row_ok & (d1 < thr)
    return Matches(idx=idx1, dist=d1, mask=mask,
                   count=jnp.sum(mask.astype(jnp.int32)))


def good_count_pair(signed_q, valid_q, signed_t, valid_t,
                    scale: float = 2.0) -> jax.Array:
    """Good-match count for one frame pair (the all-pairs inner kernel).
    On TPU this dispatches to the fused Pallas NN kernel (the [N, N]
    distance block never leaves VMEM); elsewhere the XLA path runs."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    if pallas_kernels.use_pallas():
        return pallas_kernels.good_count_pair_pallas(
            signed_q, valid_q, signed_t, valid_t, scale)
    return nn_matches_2xmin(signed_q, valid_q, signed_t, valid_t, scale).count


@functools.partial(jax.jit, static_argnames=("scale",))
def block_pair_counts(signed_q: jax.Array, valid_q: jax.Array,
                      signed_t: jax.Array, valid_t: jax.Array,
                      scale: float = 2.0) -> jax.Array:
    """Good-match counts of EVERY query frame against EVERY target frame:
    [Fq, N, D] x [Ft, N, D] -> [Fq, Ft].

    One matmul per QUERY FRAME against the whole flattened target block
    ([N, D] @ [D, Ft*N]) followed by a segmented row-min — instead of one
    small matmul per frame pair. Large matmuls are where the MXU lives:
    per-pair formulation measured ~0.44 ms/pair on v5e; this runs the same
    arithmetic at a fraction of that. Memory: the [N, Ft*N] distance block
    is transient per query frame (sequential lax.map), so callers control
    peak usage via the target block size.

    On TPU, when the target block fits VMEM, the fused Pallas kernel runs
    instead (:func:`..pallas_kernels.block_pair_counts_fused`): the distance
    blocks never reach HBM at all — bitwise-identical counts, ~1.6x faster
    at the headline 1080p configuration.
    """
    from slam_loop_closing_tpu.ops import pallas_kernels

    ft, n, d = signed_t.shape
    npad = n + ((-n) % 128)
    if (pallas_kernels.use_pallas()
            and ft * npad * d <= pallas_kernels._PAIR_T_BUDGET):
        return pallas_kernels.block_pair_counts_fused(
            signed_q, valid_q, signed_t, valid_t, scale)
    # All-bf16 inner pipeline. Every value is a small integer — +-1/0
    # operands, dots in [-256, 256] with the same parity as BITS, Hamming
    # distances <= 256, thresholds <= 512 (even) — all exactly
    # representable in bf16's 8-bit mantissa. bf16 keeps the matmul on the
    # MXU (the int8 dot_general lowers off it on this platform) and halves
    # the HBM traffic of the distance-block reduction passes, which bound
    # this kernel at KITTI scale.
    tflat = signed_t.reshape(ft * n, d).astype(jnp.bfloat16)
    vflat = valid_t.reshape(ft * n)
    big = jnp.bfloat16(512.0)

    def one_query(args):
        sq, vq = args
        dots = jax.lax.dot_general(
            sq.astype(jnp.bfloat16), tflat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.bfloat16)     # [N, Ft*N], exact
        dist = (jnp.bfloat16(BITS) - dots) * jnp.bfloat16(0.5)
        dist = jnp.where(vflat[None, :], dist, big)
        # Threshold logic in float32: bf16 has an 8-bit mantissa, so
        # BITS + 1 = 257 rounds to 256 (excluding an exact-256 distance) and
        # dmin * scale rounds for any scale where the product is not exactly
        # representable. The [N, Ft] d1 block is small — only the [N, Ft*N]
        # distance reduction above needs the bf16 bandwidth win.
        d1 = jnp.min(dist.reshape(n, ft, n), axis=2).astype(jnp.float32)
        row_ok = vq[:, None] & (d1 < jnp.float32(BITS + 1))
        dmin = jnp.min(jnp.where(row_ok, d1, jnp.float32(512.0)),
                       axis=0)                                 # [Ft]
        thr = jnp.maximum(dmin * jnp.float32(scale), jnp.float32(30.0))
        return jnp.sum((row_ok & (d1 < thr[None, :])).astype(jnp.int32),
                       axis=0)                       # [Ft]

    return jax.lax.map(one_query, (signed_q, valid_q))


@functools.partial(jax.jit, static_argnames=("scale", "t_block"))
def dense_pair_counts(signed: jax.Array, valid: jax.Array,
                      scale: float = 2.0, t_block: int = 16) -> jax.Array:
    """Full [F, F] good-match-count matrix via :func:`block_pair_counts`
    over target blocks of ``t_block`` frames (bounds the transient distance
    block to N x t_block*N). This is the production all-pairs path for the
    loop-similarity matrix; band-mask afterwards."""
    f, n, d = signed.shape
    pad = (-f) % t_block
    sp = jnp.pad(signed, ((0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(valid, ((0, pad), (0, 0)))
    nb = (f + pad) // t_block
    sblocks = sp.reshape(nb, t_block, n, d)
    vblocks = vp.reshape(nb, t_block, n)

    def per_tblock(args):
        st, vt = args
        return block_pair_counts(signed, valid, st, vt, scale)  # [F, tb]

    cols = jax.lax.map(per_tblock, (sblocks, vblocks))  # [nb, F, tb]
    counts = jnp.transpose(cols, (1, 0, 2)).reshape(f, (f + pad))
    return counts[:, :f]


@functools.partial(jax.jit, static_argnames=("min_gap", "scale", "block"))
def banded_pair_counts(signed: jax.Array, valid: jax.Array, min_gap: int,
                       scale: float = 2.0, block: int = 16) -> jax.Array:
    """[F, F] good-match counts restricted to the loop band
    ``target <= query - min_gap`` (everything else 0): the production
    loop-similarity path. Work is scheduled as block x block frame tiles and
    only tiles intersecting the band are computed — for the reference's
    gap-30 rule this skips the upper triangle plus the diagonal strip
    (~55% of a dense evaluation).

    On TPU (and when a tile's target block fits VMEM) the tiles run through
    the fused Pallas kernel (:func:`..pallas_kernels.banded_pair_counts_fused`)
    whose per-pair distance blocks never reach HBM — the XLA tile path below
    is bandwidth-bound on its [N, Ft*N] bf16 distance blocks."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    f, n, d = signed.shape
    npad = n + ((-n) % 128)
    if (pallas_kernels.use_pallas() and (block * npad) % 256 == 0
            and block * npad * d <= 4 * 2 ** 20):
        return pallas_kernels.banded_pair_counts_fused(
            signed, valid, min_gap, scale, block)
    pad = (-f) % block
    sp = jnp.pad(signed, ((0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(valid, ((0, pad), (0, 0)))
    nb = (f + pad) // block
    sblocks = sp.reshape(nb, block, n, d)
    vblocks = vp.reshape(nb, block, n)

    bpairs = [(qb, tb) for qb in range(nb) for tb in range(nb)
              if tb * block <= qb * block + block - 1 - min_gap]
    if not bpairs:
        return jnp.zeros((f, f), jnp.int32)
    qidx = jnp.asarray([p[0] for p in bpairs], jnp.int32)
    tidx = jnp.asarray([p[1] for p in bpairs], jnp.int32)

    def per(args):
        qb, tb = args
        return block_pair_counts(sblocks[qb], vblocks[qb],
                                 sblocks[tb], vblocks[tb], scale)

    tiles = jax.lax.map(per, (qidx, tidx))          # [P, block, block]
    full = jnp.zeros((nb, nb, block, block), jnp.int32)
    full = full.at[qidx, tidx].set(tiles)
    counts = full.transpose(0, 2, 1, 3).reshape(nb * block, nb * block)
    counts = counts[:f, :f]
    q = jnp.arange(f)[:, None]
    t = jnp.arange(f)[None, :]
    return jnp.where(t <= q - min_gap, counts, 0)


def dense_pair_counts_chunked(signed, valid, scale: float = 2.0,
                              min_gap: int = 1,
                              pairs_per_call: int = 8192) -> "np.ndarray":
    """Sequence-scale DENSE all-pairs good-match counts (BASELINE config 2:
    500-frame ORB-4000 dense similarity): every ordered pair
    ``t <= q - min_gap`` evaluated through the fused per-pair NN kernel
    (:func:`all_pairs_good_counts` -> Pallas on TPU, where the [N, N]
    distance block never leaves VMEM — at ORB-4000 the XLA flattened-target
    formulation would materialize ~0.5 GB of HBM per query block). Pairs are
    dispatched ``pairs_per_call`` per device program: one program holding
    all ~125k pairs runs long enough to trip the device watchdog (same
    lesson as :func:`banded_pair_counts_chunked`). Returns the [F, F] numpy
    count matrix with out-of-range entries zeroed.

    A dense lower triangle IS a band with the caller's ``min_gap`` — on TPU
    this routes through :func:`banded_pair_counts_chunked`'s fused tile
    kernel (in-kernel count finalize, auto block size: 4-frame tiles at
    ORB-4000), which reaches ~3x the per-pair kernel's MXU utilization."""
    import numpy as np

    from slam_loop_closing_tpu.ops import pallas_kernels

    if pallas_kernels.use_pallas():
        npad_f = signed.shape[1] + ((-signed.shape[1]) % 128)
        if npad_f * signed.shape[2] <= pallas_kernels._PAIR_T_BUDGET:
            return banded_pair_counts_chunked(signed, valid, min_gap, scale)

    f = signed.shape[0]
    pq_all = [(q, t) for q in range(f) for t in range(0, q - min_gap + 1)]
    out = np.zeros((f, f), np.int32)
    for s in range(0, len(pq_all), pairs_per_call):
        chunk = pq_all[s:s + pairs_per_call]
        pad = (-len(chunk)) % 8
        padded = chunk + [chunk[0]] * pad
        pq = jnp.asarray([c[0] for c in padded], jnp.int32)
        pt = jnp.asarray([c[1] for c in padded], jnp.int32)
        counts = np.asarray(all_pairs_good_counts(signed, valid, pq, pt,
                                                  scale))
        for (q, t), c in zip(chunk, counts):
            out[q, t] = c
    return out


@functools.partial(jax.jit, static_argnames=("scale",))
def _band_tiles_kernel(sblocks, vblocks, qidx, tidx, scale):
    """[T] tile indices -> [T, block, block] good-match counts (one
    sequential lax.map dispatch; T is the caller's per-dispatch budget)."""
    def per(args):
        qb, tb = args
        return block_pair_counts(sblocks[qb], vblocks[qb],
                                 sblocks[tb], vblocks[tb], scale)

    return jax.lax.map(per, (qidx, tidx))


def _banded_chunked_fused(signed, valid, min_gap: int, scale: float,
                          block: int, tiles_per_call: int,
                          interpret: bool = False) -> "np.ndarray":
    """TPU path of :func:`banded_pair_counts_chunked`: the band's 8-frame
    tiles run through the in-kernel-finalized Pallas pair kernel
    (:func:`..pallas_kernels.band_count_tiles_fused`) ``tiles_per_call``
    per dispatch. All dispatches are enqueued asynchronously (outputs are
    [T, block, block] count tiles — the whole KITTI band's output is
    ~41 MB) and converted once at the end, so the per-dispatch round trip
    never serializes against device compute."""
    import numpy as np

    from slam_loop_closing_tpu.ops import pallas_kernels

    f, n, d = signed.shape
    npad_extra = (-n) % 128
    npad = n + npad_extra
    fpad = (-f) % block
    # the kernel derives target-row validity from the zero-row convention;
    # enforce it (front-end descriptors already comply — this is one cheap
    # masked multiply on resident data)
    signed = jnp.where(valid[..., None], signed, 0)
    sp = jnp.pad(signed, ((0, fpad), (0, npad_extra), (0, 0)))
    vp = jnp.pad(valid, ((0, fpad), (0, npad_extra)))
    nb = (f + fpad) // block
    sblocks = sp.reshape(nb, block * npad, d)
    qv = vp.reshape(nb, block, npad).astype(jnp.int32)

    bpairs = [(qb, tb) for qb in range(nb) for tb in range(nb)
              if tb * block <= qb * block + block - 1 - min_gap]
    if not bpairs:
        return np.zeros((f, f), np.int32)
    chunks = []
    for s in range(0, len(bpairs), tiles_per_call):
        chunk = bpairs[s:s + tiles_per_call]
        # pad the ragged final chunk to the next power of two, not to the
        # full tiles_per_call — padding is real duplicated device work, and
        # the power-of-two sizes bound the number of distinct compiles
        p_sz = 1
        while p_sz < len(chunk):
            p_sz *= 2
        padded = chunk + [chunk[0]] * (p_sz - len(chunk))
        qidx = jnp.asarray([c[0] for c in padded], jnp.int32)
        tidx = jnp.asarray([c[1] for c in padded], jnp.int32)
        chunks.append((chunk, pallas_kernels.band_count_tiles_fused(
            sblocks, qv, qidx, tidx, scale, interpret=interpret)))

    full = np.zeros((nb, nb, block, block), np.int32)
    for chunk, dev in chunks:
        tiles = np.asarray(dev)[: len(chunk)]
        qi = np.fromiter((c[0] for c in chunk), np.int64, len(chunk))
        ti = np.fromiter((c[1] for c in chunk), np.int64, len(chunk))
        full[qi, ti] = tiles
    counts = full.transpose(0, 2, 1, 3).reshape(nb * block, nb * block)
    counts = counts[:f, :f]
    q = np.arange(f)[:, None]
    t = np.arange(f)[None, :]
    return np.where(t <= q - min_gap, counts, 0)


def banded_pair_counts_chunked(signed, valid, min_gap: int,
                               scale: float = 2.0, block: int = 64,
                               tiles_per_call: int = 256,
                               fused_block: int | None = None,
                               fused_tiles_per_call: int | None = None
                               ) -> "np.ndarray":
    """Sequence-scale variant of :func:`banded_pair_counts`: the band's
    block tiles are evaluated ``tiles_per_call`` at a time, one device
    dispatch each, with results assembled on the host. A single program
    holding ALL tiles of a 4541-frame KITTI band (~2.5k tiles x 64
    sequential queries each) runs long enough to trip the device watchdog —
    chunking keeps each program bounded while the per-dispatch round trip
    amortizes over many tiles. Returns the [F, F] numpy count matrix with
    out-of-band entries zeroed.

    On TPU the band runs through the in-kernel-finalized Pallas kernel
    (distance blocks and the d1 table never touch HBM): the tile block is
    the largest power of two <= 8 whose target block fits the VMEM budget
    (8 frames at ORB-1000, 4 at ORB-4000), and tiles-per-dispatch is scaled
    to a constant per-dispatch FLOP budget (~1 s of device time — bounded
    well under the device watchdog, long enough to amortize the dispatch
    round trip). ``block``/``tiles_per_call`` only shape the XLA
    fallback."""
    import numpy as np

    from slam_loop_closing_tpu.ops import pallas_kernels

    f, n, d = signed.shape
    npad_f = n + ((-n) % 128)
    if fused_block is None:
        fused_block = 8
        while fused_block > 1 and (fused_block * npad_f * d
                                   > pallas_kernels._PAIR_T_BUDGET):
            fused_block //= 2
    if (pallas_kernels.use_pallas()
            and fused_block * npad_f * d <= pallas_kernels._PAIR_T_BUDGET):
        if fused_tiles_per_call is None:
            flops_per_tile = fused_block * fused_block * npad_f * npad_f * 2 * d
            fused_tiles_per_call = max(64, int(1.4e14 // flops_per_tile))
        return _banded_chunked_fused(signed, valid, min_gap, scale,
                                     fused_block, fused_tiles_per_call)
    pad = (-f) % block
    sp = jnp.pad(signed, ((0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(valid, ((0, pad), (0, 0)))
    nb = (f + pad) // block
    sblocks = jnp.asarray(sp.reshape(nb, block, n, d))
    vblocks = jnp.asarray(vp.reshape(nb, block, n))

    bpairs = [(qb, tb) for qb in range(nb) for tb in range(nb)
              if tb * block <= qb * block + block - 1 - min_gap]
    out = np.zeros((f, f), np.int32)
    for s in range(0, len(bpairs), tiles_per_call):
        chunk = bpairs[s:s + tiles_per_call]
        padded = chunk + [chunk[0]] * (tiles_per_call - len(chunk))
        qidx = jnp.asarray([c[0] for c in padded], jnp.int32)
        tidx = jnp.asarray([c[1] for c in padded], jnp.int32)
        tiles = np.asarray(_band_tiles_kernel(sblocks, vblocks, qidx, tidx,
                                              scale))
        for (qb, tb), tile in zip(chunk, tiles):
            q0, t0 = qb * block, tb * block
            q1, t1 = min(q0 + block, f), min(t0 + block, f)
            out[q0:q1, t0:t1] = tile[: q1 - q0, : t1 - t0]
    q = np.arange(f)[:, None]
    t = np.arange(f)[None, :]
    return np.where(t <= q - min_gap, out, 0)


@functools.partial(jax.jit, static_argnames=("scale", "chunk"))
def all_pairs_good_counts(signed: jax.Array, valid: jax.Array,
                          pair_q: jax.Array, pair_t: jax.Array,
                          scale: float = 2.0, chunk: int = 8) -> jax.Array:
    """Good-match counts for an explicit list of frame pairs.

    ``signed``: [F, N, 256] int8; ``valid``: [F, N] bool; ``pair_q/t``: [P]
    frame indices (pad with 0 — callers mask). Evaluated as ``lax.map`` over
    chunks of vmapped pairs: each chunk is ``chunk`` int8 matmuls of
    [N, 256] @ [256, N] on the MXU, with only the [N] row-mins kept, so HBM
    traffic stays at O(chunk * N^2) transient instead of O(P * N^2).

    This one call replaces the reference's sequential loop-closure search
    (hot loop #2, main.cpp:1362-1421) and the Version-A ``detectLoops``
    similarity scan (README.md:119-126).
    """
    p = pair_q.shape[0]
    pad = (-p) % chunk
    pq = jnp.concatenate([pair_q, jnp.zeros((pad,), pair_q.dtype)])
    pt = jnp.concatenate([pair_t, jnp.zeros((pad,), pair_t.dtype)])

    def one(qi, ti):
        return good_count_pair(signed[qi], valid[qi], signed[ti], valid[ti],
                               scale)

    def body(c):
        return jax.vmap(one)(c[0], c[1])

    counts = jax.lax.map(body, (pq.reshape(-1, chunk), pt.reshape(-1, chunk)))
    return counts.reshape(-1)[:p]


def similarity(counts: jax.Array, nq: jax.Array, nt: jax.Array) -> jax.Array:
    """Version-A similarity score ``matches / min(n1, n2)`` (README.md:121)."""
    denom = jnp.minimum(nq, nt).astype(jnp.float32)
    return counts.astype(jnp.float32) / jnp.maximum(denom, 1.0)


@jax.jit
def pack_valid_first(desc: jax.Array, xy: jax.Array,
                     valid: jax.Array) -> tuple[jax.Array, jax.Array,
                                                jax.Array]:
    """Permute each frame's keypoint rows so every valid row comes first
    (stable within each group), for [B, N, D] / [B, N, 2] / [B, N] inputs.

    Row order carries no meaning downstream — matching, the track table,
    and all geometry key on row indices consistently — but front-packed
    validity lets the pipeline slice every descriptor GEMM to a per-run
    count bucket: a SIFT-4000 frame typically carries only ~1-1.5k valid
    keypoints, so matching at the padded capacity multiplies >2x zero rows
    (the reference never pads: cv::Mat descriptor rows are naturally dense,
    main.cpp:497-556; padding is this framework's fixed-shape contract).

    Descriptor rows move through ``take_along_axis`` (contiguous [D]-row
    gathers, one per keypoint — cheap next to a single [N, N] matching
    GEMM); invalid rows keep their all-zero contents, preserving the
    signed-layout zero-padding invariant."""
    perm = jnp.argsort(jnp.logical_not(valid), axis=-1, stable=True)
    return (jnp.take_along_axis(desc, perm[..., None], axis=-2),
            jnp.take_along_axis(xy, perm[..., None], axis=-2),
            jnp.take_along_axis(valid, perm, axis=-1))


def gather_matched_points(xy_q: jax.Array, xy_t: jax.Array,
                          m: Matches) -> tuple[jax.Array, jax.Array]:
    """``extractMatchedPoints`` equivalent (reference main.cpp:539-556):
    fixed-shape gathers of the matched (query, target) pixel pairs; rows where
    ``m.mask`` is False are padding."""
    return xy_q, xy_t[m.idx]


def prosac_quality(xy_q: jax.Array, xy_t_matched: jax.Array,
                   m: "Matches", radius: float, tau: float) -> jax.Array:
    """THE PROSAC sampling-quality term for RANSAC: local motion-coherence
    support (:func:`motion_support`) with a ``-dist`` tiebreak that keeps
    ranks informative when support is flat. Descriptor distance is
    ANTI-correlated with correctness on repetitive texture, so support is
    primary and distance only breaks ties (normalized into (0, 1) so it can
    never outvote one unit of support). Single definition — this expression
    decides whether RANSAC converges at all, so every call site (SfM keyframe
    step, loop verification, Version-A pose estimation) must use this one."""
    support = motion_support(xy_q, xy_t_matched, m.mask, radius, tau)
    dist_f = m.dist.astype(jnp.float32)
    return (support.astype(jnp.float32)
            - dist_f / (1.0 + jnp.max(jnp.where(m.mask, m.dist, 0)
                                      .astype(jnp.float32))))


def motion_support(xy_q: jax.Array, xy_t_matched: jax.Array, mask: jax.Array,
                   radius: float, tau: float) -> jax.Array:
    """Local motion-coherence support per match (GMS-style, Bian et al.
    CVPR'17 recast as two distance GEMMs): support[i] counts matches j whose
    query keypoint lies within ``radius`` of i's and whose displacement
    vector agrees within ``tau``. True video matches ride a smooth motion
    field and accumulate support; false matches (repetitive texture) have
    scattered displacements and get none — measured on the synthetic-orbit
    SIFT regime, ranking by support lifts the top-64 pool from 8% to 80%
    inliers where descriptor distance is ANTI-correlated with correctness.
    Feed the result to RANSAC's PROSAC ``quality``. Units of ``radius``/
    ``tau`` follow the coordinates passed (pixels or normalized).

    On TPU the fused Pallas kernel runs — the two [N, N] distance blocks
    stay in VMEM (at N=4000 the XLA path materializes ~400 MB of HBM
    traffic per call, a dominant loop-scoring cost)."""
    from slam_loop_closing_tpu.ops import pallas_kernels

    if pallas_kernels.use_pallas():
        return pallas_kernels.motion_support_pallas(xy_q, xy_t_matched, mask,
                                                    radius, tau)

    def sq_dists(a):
        n2 = jnp.sum(a * a, axis=1)
        dots = jax.lax.dot_general(
            a, a, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.maximum(n2[:, None] - 2.0 * dots + n2[None, :], 0.0)

    disp = xy_q - xy_t_matched
    near = sq_dists(xy_q) < radius * radius
    agree = sq_dists(disp) < tau * tau
    ok = near & agree & mask[None, :] & mask[:, None]
    # exclude self-support so padding/isolated matches score 0
    return jnp.sum(ok.astype(jnp.int32), axis=1) - mask.astype(jnp.int32)
