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

# The NN kernels pin the ENTIRE padded target block in VMEM: [N, 256] int8
# plus its bf16 cast and one [tile_m, tchunk] f32 dots tile. 32k target rows
# keep that under ~12 MiB of the 16 MiB scoped-VMEM budget; larger target
# sets must chunk through HBM (pl.ANY + DMA) instead — reject them with a
# clear error rather than an opaque Mosaic VMEM failure (ADVICE r4).
_NN_TARGET_MAX_ROWS = 32768


def _check_nn_target_budget(np_: int, bits: int) -> None:
    if np_ * bits > _NN_TARGET_MAX_ROWS * 256:
        raise ValueError(
            f"hamming_nn target set ({np_} x {bits}) exceeds the VMEM-"
            f"resident budget ({_NN_TARGET_MAX_ROWS} x 256); chunk the "
            "targets (see matching.banded_pair_counts_chunked) instead")


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
    _check_nn_target_budget(np_, bits)

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
            _out_struct((mp, 1), jnp.int32, signed_q),
            _out_struct((mp, 1), jnp.int32, signed_q),
        ],
        interpret=interpret,
    )(signed_q, signed_t, valid_t.astype(jnp.int32)[None, :])
    return d1[:m, 0], idx[:m, 0]


def _hamming_d1_kernel(q_ref, t_ref, tvalid_ref, d1_ref, *, tchunk, npad):
    """d1-only variant of :func:`_hamming_nn_kernel` with the reduction on
    RAW MXU dots (min distance == max dot — :func:`_band_counts_kernel`'s
    scheme): per target chunk one masking pass + one lane-max, and the
    distance transform runs once on the reduced [TM, 1] column instead of
    on every [TM, N] element. ~2x fewer VPU passes than the
    distance-reducing kernel; values identical (the +-1 dots are exact in
    f32 and share BITS' parity, so (BITS - max_dot)/2 is the exact row-min
    distance). Target chunking bounds the live f32 dots block."""
    f32 = jnp.float32
    q = q_ref[...].astype(jnp.bfloat16)
    mx = jnp.full((q.shape[0], 1), -f32(_BIG), f32)
    for c in range(npad // tchunk):
        t = t_ref[c * tchunk:(c + 1) * tchunk, :].astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            q, t, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)             # [TM, tchunk]
        dots = jnp.where(
            tvalid_ref[0, c * tchunk:(c + 1) * tchunk][None, :] != 0,
            dots, -f32(_BIG))
        mx = jnp.maximum(mx, jnp.max(dots, axis=1, keepdims=True))
    # exact for valid rows; an all-invalid row yields (BITS + _BIG)/2 >
    # _BIG // 2, which row_ok logic rejects exactly like the NN kernel's
    # _BIG sentinel
    d1_ref[...] = ((f32(BITS) - mx) * f32(0.5)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def hamming_nn_d1(signed_q: jax.Array, signed_t: jax.Array,
                  valid_t: jax.Array, tile_m: int = 256,
                  interpret: bool = False) -> jax.Array:
    """[M] nearest-target Hamming distance per query row (no index) — the
    fast path for consumers that only need d1 (the 2x-min count rule, the
    flagship Gpairs/sec bench). Same contract as ``hamming_nn(...)[0]``."""
    m, bits = signed_q.shape
    n = signed_t.shape[0]
    n_pad = (-n) % 128
    m_pad = (-m) % tile_m
    if n_pad:
        signed_t = jnp.pad(signed_t, ((0, n_pad), (0, 0)))
        valid_t = jnp.pad(valid_t, (0, n_pad))
    if m_pad:
        signed_q = jnp.pad(signed_q, ((0, m_pad), (0, 0)))
    np_, mp = n + n_pad, m + m_pad
    _check_nn_target_budget(np_, bits)
    tchunk = np_
    for cand in (2048, 1024, 512, 256, 128):
        if np_ % cand == 0 and np_ > cand:
            tchunk = cand
            break
    d1 = pl.pallas_call(
        functools.partial(_hamming_d1_kernel, tchunk=tchunk, npad=np_),
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, bits), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, bits), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((mp, 1), jnp.int32, signed_q),
        interpret=interpret,
    )(signed_q, signed_t, valid_t.astype(jnp.int32)[None, :])
    return d1[:m, 0]


def good_count_pair_pallas(signed_q, valid_q, signed_t, valid_t,
                           scale: float = 2.0, interpret: bool = False):
    """Drop-in for :func:`..matching.good_count_pair` using the fused
    d1-only NN kernel (same 2 x min rule, README.md:116-117)."""
    d1 = hamming_nn_d1(signed_q, signed_t, valid_t, interpret=interpret)
    row_ok = valid_q & (d1 < _BIG // 2)
    dmin = jnp.min(jnp.where(row_ok, d1, _BIG))
    # max(2*min, 30) floor — must mirror matching.nn_matches_2xmin exactly
    thr = jnp.maximum((dmin * scale).astype(d1.dtype), 30)
    return jnp.sum((row_ok & (d1 < thr)).astype(jnp.int32))


# ---------------------------------------------------------------------------
# fused top-2 (knn2) kernels: ratio-test matching without HBM round-trips
# ---------------------------------------------------------------------------

def _rowmin2(dist, big):
    """(d1, idx1, d2) per row of a VMEM-resident distance block, with
    argmin expressed as iota-min (argmin's Mosaic lowering miscompiles in
    these kernels) and d2 = min excluding idx1's column — the exact
    semantics of matching.knn2."""
    d1 = jnp.min(dist, axis=1, keepdims=True)
    n = dist.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    idx1 = jnp.min(jnp.where(dist == d1, col, n), axis=1, keepdims=True)
    d2 = jnp.min(jnp.where(col == idx1, big, dist), axis=1, keepdims=True)
    return d1, idx1, d2


def _hamming_knn2_kernel(q_ref, t_ref, tvalid_ref, d1_ref, idx_ref, d2_ref):
    """Query tile [TM, 256] vs the full target set: Hamming distances on the
    MXU (+-1 bf16 encoding, exact), then top-2 row reduction — the [TM, N]
    block never reaches HBM (same scheme as _hamming_nn_kernel)."""
    dots = jax.lax.dot_general(
        q_ref[...].astype(jnp.bfloat16), t_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32).astype(jnp.int32)
    dist = (BITS - dots) >> 1
    dist = jnp.where(tvalid_ref[...] != 0, dist, _BIG)
    d1, idx1, d2 = _rowmin2(dist, _BIG)
    d1_ref[...] = d1
    idx_ref[...] = idx1
    d2_ref[...] = d2


def _l2_knn2_kernel(q_ref, t_ref, tvalid_ref, d1_ref, idx_ref, d2_ref):
    """Query tile [TM, D] float32 vs the full target set [N, D]: squared-L2
    via the GEMM expansion, top-2 row reduction in VMEM.

    The cross-term GEMM runs with bf16 OPERANDS and f32 accumulation: one
    MXU pass instead of the bf16_3x decomposition an f32 matmul lowers to
    (~3x on the dominant find_loop cost at SIFT-4000). SIFT descriptors are
    L2-normalized with entries <= 0.2, so operand rounding perturbs
    distances well under 1% — far inside the 0.7 ratio-test margin (the
    TPU contract is matching QUALITY, not bitwise parity; the f32 XLA path
    in matching.l2sq_matrix is unchanged). Norm terms stay f32."""
    q = q_ref[...]
    t = t_ref[...]
    dots = jax.lax.dot_general(
        q.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)                   # [TM, N]
    nq = jnp.sum(q * q, axis=1, keepdims=True)                # [TM, 1]
    nt = jnp.sum(t * t, axis=1, keepdims=True)                # [N, 1]
    dist = jnp.maximum(nq - 2.0 * dots + nt.reshape(1, -1), 0.0)
    big = jnp.float32(1e30)
    dist = jnp.where(tvalid_ref[...] != 0, dist, big)
    d1, idx1, d2 = _rowmin2(dist, big)
    d1_ref[...] = d1
    idx_ref[...] = idx1
    d2_ref[...] = d2


def _knn2_call(kernel, q, t, valid_t, tile_m, interpret, d_dtype):
    """Shared pallas_call plumbing for the knn2 kernels: pad N to 128 lanes
    and M to the query tile, run the grid, crop. Returns ([M] d1, [M] idx,
    [M] d2)."""
    m, d = q.shape
    n = t.shape[0]
    n_pad = (-n) % 128
    m_pad = (-m) % tile_m
    if n_pad:
        t = jnp.pad(t, ((0, n_pad), (0, 0)))
        valid_t = jnp.pad(valid_t, (0, n_pad))
    if m_pad:
        q = jnp.pad(q, ((0, m_pad), (0, 0)))
    np_, mp = n + n_pad, m + m_pad

    d1, idx, d2 = pl.pallas_call(
        kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((mp, 1), d_dtype, q),
            _out_struct((mp, 1), jnp.int32, q),
            _out_struct((mp, 1), d_dtype, q),
        ],
        interpret=interpret,
    )(q, t, valid_t.astype(jnp.int32)[None, :])
    return d1[:m, 0], idx[:m, 0], d2[:m, 0]


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def hamming_knn2(signed_q: jax.Array, signed_t: jax.Array,
                 valid_t: jax.Array, tile_m: int = 256,
                 interpret: bool = False):
    """Fused Hamming top-2 per query row: ([M] d1, [M] idx1, [M] d2) —
    matching.knn2(hamming_matrix(...)) without materializing the [M, N]
    distance matrix in HBM. Query validity applied by the caller."""
    return _knn2_call(_hamming_knn2_kernel, signed_q, signed_t, valid_t,
                      tile_m, interpret, jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def l2_knn2(desc_q: jax.Array, desc_t: jax.Array, valid_t: jax.Array,
            tile_m: int = 256, interpret: bool = False):
    """Fused squared-L2 top-2 per query row (the SIFT ratio-test inner
    loop): ([M] d1sq, [M] idx1, [M] d2sq). At SIFT-4000 the XLA path reads/
    writes the 64 MB [4000, 4000] f32 distance matrix ~3x per pair; here it
    never leaves VMEM — HBM traffic drops to the descriptor reads."""
    return _knn2_call(_l2_knn2_kernel, desc_q.astype(jnp.float32),
                      desc_t.astype(jnp.float32), valid_t, tile_m, interpret,
                      jnp.float32)


# ---------------------------------------------------------------------------
# banded frame-similarity kernel: per-pair NN distances without HBM blocks
# ---------------------------------------------------------------------------

def _band_d1_kernel(qidx_ref, tidx_ref, qblk_ref, tblk_ref, tval_ref,
                    d1_ref, *, ft: int, npad: int):
    """One query tile [TM, 256] of band tile ``p`` against all ``ft`` target
    frames of that tile: for each target frame, Hamming distances on the MXU
    (+-1 bf16, exact) and a row-min — the [TM, npad] distance block lives
    only in VMEM. Output: [TM, ft] per-query-row nearest-neighbor distances,
    the only thing the 2x-min similarity rule needs per frame pair. The XLA
    path (matching.block_pair_counts) materializes [N, Ft*N] bf16 distance
    blocks in HBM and is bandwidth-bound; this never leaves VMEM."""
    q = qblk_ref[0].astype(jnp.bfloat16)                     # [TM, 256]
    for tf in range(ft):
        t = tblk_ref[0, tf * npad:(tf + 1) * npad, :].astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            q, t, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        dist = (BITS - dots) >> 1
        dist = jnp.where(tval_ref[0, 0, tf * npad:(tf + 1) * npad][None, :]
                         != 0, dist, _BIG)
        d1_ref[0, :, tf:tf + 1] = jnp.min(dist, axis=1, keepdims=True)


def _pair_d1_kernel(qblk_ref, tblk_ref, tval_ref, d1_ref, *, ft: int,
                    npad: int):
    """Non-prefetch variant of :func:`_band_d1_kernel` for a single
    (query block, target block) pair: grid over query tiles only."""
    q = qblk_ref[...].astype(jnp.bfloat16)                   # [TM, 256]
    for tf in range(ft):
        t = tblk_ref[tf * npad:(tf + 1) * npad, :].astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            q, t, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        dist = (BITS - dots) >> 1
        dist = jnp.where(tval_ref[0, tf * npad:(tf + 1) * npad][None, :]
                         != 0, dist, _BIG)
        d1_ref[:, tf:tf + 1] = jnp.min(dist, axis=1, keepdims=True)


# largest target block (rows x 256 int8 bytes) the fused pair kernels may
# pin in VMEM alongside their transient distance tile
_PAIR_T_BUDGET = 4 * 2 ** 20


def _out_struct(shape, dtype, like):
    """ShapeDtypeStruct for a pallas_call output, inheriting the
    varying-mesh-axes (vma) type of ``like`` — required when the kernel runs
    inside shard_map (e.g. the ring similarity's per-device tiles), where
    check_vma demands explicit output vma."""
    vma = getattr(getattr(like, "aval", None), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def block_pair_counts_fused(signed_q: jax.Array, valid_q: jax.Array,
                            signed_t: jax.Array, valid_t: jax.Array,
                            scale: float = 2.0,
                            interpret: bool = False) -> jax.Array:
    """Drop-in for :func:`..matching.block_pair_counts` ([Fq, N, D] x
    [Ft, N, D] -> [Fq, Ft] good-match counts) with the per-pair distance
    blocks kept in VMEM — the kernel emits only per-query-row NN distances
    per target frame; threshold/count logic runs on that small table in XLA
    (bitwise-identical counts). Callers must keep the target block inside
    ``_PAIR_T_BUDGET`` (the :mod:`..matching` dispatcher checks)."""
    fq, n, d = signed_q.shape
    ft = signed_t.shape[0]
    npad_extra = (-n) % 128
    npad = n + npad_extra
    qf = jnp.pad(signed_q, ((0, 0), (0, npad_extra), (0, 0)))
    tf_ = jnp.pad(signed_t, ((0, 0), (0, npad_extra), (0, 0)))
    vq = jnp.pad(valid_q, ((0, 0), (0, npad_extra)))
    vt = jnp.pad(valid_t, ((0, 0), (0, npad_extra)))
    rows_q = fq * npad
    rows_t = ft * npad
    tile_m = 256 if rows_q % 256 == 0 else 128

    d1 = pl.pallas_call(
        functools.partial(_pair_d1_kernel, ft=ft, npad=npad),
        grid=(rows_q // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda q: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_t, d), lambda q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_t), lambda q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, ft), lambda q: (q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((rows_q, ft), jnp.int32, signed_q),
        interpret=interpret,
    )(qf.reshape(rows_q, d), tf_.reshape(rows_t, d),
      vt.reshape(1, rows_t).astype(jnp.int32))

    # threshold/count finalize — mirrors matching.block_pair_counts exactly
    d1 = d1.reshape(fq, npad, ft).astype(jnp.float32)
    row_ok = vq[:, :, None] & (d1 < jnp.float32(BITS + 1))
    dmin = jnp.min(jnp.where(row_ok, d1, jnp.float32(512.0)), axis=1)
    thr = jnp.maximum(dmin * jnp.float32(scale), jnp.float32(30.0))
    return jnp.sum((row_ok & (d1 < thr[:, None, :])).astype(jnp.int32),
                   axis=1)


@functools.partial(jax.jit, static_argnames=("min_gap", "scale", "block",
                                             "tile_m", "interpret"))
def banded_pair_counts_fused(signed: jax.Array, valid: jax.Array,
                             min_gap: int, scale: float = 2.0,
                             block: int = 8, tile_m: int = 256,
                             interpret: bool = False) -> jax.Array:
    """Drop-in for :func:`..matching.banded_pair_counts` (same [F, F] counts,
    same band, same max(2*min, 30) rule) with the distance blocks kept in
    VMEM: the kernel emits only the [rows, ft] per-row NN distances per band
    tile, and the count/threshold logic runs on that tiny table in XLA.
    HBM traffic drops from ~3 passes over [N, Ft*N] bf16 distances per query
    frame to one [block*npad, block] int32 write per tile."""
    f, n, d = signed.shape
    fpad = (-f) % block
    npad_extra = (-n) % 128
    npad = n + npad_extra
    sp = jnp.pad(signed, ((0, fpad), (0, npad_extra), (0, 0)))
    vp = jnp.pad(valid, ((0, fpad), (0, npad_extra)))
    nb = (f + fpad) // block
    rows = block * npad
    sblocks = sp.reshape(nb, rows, d)
    vblocks = vp.reshape(nb, 1, rows).astype(jnp.int32)

    bpairs = [(qb, tb) for qb in range(nb) for tb in range(nb)
              if tb * block <= qb * block + block - 1 - min_gap]
    if not bpairs:
        return jnp.zeros((f, f), jnp.int32)
    qidx = jnp.asarray([p[0] for p in bpairs], jnp.int32)
    tidx = jnp.asarray([p[1] for p in bpairs], jnp.int32)
    p_cnt = len(bpairs)
    qt = rows // tile_m
    assert rows % tile_m == 0, "tile_m must divide block*npad"

    d1 = pl.pallas_call(
        functools.partial(_band_d1_kernel, ft=block, npad=npad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(p_cnt, qt),
            in_specs=[
                pl.BlockSpec((1, tile_m, d),
                             lambda p, q, qi, ti: (qi[p], q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, d),
                             lambda p, q, qi, ti: (ti[p], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rows),
                             lambda p, q, qi, ti: (ti[p], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_m, block),
                                   lambda p, q, qi, ti: (p, q, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=_out_struct((p_cnt, rows, block), jnp.int32, sblocks),
        interpret=interpret,
    )(qidx, tidx, sblocks, sblocks, vblocks)

    # count/threshold finalize on the tiny d1 table — mirrors
    # matching.block_pair_counts' f32 threshold logic exactly
    d1 = d1.reshape(p_cnt, block, npad, block).astype(jnp.float32)
    qv = vblocks.reshape(nb, block, npad)[qidx]           # [P, block, npad]
    row_ok = (qv != 0)[..., None] & (d1 < jnp.float32(BITS + 1))
    dmin = jnp.min(jnp.where(row_ok, d1, jnp.float32(512.0)),
                   axis=2)                                # [P, block, block]
    thr = jnp.maximum(dmin * jnp.float32(scale), jnp.float32(30.0))
    tiles = jnp.sum((row_ok & (d1 < thr[:, :, None, :])).astype(jnp.int32),
                    axis=2)                               # [P, block, block]

    full = jnp.zeros((nb, nb, block, block), jnp.int32)
    full = full.at[qidx, tidx].set(tiles)
    counts = full.transpose(0, 2, 1, 3).reshape(nb * block, nb * block)
    counts = counts[:f, :f]
    q = jnp.arange(f)[:, None]
    t = jnp.arange(f)[None, :]
    return jnp.where(t <= q - min_gap, counts, 0)


def _band_counts_kernel(qidx_ref, tidx_ref, tblk_ref, qblk_ref, qval_ref,
                        out_ref, mx_scr, *, block: int, npad: int,
                        qchunk: int, scale: float):
    """One QUERY FRAME of band tile ``p`` against the tile's whole
    ``block``-frame target block, with the 2x-min good-match counts
    finalized IN KERNEL — the per-tile output is just a [block, 1] count
    column, so sequence-scale bands (KITTI: ~161k 8-frame tiles) never
    materialize a d1 table in HBM at all.

    Orientation: dots are computed TRANSPOSED ([npad target rows (sublanes),
    qchunk query rows (lanes)]) so the per-target-frame NN reduction lands
    query rows on lanes — where the query validity mask already lives —
    and the reduction keeps raw MXU dots (min distance == max dot; the
    distance transform runs once on the reduced [block, npad] table, not on
    every [npad, qchunk] block, keeping VPU work ~2 passes per block).

    Target-row validity is derived in kernel from the package convention
    that invalid descriptor rows are ZERO in the signed +-1 layout (the
    dispatcher enforces it with one masked multiply); a zero row's dot is 0,
    which must not win the max when every true dot is negative."""
    del qidx_ref, tidx_ref
    f32 = jnp.float32
    for tf_i in range(block):
        t = tblk_ref[0, tf_i * npad:(tf_i + 1) * npad, :].astype(
            jnp.bfloat16)                                     # [npad, d]
        # bf16 max is exact; the compare runs in f32 (Mosaic rejects bf16
        # ordered compares on v5e)
        tvalid = (jnp.max(jnp.abs(t), axis=1, keepdims=True)
                  .astype(f32) > f32(0.0))                    # [npad, 1]
        for qc in range(npad // qchunk):
            qch = qblk_ref[0, qc * qchunk:(qc + 1) * qchunk, :].astype(
                jnp.bfloat16)                                 # [qchunk, d]
            dots = jax.lax.dot_general(
                t, qch, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)           # [npad, qchunk]
            dots = jnp.where(tvalid, dots, f32(-_BIG))
            mx_scr[tf_i:tf_i + 1, qc * qchunk:(qc + 1) * qchunk] = jnp.max(
                dots, axis=0, keepdims=True)
    # finalize — mirrors matching.block_pair_counts' f32 threshold math
    # exactly: d1 = (BITS - max_dot)/2 (exact: dot parity matches BITS);
    # an all-invalid target frame yields d1 ~ 2^29 -> row_ok False, count 0,
    # same as the XLA path's 512-sentinel.
    d1 = (f32(BITS) - mx_scr[0:block, :]) * f32(0.5)          # [block, npad]
    row_ok = (qval_ref[0] != 0) & (d1 < f32(BITS + 1))
    dmin = jnp.min(jnp.where(row_ok, d1, f32(512.0)), axis=1,
                   keepdims=True)                             # [block, 1]
    thr = jnp.maximum(dmin * f32(scale), f32(30.0))
    out_ref[0] = jnp.sum((row_ok & (d1 < thr)).astype(jnp.int32),
                         axis=1, keepdims=True)               # [block, 1]


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def band_count_tiles_fused(sblocks: jax.Array, qvblocks: jax.Array,
                           qidx: jax.Array, tidx: jax.Array,
                           scale: float = 2.0,
                           interpret: bool = False) -> jax.Array:
    """Good-match count tiles for an explicit list of band tiles, with the
    count finalize fused into the kernel: [P] (qidx, tidx) block indices ->
    [P, block, block] count tiles ([query frame, target frame] layout).

    ``sblocks`` is [nb, block*npad, d] signed int8 with INVALID ROWS ZEROED
    (the kernel derives target validity from zero rows); ``qvblocks`` is
    [nb, block, npad] int32 query validity. This is the sequence-scale band
    path (:func:`..matching.banded_pair_counts_chunked` on TPU): unlike
    :func:`banded_pair_counts_fused`, no [P, rows, block] d1 table is ever
    written — at KITTI scale (~161k tiles) that table would be ~42 GB of
    HBM transients per full band."""
    nb, rows, d = sblocks.shape
    block = qvblocks.shape[1]
    npad = rows // block
    p_cnt = qidx.shape[0]
    qchunk = 256 if npad % 256 == 0 else 128
    scr_rows = max(block, 8)
    # Mosaic block-shape rule: the last two dims of every block must be
    # 8/128-divisible or equal to the array dims — so the per-query-frame
    # validity and output ride flattened leading dims indexed qi[p]*block+q.
    qv_flat = qvblocks.reshape(nb * block, 1, npad)

    counts = pl.pallas_call(
        functools.partial(_band_counts_kernel, block=block, npad=npad,
                          qchunk=qchunk, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(p_cnt, block),
            in_specs=[
                pl.BlockSpec((1, rows, d),
                             lambda p, q, qi, ti: (ti[p], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad, d),
                             lambda p, q, qi, ti: (qi[p], q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, npad),
                             lambda p, q, qi, ti: (qi[p] * block + q, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block, 1),
                                   lambda p, q, qi, ti: (p * block + q, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((scr_rows, npad), jnp.float32)],
        ),
        out_shape=_out_struct((p_cnt * block, block, 1), jnp.int32, sblocks),
        interpret=interpret,
    )(qidx, tidx, sblocks, sblocks, qv_flat)
    return counts.reshape(p_cnt, block, block)         # [P, qframe, tframe]


# ---------------------------------------------------------------------------
# fused motion-coherence support kernel (the PROSAC quality statistic)
# ---------------------------------------------------------------------------

def _support_kernel(q_ref, t_ref, mask_ref, rt_ref, s_ref):
    """Query tile [TM, 4] of (x, y, dx, dy) vs the full transposed match set
    [4, N]: counts, per query match, the matches within ``radius`` whose
    displacement agrees within ``tau`` — two broadcasted squared-distance
    blocks in VMEM (the XLA path materializes both [N, N] blocks in HBM).
    rt_ref is [1, 2] = (radius^2, tau^2)."""
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qdx = q_ref[:, 2:3]
    qdy = q_ref[:, 3:4]
    tx = t_ref[0:1, :]
    ty = t_ref[1:2, :]
    tdx = t_ref[2:3, :]
    tdy = t_ref[3:4, :]
    r2 = rt_ref[0, 0]
    t2 = rt_ref[0, 1]
    near = ((qx - tx) ** 2 + (qy - ty) ** 2) < r2          # [TM, N]
    agree = ((qdx - tdx) ** 2 + (qdy - tdy) ** 2) < t2
    ok = near & agree & (mask_ref[...] != 0)
    s_ref[...] = jnp.sum(ok.astype(jnp.int32), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def motion_support_pallas(xy_q: jax.Array, xy_t_matched: jax.Array,
                          mask: jax.Array, radius, tau,
                          tile_m: int = 512, interpret: bool = False):
    """Drop-in for matching.motion_support (same semantics incl. the
    self-support exclusion); radius/tau may be traced scalars."""
    n = xy_q.shape[0]
    disp = xy_q - xy_t_matched
    q = jnp.concatenate([xy_q, disp], axis=1).astype(jnp.float32)  # [N, 4]
    m_pad = (-n) % tile_m
    n_pad = (-n) % 128
    qp = jnp.pad(q, ((0, m_pad), (0, 0)))
    tp = jnp.pad(q.T, ((0, 0), (0, n_pad)))                        # [4, NP]
    maskp = jnp.pad(mask.astype(jnp.int32), (0, n_pad))[None, :]
    rt = jnp.stack([jnp.square(jnp.asarray(radius, jnp.float32)),
                    jnp.square(jnp.asarray(tau, jnp.float32))]).reshape(1, 2)
    mp, np_ = n + m_pad, n + n_pad

    s = pl.pallas_call(
        _support_kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((mp, 1), jnp.int32, qp),
        interpret=interpret,
    )(qp, tp, maskp, rt)
    # exclude self-support so padding/isolated matches score 0 (the XLA
    # path's `- mask` term; invalid rows sum to... their own row counts are
    # masked by mask_j only, so zero them explicitly like the XLA path)
    return jnp.where(mask, s[:n, 0] - 1, 0)


# ---------------------------------------------------------------------------
# fused FAST-9 score + NMS kernel
# ---------------------------------------------------------------------------

from slam_loop_closing_tpu.ops.fast import CIRCLE  # noqa: E402


_PAD = 8  # halo padding; 8 keeps every dynamic row start sublane-aligned
# column-chunk area budget for the FAST kernel: one chunk's ~32 live
# tile-width intermediates at this size fit the 16 MB VMEM stack with room
# for the block scratch + output windows (tile 32 x 1920 was the largest
# unchunked tile that compiled; chunk count rounds UP — 128 x 1600 floored
# to 3 chunks measured 17.4 MB and OOMed)
_FAST_CHUNK_AREA = 32 * 1920


def _fast_auto_tile(h: int) -> int:
    """Default FAST tile height: large tiles amortize the ~13 us fixed cost
    per grid step (measured at 1080p: tile 32 -> 128 is 0.50 -> 0.37 ms per
    frame), capped by the image height for small pyramid levels."""
    return min(128, -(-h // 8) * 8)


def _fast_kernel(img_hbm, *refs, threshold: float, h: int, w: int,
                 tile_h: int, batched: bool, blur_taps: tuple = ()):
    """Row-tiled fused FAST-9 score + 3x3 NMS (+ optional descriptor blur).
    The padded image stays in HBM; each grid step DMAs ONE 8-aligned
    [TH+16, W+16] block into VMEM scratch (whole-image VMEM residency blows
    the 16 MB budget once the call is batched over frames) and takes the 16
    ring-shifted views as static in-register slices. Tiling bounds live
    margin buffers to O(TH x W).

    The corner score is computed from sliding-window extrema of the RING
    values, not per-offset margins: for a window W of the circle,
    ``min_{i in W}(ring_i - center - t) = (min_{i in W} ring_i) - center - t``
    and ``min_{i in W}(center - ring_i - t) = center - t - max_{i in W}
    ring_i``, so one shared sliding min9/max9 over the 16 ring buffers
    (computed by doubling: 2 -> 4 -> 8 -> 9) replaces the 2 x 16 x 9
    per-margin min trees — ~2x fewer VPU ops for identical scores.

    ``blur_taps`` non-empty adds a second output: the separable Gaussian
    blur of the tile (vertical then horizontal, identical tap order to
    ``image.gaussian_blur``), computed from the same VMEM block — the ORB
    descriptor prefilter for free while the band is resident. Matches the
    XLA blur bitwise except within ``radius`` pixels of the image border
    (zero vs reflect padding), a region the descriptor patches never read
    (detector ``border`` is 19 >> radius).

    ``batched``: leading frame axis in the grid (pallas_call over ANY-space
    inputs cannot be vmapped, so batching is a grid dimension here)."""
    if blur_taps:
        score_ref, blur_ref, block_ref, sem = refs
    else:
        score_ref, block_ref, sem = refs
    if batched:
        b = pl.program_id(0)
        i = pl.program_id(1)
        nt = pl.num_programs(1)
        step = b * nt + i
        total = pl.num_programs(0) * nt
    else:
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        step = i
        total = nt
    row0 = i * tile_h          # multiple of tile_h (itself a multiple of 8)
    the = tile_h + 2           # one extra row each side for the NMS halo
    we = w + 2

    # Double-buffered block DMA: grid step s computes from slot s%2 and
    # prefetches step s+1's aligned superset block (padded rows
    # [row0, row0 + tile_h + 16) cover unpadded [row0 - 8, row0 + tile_h
    # + 8)) into the other slot — the copy rides out ahead of the ~10 us
    # of VPU work per tile instead of serializing in front of it.
    def start(si):
        sl = jax.lax.rem(si, 2)
        if batched:
            srcb = img_hbm.at[jax.lax.div(si, nt)]
            r0 = jax.lax.rem(si, nt) * tile_h
        else:
            srcb = img_hbm
            r0 = si * tile_h
        pltpu.make_async_copy(srcb.at[pl.ds(r0, tile_h + 16), :],
                              block_ref.at[sl], sem.at[sl]).start()

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start(step)

    @pl.when(step + 1 < total)
    def _():
        start(step + 1)

    src0 = img_hbm.at[0] if batched else img_hbm
    pltpu.make_async_copy(src0.at[pl.ds(0, tile_h + 16), :],
                          block_ref.at[slot], sem.at[slot]).wait()
    # bf16 compute: halves the VMEM footprint of the live ring/window
    # buffers and doubles VPU throughput; score precision ~3 decimal digits
    # is ample for corner ranking (pixel values are 8-bit to begin with).
    block = block_ref[slot]
    bb = block.astype(jnp.bfloat16)

    # The per-grid-step fixed cost (~13 us measured: scalar setup + the
    # pipeline bubble around the block DMA) dominates this kernel at small
    # tiles, so throughput wants tile_h LARGE — but the ~32 live tile-width
    # intermediates of the margin trees bound tile_h by the 16 MB VMEM
    # stack (tile_h=48 already OOMed). Splitting the COLUMNS into chunks
    # (each with its own 4-px halo) keeps liveness ~constant while tile_h
    # grows: values are identical (slicing commutes with elementwise ops).
    n_chunks = max(1, -(-(tile_h * w) // _FAST_CHUNK_AREA))
    cw = -(-w // n_chunks)             # output columns per chunk

    def compute_chunk(c0, cw_c):
        cwe = cw_c + 2                 # +1 col each side for the NMS halo

        def shifted(dy, dx):
            # unpadded (row0 - 1 + dy + k, c0 - 1 + dx + j) -> block
            # (7 + dy + k, _PAD - 1 + dx + c0 + j); all offsets static.
            return bb[7 + dy: 7 + dy + the,
                      _PAD - 1 + dx + c0: _PAD - 1 + dx + c0 + cwe]

        center = shifted(0, 0)
        ring = [shifted(dy, dx) for dy, dx in CIRCLE]

        def fold_slide9(op, fold):
            # fold over all 16 circular length-9 window reductions of the
            # ring, van Herk/Gil-Werman style over the 24-extended sequence
            # in blocks of 9: window(k) = op(suffix(k -> block end),
            # prefix(block start -> k+8)). min/max are exact lattice ops,
            # so any association order is bitwise-identical to the doubling
            # tree this replaces — at ~59 ops/tree instead of 77, keeping
            # only the 16 block suffixes live (the doubling tree's ~77
            # tile-sized live intermediates were the VMEM-stack bound).
            e = lambda i: ring[i % 16]
            sm = [None] * 16
            s = e(8)                   # block B0 = ext[0..8]
            sm[8] = s
            for i in range(7, -1, -1):
                s = op(e(i), s)
                sm[i] = s
            s = e(17)                  # block B1 = ext[9..17]
            for i in range(16, 8, -1):
                s = op(e(i), s)
                if i <= 15:
                    sm[i] = s
            best = sm[0]               # win(0): prefix(B0 -> 8) == sm[0]
            p = e(9)                   # B1 prefixes serve win(1..9)
            best = fold(best, op(sm[1], p))
            for j in range(10, 18):
                p = op(p, e(j))
                best = fold(best, op(sm[j - 8], p))
            p = e(18)                  # B2 = ext[18..], serves win(10..15)
            best = fold(best, op(sm[10], p))
            for j in range(19, 24):
                p = op(p, e(j))
                best = fold(best, op(sm[j - 8], p))
            return best

        # brightest-arc margin: max over windows of the window-min
        best_min = fold_slide9(jnp.minimum, jnp.maximum)
        # darkest-arc margin: min over windows of the window-max
        worst_max = fold_slide9(jnp.maximum, jnp.minimum)
        score = jnp.maximum(best_min - center, center - worst_max) - threshold
        score = jnp.maximum(score, 0.0)
        # zero outside the global 3-px interior (ring reads zero padding)
        ys = jax.lax.broadcasted_iota(jnp.int32, (the, cwe), 0) + row0 - 1
        xs = jax.lax.broadcasted_iota(jnp.int32, (the, cwe), 1) + c0 - 1
        interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
        # f32 for the NMS compare: Mosaic's v5e lowering rejects bf16 >=
        score = jnp.where(interior, score,
                          jnp.bfloat16(0.0)).astype(jnp.float32)

        # fused 3x3 NMS: static slices of the extended chunk (no rolls —
        # the 1-px halo provides every neighbor)
        local_max = None
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                s = score[dy:dy + tile_h, dx:dx + cw_c]
                local_max = (s if local_max is None
                             else jnp.maximum(local_max, s))
        ctr = score[1:1 + tile_h, 1:1 + cw_c]
        out = jnp.where(ctr >= local_max, ctr, 0.0)
        if batched:
            score_ref[0, :, c0:c0 + cw_c] = out
        else:
            score_ref[:, c0:c0 + cw_c] = out

        if blur_taps:
            # separable blur in f32, identical tap order to
            # image.gaussian_blur: vertical over block rows
            # [row0 - r, row0 + tile_h + r), then horizontal.
            r = (len(blur_taps) - 1) // 2
            v = blur_taps[0] * block[8 - r: 8 - r + tile_h,
                                     _PAD - r + c0: _PAD + c0 + cw_c + r]
            for j in range(1, 2 * r + 1):
                v = v + blur_taps[j] * block[8 - r + j: 8 - r + j + tile_h,
                                             _PAD - r + c0:
                                             _PAD + c0 + cw_c + r]
            bl = blur_taps[0] * v[:, 0:cw_c]
            for j in range(1, 2 * r + 1):
                bl = bl + blur_taps[j] * v[:, j:j + cw_c]
            if batched:
                blur_ref[0, :, c0:c0 + cw_c] = bl
            else:
                blur_ref[:, c0:c0 + cw_c] = bl

    for c in range(n_chunks):
        c0 = c * cw
        compute_chunk(c0, min(cw, w - c0))


def _fast_call_single(img, threshold, tile_h, interpret, blur_taps=()):
    h, w = img.shape
    hp = (-h) % tile_h
    # DMA slices must be 128-lane aligned: pad the width up to a multiple.
    wp_extra = (-(w + 2 * _PAD)) % 128
    padded = jnp.pad(img, ((_PAD, _PAD + hp), (_PAD, _PAD + wp_extra)))
    n_out = 2 if blur_taps else 1
    out = pl.pallas_call(
        functools.partial(_fast_kernel, threshold=threshold, h=h, w=w,
                          tile_h=tile_h, batched=False, blur_taps=blur_taps),
        grid=((h + hp) // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[_out_struct((h + hp, w), img.dtype, img)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 16, w + 2 * _PAD + wp_extra), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded)
    return tuple(o[:h] for o in out)


def _fast_call_batched(imgs, threshold, tile_h, interpret, blur_taps=()):
    b, h, w = imgs.shape
    hp = (-h) % tile_h
    wp_extra = (-(w + 2 * _PAD)) % 128
    padded = jnp.pad(imgs, ((0, 0), (_PAD, _PAD + hp),
                            (_PAD, _PAD + wp_extra)))
    n_out = 2 if blur_taps else 1
    out = pl.pallas_call(
        functools.partial(_fast_kernel, threshold=threshold, h=h, w=w,
                          tile_h=tile_h, batched=True, blur_taps=blur_taps),
        grid=(b, (h + hp) // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((1, tile_h, w), lambda bi, i: (bi, i, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[_out_struct((b, h + hp, w), imgs.dtype, imgs)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 16, w + 2 * _PAD + wp_extra), imgs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded)
    return tuple(o[:, :h] for o in out)


@functools.partial(jax.jit, static_argnames=("threshold", "tile_h",
                                             "interpret"))
def fast_score_nms(img: jax.Array, threshold: float = 20.0 / 255.0,
                   tile_h: int | None = None,
                   interpret: bool = False) -> jax.Array:
    """Fused FAST-9 score + 3x3 NMS, [H, W] -> [H, W], row-tiled.

    vmap-safe: pallas_call over an ANY-memory-space input cannot be vmapped,
    so a custom batching rule reroutes vmap to a grid-batched kernel."""
    if tile_h is None:
        tile_h = _fast_auto_tile(img.shape[-2])
    assert tile_h % 8 == 0, "tile_h must be sublane-aligned"

    @jax.custom_batching.custom_vmap
    def run(x):
        return _fast_call_single(x, threshold, tile_h, interpret)[0]

    @run.def_vmap
    def _rule(axis_size, in_batched, xs):
        del axis_size
        return _fast_call_batched(xs, threshold, tile_h, interpret)[0], True

    return run(img)


@functools.partial(jax.jit, static_argnames=("threshold", "blur_sigma",
                                             "blur_radius", "tile_h",
                                             "interpret"))
def fast_score_nms_blur(img: jax.Array, threshold: float = 20.0 / 255.0,
                        blur_sigma: float = 2.0, blur_radius: int = 3,
                        tile_h: int | None = None, interpret: bool = False):
    """Fused FAST-9 score + 3x3 NMS + descriptor-prefilter Gaussian blur:
    [H, W] -> (score_nms [H, W], blurred [H, W]) in ONE pass over the image
    band — the blur rides the VMEM residency the corner scorer already pays
    for, replacing a separate full-image blur dispatch in the ORB front-end
    (``orb._detect_level``). The blurred output matches
    ``image.gaussian_blur(img, blur_sigma, blur_radius)`` bitwise except
    within ``blur_radius`` px of the image border (zero vs reflect padding —
    outside the region descriptor patches can read)."""
    if tile_h is None:
        tile_h = _fast_auto_tile(img.shape[-2])
    assert tile_h % 8 == 0, "tile_h must be sublane-aligned"
    assert blur_radius <= _PAD - 1, "blur halo exceeds the DMA block halo"
    taps = tuple(float(v) for v in _blur_taps_f32(blur_sigma, blur_radius))

    @jax.custom_batching.custom_vmap
    def run(x):
        return _fast_call_single(x, threshold, tile_h, interpret, taps)

    @run.def_vmap
    def _rule(axis_size, in_batched, xs):
        del axis_size
        return (_fast_call_batched(xs, threshold, tile_h, interpret, taps),
                (True, True))

    return run(img)


def _blur_taps_f32(sigma: float, radius: int):
    """1-D Gaussian taps as host floats, evaluated through the SAME
    ``image.gaussian_kernel1d`` the XLA blur uses (np.exp and jnp's exp can
    differ by 1 ulp, which would break the bitwise interior-parity
    contract)."""
    import numpy as np

    from slam_loop_closing_tpu.ops import image as image_ops

    # may be reached under an outer jit trace (fast_score_nms_blur is
    # jitted); force eager evaluation so the taps become host constants
    with jax.ensure_compile_time_eval():
        return np.asarray(image_ops.gaussian_kernel1d(sigma, radius))


# ---------------------------------------------------------------------------
# patch gather: pipelined aligned DMAs (the ORB front-end's dominant stage)
# ---------------------------------------------------------------------------

_P32 = 32          # patch side (orb.PATCH)
_PCENTER = 15      # nominal center offset (orb._PC)
# window sizes derive from the patch side: _patch_win_h / _patch_win_w
# (8-aligned rows / 128-aligned lanes covering any patch-sized span)
_RING = 16         # in-flight DMA depth (16 x 40 KB windows = 640 KB VMEM;
                   # measured faster than 8 — the per-DMA issue+complete
                   # latency is the bound, not HBM bandwidth)


def _patch_kernel(pk_ref, img_hbm, out_ref, win_ref, sem, *,
                  chunk: int, total: int, batched: bool,
                  patch: int = _P32):
    """Gather one [32, 32] patch per keypoint via a ring of ``_RING``
    outstanding aligned DMAs.

    XLA lowers vmapped ``dynamic_slice`` gathers to one serialized DMA per
    slice with the full issue+completion latency exposed (~2.2 us/keypoint
    measured on v5e — flat in the slice's shape, dtype, and element count,
    so packing tricks don't touch it). Here each keypoint DMAs its aligned
    [40, 256] superset window HBM->VMEM with the latency hidden ``_RING``
    deep, then fixes up the sub-tile offset in-register: a dynamic-sublane
    read for the row offset and a lane roll for the column offset.

    Window origins + in-window offsets arrive bit-packed one int32 per
    keypoint via scalar prefetch (see :func:`_patch_offsets`); SMEM holds
    the whole batch's table at once (1 MB budget — callers split very
    large batches, see :func:`_patch_call_batched`)."""
    if batched:
        b = pl.program_id(0)
        c = pl.program_id(1)
        src = img_hbm.at[b]
        kbase = b * total + c * chunk
    else:
        src = img_hbm
        kbase = pl.program_id(0) * chunk

    win_h = _patch_win_h(patch)
    win_w = _patch_win_w(patch)

    def start(j):
        slot = jax.lax.rem(j, _RING)
        p = pk_ref[kbase + j]
        yq = pl.multiple_of((p >> 17) * 8, 8)
        xq = pl.multiple_of(((p >> 7) & 0x7f) * 128, 128)
        pltpu.make_async_copy(
            src.at[pl.ds(yq, win_h), pl.ds(xq, win_w)],
            win_ref.at[slot], sem.at[slot]).start()

    for j in range(min(_RING, chunk)):
        start(j)

    def body(j, _):
        slot = jax.lax.rem(j, _RING)
        pltpu.make_async_copy(src.at[pl.ds(0, win_h), pl.ds(0, win_w)],
                              win_ref.at[slot], sem.at[slot]).wait()
        # offset fixup by circular shifts (Mosaic cannot prove dynamic
        # sublane starts 8-aligned, so reads with pl.ds(dy, .) are out;
        # rolls take dynamic non-negative shifts on both axes)
        p = pk_ref[kbase + j]
        dy = (p >> 14) & 0x7
        dx = p & 0x7f
        win = win_ref[slot]                               # [win_h, win_w]
        rows = pltpu.roll(win, (win_h - dy) % win_h, axis=0)
        rolled = pltpu.roll(rows, (win_w - dx) % win_w, axis=1)
        if batched:
            out_ref[0, j, :, :] = rolled[:patch, :patch]
        else:
            out_ref[j, :, :] = rolled[:patch, :patch]

        @pl.when(j + _RING < chunk)
        def _():
            start(j + _RING)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _patch_win_h(patch: int) -> int:
    """Window rows: the 8-aligned superset of any ``patch``-row span."""
    return patch + 8


def _patch_win_w(patch: int) -> int:
    """Window lanes: the 128-aligned superset of any ``patch``-col span."""
    return 128 * (1 + -(-patch // 128))


def _patch_offsets(xy, h, w, kp, patch=_P32, center=_PCENTER):
    """Aligned window origin + in-window offset for each keypoint, packed
    into one int32 `[y0/8 : dy(3) : x0/128(7) : dx(7)]` (good to 64k-row,
    16k-col images), padded to ``kp`` entries (padding gathers window 0 —
    garbage patches for slots the caller's validity mask already
    excludes)."""
    xi = xy[:, 0].astype(jnp.int32)
    yi = xy[:, 1].astype(jnp.int32)
    x0 = jnp.clip(xi - center, 0, w - patch)
    y0 = jnp.clip(yi - center, 0, h - patch)
    xa = x0 >> 7
    ya = y0 >> 3
    packed = (ya << 17) | ((y0 - (ya << 3)) << 14) | (xa << 7) \
        | (x0 - (xa << 7))
    return jnp.pad(packed, ((0, kp - xy.shape[0]),))


def _patch_pad_image(img, h, w, patch=_P32):
    hp = -(-(h + 8) // 8) * 8                # y0a + win_h <= hp
    wp = ((w - patch) // 128 + 2) * 128      # x0a + win_w <= wp
    return jnp.pad(img, ((0, hp - h), (0, wp - w)))


def _patch_call_single(img, xy, chunk, interpret, patch=_P32,
                       center=_PCENTER):
    h, w = img.shape
    k = xy.shape[0]
    kp = -(-k // chunk) * chunk
    packed = _patch_offsets(xy, h, w, kp, patch, center)
    out = pl.pallas_call(
        functools.partial(_patch_kernel, chunk=chunk, total=kp,
                          batched=False, patch=patch),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kp // chunk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((chunk, patch, patch),
                                   lambda c, *refs: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_RING, _patch_win_h(patch),
                            _patch_win_w(patch)), img.dtype),
                pltpu.SemaphoreType.DMA((_RING,)),
            ]),
        out_shape=_out_struct((kp, patch, patch), img.dtype, img),
        interpret=interpret,
    )(packed, _patch_pad_image(img, h, w, patch))
    return out[:k]


# largest packed-offset table one pallas_call may pin in SMEM (1 MB budget;
# leave headroom for grid bookkeeping). 128k keypoints = 512 KB.
_SMEM_KP_BUDGET = 128 * 1024


def _patch_call_batched(imgs, xys, chunk, interpret, patch=_P32,
                        center=_PCENTER):
    b, h, w = imgs.shape
    k = xys.shape[1]
    kp = -(-k // chunk) * chunk
    padded = jax.vmap(lambda im: _patch_pad_image(im, h, w, patch))(imgs)
    packed = jax.vmap(
        lambda xy: _patch_offsets(xy, h, w, kp, patch, center))(xys)

    def call(pk, ims):
        gb = ims.shape[0]
        return pl.pallas_call(
            functools.partial(_patch_kernel, chunk=chunk, total=kp,
                              batched=True, patch=patch),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(gb, kp // chunk),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, chunk, patch, patch),
                                       lambda bi, c, *refs: (bi, c, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((_RING, _patch_win_h(patch),
                                _patch_win_w(patch)), ims.dtype),
                    pltpu.SemaphoreType.DMA((_RING,)),
                ]),
            out_shape=_out_struct((gb, kp, patch, patch), ims.dtype, ims),
            interpret=interpret,
        )(pk.reshape(-1), ims)

    group = max(1, _SMEM_KP_BUDGET // kp)
    if b <= group:
        out = call(packed, padded)
    else:  # split the batch so each call's SMEM table stays in budget
        parts = [call(packed[s:s + group], padded[s:s + group])
                 for s in range(0, b, group)]
        out = jnp.concatenate(parts, axis=0)
    return out[:, :k]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret", "patch",
                                             "center"))
def extract_patches_pallas(img: jax.Array, xy: jax.Array, chunk: int = 128,
                           interpret: bool = False, patch: int = _P32,
                           center: int = _PCENTER) -> jax.Array:
    """[K, patch, patch] patches (keypoint at the nominal (center, center))
    gathered from integer keypoint positions — value-identical to
    :func:`slam_loop_closing_tpu.ops.orb.extract_patches` for interior
    keypoints at the 32/15 defaults, and to
    :func:`slam_loop_closing_tpu.ops.sift._extract_grad_patches`' slices at
    40/19, ~4-8x faster on v5e (DMA latency hidden _RING deep instead of
    exposed per keypoint as with vmapped dynamic_slice).

    vmap-safe via a grid-batched variant (pallas_call over ANY-space
    inputs cannot be vmapped)."""

    @jax.custom_batching.custom_vmap
    def run(im, pts):
        return _patch_call_single(im, pts, chunk, interpret, patch, center)

    @run.def_vmap
    def _rule(axis_size, in_batched, ims, ptss):
        del axis_size, in_batched
        return _patch_call_batched(ims, ptss, chunk, interpret, patch,
                                   center), True

    return run(img, xy)


# ---------------------------------------------------------------------------
# fused Gaussian stack: a whole SIFT octave's blur chain in one VMEM pass
# ---------------------------------------------------------------------------

def _gauss_weights(sigmas: tuple[float, ...]):
    """Per-level 1-D kernel taps as PYTHON floats (compile-time constants in
    the kernel body; jnp arrays would be captured as pallas consts). Mirrors
    :func:`..image.gaussian_kernel1d` (float32 throughout)."""
    import numpy as np

    out = []
    for sig in sigmas:
        r = max(1, int(3.0 * sig + 0.5))
        x = np.arange(-r, r + 1, dtype=np.float32)
        k = np.exp((-0.5 * (x / np.float32(sig)) ** 2).astype(np.float32))
        k = (k / k.sum()).astype(np.float32)
        out.append(tuple(float(v) for v in k))
    return tuple(out)


def _gauss_stack_kernel(img_hbm, *refs, kernels, rv, lpad, tile_h, w, wp,
                        batched):
    """One row-band of the incremental blur chain, fully in VMEM.

    The band (+ cumulative halo ``rv`` on each side) is DMA'd in once; each
    level's vertical pass uses static sublane slices (the valid region
    shrinks by the level radius), the horizontal pass uses lane rolls whose
    wraparound lands in the ``lpad``-wide horizontal halo that the reflect
    prepad provides; the band's clean center is written per level. HBM
    traffic: 1 read + num_levels writes of the band, vs 4 full-image passes
    per level (pad copy + write per axis) for the chained XLA blurs."""
    *out_refs, win_ref, sem = refs
    if batched:
        bi = pl.program_id(0)
        i = pl.program_id(1)
        src = img_hbm.at[bi, pl.ds(i * tile_h, tile_h + 2 * rv), :]
    else:
        i = pl.program_id(0)
        src = img_hbm.at[pl.ds(i * tile_h, tile_h + 2 * rv), :]
    copy = pltpu.make_async_copy(src, win_ref, sem)
    copy.start()
    copy.wait()
    cur = win_ref[...]
    consumed = 0
    for lvl, taps in enumerate(kernels):
        r = (len(taps) - 1) // 2
        hl = cur.shape[0] - 2 * r
        nxt = taps[0] * cur[0:hl]
        for j in range(1, 2 * r + 1):
            nxt = nxt + taps[j] * cur[j:j + hl]
        acc = taps[0] * pltpu.roll(nxt, r % wp, axis=1)
        for j in range(1, 2 * r + 1):
            acc = acc + taps[j] * pltpu.roll(nxt, (wp + r - j) % wp, axis=1)
        cur = acc
        consumed += r
        ctr = rv - consumed
        band = cur[ctr:ctr + tile_h, lpad:lpad + w]
        if batched:
            out_refs[lvl][0] = band
        else:
            out_refs[lvl][...] = band


def _gauss_prepad(img, rv, lpad, tile_h, h):
    hp = (-h) % tile_h
    w = img.shape[-1]
    wtail = (-(w + 2 * lpad)) % 128
    nb = ((0, 0),) * (img.ndim - 2)
    p = jnp.pad(img, nb + ((rv, rv), (rv, rv)), mode="reflect")
    return jnp.pad(p, nb + ((0, hp), (lpad - rv, lpad - rv + wtail)))


def gauss_stack_halo(sigmas: tuple[float, ...]) -> int:
    """Reflect-pad halo (rows/cols each side) the fused stack kernel needs;
    images must be strictly larger than this in both dimensions."""
    raw = sum((len(t) - 1) // 2 for t in _gauss_weights(sigmas))
    return -(-raw // 4) * 4


def _gauss_call(img, sigmas, tile_h, interpret):
    batched = img.ndim == 3
    h, w = img.shape[-2:]
    kernels = _gauss_weights(sigmas)
    rv = gauss_stack_halo(sigmas)  # 2*rv mult of 8: DMA rows stay aligned
    assert rv < min(h, w), "halo exceeds image (octave too small for pallas)"
    lpad = -(-rv // 128) * 128  # 128-aligned horizontal halo
    padded = _gauss_prepad(img.astype(jnp.float32), rv, lpad, tile_h, h)
    wp = padded.shape[-1]
    hq = padded.shape[-2] - 2 * rv  # h rounded up to tile_h
    tiles = hq // tile_h
    n_lvl = len(kernels)
    kern = functools.partial(
        _gauss_stack_kernel, kernels=kernels, rv=rv, lpad=lpad,
        tile_h=tile_h, w=w, wp=wp, batched=batched)
    if batched:
        b = img.shape[0]
        grid = (b, tiles)
        out_specs = [pl.BlockSpec((1, tile_h, w), lambda bi, i: (bi, i, 0),
                                  memory_space=pltpu.VMEM)] * n_lvl
        out_shape = [_out_struct((b, hq, w), jnp.float32, img)] * n_lvl
    else:
        grid = (tiles,)
        out_specs = [pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)] * n_lvl
        out_shape = [_out_struct((hq, w), jnp.float32, img)] * n_lvl
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * rv, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    outs = [o[..., :h, :] for o in outs]
    return jnp.stack(outs, axis=-3)


@functools.partial(jax.jit, static_argnames=("sigmas", "tile_h", "interpret"))
def gauss_stack_pallas(img: jax.Array, sigmas: tuple[float, ...],
                       tile_h: int = 64, interpret: bool = False) -> jax.Array:
    """Incremental Gaussian blur chain [H, W] -> [num_levels, H, W]: level 0
    is blur(img, sigmas[0]), level l is blur(level l-1, sigmas[l]) — the
    SIFT octave stack (``sift._gaussian_stack``), fused so intermediate
    levels never round-trip HBM. Matches the chained
    :func:`..image.gaussian_blur` to float tolerance (identical taps and
    accumulation order in the interior; the once-reflected border is
    symmetric under symmetric kernels, so boundary values agree too, up to
    tap-order rounding).

    vmap-safe via a grid-batched variant (pallas_call over ANY-space inputs
    cannot be vmapped)."""
    assert tile_h % 8 == 0, "tile_h must be sublane-aligned"

    @jax.custom_batching.custom_vmap
    def run(x):
        return _gauss_call(x, sigmas, tile_h, interpret)

    @run.def_vmap
    def _rule(axis_size, in_batched, xs):
        del axis_size, in_batched
        return _gauss_call(xs, sigmas, tile_h, interpret), True

    return run(img)


# ---------------------------------------------------------------------------
# fused Gaussian stack + DoG extrema/gates (SIFT detector front half)
# ---------------------------------------------------------------------------

_RESP_MARGIN = 2  # spatial stencil radius of the gates (edge gate = double
                  # central difference); the extrema need only 1


def _gauss_stack_resp_kernel(img_hbm, *refs, kernels, rv, lpad, tile_h, w,
                             wp, batched, n_inner, thr_c, edge_r, border, h):
    """The blur chain of :func:`_gauss_stack_kernel` PLUS, while each DoG
    plane is still VMEM-resident, the 26-neighbor extremum test and the
    contrast/edge/border gates of ``sift._detect_octave`` — the XLA path
    re-streams the [S+2, H, W] DoG stack through HBM several times for
    these (measured ~3.4 ms/frame at a 1080p octave; docs/PERFORMANCE.md
    round-3 headroom list). Emits the Gaussian levels (bitwise-identical to
    the plain stack kernel) and one gated |DoG| response plane per interior
    scale.

    Gate arithmetic replicates ``sift._extrema_response`` /
    ``sift._edge_mask`` exactly (min/max trees, 0.5-scaled central
    differences — all exact f32 ops), so interior responses are
    bitwise-identical to the XLA path; image borders differ (reflect halo
    here vs one-sided jnp.gradient stencils there) only inside the
    ``border``-pixel frame both paths zero out."""
    *out_refs, win_ref, sem = refs
    n_lvl = len(kernels)
    lvl_refs = out_refs[:n_lvl]
    resp_refs = out_refs[n_lvl:]
    if batched:
        i = pl.program_id(1)
        src = img_hbm.at[pl.program_id(0),
                         pl.ds(i * tile_h, tile_h + 2 * rv), :]
    else:
        i = pl.program_id(0)
        src = img_hbm.at[pl.ds(i * tile_h, tile_h + 2 * rv), :]
    copy = pltpu.make_async_copy(src, win_ref, sem)
    copy.start()
    copy.wait()

    th = tile_h
    m = _RESP_MARGIN

    def shift_l(x):   # value at lane j+1
        return pltpu.roll(x, wp - 1, axis=1)

    def shift_r(x):   # value at lane j-1
        return pltpu.roll(x, 1, axis=1)

    # interior (border-frame) mask of this tile's [th, w] output band
    ry = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0) + i * tile_h
    rx = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)
    interior = ((ry >= border) & (ry < h - border)
                & (rx >= border) & (rx < w - border))

    bands = {}   # gauss level -> [th + 2m, wp] band (freed once differenced)
    dogs = {}    # dog plane   -> [th + 2m, wp]
    row3 = {}    # dog plane   -> (sliding x-max3, x-min3)

    def gate_plane(li):
        """Emit gated response for interior dog plane ``li`` (1..n_inner)."""
        x = dogs[li]
        for p in (li - 1, li, li + 1):
            if p not in row3:
                xp = dogs[p]
                row3[p] = (
                    jnp.maximum(jnp.maximum(shift_r(xp), xp), shift_l(xp)),
                    jnp.minimum(jnp.minimum(shift_r(xp), xp), shift_l(xp)))
        nb = []
        for sel, op in ((0, jnp.maximum), (1, jnp.minimum)):
            f9m = op(op(row3[li - 1][sel][0:th + 2],
                        row3[li - 1][sel][1:th + 3]),
                     row3[li - 1][sel][2:th + 4])
            f9p = op(op(row3[li + 1][sel][0:th + 2],
                        row3[li + 1][sel][1:th + 3]),
                     row3[li + 1][sel][2:th + 4])
            excl = op(op(row3[li][sel][0:th + 2], row3[li][sel][2:th + 4]),
                      op(shift_r(x), shift_l(x))[1:th + 3])
            nb.append(op(op(f9m, f9p), excl))
        inner = x[1:th + 3]
        a = jnp.abs(inner)
        is_ext = (inner > nb[0]) | (inner < nb[1])
        resp = jnp.where(is_ext & (a >= thr_c), a, 0.0)
        # edge gate (sift._edge_mask): principal-curvature ratio test from
        # double 0.5-scaled central differences, valid on the center rows
        gyv = (x[2:th + 4] - x[0:th + 2]) * 0.5          # rows 1..th+2
        gyy = (gyv[2:th + 2] - gyv[0:th]) * 0.5          # rows 2..th+1
        gxf = (shift_l(x) - shift_r(x)) * 0.5
        gxx = ((shift_l(gxf) - shift_r(gxf)) * 0.5)[2:th + 2]
        gxy = (gxf[3:th + 3] - gxf[1:th + 1]) * 0.5
        tr = gxx + gyy
        det = gxx * gyy - gxy * gxy
        ok = (det > 0) & (tr * tr * edge_r < (edge_r + 1.0) ** 2 * det)
        out = jnp.where(ok, resp[1:th + 1], 0.0)[:, lpad:lpad + w]
        out = jnp.where(interior, out, 0.0)
        if batched:
            resp_refs[li - 1][0] = out
        else:
            resp_refs[li - 1][...] = out

    cur = win_ref[...]
    consumed = 0
    for lvl, taps in enumerate(kernels):
        r = (len(taps) - 1) // 2
        hl = cur.shape[0] - 2 * r
        nxt = taps[0] * cur[0:hl]
        for j in range(1, 2 * r + 1):
            nxt = nxt + taps[j] * cur[j:j + hl]
        acc = taps[0] * pltpu.roll(nxt, r % wp, axis=1)
        for j in range(1, 2 * r + 1):
            acc = acc + taps[j] * pltpu.roll(nxt, (wp + r - j) % wp, axis=1)
        cur = acc
        consumed += r
        ctr = rv - consumed   # >= 2m by the +4 halo extension in the caller
        band = cur[ctr:ctr + tile_h, lpad:lpad + w]
        if batched:
            lvl_refs[lvl][0] = band
        else:
            lvl_refs[lvl][...] = band
        bands[lvl] = cur[ctr - m:ctr + tile_h + m]
        if lvl >= 1:
            d = lvl - 1
            dogs[d] = bands[lvl] - bands[lvl - 1]
            del bands[lvl - 1]
            if d >= 2 and d - 1 <= n_inner:
                gate_plane(d - 1)
                # plane d-2 is no longer a neighbor of any future gate
                dogs.pop(d - 2, None)
                row3.pop(d - 2, None)


def gauss_resp_halo(sigmas: tuple[float, ...]) -> int:
    """Halo of the fused stack+response kernel: the blur halo plus the
    gates' spatial stencil margin (rounded into the 4-row alignment)."""
    return gauss_stack_halo(sigmas) + 4


def _resp_tile_h(tile_h: int, rv: int, wp: int, w: int, n_out: int) -> int:
    """Largest tile_h whose scoped-VMEM footprint fits Mosaic's 16 MiB
    limit. Crude f32-bytes model of the fused kernel's live set — the DMA
    window + the blur carry (both [tile_h + 2rv, wp]), the ~10 gate bands
    (1 gauss + 3 DoG + 6 row3 sliding planes, [tile_h + 4, wp]), and the
    double-buffered output blocks — plus ~30% for gate temporaries. The
    model reproduces the compiler's measured 22.4 MiB at
    tile_h=64/w=1920 and 11.5 MiB at tile_h=64/w=960 (which fits)."""
    while tile_h > 8:
        est = 4 * (2 * (tile_h + 2 * rv) * wp
                   + 10 * (tile_h + 4) * wp
                   + 2 * n_out * tile_h * w)
        if est * 1.3 < 15.5 * 2 ** 20:
            break
        tile_h //= 2
    return tile_h


# (image shape, sigmas, gate params, modeled tile) -> probed tile_h. The
# probe compiles once per entry; the persistent compilation cache makes the
# later real compile (the same program embedded in the caller's jit) cheap.
_RESP_TILE_CACHE: dict = {}


def _probe_compile_resp(shape, sigmas, n_inner, thr_c, edge_r, border,
                        tile_h) -> None:
    """AOT-compile the fused stack+response kernel at ``tile_h`` for an
    image of ``shape`` — raises if Mosaic rejects the tile (VMEM
    over-subscription surfaces only at compile time)."""
    fn = functools.partial(_gauss_resp_fixed, sigmas=sigmas,
                           n_inner=n_inner, thr_c=thr_c, edge_r=edge_r,
                           border=border, tile_h=tile_h, interpret=False)
    jax.jit(fn).lower(jax.ShapeDtypeStruct(shape, jnp.float32)).compile()


def _resolve_resp_tile(shape, sigmas, n_inner, thr_c, edge_r, border,
                       tile_h, interpret) -> int:
    """``_resp_tile_h``'s modeled tile hardened by a compile probe: try the
    estimate, and if Mosaic rejects it (the model under-predicted the live
    set at an uncalibrated width), halve and retry until a tile compiles
    (ADVICE r4 / VERDICT r4 #9 — the model alone either failed hard or
    silently under-tiled at unseen resolutions). Cached per shape/config."""
    h, w = shape[-2:]
    n_lvl = len(_gauss_weights(sigmas))
    rv = gauss_resp_halo(sigmas)
    lpad = -(-rv // 128) * 128
    wp_est = w + 2 * lpad + ((-(w + 2 * lpad)) % 128)
    tile = _resp_tile_h(tile_h, rv, wp_est, w, n_lvl + n_inner)
    if interpret or not _is_tpu():
        return tile  # interpret mode has no scoped-VMEM limit to probe
    key = (tuple(shape), sigmas, n_inner, thr_c, edge_r, border, tile)
    hit = _RESP_TILE_CACHE.get(key)
    if hit is not None:
        return hit
    while tile > 8:
        try:
            _probe_compile_resp(tuple(shape), sigmas, n_inner, thr_c,
                                edge_r, border, tile)
            break
        except Exception:
            tile //= 2
    _RESP_TILE_CACHE[key] = tile
    return tile


def _gauss_resp_call(img, sigmas, n_inner, thr_c, edge_r, border, tile_h,
                     interpret):
    tile_h = _resolve_resp_tile(img.shape, sigmas, n_inner, thr_c, edge_r,
                                border, tile_h, interpret)
    return _gauss_resp_fixed(img, sigmas, n_inner, thr_c, edge_r, border,
                             tile_h, interpret)


def _gauss_resp_fixed(img, sigmas, n_inner, thr_c, edge_r, border, tile_h,
                      interpret):
    """The fused stack+response pallas_call at a FIXED tile_h (no VMEM
    model — ``_gauss_resp_call`` resolves the tile first)."""
    batched = img.ndim == 3
    h, w = img.shape[-2:]
    kernels = _gauss_weights(sigmas)
    n_lvl = len(kernels)
    assert n_inner == n_lvl - 3, "interior planes = dog planes 1..S"
    rv = gauss_resp_halo(sigmas)
    assert rv < min(h, w), "halo exceeds image (octave too small for pallas)"
    lpad = -(-rv // 128) * 128
    padded = _gauss_prepad(img.astype(jnp.float32), rv, lpad, tile_h, h)
    wp = padded.shape[-1]
    hq = padded.shape[-2] - 2 * rv
    tiles = hq // tile_h
    kern = functools.partial(
        _gauss_stack_resp_kernel, kernels=kernels, rv=rv, lpad=lpad,
        tile_h=tile_h, w=w, wp=wp, batched=batched, n_inner=n_inner,
        thr_c=float(thr_c), edge_r=float(edge_r), border=int(border),
        h=h)
    n_out = n_lvl + n_inner
    if batched:
        b = img.shape[0]
        grid = (b, tiles)
        out_specs = [pl.BlockSpec((1, tile_h, w), lambda bi, i: (bi, i, 0),
                                  memory_space=pltpu.VMEM)] * n_out
        out_shape = [_out_struct((b, hq, w), jnp.float32, img)] * n_out
    else:
        grid = (tiles,)
        out_specs = [pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)] * n_out
        out_shape = [_out_struct((hq, w), jnp.float32, img)] * n_out
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * rv, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    outs = [o[..., :h, :] for o in outs]
    return (jnp.stack(outs[:n_lvl], axis=-3),
            jnp.stack(outs[n_lvl:], axis=-3))


@functools.partial(jax.jit, static_argnames=(
    "sigmas", "n_inner", "thr_c", "edge_r", "border", "tile_h", "interpret"))
def gauss_stack_resp_pallas(img: jax.Array, sigmas: tuple[float, ...],
                            n_inner: int, thr_c: float, edge_r: float,
                            border: int = 8, tile_h: int = 64,
                            interpret: bool = False):
    """Fused SIFT detector front half on one [H, W] float32 frame:
    ``(gauss [L, H, W], resp [n_inner, H, W])`` where ``resp[j]`` is the
    gated 26-neighbor |DoG| extremum response of interior DoG plane ``j+1``
    (contrast threshold ``thr_c``, principal-curvature ratio ``edge_r``,
    ``border``-pixel frame zeroed). The Gaussian levels are
    bitwise-identical to :func:`gauss_stack_pallas`; the responses are
    bitwise-identical to the XLA gate pipeline on the interior (see the
    kernel docstring). vmap-safe via the grid-batched variant."""
    assert tile_h % 8 == 0, "tile_h must be sublane-aligned"

    @jax.custom_batching.custom_vmap
    def run(x):
        return _gauss_resp_call(x, sigmas, n_inner, thr_c, edge_r, border,
                                tile_h, interpret)

    @run.def_vmap
    def _rule(axis_size, in_batched, xs):
        del axis_size, in_batched
        out = _gauss_resp_call(xs, sigmas, n_inner, thr_c, edge_r, border,
                               tile_h, interpret)
        return out, (True, True)

    return run(img)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def use_pallas() -> bool:
    """Pallas kernels compile only on real TPU; elsewhere the XLA reference
    paths run (bit-identical semantics, tested against each other)."""
    return _is_tpu()
