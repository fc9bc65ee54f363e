"""Sharded pipeline stages: DP front-end, ring all-pairs similarity, and
fanned-out RANSAC verification.

The long-context axis of this workload is the FRAME COUNT (SURVEY.md §5):
the loop search is an O(F^2) all-pairs similarity matrix. For sequences like
KITTI seq-00 (4541 frames) the descriptor database is sharded over chips and
the match matmul runs as a **ring exchange** over ICI — each chip holds a
block of frames, computes its block-row against the resident block, and
``ppermute``s the rotating block to its neighbor, D steps total. This is
structurally ring attention with frames as tokens and the Hamming matmul as
QK^T (jax-ml scaling-book recipe: pick a mesh, shard, let collectives ride
ICI)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from slam_loop_closing_tpu.config import OrbConfig
from slam_loop_closing_tpu.ops import matching, orb
from slam_loop_closing_tpu.parallel import mesh as mesh_lib


# ---------------------------------------------------------------------------
# DP front-end
# ---------------------------------------------------------------------------

def frontend_sharded(mesh: Mesh, frames: jax.Array,
                     cfg: OrbConfig = OrbConfig()) -> orb.OrbFeatures:
    """ORB over a frame batch sharded across the mesh: frames placed with the
    leading axis split over ``data``; the vmapped detector then runs fully
    data-parallel (XLA partitions the whole program, no collectives needed)."""
    d = mesh.devices.size
    frames, n = mesh_lib.pad_to_multiple(frames, d)
    frames = mesh_lib.shard_leading(mesh, frames)
    # detect_and_describe_batch is jitted at module level — calling it
    # directly reuses one compiled program per shape (wrapping it in a fresh
    # jax.jit here would re-trace and re-compile on every call).
    feats = orb.detect_and_describe_batch(frames, cfg)
    # Trim the padding (padded frames are all-zero -> no valid keypoints
    # anyway, but trimming keeps downstream shapes honest).
    return jax.tree.map(lambda a: a[:n], feats)


# ---------------------------------------------------------------------------
# ring all-pairs similarity
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("mesh", "scale", "axis",
                                             "min_gap", "block"))
def ring_similarity_counts(mesh: Mesh, signed: jax.Array, valid: jax.Array,
                           scale: float = 2.0, axis: str = "data",
                           min_gap: int | None = None, block: int = 8
                           ) -> jax.Array:
    """[F, F] good-match-count matrix via ring descriptor exchange.

    ``signed``: [F, N, 256] int8 (F divisible by mesh size — and by
    mesh size * ``block`` when banded; pad first), ``valid``: [F, N] bool.
    Returns [F, F] int32 where entry (q, t) is the Version-A good-match
    count of frame q against frame t.

    Each ring step computes the resident block-row against the rotating
    block, then rotates it one hop (``ppermute``), overlapping the next
    block's transfer with compute when the scheduler allows.

    With ``min_gap`` set, each step is tiled into ``block x block``
    frame sub-tiles and tiles entirely outside the loop band
    ``t <= q - min_gap`` are skipped via ``lax.cond`` — legal under
    shard_map even though the predicate is device-varying, because the
    branches contain no collectives. This makes the ring's compute match
    the banded plain path (~24% of dense at gap 30) instead of the full
    F^2: on one chip it reaches parity with ``banded_pair_counts``, and on
    d chips it skips the upper-triangle steps each chip never needs,
    halving per-chip work again.
    """
    d = mesh.devices.size
    f = signed.shape[0]
    fl = f // d
    banded = min_gap is not None
    if banded:
        if fl % block:
            raise ValueError(f"per-chip block {fl} not divisible by "
                             f"tile {block}; pad frames first")
        nt = fl // block

    def body(sgn_local, val_local):
        # sgn_local: [fl, N, 256] resident block (this chip's frames)
        me = jax.lax.axis_index(axis)

        def full_tile(rot_sgn, rot_val):
            """[fl, fl] counts of resident queries vs rotating targets —
            one flattened-target matmul per query frame."""
            return matching.block_pair_counts(sgn_local, val_local,
                                              rot_sgn, rot_val, scale)

        def banded_tile(rot_sgn, rot_val, row0, col0):
            """Same [fl, fl] tile, computed as block x block sub-tiles with
            out-of-band tiles skipped. row0/col0: this tile's global frame
            offsets (traced — they depend on the device index)."""
            sq = sgn_local.reshape(nt, block, *sgn_local.shape[1:])
            vq = val_local.reshape(nt, block, *val_local.shape[1:])
            st = rot_sgn.reshape(nt, block, *rot_sgn.shape[1:])
            vt = rot_val.reshape(nt, block, *rot_val.shape[1:])
            qi = jnp.arange(nt, dtype=jnp.int32)
            ti = jnp.arange(nt, dtype=jnp.int32)
            qq, tt = jnp.meshgrid(qi, ti, indexing="ij")

            def per(args):
                q, t = args
                needed = (col0 + t * block
                          <= row0 + q * block + block - 1 - min_gap)
                # the skip branch's zeros must carry the same VMA type as
                # the compute branch (device-varying over the mesh axis)
                return jax.lax.cond(
                    needed,
                    lambda: matching.block_pair_counts(
                        sq[q], vq[q], st[t], vt[t], scale),
                    lambda: jax.lax.pcast(
                        jnp.zeros((block, block), jnp.int32), (axis,),
                        to="varying"))

            tiles = jax.lax.map(per, (qq.ravel(), tt.ravel()))
            return (tiles.reshape(nt, nt, block, block)
                    .transpose(0, 2, 1, 3).reshape(fl, fl))

        def step(i, carry):
            rot_sgn, rot_val, out = carry
            src = (me - i) % d          # whose frames the rotating block holds
            if banded:
                counts = banded_tile(rot_sgn, rot_val, me * fl, src * fl)
            else:
                counts = full_tile(rot_sgn, rot_val)
            out = jax.lax.dynamic_update_slice(
                out, counts, (0, src * fl))
            # rotate: send to right neighbor, receive from left
            perm = [(j, (j + 1) % d) for j in range(d)]
            rot_sgn = jax.lax.ppermute(rot_sgn, axis, perm)
            rot_val = jax.lax.ppermute(rot_val, axis, perm)
            return rot_sgn, rot_val, out

        # mark the accumulator as device-varying (shard_map VMA typing: the
        # loop writes per-device values into it, so the carry must enter the
        # loop as 'varying' over the mesh axis)
        out0 = jax.lax.pcast(jnp.zeros((fl, f), jnp.int32), (axis,),
                             to="varying")
        _, _, out = jax.lax.fori_loop(
            0, d, step, (sgn_local, val_local, out0))
        return out

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None)),
        out_specs=P(axis, None))
    return fn(signed, valid)


def banded_loop_counts(mesh: Mesh, signed: jax.Array, valid: jax.Array,
                       nfeat: jax.Array, min_gap: int, scale: float = 2.0,
                       block: int = 8):
    """Loop-detection scores from the ring matrix: good counts and
    similarities for every (curr, past) pair with ``past <= curr - min_gap``
    (README.md:119-126), masked elsewhere. Returns ([F, F] counts,
    [F, F] similarity) with invalid band zeroed. Out-of-band tiles are
    skipped inside the ring (see :func:`ring_similarity_counts`)."""
    d = mesh.devices.size
    f0 = signed.shape[0]
    signed, _ = mesh_lib.pad_to_multiple(signed, d * block)
    valid, _ = mesh_lib.pad_to_multiple(valid, d * block)
    counts = ring_similarity_counts(mesh, signed, valid, scale,
                                    min_gap=min_gap, block=block)[:f0, :f0]
    q = jnp.arange(f0)[:, None]
    t = jnp.arange(f0)[None, :]
    band = t <= q - min_gap
    counts = jnp.where(band, counts, 0)
    sims = matching.similarity(counts, nfeat[:, None], nfeat[None, :])
    sims = jnp.where(band, sims, 0.0)
    return counts, sims


# ---------------------------------------------------------------------------
# fanned-out pair verification
# ---------------------------------------------------------------------------

def verify_pairs_sharded(mesh: Mesh, x1: jax.Array, x2: jax.Array,
                         mask: jax.Array, keys: jax.Array, focal, cfg):
    """Batched essential-RANSAC verification of candidate loop pairs with the
    pair axis sharded across chips (the reference's sequential verify loop,
    main.cpp:1386-1418, fanned out). Inputs [P, N, ...]; P padded to the mesh
    size by the caller."""
    from slam_loop_closing_tpu.ops import ransac as ransac_ops

    x1 = mesh_lib.shard_leading(mesh, x1)
    x2 = mesh_lib.shard_leading(mesh, x2)
    mask = mesh_lib.shard_leading(mesh, mask)
    keys = mesh_lib.shard_leading(mesh, keys)
    # module-level jit on estimate_essential_ransac_pairs — a fresh jax.jit
    # wrapper here would re-trace and re-compile every call
    return ransac_ops.estimate_essential_ransac_pairs(
        x1, x2, mask, keys, focal=focal, cfg=cfg)
