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
# multi-video DP (BASELINE configs[3]: all videos in parallel over the mesh)
# ---------------------------------------------------------------------------

def process_videos_sharded(mesh: Mesh, videos, config=None, axis="data"):
    """Multi-video loop detection with the VIDEO axis sharded over the mesh:
    [V, B, H, W] -> per-video loop lists, equal to
    ``LoopClosingSystem.process_videos_batched`` (tested on the virtual
    mesh). Each device runs the plain single-device program
    (front-end + banded similarity) on its local videos under shard_map —
    pure DP, no collectives."""
    import numpy as np

    from slam_loop_closing_tpu.config import PipelineConfig
    from slam_loop_closing_tpu.models import loop_closing as lc

    cfg = config or PipelineConfig()
    v0, b = videos.shape[:2]
    if b <= cfg.loop.min_loop_gap:
        return [[] for _ in range(v0)]
    videos = jnp.asarray(videos)
    videos, _ = mesh_lib.pad_to_multiple(videos, mesh.devices.size)
    fn = shard_map(
        functools.partial(lc.videos_loop_scores, cfg=cfg), mesh=mesh,
        in_specs=(P(axis, None, None, None),),
        out_specs=(P(axis, None, None), P(axis, None, None)))
    counts, sims = fn(videos)
    return lc.loops_from_video_scores(np.asarray(counts)[:v0],
                                      np.asarray(sims)[:v0], cfg)


# ---------------------------------------------------------------------------
# Version-B backend: edge-/observation-parallel PGO and BA
# ---------------------------------------------------------------------------

def pgo_sharded(mesh: Mesh, params: jax.Array, g, cfg, axis: str = "data"):
    """Pose-graph optimization with the EDGE axis sharded over the mesh
    (reference optimizePoseGraph, main.cpp:282-445, at the 10k-pose
    BASELINE target): per-edge residual/Jacobian vmaps run on local edge
    shards, parameters replicate, and XLA's GSPMD partitioner inserts the
    psums assembling the normal equations. Identical math to
    ``pgo.optimize_pose_graph`` (equality-tested on the virtual mesh).
    Edges pad with mask=False rows (identity R_rel so so3_log stays
    finite)."""
    from slam_loop_closing_tpu.ops import pgo

    d = mesh.devices.size
    e = g.e_from.shape[0]
    pad = (-e) % d
    if pad:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=g.R_rel.dtype),
                               (pad, 3, 3))
        g = pgo.PoseGraph(
            e_from=jnp.pad(g.e_from, (0, pad)),
            e_to=jnp.pad(g.e_to, (0, pad)),
            R_rel=jnp.concatenate([g.R_rel, eye]),
            t_rel=jnp.pad(g.t_rel, ((0, pad), (0, 0))),
            weight=jnp.pad(g.weight, (0, pad)),
            mask=jnp.pad(g.mask, (0, pad)))
    g = pgo.PoseGraph(*(mesh_lib.shard_leading(mesh, a, axis) for a in g))
    params = mesh_lib.replicated(mesh, params)
    return pgo.optimize_pose_graph(params, g, cfg)


def ba_sharded(mesh: Mesh, K, cam_params, points, obs, point_valid=None,
               cfg=None, outer_iterations=None, axis: str = "data"):
    """Alternating BA with the OBSERVATION axis sharded over the mesh
    (reference alternatingBundleAdjustment, main.cpp:905-943): the per-
    observation residual/Jacobian vmaps run on local shards; the segment-sum
    scatters assembling each camera's 6x6 / each point's 3x3 normal
    equations become local scatters + psum under GSPMD. Identical math to
    ``ba.alternating_ba`` (equality-tested on the virtual mesh).
    Observations pad with valid=False rows."""
    from slam_loop_closing_tpu.config import BaConfig
    from slam_loop_closing_tpu.ops import ba

    cfg = cfg or BaConfig()
    d = mesh.devices.size
    o = obs.cam.shape[0]
    pad = (-o) % d
    if pad:
        obs = ba.Observations(
            cam=jnp.pad(obs.cam, (0, pad)),
            point=jnp.pad(obs.point, (0, pad)),
            uv=jnp.pad(obs.uv, ((0, pad), (0, 0))),
            valid=jnp.pad(obs.valid, (0, pad)))
    obs = ba.Observations(*(mesh_lib.shard_leading(mesh, a, axis)
                            for a in obs))
    K = mesh_lib.replicated(mesh, K)
    cam_params = mesh_lib.replicated(mesh, cam_params)
    points = mesh_lib.replicated(mesh, points)
    if point_valid is not None:
        point_valid = mesh_lib.replicated(mesh, point_valid)
    return ba.alternating_ba(K, cam_params, points, obs, point_valid, cfg,
                             outer_iterations)


def sfm_reconstruct_sharded(mesh: Mesh, pipe, frames, axis: str = "data"):
    """Tiny end-to-end Version-B SfM with every shardable stage sharded over
    the mesh: DP front-end over frames, the (inherently serial, SURVEY.md §7)
    keyframe scan on the sharded features, loop search, EDGE-sharded PGO,
    OBSERVATION-sharded alternating BA, outlier removal, final BA —
    reference main.cpp:1041-1685 on a device mesh. Mirrors the staged
    single-device backend math exactly (equality-tested in
    tests/test_parallel.py). ``frames`` count must divide the mesh size.

    Returns (state, {"e0", "e1", "ef", "e2"}).
    """
    import numpy as np

    from slam_loop_closing_tpu.ops import ba, pgo

    frames = jnp.asarray(frames)
    assert frames.shape[0] % mesh.devices.size == 0, (
        "frame count must divide the mesh for the DP front-end")
    frames_sh = mesh_lib.shard_leading(mesh, frames, axis)
    state, _ = pipe.run_frontend_and_keyframes_scan(frames_sh)
    loop = pipe.find_loop(state)

    k = int(state.kf_count)
    if loop.found:
        state, _ = pipe._loop_obs_append(state, loop)
        g = pgo.build_trajectory_graph(
            state.poses[:k], jnp.asarray(loop.past_kf),
            jnp.asarray(loop.curr_kf), jnp.asarray(loop.R_rel),
            jnp.asarray(loop.t_rel), pipe.config.pgo.loop_edge_weight)
        opt, _costs = pgo_sharded(mesh, state.poses[:k], g, pipe.config.pgo,
                                  axis)
        state = state._replace(poses=state.poses.at[:k].set(opt))

    counts = jax.device_get((state.point_count, state.obs_count))
    pb = pipe._bucket(int(counts[0]) + 1, state.points.shape[0])
    nb = pipe._bucket(int(counts[1]) + 1, state.obs_cam.shape[0])
    obs = ba.Observations(state.obs_cam[:nb], state.obs_point[:nb],
                          state.obs_uv[:nb], state.obs_valid[:nb])
    e0 = float(ba.mean_reprojection_error(pipe.K, state.poses, state.points,
                                          obs))
    cp, pts, errs1 = ba_sharded(mesh, pipe.K, state.poses, state.points[:pb],
                                obs, state.point_valid[:pb], pipe.config.ba)
    state = state._replace(poses=cp, points=state.points.at[:pb].set(pts))

    from slam_loop_closing_tpu.ops import outliers as outliers_ops
    k_mask = jnp.arange(state.poses.shape[0]) < state.kf_count
    res = outliers_ops.remove_outliers(
        pipe.K, state.poses, k_mask, state.points[:pb],
        state.point_valid[:pb], obs, pipe.config.outlier)
    state = state._replace(
        point_valid=state.point_valid.at[:pb].set(res.point_valid),
        obs_valid=state.obs_valid.at[:nb].set(res.obs_valid))
    obs = obs._replace(valid=res.obs_valid)
    ef = float(ba.mean_reprojection_error(pipe.K, state.poses, state.points,
                                          obs))
    cp2, pts2, errs2 = ba_sharded(mesh, pipe.K, state.poses,
                                  state.points[:pb], obs,
                                  state.point_valid[:pb], pipe.config.ba,
                                  outer_iterations=3)
    state = state._replace(poses=cp2, points=state.points.at[:pb].set(pts2))
    metrics = {"e0": e0, "e1": float(np.asarray(errs1)[-1]), "ef": ef,
               "e2": float(np.asarray(errs2)[-1]), "loop_found": loop.found,
               "keyframes": k}
    return state, metrics


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
