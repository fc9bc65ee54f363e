"""The Version-B SfM pipeline: keyframing, essential-matrix odometry,
incremental triangulation with map-point merging, loop closure, pose-graph
optimization, alternating BA, outlier removal, OBJ export.

TPU-native re-design of the reference's ``main()`` (main.cpp:1041-1685).
The reference is a single-threaded per-frame loop of OpenCV calls; here:

* the feature front-end runs vmapped over ALL frames up front (one device
  program — the part the reference spends most of its time in);
* the sequential keyframe pass (pose chaining is inherently serial,
  SURVEY.md §7 "hard parts") is ONE jitted step function over a
  fixed-capacity ``MapState`` pytree, dispatched per frame from a thin host
  loop — all gates, RANSAC, triangulation, and map-merge scatters fused into
  a single XLA program per frame;
* the loop-closure search evaluates all candidate keyframe pairs as batched
  MXU matmuls + vmapped RANSAC verification (the reference's O(K^2) hot
  loop #2, main.cpp:1362-1421);
* the backend (PGO + alternating BA + outlier removal) is the batched
  machinery of :mod:`..ops.pgo`, :mod:`..ops.ba`, :mod:`..ops.outliers`.

Map state is fixed-capacity padded SoA arrays (SURVEY.md §2.5): "compaction"
never happens on device — masks carry validity, the OBJ writer drops invalid
entries at the end.

Reference quirks preserved for parity (SURVEY.md §7): unit-norm relative
translation chaining (no scale propagation, main.cpp:1216-1219), single
global best loop with gap = max(3, K/2) (main.cpp:1364), loop edge weight 10
(main.cpp:1468).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_loop_closing_tpu.config import PipelineConfig, PoseGraphMethod
from slam_loop_closing_tpu.ops import (ba, camera as camera_ops, epipolar,
                                       lie, matching, orb, outliers, pgo,
                                       triangulation)
from slam_loop_closing_tpu.ops import ransac as ransac_ops
from slam_loop_closing_tpu.utils import io as io_utils


class MapState(NamedTuple):
    """Fixed-capacity global map (the parallel vectors of main.cpp:1098-1108
    as padded device arrays). The LAST slot of the point and observation
    arrays is a trash slot: inactive scatter lanes write there, keeping every
    shape static."""

    kf_count: jax.Array       # int32 number of accepted keyframes
    kf_frame: jax.Array       # [K] int32 source frame index per keyframe
    poses: jax.Array          # [K, 6] world->camera params [rvec; t]
    kp_xy: jax.Array          # [K, N, 2] undistorted pixel keypoints
    kp_norm: jax.Array        # [K, N, 2] normalized coords
    kp_valid: jax.Array       # [K, N] bool
    signed: jax.Array         # [K, N, 256] int8 descriptors
    kp_to_point: jax.Array    # [K, N] int32 track table (-1 = none)
    points: jax.Array         # [P+1, 3] world points (last = trash)
    point_valid: jax.Array    # [P+1] bool
    point_count: jax.Array    # int32
    obs_cam: jax.Array        # [O+1] int32 keyframe index (last = trash)
    obs_point: jax.Array      # [O+1] int32
    obs_uv: jax.Array         # [O+1, 2] float32
    obs_valid: jax.Array      # [O+1] bool
    obs_count: jax.Array      # int32


def _match_descriptors(desc_q, valid_q, desc_t, valid_t, ratio: float,
                       detector: str) -> matching.Matches:
    """Detector-generic ratio matching: Hamming MXU matmul for the ORB +-1
    int8 layout (main.cpp:1154's knn2+ratio with the binary path), squared-L2
    GEMM with ratio^2 for SIFT float descriptors (main.cpp:509-534). Both
    wrappers dispatch to fused Pallas top-2 kernels on TPU."""
    if detector == "sift":
        return matching.ratio_matches_l2(desc_q, valid_q, desc_t, valid_t,
                                         ratio)
    return matching.ratio_matches_hamming(desc_q, valid_q, desc_t, valid_t,
                                          ratio)


class StepInfo(NamedTuple):
    """Per-frame diagnostics mirroring the reference's printed counters
    (main.cpp:1202-1206, 1343-1346). The rejection classes follow the
    reference's attribution: behind-camera folds into ``depth``
    (main.cpp:1283-1295)."""

    accepted: jax.Array       # bool keyframe accepted
    num_matches: jax.Array    # int32
    median_disp: jax.Array    # float32
    num_inliers: jax.Array    # int32
    n_triangulated: jax.Array  # int32 new points
    n_merged: jax.Array       # int32 observations added to existing points
    n_rej_parallax: jax.Array  # int32 rejected: parallax below threshold
    n_rej_reproj: jax.Array    # int32 rejected: reprojection error too large
    n_rej_depth: jax.Array     # int32 rejected: behind camera / depth range


def init_map_state(max_keyframes: int, num_features: int, max_points: int,
                   max_obs: int, desc_dim: int = 256,
                   desc_dtype=jnp.int8) -> MapState:
    """``desc_dim``/``desc_dtype``: (256, int8) for the ORB +-1 layout,
    (128, float32) for SIFT."""
    k, n = max_keyframes, num_features
    return MapState(
        kf_count=jnp.asarray(0, jnp.int32),
        kf_frame=jnp.zeros((k,), jnp.int32),
        poses=jnp.zeros((k, 6), jnp.float32),
        kp_xy=jnp.zeros((k, n, 2), jnp.float32),
        kp_norm=jnp.zeros((k, n, 2), jnp.float32),
        kp_valid=jnp.zeros((k, n), bool),
        signed=jnp.zeros((k, n, desc_dim), desc_dtype),
        kp_to_point=jnp.full((k, n), -1, jnp.int32),
        points=jnp.zeros((max_points + 1, 3), jnp.float32),
        point_valid=jnp.zeros((max_points + 1,), bool),
        point_count=jnp.asarray(0, jnp.int32),
        obs_cam=jnp.zeros((max_obs + 1,), jnp.int32),
        obs_point=jnp.zeros((max_obs + 1,), jnp.int32),
        obs_uv=jnp.zeros((max_obs + 1, 2), jnp.float32),
        obs_valid=jnp.zeros((max_obs + 1,), bool),
        obs_count=jnp.asarray(0, jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _bootstrap(state: MapState, xy, norm, valid, signed,
               frame_idx, cfg: PipelineConfig) -> MapState:
    """Insert frame 0 as keyframe 0 with identity pose (main.cpp:1111-1132)."""
    return state._replace(
        kf_count=jnp.asarray(1, jnp.int32),
        kf_frame=state.kf_frame.at[0].set(frame_idx),
        kp_xy=state.kp_xy.at[0].set(xy),
        kp_norm=state.kp_norm.at[0].set(norm),
        kp_valid=state.kp_valid.at[0].set(valid),
        signed=state.signed.at[0].set(signed),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _sfm_step(state: MapState, xy, norm, valid, signed, frame_idx, key,
              K: jax.Array, cfg: PipelineConfig):
    """One candidate frame through the keyframe gates and (if accepted) map
    extension — the body of the reference's hot loop #1 (main.cpp:1138-1351)
    as a single fused XLA program. Always returns a same-shape MapState;
    rejection = returning the input state."""
    kcfg = cfg.keyframe
    last = state.kf_count - 1
    last_xy = state.kp_xy[last]
    last_norm = state.kp_norm[last]
    last_valid = state.kp_valid[last]
    last_signed = state.signed[last]

    # --- match current frame vs last keyframe (main.cpp:1154) -------------
    m = _match_descriptors(signed, valid, last_signed, last_valid,
                           cfg.match.ratio_threshold, cfg.detector)

    xq = xy                      # current-frame keypoints (query rows)
    xt = last_xy[m.idx]          # matched last-keyframe keypoints
    med = epipolar.median_displacement(xq, xt, m.mask)

    # --- essential-matrix RANSAC (main.cpp:1186) --------------------------
    focal = (K[0, 0] + K[1, 1]) * 0.5
    # PROSAC quality (one definition: matching.prosac_quality); pixel floors
    # keep the support statistic meaningful at small resolutions
    w_est = 2.0 * K[0, 2]
    quality = matching.prosac_quality(
        xq, xt, m,
        jnp.maximum(cfg.match.motion_radius_frac * w_est, 24.0),
        jnp.maximum(cfg.match.motion_tau_frac * w_est, 8.0))
    res = ransac_ops.estimate_essential_ransac(
        last_norm[m.idx], norm, m.mask, key, focal, cfg.ransac,
        quality=quality)
    # res.R, res.t: last-keyframe cam -> current cam (x2 = R x1 + t).

    inlier_ratio = res.num_inliers.astype(jnp.float32) / jnp.maximum(
        m.count.astype(jnp.float32), 1.0)
    accept = ((m.count >= kcfg.min_tracked_features)
              & (med >= kcfg.min_median_displacement)
              & (med <= kcfg.max_median_displacement)
              & res.ok
              & (res.num_inliers >= kcfg.min_inliers)
              & (inlier_ratio >= kcfg.min_inlier_ratio)
              & (state.kf_count < state.kp_xy.shape[0]))

    # accept is threaded INTO the map extension: every write is a gated
    # scatter (trash-slot redirect) or a conditional single-row set, so a
    # rejected frame costs no HBM traffic over the fixed-capacity arrays.
    # (A tree-level jnp.where(accept, new, old) select here measured ~1 s
    # per scan step at SIFT-4000 capacities — it rewrites the entire
    # 400 MB MapState each frame.)
    out, tri = _extend_map(state, xy, norm, valid, signed, frame_idx,
                           res, m, K, cfg, accept)
    # counters are zero for rejected frames by construction: _extend_map's
    # gated masks make every count delta 0 when accept is False
    info = StepInfo(
        accepted=accept, num_matches=m.count, median_disp=med,
        num_inliers=res.num_inliers,
        n_triangulated=out.point_count - state.point_count,
        n_merged=(out.obs_count - state.obs_count
                  - 2 * (out.point_count - state.point_count)),
        n_rej_parallax=tri.n_parallax,
        n_rej_reproj=tri.n_reproj,
        # the reference counts cheirality failures as depth rejections
        # (main.cpp:1283-1295)
        n_rej_depth=tri.n_behind + tri.n_depth)
    return out, info


def _extend_map(state: MapState, xy, norm, valid, signed, frame_idx,
                res: ransac_ops.EssentialResult, m: matching.Matches,
                K: jax.Array, cfg: PipelineConfig,
                accept: jax.Array | bool = True):
    """Chain the pose, triangulate gated inliers, merge into the map via the
    track table (main.cpp:1216-1341). Returns (new MapState,
    TriangulationResult) — the triangulation counters feed the reference's
    printed rejection line (main.cpp:1343-1346).

    ``accept`` (traced bool) gates EVERY state mutation: scatters redirect
    to the trash slots and row writes keep the existing row, so rejection
    returns a value-identical state without copying the capacity arrays."""
    accept = jnp.asarray(accept)
    last = state.kf_count - 1
    new_kf = state.kf_count
    R_last, t_last = lie.params_to_pose(state.poses[last])
    # Unit-norm t chaining — NO scale propagation (main.cpp:1216-1219).
    R_new, t_new = lie.compose(res.R, res.t, R_last, t_last)
    new_pose = lie.pose_to_params(R_new, t_new)

    last_norm = state.kp_norm[last]
    last_xy = state.kp_xy[last]
    x1 = last_norm[m.idx]   # last keyframe, per query row
    x2 = norm               # current frame
    uv1 = last_xy[m.idx]
    uv2 = xy
    pair_mask = m.mask & res.inliers & accept

    tri = triangulation.triangulate_gated(
        K, R_last, t_last, R_new, t_new, x1, x2, uv1, uv2, pair_mask,
        cfg.triangulation)

    # --- merge (main.cpp:1261-1341) --------------------------------------
    # The reference's gates `continue` BEFORE the merge block, so a match
    # only adds an observation to an existing point if its fresh
    # triangulation passed every gate (main.cpp:1283-1317).
    track_last = state.kp_to_point[last]       # [N]
    existing_pid = track_last[m.idx]           # [N] (per query row)
    has_existing = pair_mask & tri.accept & (existing_pid >= 0)
    make_new = pair_mask & tri.accept & (existing_pid < 0)

    p_cap = state.points.shape[0] - 1
    o_cap = state.obs_cam.shape[0] - 1

    n_new = jnp.sum(make_new.astype(jnp.int32))
    new_rank = jnp.cumsum(make_new.astype(jnp.int32)) - 1
    new_slot = state.point_count + new_rank
    in_p_cap = make_new & (new_slot < p_cap)
    p_idx = jnp.where(in_p_cap, new_slot, p_cap)

    points = state.points.at[p_idx].set(
        jnp.where(in_p_cap[:, None], tri.X, state.points[p_idx]))
    point_valid = state.point_valid.at[p_idx].set(
        jnp.where(in_p_cap, True, state.point_valid[p_idx]))
    point_count = jnp.minimum(state.point_count + n_new, p_cap)

    # Point id each matched keypoint ends up with.
    final_pid = jnp.where(has_existing, existing_pid,
                          jnp.where(in_p_cap, p_idx, -1))

    # Observation appends: 1 per existing match (new kf only) + 2 per new
    # point (last kf + new kf).
    n_exist = jnp.sum(has_existing.astype(jnp.int32))
    exist_rank = jnp.cumsum(has_existing.astype(jnp.int32)) - 1
    base = state.obs_count
    e_idx = jnp.where(has_existing, base + exist_rank, o_cap)
    e_idx = jnp.minimum(e_idx, o_cap)

    base2 = jnp.minimum(base + n_exist, o_cap)
    pair_rank = jnp.cumsum(in_p_cap.astype(jnp.int32)) - 1
    a_idx = jnp.where(in_p_cap, base2 + 2 * pair_rank, o_cap)
    b_idx = jnp.where(in_p_cap, base2 + 2 * pair_rank + 1, o_cap)
    a_idx = jnp.minimum(a_idx, o_cap)
    b_idx = jnp.minimum(b_idx, o_cap)

    obs_cam = (state.obs_cam
               .at[e_idx].set(jnp.where(has_existing, new_kf,
                                        state.obs_cam[e_idx]))
               .at[a_idx].set(jnp.where(in_p_cap, new_kf,
                                        state.obs_cam[a_idx])))
    obs_cam = obs_cam.at[b_idx].set(
        jnp.where(in_p_cap, last, obs_cam[b_idx]))
    obs_point = (state.obs_point
                 .at[e_idx].set(jnp.where(has_existing, final_pid,
                                          state.obs_point[e_idx]))
                 .at[a_idx].set(jnp.where(in_p_cap, final_pid,
                                          state.obs_point[a_idx])))
    obs_point = obs_point.at[b_idx].set(
        jnp.where(in_p_cap, final_pid, obs_point[b_idx]))
    obs_uv = (state.obs_uv
              .at[e_idx].set(jnp.where(has_existing[:, None], uv2,
                                       state.obs_uv[e_idx]))
              .at[a_idx].set(jnp.where(in_p_cap[:, None], uv2,
                                       state.obs_uv[a_idx])))
    obs_uv = obs_uv.at[b_idx].set(
        jnp.where(in_p_cap[:, None], uv1, obs_uv[b_idx]))
    obs_valid = (state.obs_valid
                 .at[e_idx].set(jnp.where(has_existing, True,
                                          state.obs_valid[e_idx]))
                 .at[a_idx].set(jnp.where(in_p_cap, True,
                                          state.obs_valid[a_idx])))
    obs_valid = obs_valid.at[b_idx].set(
        jnp.where(in_p_cap, True, obs_valid[b_idx]))
    obs_count = jnp.minimum(base2 + 2 * jnp.sum(in_p_cap.astype(jnp.int32)),
                            o_cap)

    # Track tables: new frame rows index by query keypoint; ALSO backfill the
    # last keyframe's table for newly created points (both views now track).
    track_new = jnp.where(pair_mask & (final_pid >= 0), final_pid, -1)
    track_last_new = track_last.at[m.idx].set(
        jnp.where(in_p_cap, final_pid, track_last[m.idx]))

    # Zero the trash slots.
    points = points.at[p_cap].set(0.0)
    point_valid = point_valid.at[p_cap].set(False)
    obs_valid = obs_valid.at[o_cap].set(False)

    def row(arr, idx, val):
        """Conditional single-row write: touch one row, not the array."""
        old_row = arr[idx]
        sel = jnp.where(jnp.reshape(accept, (1,) * old_row.ndim), val,
                        old_row) if old_row.ndim else jnp.where(
                            accept, val, old_row)
        return arr.at[idx].set(sel)

    return state._replace(
        kf_count=state.kf_count + accept.astype(jnp.int32),
        kf_frame=row(state.kf_frame, new_kf, frame_idx),
        poses=row(state.poses, new_kf, new_pose),
        kp_xy=row(state.kp_xy, new_kf, xy),
        kp_norm=row(state.kp_norm, new_kf, norm),
        kp_valid=row(state.kp_valid, new_kf, valid),
        signed=row(state.signed, new_kf, signed),
        kp_to_point=row(row(state.kp_to_point, last, track_last_new),
                        new_kf, jnp.where(accept, track_new, -1)),
        points=points, point_valid=point_valid, point_count=point_count,
        obs_cam=obs_cam, obs_point=obs_point, obs_uv=obs_uv,
        obs_valid=obs_valid, obs_count=obs_count), tri


@functools.partial(jax.jit, static_argnames=("cfg",))
def _scan_keyframes(state: MapState, und, norm, valid, desc, frame_ids, keys,
                    K: jax.Array, cfg: PipelineConfig):
    """The whole keyframe pass as one ``lax.scan`` device program. Module
    level (NOT a per-call closure) so repeat runs hit the jit cache instead
    of re-tracing the 95-step scan — re-tracing cost ~10 s per call on this
    host, ~15x the program's actual device time."""
    def step(st, x):
        u, nm, v, d, fid, key = x
        return _sfm_step(st, u, nm, v, d, fid, key, K, cfg)

    return jax.lax.scan(step, state, (und, norm, valid, desc, frame_ids, keys))


# ---------------------------------------------------------------------------
# loop-closure search over keyframes (main.cpp:1362-1421)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("ratio", "chunk", "detector"))
def _pair_ratio_counts(signed, kp_valid, pair_q, pair_t, ratio=0.7, chunk=4,
                       detector="orb"):
    """Ratio-test match counts for candidate keyframe pairs (the loop search
    matches with ratio 0.7, main.cpp:1386)."""
    def one(qi, ti):
        m = _match_descriptors(signed[qi], kp_valid[qi], signed[ti],
                               kp_valid[ti], ratio, detector)
        return m.count

    p = pair_q.shape[0]
    pad = (-p) % chunk
    pq = jnp.concatenate([pair_q, jnp.zeros((pad,), pair_q.dtype)])
    pt = jnp.concatenate([pair_t, jnp.zeros((pad,), pair_t.dtype)])
    counts = jax.lax.map(lambda c: jax.vmap(one)(c[0], c[1]),
                         (pq.reshape(-1, chunk), pt.reshape(-1, chunk)))
    return counts.reshape(-1)[:p]


@functools.partial(jax.jit, static_argnames=("ratio", "detector", "cfg"))
def _verify_loop_candidates(signed, kp_valid, kp_norm, cand_q, cand_t, keys,
                            focal, radius, tau, ratio, detector, cfg):
    """Match + batched essential-RANSAC for a fixed set of candidate
    keyframe pairs, vmapped — one device program verifies all candidates."""
    def one(qi, ti, key):
        m = _match_descriptors(signed[qi], kp_valid[qi], signed[ti],
                               kp_valid[ti], ratio, detector)
        # PROSAC quality in normalized coords (radius/tau pre-divided by
        # focal); single definition in matching.prosac_quality
        quality = matching.prosac_quality(
            kp_norm[qi], kp_norm[ti][m.idx], m, radius, tau)
        res = ransac_ops.estimate_essential_ransac(
            kp_norm[ti][m.idx], kp_norm[qi], m.mask, key, focal, cfg,
            quality=quality)
        return m.count, m.idx, m.mask, res

    return jax.vmap(one)(cand_q, cand_t, keys)


@functools.partial(jax.jit, static_argnames=("ratio", "detector", "cfg"))
def _verify_loop_scores(signed, kp_valid, kp_norm, cand_q, cand_t, keys,
                        focal, radius, tau, ratio, detector, cfg):
    """Scoring-only variant of :func:`_verify_loop_candidates`: returns just
    the [C, 3] (match count, inlier count, pose-inlier count) table so the
    host selection loop reads back a few hundred bytes per chunk instead of
    the full match/inlier arrays (each host readback costs a device round
    trip; the winner is re-verified once with the same key to fetch its
    geometry)."""
    def one(qi, ti, key):
        m = _match_descriptors(signed[qi], kp_valid[qi], signed[ti],
                               kp_valid[ti], ratio, detector)
        # PROSAC quality in normalized coords (radius/tau pre-divided by
        # focal); single definition in matching.prosac_quality
        quality = matching.prosac_quality(
            kp_norm[qi], kp_norm[ti][m.idx], m, radius, tau)
        res = ransac_ops.estimate_essential_ransac(
            kp_norm[ti][m.idx], kp_norm[qi], m.mask, key, focal, cfg,
            quality=quality)
        return jnp.stack([m.count, res.num_inliers, res.num_pose_inliers])

    # chunked vmap inside one program: all candidates scored in a single
    # dispatch (the host loop over chunks paid one device round trip each)
    c = cand_q.shape[0]
    chunk = min(32, c)
    pad = (-c) % chunk
    cq = jnp.concatenate([cand_q, cand_q[:1].repeat(pad, 0)])
    ct = jnp.concatenate([cand_t, cand_t[:1].repeat(pad, 0)])
    ks = jnp.concatenate([keys, keys[:1].repeat(pad, 0)])
    out = jax.lax.map(
        lambda xs: jax.vmap(one)(*xs),
        (cq.reshape(-1, chunk), ct.reshape(-1, chunk),
         ks.reshape(-1, chunk, *keys.shape[1:])))
    return out.reshape(-1, 3)[:c]


@functools.partial(jax.jit, static_argnames=(
    "k", "pb", "nb", "has_loop", "cfg"))
def _backend_program(K, poses, points, point_valid, obs_cam, obs_point,
                     obs_uv, obs_valid, loop_past, loop_curr, loop_R, loop_t,
                     *, k: int, pb: int, nb: int, has_loop: bool,
                     cfg: PipelineConfig):
    """The WHOLE reference backend (main.cpp:1423-1669) as ONE device
    program: PGO with the loop constraint, reprojection metric, 5-outer
    alternating BA, outlier removal, post-filter metric, 3-outer BA — plus
    every counter/metric the reference prints, returned as one pytree so the
    host does a single readback instead of ~15 sequential ~40-100 ms
    round trips (the round-3 "seconds of fixed overhead per run",
    docs/PERFORMANCE.md). Identical math to the staged methods it fuses
    (pgo.optimize_pose_graph / ba.alternating_ba / outliers.remove_outliers
    are called unmodified); ``k``/``pb``/``nb`` are the host-known
    keyframe/point/observation buckets."""
    params = poses[:k]

    def drift_deg(pp):
        # rotation drift between the loop measurement and the odometry chain
        # (main.cpp:1476-1482, 1487-1491)
        Rc, _ = lie.params_to_pose(pp[loop_curr])
        Rp, _ = lie.params_to_pose(pp[loop_past])
        return jnp.degrees(lie.rotation_error(loop_R, Rc @ Rp.T))

    if has_loop:
        if cfg.pgo.method == PoseGraphMethod.GAUSS_NEWTON:
            g = pgo.build_trajectory_graph(params, loop_past, loop_curr,
                                           loop_R, loop_t,
                                           cfg.pgo.loop_edge_weight)
            drift0 = drift_deg(params)
            cost0 = pgo.total_cost(params, g)
            opt, costs = pgo.optimize_pose_graph(params, g, cfg.pgo)
            drift1 = drift_deg(opt)
        else:
            drift0 = drift_deg(params)
            opt = pgo.simple_pose_correction(params, loop_past, loop_curr,
                                             loop_R)
            drift1 = drift_deg(opt)
            cost0 = jnp.zeros(())
            costs = jnp.zeros((1,))
        poses = poses.at[:k].set(opt)
    else:
        drift0 = drift1 = cost0 = jnp.zeros(())
        costs = jnp.zeros((1,))

    # last keyframe camera center (the reconstruction-summary line,
    # main.cpp:1524-1538)
    Rk, tk = lie.params_to_pose(poses[k - 1])
    center_last = -Rk.T @ tk

    obs = ba.Observations(obs_cam[:nb], obs_point[:nb], obs_uv[:nb],
                          obs_valid[:nb])
    e0 = ba.mean_reprojection_error(K, poses, points, obs)
    cp, pts, errs1 = ba.alternating_ba(K, poses, points[:pb], obs,
                                       point_valid[:pb], cfg.ba)
    points = points.at[:pb].set(pts)

    k_mask = jnp.arange(poses.shape[0]) < k
    res = outliers.remove_outliers(K, cp, k_mask, points[:pb],
                                   point_valid[:pb], obs, cfg.outlier)
    point_valid = point_valid.at[:pb].set(res.point_valid)
    obs = obs._replace(valid=res.obs_valid)
    pts_after = jnp.sum(res.point_valid.astype(jnp.int32))
    obs_after = jnp.sum(res.obs_valid.astype(jnp.int32))

    ef = ba.mean_reprojection_error(K, cp, points, obs)
    cp2, pts2, errs2 = ba.alternating_ba(K, cp, points[:pb], obs,
                                         point_valid[:pb], cfg.ba,
                                         outer_iterations=3)
    points = points.at[:pb].set(pts2)

    metrics = dict(
        drift0_deg=drift0, drift1_deg=drift1, cost0=cost0,
        cost_last=costs[-1], center_last=center_last, e0=e0, errs1=errs1,
        n_outliers=res.n_outliers, n_points_before=res.n_points_before,
        distance_threshold=res.distance_threshold, pts_after=pts_after,
        obs_after=obs_after, ef=ef, errs2=errs2)
    return cp2, points, point_valid, obs.valid, metrics


@dataclasses.dataclass
class LoopResult:
    found: bool
    curr_kf: int = -1
    past_kf: int = -1
    num_matches: int = 0
    num_inliers: int = 0
    num_pose_inliers: int = 0
    R_rel: np.ndarray | None = None   # past cam -> curr cam
    t_rel: np.ndarray | None = None
    inlier_pairs: tuple[np.ndarray, np.ndarray] | None = None  # (q_idx, t_idx)


@dataclasses.dataclass
class SfMResult:
    state: MapState
    infos: list[StepInfo]
    loop: LoopResult
    reproj_before_ba: float
    reproj_after_ba: float
    reproj_final: float
    obj_path: str | None


class SfMPipeline:
    """Host driver orchestrating the jitted stages (see module docstring).

    ``run(frames)`` reproduces the reference ``main()`` end to end:
    front-end -> keyframe scan -> loop search -> PGO -> BA -> outlier
    removal -> BA -> OBJ.
    """

    def __init__(self, config: PipelineConfig | None = None,
                 max_keyframes: int = 256, max_points: int = 65536,
                 max_obs: int = 262144, log=print, use_scan: bool = False):
        self.config = config or PipelineConfig()
        self.max_keyframes = max_keyframes
        self.max_points = max_points
        self.max_obs = max_obs
        self.log = log
        # use_scan: run the keyframe pass as one lax.scan device program
        # (fastest; no per-frame logging) instead of the host loop.
        self.use_scan = use_scan
        cam = self.config.camera
        self.K = jnp.asarray(cam.K, jnp.float32)
        self.dist = jnp.asarray(cam.dist_coeffs, jnp.float32)

    # -- front-end ---------------------------------------------------------

    def _frontend(self, frames: np.ndarray):
        """Batched feature front-end (ORB or SIFT per config.detector) +
        keypoint undistortion for every frame. Returns
        (descriptors [B, N, D], keypoint xy, valid, undistorted xy,
        normalized xy)."""
        # dtype-keyed uint8 shipping (ops.image.ship_frames: one
        # normalization contract shared with LoopClosingSystem — a
        # device-resident uint8 array normalizes identically to a host one)
        from slam_loop_closing_tpu.ops.image import ship_frames

        if self.config.detector == "sift":
            from slam_loop_closing_tpu.ops import sift as sift_ops

            chunk = self.config.sift.batch_chunk
            detect = functools.partial(sift_ops.detect_and_describe_batch,
                                       cfg=self.config.sift)
        else:
            chunk = 8
            detect = functools.partial(orb.detect_and_describe_batch,
                                       cfg=self.config.orb)
        b = frames.shape[0]
        if isinstance(frames, np.ndarray) and b > chunk:
            # Pipelined upload: the host->device link is a ~50 MB/s tunnel
            # (96 uint8 1080p frames = ~4 s), and a single
            # jnp.asarray(frames) blocks until the WHOLE video has shipped
            # before the first front-end dispatch. Shipping chunk k+1 while
            # the (async-dispatched) front-end computes chunk k hides the
            # entire transfer behind compute (per-chunk transfer < per-chunk
            # front-end time at every supported config).
            pad = (-b) % chunk
            if pad:
                frames = np.concatenate(
                    [frames, np.zeros((pad, *frames.shape[1:]),
                                      frames.dtype)])
            outs = []
            for i in range(0, frames.shape[0], chunk):
                dev = jax.device_put(frames[i:i + chunk])
                outs.append(detect(ship_frames(dev)))
            f = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, 0)[:b], *outs)
        else:
            f = detect(ship_frames(frames))
        if self.config.detector == "sift":
            desc, xy, valid = f.descriptors, f.xy, f.valid
        else:
            desc, xy, valid = f.signed, f.keypoints.xy, f.keypoints.valid
        # Valid-count compaction: pack valid rows first, then slice every
        # downstream array to a per-run count bucket. SIFT-4000 frames carry
        # ~1-1.5k valid keypoints on typical footage, so the scan matching
        # and the loop-search GEMMs otherwise spend >2x their time on zero
        # rows. One scalar readback (the max count) sequences the front-end
        # before the scan — which a shape-static scan needs anyway.
        desc, xy, valid = matching.pack_valid_first(desc, xy, valid)
        nv = int(jnp.max(jnp.sum(valid, axis=1)))
        nb = self._bucket_fine(max(nv, 128), desc.shape[1], floor=128,
                               step=512)
        desc, xy, valid = desc[:, :nb], xy[:, :nb], valid[:, :nb]
        und = jax.vmap(camera_ops.undistort_points_batch,
                       in_axes=(None, None, 0))(self.K, self.dist, xy)
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        norm = (und - jnp.stack([cx, cy])) / jnp.stack([fx, fy])
        return desc, valid, und, norm

    # -- keyframe scan -----------------------------------------------------

    def run_frontend_and_keyframes_scan(self, frames: np.ndarray):
        """Whole keyframe pass as ONE jitted ``lax.scan`` over frames — no
        per-frame host dispatch (the fast path; identical math to
        :meth:`run_frontend_and_keyframes`, which keeps the host loop for
        per-frame reference-format logging)."""
        desc, valid, und, norm = self._frontend(frames)
        # capacity = the compacted feature bucket (desc.shape[1]), not the
        # configured maximum — every [K, N, ...] map array shrinks with it
        state = init_map_state(self.max_keyframes, desc.shape[1],
                               self.max_points, self.max_obs,
                               desc.shape[2], desc.dtype)
        state = _bootstrap(state, und[0], norm[0], valid[0], desc[0],
                           jnp.asarray(0, jnp.int32), self.config)
        b = frames.shape[0]
        keys = jax.random.split(jax.random.PRNGKey(42), b - 1)
        frame_ids = jnp.arange(1, b, dtype=jnp.int32)
        state, infos = _scan_keyframes(state, und[1:], norm[1:], valid[1:],
                                       desc[1:], frame_ids, keys, self.K,
                                       self.config)
        self._log_keyframe_summary(state, b)
        return state, infos

    def _log_keyframe_summary(self, state: MapState, num_frames: int):
        """Reference keyframe-pass completion block (main.cpp:1354-1356)."""
        self.log("\n=== Keyframe Selection Complete ===")
        self.log(f"Total keyframes: {int(state.kf_count)} "
                 f"(from {num_frames} frames)")
        self.log(f"Total 3D points: {int(state.point_count)}")

    def run_frontend_and_keyframes(self, frames: np.ndarray):
        desc, valid, und, norm = self._frontend(frames)
        state = init_map_state(self.max_keyframes, desc.shape[1],
                               self.max_points, self.max_obs,
                               desc.shape[2], desc.dtype)
        state = _bootstrap(state, und[0], norm[0], valid[0], desc[0],
                           jnp.asarray(0, jnp.int32), self.config)
        infos = []
        # same key derivation as the scan fast path (bit-identical results)
        keys = jax.random.split(jax.random.PRNGKey(42), frames.shape[0] - 1)
        kf_index = 0
        for f in range(1, frames.shape[0]):
            state, info = _sfm_step(state, und[f], norm[f], valid[f],
                                    desc[f],
                                    jnp.asarray(f, jnp.int32), keys[f - 1],
                                    self.K, self.config)
            infos.append(info)
            # per-frame acceptance lines (the reference's observable logs,
            # main.cpp:1202-1206, 1343-1346)
            if bool(info.accepted):
                kf_index += 1
                if hasattr(self.log, "keyframe_accepted"):
                    self.log.keyframe_accepted(
                        f, kf_index, int(info.num_matches),
                        float(info.median_disp), int(info.num_inliers))
                    self.log.triangulation_counters(
                        int(info.n_triangulated), int(info.n_merged),
                        int(info.n_rej_parallax), int(info.n_rej_reproj),
                        int(info.n_rej_depth))
        self._log_keyframe_summary(state, frames.shape[0])
        return state, infos

    # -- loop search -------------------------------------------------------

    def find_loop(self, state: MapState) -> LoopResult:
        """Single global best loop (main.cpp:1362-1421): candidate pairs with
        gap = max(3, K/2) where BOTH frames have >= 100 descriptors
        (main.cpp:1382), ratio-0.7 matching > 300 matches, essential RANSAC
        verify with inliers > 200 and ratio > 0.6, best inlier count wins,
        recoverPose must keep > 100.

        EVERY candidate above the match threshold is geometrically verified
        (the reference scans all qualifying pairs and keeps the global best
        by *inlier* count — a pair ranked low by match count can still win).
        Verification runs in fixed-size vmapped chunks so there is exactly
        one compiled program regardless of candidate count."""
        self.log("\n=== Starting Loop Closure Detection ===")
        k = int(state.kf_count)
        gap = max(3, k // 2)
        nfeat = np.asarray(jnp.sum(state.kp_valid, axis=1))
        # <100-descriptor pair gate (main.cpp:1382)
        enough = nfeat >= 100
        pairs = [(c, p) for c in range(gap, k) for p in range(0, c - gap + 1)
                 if enough[c] and enough[p]]
        if not pairs:
            self.log(f"  No loop closure detected (gap={gap} frames).")
            return LoopResult(found=False)
        pq = jnp.asarray([p[0] for p in pairs], jnp.int32)
        pt = jnp.asarray([p[1] for p in pairs], jnp.int32)
        counts = np.asarray(_pair_ratio_counts(
            state.signed, state.kp_valid, pq, pt,
            self.config.match.loop_ratio_threshold,
            detector=self.config.detector))
        lv = self.config.loop_verify
        cand = [i for i, c in enumerate(counts) if c > lv.min_matches]
        if not cand:
            self.log(f"  No loop closure detected (gap={gap} frames).")
            return LoopResult(found=False)

        # Verify ALL candidates, most-matched first, as ONE device program —
        # the reference's sequential verify loop (main.cpp:1386-1418) fanned
        # out as chunk-vmapped batched RANSAC. The scoring pass returns only
        # the 3-counter table (one small readback total); the winner is
        # re-verified once, with its original key, to fetch the geometry.
        # The candidate axis is padded to a bucket so the jit cache holds a
        # handful of shapes, not one per candidate count. Buckets are
        # power-of-two up to 256, then multiples of 256: at SIFT-4000/1080p
        # every gap pair qualifies (~1176 candidates) and verification costs
        # ~2 ms/candidate — a pure power-of-two pad (1176 -> 2048) wasted
        # ~1.8 s per run for cache granularity nothing needs.
        cand = sorted(cand, key=lambda i: -counts[i])
        c_real = len(cand)
        cb = self._bucket_fine(c_real, 1 << 20, floor=32)
        padded = cand + [cand[0]] * (cb - c_real)
        cq = jnp.asarray([pairs[i][0] for i in padded], jnp.int32)
        ct = jnp.asarray([pairs[i][1] for i in padded], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(7), cb)
        focal = float(self.K[0, 0] + self.K[1, 1]) * 0.5
        # motion-support radii in normalized units (pixel fracs / focal)
        w_est = 2.0 * float(self.K[0, 2])
        radius = max(self.config.match.motion_radius_frac * w_est,
                     24.0) / focal
        tau = max(self.config.match.motion_tau_frac * w_est, 8.0) / focal
        scores = np.asarray(_verify_loop_scores(
            state.signed, state.kp_valid, state.kp_norm, cq, ct, keys,
            focal, radius, tau, self.config.match.loop_ratio_threshold,
            self.config.detector, self.config.ransac))[:c_real]

        best = LoopResult(found=False)
        best_row = -1
        for row, i in enumerate(cand):
            mcount, ninl, npos = (int(v) for v in scores[row])
            ratio = ninl / max(mcount, 1)
            if (ninl > lv.min_inliers and ratio > lv.min_inlier_ratio
                    and ninl > best.num_inliers
                    and npos > lv.min_pose_inliers):
                c, p = pairs[i]
                best = LoopResult(found=True, curr_kf=c, past_kf=p,
                                  num_matches=mcount, num_inliers=ninl,
                                  num_pose_inliers=npos)
                best_row = row
        if best.found:
            cq1 = cq[best_row][None]
            ct1 = ct[best_row][None]
            k1 = keys[best_row][None]
            mcounts, midx, mmask, res = _verify_loop_candidates(
                state.signed, state.kp_valid, state.kp_norm, cq1, ct1, k1,
                focal, radius, tau,
                self.config.match.loop_ratio_threshold,
                self.config.detector, self.config.ransac)
            mask = np.asarray(res.pose_inliers[0])
            q_idx = np.arange(midx.shape[1])
            best.R_rel = np.asarray(res.R[0])
            best.t_rel = np.asarray(res.t[0])
            best.inlier_pairs = (q_idx[mask], np.asarray(midx[0])[mask])
            # Re-read the counters from THIS verification: the scoring pass
            # runs in a different XLA program (chunked lax.map) whose
            # fusion/reduction order can flip the winning hypothesis on
            # near-ties — the reported numbers must describe the returned
            # geometry, not the scoring pass's.
            best.num_matches = int(mcounts[0])
            best.num_inliers = int(res.num_inliers[0])
            best.num_pose_inliers = int(res.num_pose_inliers[0])
        if best.found:
            # reference success line (main.cpp:1425-1428)
            self.log(f"  Best loop closure: Frame {best.curr_kf} <-> "
                     f"Frame {best.past_kf} ({best.num_inliers} inliers)")
        else:
            self.log(f"  No loop closure detected (gap={gap} frames).")
        return best

    # -- backend -----------------------------------------------------------

    def optimize(self, state: MapState, loop: LoopResult) -> MapState:
        """PGO with the loop constraint (main.cpp:1423-1515)."""
        if not loop.found:
            return state
        k = int(state.kf_count)
        params = state.poses[:k]

        def drift_deg(poses_params):
            # rotation drift between the loop measurement and the odometry
            # chain (main.cpp:1476-1482, 1487-1491)
            Rc, _ = lie.params_to_pose(poses_params[loop.curr_kf])
            Rp, _ = lie.params_to_pose(poses_params[loop.past_kf])
            R_seq = Rc @ Rp.T
            ang = lie.rotation_error(jnp.asarray(loop.R_rel), R_seq)
            return float(jnp.degrees(ang))

        if self.config.pgo.method == PoseGraphMethod.GAUSS_NEWTON:
            self.log("  Using Gauss-Newton pose graph optimization...")
            g = pgo.build_trajectory_graph(
                params, jnp.asarray(loop.past_kf), jnp.asarray(loop.curr_kf),
                jnp.asarray(loop.R_rel), jnp.asarray(loop.t_rel),
                self.config.pgo.loop_edge_weight)
            self.log(f"  Built pose graph: {k} edges ({k - 1} sequential "
                     "+ 1 loop closure)")
            self.log(f"  Rotation drift before PGO: {drift_deg(params):g} "
                     "degrees")
            drift0 = float(pgo.total_cost(params, g))
            opt, costs = pgo.optimize_pose_graph(params, g, self.config.pgo)
            self.log(f"PGO cost: {drift0:.6f} -> {float(costs[-1]):.6f}")
            self.log(f"  Rotation drift after PGO: {drift_deg(opt):g} "
                     "degrees")
        else:
            self.log("  Using simple linear pose correction...")
            opt = pgo.simple_pose_correction(
                params, jnp.asarray(loop.past_kf), jnp.asarray(loop.curr_kf),
                jnp.asarray(loop.R_rel))
        poses = state.poses.at[:k].set(opt)
        state = state._replace(poses=poses)
        return self._add_loop_observations(state, loop)

    def _add_loop_observations(self, state: MapState,
                               loop: LoopResult) -> MapState:
        state, count = self._loop_obs_append(state, loop)
        if count:
            self.log(f"  Added {count} loop closure observations.")
        return state

    def _loop_obs_append(self, state: MapState, loop: LoopResult):
        """Add cross-observations of existing points between the loop frames
        via the track table (main.cpp:1494-1514). Host-side appends (runs
        once per reconstruction; the four track/keypoint rows come back in
        ONE device_get). Returns (state, observations added)."""
        qi, ti = loop.inlier_pairs
        track_c, track_p, uv_c, uv_p, base = jax.device_get(
            (state.kp_to_point[loop.curr_kf], state.kp_to_point[loop.past_kf],
             state.kp_xy[loop.curr_kf], state.kp_xy[loop.past_kf],
             state.obs_count))
        cams, pids, uvs = [], [], []
        for q, t in zip(qi, ti):
            pid_c, pid_p = track_c[q], track_p[t]
            if pid_p >= 0 and pid_c < 0:
                cams.append(loop.curr_kf), pids.append(pid_p), uvs.append(uv_c[q])
            elif pid_c >= 0 and pid_p < 0:
                cams.append(loop.past_kf), pids.append(pid_c), uvs.append(uv_p[t])
        if not cams:
            return state, 0
        base = int(base)
        o_cap = state.obs_cam.shape[0] - 1
        count = min(len(cams), o_cap - base)
        sl = slice(base, base + count)
        state = state._replace(
            obs_cam=state.obs_cam.at[sl].set(np.asarray(cams[:count],
                                                        np.int32)),
            obs_point=state.obs_point.at[sl].set(np.asarray(pids[:count],
                                                            np.int32)),
            obs_uv=state.obs_uv.at[sl].set(np.asarray(uvs[:count],
                                                      np.float32)),
            obs_valid=state.obs_valid.at[sl].set(True),
            obs_count=jnp.asarray(base + count, jnp.int32))
        return state, count

    def _log_reconstruction_summary(self, state: MapState):
        """Reference report block (main.cpp:1524-1538): keyframe / point /
        observation totals, the fixed origin pose, and the last keyframe's
        camera center."""
        k = int(state.kf_count)
        self.log("\n=== Reconstruction Summary ===")
        self.log(f"Number of keyframes: {k}")
        self.log(f"Total 3D points: {int(state.point_count)}")
        self.log(f"Total observations: {int(state.obs_count)}")
        self.log("\nFirst keyframe pose (origin):")
        self.log("  R = I, t = [0,0,0]")
        if k > 1:
            R, t = lie.params_to_pose(state.poses[k - 1])
            C = np.asarray(-R.T @ t)
            self.log(f"\nLast keyframe pose (keyframe {k - 1}, "
                     f"frame {int(state.kf_frame[k - 1])}):")
            self.log(f"  Camera center: [{C[0]:g}, {C[1]:g}, {C[2]:g}]")

    @staticmethod
    def _bucket_fine(n: int, cap: int, floor: int = 32,
                     step: int = 256) -> int:
        """Power-of-two buckets below ``step``, multiples of ``step`` above —
        for axes whose per-slot cost is high enough (~ms) that power-of-two
        padding wastes more device time than the extra compile cache entries
        cost (each distinct bucket is one compile, amortized by the
        persistent compilation cache)."""
        if n <= step:
            return SfMPipeline._bucket(n, cap, floor)
        return min(-(-n // step) * step, cap)

    @staticmethod
    def _bucket(n: int, cap: int, floor: int = 4096) -> int:
        """Smallest power-of-two >= n (>= floor, <= cap). The backend works
        on bucketed slices of the fixed-capacity arrays so its cost scales
        with the ACTUAL map size, not the declared capacity (a 96-keyframe
        run fills ~20k of the 262k observation slots; the per-iteration
        Jacobian/scatter passes and the batched 3x3 solves are linear in the
        padded size). Power-of-two buckets keep the jit cache small."""
        b = floor
        while b < n:
            b *= 2
        return min(b, cap)

    def _active_obs(self, state: MapState) -> ba.Observations:
        nb = self._bucket(int(state.obs_count) + 1, state.obs_cam.shape[0])
        return ba.Observations(state.obs_cam[:nb], state.obs_point[:nb],
                               state.obs_uv[:nb], state.obs_valid[:nb])

    def _mean_reproj(self, state: MapState) -> float:
        return float(ba.mean_reprojection_error(
            self.K, state.poses, state.points, self._active_obs(state)))

    def bundle_adjust(self, state: MapState,
                      outer_iterations: int | None = None):
        obs = self._active_obs(state)
        pb = self._bucket(int(state.point_count) + 1, state.points.shape[0])
        cp, pts, errs = ba.alternating_ba(
            self.K, state.poses, state.points[:pb], obs,
            state.point_valid[:pb], self.config.ba, outer_iterations)
        return state._replace(poses=cp,
                              points=state.points.at[:pb].set(pts)), errs

    def remove_outliers(self, state: MapState) -> MapState:
        k_mask = jnp.arange(state.poses.shape[0]) < state.kf_count
        obs = self._active_obs(state)
        pb = self._bucket(int(state.point_count) + 1, state.points.shape[0])
        res = outliers.remove_outliers(
            self.K, state.poses, k_mask, state.points[:pb],
            state.point_valid[:pb], obs, self.config.outlier)
        res = res._replace(
            point_valid=state.point_valid.at[:pb].set(res.point_valid),
            obs_valid=state.obs_valid.at[:obs.valid.shape[0]].set(
                res.obs_valid))
        # Reference outlier block (main.cpp:1620-1658) — counts, threshold,
        # and post-filter totals.
        n_out = int(res.n_outliers)
        before = max(int(res.n_points_before), 1)
        self.log(f"  Outliers detected: {n_out} / {before} "
                 f"({100.0 * n_out / before:.1f}%)")
        self.log(f"  Distance threshold: {float(res.distance_threshold):g}")
        state = state._replace(point_valid=res.point_valid,
                               obs_valid=res.obs_valid)
        self.log(f"  Points after filtering: "
                 f"{int(jnp.sum(res.point_valid.astype(jnp.int32)))}")
        self.log(f"  Observations after filtering: "
                 f"{int(jnp.sum(res.obs_valid.astype(jnp.int32)))}")
        return state

    def run_backend(self, state: MapState, loop: LoopResult):
        """The post-loop-search backend (PGO -> BA -> outlier removal -> BA,
        main.cpp:1423-1669) as ONE fused device program + ONE metrics
        readback — the staged methods above pay ~15 sequential dispatch
        round trips (~40-100 ms each on this runtime) for the same math.
        Logging (reference format) happens after the readback with the
        fused program's own counters.

        Returns (state, e0, e1, e2): the three reprojection figures the
        reference prints (before BA, after BA, final)."""
        n_loop_obs = 0
        if loop.found:
            state, n_loop_obs = self._loop_obs_append(state, loop)
        kf_count, counts0, counts1, kf_frame = jax.device_get(
            (state.kf_count, state.point_count, state.obs_count,
             state.kf_frame))
        k = int(kf_count)
        counts = (int(counts0), int(counts1))
        pb = self._bucket(counts[0] + 1, state.points.shape[0])
        nb = self._bucket(counts[1] + 1, state.obs_cam.shape[0])
        zeros3 = np.zeros(3, np.float32)
        cp, points, point_valid, obs_valid_b, metrics = _backend_program(
            self.K, state.poses, state.points, state.point_valid,
            state.obs_cam, state.obs_point, state.obs_uv, state.obs_valid,
            jnp.asarray(max(loop.past_kf, 0), jnp.int32),
            jnp.asarray(max(loop.curr_kf, 0), jnp.int32),
            jnp.asarray(loop.R_rel if loop.found else np.eye(3),
                        jnp.float32),
            jnp.asarray(loop.t_rel if loop.found else zeros3, jnp.float32),
            k=k, pb=pb, nb=nb, has_loop=loop.found, cfg=self.config)
        m = jax.device_get(metrics)  # the single backend readback
        state = state._replace(
            poses=cp, points=points, point_valid=point_valid,
            obs_valid=state.obs_valid.at[:nb].set(obs_valid_b))

        # reference log block, in the reference's order, from the fused
        # program's own counters (main.cpp:1423-1669)
        if loop.found:
            if self.config.pgo.method == PoseGraphMethod.GAUSS_NEWTON:
                self.log("  Using Gauss-Newton pose graph optimization...")
                self.log(f"  Built pose graph: {k} edges ({k - 1} sequential "
                         "+ 1 loop closure)")
                self.log(f"  Rotation drift before PGO: "
                         f"{float(m['drift0_deg']):g} degrees")
                self.log(f"PGO cost: {float(m['cost0']):.6f} -> "
                         f"{float(m['cost_last']):.6f}")
                self.log(f"  Rotation drift after PGO: "
                         f"{float(m['drift1_deg']):g} degrees")
            else:
                self.log("  Using simple linear pose correction...")
            if n_loop_obs:
                self.log(f"  Added {n_loop_obs} loop closure observations.")
        self.log("\n=== Reconstruction Summary ===")
        self.log(f"Number of keyframes: {k}")
        self.log(f"Total 3D points: {int(counts[0])}")
        self.log(f"Total observations: {int(counts[1])}")
        self.log("\nFirst keyframe pose (origin):")
        self.log("  R = I, t = [0,0,0]")
        if k > 1:
            C = m["center_last"]
            self.log(f"\nLast keyframe pose (keyframe {k - 1}, "
                     f"frame {int(kf_frame[k - 1])}):")
            self.log(f"  Camera center: [{C[0]:g}, {C[1]:g}, {C[2]:g}]")
        e0 = float(m["e0"])
        e1 = float(m["errs1"][-1])
        self.log(f"\nReprojection error BEFORE BA: {e0:g} px")
        self.log(f"\nReprojection error AFTER BA: {e1:g} px")
        self.log("\n=== Outlier Removal ===")
        n_out = int(m["n_outliers"])
        before = max(int(m["n_points_before"]), 1)
        self.log(f"  Outliers detected: {n_out} / {before} "
                 f"({100.0 * n_out / before:.1f}%)")
        self.log(f"  Distance threshold: {float(m['distance_threshold']):g}")
        self.log(f"  Points after filtering: {int(m['pts_after'])}")
        self.log(f"  Observations after filtering: {int(m['obs_after'])}")
        self.log("\n=== Final Bundle Adjustment ===")
        self.log(f"Reprojection error after filtering: {float(m['ef']):g} px")
        e2 = float(m["errs2"][-1])
        self.log(f"\nFINAL reprojection error: {e2:g} px")
        return state, e0, e1, e2

    # -- end-to-end --------------------------------------------------------

    def run(self, frames: np.ndarray, data_dir: str = "data",
            write_obj: bool = True, checkpoint: bool = False) -> SfMResult:
        """Full reconstruction. With ``checkpoint`` the map state is saved
        after the front-end and after PGO (NPZ under
        <data_dir>/checkpoints/), and a matching existing front-end
        checkpoint is reused — extending the reference's skip-if-exists
        extraction cache (main.cpp:97-100) to the compute stages."""
        from slam_loop_closing_tpu.utils import checkpoint as ckpt

        infos: list[StepInfo] = []
        fe_path = ckpt.stage_checkpoint_path(data_dir, "frontend")
        if checkpoint and fe_path.exists():
            self.log(f"Resuming map state from {fe_path}")
            state = ckpt.load_map_state(fe_path)
        elif self.use_scan:
            state, infos = self.run_frontend_and_keyframes_scan(frames)
            if checkpoint:
                ckpt.save_map_state(fe_path, state)
        else:
            state, infos = self.run_frontend_and_keyframes(frames)
            if checkpoint:
                ckpt.save_map_state(fe_path, state)
        loop = self.find_loop(state)
        if not checkpoint:
            # fast path: the whole backend as one fused device program
            # (identical math to the staged methods below — run_backend)
            state, e0, e1, e2 = self.run_backend(state, loop)
        else:
            # staged path: materializes the after-PGO state the stage
            # checkpoint contract needs
            state = self.optimize(state, loop)
            ckpt.save_map_state(
                ckpt.stage_checkpoint_path(data_dir, "pgo"), state)

            self._log_reconstruction_summary(state)

            e0 = self._mean_reproj(state)
            self.log(f"\nReprojection error BEFORE BA: {e0:g} px")
            state, errs = self.bundle_adjust(state)
            e1 = float(errs[-1])
            self.log(f"\nReprojection error AFTER BA: {e1:g} px")

            self.log("\n=== Outlier Removal ===")
            state = self.remove_outliers(state)
            self.log("\n=== Final Bundle Adjustment ===")
            ef = self._mean_reproj(state)
            self.log(f"Reprojection error after filtering: {ef:g} px")
            state, errs2 = self.bundle_adjust(state, outer_iterations=3)
            e2 = float(errs2[-1])
            self.log(f"\nFINAL reprojection error: {e2:g} px")

        obj_path = None
        if write_obj:
            k = int(state.kf_count)
            Rs, ts = lie.params_to_pose_batch(state.poses[:k])
            obj_path = str(io_utils.write_obj(
                io_utils.reconstruction_obj_path(data_dir),
                np.asarray(state.points[:-1]), np.asarray(Rs), np.asarray(ts),
                point_valid=np.asarray(state.point_valid[:-1]),
                log=self.log))
        return SfMResult(state=state, infos=infos, loop=loop,
                         reproj_before_ba=e0, reproj_after_ba=e1,
                         reproj_final=e2, obj_path=obj_path)
