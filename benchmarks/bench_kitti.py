"""KITTI odometry seq-00 loop-detection benchmark (BASELINE.json configs[4]):
4541 frames through the ORB front-end + banded all-pairs similarity + batched
RANSAC verification of the top candidates — the path that replaces the
reference's O(K^2) sequential loop search (main.cpp:1362-1421) at 45x the
reference's frame count.

The dataset is not bundled: pass --kitti-root (see utils/kitti.py for the
expected layout). Without it, the script falls back to a synthetic orbit of
the same LENGTH so the scaling path (block-banded similarity over ~10M frame
pairs + the verification fan-out) is still exercised end to end; the orbit's
exact closure (frames i, j with i - j ~ F) provides ground truth for the
recall report. With --kitti-root and a poses file, recall is measured
against kitti.gt_loop_pairs instead.

Stage timings use forced host readbacks (block_until_ready does not reliably
synchronize on this runtime — docs/PERFORMANCE.md "Profiling method").
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    from _common import setup_cache
    setup_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti-root", default=None)
    ap.add_argument("--fixture", choices=["orbit", "multi-loop"],
                    default="orbit",
                    help="synthetic stand-in when no dataset: single-closure"
                         " orbit, or the hard multi-region fixture with a"
                         " distractor pass (utils.synth_video."
                         "multi_loop_sequence)")
    ap.add_argument("--seq", default="00")
    ap.add_argument("--frames", type=int, default=4541)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--num-features", type=int, default=1000)
    ap.add_argument("--min-gap", type=int, default=100)
    ap.add_argument("--batch", type=int, default=64,
                    help="front-end frame batch per device step")
    ap.add_argument("--verify-top", type=int, default=256,
                    help="candidates fed to batched RANSAC verification")
    ap.add_argument("--recall-tol", type=int, default=10,
                    help="frame tolerance for the recall report")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from slam_loop_closing_tpu.config import OrbConfig, RansacConfig
    from slam_loop_closing_tpu.models.sfm import _verify_loop_scores
    from slam_loop_closing_tpu.ops import matching, orb
    from slam_loop_closing_tpu.utils import kitti
    from slam_loop_closing_tpu.utils.synth_video import (
        ground_truth_loop_pairs, multi_loop_sequence, orbit_sequence)

    # grid-adapted selection, as in the 1080p headline bench (one keypoint
    # per 8x8 cell — OpenCV-ORB-style spreading)
    cfg = OrbConfig(num_features=args.num_features, grid_cell=8)
    t_load0 = time.perf_counter()
    gt_pairs: list[tuple[int, int]] = []
    if args.kitti_root and kitti.available(args.kitti_root, args.seq):
        from slam_loop_closing_tpu.utils import native

        paths = kitti.frame_paths(args.kitti_root, args.seq)[: args.frames]
        frames = native.load_frames_gray_native(paths, args.height,
                                                args.width)
        source = f"kitti-{args.seq}"
        K = kitti.load_intrinsics(args.kitti_root, args.seq)
        gt = kitti.load_gt_poses(args.kitti_root, args.seq)
        if gt is not None:
            gt_pairs = kitti.gt_loop_pairs(gt[: args.frames],
                                           min_gap=args.min_gap)
    elif args.fixture == "multi-loop":
        # the HARD stand-in: two true revisit regions + a distractor pass
        # over a fully height-separated texture band (near-revisit poses,
        # unrelated views — verification must reject it). thetas/ys give
        # exact pose ground truth; pairs at intermediate heights or within
        # the cylinder's co-visibility range are scored as ignore.
        distractor_dy = 16.0
        frames, ml_thetas, ml_ys = multi_loop_sequence(
            num_frames=args.frames, h=args.height, w=args.width,
            num_points=1600, distractor_dy=distractor_dy)
        source = "synthetic-multi-loop"
        f_px = 0.8 * args.width
        K = np.array([[f_px, 0, args.width / 2],
                      [0, f_px, args.height / 2], [0, 0, 1.0]])
        sp = float(np.max(np.abs(np.diff(ml_thetas))))
        gt = ground_truth_loop_pairs(ml_thetas, ml_ys, min_gap=args.min_gap,
                                     tol_theta=max(0.08, 0.8 * sp))
        gt_pairs = list(zip(*map(list, np.nonzero(gt))))
    else:
        # synthetic stand-in with the same frame count and resolution; the
        # orbit's exact closure gives ground-truth loop pairs at i - j ~ F.
        # num_points=1600 gives a texture fine enough that frames at
        # unrelated orbit angles DON'T cross the 0.15 similarity threshold
        # (at the 400-point default the whole band fires and the Version-A
        # rule is vacuous at this frame count)
        frames = orbit_sequence(num_frames=args.frames, h=args.height,
                                w=args.width, num_points=1600)
        source = "synthetic"
        f_px = 0.8 * args.width
        K = np.array([[f_px, 0, args.width / 2],
                      [0, f_px, args.height / 2], [0, 0, 1.0]])
        wdw = max(2, args.frames // 100)
        gt_pairs = [(i, j) for i in range(args.frames - wdw, args.frames)
                    for j in range(0, i - args.frames + wdw + 1)
                    if i - j >= args.min_gap]
    t_load = time.perf_counter() - t_load0
    b = frames.shape[0]
    print(f"# {source}: {b} frames {frames.shape[1]}x{frames.shape[2]} "
          f"(loaded in {t_load:.1f}s)")

    # Front-end in device-sized batches (one jit, reused). Frames ship as
    # uint8 and convert on device — host->device bandwidth is the wall here.
    fe = jax.jit(lambda x: orb.detect_and_describe_batch(
        x.astype(jnp.float32) / 255.0, cfg))
    frames_u8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    n = cfg.num_features
    # Chunked upload interleaved with detection (measured faster than one
    # bulk device_put on this tunnel), descriptors kept on device; then a
    # second pass over the now-resident chunks isolates pure device compute
    # (the tunnel runs at single-digit MB/s — an environment property, not
    # a design one — so both numbers are reported).
    dev_chunks, s_chunks, v_chunks, xy_chunks = [], [], [], []
    # warm/compile the front-end program outside the timed region
    np.asarray(fe(jnp.zeros((args.batch, frames.shape[1], frames.shape[2]),
                            jnp.uint8)).keypoints.valid[:1])
    t0 = time.perf_counter()
    for s in range(0, b, args.batch):
        e = min(s + args.batch, b)
        chunk = np.zeros((args.batch, frames.shape[1], frames.shape[2]),
                         np.uint8)
        chunk[: e - s] = frames_u8[s:e]
        dev = jnp.asarray(chunk)
        feats = fe(dev)
        dev_chunks.append(dev)
        s_chunks.append(feats.signed[: e - s])
        v_chunks.append(feats.keypoints.valid[: e - s])
        xy_chunks.append(feats.keypoints.xy[: e - s])
    signed = jnp.concatenate(s_chunks)
    valid = jnp.concatenate(v_chunks)
    xy = jnp.concatenate(xy_chunks)
    np.asarray(valid[:1])  # sync
    t_frontend = time.perf_counter() - t0

    t0 = time.perf_counter()
    for dev in dev_chunks:
        out = fe(dev)
    np.asarray(out.keypoints.valid[:1])  # sync
    t_fe_compute = time.perf_counter() - t0
    del dev_chunks

    # Banded all-pairs similarity (the O(F^2) part). Chunked: one program
    # holding all ~2.5k band tiles runs long enough to trip the device
    # watchdog at this scale.
    t0 = time.perf_counter()
    cnp = matching.banded_pair_counts_chunked(
        signed, valid, args.min_gap, block=64)
    t_pairs = time.perf_counter() - t0

    # Version-A detection rule over the band -> predicted loop pairs
    nfeat = np.asarray(jnp.sum(valid, axis=1)).astype(np.int64)
    denom = np.maximum(np.minimum(nfeat[:, None], nfeat[None, :]), 1)
    sims = cnp / denom
    pred_mask = (sims > 0.15) & (cnp >= 50)
    pred_pairs = list(zip(*np.nonzero(pred_mask)))

    # Batched RANSAC verification of the top candidates (the reference's
    # findEssentialMat verify, main.cpp:1395-1418, fanned out as one
    # chunk-vmapped device program via models/sfm._verify_loop_scores).
    qi, ti = np.nonzero(cnp > 0)
    order = np.argsort(-cnp[qi, ti])[: args.verify_top]
    verified = []
    t_verify = 0.0
    if order.size:
        fx, fy = float(K[0, 0]), float(K[1, 1])
        cx, cy = float(K[0, 2]), float(K[1, 2])
        norm = (xy - jnp.asarray([cx, cy], jnp.float32)) / jnp.asarray(
            [fx, fy], jnp.float32)
        cq = jnp.asarray(qi[order], jnp.int32)
        ct = jnp.asarray(ti[order], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(11), int(order.size))
        focal = 0.5 * (fx + fy)
        radius = max(0.26 * cx * 2.0, 24.0) / focal
        tau = max(0.032 * cx, 8.0) / focal
        # warm/compile the verify program outside the timed region (a cold
        # remote compile here previously billed ~25 s to verify_s)
        np.asarray(_verify_loop_scores(
            signed, valid, norm, cq, ct, keys, focal, radius, tau,
            0.7, "orb", RansacConfig()))
        t0 = time.perf_counter()
        scores = np.asarray(_verify_loop_scores(
            signed, valid, norm, cq, ct, keys, focal, radius, tau,
            0.7, "orb", RansacConfig()))
        t_verify = time.perf_counter() - t0
        for row in range(int(order.size)):
            mcount, ninl, npos = (int(v) for v in scores[row])
            if ninl >= 25 and npos >= 15:
                verified.append((int(cq[row]), int(ct[row]), ninl))

    recall = kitti.loop_recall(pred_pairs, gt_pairs, tol=args.recall_tol)
    vpairs = [(q, t) for q, t, _ in verified]
    recall_verified = kitti.loop_recall(vpairs, gt_pairs,
                                        tol=args.recall_tol)
    precision_verified = kitti.loop_precision(vpairs, gt_pairs,
                                              tol=args.recall_tol)
    extra = {}
    if source == "synthetic-multi-loop":
        # pose-exact scoring on the hard fixture: cross-band verifications
        # are hard false positives (the distractor pass — MUST be 0);
        # same-band pairs within the cylinder's co-visibility range and
        # transition-height pairs are ignore, not errors
        dth = np.abs(ml_thetas[:, None] - ml_thetas[None, :])
        dth = np.minimum(dth, 2 * np.pi - dth)
        dyy = np.abs(ml_ys[:, None] - ml_ys[None, :])
        cross = [p for p in vpairs if dyy[p] >= distractor_dy - 2.0]
        gtst = set(gt_pairs)
        tolr = args.recall_tol
        hard_fp = [p for p in vpairs
                   if not any(abs(p[0] - g[0]) <= tolr
                              and abs(p[1] - g[1]) <= tolr for g in gtst)
                   and not (1.0 < dyy[p] < distractor_dy - 2.0)
                   and dth[p] >= 0.7]
        extra = {
            "verified_cross_band": len(cross),
            "verified_hard_fp": len(hard_fp),
            "precision_excl_covisible":
                round(1.0 - (len(hard_fp) + len(cross))
                      / max(len(vpairs), 1), 4),
        }

    n_band_pairs = sum(max(0, i - args.min_gap + 1) for i in range(b))
    total = t_frontend + t_pairs + t_verify
    print(json.dumps({
        "metric": f"kitti_seq{args.seq}_loop_detection",
        "value": round(b / total, 2),
        "unit": "frames/sec",
        "vs_baseline": None,
        "source": source,
        "frontend_s": round(t_frontend, 2),
        "frontend_compute_s": round(t_fe_compute, 2),
        "all_pairs_s": round(t_pairs, 2),
        "verify_s": round(t_verify, 2),
        "compute_fps": round(b / (t_fe_compute + t_pairs + t_verify), 2),
        "banded_pairs": n_band_pairs,
        "pairs_per_sec": round(n_band_pairs / t_pairs, 0),
        "top_candidate": int(cnp.max()),
        "predicted_loops": len(pred_pairs),
        "verified_loops": len(verified),
        "gt_pairs": len(gt_pairs),
        "recall": round(recall, 4),
        "recall_verified": round(recall_verified, 4),
        "precision_verified": round(precision_verified, 4),
        **extra,
    }))


if __name__ == "__main__":
    main()
