"""Full Version-B SfM benchmark: front-end + keyframe scan + loop search +
PGO + alternating BA + outlier removal on a synthetic closed-loop sequence
(the reference main.cpp pipeline, end to end).

Two configurations:
  default        — ORB-1000 at 540p (the TPU-native fast path)
  --detector sift --num-features 4000 --height 1080 --width 1920
                 — the configuration the reference actually ships
                   (cv::SIFT::create(4000) at iPhone resolution,
                   main.cpp:502, main.cpp:1076-1084)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main(argv=None):
    from _common import setup_cache
    setup_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--num-features", type=int, default=1000)
    ap.add_argument("--detector", choices=["orb", "sift"], default="orb")
    args = ap.parse_args(argv)
    frames, h, w = args.frames, args.height, args.width
    num_features = args.num_features

    from slam_loop_closing_tpu.config import (CameraConfig, KeyframeConfig,
                                              LoopVerifyConfig, OrbConfig,
                                              PipelineConfig, RansacConfig,
                                              SiftConfig)
    from slam_loop_closing_tpu.models.sfm import SfMPipeline
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    cam = CameraConfig(fx=0.8 * w, fy=0.8 * w, cx=w / 2, cy=h / 2,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    cfg = dataclasses.replace(
        PipelineConfig(),
        camera=cam,
        detector=args.detector,
        orb=OrbConfig(num_features=num_features, grid_cell=8),
        # flat (non-grid) SIFT selection: grid_cell=4 measured ~equal speed
        # here but flips near-gate frames on the synthetic orbit
        sift=dataclasses.replace(SiftConfig(), num_features=num_features),
        # min_inlier_ratio 0.25 instead of the reference's 0.3
        # (main.cpp:40): the synthetic orbit's repetitive texture yields
        # ~0.28 SIFT match purity on some frames; one rejection cascades
        # (the next frame matches the stale keyframe at 2x baseline), which
        # measures gate tuning rather than throughput.
        keyframe=KeyframeConfig(min_median_displacement=2.0,
                                max_median_displacement=300.0,
                                min_tracked_features=60,
                                min_inlier_ratio=0.25, min_inliers=40),
        loop_verify=LoopVerifyConfig(min_matches=60, min_inliers=40,
                                     min_inlier_ratio=0.4,
                                     min_pose_inliers=20),
        # 1024 hypotheses: the synthetic orbit's repeating texture yields
        # ~0.4 match purity with occasional coherent false clusters; a
        # larger batch makes the per-frame miss probability negligible and
        # costs microseconds on the MXU (one [H, N] Sampson pass).
        ransac=RansacConfig(num_hypotheses=1024),
    )
    import jax

    # uint8 (the PNG extraction stage's native dtype): host->device ships
    # 4x less data through the tunnel than float32
    video = orbit_sequence(num_frames=frames, h=h, w=w, num_points=400)
    video = (np.clip(video, 0, 1) * 255).astype(np.uint8)
    pipe = SfMPipeline(cfg, max_keyframes=frames, max_points=65536,
                       max_obs=262144, use_scan=True, log=lambda *a: None)

    # Primary metric: frames DEVICE-RESIDENT before the timed region — the
    # same measurement contract as bench.py (the host tunnel on this machine
    # runs at a variable 7-45 MB/s, an environment artifact that would
    # otherwise dominate and randomize the number; the reference likewise
    # reads pre-extracted frames from local disk, main.cpp:1141).
    # with_transfer_fps reports the same run timed WITH the chunk-pipelined
    # uint8 host->device upload included.
    video_dev = jax.device_put(video)
    np.asarray(video_dev.ravel()[:2])  # sync (axon readback quirk)
    # warmup/compile at the FULL shape (a shorter prefix would change the
    # scan length and static array sizes, recompiling everything in the
    # timed run)
    pipe.run(video_dev, write_obj=False)
    t0 = time.perf_counter()
    res = pipe.run(video_dev, write_obj=False)
    dt = time.perf_counter() - t0

    pipe.run(video, write_obj=False)  # warm the chunk-pipelined host path
    t0 = time.perf_counter()
    res_h = pipe.run(video, write_obj=False)
    dt_h = time.perf_counter() - t0
    assert bool(res_h.loop.found) == bool(res.loop.found)

    print(json.dumps({
        "metric": f"sfm_reconstruct_end_to_end_{args.detector}"
                  f"{num_features}_{h}p",
        "value": round(frames / dt, 2),
        "unit": "frames/sec",
        "vs_baseline": None,
        "with_transfer_fps": round(frames / dt_h, 2),
        "keyframes": int(res.state.kf_count),
        "points": int(res.state.point_count),
        "loop_found": bool(res.loop.found),
        "reproj_before_ba_px": round(res.reproj_before_ba, 3),
        "reproj_final_px": round(res.reproj_final, 3),
    }))


if __name__ == "__main__":
    main()
