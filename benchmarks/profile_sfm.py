"""Stage-level wall-clock profile of the Version-B SfM pipeline
(``SfMPipeline.run`` reproduced step by step with a forced readback between
stages) — the measurement tool behind the round-4 backend-overhead work
(reference pipeline: main.cpp:1041-1685).

Stages timed:
  frontend+scan   _frontend + keyframe lax.scan (device-resident input)
  loop_counts     find_loop's candidate match-count pass
  loop_verify     chunk-vmapped RANSAC verification of the candidates
  pgo             optimize(): graph build + GN solve + drift logs
  reproj0         mean reprojection before BA
  ba1             5-outer alternating BA
  outliers        outlier removal + its count readbacks
  ba2             3-outer alternating BA (+ final reproj logs)

Everything after the scan is "backend" for the VERDICT r4 item-4 budget.
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

    import jax

    from slam_loop_closing_tpu.config import (CameraConfig, KeyframeConfig,
                                              LoopVerifyConfig, OrbConfig,
                                              PipelineConfig, SiftConfig,
                                              RansacConfig)
    from slam_loop_closing_tpu.models.sfm import SfMPipeline
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    h, w, frames = args.height, args.width, args.frames
    cam = CameraConfig(fx=0.8 * w, fy=0.8 * w, cx=w / 2, cy=h / 2,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    cfg = dataclasses.replace(
        PipelineConfig(),
        camera=cam,
        detector=args.detector,
        orb=OrbConfig(num_features=args.num_features, grid_cell=8),
        sift=dataclasses.replace(SiftConfig(),
                                 num_features=args.num_features),
        keyframe=KeyframeConfig(min_median_displacement=2.0,
                                max_median_displacement=300.0,
                                min_tracked_features=60,
                                min_inlier_ratio=0.25, min_inliers=40),
        loop_verify=LoopVerifyConfig(min_matches=60, min_inliers=40,
                                     min_inlier_ratio=0.4,
                                     min_pose_inliers=20),
        ransac=RansacConfig(num_hypotheses=1024),
    )
    video = orbit_sequence(num_frames=frames, h=h, w=w, num_points=400)
    video = (np.clip(video, 0, 1) * 255).astype(np.uint8)
    pipe = SfMPipeline(cfg, max_keyframes=frames, max_points=65536,
                       max_obs=262144, use_scan=True, log=lambda *a: None)
    video_dev = jax.device_put(video)
    np.asarray(video_dev.ravel()[:2])

    # warm every program at shape: the fused-path run() plus one pass of
    # the staged backend sequence (different XLA programs)
    pipe.run(video_dev, write_obj=False)

    def staged(state, loop):
        state = pipe.optimize(state, loop)
        pipe._mean_reproj(state)
        state, _ = pipe.bundle_adjust(state)
        state = pipe.remove_outliers(state)
        pipe._mean_reproj(state)
        state, errs2 = pipe.bundle_adjust(state, outer_iterations=3)
        return state, errs2

    state_w, _ = pipe.run_frontend_and_keyframes_scan(video_dev)
    loop_w = pipe.find_loop(state_w)
    staged(state_w, loop_w)

    def sync(x):
        # read one element of EVERY device leaf: a single leaf can be an
        # input passthrough (e.g. state.kf_count through bundle_adjust),
        # whose buffer is already materialized — reading it would time the
        # enqueue, not the compute
        for arr in jax.tree.leaves(x):
            np.asarray(np.ravel(np.asarray(arr))[:1])

    t = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        t[name] = round(time.perf_counter() - t0, 4)
        return out

    state, _ = clock("frontend_scan",
                     lambda: pipe.run_frontend_and_keyframes_scan(video_dev))
    loop = clock("loop_search", lambda: pipe.find_loop(state))
    state0 = state
    state = clock("pgo", lambda: pipe.optimize(state, loop))
    clock("reproj0", lambda: pipe._mean_reproj(state))
    state, errs = clock("ba1", lambda: pipe.bundle_adjust(state))
    state = clock("outliers", lambda: pipe.remove_outliers(state))
    clock("reproj1", lambda: pipe._mean_reproj(state))
    state, errs2 = clock("ba2",
                         lambda: pipe.bundle_adjust(state,
                                                    outer_iterations=3))
    # the fused single-program backend (what run() actually uses)
    clock("backend_fused", lambda: pipe.run_backend(state0, loop)[0])
    total = sum(t.values()) - t["backend_fused"]
    backend_staged = total - t["frontend_scan"] - t["loop_search"]
    e2e_fused = (t["frontend_scan"] + t["loop_search"]
                 + t["backend_fused"])
    print(json.dumps({
        "metric": f"sfm_stage_profile_{args.detector}"
                  f"{args.num_features}_{h}p",
        "value": round(e2e_fused, 3),
        "unit": "seconds",
        "vs_baseline": None,
        "stages_s": t,
        "backend_staged_s": round(backend_staged, 3),
        "backend_fused_s": t["backend_fused"],
        "fps_equivalent": round(frames / e2e_fused, 2),
        "keyframes": int(state.kf_count),
    }))


if __name__ == "__main__":
    main()
