"""Full Version-B SfM benchmark: front-end + keyframe scan + loop search +
PGO + alternating BA + outlier removal on a synthetic closed-loop sequence
(the reference main.cpp pipeline, end to end)."""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def main(frames=96, h=540, w=960, num_features=1000):
    from slam_loop_closing_tpu.config import (CameraConfig, KeyframeConfig,
                                              LoopVerifyConfig, OrbConfig,
                                              PipelineConfig, RansacConfig)
    from slam_loop_closing_tpu.models.sfm import SfMPipeline
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    cam = CameraConfig(fx=0.8 * w, fy=0.8 * w, cx=w / 2, cy=h / 2,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    cfg = dataclasses.replace(
        PipelineConfig(),
        camera=cam,
        orb=OrbConfig(num_features=num_features, grid_cell=8),
        keyframe=KeyframeConfig(min_median_displacement=2.0,
                                max_median_displacement=300.0,
                                min_tracked_features=60,
                                min_inlier_ratio=0.3, min_inliers=40),
        loop_verify=LoopVerifyConfig(min_matches=60, min_inliers=40,
                                     min_inlier_ratio=0.4,
                                     min_pose_inliers=20),
        ransac=RansacConfig(num_hypotheses=256),
    )
    video = orbit_sequence(num_frames=frames, h=h, w=w, num_points=400)
    pipe = SfMPipeline(cfg, max_keyframes=frames, max_points=65536,
                       max_obs=262144, use_scan=True, log=lambda *a: None)
    # warmup/compile at the FULL shape (a shorter prefix would change the
    # scan length and static array sizes, recompiling everything in the
    # timed run)
    pipe.run(video, write_obj=False)
    t0 = time.perf_counter()
    res = pipe.run(video, write_obj=False)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "sfm_reconstruct_end_to_end",
        "value": round(frames / dt, 2),
        "unit": "frames/sec",
        "vs_baseline": None,
        "keyframes": int(res.state.kf_count),
        "points": int(res.state.point_count),
        "loop_found": bool(res.loop.found),
        "reproj_before_ba_px": round(res.reproj_before_ba, 3),
        "reproj_final_px": round(res.reproj_final, 3),
    }))


if __name__ == "__main__":
    main()
