"""Version-B sharded-path benchmark on REAL hardware (VERDICT r4 item 2).

Runs ``parallel.sharded.sfm_reconstruct_sharded`` (DP front-end +
edge-sharded PGO + observation-sharded BA; reference main.cpp:1041-1685
under SURVEY.md §2.11) and ``process_videos_sharded`` on a mesh over ALL
available devices — on the single-chip TPU this is a 1-device mesh, which
measures the per-chip cost of the shard_map formulation itself (the number
the x-N multi-chip extrapolation must be based on). The virtual 8-device
equality tests (tests/test_parallel.py) cover correctness of the
collectives; THIS bench proves the same composition compiles and holds
parity on the actual TPU runtime, where Pallas-inside-shard_map behaves
differently from the CPU interpret path.

Parity asserted against the staged single-device twin: keyframe count,
loop decision, point count, and final reprojection error (tolerance-level —
GSPMD psum reduction order differs from the single-device scatter; see
tests/test_parallel.py).

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

B = int(os.environ.get("BENCH_FRAMES", "64"))
H = int(os.environ.get("BENCH_H", "540"))
W = int(os.environ.get("BENCH_W", "960"))
NFEAT = int(os.environ.get("BENCH_FEATURES", "1000"))


def main():
    from _common import setup_cache
    setup_cache()

    import dataclasses

    import jax.numpy as jnp

    from slam_loop_closing_tpu.config import (CameraConfig, KeyframeConfig,
                                              LoopVerifyConfig, OrbConfig,
                                              PipelineConfig, RansacConfig)
    from slam_loop_closing_tpu.models.sfm import SfMPipeline
    from slam_loop_closing_tpu.parallel import mesh as mesh_lib
    from slam_loop_closing_tpu.parallel import sharded
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    cam = CameraConfig(fx=0.8 * W, fy=0.8 * W, cx=W / 2, cy=H / 2,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    cfg = dataclasses.replace(
        PipelineConfig(),
        camera=cam,
        orb=OrbConfig(num_features=NFEAT, grid_cell=8),
        keyframe=KeyframeConfig(min_median_displacement=2.0,
                                max_median_displacement=250.0,
                                min_tracked_features=40,
                                min_inlier_ratio=0.3, min_inliers=25),
        loop_verify=LoopVerifyConfig(min_matches=40, min_inliers=30,
                                     min_inlier_ratio=0.5,
                                     min_pose_inliers=15),
        ransac=RansacConfig(num_hypotheses=128),
    )
    frames = orbit_sequence(num_frames=B, h=H, w=W, num_points=900)
    mesh = mesh_lib.make_mesh()
    d = mesh.devices.size
    fr = jnp.asarray(frames)  # device-resident: measures compute, not tunnel

    def build():
        return SfMPipeline(cfg, max_keyframes=128, max_points=16384,
                           max_obs=65536, use_scan=True, log=lambda *a: None)

    def run_plain():
        pipe = build()
        s, _ = pipe.run_frontend_and_keyframes_scan(fr)
        loop = pipe.find_loop(s)
        s = pipe.optimize(s, loop)
        s, errs1 = pipe.bundle_adjust(s)
        s = pipe.remove_outliers(s)
        s, errs2 = pipe.bundle_adjust(s, outer_iterations=3)
        return s, {"loop_found": loop.found, "keyframes": int(s.kf_count),
                   "e2": float(np.asarray(errs2)[-1])}

    def run_shard():
        pipe = build()
        s, m = sharded.sfm_reconstruct_sharded(mesh, pipe, fr)
        return s, m

    def time_path(f, reps=2):
        s, m = f()  # warm-up/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            s, m = f()
        return (time.perf_counter() - t0) / reps, s, m

    t_plain, s1, m1 = time_path(run_plain)
    t_shard, s2, m2 = time_path(run_shard)

    kf_equal = int(s2.kf_count) == int(s1.kf_count)
    loop_equal = bool(m2["loop_found"]) == bool(m1["loop_found"])
    e2_close = abs(m2["e2"] - m1["e2"]) < 5e-2
    pt_equal = int(np.asarray(s2.point_count)) == int(
        np.asarray(s1.point_count))

    # multi-video sharded smoke on the same hardware mesh
    vids = np.stack([frames[:B // 2], frames[B // 2:]])
    t0 = time.perf_counter()
    per_video = sharded.process_videos_sharded(mesh, vids, cfg)
    t_mv = time.perf_counter() - t0
    mv_loops = sum(len(v) for v in per_video)

    print(json.dumps({
        "metric": "sfm_sharded_vs_plain_540p",
        "value": round(B / t_shard, 2),
        "unit": "frames/sec",
        "vs_baseline": None,
        "devices": d,
        "plain_fps": round(B / t_plain, 2),
        "sharded_over_plain": round(t_plain / t_shard, 3),
        "kf_equal": kf_equal, "loop_equal": loop_equal,
        "point_count_equal": pt_equal,
        "final_reproj_close": e2_close,
        "e2_plain": round(m1["e2"], 4), "e2_sharded": round(m2["e2"], 4),
        "keyframes": int(s1.kf_count),
        "multivideo_sharded_loops": mv_loops,
        "multivideo_wall_s": round(t_mv, 2),
    }))


if __name__ == "__main__":
    main()
