"""Sharded-path benchmark: the bench.py Version-A pipeline routed through
``parallel/sharded.py`` (DP front-end + ring all-pairs similarity) on a mesh
over ALL available devices — on the single-chip TPU this is a 1-device mesh,
which measures the per-chip cost of the shard_map formulation itself (the
number the x-N multi-chip extrapolation must be based on; VERDICT round-1
item: the sharded path was never timed on hardware).

Prints one JSON line comparing plain-jit fps vs sharded-path fps on the same
frames. The sharded path computes the FULL F x F ring matrix (each chip's
block-row against every rotating block) where the plain path computes only
the banded lower triangle, so "parity" here means sharded >= ~half the
matmul throughput plus identical loop decisions.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

B = int(os.environ.get("BENCH_FRAMES", "96"))
H = int(os.environ.get("BENCH_H", "1080"))
W = int(os.environ.get("BENCH_W", "1920"))


def _sync(x):
    np.asarray(x.ravel()[:2])  # forced host readback (axon sync quirk)


def main():
    from _common import setup_cache
    setup_cache()

    import jax
    import jax.numpy as jnp

    from slam_loop_closing_tpu.config import LoopConfig, OrbConfig
    from slam_loop_closing_tpu.ops import matching, orb
    from slam_loop_closing_tpu.parallel import mesh as mesh_lib
    from slam_loop_closing_tpu.parallel import sharded
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    frames = orbit_sequence(num_frames=B, h=H, w=W, num_points=300)
    cfg = OrbConfig(num_features=2000, grid_cell=8)
    loop_cfg = LoopConfig()
    # same gap rule as bench.py (reference MIN_LOOP_GAP=30 when B allows)
    min_gap = (loop_cfg.min_loop_gap if B > 2 * loop_cfg.min_loop_gap
               else max(3, B // 4))
    mesh = mesh_lib.make_mesh()
    d = mesh.devices.size

    fr = jnp.asarray(frames)

    # --- plain jit path (bench.py's pipeline) ------------------------------
    @jax.jit
    def plain(fr):
        feats = orb.detect_and_describe_batch(fr, cfg)
        nfeat = jnp.sum(feats.keypoints.valid, axis=1).astype(jnp.int32)
        counts = matching.banded_pair_counts(
            feats.signed, feats.keypoints.valid, min_gap, block=8)
        sims = matching.similarity(counts, nfeat[:, None], nfeat[None, :])
        loops = (sims > loop_cfg.loop_threshold) & (counts >= loop_cfg.min_matches)
        return counts, sims, loops

    def run_sharded(fr):
        feats = sharded.frontend_sharded(mesh, fr, cfg)
        nfeat = jnp.sum(feats.keypoints.valid, axis=1).astype(jnp.int32)
        counts, sims = sharded.banded_loop_counts(
            mesh, feats.signed, feats.keypoints.valid, nfeat, min_gap)
        loops = (sims > loop_cfg.loop_threshold) & (counts >= loop_cfg.min_matches)
        return counts, sims, loops

    def time_path(f, reps=3):
        c, s, l = f(fr)
        _sync(c)
        t0 = time.perf_counter()
        for _ in range(reps):
            c, s, l = f(fr)
            _sync(c)
        return B / ((time.perf_counter() - t0) / reps), np.asarray(l)

    fps_plain, loops_plain = time_path(plain)
    fps_sharded, loops_sharded = time_path(run_sharded)
    same = bool((loops_plain == loops_sharded).all())

    print(json.dumps({
        "metric": "sharded_vs_plain_1080p",
        "value": round(fps_sharded, 2),
        "unit": "frames/sec",
        "vs_baseline": None,
        "devices": d,
        "plain_fps": round(fps_plain, 2),
        "sharded_over_plain": round(fps_sharded / fps_plain, 3),
        "loop_set_identical": same,
    }))


if __name__ == "__main__":
    main()
