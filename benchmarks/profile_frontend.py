"""Stage-level profile of the ORB front-end at the headline configuration
(96 x 1080p, ORB-2000, grid_cell=8): per-stage device time measured by async
enqueue of N reps + one forced host readback (docs/PERFORMANCE.md
"Profiling method" — block_until_ready does not reliably synchronize here,
and single dispatches sit under the ~40 ms round-trip floor).

Prints one JSON line with ms/frame per stage. Not part of bench.py — a
diagnostic for directing optimization work.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

B = int(os.environ.get("BENCH_FRAMES", "32"))
H = int(os.environ.get("BENCH_H", "1080"))
W = int(os.environ.get("BENCH_W", "1920"))


def main():
    from _common import setup_cache
    setup_cache()

    import jax
    import jax.numpy as jnp

    from slam_loop_closing_tpu.config import OrbConfig
    from slam_loop_closing_tpu.ops import fast as fast_ops
    from slam_loop_closing_tpu.ops import image as image_ops
    from slam_loop_closing_tpu.ops import orb
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    cfg = OrbConfig(num_features=2000, grid_cell=8)
    frames = jnp.asarray(orbit_sequence(num_frames=B, h=H, w=W,
                                        num_points=300))

    def timed(name, fn, *args, reps=5):
        out = fn(*args)          # compile + warm
        # warm-up must sync by READBACK: block_until_ready returns before
        # the remote compile + first execution land on this axon runtime,
        # which would bill them to the timed region (~7x inflation observed)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:2])  # forced readback
        dt = (time.perf_counter() - t0) / reps
        return name, dt, out

    stages = {}

    # full pipeline reference point
    name, dt, feats = timed("full_frontend",
                            jax.jit(lambda fr: orb.detect_and_describe_batch(
                                fr, cfg)), frames)
    stages[name] = dt

    # pyramid (all levels)
    pyr = jax.jit(lambda fr: jax.vmap(
        lambda im: tuple(image_ops.pyramid(im, cfg.num_levels,
                                           cfg.scale_factor)))(fr))
    name, dt, levels = timed("pyramid", pyr, frames)
    stages[name] = dt

    # per-level stage splits at level 0 (the dominant level)
    lvl0 = levels[0]
    thr = cfg.fast_threshold / 255.0

    name, dt, _ = timed("fast_detect_l0", jax.jit(jax.vmap(
        lambda im: fast_ops.detect(im, threshold=thr, num_features=875,
                                   nms_radius=cfg.nms_radius,
                                   border=cfg.border,
                                   grid_cell=cfg.grid_cell))), lvl0)
    stages[name] = dt

    name, dt, blurred = timed("desc_blur_l0", jax.jit(jax.vmap(
        lambda im: image_ops.gaussian_blur(im, 2.0, 3))), lvl0)
    stages[name] = dt

    xy, resp, valid = jax.jit(jax.vmap(
        lambda im: fast_ops.detect(im, threshold=thr, num_features=875,
                                   nms_radius=cfg.nms_radius,
                                   border=cfg.border,
                                   grid_cell=cfg.grid_cell)))(lvl0)

    name, dt, patches = timed("extract_patches_l0", jax.jit(jax.vmap(
        lambda im, p: orb.extract_patches(im, p)[0])), blurred, xy)
    stages[name] = dt

    # the production path: pipelined-DMA Pallas patch gather
    name, dt, _pp = timed("extract_patches_pallas_l0", jax.jit(jax.vmap(
        lambda im, p: orb.extract_patches_fast(im, p))), blurred, xy)
    stages[name] = dt

    G = orb.brief_matrices(cfg)
    mw = jnp.asarray(orb._orientation_moment_weights())
    ang = jax.jit(jax.vmap(
        lambda p, v: orb.orientation_from_patches(p, v, mw)))(patches, valid)

    name, dt, _ = timed("orientation_l0", jax.jit(jax.vmap(
        lambda p, v: orb.orientation_from_patches(p, v, mw))),
        patches, valid)
    stages[name] = dt

    name, dt, _ = timed("brief_binned_l0", jax.jit(jax.vmap(
        lambda p, a, v: orb.brief_from_patches_binned(p, a, v, G))),
        patches, ang, valid)
    stages[name] = dt

    print(json.dumps({
        "metric": "frontend_profile_ms_per_frame",
        "frames": B,
        "stages_ms_per_frame": {k: round(v / B * 1e3, 3)
                                for k, v in stages.items()},
    }))


if __name__ == "__main__":
    main()
