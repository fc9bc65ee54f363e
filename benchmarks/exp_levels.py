"""Per-pyramid-level cost split of the production ORB front-end at the
headline config (1080p, ORB-2000, grid_cell=8): times `_detect_level` for
each level alone, plus the stages inside level 0. Diagnostic only.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

B = int(os.environ.get("BENCH_FRAMES", "32"))


def main():
    from _common import setup_cache
    setup_cache()

    import jax
    import jax.numpy as jnp

    from slam_loop_closing_tpu.config import OrbConfig
    from slam_loop_closing_tpu.ops import image as image_ops
    from slam_loop_closing_tpu.ops import orb
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    cfg = OrbConfig(num_features=2000, grid_cell=8)
    frames = jnp.asarray(orbit_sequence(num_frames=B, h=1080, w=1920,
                                        num_points=300))

    def timed(name, fn, *args, reps=10):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
        dt = (time.perf_counter() - t0) / reps / B * 1e3
        print(json.dumps({"stage": name, "ms_per_frame": round(dt, 4)}),
              flush=True)
        return out

    pat = orb.brief_matrices(cfg)
    levels = jax.jit(lambda fr: jax.vmap(
        lambda im: tuple(image_ops.pyramid(im, cfg.num_levels,
                                           cfg.scale_factor)))(fr))(frames)
    budgets = orb._level_budgets(cfg.num_features, cfg.num_levels,
                                 cfg.scale_factor)
    timed("full_frontend",
          jax.jit(lambda fr: orb.detect_and_describe_batch(fr, cfg)), frames)
    timed("pyramid", jax.jit(lambda fr: jax.vmap(
        lambda im: tuple(image_ops.pyramid(im, cfg.num_levels,
                                           cfg.scale_factor)))(fr)), frames)
    for lvl in range(cfg.num_levels):
        timed(f"level{lvl}_h{levels[lvl].shape[1]}_k{budgets[lvl]}",
              jax.jit(jax.vmap(
                  lambda im: orb._detect_level(im, lvl, budgets[lvl],
                                               pat, cfg))),
              levels[lvl])


if __name__ == "__main__":
    main()
