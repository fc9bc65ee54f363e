"""Stage-level profile of the SIFT front-end at the reference config
(SIFT-4000, 1080p) — where do the 1000/fps ms/frame go, per octave and per
stage? Async-enqueue + one forced readback per measurement
(docs/PERFORMANCE.md "Profiling method").

Diagnostic for VERDICT r4 item 7 (descriptor formulation bound).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

H = int(os.environ.get("BENCH_H", "1080"))
W = int(os.environ.get("BENCH_W", "1920"))
REPS = int(os.environ.get("REPS", "20"))


def main():
    from _common import setup_cache
    setup_cache()

    import jax
    import jax.numpy as jnp

    from slam_loop_closing_tpu.config import SiftConfig
    from slam_loop_closing_tpu.ops import sift
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    cfg = SiftConfig(num_features=4000)
    img = jnp.asarray(orbit_sequence(num_frames=1, h=H, w=W,
                                     num_points=300)[0])

    def timed(name, fn, *args, reps=REPS):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}),
              flush=True)
        return out, dt

    results = {}

    # full per-frame pipeline
    full = jax.jit(lambda im: sift.detect_and_describe(im, cfg))
    _, dt = timed("full_detect_and_describe", full, img)
    results["full_ms"] = dt * 1e3

    # per-octave detect (the budgets detect_and_describe uses)
    budgets = sift._level_budgets(cfg.num_features, cfg.num_octaves)
    im = img
    for o, budget in enumerate(budgets):
        if budget <= 0 or min(im.shape) < 64:
            break
        imo = im

        oct_fn = jax.jit(lambda x, o=o, b=budget: sift._detect_octave(
            x, o, b, cfg))
        (xy0, sigma, vals, valid, mag, ang, xyo), dt = timed(
            f"o{o}_detect_octave(K={budget})", oct_fn, imo)
        results[f"o{o}_detect_ms"] = dt * 1e3

        gates = jax.jit(lambda x: sift._gated_response(x, cfg))
        _, dt = timed(f"o{o}_gated_response", gates, imo)
        results[f"o{o}_gates_ms"] = dt * 1e3

        patches = jax.jit(sift._extract_grad_patches)
        (pm, pa, ctrs), dt = timed(f"o{o}_extract_grad_patches",
                                   patches, mag, ang, xyo)
        results[f"o{o}_patches_ms"] = dt * 1e3

        od = jax.jit(sift._orientation_and_descriptor)
        _, dt = timed(f"o{o}_orientation_descriptor", od, mag, ang, xyo,
                      sigma, valid)
        results[f"o{o}_desc_ms"] = dt * 1e3

        im = im[::2, ::2]

    print(json.dumps({"summary": {k: round(v, 3)
                                  for k, v in results.items()}}))


if __name__ == "__main__":
    main()
