"""Per-frame latency of the incremental Version-A API — the
``LoopClosingSystem.process_frame`` path the reference documents
(loop_closing.hpp:34) but never implements.

The batched :meth:`process_video` path hides per-frame costs; this bench
records what a live, frame-at-a-time caller pays: ORB front-end on one
frame + donated in-place database insert + the bucketed banded loop scan
(models/loop_closing.py:183-271). Warm-up covers every power-of-two scan
bucket the run will touch, so the steady-state number has no compiles in it.

Sync is by forced host readback (docs/PERFORMANCE.md "Profiling method";
the per-frame API genuinely pays one device round trip per frame because
the loop decision is read back each frame — that RTT is part of the
latency being measured, so it stays in).

Prints one JSON line.
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
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--num-features", type=int, default=2000)
    ap.add_argument("--max-frames", type=int, default=512)
    ap.add_argument("--stream", action="store_true",
                    help="measure process_stream (double-buffered uploads: "
                         "frame k+1 transfers while frame k resolves) "
                         "instead of plain process_frame calls")
    args = ap.parse_args(argv)

    import dataclasses

    from slam_loop_closing_tpu.config import (CameraConfig, OrbConfig,
                                              PipelineConfig)
    from slam_loop_closing_tpu.models.loop_closing import LoopClosingSystem
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    frames = orbit_sequence(num_frames=args.frames, h=args.height,
                            w=args.width, num_points=300)
    frames_u8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)

    cfg = dataclasses.replace(
        PipelineConfig(),
        camera=CameraConfig.assumed(),
        orb=OrbConfig(num_features=args.num_features, grid_cell=8))

    def build():
        return LoopClosingSystem(cfg, max_frames=args.max_frames,
                                 log=lambda *a, **k: None)

    # Warm-up pass: compiles the front-end, insert, and every loop-scan
    # bucket size this frame count reaches.
    sys_warm = build()
    for i in range(args.frames):
        sys_warm.process_frame(frames_u8[i])

    sys = build()
    lat = []
    if args.stream:
        # Per-frame latency = inter-yield time of the generator: what a
        # live consumer observes when the next frame's upload is hidden
        # behind the current frame's resolve.
        t0 = time.perf_counter()
        for _fid, _loops in sys.process_stream(frames_u8):
            t1 = time.perf_counter()
            lat.append(t1 - t0)
            t0 = t1
    else:
        for i in range(args.frames):
            t0 = time.perf_counter()
            sys.process_frame(frames_u8[i])
            lat.append(time.perf_counter() - t0)

    lat_ms = np.asarray(lat) * 1e3
    print(json.dumps({
        "metric": ("incremental_process_stream_latency" if args.stream
                   else "incremental_process_frame_latency"),
        "value": round(float(np.median(lat_ms)), 2),
        "unit": "ms/frame (median)",
        "vs_baseline": None,
        "mean_ms": round(float(lat_ms.mean()), 2),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 2),
        "max_ms": round(float(lat_ms.max()), 2),
        "frames": args.frames,
        "resolution": f"{args.height}x{args.width}",
        "num_features": args.num_features,
        "loops_found": len(sys.loop_closures),
    }))


if __name__ == "__main__":
    main()
