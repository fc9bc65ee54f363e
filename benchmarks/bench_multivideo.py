"""Multi-video batch benchmark (BASELINE.json configs[3]: "all 6 bundled
.MOV sequences batch-processed in parallel"). The bundled videos are absent
from the snapshot, so 6 synthetic closed-loop sequences stand in; the
measured path — per-video pipelines evaluated as one batched device program
via LoopClosingSystem.process_videos_batched — is the real one."""

from __future__ import annotations

import json
import time

import numpy as np


def main(num_videos=6, frames=48, h=540, w=960):
    from _common import setup_cache
    setup_cache()

    from slam_loop_closing_tpu.config import LoopConfig, OrbConfig, PipelineConfig
    import dataclasses

    from slam_loop_closing_tpu.models.loop_closing import LoopClosingSystem
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    # ship as uint8 (what the PNG extraction stage produces) — the
    # host->device tunnel is the bottleneck for multi-video batches
    videos = np.stack([
        orbit_sequence(num_frames=frames, h=h, w=w, num_points=300, seed=s)
        for s in range(num_videos)])
    videos = (np.clip(videos, 0, 1) * 255).astype(np.uint8)
    cfg = dataclasses.replace(
        PipelineConfig(), orb=OrbConfig(num_features=1000),
        loop=LoopConfig(min_loop_gap=max(3, frames // 3)))

    # warmup/compile
    LoopClosingSystem.process_videos_batched(videos[:, :frames], cfg)
    t0 = time.perf_counter()
    loops = LoopClosingSystem.process_videos_batched(videos, cfg)
    dt = time.perf_counter() - t0
    total_frames = num_videos * frames
    print(json.dumps({
        "metric": "multivideo_batch_loop_detection",
        "value": round(total_frames / dt, 2),
        "unit": "frames/sec",
        "vs_baseline": None,
        "videos": num_videos,
        "loops_per_video": [len(l) for l in loops],
    }))


if __name__ == "__main__":
    main()
