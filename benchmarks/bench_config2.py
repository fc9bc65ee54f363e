"""BASELINE config 2: 500-frame 1080p sequence, frame_skip=1, ORB-4000,
DENSE all-pairs similarity (no band restriction — every ordered frame pair
below the diagonal is evaluated), then the Version-A loop rule.

This is the capacity-stress configuration: descriptors are
[500, 4000, 256] int8 (~0.5 GB resident) and the dense lower triangle is
~125k pairs x [4000 x 4000] Hamming NN — ~1 PFLOP of int8/bf16 matmul,
routed through the fused Pallas per-pair kernel in device-bounded chunks
(matching.dense_pair_counts_chunked).

Frames are device-resident before the timed region (same contract as
bench.py; the host tunnel is an environment artifact). Sync is by forced
host readback. Prints one JSON line.
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
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--num-features", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=50,
                    help="front-end frame batch per device step")
    ap.add_argument("--pairs-per-call", type=int, default=8192)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from slam_loop_closing_tpu.config import LoopConfig, OrbConfig
    from slam_loop_closing_tpu.ops import matching, orb
    from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

    cfg = OrbConfig(num_features=args.num_features, grid_cell=8)
    loop_cfg = LoopConfig()  # gap 30, threshold 0.15, >=50 matches

    t0 = time.perf_counter()
    frames = orbit_sequence(num_frames=args.frames, h=args.height,
                            w=args.width, num_points=400)
    frames_u8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    del frames
    b = frames_u8.shape[0]
    print(f"# synthetic: {b} frames {args.height}x{args.width} "
          f"(rendered in {time.perf_counter() - t0:.1f}s)")

    # Front-end in device-sized batches; uint8 on the wire, float on chip.
    fe = jax.jit(lambda x: orb.detect_and_describe_batch(
        x.astype(jnp.float32) / 255.0, cfg))
    t0 = time.perf_counter()
    s_chunks, v_chunks = [], []
    for s in range(0, b, args.batch):
        e = min(s + args.batch, b)
        chunk = np.zeros((args.batch, args.height, args.width), np.uint8)
        chunk[: e - s] = frames_u8[s:e]
        feats = fe(jnp.asarray(chunk))
        s_chunks.append(feats.signed[: e - s])
        v_chunks.append(feats.keypoints.valid[: e - s])
    signed = jnp.concatenate(s_chunks)
    valid = jnp.concatenate(v_chunks)
    np.asarray(valid[:1])  # sync
    t_frontend = time.perf_counter() - t0

    # Dense all-pairs counts (the config's defining stage).
    t0 = time.perf_counter()
    cnp = matching.dense_pair_counts_chunked(
        signed, valid, min_gap=1, pairs_per_call=args.pairs_per_call)
    t_pairs = time.perf_counter() - t0
    n_pairs = b * (b - 1) // 2
    n_desc_pairs = n_pairs * args.num_features ** 2

    # Version-A loop rule on the dense matrix (gap applied at decision time)
    nfeat = np.asarray(jnp.sum(valid, axis=1)).astype(np.int64)
    denom = np.maximum(np.minimum(nfeat[:, None], nfeat[None, :]), 1)
    sims = cnp / denom
    q = np.arange(b)[:, None]
    t = np.arange(b)[None, :]
    in_gap = t <= q - loop_cfg.min_loop_gap
    loops = in_gap & (sims > loop_cfg.loop_threshold) & (
        cnp >= loop_cfg.min_matches)

    total = t_frontend + t_pairs
    print(json.dumps({
        "metric": "config2_dense_500f_1080p_orb4000",
        "value": round(b / total, 2),
        "unit": "frames/sec",
        "vs_baseline": None,
        "frontend_s": round(t_frontend, 2),
        "dense_pairs_s": round(t_pairs, 2),
        "frame_pairs": n_pairs,
        "pairs_per_sec": round(n_pairs / t_pairs, 0),
        "desc_gpairs_per_sec": round(n_desc_pairs / t_pairs / 1e9, 1),
        "loops_detected": int(loops.sum()),
        "top_candidate": int(cnp.max()),
    }))


if __name__ == "__main__":
    main()
