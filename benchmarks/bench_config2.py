"""BASELINE config 2: 500-frame 1080p sequence, frame_skip=1, ORB-4000,
DENSE all-pairs similarity (no band restriction — every ordered frame pair
below the diagonal is evaluated), then the Version-A loop rule.

This is the capacity-stress configuration: descriptors are
[500, 4000, 256] int8 (~0.5 GB resident) and the dense lower triangle is
~125k pairs x [4000 x 4000] Hamming NN — ~1 PFLOP of int8/bf16 matmul,
routed through the fused Pallas per-pair kernel in device-bounded chunks
(matching.dense_pair_counts_chunked).

Frames ship to the device as uint8 BEFORE the timed region (same contract
as bench.py; the ~1 GB upload over this machine's tunnel is an environment
artifact and is reported separately as ``upload_s`` /
``fps_with_transfer``). Sync is by forced host readback. Prints one JSON
line.
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

    # Ship everything as uint8 once, before the timed region (bench.py's
    # device-resident contract; the tunnel is an environment artifact).
    pad = (-b) % args.batch
    if pad:
        frames_u8 = np.concatenate(
            [frames_u8, np.zeros((pad, args.height, args.width), np.uint8)])
    t0 = time.perf_counter()
    frames_dev = jax.device_put(jnp.asarray(frames_u8))
    np.asarray(frames_dev[0, :1, :1])  # sync the transfer
    t_upload = time.perf_counter() - t0

    # Front-end in device-sized batches; float conversion on chip.
    fe = jax.jit(lambda x: orb.detect_and_describe_batch(
        x.astype(jnp.float32) / 255.0, cfg))
    fe(frames_dev[:args.batch])  # warm at shape (compile excluded)
    t0 = time.perf_counter()
    s_chunks, v_chunks = [], []
    for s in range(0, b + pad, args.batch):
        feats = fe(frames_dev[s:s + args.batch])
        s_chunks.append(feats.signed)
        v_chunks.append(feats.keypoints.valid)
    signed = jnp.concatenate(s_chunks)[:b]
    valid = jnp.concatenate(v_chunks)[:b]
    np.asarray(valid[:1])  # sync
    t_frontend = time.perf_counter() - t0

    # Dense all-pairs counts (the config's defining stage). Warm the pair
    # programs at shape first: the fused tile programs are remote Mosaic
    # compiles (~10-30 s each on this runtime) that would otherwise bill
    # into the timed region on a cold cache.
    matching.dense_pair_counts_chunked(
        signed, valid, min_gap=1, pairs_per_call=args.pairs_per_call)
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
        "fps_with_transfer": round(b / (total + t_upload), 2),
        "upload_s": round(t_upload, 2),
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
