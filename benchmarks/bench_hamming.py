"""Hamming descriptor-matching throughput in Gpairs/sec (the north-star
kernel metric, BASELINE.md): all-pairs distance between two descriptor sets
via the int8 MXU matmul, and the fused Pallas NN kernel on TPU.

One descriptor "pair" = one 256-bit Hamming distance. The MXU encoding does
2*256 int8 MACs per pair, so N Gpairs/sec = N * 512 Gop/s of int8 compute.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(m=8192, n=8192, reps=400):
    from _common import setup_cache
    setup_cache()

    import jax
    import jax.numpy as jnp

    from slam_loop_closing_tpu.ops import matching, pallas_kernels

    rng = np.random.default_rng(0)
    sq = jnp.asarray(rng.integers(0, 2, (m, 256)) * 2 - 1, jnp.int8)
    st = jnp.asarray(rng.integers(0, 2, (n, 256)) * 2 - 1, jnp.int8)
    vt = jnp.ones((n,), bool)

    @jax.jit
    def dist_min(a, b):
        # representative consumer: row-min (NN) so the [M, N] block is
        # reduced on-chip, like the matcher does
        d = matching.hamming_matrix(a, b)
        return jnp.min(d, axis=1)

    @jax.jit
    def dist_min_fused(a, b):
        # the production path: the VMEM-fused d1-only Pallas kernel — the
        # [M, N] block never touches HBM, and the reduction runs on raw MXU
        # dots (min distance == max dot), so the per-element VPU work is one
        # mask + one max instead of the full distance transform
        return pallas_kernels.hamming_nn_d1(a, b, vt)

    def timed_once(fn):
        # sync by forced host readback: block_until_ready does not
        # reliably synchronize on this axon runtime (docs/PERFORMANCE.md
        # "Profiling method"), and reps must amortize the ~40 ms dispatch
        # round trip (at reps=10 this bench read an impossible
        # 1750 Gpairs/s = ~2x the v5e bf16 MXU peak)
        np.asarray(fn(sq, st)[:2])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(sq, st)
        np.asarray(out[:2])
        return (time.perf_counter() - t0) / reps

    def timed(fn, meas=5):
        # this device's run-to-run throughput swings +-25% (round-5
        # interleaved A/B measurements, benchmarks/exp_hamming.py): take
        # the median of several interleavable measurements
        return float(np.median([timed_once(fn) for _ in range(meas)]))

    xla = m * n / timed(dist_min) / 1e9
    fused = m * n / timed(dist_min_fused) / 1e9
    gpairs = max(xla, fused)
    print(json.dumps({
        "metric": "hamming_matching_throughput",
        "value": round(gpairs, 2),
        "unit": "Gpairs/sec",
        "vs_baseline": None,
        "xla_matrix_gpairs": round(xla, 2),
        "fused_pallas_nn_gpairs": round(fused, 2),
        "note": ("dense-square winner is the XLA matmul+row-min form "
                 "(median of 5); the fused Pallas kernels win in-pipeline "
                 "— banded/count-finalized forms sustain 324 Gdesc-pairs/s "
                 "(config2 artifact), ~84% of the 384 Gpairs/s v5e bf16 "
                 "roofline at 512 ops/pair"),
    }))
    return gpairs


if __name__ == "__main__":
    main()
