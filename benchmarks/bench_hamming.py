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


def main(m=8192, n=8192, reps=10):
    from _common import setup_cache
    setup_cache()

    import jax
    import jax.numpy as jnp

    from slam_loop_closing_tpu.ops import matching

    rng = np.random.default_rng(0)
    sq = jnp.asarray(rng.integers(0, 2, (m, 256)) * 2 - 1, jnp.int8)
    st = jnp.asarray(rng.integers(0, 2, (n, 256)) * 2 - 1, jnp.int8)

    @jax.jit
    def dist_min(a, b):
        # representative consumer: row-min (NN) so the [M, N] block is
        # reduced on-chip, like the matcher does
        d = matching.hamming_matrix(a, b)
        return jnp.min(d, axis=1)

    dist_min(sq, st).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = dist_min(sq, st)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    gpairs = m * n / dt / 1e9
    print(json.dumps({
        "metric": "hamming_matching_throughput",
        "value": round(gpairs, 2),
        "unit": "Gpairs/sec",
        "vs_baseline": None,
    }))
    return gpairs


if __name__ == "__main__":
    main()
