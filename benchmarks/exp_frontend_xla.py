"""XLA front-end stage experiments (round 5): orientation + BRIEF + grid
select variants at the headline shape (32 x 1080p l0, K=896).

Prints one JSON line per variant. Diagnostic only.
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
    from slam_loop_closing_tpu.ops import orb

    cfg = OrbConfig(num_features=2000, grid_cell=8)
    K = 896
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.random((B, K, 32, 32)), jnp.float32)
    valid = jnp.asarray(rng.random((B, K)) < 0.9)
    G = orb.brief_matrices(cfg)           # [30, 1024, 256] difference mats
    mw = jnp.asarray(orb._orientation_moment_weights())

    def timed(name, fn, *args, reps=60):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
        dt = (time.perf_counter() - t0) / reps / B * 1e3
        print(json.dumps({"variant": name, "ms_per_frame": round(dt, 4)}),
              flush=True)
        return out

    # ---- orientation ----
    ref_ang = timed("orient_vmap_current", jax.jit(jax.vmap(
        lambda p, v: orb.orientation_from_patches(p, v, mw))),
        patches, valid)

    @jax.jit
    def orient_flat(p, v):
        bk = B * K
        flat = p.reshape(bk, -1)
        m = jax.lax.dot_general(flat, mw,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ang = jnp.arctan2(m[:, 1], m[:, 0]).reshape(B, K)
        return jnp.where(v, ang, 0.0)

    got = timed("orient_flat_gemm", orient_flat, patches, valid)
    print("  flat == vmap:",
          bool(jnp.all(got == ref_ang)), flush=True)

    @jax.jit
    def orient_mulreduce(p, v):
        w10 = mw[:, 0].reshape(32, 32)
        w01 = mw[:, 1].reshape(32, 32)
        m10 = jnp.sum(p * w10[None, None], axis=(2, 3))
        m01 = jnp.sum(p * w01[None, None], axis=(2, 3))
        return jnp.where(v, jnp.arctan2(m01, m10), 0.0)

    got2 = timed("orient_mulreduce", orient_mulreduce, patches, valid)
    print("  mulreduce allclose:",
          bool(jnp.max(jnp.abs(got2 - ref_ang)) < 1e-4), flush=True)

    # ---- BRIEF ----
    ang = ref_ang
    ref_bits = timed("brief_binned_current", jax.jit(jax.vmap(
        lambda p, a, v: orb.brief_from_patches_binned(p, a, v, G))),
        patches, ang, valid)

    @jax.jit
    def brief_biggemm(p, a, v):
        bk = B * K
        nb = G.shape[0]
        flat = p.reshape(bk, -1).astype(jnp.bfloat16)
        step = 2.0 * jnp.pi / nb
        bins = jnp.mod(jnp.round(a.reshape(bk) / step).astype(jnp.int32), nb)
        Dall = jnp.swapaxes(G, 0, 1).reshape(1024, nb * 256)
        allb = jax.lax.dot_general(
            flat, Dall.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32).reshape(bk, nb, 256)
        sel = jnp.sum(jnp.where((bins[:, None] ==
                                 jnp.arange(nb)[None, :])[..., None],
                                allb, 0.0), axis=1)
        bits = (sel > 0.0).astype(jnp.uint8).reshape(B, K, 256)
        return jnp.where(v[..., None], bits, jnp.uint8(0))

    got_b = timed("brief_biggemm_select", brief_biggemm, patches, ang, valid)
    print("  biggemm bits equal:",
          bool(jnp.all(got_b == ref_bits)), flush=True)

    @jax.jit
    def brief_outmask(p, a, v):
        # current per-bin loop, but mask applied to the OUTPUT of an
        # unmasked GEMM (flat read once, no 30 masked copies)
        bk = B * K
        nb = G.shape[0]
        flat = p.reshape(bk, -1).astype(jnp.bfloat16)
        step = 2.0 * jnp.pi / nb
        bins = jnp.mod(jnp.round(a.reshape(bk) / step).astype(jnp.int32), nb)
        diff = jnp.zeros((bk, 256), jnp.float32)
        for b in range(nb):
            dot = jax.lax.dot_general(
                flat, G[b].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            diff = jnp.where((bins == b)[:, None], dot, diff)
        bits = (diff > 0.0).astype(jnp.uint8).reshape(B, K, 256)
        return jnp.where(v[..., None], bits, jnp.uint8(0))

    got_o = timed("brief_outmask", brief_outmask, patches, ang, valid)
    print("  outmask bits equal:",
          bool(jnp.all(got_o == ref_bits)), flush=True)

    # ---- grid select ----
    from slam_loop_closing_tpu.ops import fast as fast_ops

    score = jnp.asarray(
        np.where(rng.random((B, 1080, 1920)) > 0.99,
                 rng.random((B, 1080, 1920)), 0.0), jnp.float32)
    timed("select_topk_grid", jax.jit(jax.vmap(
        lambda s: fast_ops.select_topk_grid(s, 875, 19, 8))), score)


if __name__ == "__main__":
    main()
