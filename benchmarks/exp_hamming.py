"""Dense-square Hamming NN throughput experiments (VERDICT r4 item 5).

Sweeps the fused d1 Pallas kernel's tiling (tile_m x tchunk), operand
pre-casting (ship bf16 once instead of casting int8 -> bf16 every grid
step), and XLA formulation variants (max-dot vs distance-transform row
min), all at the flagship 8192^2 shape. Readback-synced, rep-amortized
(docs/PERFORMANCE.md "Profiling method").

Usage: python benchmarks/exp_hamming.py [variant ...]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

M = N = 8192
REPS = 400


def main(argv=None):
    from _common import setup_cache
    setup_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from slam_loop_closing_tpu.ops import matching, pallas_kernels
    from slam_loop_closing_tpu.ops.pallas_kernels import BITS, _BIG

    rng = np.random.default_rng(0)
    sq = jnp.asarray(rng.integers(0, 2, (M, 256)) * 2 - 1, jnp.int8)
    st = jnp.asarray(rng.integers(0, 2, (N, 256)) * 2 - 1, jnp.int8)
    sq_bf = sq.astype(jnp.bfloat16)
    st_bf = st.astype(jnp.bfloat16)
    vt = jnp.ones((N,), bool)
    vt_i = vt.astype(jnp.int32)[None, :]

    def timed(fn, *args):
        np.asarray(fn(*args).ravel()[:2])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        np.asarray(out.ravel()[:2])
        dt = (time.perf_counter() - t0) / REPS
        return M * N / dt / 1e9

    # --- current production paths (controls) -------------------------------
    @jax.jit
    def xla_minDist(a, b):
        return jnp.min(matching.hamming_matrix(a, b), axis=1)

    @jax.jit
    def fused_prod(a, b):
        return pallas_kernels.hamming_nn_d1(a, b, vt)

    # --- XLA max-dot variant: skip the elementwise distance transform ------
    @jax.jit
    def xla_maxdot(a_bf, b_bf):
        dots = jax.lax.dot_general(
            a_bf, b_bf, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        return ((BITS - jnp.max(dots, axis=1)) * 0.5).astype(jnp.int32)

    # --- XLA max-dot with the int8->bf16 cast INSIDE the jit (the exact
    # operand structure of hamming_matrix, minus the [M,N] distance
    # transform): isolates operand-dtype effects from the reduce shape
    @jax.jit
    def xla_i8cast_maxdot(a, b):
        dots = jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        return ((BITS - jnp.max(dots, axis=1)) * 0.5).astype(jnp.int32)

    # --- XLA int8 dot: if XLA lowers s8xs8->s32 natively on v5e the MXU
    # peak doubles vs bf16 (394 vs 197 TOPS). Mosaic rejects int8 matmul
    # operands, but XLA itself might not.
    @jax.jit
    def xla_i8_maxdot(a, b):
        dots = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.int32)
        return (BITS - jnp.max(dots, axis=1)) >> 1

    # --- fused kernel, parametric tiling, bf16 operands shipped once -------
    def _d1_kernel_bf(q_ref, t_ref, tv_ref, d1_ref, *, tchunk, npad):
        f32 = jnp.float32
        q = q_ref[...]
        mx = jnp.full((q.shape[0], 1), -f32(_BIG), f32)
        for c in range(npad // tchunk):
            t = t_ref[c * tchunk:(c + 1) * tchunk, :]
            dots = jax.lax.dot_general(
                q, t, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            dots = jnp.where(
                tv_ref[0, c * tchunk:(c + 1) * tchunk][None, :] != 0,
                dots, -f32(_BIG))
            mx = jnp.maximum(mx, jnp.max(dots, axis=1, keepdims=True))
        d1_ref[...] = ((f32(BITS) - mx) * f32(0.5)).astype(jnp.int32)

    def fused_bf(tile_m, tchunk):
        @jax.jit
        def run(a_bf, b_bf):
            return pl.pallas_call(
                functools.partial(_d1_kernel_bf, tchunk=tchunk, npad=N),
                grid=(M // tile_m,),
                in_specs=[
                    pl.BlockSpec((tile_m, 256), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N, 256), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, N), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, 1), jnp.int32),
            )(a_bf, b_bf, vt_i)[:, 0]
        return run

    # --- fused kernel, int8 in VMEM, parametric tiling ---------------------
    def fused_i8(tile_m, tchunk):
        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                functools.partial(pallas_kernels._hamming_d1_kernel,
                                  tchunk=tchunk, npad=N),
                grid=(M // tile_m,),
                in_specs=[
                    pl.BlockSpec((tile_m, 256), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N, 256), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, N), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, 1), jnp.int32),
            )(a, b, vt_i)[:, 0]
        return run

    variants = {
        "xla_minDist": (xla_minDist, sq, st),
        "xla_maxdot": (xla_maxdot, sq_bf, st_bf),
        "xla_i8_maxdot": (xla_i8_maxdot, sq, st),
        "xla_i8cast_maxdot": (xla_i8cast_maxdot, sq, st),
        "fused_prod": (fused_prod, sq, st),
    }
    for tm in (256, 512, 1024, 2048):
        for tc in (2048, 4096, 8192):
            variants[f"bf_{tm}x{tc}"] = (fused_bf(tm, tc), sq_bf, st_bf)
            variants[f"i8_{tm}x{tc}"] = (fused_i8(tm, tc), sq, st)

    want = (argv or sys.argv[1:]) or list(variants)
    ref = None
    results = {}
    for name in want:
        fn, a, b = variants[name]
        try:
            out = np.asarray(fn(a, b)).ravel()
            if ref is None:
                ref = out
            ok = bool((out == ref).all())
            g = timed(fn, a, b)
            results[name] = round(g, 1)
            print(json.dumps({"variant": name, "gpairs": round(g, 2),
                              "values_match": ok}), flush=True)
        except Exception as e:  # noqa: BLE001 - experiment harness
            print(json.dumps({"variant": name,
                              "error": str(e)[:200]}), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
