"""FAST-kernel ablation experiments (round 5, VERDICT item #1).

Measures where the fused FAST score+NMS+blur kernel's 0.37 ms/frame at
1080p l0 actually goes, by timing kernel VARIANTS on the real chip:

- full_<tile>   : the production kernel at a given tile_h
- sepnms_<tile> : NMS via separable max3-row/max3-col (4 shifted views
                  instead of 8; ctr >= max9-incl == ctr >= max8-excl)
- aligned_<tile>: all shifted views replaced by ALIGNED slices (wrong
                  values — measures the kernel with zero relayout cost)
- dma_<tile>    : DMA + output writes only (fixed per-step + memory cost)
- f32_<tile>    : no bf16 cast (bf16 relayouts may be slower than f32)

Each prints one JSON line {variant, ms_per_frame}. Diagnostic only.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

B = int(os.environ.get("BENCH_FRAMES", "16"))
H = int(os.environ.get("BENCH_H", "1080"))
W = int(os.environ.get("BENCH_W", "1920"))
VARIANTS = os.environ.get("VARIANTS", "").split(",") if \
    os.environ.get("VARIANTS") else None


def main():
    from _common import setup_cache
    setup_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from slam_loop_closing_tpu.ops import pallas_kernels as pk
    from slam_loop_closing_tpu.ops.fast import CIRCLE

    _PAD = pk._PAD
    taps = tuple(float(v) for v in pk._blur_taps_f32(2.0, 3))

    def kernel(img_hbm, *refs, mode, threshold, h, w, tile_h, chunk_area):
        if mode in ("cellout", "cellout2"):
            score_ref, resp_ref, blur_ref, block_ref, sem = refs
        else:
            (score_ref, blur_ref, block_ref, sem), resp_ref = refs, None
        b = pl.program_id(0)
        i = pl.program_id(1)
        nt = pl.num_programs(1)
        step = b * nt + i
        total = pl.num_programs(0) * nt
        row0 = i * tile_h
        the = tile_h + 2

        def start(si):
            sl = jax.lax.rem(si, 2)
            srcb = img_hbm.at[jax.lax.div(si, nt)]
            r0 = jax.lax.rem(si, nt) * tile_h
            pltpu.make_async_copy(srcb.at[pl.ds(r0, tile_h + 16), :],
                                  block_ref.at[sl], sem.at[sl]).start()

        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            start(step)

        @pl.when(step + 1 < total)
        def _():
            start(step + 1)

        pltpu.make_async_copy(img_hbm.at[0].at[pl.ds(0, tile_h + 16), :],
                              block_ref.at[slot], sem.at[slot]).wait()
        block = block_ref[slot]
        bb = block if mode == "f32" else block.astype(jnp.bfloat16)

        n_chunks = max(1, -(-(tile_h * w) // chunk_area))
        cw = -(-w // n_chunks)

        def compute_chunk(c0, cw_c):
            cwe = cw_c + 2

            if mode == "dma":
                score_ref[0, :, c0:c0 + cw_c] = block[
                    8:8 + tile_h, _PAD + c0:_PAD + c0 + cw_c].astype(
                        jnp.float32)
                blur_ref[0, :, c0:c0 + cw_c] = block[
                    8:8 + tile_h, _PAD + c0:_PAD + c0 + cw_c].astype(
                        jnp.float32)
                return

            def shifted(dy, dx):
                if mode == "aligned":
                    dy = dx = 0
                elif mode == "dxonly":     # lane shifts only (wrong values)
                    dy = 0
                elif mode == "dyonly":     # sublane shifts only (wrong)
                    dx = 0
                if mode == "refview":
                    # read the shifted window straight from the VMEM ref:
                    # the load unit may absorb the sublane offset
                    return block_ref[slot, 7 + dy: 7 + dy + the,
                                     _PAD - 1 + dx + c0:
                                     _PAD - 1 + dx + c0 + cwe].astype(
                                         jnp.bfloat16)
                return bb[7 + dy: 7 + dy + the,
                          _PAD - 1 + dx + c0: _PAD - 1 + dx + c0 + cwe]

            center = shifted(0, 0)
            ring = [shifted(dy, dx) for dy, dx in CIRCLE]

            def fold_slide9(op, fold):
                e = lambda i: ring[i % 16]
                sm = [None] * 16
                s = e(8)
                sm[8] = s
                for i in range(7, -1, -1):
                    s = op(e(i), s)
                    sm[i] = s
                s = e(17)
                for i in range(16, 8, -1):
                    s = op(e(i), s)
                    if i <= 15:
                        sm[i] = s
                best = sm[0]
                p = e(9)
                best = fold(best, op(sm[1], p))
                for j in range(10, 18):
                    p = op(p, e(j))
                    best = fold(best, op(sm[j - 8], p))
                p = e(18)
                best = fold(best, op(sm[10], p))
                for j in range(19, 24):
                    p = op(p, e(j))
                    best = fold(best, op(sm[j - 8], p))
                return best

            best_min = fold_slide9(jnp.minimum, jnp.maximum)
            worst_max = fold_slide9(jnp.maximum, jnp.minimum)
            score = jnp.maximum(best_min - center,
                                center - worst_max) - threshold
            score = jnp.maximum(score, 0.0)
            ys = jax.lax.broadcasted_iota(jnp.int32, (the, cwe), 0) + row0 - 1
            xs = jax.lax.broadcasted_iota(jnp.int32, (the, cwe), 1) + c0 - 1
            interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
            zero = jnp.float32(0.0) if mode == "f32" else jnp.bfloat16(0.0)
            score = jnp.where(interior, score, zero).astype(jnp.float32)

            if mode == "nonms":
                out = score[1:1 + tile_h, 1:1 + cw_c]
            elif mode in ("sepnms",):
                cm = jnp.maximum(jnp.maximum(score[:, 0:cw_c],
                                             score[:, 1:cw_c + 1]),
                                 score[:, 2:cw_c + 2])
                local_max = jnp.maximum(jnp.maximum(cm[0:tile_h],
                                                    cm[1:tile_h + 1]),
                                        cm[2:tile_h + 2])
                ctr = score[1:1 + tile_h, 1:1 + cw_c]
                out = jnp.where(ctr >= local_max, ctr, 0.0)
            else:
                local_max = None
                for dy in (0, 1, 2):
                    for dx in (0, 1, 2):
                        if dy == 1 and dx == 1:
                            continue
                        if mode == "aligned":
                            s = score[0:tile_h, 0:cw_c]
                        else:
                            s = score[dy:dy + tile_h, dx:dx + cw_c]
                        local_max = (s if local_max is None
                                     else jnp.maximum(local_max, s))
                ctr = score[1:1 + tile_h, 1:1 + cw_c]
                out = jnp.where(ctr >= local_max, ctr, 0.0)
            if mode == "cellout":
                # in-kernel grid-cell (8x8) packed-argmax row reduction:
                # replaces the full score-map output + the XLA select pass
                cell = 8
                border = 19
                posbits = 6
                posmask = 63
                ys2 = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, cw_c), 0) + row0
                xs2 = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, cw_c), 1) + c0
                okb = ((ys2 >= border) & (ys2 < h - border)
                       & (xs2 >= border) & (xs2 < w - border))
                outm = jnp.where(okb, out, 0.0)
                invpos = ((cell * cell - 1)
                          - (ys2 % cell) * cell - (xs2 % cell))
                bits = jax.lax.bitcast_convert_type(outm, jnp.int32)
                packed = jnp.where(outm > 0.0,
                                   (bits & ~posmask) | invpos, 0)
                prow = jnp.max(packed.reshape(tile_h // cell, cell, cw_c),
                               axis=1)
                frow = jnp.max(outm.reshape(tile_h // cell, cell, cw_c),
                               axis=1)
                score_ref[0, :, c0:c0 + cw_c] = prow
                resp_ref[0, :, c0:c0 + cw_c] = frow
            elif mode == "cellout2":
                # roll-based blocked max: sliding max via 3 doubling rolls
                # (pulling from below), then the block heads at stride 8 —
                # avoids the reshape-max relayouts cellout pays
                cell = 8
                border = 19
                posmask = 63
                ys2 = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, cw_c), 0) + row0
                xs2 = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, cw_c), 1) + c0
                okb = ((ys2 >= border) & (ys2 < h - border)
                       & (xs2 >= border) & (xs2 < w - border))
                outm = jnp.where(okb, out, 0.0)
                invpos = ((cell * cell - 1)
                          - (ys2 % cell) * cell - (xs2 % cell))
                bits = jax.lax.bitcast_convert_type(outm, jnp.int32)
                packed = jnp.where(outm > 0.0,
                                   (bits & ~posmask) | invpos, 0)

                def slide_take(x, axis, size):
                    s = x
                    for sh in (1, 2, 4):
                        s = jnp.maximum(s, pltpu.roll(s, size - sh,
                                                      axis=axis))
                    idx = [slice(None)] * s.ndim
                    idx[axis] = slice(0, None, cell)
                    return s[tuple(idx)]

                prow = slide_take(packed, 0, tile_h)       # [TH/8, cw_c]
                pcell = slide_take(prow, 1, cw_c)          # [TH/8, cw_c/8]
                frow = slide_take(outm, 0, tile_h)
                fcell = slide_take(frow, 1, cw_c)
                score_ref[0, :, c0 // cell:(c0 + cw_c) // cell] = pcell
                resp_ref[0, :, c0 // cell:(c0 + cw_c) // cell] = fcell
            else:
                score_ref[0, :, c0:c0 + cw_c] = out

            r = 3
            if mode == "noblur":
                blur_ref[0, :, c0:c0 + cw_c] = block[
                    8:8 + tile_h, _PAD + c0:_PAD + c0 + cw_c].astype(
                        jnp.float32)
                return
            elif mode == "aligned":
                v = taps[0] * block[8: 8 + tile_h,
                                    _PAD + c0:_PAD + c0 + cw_c + 2 * r]
                for j in range(1, 2 * r + 1):
                    v = v + taps[j] * block[8: 8 + tile_h,
                                            _PAD + c0:_PAD + c0 + cw_c
                                            + 2 * r]
                bl = taps[0] * v[:, 0:cw_c]
                for j in range(1, 2 * r + 1):
                    bl = bl + taps[j] * v[:, 0:cw_c]
            else:
                v = taps[0] * block[8 - r: 8 - r + tile_h,
                                    _PAD - r + c0: _PAD + c0 + cw_c + r]
                for j in range(1, 2 * r + 1):
                    v = v + taps[j] * block[8 - r + j: 8 - r + j + tile_h,
                                            _PAD - r + c0:
                                            _PAD + c0 + cw_c + r]
                bl = taps[0] * v[:, 0:cw_c]
                for j in range(1, 2 * r + 1):
                    bl = bl + taps[j] * v[:, j:j + cw_c]
            blur_ref[0, :, c0:c0 + cw_c] = bl

        for c in range(n_chunks):
            c0 = c * cw
            compute_chunk(c0, min(cw, w - c0))

    def call(imgs, mode, tile_h, chunk_area=pk._FAST_CHUNK_AREA):  # noqa: ANN001
        b, h, w = imgs.shape
        hp = (-h) % tile_h
        wp_extra = (-(w + 2 * _PAD)) % 128
        padded = jnp.pad(imgs, ((0, 0), (_PAD, _PAD + hp),
                                (_PAD, _PAD + wp_extra)))
        if mode == "cellout2":
            rows = (h + hp) // 8
            out_specs = [
                pl.BlockSpec((1, tile_h // 8, w // 8),
                             lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h // 8, w // 8),
                             lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, w), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape = [
                jax.ShapeDtypeStruct((b, rows, w // 8), jnp.int32),
                jax.ShapeDtypeStruct((b, rows, w // 8), jnp.float32),
                jax.ShapeDtypeStruct((b, h + hp, w), imgs.dtype),
            ]
        elif mode == "cellout":
            rows = (h + hp) // 8
            out_specs = [
                pl.BlockSpec((1, tile_h // 8, w), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h // 8, w), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, w), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape = [
                jax.ShapeDtypeStruct((b, rows, w), jnp.int32),
                jax.ShapeDtypeStruct((b, rows, w), jnp.float32),
                jax.ShapeDtypeStruct((b, h + hp, w), imgs.dtype),
            ]
        else:
            out_specs = [pl.BlockSpec((1, tile_h, w),
                                      lambda bi, i: (bi, i, 0),
                                      memory_space=pltpu.VMEM)] * 2
            out_shape = [jax.ShapeDtypeStruct((b, h + hp, w),
                                              imgs.dtype)] * 2
        out = pl.pallas_call(
            functools.partial(kernel, mode=mode, threshold=20.0 / 255.0,
                              h=h, w=w, tile_h=tile_h,
                              chunk_area=chunk_area),
            grid=(b, (h + hp) // tile_h),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, tile_h + 16, w + 2 * _PAD + wp_extra),
                           imgs.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(padded)
        return tuple(o[:, :h] if o.shape[1] == h + hp else o
                     for o in out)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W)), jnp.float32)

    def timed(name, fn, reps=20):
        fn = jax.jit(fn)  # one program per call; eager per-op dispatches
        #                   pay the ~40 ms RTT each on this runtime
        try:
            out = fn(imgs)
            np.asarray(out[0].ravel()[:2])
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": str(e)[:300]}), flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(imgs)
        np.asarray(out[0].ravel()[:2])
        dt = (time.perf_counter() - t0) / reps / B * 1e3
        print(json.dumps({"variant": name, "ms_per_frame": round(dt, 4)}),
              flush=True)

    # production reference point
    timed("repo_full_128", lambda x: pk._fast_call_batched(
        x, 20.0 / 255.0, 128, False, taps))

    plans = [
        ("full", 128),
        ("sepnms", 128), ("f32", 128),
        ("aligned", 128), ("dma", 128),
        ("dxonly", 128), ("dyonly", 128), ("refview", 128),
        ("nonms", 128), ("noblur", 128), ("cellout", 128),
        ("cellout2", 128),
    ]
    for mode, tile in plans:
        name = f"{mode}_{tile}"
        if VARIANTS and name not in VARIANTS:
            continue
        timed(name, functools.partial(call, mode=mode, tile_h=tile))


if __name__ == "__main__":
    main()
