"""Pallas kernel tests (interpret mode on CPU): the fused Hamming-NN kernel
and the fused FAST+NMS kernel must match their XLA reference paths exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from slam_loop_closing_tpu.ops import descriptors as desc_ops
from slam_loop_closing_tpu.ops import fast, matching, pallas_kernels


def random_signed(rng, n):
    bits = (rng.random((n, 256)) > 0.5).astype(np.uint8)
    return desc_ops.bits_to_signed(jnp.asarray(bits))


class TestHammingNN:
    def test_matches_xla_rowmin(self, rng):
        sq = random_signed(rng, 70)
        st = random_signed(rng, 90)
        vt = jnp.asarray(np.arange(90) < 80)
        d1, idx = pallas_kernels.hamming_nn(sq, st, vt, tile_m=64,
                                            interpret=True)
        dist = np.asarray(matching.hamming_matrix(sq, st)).astype(np.int64)
        dist[:, 80:] = 2 ** 30
        np.testing.assert_array_equal(np.asarray(d1), dist.min(1))
        np.testing.assert_array_equal(np.asarray(idx), dist.argmin(1))

    def test_d1_only_kernel_matches_nn(self, rng):
        """hamming_nn_d1 (raw-dot max reduction) must equal hamming_nn's d1
        exactly, including all-invalid-row rejection semantics."""
        sq = jnp.asarray(rng.integers(0, 2, (100, 256)) * 2 - 1, jnp.int8)
        st = jnp.asarray(rng.integers(0, 2, (70, 256)) * 2 - 1, jnp.int8)
        vt = jnp.asarray(rng.random(70) > 0.2)
        ref, _ = pallas_kernels.hamming_nn(sq, st, vt, tile_m=64,
                                           interpret=True)
        got = pallas_kernels.hamming_nn_d1(sq, st, vt, tile_m=64,
                                           interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # all targets invalid: both paths must reject every row
        vt0 = jnp.zeros(70, bool)
        got0 = pallas_kernels.hamming_nn_d1(sq, st, vt0, tile_m=64,
                                            interpret=True)
        assert np.all(np.asarray(got0) >= pallas_kernels._BIG // 2)

    def test_good_count_matches_reference(self, rng):
        sq = random_signed(rng, 60)
        st = random_signed(rng, 60)
        vq = jnp.asarray(np.arange(60) < 50)
        vt = jnp.asarray(np.arange(60) < 55)
        ref = int(matching.good_count_pair(
            jnp.where(vq[:, None], sq, 0), vq,
            jnp.where(vt[:, None], st, 0), vt))
        got = int(pallas_kernels.good_count_pair_pallas(
            jnp.where(vq[:, None], sq, 0), vq,
            jnp.where(vt[:, None], st, 0), vt, interpret=True))
        assert got == ref


class TestFastKernel:
    def test_matches_xla_path(self, rng):
        img = np.zeros((64, 96), np.float32)
        img[20:36, 30:50] = 1.0
        img += rng.normal(0, 0.01, img.shape).astype(np.float32)
        ref = np.asarray(fast.nms(fast.fast_score_map(jnp.asarray(img))))
        got = np.asarray(pallas_kernels.fast_score_nms(jnp.asarray(img),
                                                       interpret=True))
        # The kernel computes margins in bf16: scores match to ~3 decimal
        # digits, and a rounding tie between two adjacent candidates can
        # move an NMS peak by one pixel. Compare peak SETS with 1-px slack.
        def peaks(a):
            ys, xs = np.nonzero(a > 0.01)
            return list(zip(ys.tolist(), xs.tolist()))

        pg, pr = peaks(got), peaks(ref)
        assert abs(len(pg) - len(pr)) <= max(2, len(pr) // 20)
        pr_arr = np.asarray(pr, float)
        for (y, x) in pg:
            d = np.abs(pr_arr - [y, x]).max(axis=1).min()
            assert d <= 1.0, f"peak ({y},{x}) has no ref peak within 1px"
        # and scores agree where both have peaks
        both = (got > 0.01) & (ref > 0.01)
        np.testing.assert_allclose(got[both], ref[both], atol=5e-3)


class TestFastBlurKernel:
    def test_score_matches_score_only_kernel(self, rng):
        img = np.zeros((64, 96), np.float32)
        img[20:36, 30:50] = 1.0
        img += rng.normal(0, 0.01, img.shape).astype(np.float32)
        score_only = np.asarray(pallas_kernels.fast_score_nms(
            jnp.asarray(img), interpret=True))
        score, _ = pallas_kernels.fast_score_nms_blur(jnp.asarray(img),
                                                      interpret=True)
        np.testing.assert_array_equal(np.asarray(score), score_only)

    def test_blur_matches_xla_interior(self, rng):
        from slam_loop_closing_tpu.ops import image as image_ops

        img = jnp.asarray(rng.random((64, 96)), jnp.float32)
        ref = np.asarray(image_ops.gaussian_blur(img, 2.0, 3))
        _, blur = pallas_kernels.fast_score_nms_blur(img, interpret=True)
        # interior (> radius from every border): bitwise — same taps, same
        # vertical-then-horizontal accumulation order
        np.testing.assert_array_equal(np.asarray(blur)[3:-3, 3:-3],
                                      ref[3:-3, 3:-3])

    def test_vmapped_matches_single(self, rng):
        import jax

        imgs = jnp.asarray(rng.random((2, 48, 96)), jnp.float32)
        sb, bb = jax.vmap(lambda im: pallas_kernels.fast_score_nms_blur(
            im, interpret=True))(imgs)
        for i in range(2):
            s1, b1 = pallas_kernels.fast_score_nms_blur(imgs[i],
                                                        interpret=True)
            np.testing.assert_array_equal(np.asarray(sb[i]), np.asarray(s1))
            np.testing.assert_array_equal(np.asarray(bb[i]), np.asarray(b1))


class TestKnn2Kernels:
    def test_hamming_knn2_matches_xla(self, rng):
        sq = random_signed(rng, 70)
        st = random_signed(rng, 90)
        vq = jnp.asarray(np.arange(70) < 66)
        vt = jnp.asarray(np.arange(90) < 80)
        d1, idx, d2 = pallas_kernels.hamming_knn2(sq, st, vt, tile_m=64,
                                                  interpret=True)
        ref = matching.knn2(matching.hamming_matrix(sq, st),
                            jnp.ones(70, bool), vt)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(ref.d1))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.idx1))
        np.testing.assert_array_equal(np.asarray(d2), np.asarray(ref.d2))

    def test_l2_knn2_matches_xla(self, rng):
        # integer-valued descriptors: the GEMM expansion and the kernel
        # compute identical f32 distances, so the comparison is exact
        dq = jnp.asarray(rng.integers(0, 16, (50, 128)), jnp.float32)
        dt = jnp.asarray(rng.integers(0, 16, (60, 128)), jnp.float32)
        vt = jnp.asarray(np.arange(60) < 55)
        d1, idx, d2 = pallas_kernels.l2_knn2(dq, dt, vt, tile_m=32,
                                             interpret=True)
        ref = matching.knn2(matching.l2sq_matrix(dq, dt),
                            jnp.ones(50, bool), vt)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(ref.d1),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.idx1))
        np.testing.assert_allclose(np.asarray(d2), np.asarray(ref.d2),
                                   rtol=1e-6)

    def test_ratio_from_knn2_matches_ratio_matches(self, rng):
        dq = jnp.asarray(rng.integers(0, 16, (40, 128)), jnp.float32)
        dt = jnp.asarray(rng.integers(0, 16, (40, 128)), jnp.float32)
        vq = jnp.asarray(np.arange(40) < 36)
        vt = jnp.asarray(np.arange(40) < 38)
        ref = matching.ratio_matches(matching.l2sq_matrix(dq, dt), vq, vt,
                                     0.8 * 0.8)
        d1, idx, d2 = pallas_kernels.l2_knn2(dq, dt, vt, tile_m=32,
                                             interpret=True)
        got = matching._ratio_from_knn2(d1, idx, d2, vq, 0.8 * 0.8)
        np.testing.assert_array_equal(np.asarray(got.mask),
                                      np.asarray(ref.mask))
        assert int(got.count) == int(ref.count)
        m = np.asarray(ref.mask)
        np.testing.assert_array_equal(np.asarray(got.idx)[m],
                                      np.asarray(ref.idx)[m])


class TestBandedFusedKernel:
    def test_block_pair_counts_fused_matches_xla(self, rng):
        fq, ft, n = 5, 3, 33
        def mk(f):
            bits = (rng.random((f, n, 256)) > 0.5).astype(np.uint8)
            s = desc_ops.bits_to_signed(jnp.asarray(bits.reshape(-1, 256))
                                        ).reshape(f, n, 256)
            v = jnp.asarray(rng.random((f, n)) > 0.25)
            return jnp.where(v[..., None], s, 0), v
        sq, vq = mk(fq)
        st, vt = mk(ft)
        ref = np.asarray(matching.block_pair_counts(sq, vq, st, vt))
        got = np.asarray(pallas_kernels.block_pair_counts_fused(
            sq, vq, st, vt, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_matches_xla_banded_counts(self, rng):
        f, n = 12, 40
        bits = (rng.random((f, n, 256)) > 0.5).astype(np.uint8)
        signed = desc_ops.bits_to_signed(jnp.asarray(bits.reshape(-1, 256))
                                         ).reshape(f, n, 256)
        valid = jnp.asarray(rng.random((f, n)) > 0.2)
        signed = jnp.where(valid[..., None], signed, 0)
        ref = np.asarray(matching.banded_pair_counts(signed, valid,
                                                     min_gap=3, block=4))
        got = np.asarray(pallas_kernels.banded_pair_counts_fused(
            signed, valid, min_gap=3, block=4, tile_m=64, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_band_count_tiles_in_kernel_finalize(self, rng):
        # the sequence-scale variant: counts finalized inside the kernel,
        # validity derived from the zero-row convention
        f, n, block = 16, 40, 4
        bits = (rng.random((f, n, 256)) > 0.5).astype(np.uint8)
        signed = desc_ops.bits_to_signed(jnp.asarray(bits.reshape(-1, 256))
                                         ).reshape(f, n, 256)
        valid = jnp.asarray(rng.random((f, n)) > 0.2)
        # one frame fully invalid: the all-zero target-frame edge case
        valid = valid.at[2].set(False)
        signed = jnp.where(valid[..., None], signed, 0)
        npad = n + ((-n) % 128)
        sp = jnp.pad(signed, ((0, 0), (0, npad - n), (0, 0)))
        vp = jnp.pad(valid, ((0, 0), (0, npad - n)))
        nb = f // block
        sblocks = sp.reshape(nb, block * npad, 256)
        qv = vp.reshape(nb, block, npad).astype(jnp.int32)
        pairs = [(qb, tb) for qb in range(nb) for tb in range(nb)]
        qidx = jnp.asarray([p[0] for p in pairs], jnp.int32)
        tidx = jnp.asarray([p[1] for p in pairs], jnp.int32)
        got = np.asarray(pallas_kernels.band_count_tiles_fused(
            sblocks, qv, qidx, tidx, interpret=True))
        sb = signed.reshape(nb, block, n, 256)
        vb = valid.reshape(nb, block, n)
        for k, (qb, tb) in enumerate(pairs):
            ref = np.asarray(matching.block_pair_counts(
                sb[qb], vb[qb], sb[tb], vb[tb]))
            np.testing.assert_array_equal(got[k], ref,
                                          err_msg=f"tile {(qb, tb)}")

    def test_banded_chunked_fused_matches_xla_chunked(self, rng, monkeypatch):
        f, n = 21, 33
        bits = (rng.random((f, n, 256)) > 0.5).astype(np.uint8)
        signed = desc_ops.bits_to_signed(jnp.asarray(bits.reshape(-1, 256))
                                         ).reshape(f, n, 256)
        valid = jnp.asarray(rng.random((f, n)) > 0.2)
        signed = jnp.where(valid[..., None], signed, 0)
        # Force the XLA tile fallback for the reference so the comparison is
        # cross-implementation on every platform (on TPU hosts
        # banded_pair_counts_chunked would otherwise dispatch to the same
        # fused Pallas path under test).
        with monkeypatch.context() as m:
            m.setattr(pallas_kernels, "use_pallas", lambda: False)
            ref = matching.banded_pair_counts_chunked(
                signed, valid, min_gap=4, block=8, tiles_per_call=3)
        got = matching._banded_chunked_fused(signed, valid, min_gap=4,
                                             scale=2.0, block=4,
                                             tiles_per_call=5,
                                             interpret=True)
        np.testing.assert_array_equal(got, ref)


class TestMotionSupportKernel:
    def test_matches_xla(self, rng):
        # integer coordinates: both formulations are exact in f32
        n = 100
        xy_q = jnp.asarray(rng.integers(0, 200, (n, 2)), jnp.float32)
        xy_t = jnp.asarray(rng.integers(0, 200, (n, 2)), jnp.float32)
        mask = jnp.asarray(np.arange(n) < 90)
        ref = matching.motion_support(xy_q, xy_t, mask, 30.0, 7.0)
        got = pallas_kernels.motion_support_pallas(xy_q, xy_t, mask,
                                                   30.0, 7.0, tile_m=64,
                                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestPatchGatherKernel:
    def test_matches_xla_gather(self, rng):
        import jax

        from slam_loop_closing_tpu.ops import orb

        img = jnp.asarray(rng.random((96, 300)), jnp.float32)
        k = 130  # crosses one 128-keypoint grid chunk
        xy = jnp.asarray(
            np.stack([rng.integers(19, 300 - 19, k),
                      rng.integers(19, 96 - 19, k)], -1), jnp.float32)
        ref = orb.extract_patches(img, xy)[0]
        got = pallas_kernels.extract_patches_pallas(img, xy, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        # vmapped (grid-batched variant)
        imgs = jnp.stack([img, img[::-1]])
        xys = jnp.stack([xy, xy])
        refb = jax.vmap(lambda im, p: orb.extract_patches(im, p)[0])(imgs, xys)
        gotb = jax.vmap(lambda im, p: pallas_kernels.extract_patches_pallas(
            im, p, interpret=True))(imgs, xys)
        np.testing.assert_array_equal(np.asarray(gotb), np.asarray(refb))

    def test_sift_40x40_variant_matches_dynamic_slices(self, rng):
        """The patch=40/center=19 configuration used by
        sift._extract_grad_patches must reproduce its clipped
        dynamic-slice windows exactly (including border clamping)."""
        import jax

        patch, pc = 40, 19
        h, w = 104, 280
        img = jnp.asarray(rng.random((h, w)), jnp.float32)
        k = 140
        xy = jnp.asarray(
            np.stack([rng.integers(0, w, k),
                      rng.integers(0, h, k)], -1), jnp.float32)

        def one(pt):
            x0 = jnp.clip(pt[0].astype(jnp.int32) - pc, 0, w - patch)
            y0 = jnp.clip(pt[1].astype(jnp.int32) - pc, 0, h - patch)
            return jax.lax.dynamic_slice(img, (y0, x0), (patch, patch))

        ref = jax.vmap(one)(xy)
        got = pallas_kernels.extract_patches_pallas(
            img, xy, interpret=True, patch=patch, center=pc)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestGaussStackKernel:
    def test_matches_chained_xla_blurs(self, rng):
        from slam_loop_closing_tpu.ops import image as image_ops
        from slam_loop_closing_tpu.ops import sift

        sig = sift._chain_sigmas(3, 1.6)
        img = jnp.asarray(rng.random((96, 256)), jnp.float32)
        ref = [image_ops.gaussian_blur(img, sig[0])]
        for s_extra in sig[1:]:
            ref.append(image_ops.gaussian_blur(ref[-1], s_extra))
        ref = np.asarray(jnp.stack(ref))
        got = np.asarray(pallas_kernels.gauss_stack_pallas(
            img, sig, interpret=True))
        # identical taps; the once-reflected border is symmetric under the
        # symmetric kernels, so agreement is float-tolerance everywhere
        np.testing.assert_allclose(got, ref, atol=2e-6)

    def test_vmapped_matches_single(self, rng):
        import jax

        from slam_loop_closing_tpu.ops import sift

        sig = sift._chain_sigmas(3, 1.6)
        imgs = jnp.asarray(rng.random((2, 96, 256)), jnp.float32)
        gotb = np.asarray(jax.vmap(lambda im: pallas_kernels.gauss_stack_pallas(
            im, sig, interpret=True))(imgs))
        for i in range(2):
            single = np.asarray(pallas_kernels.gauss_stack_pallas(
                imgs[i], sig, interpret=True))
            np.testing.assert_allclose(gotb[i], single, atol=1e-6)


class TestGaussStackRespKernel:
    """The fused stack+extrema/gates kernel vs the XLA gate pipeline in
    sift._gated_response (the SIFT detector's front half)."""

    @staticmethod
    def _xla_ref(img, cfg):
        from slam_loop_closing_tpu.ops import sift

        s = cfg.scales_per_octave
        gauss = sift._gaussian_stack(img, s, cfg.sigma0)
        dog = gauss[1:] - gauss[:-1]
        resp = sift._extrema_response(dog)
        resp = jnp.where(jnp.abs(dog) >= cfg.contrast_threshold / s,
                         resp, 0.0)
        ok = sift._edge_mask(dog[1:s + 1], cfg.edge_threshold)
        resp_in = jnp.where(ok, resp[1:s + 1], 0.0)
        h, w = img.shape
        b = sift._BORDER
        ys, xs = jnp.arange(h), jnp.arange(w)
        interior = ((ys[:, None] >= b) & (ys[:, None] < h - b)
                    & (xs[None, :] >= b) & (xs[None, :] < w - b))
        return gauss, jnp.where(interior[None], resp_in, 0.0)

    def test_matches_xla_gate_pipeline(self, rng):
        from slam_loop_closing_tpu.config import SiftConfig
        from slam_loop_closing_tpu.ops import sift

        import jax

        cfg = SiftConfig()
        s = cfg.scales_per_octave
        sig = sift._chain_sigmas(s, cfg.sigma0)
        # blob-scale texture (coarse noise upsampled) so DoG extrema at the
        # detector's scales actually pass the contrast gate — blurred white
        # noise leaves almost none
        img = jax.image.resize(
            jnp.asarray(rng.random((16, 32)), jnp.float32),
            (128, 256), "bilinear")
        ref_g, ref_r = self._xla_ref(img, cfg)
        got_g, got_r = pallas_kernels.gauss_stack_resp_pallas(
            img, sig, s, cfg.contrast_threshold / s, cfg.edge_threshold,
            border=sift._BORDER, interpret=True)
        assert got_r.shape == (s, 128, 256)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                                   atol=2e-6)
        # the gates are exact min/max/compare trees over the same stack
        # values: where the stacks agree bitwise, responses agree bitwise —
        # under interpret mode both paths run the same XLA arithmetic, so
        # demand near-exact agreement away from compare knife-edges
        ref_r = np.asarray(ref_r)
        got_r = np.asarray(got_r)
        disagree = np.abs(got_r - ref_r) > 1e-6
        assert disagree.mean() < 1e-4, (
            f"{disagree.sum()} / {disagree.size} gated responses differ")
        assert (ref_r > 0).sum() > 50, "fixture produced too few extrema"

    def test_vmapped_matches_single(self, rng):
        import jax

        from slam_loop_closing_tpu.config import SiftConfig
        from slam_loop_closing_tpu.ops import sift

        cfg = SiftConfig()
        s = cfg.scales_per_octave
        sig = sift._chain_sigmas(s, cfg.sigma0)
        imgs = jnp.asarray(rng.random((2, 96, 256)), jnp.float32)
        call = lambda im: pallas_kernels.gauss_stack_resp_pallas(
            im, sig, s, cfg.contrast_threshold / s, cfg.edge_threshold,
            border=sift._BORDER, interpret=True)
        gb, rb = jax.vmap(call)(imgs)
        for i in range(2):
            g1, r1 = call(imgs[i])
            np.testing.assert_allclose(np.asarray(gb[i]), np.asarray(g1),
                                       atol=1e-6)
            np.testing.assert_array_equal(np.asarray(rb[i]),
                                          np.asarray(r1))

    def test_tile_probe_recovers_from_model_overestimate(self, monkeypatch):
        """If `_resp_tile_h`'s VMEM model over-estimates the fitting tile at
        an uncalibrated resolution, the compile probe must halve until a
        tile compiles instead of failing hard (VERDICT r4 #9 / ADVICE r4)."""
        from slam_loop_closing_tpu.config import SiftConfig
        from slam_loop_closing_tpu.ops import sift

        cfg = SiftConfig()
        s = cfg.scales_per_octave
        sig = sift._chain_sigmas(s, cfg.sigma0)
        attempts = []

        def fake_probe(shape, sigmas, n_inner, thr_c, edge_r, border,
                       tile_h):
            attempts.append(tile_h)
            if tile_h > 16:  # pretend Mosaic rejects tiles above 16
                raise RuntimeError("Mosaic: scoped VMEM limit exceeded")

        monkeypatch.setattr(pallas_kernels, "_probe_compile_resp",
                            fake_probe)
        monkeypatch.setattr(pallas_kernels, "_resp_tile_h",
                            lambda tile_h, *a: 64)  # model over-estimates
        monkeypatch.setattr(pallas_kernels, "_is_tpu", lambda: True)
        monkeypatch.setattr(pallas_kernels, "_RESP_TILE_CACHE", {})

        tile = pallas_kernels._resolve_resp_tile(
            (128, 256), sig, s, cfg.contrast_threshold / s,
            cfg.edge_threshold, sift._BORDER, 64, interpret=False)
        assert tile == 16
        assert attempts == [64, 32, 16]
        # second resolve is served from the cache — no further probes
        tile2 = pallas_kernels._resolve_resp_tile(
            (128, 256), sig, s, cfg.contrast_threshold / s,
            cfg.edge_threshold, sift._BORDER, 64, interpret=False)
        assert tile2 == 16 and attempts == [64, 32, 16]
