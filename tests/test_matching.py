"""Matcher tests: the MXU Hamming matmul vs the XOR+popcount oracle, ratio
and 2x-min match rules vs NumPy brute force, and the all-pairs counts path."""

import numpy as np
import jax.numpy as jnp

from slam_loop_closing_tpu.ops import descriptors as desc_ops
from slam_loop_closing_tpu.ops import matching


def random_descs(rng, n):
    bits = (rng.random((n, 256)) > 0.5).astype(np.uint8)
    packed = desc_ops.bits_to_packed(jnp.asarray(bits))
    signed = desc_ops.bits_to_signed(jnp.asarray(bits))
    return bits, packed, signed


class TestHamming:
    def test_matmul_equals_popcount_oracle(self, rng):
        _, pa, sa = random_descs(rng, 33)
        _, pb, sb = random_descs(rng, 65)
        ham_oracle = np.asarray(desc_ops.hamming_packed(pa, pb))
        ham_mxu = np.asarray(matching.hamming_matrix(sa, sb))
        assert np.array_equal(ham_oracle, ham_mxu)

    def test_matmul_equals_numpy(self, rng):
        ba, _, sa = random_descs(rng, 17)
        bb, _, sb = random_descs(rng, 21)
        ham_np = (ba[:, None, :] != bb[None, :, :]).sum(-1)
        assert np.array_equal(np.asarray(matching.hamming_matrix(sa, sb)),
                              ham_np)

    def test_identical_descriptor_distance_zero(self, rng):
        _, _, s = random_descs(rng, 10)
        d = np.asarray(matching.hamming_matrix(s, s))
        assert np.array_equal(np.diag(d), np.zeros(10, np.int32))


class TestL2:
    def test_l2sq_matches_numpy(self, rng):
        a = rng.standard_normal((12, 128)).astype(np.float32)
        b = rng.standard_normal((15, 128)).astype(np.float32)
        ref = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        got = np.asarray(matching.l2sq_matrix(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


class TestRules:
    def test_knn2(self, rng):
        dist = jnp.asarray(rng.integers(0, 100, (6, 9)).astype(np.int32))
        vq = jnp.ones(6, bool)
        vt = jnp.ones(9, bool)
        k = matching.knn2(dist, vq, vt)
        d = np.asarray(dist)
        srt = np.sort(d, axis=1)
        assert np.array_equal(np.asarray(k.d1), srt[:, 0])
        assert np.array_equal(np.asarray(k.d2), srt[:, 1])

    def test_ratio_matches_respects_masks(self, rng):
        _, _, sa = random_descs(rng, 20)
        _, _, sb = random_descs(rng, 20)
        vq = jnp.asarray(np.arange(20) < 10)
        vt = jnp.ones(20, bool)
        m = matching.ratio_matches(matching.hamming_matrix(sa, sb), vq, vt,
                                   ratio=1.1)
        assert not np.any(np.asarray(m.mask)[10:])

    def test_2xmin_rule(self, rng):
        # Target = noisy copies of query: each query's true NN is its copy.
        bits, _, sq = random_descs(rng, 30)
        noisy = bits.copy()
        for i in range(30):
            flips = rng.choice(256, size=5, replace=False)
            noisy[i, flips] ^= 1
        st = desc_ops.bits_to_signed(jnp.asarray(noisy))
        v = jnp.ones(30, bool)
        m = matching.nn_matches_2xmin(sq, v, st, v)
        idx = np.asarray(m.idx)
        mask = np.asarray(m.mask)
        assert mask.sum() >= 25
        assert (idx[mask] == np.flatnonzero(np.ones(30))[mask]).mean() > 0.9

    def test_2xmin_perfect_matches_survive(self, rng):
        """min_dist = 0 must not reject the perfect matches themselves."""
        _, _, s = random_descs(rng, 10)
        v = jnp.ones(10, bool)
        m = matching.nn_matches_2xmin(s, v, s, v)
        assert int(m.count) == 10
        assert np.array_equal(np.asarray(m.idx), np.arange(10))


class TestAllPairs:
    def test_matches_per_pair_oracle(self, rng):
        f, n = 5, 40
        signed = np.zeros((f, n, 256), np.int8)
        valid = np.zeros((f, n), bool)
        descs = []
        for i in range(f):
            bits, _, s = random_descs(rng, n)
            signed[i] = np.asarray(s)
            valid[i, : 30 + i] = True
            signed[i, 30 + i:] = 0
            descs.append(bits)
        signed_j = jnp.asarray(signed)
        valid_j = jnp.asarray(valid)
        pq, pt = np.meshgrid(np.arange(f), np.arange(f), indexing="ij")
        counts = matching.all_pairs_good_counts(
            signed_j, valid_j, jnp.asarray(pq.ravel()), jnp.asarray(pt.ravel()),
            chunk=4)
        counts = np.asarray(counts).reshape(f, f)
        for i in range(f):
            for j in range(f):
                expected = int(matching.good_count_pair(
                    signed_j[i], valid_j[i], signed_j[j], valid_j[j]))
                assert counts[i, j] == expected, (i, j)

    def test_dense_equals_per_pair(self, rng):
        """The frame-block matmul formulation must match the per-pair
        oracle exactly (including the max(2*min, 30) floor)."""
        f, n = 7, 40
        signed = np.zeros((f, n, 256), np.int8)
        valid = np.zeros((f, n), bool)
        for i in range(f):
            _, _, s = random_descs(rng, n)
            signed[i] = np.asarray(s)
            valid[i, : 25 + i] = True
            signed[i, 25 + i:] = 0
        sj, vj = jnp.asarray(signed), jnp.asarray(valid)
        dense = np.asarray(matching.dense_pair_counts(sj, vj, t_block=4))
        for i in range(f):
            for j in range(f):
                expected = int(matching.good_count_pair(
                    sj[i], vj[i], sj[j], vj[j]))
                assert dense[i, j] == expected, (i, j)

    def test_banded_matches_dense(self, rng):
        f, n = 9, 32
        signed = np.zeros((f, n, 256), np.int8)
        valid = np.ones((f, n), bool)
        for i in range(f):
            _, _, s = random_descs(rng, n)
            signed[i] = np.asarray(s)
        sj, vj = jnp.asarray(signed), jnp.asarray(valid)
        dense = np.asarray(matching.dense_pair_counts(sj, vj, t_block=4))
        banded = np.asarray(matching.banded_pair_counts(sj, vj, min_gap=3,
                                                        block=4))
        for i in range(f):
            for j in range(f):
                want = dense[i, j] if j <= i - 3 else 0
                assert banded[i, j] == want, (i, j)

    def test_similarity_formula(self):
        c = jnp.asarray([50, 10])
        s = matching.similarity(c, jnp.asarray([100, 100]), jnp.asarray([200, 40]))
        np.testing.assert_allclose(np.asarray(s), [0.5, 0.25])


def test_prosac_quality_support_primary_dist_tiebreak(rng):
    # support dominates; -dist only breaks ties (normalized < 1 unit)
    n = 16
    xy_q = jnp.asarray(rng.uniform(0, 100, (n, 2)), jnp.float32)
    xy_t = xy_q + 2.0  # coherent displacement: everyone supports everyone
    mask = jnp.ones(n, bool).at[-4:].set(False)
    dist = jnp.asarray(rng.uniform(10, 200, (n,)), jnp.float32)
    m = matching.Matches(idx=jnp.arange(n, dtype=jnp.int32), dist=dist,
                         mask=mask, count=jnp.sum(mask.astype(jnp.int32)))
    q = np.asarray(matching.prosac_quality(xy_q, xy_t, m, 50.0, 5.0))
    sup = np.asarray(matching.motion_support(xy_q, xy_t, mask, 50.0, 5.0))
    # quality = support - dist / (1 + max(dist over mask)), exactly
    dmax = float(np.max(np.asarray(dist)[np.asarray(mask)]))
    np.testing.assert_allclose(
        q, sup - np.asarray(dist) / (1.0 + dmax), rtol=1e-6)
    # the tiebreak never moves a match across a support level
    assert np.all(np.abs(q - sup) < 1.0)


def test_dense_chunked_matches_dense(rng):
    f, n = 6, 32
    signed = np.zeros((f, n, 256), np.int8)
    valid = np.ones((f, n), bool)
    for i in range(f):
        _, _, s = random_descs(rng, n)
        signed[i] = np.asarray(s)
    sj, vj = jnp.asarray(signed), jnp.asarray(valid)
    dense = np.asarray(matching.dense_pair_counts(sj, vj, t_block=4))
    got = matching.dense_pair_counts_chunked(sj, vj, min_gap=1,
                                             pairs_per_call=7)
    for i in range(f):
        for j in range(f):
            want = dense[i, j] if j <= i - 1 else 0
            assert got[i, j] == want, (i, j)
