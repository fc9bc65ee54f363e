"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4):
the ring-ppermute similarity must equal the single-device all-pairs oracle,
and the sharded front-end must equal the local one."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_loop_closing_tpu.config import OrbConfig
from slam_loop_closing_tpu.ops import descriptors as desc_ops
from slam_loop_closing_tpu.ops import matching
from slam_loop_closing_tpu.parallel import mesh as mesh_lib
from slam_loop_closing_tpu.parallel import sharded


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    return mesh_lib.make_mesh(8)


def random_db(rng, f, n):
    bits = (rng.random((f, n, 256)) > 0.5).astype(np.uint8)
    signed = np.array(desc_ops.bits_to_signed(jnp.asarray(bits)))
    valid = np.zeros((f, n), bool)
    for i in range(f):
        k = rng.integers(n // 2, n + 1)
        valid[i, :k] = True
        signed[i, k:] = 0
    return jnp.asarray(signed), jnp.asarray(valid)


class TestRing:
    def test_ring_equals_oracle(self, mesh8, rng):
        f, n = 16, 64
        signed, valid = random_db(rng, f, n)
        ring = np.asarray(sharded.ring_similarity_counts(mesh8, signed, valid))
        q, t = np.meshgrid(np.arange(f), np.arange(f), indexing="ij")
        oracle = np.asarray(matching.all_pairs_good_counts(
            signed, valid, jnp.asarray(q.ravel()), jnp.asarray(t.ravel()),
            chunk=8)).reshape(f, f)
        assert np.array_equal(ring, oracle)

    def test_banded_masking(self, mesh8, rng):
        f, n = 16, 48
        signed, valid = random_db(rng, f, n)
        nfeat = jnp.sum(valid, axis=1).astype(jnp.int32)
        counts, sims = sharded.banded_loop_counts(mesh8, signed, valid,
                                                  nfeat, min_gap=5)
        counts = np.asarray(counts)
        for qi in range(f):
            for ti in range(f):
                if ti > qi - 5:
                    assert counts[qi, ti] == 0

    def test_pad_to_multiple(self, mesh8, rng):
        # F not divisible by 8 must still work via padding.
        f, n = 11, 32
        signed, valid = random_db(rng, f, n)
        nfeat = jnp.sum(valid, axis=1).astype(jnp.int32)
        counts, _ = sharded.banded_loop_counts(mesh8, signed, valid, nfeat,
                                               min_gap=3)
        assert counts.shape == (f, f)


class TestFrontend:
    def test_sharded_equals_local(self, mesh8, rng):
        from slam_loop_closing_tpu.ops import orb
        from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

        frames = jnp.asarray(orbit_sequence(num_frames=8, h=96, w=128,
                                            num_points=120), jnp.float32)
        cfg = OrbConfig(num_features=100, num_levels=1)
        sh = sharded.frontend_sharded(mesh8, frames, cfg)
        local = orb.detect_and_describe_batch(frames, cfg)
        assert np.array_equal(np.asarray(sh.keypoints.valid),
                              np.asarray(local.keypoints.valid))
        np.testing.assert_allclose(np.asarray(sh.keypoints.xy),
                                   np.asarray(local.keypoints.xy), atol=1e-4)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
