"""End-to-end Version-A loop detection on a synthetic orbit video: the
camera closes a full loop, so loops MUST fire near the final frames and must
NOT fire mid-sequence (ground truth by construction)."""

import numpy as np
import pytest
import dataclasses

from slam_loop_closing_tpu.config import (LoopConfig, MatchConfig, OrbConfig,
                                          PipelineConfig, RansacConfig)
from slam_loop_closing_tpu.models.loop_closing import LoopClosingSystem
from slam_loop_closing_tpu.utils.synth_video import orbit_sequence


@pytest.fixture(scope="module")
def small_cfg():
    return dataclasses.replace(
        PipelineConfig(),
        orb=OrbConfig(num_features=300, num_levels=2),
        loop=LoopConfig(loop_threshold=0.15, min_loop_gap=20, frame_skip=1),
        ransac=RansacConfig(num_hypotheses=128),
    )


@pytest.fixture(scope="module")
def orbit_frames():
    return orbit_sequence(num_frames=32, h=144, w=192, num_points=250,
                          seed=3)


class TestBatched:
    def test_loops_fire_at_closure(self, small_cfg, orbit_frames):
        sys_ = LoopClosingSystem(small_cfg, max_frames=32)
        loops = sys_.process_video(orbit_frames)
        assert loops, "no loop closures on a closed-loop trajectory"
        # every loop must respect the gap
        for c in loops:
            assert c.current_frame_id - c.matched_frame_id >= 20
        # at least one loop connects the final quarter to the first quarter
        assert any(c.current_frame_id >= 24 and c.matched_frame_id <= 8
                   for c in loops)

    def test_grid_adapted_same_loop_set(self, small_cfg):
        """Grid-adapted selection (one keypoint per cell, the headline-bench
        configuration) must fire the SAME loop pairs as plain top-K — the
        quality contract behind bench.py's ``grid_cell=8`` speedup.

        Holds when the cell count well exceeds the feature budget (the bench
        regime: 32k cells vs 2000 features at 1080p — here 1728 cells vs
        300); with cells ~ budget the grid constrains selection enough to
        flip near-threshold pairs (measured Jaccard 0.8 at 144x192)."""
        frames = orbit_sequence(num_frames=32, h=288, w=384, num_points=250,
                                seed=3)
        plain = LoopClosingSystem(small_cfg, max_frames=32)
        got_plain = {(c.current_frame_id, c.matched_frame_id)
                     for c in plain.process_video(frames)}
        grid_cfg = dataclasses.replace(
            small_cfg, orb=dataclasses.replace(small_cfg.orb, grid_cell=8))
        grid = LoopClosingSystem(grid_cfg, max_frames=32)
        got_grid = {(c.current_frame_id, c.matched_frame_id)
                    for c in grid.process_video(frames)}
        assert got_plain, "no loops in the plain configuration"
        assert got_grid == got_plain

    def test_save_results_format(self, small_cfg, orbit_frames, tmp_path):
        sys_ = LoopClosingSystem(small_cfg, max_frames=32)
        sys_.process_video(orbit_frames)
        out = sys_.save_results(tmp_path)
        text = out.read_text()
        # README.md:150-166 block format
        assert text.startswith("=== Processing Complete ===\n")
        assert "Total frames processed: 32" in text
        assert "Loop Closures Detected:\n======================\n" in text
        n = len(sys_.get_loop_closures())
        assert f"Loop closures detected: {n}" in text
        if n:
            c = sys_.get_loop_closures()[0]
            assert (f"Frame {c.current_frame_id} <-> "
                    f"Frame {c.matched_frame_id}") in text
            assert (tmp_path / f"loop_{c.current_frame_id}_"
                    f"{c.matched_frame_id}.png").exists()


class TestMultiLoopFixture:
    """The HARD fixture (VERDICT r3 item 8): two distinct true revisit
    regions plus a distractor pass at a fully height-separated texture band.

    Scoring contract (see synth_video.ground_truth_loop_pairs): TRUE pairs
    are near-coincident poses; pairs at intermediate height offsets or at
    same height within ~0.7 rad are partially co-visible on the cylinder
    (they legitimately verify geometrically) and are IGNORED; pairs across
    fully separated bands (the distractor plateau) are hard negatives."""

    NF, GAP, DY = 96, 16, 16.0

    @pytest.fixture(scope="class")
    def fixture_run(self):
        import jax
        import jax.numpy as jnp

        from slam_loop_closing_tpu.config import RansacConfig
        from slam_loop_closing_tpu.models.sfm import _verify_loop_scores
        from slam_loop_closing_tpu.utils.synth_video import (
            ground_truth_loop_pairs, multi_loop_sequence)

        frames, thetas, ys = multi_loop_sequence(
            num_frames=self.NF, h=240, w=320, num_points=800, seed=3,
            distractor_dy=self.DY)
        gt = ground_truth_loop_pairs(thetas, ys, min_gap=self.GAP)
        cfg = dataclasses.replace(
            PipelineConfig(),
            orb=OrbConfig(num_features=500, num_levels=2),
            loop=LoopConfig(loop_threshold=0.15, min_loop_gap=self.GAP,
                            frame_skip=1),
            ransac=RansacConfig(num_hypotheses=256),
        )
        sys_ = LoopClosingSystem(cfg, max_frames=self.NF)
        pred = {(c.current_frame_id, c.matched_frame_id)
                for c in sys_.process_video(frames)}

        dth = np.abs(thetas[:, None] - thetas[None, :])
        dth = np.minimum(dth, 2 * np.pi - dth)
        dy = np.abs(ys[:, None] - ys[None, :])
        gtset = set(zip(*map(list, np.nonzero(gt))))

        # RANSAC-verify the assertion-relevant subsets only (verifying all
        # ~2.5k raw predictions is device time the assertions don't need):
        # the distractor-zone predictions and the predictions near gt pairs
        def near_gt(p, tol=2):
            return any(abs(p[0] - g[0]) <= tol and abs(p[1] - g[1]) <= tol
                       for g in gtset)

        sel = sorted(p for p in pred
                     if (dy[p] >= self.DY - 2.0 and dth[p] < 0.2)
                     or near_gt(p))
        cam = cfg.camera
        norm = ((sys_._db_xy
                 - jnp.asarray([cam.cx, cam.cy], jnp.float32))
                / jnp.asarray([cam.fx, cam.fy], jnp.float32))
        cq = jnp.asarray([p[0] for p in sel], jnp.int32)
        ct = jnp.asarray([p[1] for p in sel], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(11), len(sel))
        scores = np.asarray(_verify_loop_scores(
            sys_._db_signed, sys_._db_valid, norm, cq, ct, keys,
            sys_._focal, sys_._radius, sys_._tau, 0.7, "orb",
            RansacConfig(num_hypotheses=256)))
        verified = {p for p, s in zip(sel, scores)
                    if s[1] >= 25 and s[2] >= 15}
        return dict(pred=pred, verified=verified, gtset=gtset, dth=dth,
                    dy=dy, near_gt=near_gt)

    def test_fixture_has_two_gt_regions(self, fixture_run):
        gtset = fixture_run["gtset"]
        n1 = int(0.30 * self.NF)
        n2 = int(0.13 * self.NF)
        r1 = [g for g in gtset if n1 <= g[0] < n1 + n2 + 2]
        r2 = [g for g in gtset if g[0] >= self.NF - 15]
        assert len(r1) >= 3, "no ground-truth pairs in revisit region 1"
        assert len(r2) >= 3, "no ground-truth pairs in revisit region 2"

    def test_detects_loops_in_both_regions(self, fixture_run):
        gtset, near_gt = fixture_run["gtset"], fixture_run["near_gt"]
        pred = fixture_run["pred"]
        n1 = int(0.30 * self.NF)
        n2 = int(0.13 * self.NF)
        for region in ([g for g in gtset if n1 <= g[0] < n1 + n2 + 2],
                       [g for g in gtset if g[0] >= self.NF - 15]):
            hit = [g for g in region
                   if any(abs(p[0] - g[0]) <= 2 and abs(p[1] - g[1]) <= 2
                          for p in pred)]
            assert len(hit) >= len(region) // 2, (
                f"region recall {len(hit)}/{len(region)}")

    def test_verification_rejects_distractor_pass(self, fixture_run):
        """Same orbit angles, fully separated texture bands: the raw
        similarity rule fires there (same-statistics texture), geometric
        verification must kill every one."""
        pred, verified = fixture_run["pred"], fixture_run["verified"]
        dth, dy = fixture_run["dth"], fixture_run["dy"]
        dneg = [p for p in pred
                if dy[p] >= self.DY - 2.0 and dth[p] < 0.2]
        assert len(dneg) >= 10, "distractor zone produced no raw candidates"
        assert not [p for p in verified if dy[p] >= self.DY - 2.0], (
            "cross-band pairs survived geometric verification")

    def test_verified_pairs_are_covisible(self, fixture_run):
        """Every verified pair is a true revisit, a transition-height pair,
        or a same-band pair within the cylinder's co-visibility range."""
        verified, near_gt = fixture_run["verified"], fixture_run["near_gt"]
        dth, dy = fixture_run["dth"], fixture_run["dy"]
        bad = [p for p in verified
               if not near_gt(p) and not (1.0 < dy[p] < self.DY - 2.0)
               and dth[p] >= 0.7]
        assert not bad, f"non-covisible pairs verified: {sorted(bad)[:10]}"

    def test_verified_recall_is_full(self, fixture_run):
        gtset, verified = fixture_run["gtset"], fixture_run["verified"]
        missed = [g for g in gtset
                  if not any(abs(p[0] - g[0]) <= 2 and abs(p[1] - g[1]) <= 2
                             for p in verified)]
        assert not missed, f"gt pairs not verified: {missed}"


class TestIncremental:
    def test_matches_batched_loops(self, small_cfg, orbit_frames):
        """Frame-by-frame processing must find the same loop set as the
        batched path (the two code paths share kernels)."""
        a = LoopClosingSystem(small_cfg, max_frames=32)
        a.process_video(orbit_frames)
        set_a = {(c.current_frame_id, c.matched_frame_id)
                 for c in a.get_loop_closures()}

        b = LoopClosingSystem(small_cfg, max_frames=32)
        for i in range(orbit_frames.shape[0]):
            b.process_frame(orbit_frames[i])
        set_b = {(c.current_frame_id, c.matched_frame_id)
                 for c in b.get_loop_closures()}
        assert set_a == set_b

    def test_stream_matches_plain_incremental(self, small_cfg, orbit_frames):
        """process_stream (double-buffered uploads) must yield the same loop
        set as plain process_frame calls — the pipelining is host-side only
        and reorders no device program."""
        a = LoopClosingSystem(small_cfg, max_frames=32)
        for i in range(orbit_frames.shape[0]):
            a.process_frame(orbit_frames[i])
        set_a = {(c.current_frame_id, c.matched_frame_id)
                 for c in a.get_loop_closures()}

        b = LoopClosingSystem(small_cfg, max_frames=32)
        per_frame = list(b.process_stream(orbit_frames,
                                          frame_ids=list(range(32))))
        assert [fid for fid, _ in per_frame] == list(range(32))
        set_b = {(c.current_frame_id, c.matched_frame_id)
                 for c in b.get_loop_closures()}
        assert set_a == set_b
        # yielded per-frame loops must concatenate to the full record
        flat = [c for _, loops in per_frame for c in loops]
        assert [(c.current_frame_id, c.matched_frame_id) for c in flat] == \
            [(c.current_frame_id, c.matched_frame_id)
             for c in b.get_loop_closures()]

    def test_pose_estimated_between_consecutive(self, small_cfg,
                                                orbit_frames):
        sys_ = LoopClosingSystem(small_cfg, max_frames=8)
        for i in range(4):
            sys_.process_frame(orbit_frames[i])
        # consecutive orbit frames have a valid relative pose (non-identity)
        f1 = sys_.frames[1]
        assert not np.allclose(f1.pose, np.eye(4))
        # rotation part orthonormal
        R = f1.pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    def test_triangulation_produces_points(self, small_cfg, orbit_frames):
        sys_ = LoopClosingSystem(small_cfg, max_frames=8)
        sys_.process_frame(orbit_frames[0])
        sys_.process_frame(orbit_frames[1])
        assert len(sys_.frames[1].points3d) > 10
