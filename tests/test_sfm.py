"""End-to-end Version-B SfM on a synthetic orbit sequence: keyframes are
accepted, a map builds up, the loop closes, PGO runs, BA reduces
reprojection error, and an OBJ is written."""

import dataclasses

import numpy as np
import pytest

from slam_loop_closing_tpu.config import (CameraConfig, KeyframeConfig,
                                          LoopVerifyConfig, OrbConfig,
                                          PipelineConfig, RansacConfig)
from slam_loop_closing_tpu.models.sfm import SfMPipeline
from slam_loop_closing_tpu.utils.synth_video import orbit_sequence


@pytest.fixture(scope="module")
def sfm_cfg():
    # Synthetic orbit frames are 192x144 with f = 0.8*w: use matching
    # intrinsics (no distortion) instead of the reference's iPhone numbers.
    cam = CameraConfig(fx=0.8 * 192, fy=0.8 * 192, cx=96.0, cy=72.0,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    return dataclasses.replace(
        PipelineConfig(),
        camera=cam,
        orb=OrbConfig(num_features=300, num_levels=2),
        keyframe=KeyframeConfig(min_median_displacement=2.0,
                                max_median_displacement=150.0,
                                min_tracked_features=40,
                                min_inlier_ratio=0.3, min_inliers=25),
        # the reference gates (300/200/100) are tuned for SIFT-4000;
        # scale to the 300-feature test budget
        loop_verify=LoopVerifyConfig(min_matches=40, min_inliers=30,
                                     min_inlier_ratio=0.5,
                                     min_pose_inliers=15),
        ransac=RansacConfig(num_hypotheses=128),
    )


@pytest.fixture(scope="module")
def frames():
    return orbit_sequence(num_frames=24, h=144, w=192, num_points=250,
                          seed=5)


@pytest.fixture(scope="module")
def pipeline_run(sfm_cfg, frames, tmp_path_factory):
    pipe = SfMPipeline(sfm_cfg, max_keyframes=32, max_points=8192,
                       max_obs=32768)
    res = pipe.run(frames, data_dir=str(tmp_path_factory.mktemp("sfm")))
    return pipe, res


class TestSfM:
    def test_keyframes_and_map(self, pipeline_run):
        _, res = pipeline_run
        k = int(res.state.kf_count)
        assert k >= 5, f"only {k} keyframes accepted"
        assert int(res.state.point_count) > 50
        assert int(res.state.obs_count) > 100

    def test_track_table_consistency(self, pipeline_run):
        """Every valid observation must reference a created point and an
        accepted keyframe."""
        _, res = pipeline_run
        s = res.state
        ov = np.asarray(s.obs_valid)
        op = np.asarray(s.obs_point)[ov]
        oc = np.asarray(s.obs_cam)[ov]
        assert op.min() >= 0 and op.max() < int(s.point_count)
        assert oc.min() >= 0 and oc.max() < int(s.kf_count)

    def test_poses_are_rotations(self, pipeline_run):
        from slam_loop_closing_tpu.ops import lie
        import jax.numpy as jnp

        _, res = pipeline_run
        k = int(res.state.kf_count)
        Rs, _ = lie.params_to_pose_batch(res.state.poses[:k])
        Rs = np.asarray(Rs)
        for R in Rs:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    def test_ba_reduces_error(self, pipeline_run):
        _, res = pipeline_run
        assert np.isfinite(res.reproj_after_ba)
        assert res.reproj_after_ba <= res.reproj_before_ba + 1e-3
        assert np.isfinite(res.reproj_final)

    def test_scan_path_matches_loop(self, sfm_cfg, frames, pipeline_run):
        """The lax.scan fast path must produce the same map as the host
        loop (same jitted step function, so bit-identical)."""
        pipe2 = SfMPipeline(sfm_cfg, max_keyframes=32, max_points=8192,
                            max_obs=32768, use_scan=True,
                            log=lambda *a: None)
        state2, infos2 = pipe2.run_frontend_and_keyframes_scan(frames)
        _, res = pipeline_run
        s1 = res.state
        # pipeline_run's state went through PGO/BA; compare the raw scan
        # output against a fresh host-loop run instead
        pipe1 = SfMPipeline(sfm_cfg, max_keyframes=32, max_points=8192,
                            max_obs=32768, log=lambda *a: None)
        state1, _ = pipe1.run_frontend_and_keyframes(frames)
        assert int(state1.kf_count) == int(state2.kf_count)
        assert int(state1.point_count) == int(state2.point_count)
        assert int(state1.obs_count) == int(state2.obs_count)
        np.testing.assert_allclose(np.asarray(state1.poses),
                                   np.asarray(state2.poses), atol=1e-5)

    def test_obj_written(self, pipeline_run):
        _, res = pipeline_run
        assert res.obj_path is not None
        text = open(res.obj_path).read()
        assert text.startswith("# Reconstruction point cloud")
        assert "v " in text

    def test_fused_backend_matches_staged(self, sfm_cfg, frames,
                                          pipeline_run):
        """run()'s fused single-program backend (run_backend) vs the staged
        optimize/bundle_adjust/remove_outliers sequence: same ops composed
        into one XLA program, so results must agree to fusion-order float
        tolerance and every discrete decision (keyframes, loop, outlier
        counts) must be identical."""
        pipe, res = pipeline_run  # run() = the fused path
        pipe2 = SfMPipeline(sfm_cfg, max_keyframes=32, max_points=8192,
                            max_obs=32768, log=lambda *a: None)
        state, _ = pipe2.run_frontend_and_keyframes(frames)
        loop = pipe2.find_loop(state)
        assert loop.found == res.loop.found
        state = pipe2.optimize(state, loop)
        e0 = pipe2._mean_reproj(state)
        state, errs = pipe2.bundle_adjust(state)
        state = pipe2.remove_outliers(state)
        state, errs2 = pipe2.bundle_adjust(state, outer_iterations=3)
        assert abs(e0 - res.reproj_before_ba) < 1e-2
        assert abs(float(errs[-1]) - res.reproj_after_ba) < 1e-2
        assert abs(float(errs2[-1]) - res.reproj_final) < 1e-2
        assert (int(np.asarray(state.point_valid).sum())
                == int(np.asarray(res.state.point_valid).sum()))
        np.testing.assert_allclose(np.asarray(res.state.poses),
                                   np.asarray(state.poses), atol=1e-3)


class TestTriangulationCounters:
    """The reference prints per-keyframe rejection counters
    (main.cpp:1343-1346: parallax / reproj / depth, with behind-camera folded
    into depth). Each gate is tripped by tightening its threshold on the
    same orbit scene and the counters must surface through StepInfo."""

    def _counters(self, sfm_cfg, frames, **tri_overrides):
        import dataclasses as dc

        from slam_loop_closing_tpu.config import TriangulationConfig

        cfg = dc.replace(sfm_cfg,
                         triangulation=TriangulationConfig(**tri_overrides))
        pipe = SfMPipeline(cfg, max_keyframes=32, max_points=8192,
                           max_obs=32768, log=lambda *a: None)
        _, infos = pipe.run_frontend_and_keyframes(frames[:8])
        return (sum(int(i.n_rej_parallax) for i in infos),
                sum(int(i.n_rej_reproj) for i in infos),
                sum(int(i.n_rej_depth) for i in infos),
                sum(int(i.n_triangulated) for i in infos))

    def test_parallax_gate_counted(self, sfm_cfg, frames):
        par, _, _, _ = self._counters(sfm_cfg, frames,
                                      min_parallax_deg=45.0)
        assert par > 0

    def test_reproj_gate_counted(self, sfm_cfg, frames):
        _, rep, _, _ = self._counters(sfm_cfg, frames,
                                      max_reproj_error_px=0.01)
        assert rep > 0

    def test_depth_gate_counted(self, sfm_cfg, frames):
        _, _, dep, _ = self._counters(sfm_cfg, frames, max_depth_rel=0.5)
        assert dep > 0

    def test_counters_logged_in_reference_format(self, sfm_cfg, frames):
        """The host loop must emit the reference's counter line
        (main.cpp:1343-1346) with real numbers."""
        import io

        from slam_loop_closing_tpu.config import TriangulationConfig
        from slam_loop_closing_tpu.utils.logging import PipelineLogger

        cfg = dataclasses.replace(
            sfm_cfg, triangulation=TriangulationConfig(min_parallax_deg=45.0))
        stream = io.StringIO()
        pipe = SfMPipeline(cfg, max_keyframes=32, max_points=8192,
                           max_obs=32768, log=PipelineLogger(stream=stream))
        pipe.run_frontend_and_keyframes(frames[:8])
        out = stream.getvalue()
        assert "(rejected: parallax=" in out
        import re

        rejected = [int(m.group(1)) for m in
                    re.finditer(r"rejected: parallax=(\d+)", out)]
        assert sum(rejected) > 0

    def test_scan_path_surfaces_counters(self, sfm_cfg, frames):
        """The lax.scan fast path returns the same stacked counters."""
        from slam_loop_closing_tpu.config import TriangulationConfig

        cfg = dataclasses.replace(
            sfm_cfg, triangulation=TriangulationConfig(min_parallax_deg=45.0))
        pipe = SfMPipeline(cfg, max_keyframes=32, max_points=8192,
                           max_obs=32768, use_scan=True, log=lambda *a: None)
        _, infos = pipe.run_frontend_and_keyframes_scan(frames[:8])
        assert int(np.asarray(infos.n_rej_parallax).sum()) > 0


def _make_loop_state(pipe, n_kf=42, n_feat=256, shared_decoy=120,
                     shared_winner=100, n_decoys=20, winner_valid=None,
                     seed=0):
    """Hand-built MapState for loop-search tests: ``n_decoys`` candidate
    pairs with MANY descriptor matches but random geometry (high match
    count, low RANSAC inliers) and one 'winner' pair with fewer matches but
    perfectly consistent two-view geometry (the global inlier-best)."""
    import jax.numpy as jnp

    from slam_loop_closing_tpu.models.sfm import init_map_state

    rng = np.random.default_rng(seed)
    state = init_map_state(n_kf, n_feat, 1024, 4096)

    signed = rng.choice(np.array([-1, 1], np.int8),
                        size=(n_kf, n_feat, 256))
    norm = rng.uniform(-0.5, 0.5, size=(n_kf, n_feat, 2)).astype(np.float32)
    valid = np.ones((n_kf, n_feat), bool)

    gap = n_kf // 2  # find_loop's gap = max(3, k//2)
    # decoy pairs (gap+i, i): shared descriptors, random geometry
    for i in range(n_decoys):
        c, p = gap + i, i
        signed[c, :shared_decoy] = signed[p, :shared_decoy]
    # winner pair (n_kf-1, gap-1): fewer shared descriptors, true geometry
    c, p = n_kf - 1, gap - 1
    signed[c, :shared_winner] = signed[p, :shared_winner]
    X = np.stack([rng.uniform(-1, 1, shared_winner),
                  rng.uniform(-1, 1, shared_winner),
                  rng.uniform(4, 8, shared_winner)], axis=1)
    # camera p at origin; camera c translated + slightly rotated
    th = 0.1
    R2 = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    t2 = np.array([0.5, 0.1, 0.0])
    Xp, Xc = X, X @ R2.T + t2
    norm[p, :shared_winner] = (Xp[:, :2] / Xp[:, 2:3]).astype(np.float32)
    norm[c, :shared_winner] = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
    if winner_valid is not None:
        valid[p] = False
        valid[p, :winner_valid] = True

    return state._replace(
        kf_count=jnp.asarray(n_kf, jnp.int32),
        signed=jnp.asarray(signed),
        kp_valid=jnp.asarray(valid),
        kp_norm=jnp.asarray(norm)), (c, p)


class TestLoopSearch:
    @pytest.fixture()
    def loop_pipe(self, sfm_cfg):
        from slam_loop_closing_tpu.config import (LoopVerifyConfig,
                                                  RansacConfig)

        cfg = dataclasses.replace(
            sfm_cfg,
            loop_verify=LoopVerifyConfig(min_matches=50, min_inliers=60,
                                         min_inlier_ratio=0.5,
                                         min_pose_inliers=30),
            ransac=RansacConfig(num_hypotheses=128))
        return SfMPipeline(cfg, max_keyframes=42, max_points=1024,
                           max_obs=4096, log=lambda *a: None)

    def test_inlier_best_beyond_top16_is_found(self, loop_pipe):
        """The reference keeps the global best by INLIER count over every
        qualifying pair (main.cpp:1375-1421). 20 decoy pairs outrank the
        true loop by match count; it must still win."""
        state, (c, p) = _make_loop_state(loop_pipe)
        res = loop_pipe.find_loop(state)
        assert res.found
        assert (res.curr_kf, res.past_kf) == (c, p)
        assert res.num_inliers >= 60

    def test_min_descriptor_gate(self, loop_pipe):
        """Pairs where either frame has <100 descriptors are skipped
        (main.cpp:1382) even if they would verify."""
        state, _ = _make_loop_state(loop_pipe, winner_valid=99,
                                    shared_winner=99)
        res = loop_pipe.find_loop(state)
        assert not res.found


def test_ship_frames_dtype_keyed_contract(rng):
    """uint8 normalization must key on dtype only: a device-resident jnp
    uint8 array and a host numpy uint8 array produce identical [0,1] floats
    (ADVICE r2: the old isinstance(np.ndarray) check silently skipped /255
    for jnp inputs)."""
    import jax.numpy as jnp

    from slam_loop_closing_tpu.ops.image import ship_frames

    u8 = rng.integers(0, 256, (2, 8, 8), dtype=np.uint8)
    a = np.asarray(ship_frames(u8))
    b = np.asarray(ship_frames(jnp.asarray(u8)))
    np.testing.assert_array_equal(a, b)
    assert a.max() <= 1.0
    f32 = u8.astype(np.float32) / 255.0
    np.testing.assert_array_equal(np.asarray(ship_frames(f32)), f32)
