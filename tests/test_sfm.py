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
