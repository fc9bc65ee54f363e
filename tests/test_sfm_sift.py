"""Version-B SfM with the SIFT front-end (the detector the reference's
main.cpp actually ships, main.cpp:497-504) — the float-descriptor / L2-GEMM
code path end to end."""

import dataclasses

import numpy as np
import pytest

from slam_loop_closing_tpu.config import (CameraConfig, KeyframeConfig,
                                          LoopVerifyConfig, PipelineConfig,
                                          RansacConfig, SiftConfig)
from slam_loop_closing_tpu.models.sfm import SfMPipeline
from slam_loop_closing_tpu.utils.synth_video import orbit_sequence


@pytest.fixture(scope="module")
def run():
    cam = CameraConfig(fx=0.8 * 192, fy=0.8 * 192, cx=96.0, cy=72.0,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    from slam_loop_closing_tpu.config import MatchConfig

    cfg = dataclasses.replace(
        PipelineConfig(),
        detector="sift",
        camera=cam,
        sift=SiftConfig(num_features=400, num_octaves=2),
        # the synthetic texture yields sparser DoG keypoints than real
        # imagery; open up the ratio and gates accordingly
        match=MatchConfig(ratio_threshold=0.85),
        keyframe=KeyframeConfig(min_median_displacement=2.0,
                                max_median_displacement=150.0,
                                min_tracked_features=25,
                                min_inlier_ratio=0.3, min_inliers=15),
        loop_verify=LoopVerifyConfig(min_matches=25, min_inliers=15,
                                     min_inlier_ratio=0.4,
                                     min_pose_inliers=8),
        ransac=RansacConfig(num_hypotheses=128),
    )
    frames = orbit_sequence(num_frames=24, h=144, w=192, num_points=250,
                            seed=11)
    pipe = SfMPipeline(cfg, max_keyframes=16, max_points=4096, max_obs=16384,
                       log=lambda *a: None)
    state, infos = pipe.run_frontend_and_keyframes(frames)
    return state, infos


def test_sift_keyframes_accepted(run):
    state, infos = run
    assert int(state.kf_count) >= 4, int(state.kf_count)


def test_sift_map_builds(run):
    state, _ = run
    assert int(state.point_count) > 20
    assert int(state.obs_count) > 40
    # descriptor storage is the float layout
    assert state.signed.dtype == np.float32
    assert state.signed.shape[-1] == 128
