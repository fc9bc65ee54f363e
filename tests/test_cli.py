"""CLI surface tests: argument parsing, default-mode fallback, and the
calibrate entry point (the loop/reconstruct paths are exercised end-to-end by
the verify drive and model tests; these cover the argparse wiring)."""

import numpy as np
import pytest

from slam_loop_closing_tpu import cli


class TestParser:
    def test_modes_parse(self):
        p = cli._build_parser()
        for argv in (["extract", "--video", "x.MOV"],
                     ["loop", "--frames", "d"],
                     ["all", "--video", "x.MOV"],
                     ["reconstruct", "--frames", "d", "--scan"],
                     ["calibrate", "--images", "d"]):
            args = p.parse_args(argv)
            assert args.mode == argv[0]

    def test_default_mode_is_loop(self):
        """README.md:62: bare invocation defaults to loop mode."""
        with pytest.raises(SystemExit):
            # loop mode without --frames/--video exits with the
            # "need --frames or --video" error — proving it routed to loop
            cli.main(["--frame-skip", "2"])

    def test_config_overrides(self):
        p = cli._build_parser()
        args = p.parse_args(["loop", "--frames", "d", "--threshold", "0.7",
                             "--min-gap", "10", "--num-features", "512"])
        cfg = cli._load_config(args)
        assert cfg.loop.loop_threshold == 0.7       # the hpp:31 default
        assert cfg.loop.min_loop_gap == 10
        assert cfg.orb.num_features == 512


class TestCalibrateCli:
    def test_calibrate_runs(self, tmp_path):
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(
            __file__).parent))
        from test_calibration import render_chessboard

        h, w = 240, 320
        K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
        rng = np.random.default_rng(4)
        img_dir = tmp_path / "calib"
        img_dir.mkdir()
        from PIL import Image

        for i in range(4):
            rv = rng.uniform(-0.2, 0.2, 3) * np.array([1, 1, 0.5])
            ang = max(np.linalg.norm(rv), 1e-9)
            axis = rv / ang
            Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                           [-axis[1], axis[0], 0]])
            R = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * Kx @ Kx
            center = np.array([9 * 0.03 / 2, 6 * 0.03 / 2, 0.0])
            C = center + R.T @ np.array([0, 0, -rng.uniform(0.6, 0.7)])
            img = render_chessboard(K, R, -R @ C, 7, 10, 0.03, h, w)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                str(img_dir / f"board_{i}.png"))

        rc = cli.main(["calibrate", "--images", str(img_dir),
                       "--output-overlays", str(tmp_path / "overlays")])
        assert rc == 0
        assert (tmp_path / "overlays" / "corners_00.png").exists()
