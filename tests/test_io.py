"""Host-side IO tests: OBJ format, loop_closures.txt format, frame
extraction caching semantics, synthetic video renderer."""

import numpy as np

from slam_loop_closing_tpu.utils import io as io_utils
from slam_loop_closing_tpu.utils.synth_video import orbit_sequence, write_frames


class TestObj:
    def test_vertex_layout(self, tmp_path):
        pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        R = np.stack([np.eye(3), np.eye(3)])
        t = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        p = io_utils.write_obj(tmp_path / "x.obj", pts, R, t,
                               log=lambda *a: None)
        lines = [l for l in p.read_text().splitlines() if l.startswith("v ")]
        # 2 points + 2 cameras x (1 center + 3 axes) = 10 vertices
        assert len(lines) == 2 + 2 * 4
        def vec(line):
            return [float(x) for x in line.split()[1:]]

        assert vec(lines[0]) == [1.0, 2.0, 3.0]
        # camera 1 center C = -R^T t = (-1, 0, 0)
        assert vec(lines[2 + 4]) == [-1.0, 0.0, 0.0]
        # its +x axis endpoint at C + 0.1 * e_x
        assert vec(lines[2 + 5]) == [-0.9, 0.0, 0.0]

    def test_masks_drop_entries(self, tmp_path):
        pts = np.zeros((5, 3))
        R = np.stack([np.eye(3)] * 3)
        t = np.zeros((3, 3))
        p = io_utils.write_obj(tmp_path / "m.obj", pts, R, t,
                               point_valid=np.array([1, 0, 1, 0, 0], bool),
                               cam_valid=np.array([1, 1, 0], bool),
                               log=lambda *a: None)
        lines = [l for l in p.read_text().splitlines() if l.startswith("v ")]
        assert len(lines) == 2 + 2 * 4


class TestLoopTxt:
    # The reference README's example output block (README.md:150-166),
    # verbatim: this is the golden transcript loop_closures.txt must
    # byte-match (modulo the example's trailing "..." continuation marker).
    GOLDEN = (
        "=== Processing Complete ===\n"
        "Total frames processed: 97\n"
        "Loop closures detected: 45\n"
        "\n"
        "Loop Closures Detected:\n"
        "======================\n"
        "\n"
        "Frame 93 <-> Frame 0\n"
        "  Matches: 434\n"
        "  Similarity: 0.2085\n"
        "\n"
        "Frame 96 <-> Frame 0\n"
        "  Matches: 236\n"
        "  Similarity: 0.217\n"
    )

    def test_golden_readme_format(self, tmp_path):
        """Byte-match against the README example (README.md:150-166). The
        README shows 45 loops but lists only the two example blocks; we
        write exactly those two and compare the full prefix byte-for-byte
        with the loop count patched to the written number."""
        p = io_utils.write_loop_closures_txt(
            tmp_path / "loop_closures.txt",
            [{"current": 93, "matched": 0, "num_matches": 434,
              "similarity": 0.2085},
             {"current": 96, "matched": 0, "num_matches": 236,
              "similarity": 0.217}],
            total_frames=97)
        expected = self.GOLDEN.replace("Loop closures detected: 45",
                                       "Loop closures detected: 2")
        assert p.read_text() == expected

    def test_similarity_cpp_default_formatting(self, tmp_path):
        """Similarity must print like C++ default ostream (6 significant
        digits, trailing zeros trimmed) — the README shows both 0.2085 and
        0.217."""
        text = io_utils.format_loop_closures(
            [{"current": 1, "matched": 0, "num_matches": 10,
              "similarity": 0.217000}])
        assert "  Similarity: 0.217\n" in text
        assert "0.2170" not in text


class TestFrames:
    def test_write_and_enumerate(self, tmp_path):
        frames = orbit_sequence(num_frames=5, h=32, w=48, num_points=30)
        d = write_frames(frames, tmp_path / "seq")
        paths = io_utils.enumerate_frames(d)
        assert len(paths) == 5
        assert paths[0].name == "frame_0000.png"
        loaded = io_utils.load_frames_gray(paths, frame_skip=2)
        assert loaded.shape == (3, 32, 48)
        np.testing.assert_allclose(loaded[0], frames[0], atol=0.01)

    def test_extraction_cache_skip(self, tmp_path, capsys):
        out = tmp_path / "data" / "extracted_frames" / "vid"
        out.mkdir(parents=True)
        msgs = []
        res = io_utils.extract_images(str(tmp_path / "vid.MOV"),
                                      str(tmp_path / "data"),
                                      log=msgs.append)
        assert res == out
        assert any("Skipping" in m for m in msgs)

    def test_orbit_angular_periodicity(self):
        """The orbit is parameterized on [0, 2*pi): the same angle renders
        the same frame regardless of sequence length (same seed => same
        world). This is the geometric loop-closure ground truth; the
        descriptor-level loop firing is covered by test_loop_closing."""
        a = orbit_sequence(num_frames=24, h=96, w=128, num_points=150, seed=7)
        b = orbit_sequence(num_frames=12, h=96, w=128, num_points=150, seed=7)
        np.testing.assert_allclose(a[0], b[0], atol=1e-6)
        np.testing.assert_allclose(a[2], b[1], atol=1e-6)
        np.testing.assert_allclose(a[22], b[11], atol=1e-6)
        # and different angles render genuinely different frames
        assert float(np.mean((a[0] - a[12]) ** 2)) > 1e-3


class TestMatchViz:
    def test_writes_png(self, tmp_path):
        img = np.random.default_rng(0).random((40, 60)).astype(np.float32)
        xy = np.array([[10.0, 10.0], [20.0, 20.0]])
        p = io_utils.save_match_visualization(
            tmp_path / "m.png", img, img, xy, xy,
            np.array([True, False]), np.array([0, 1]))
        assert p.exists() and p.stat().st_size > 0
