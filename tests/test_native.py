"""Native frame-IO runtime tests (native/frame_io.cpp via ctypes): PNG
round-trip against PIL, parallel batch decode, fused resize."""

import numpy as np
import pytest
from PIL import Image

from slam_loop_closing_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


def test_roundtrip_matches_pil(tmp_path, rng):
    img = rng.random((37, 53)).astype(np.float32)
    p = tmp_path / "a.png"
    native.write_png_gray_native(p, img)
    via_pil = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
    assert np.abs(via_pil - img).max() < 1 / 255.0 + 1e-6
    assert native.png_shape(p) == (37, 53)


def test_batch_parallel_decode(tmp_path, rng):
    imgs = [rng.random((24, 32)).astype(np.float32) for _ in range(8)]
    paths = []
    for i, im in enumerate(imgs):
        p = tmp_path / f"f{i}.png"
        native.write_png_gray_native(p, im)
        paths.append(p)
    batch = native.load_frames_gray_native(paths, num_threads=4)
    assert batch.shape == (8, 24, 32)
    for i in range(8):
        assert np.abs(batch[i] - imgs[i]).max() < 1 / 255.0 + 1e-6


def test_rgb_decode_bt601(tmp_path, rng):
    rgb = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    p = tmp_path / "rgb.png"
    Image.fromarray(rgb).save(p)
    out = native.load_frames_gray_native([p])
    expected = rgb @ np.array([0.299, 0.587, 0.114]) / 255.0
    assert np.abs(out[0] - expected).max() < 2 / 255.0


def test_fused_resize(tmp_path):
    img = np.tile(np.linspace(0, 1, 64, dtype=np.float32), (64, 1))
    p = tmp_path / "g.png"
    native.write_png_gray_native(p, img)
    out = native.load_frames_gray_native([p], 32, 32)
    assert out.shape == (1, 32, 32)
    # horizontal gradient preserved
    assert out[0, 16, 0] < 0.1 and out[0, 16, -1] > 0.9
