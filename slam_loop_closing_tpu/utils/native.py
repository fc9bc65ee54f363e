"""ctypes bindings for the native frame-IO runtime (native/frame_io.cpp):
parallel libpng decode into one contiguous [N, H, W] float32 batch — the
native counterpart of the reference's OpenCV imgcodecs layer (main.cpp:1141
``cv::imread``; extract_images_from_mov.cpp ``cv::imwrite``).

The library auto-builds with g++ on first use (cached in ``build/``); every
entry point has a pure-Python fallback so the package works without a
compiler. ``load_frames_gray_native`` is the fast path the CLI uses: with T
worker threads the whole sequence decodes in parallel straight into the
buffer that becomes the device transfer."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "frame_io.cpp"
_SO = _REPO / "build" / "libframe_io.so"

_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            _SO.parent.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17",
                 "-shared", "-o", str(_SO), str(_SRC),
                 "-lpng", "-lz", "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.frameio_png_shape.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.frameio_load_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        lib.frameio_load_batch_gray.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.frameio_write_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return lib
    except Exception:
        _build_failed = True
        return None


def available() -> bool:
    return _load() is not None


def png_shape(path: str | Path) -> tuple[int, int]:
    lib = _load()
    if lib is None:
        from PIL import Image

        w, h = Image.open(str(path)).size
        return h, w
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.frameio_png_shape(str(path).encode(), ctypes.byref(h),
                               ctypes.byref(w))
    if rc != 0:
        raise IOError(f"failed to read PNG {path} (rc={rc})")
    return h.value, w.value


def load_frames_gray_native(paths, h: int | None = None, w: int | None = None,
                            num_threads: int | None = None) -> np.ndarray:
    """Parallel-decode PNG frames to one [N, h, w] float32 array in [0, 1]
    (BT.601 grayscale; bilinear resize fused when h/w differ from source).
    Falls back to PIL when the native library is unavailable."""
    paths = [str(p) for p in paths]
    if not paths:
        return np.zeros((0, 0, 0), np.float32)
    if h is None or w is None:
        h, w = png_shape(paths[0])
    lib = _load()
    if lib is None:
        from slam_loop_closing_tpu.utils import io as io_utils

        return io_utils.load_frames_gray(paths, frame_skip=1,
                                         resize_hw=(h, w))
    out = np.empty((len(paths), h, w), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    if num_threads is None:
        num_threads = min(len(paths), os.cpu_count() or 1)
    failures = lib.frameio_load_batch_gray(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, num_threads)
    if failures:
        raise IOError(f"{failures} frames failed to decode")
    return out


def write_png_gray_native(path: str | Path, img: np.ndarray) -> None:
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    if lib is None:
        from PIL import Image

        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            str(path))
        return
    rc = lib.frameio_write_gray(
        str(path).encode(),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[0], img.shape[1])
    if rc != 0:
        raise IOError(f"failed to write PNG {path} (rc={rc})")
