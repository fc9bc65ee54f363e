"""Grid-adapted top-K selection: one keypoint per cell, positions correct,
and the strongest peak always survives."""

import numpy as np
import jax.numpy as jnp

from slam_loop_closing_tpu.ops import fast


def test_one_per_cell_and_correct_positions(rng):
    score = np.zeros((64, 96), np.float32)
    # strongest peak + a weaker one in the SAME 8x8 cell + one elsewhere
    score[18, 34] = 0.9
    score[19, 35] = 0.5   # same cell as above -> must be suppressed
    score[40, 70] = 0.7
    xy, resp, valid = fast.select_topk_grid(jnp.asarray(score), 10,
                                            border=4, cell=8)
    xy = np.asarray(xy)[np.asarray(valid)]
    resp = np.asarray(resp)[np.asarray(valid)]
    got = {(int(x), int(y)): float(r) for (x, y), r in zip(xy, resp)}
    assert got == {(34, 18): np.float32(0.9), (70, 40): np.float32(0.7)}


def test_grid_subset_of_nms_peaks(rng):
    score = rng.random((128, 128)).astype(np.float32)
    suppressed = np.asarray(fast.nms(jnp.asarray(score)))
    xy, resp, valid = fast.select_topk_grid(jnp.asarray(suppressed), 50,
                                            border=8, cell=8)
    xy = np.asarray(xy)[np.asarray(valid)].astype(int)
    for x, y in xy:
        assert suppressed[y, x] > 0  # every selection is a real NMS peak
    # one per cell
    cells = {(y // 8, x // 8) for x, y in xy}
    assert len(cells) == len(xy)
