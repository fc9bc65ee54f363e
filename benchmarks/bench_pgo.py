"""10k-pose pose-graph benchmark (BASELINE.json configs[4]: "10k-pose
pose-graph least-squares (batched Gauss-Newton/LM) after loop closure").

Builds a noisy 10k-pose loop trajectory with sequential + loop-closure edges
and times the matrix-free PCG Gauss-Newton solve."""

from __future__ import annotations

import json
import time

import numpy as np


def build_graph(n_poses=10_000, n_loops=100, noise=0.01, seed=0):
    import jax.numpy as jnp

    from slam_loop_closing_tpu.ops import pgo

    rng = np.random.default_rng(seed)
    angles = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)

    def rotz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                         [0, 0, 1.0]])

    clean_R = [rotz(a) for a in angles]
    clean_t = [np.array([np.cos(a), np.sin(a), 0.0]) * 50 for a in angles]
    params = np.stack([
        np.concatenate([[0, 0, a], clean_t[i]]) for i, a in enumerate(angles)])
    params[1:] += rng.normal(0, noise, params[1:].shape)

    pairs = [(i, i + 1) for i in range(n_poses - 1)]
    loop_ids = rng.integers(n_poses // 2, n_poses, n_loops)
    pairs += [(int(i) - n_poses // 2, int(i)) for i in loop_ids]
    ef, et, Rr, tr, w = [], [], [], [], []
    for i, j in pairs:
        Rrel = clean_R[j] @ clean_R[i].T
        ef.append(i), et.append(j), Rr.append(Rrel)
        tr.append(clean_t[j] - Rrel @ clean_t[i])
        w.append(1.0 if j == i + 1 else 10.0)
    g = pgo.PoseGraph(
        e_from=jnp.asarray(ef, jnp.int32), e_to=jnp.asarray(et, jnp.int32),
        R_rel=jnp.asarray(np.array(Rr), jnp.float32),
        t_rel=jnp.asarray(np.array(tr), jnp.float32),
        weight=jnp.asarray(w, jnp.float32),
        mask=jnp.ones(len(ef), bool))
    return jnp.asarray(params, jnp.float32), g


def main(n_poses=10_000, iterations=10):
    from _common import setup_cache
    setup_cache()

    import jax.numpy as jnp

    from slam_loop_closing_tpu.config import PgoConfig
    from slam_loop_closing_tpu.ops import pgo

    params, g = build_graph(n_poses)
    cfg = PgoConfig(dense_solver_max_poses=0, cg_iterations=50)
    c0 = float(pgo.total_cost(params, g))
    # warmup/compile; sync by forced host readback (block_until_ready does
    # not reliably synchronize on this axon runtime — docs/PERFORMANCE.md
    # "Profiling method")
    out, costs = pgo.optimize_pose_graph(params, g, cfg, iterations)
    np.asarray(costs[-1:])
    t0 = time.perf_counter()
    out, costs = pgo.optimize_pose_graph(params, g, cfg, iterations)
    np.asarray(costs[-1:])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"pgo_{n_poses}poses_{iterations}iters",
        "value": round(dt, 3),
        "unit": "seconds",
        "vs_baseline": None,
        "cost_before": c0,
        "cost_after": float(costs[-1]),
    }))
    return dt


if __name__ == "__main__":
    main()
