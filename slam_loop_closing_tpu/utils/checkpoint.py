"""Map-state checkpoints: save/restore the SfM ``MapState`` between pipeline
stages (SURVEY.md §5 — the reference's only resume mechanism is the
skip-if-exists extraction cache, main.cpp:97-100; we add NPZ checkpoints
after the front-end / after PGO / after BA so long reconstructions restart
from the last completed stage)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_map_state(path: str | Path, state) -> Path:
    """Write a MapState pytree (NamedTuple of arrays) as compressed NPZ."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        str(p), **{k: np.asarray(v) for k, v in state._asdict().items()})
    return p


def load_map_state(path: str | Path):
    """Restore a MapState written by :func:`save_map_state`."""
    import jax.numpy as jnp

    from slam_loop_closing_tpu.models.sfm import MapState

    with np.load(str(path)) as z:
        fields = {k: jnp.asarray(z[k]) for k in z.files}
    return MapState(**fields)


def stage_checkpoint_path(data_dir: str | Path, stage: str) -> Path:
    return Path(data_dir) / "checkpoints" / f"map_{stage}.npz"
