"""Shared benchmark setup: persistent XLA compile cache.

Compiles on this machine are remote (axon) and cost 0.5-60 s each, so every
bench must reuse a persistent cache. The dir is split by backend because the
same program compiles to different executables per platform.
"""

from __future__ import annotations

import os


def setup_cache():
    import jax

    backend = jax.default_backend()
    suffix = "" if backend == "cpu" else f"_{backend}"
    # axon reports platform "tpu" via PJRT; keep the round-1 dir name
    if backend != "cpu":
        suffix = "_tpu"
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(f"~/.cache/jax_comp{suffix}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
