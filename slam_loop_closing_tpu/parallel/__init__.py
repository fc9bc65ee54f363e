"""Multi-chip scale-out over a ``jax.sharding.Mesh`` (TPU ICI).

The reference is single-threaded (SURVEY.md §2.11); these are the TPU-native
parallel axes of the same workload:

* **DP over frames**: the feature front-end shards the frame batch.
* **Ring similarity (SP-shaped)**: the all-pairs loop-search matmul exchanges
  descriptor blocks around the ring (``ppermute``), exactly the structure of
  ring attention with frames as the sequence axis.
* **DP over candidate pairs**: RANSAC verification fans candidate loop pairs
  across chips.

Axes that do NOT apply to this workload (stated, not stubbed — SURVEY.md
§2.11): pipeline parallelism (no layered model to stage), expert parallelism
(no experts), and attention-style context parallelism (the ring similarity
IS the context-parallel analogue, with frames as tokens). Tensor
parallelism's role — splitting one big matmul across chips — is exactly what
the ring does to the [F*N, F*N] similarity matmul: each chip owns a block
row and the rotating operand provides the block columns.

Everything runs on a CPU mesh (``--xla_force_host_platform_device_count=8``)
for tests and on real ICI unchanged.
"""

from slam_loop_closing_tpu.parallel.mesh import make_mesh  # noqa: F401
