"""User-facing pipelines: the Version-A ``LoopClosingSystem`` (ORB multi-loop
detector, reference loop_closing.hpp:29-80 / README.md) and the Version-B
``SfMPipeline`` (the main.cpp SfM backend)."""

from slam_loop_closing_tpu.models.loop_closing import (  # noqa: F401
    Frame, LoopCandidate, LoopClosingSystem)
