"""Host-side utilities: video/frame IO, artifact writers (OBJ, loop txt,
match visualizations), logging, and checkpoints. Nothing in here touches the
device — all TPU compute lives in :mod:`slam_loop_closing_tpu.ops`."""
