"""IO, checkpointing, profiling, progress utilities."""
