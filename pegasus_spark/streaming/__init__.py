"""Structured Streaming surface: the streaming-shaped pieces of the
reference (SURVEY §2.9) as real streams — metrics rollups with watermarks,
and a custom stateful per-host accumulator."""
