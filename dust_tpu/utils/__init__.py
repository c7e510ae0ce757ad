"""Shared utilities: color math, image IO, profiling, checkpointing."""
