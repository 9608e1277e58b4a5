"""Utilities: checkpointing, profiling, schedules."""
