"""Utility subsystems: timing, reporting, checkpointing, debug."""
