"""Logging, profiling, checkpointing utilities."""

from relaxtpu.utils.logging import setup_logger
from relaxtpu.utils.profiling import stage_timer, trace_to
from relaxtpu.utils.checkpoint import save_snapshot, load_snapshot

__all__ = ["setup_logger", "stage_timer", "trace_to", "save_snapshot", "load_snapshot"]
