"""Per-stage timing + jax profiler traces.

The reference's only instrumentation is wall-clock prints
(``main_fragment_layerstack.py:279,363-364``); here timing is structured and
``trace_to`` wraps ``jax.profiler`` for XLA-level traces (a first-class
feature per SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("relaxtpu.profiling")


@contextlib.contextmanager
def stage_timer(name: str, sink: dict | None = None):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + dt
        log.debug("stage %s: %.3fs", name, dt)


@contextlib.contextmanager
def trace_to(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
