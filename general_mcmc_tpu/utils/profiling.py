"""Profiler integration (SURVEY.md §5: the reference has only wall-clock
Timers; the TPU equivalent is jax.profiler traces viewable in XProf)."""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace"]


@contextlib.contextmanager
def trace(log_dir: str, block_on_exit=None):
    """Capture a device trace for the enclosed block.

    ``block_on_exit``: optional array/pytree to ``block_until_ready`` before
    closing the trace, so asynchronously dispatched work is captured.
    """
    with jax.profiler.trace(log_dir):
        yield
        if block_on_exit is not None:
            jax.block_until_ready(block_on_exit)
