"""Elapsed-time tracing (dev_tools.rs:9-39 Timer equivalent).

``Timer.log`` prints ``[elapsed] msg`` between checkpoints.  Because XLA
dispatch is asynchronous, :meth:`log` can optionally block on a value so the
measured interval covers the device work, not just dispatch
(``block_until_ready`` before timing — SURVEY.md §5).
"""

from __future__ import annotations

import time

import jax

__all__ = ["Timer"]


class Timer:
    def __init__(self):
        self._last = time.perf_counter()

    def log(self, msg: str, block_on=None) -> float:
        """Print elapsed seconds since the last checkpoint and reset.

        If ``block_on`` is given (an array or pytree), waits for device
        completion first so async dispatch doesn't fake the timing.
        """
        if block_on is not None:
            jax.block_until_ready(block_on)
        now = time.perf_counter()
        elapsed = now - self._last
        print(f"[{elapsed:.3f}s] {msg}")
        self._last = now
        return elapsed
