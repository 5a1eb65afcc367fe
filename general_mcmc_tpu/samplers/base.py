"""Shared batch-sampler runtime.

Every sampler in this package follows the same TPU-native execution model
(replacing the reference's per-chain Rayon tasks, core.rs:219-229, and
per-chain progress threads, core.rs:251-403):

- chain state is a batched pytree with a leading ``[n_chains]`` axis;
- one transition step is a pure function ``carry -> carry`` (vmapped over
  chains where the kernel is written per-chain);
- a run is two fused ``lax.scan``s (burn-in, then collect) inside one jit;
- progress mode re-enters jit chunk-wise and streams sufficient statistics
  into a :class:`MultiChainTracker` — the psum-style "merge statistics, not
  samples" analog of the reference's mpsc ChainStats channels (stats.rs:41-46).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from ..core import (
    advance_kernel,
    run_kernel,
    run_kernel_progress,
    run_kernel_progress_stream,
)
from ..diagnostics.stats import MultiChainTracker, RunStats
from ..rng import as_key, chain_keys
from ..utils.progress import ProgressRenderer

__all__ = ["BatchSampler", "BatchChain"]


class BatchChain:
    """Incremental per-step chain driving — the public analog of the
    reference's ``NUTSChain`` (nuts.rs:311-438): create via
    :meth:`BatchSampler.chain`, call :meth:`step` repeatedly, inspect
    :meth:`current_state` between calls.

    The batch semantics are TPU-native: one ``step(n)`` advances ALL chains
    ``n`` transitions in a single compiled scan (the whole-run scan is still
    the efficient path for fixed-length runs; this API exists for
    interactive exploration, custom stopping rules, and external control
    loops).  Step indices are absolute and continue across calls, so the
    per-step RNG stream — and any warmup schedule the sampler prepared for
    the first ``n_warmup`` steps — is identical to a single fused run of
    the same total length.
    """

    def __init__(self, sampler: "BatchSampler", carry):
        self._sampler = sampler
        self._step_fn = sampler._step_fn
        self._carry = carry
        self._m = 0

    @property
    def steps_done(self) -> int:
        return self._m

    def current_state(self):
        """Tracked state snapshot ``[n_chains, k]`` (positions, or the
        :meth:`BatchSampler.track` transform) — MarkovChain::current_state
        (core.rs:79-85)."""
        return self._step_fn.extract(self._carry)

    def step(self, n: int = 1):
        """Advance all chains ``n`` transitions; returns the
        ``[n_chains, n, k]`` block of post-step tracked states.  The
        compiled program is reused across calls with the same ``n`` (the
        step offset is traced, not baked in)."""
        out = advance_kernel(self._step_fn, self._carry, n, self._m)
        self._carry = out.carry
        self._m += n
        # keep the owning sampler checkpointable at this chain's frontier
        self._sampler._final_carry = out.carry
        self._sampler._steps_done = self._m
        return jnp.swapaxes(out.samples, 0, 1)


class _StepFn:
    """Hashable (by identity) step-function wrapper for the jitted runner."""

    def __init__(self, step: Callable, extract: Callable):
        self._step = step
        self.extract = extract

    def __call__(self, carry, m):
        return self._step(carry, m)


class _LatestStats:
    """Renderer-facing view of the last streamed (max_rhat, p_accept,
    rotating per-chain p_accept window) tick."""

    p_accept = float("nan")
    p_accept_chain = None
    p_accept_chain_start = 0
    p_chain_is_window = True  # p_accept_chain is a pre-rotated window
    _max_rhat = float("nan")

    def max_rhat(self) -> float:
        return self._max_rhat


class BatchSampler:
    """Base class: subclasses implement ``_init_carry``, ``_step`` and
    ``_positions`` and inherit ``run`` / ``run_progress`` / ``set_seed``."""

    def __init__(self, n_chains: int, seed=None):
        self.n_chains = n_chains
        self._key = as_key(seed if seed is not None else 0)
        self._extract_fn = None
        self._step_fn = self._make_step_fn()

    def _make_step_fn(self, step: Callable | None = None) -> _StepFn:
        """Build the runner-facing step wrapper, composing the optional
        Trace hook (:meth:`track`) over ``_positions``.  ``step`` lets a
        sampler bind run-derived state (e.g. NUTS warmup schedules) into
        the wrapper so lazily-traced step fns never read mutable sampler
        attributes."""
        step = step if step is not None else self._step
        fn = self._extract_fn
        if fn is None:
            return _StepFn(step, self._positions)
        return _StepFn(step, lambda carry: fn(self._positions(carry)))

    def track(self, extract_fn: Callable | None):
        """Set the Trace extension point (core.rs:34-72): a pure jittable map
        ``[n_chains, dim] positions -> [n_chains, k] tracked quantities``
        applied inside the sampling scan, so collected samples, streaming
        progress statistics, and post-run diagnostics all see the derived
        quantities instead of raw positions — e.g. track β = μ + τ·z of a
        non-centered hierarchical model and get R-hat/ESS on the β scale
        (examples/regression_nc_track.py).  ``None`` restores raw positions.
        Returns ``self`` (builder style, like ``seed``)."""
        self._extract_fn = extract_fn
        # fresh identity so the jitted runner cannot serve a compilation
        # traced with the previous extract map
        self._step_fn = self._make_step_fn()
        if hasattr(self, "_stepfn_cache"):
            self._stepfn_cache.clear()
        return self

    # -- subclass interface -------------------------------------------------
    def _prepare_run(self, n_collect: int, n_discard: int) -> None:
        """Hook called before each run; samplers with run-length-dependent
        state (e.g. NUTS warmup schedules) rebuild it here.  Implementations
        that change traced closure state must also refresh ``self._step_fn``
        so the jit cache cannot serve a stale compilation."""

    def _init_carry(self) -> Any:
        raise NotImplementedError

    def _step(self, carry, m):
        raise NotImplementedError

    def _positions(self, carry):
        raise NotImplementedError

    # -- seeding (parity with the reference's .seed()/set_seed builders) ----
    def set_seed(self, seed):
        self._key = as_key(seed)
        return self

    seed = set_seed

    @property
    def _chain_keys(self):
        return chain_keys(self._key, self.n_chains)

    # -- incremental driving ------------------------------------------------
    def chain(self, n_warmup: int = 0) -> "BatchChain":
        """Open an incremental per-step view of this sampler
        (:class:`BatchChain`; NUTSChain, nuts.rs:311-438).  Adaptive
        samplers prepare their warmup schedule for the first ``n_warmup``
        steps — ``chain(K)`` then ``step(K); step(N)`` visits exactly the
        states of ``run(N, K)``."""
        self._prepare_run(0, n_warmup)
        return BatchChain(self, self._init_carry())

    # -- running ------------------------------------------------------------
    def run(self, n_collect: int, n_discard: int = 0, thin: int = 1):
        """Run ``n_discard + n_collect·thin`` steps; return every ``thin``-th
        collected post-step state as ``[n_chains, n_collect, dim]``
        (ChainRunner::run, core.rs:219-229; ``thin`` is an extension —
        skipped states never stage through HBM, so long decorrelated
        collections fit in memory)."""
        self._prepare_run(n_collect, n_discard)
        out = run_kernel(self._step_fn, self._init_carry(), n_collect, n_discard,
                         thin=thin)
        self._final_carry = out.carry
        self._steps_done = n_collect * thin + n_discard
        return jnp.swapaxes(out.samples, 0, 1)

    # -- checkpoint / resume (absent in the reference: core.rs:177 TODO) ----
    def save_checkpoint(self, path: str) -> None:
        """Persist the full sampler state after a run (state pytree + step
        counter) so sampling can continue later with fresh RNG streams."""
        from ..utils.checkpoint import save_carry

        if not hasattr(self, "_final_carry"):
            raise RuntimeError("nothing to checkpoint: call run() first")
        save_carry(
            {"carry": self._final_carry, "steps": jnp.asarray(self._steps_done)},
            path,
        )

    def resume(self, path: str, n_collect: int):
        """Continue sampling from a checkpoint: ``n_collect`` more post-step
        states, no burn-in, step indices (and therefore per-step RNG keys)
        continuing where the checkpointed run stopped.  Resuming is intended
        for post-warmup continuation; adaptive samplers keep their adapted
        state (ε̄, mass matrix) frozen, exactly as in their own post-warmup
        phase."""
        from ..utils.checkpoint import load_carry

        state = load_carry(path)
        carry, offset = state["carry"], int(state["steps"])
        self._prepare_run(n_collect, 0)
        out = run_kernel(self._step_fn, carry, n_collect, 0, step_offset=offset)
        self._final_carry = out.carry
        self._steps_done = offset + n_collect
        return jnp.swapaxes(out.samples, 0, 1)

    # Above this many staged bytes (total steps × chains × dim × 4), the
    # chunked mode's host round trips dominate and auto mode picks "stream".
    _AUTO_STREAM_BYTES = 64 * 1024 * 1024

    def run_progress(self, n_collect: int, n_discard: int = 0, progress: bool = True,
                     mode: str = "auto"):
        """Like :meth:`run` but with live progress + streaming R-hat
        (ChainRunner::run_progress, core.rs:251-403).  Returns
        ``(samples, RunStats)``.

        ``mode="chunked"`` re-enters jit per chunk and streams state blocks
        through a host-side tracker; ``mode="stream"`` compiles the whole
        run once and emits only (steps, max-R-hat, p-accept) scalars from
        inside the scan via ``io_callback`` — samples never stage through
        host memory, so it is the right mode for large runs or exotic run
        lengths where per-chunk recompiles hurt.  The default ``"auto"``
        picks "stream" once the run would stage more than ~64 MiB of states
        through the host, else "chunked".
        """
        self._prepare_run(n_collect, n_discard)
        carry = self._init_carry()
        dim = self._step_fn.extract(carry).shape[-1]
        total = n_discard + n_collect
        if mode == "auto":
            staged = total * self.n_chains * dim * 4
            mode = "stream" if staged > self._AUTO_STREAM_BYTES else "chunked"
        renderer = (
            ProgressRenderer(self.n_chains, total) if progress else None
        )

        if mode == "stream":
            stats = _LatestStats()

            def hook(done, max_rhat, p_accept, window_start, p_chain_window):
                stats.p_accept = float(p_accept)
                stats.p_accept_chain = p_chain_window
                stats.p_accept_chain_start = int(window_start)
                stats._max_rhat = float(max_rhat)
                if renderer is not None:
                    renderer.update(int(done), stats)

            out = run_kernel_progress_stream(
                self._step_fn, carry, n_collect, n_discard, hook
            )
        elif mode == "chunked":
            tracker = MultiChainTracker(self.n_chains, dim)

            def callback(done, states):
                tracker.step_batch(states)
                if renderer is not None:
                    renderer.update(done, tracker)

            out = run_kernel_progress(
                self._step_fn, carry, n_collect, n_discard, callback
            )
        else:
            raise ValueError(f"unknown progress mode {mode!r}")
        if renderer is not None:
            renderer.close()
        self._final_carry = out.carry
        self._steps_done = total  # keeps save_checkpoint/resume RNG-correct
        samples = jnp.swapaxes(out.samples, 0, 1)
        return samples, RunStats.from_sample(samples)
