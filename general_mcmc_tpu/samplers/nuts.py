"""No-U-Turn Sampler with dual-averaging step-size adaptation and
windowed mass-matrix warmup.

TPU-native rebuild of the reference's NUTS stack (nuts.rs façade +
generic_nuts.rs core).  All chains advance together: the per-chain tree step
(:mod:`..ops.tree`) is vmapped over the chain axis, the sampling loop is a
fused ``lax.scan``, and adaptation state (ε, ε̄, h̄, mass matrix, Welford
accumulators) lives in the scan carry — the entire warmup + sampling run is
one XLA program with no host round-trips (contrast: the reference syncs to
host once per leapfrog, nuts.rs:215-216).

Adaptation semantics from the reference:

- dual averaging with γ=0.05, t₀=10, κ=0.75, μ=ln(10ε) and
  ``ε̄``-geometric averaging during warmup, ``ε = ε̄`` afterwards
  (generic_nuts.rs:638-643, 882-895, 922-924);
- initial ε via the doubling/halving search (golden value ε=2.0 on the
  standard normal, nuts.rs:508-519);
- Stan-style mass-matrix warmup windows — start buffer 75, end buffer 50,
  initial window 25 doubling to a 400 cap, Welford running covariance,
  shrinkage ``(1-0.05)·Σ̂ + 0.05·I``, jittered Cholesky with ×10 retry
  escalation, dense only for dim ≤ 75 (generic_nuts.rs:43-79, 81-174,
  948-997).  Window boundaries depend only on the step index, so the
  schedule is precomputed host-side and streamed into the scan as boolean
  flags — all chains share globally synchronized windows (as in Stan and,
  in effect, the reference, whose per-chain schedules are identical).

Documented deviations (all toward Stan-correctness; SURVEY.md "hard parts"):

- trajectory depth is capped at ``max_tree_depth`` (default 10; the
  reference doubles unboundedly);
- within-subtree U-turn checks are mass-weighted (the reference uses the
  identity metric inside subtrees, generic_nuts.rs:1316, but the mass
  metric at the top level, :871-879);
- the post-window ε re-search uses the adapted mass matrix (the reference
  samples the probe momentum from the new mass but searches under the
  identity metric, generic_nuts.rs:909-915);
- ``ε̄`` is initialized to the found ε rather than 1, so runs with
  ``n_discard=0`` use the reasonable step size (the init value is
  overwritten at the first warmup step either way since κ-weight(1)=1);
- the adapted metric follows Stan: **M⁻¹ = Σ̂** (inverse mass = sample
  covariance), so momenta are drawn from N(0, Σ̂⁻¹) and position updates
  scale with the target's geometry.  The reference instead sets M = Σ̂
  (diagonal_from_var, generic_nuts.rs:197-207: momentum std = sample std,
  velocity = p/σ̂²), which shrinks position steps exactly where the target
  is widest — an inversion of the Stan metric that we deliberately correct.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.distributions import as_logp_fn
from ..ops.tree import (
    MassMatrix,
    find_reasonable_epsilon,
    identity_mass,
    nuts_tree_step,
    sample_momentum,
)
from ..rng import step_key
from .base import BatchSampler, _StepFn


class _Sched(NamedTuple):
    """Run-length-derived schedule snapshot BOUND into each cached step
    function at _prepare_run time.  The step trace must never read these
    from mutable sampler attributes: a BatchChain's step fn may be traced
    lazily AFTER a later run()/_prepare_run() overwrote them (round-3
    review finding — the chain would silently adopt the other run's warmup
    schedule).

    ``track_depth`` turns on the realized-tree-depth accumulators used by
    ``backend="auto"``; ``backend`` overrides the sampler-level backend for
    this step fn (auto builds an xla warmup fn and a chosen-backend
    collection fn from the same sampler)."""

    n_discard: int
    collect: jax.Array
    window: jax.Array
    track_depth: bool = False
    backend: str | None = None

__all__ = ["NUTS", "NUTSMassMatrixConfig"]

# Dual-averaging constants (generic_nuts.rs:638-643).
_GAMMA = 0.05
_T0 = 10.0
_KAPPA = 0.75


@dataclasses.dataclass(frozen=True)
class NUTSMassMatrixConfig:
    """Warmup mass-matrix adaptation config (generic_nuts.rs:43-79).

    ``adaptation`` is one of ``"none"``, ``"diagonal"``, ``"dense"``.
    """

    adaptation: str = "diagonal"
    start_buffer: int = 75
    end_buffer: int = 50
    initial_window: int = 25
    regularize: float = 0.05
    jitter: float = 1e-6
    dense_max_dim: int = 75

    @classmethod
    def disabled(cls) -> "NUTSMassMatrixConfig":
        return cls(adaptation="none", start_buffer=0, end_buffer=0,
                   initial_window=0, regularize=0.0, jitter=0.0, dense_max_dim=0)


def _warmup_schedule(config: NUTSMassMatrixConfig, n_warmup: int, total: int):
    """Host-side replica of MassMatrixWarmup's should_collect /
    note_if_window_end logic (generic_nuts.rs:141-174) over 1-based step
    numbers m = 1..total.  Returns (collect[total], window_end[total])."""
    collect = np.zeros(total, bool)
    window_end = np.zeros(total, bool)
    if config.adaptation == "none" or n_warmup == 0:
        return collect, window_end
    start_buffer = max(config.start_buffer, 1)
    window_len = max(config.initial_window, 10)
    next_window_end = start_buffer + window_len
    for idx in range(total):
        m = idx + 1
        should = (
            m <= n_warmup
            and m > config.start_buffer
            and m < max(n_warmup - config.end_buffer, 0)
        )
        collect[idx] = should
        if should and (
            m >= next_window_end or m + 1 >= max(n_warmup - config.end_buffer, 0)
        ):
            next_window_end += window_len
            window_len = min(window_len * 2, 400)
            window_end[idx] = True
    return collect, window_end


class _Welford(NamedTuple):
    """Batched running covariance accumulator (RunningCov,
    generic_nuts.rs:81-132)."""

    count: jax.Array  # [n_chains]
    mean: jax.Array  # [n_chains, d]
    m2_diag: jax.Array  # [n_chains, d]
    m2_dense: jax.Array  # [n_chains, d, d] or [n_chains, 0, 0]


class NUTS(BatchSampler):
    """Multi-chain No-U-Turn Sampler (nuts.rs:156-304,
    generic_nuts.rs:361-557).

    Parameters
    ----------
    target : callable or object with ``unnorm_logp``
        Differentiable log density of one state, ``logp(x: [dim]) -> scalar``.
    initial_positions : [n_chains, dim] float array
    target_accept_p : dual-averaging acceptance target δ (default 0.8)
    max_tree_depth : doubling cap per step (default 10)
    step_size : optional fixed initial ε (skips the ε search)
    mass_config : :class:`NUTSMassMatrixConfig`; default disabled, matching
        the reference façade (generic_nuts.rs:370-377) — pass
        ``NUTSMassMatrixConfig()`` for Stan-style diagonal adaptation.
    backend : ``"auto"`` (the default: warmup runs the xla tree while
        tracking realized depths; the collection backend is then chosen
        by the measured crossover rule — :meth:`_choose_backend`; the
        choice is exposed as ``backend_selected``), ``"xla"`` (vmapped
        while_loop tree), or ``"static"`` (static-window schedule,
        :mod:`..ops.static_tree`: all 2^max_depth − 1 leapfrogs run in a
        slim fixed-length loop, tree logic evaluated retrospectively from
        a Gram matrix).  The static backend supports dense mass too; its
        RNG stream differs from the xla tree's (identical transition law;
        see the ops/static_tree.py contract), so an auto run that
        resolves to static is law-equal but not bit-equal to a pure-xla
        run.  Caps > 6 (including the default, 10 — every measured static
        win is at caps 4–6, and cap-7/8 unrolled windows have measured
        compile pathologies), warmup-free runs,
        and multi-process runs resolve auto to xla without measuring —
        on the exact one-program path ``backend="xla"`` takes, so the
        default configuration is unchanged by auto.

        Measured guidance (v5e crossover sweep, 10240 chains × 100-d,
        docs/BENCH_HISTORY.md round 4): pick **static when the depth cap
        is within ~1 of the typical tree depth** (saturated regime — at
        cap 4 with depth-3.98 trees static measured 1.66× the xla tree;
        the round-3 bench 1.5× end-to-end) **or when depths vary across
        chains** (Neal's funnel: static 1.85–2.0× at caps 4–6, because
        under vmap every chain pays the batch-max tree anyway while
        static's per-leaf machinery is leaner).  Pick xla when trees
        self-terminate uniformly well below the cap (uniform depth-3
        trees under caps 5–8: xla 1.4–3.4×) or for caps > 8 (the
        always-full static window is both wasteful and too large a
        program).  Two fused Pallas NUTS kernels were built, measured and
        retired (rounds 3–4); the record lives in docs/MOSAIC_RULES.md.
    warmup_tree_depth : optional smaller doubling cap used during warmup
        only.  Pre-adaptation metrics make early trees hit the depth cap,
        and under vmap every chain pays the deepest tree in the batch; a
        shallower warmup cap bounds that masked-lane waste without touching
        post-warmup sampling.  Default: same as ``max_tree_depth``.
    proposal : ``"slice"`` (default — the reference's slice sampler,
        generic_nuts.rs:764-768) or ``"multinomial"`` (Stan's modern
        multinomial/biased-progressive proposal, Betancourt 2017 — a
        beyond-reference extension; typically equal or better ESS per
        gradient because leaves are weighted by exp(joint − joint₀)
        instead of thresholded).  Same trajectories, U-turn rule, and
        adaptation either way; supported by both backends (see
        ops/tree.py and ops/static_tree.py for the law details).
    """

    def __init__(
        self,
        target,
        initial_positions,
        target_accept_p: float = 0.8,
        seed=0,
        max_tree_depth: int = 10,
        step_size: float | None = None,
        mass_config: NUTSMassMatrixConfig | None = None,
        backend: str = "auto",
        warmup_tree_depth: int | None = None,
        ckpt_dtype=None,
        proposal: str = "slice",
    ):
        self.target = as_logp_fn(target)
        self.initial_positions = jnp.asarray(initial_positions)
        if not jnp.issubdtype(self.initial_positions.dtype, jnp.floating):
            self.initial_positions = self.initial_positions.astype(jnp.float32)
        self.dim = self.initial_positions.shape[1]
        self.target_accept_p = float(target_accept_p)
        self.max_tree_depth = int(max_tree_depth)
        self.warmup_tree_depth = int(
            warmup_tree_depth if warmup_tree_depth is not None else max_tree_depth
        )
        self.step_size = step_size
        cfg = mass_config if mass_config is not None else NUTSMassMatrixConfig.disabled()
        # Dense adaptation falls back to diagonal above dense_max_dim
        # (generic_nuts.rs:612-617).
        if cfg.adaptation == "dense" and self.dim > cfg.dense_max_dim:
            cfg = dataclasses.replace(cfg, adaptation="diagonal")
        if cfg.adaptation not in ("none", "diagonal", "dense"):
            raise ValueError(f"unknown adaptation {cfg.adaptation!r}")
        self.mass_config = cfg
        self._dense = cfg.adaptation == "dense"
        self._find_eps_jit = None  # lazily-built jitted ε₀ search (_init_carry)
        if backend in ("pallas", "pallas2"):
            raise ValueError(
                "the fused Pallas NUTS backend was retired (round 4): its "
                "varied-depth niche is owned by backend='static' "
                "(1.85-2x the xla tree on hard geometries at caps 4-6; "
                "docs/MOSAIC_RULES.md has the full record) — use 'static' "
                "for caps <= 8, 'xla' for deeper trees"
            )
        if backend not in ("xla", "static", "auto"):
            raise ValueError(f"unknown backend {backend!r}")
        if backend == "static" and max(
            self.max_tree_depth, self.warmup_tree_depth
        ) > 8:
            # every transition costs 2^depth - 1 gradient evals regardless
            # of where the trajectory stops — a depth-10 static window would
            # burn 1023 evals/step; use the dynamic tree there instead.
            raise ValueError(
                "the static backend always integrates the full 2^max_depth "
                "window; set max_tree_depth <= 8 (it is built for small "
                "caps) or use backend='xla'"
            )
        self.backend = backend
        if proposal not in ("slice", "multinomial"):
            raise ValueError(f"unknown proposal {proposal!r}")
        self.proposal = proposal
        self._multinomial = proposal == "multinomial"
        # Optional reduced-precision checkpoint stacks for the XLA tree
        # (e.g. jnp.bfloat16): the stacks feed only U-turn sign tests; see
        # ops/tree.py build_subtree for the documented deviation.
        self.ckpt_dtype = ckpt_dtype
        self._vg = jax.value_and_grad(self.target)
        self._n_discard = 0
        self._collect_sched = jnp.zeros(1, bool)
        self._window_sched = jnp.zeros(1, bool)
        super().__init__(n_chains=self.initial_positions.shape[0], seed=seed)

    # -- per-run preparation ------------------------------------------------
    def _prepare_run(self, n_collect: int, n_discard: int) -> None:
        self._n_discard = n_discard
        total = n_collect + n_discard
        collect, window_end = _warmup_schedule(self.mass_config, n_discard, total)
        # Trailing sentinel (False, False) + clamped lookup: step indices
        # beyond ``total`` occur with thin > 1 and on resumed runs (absolute
        # step_offset indices) — both are post-warmup by construction, so
        # they must read "no adaptation", not an XLA-clamped last entry.
        # (list() first: schedules arrive as numpy bool arrays, for which
        # `arr + [False]` would be elementwise OR, not an append)
        self._collect_sched = jnp.asarray(list(collect) + [False])
        self._window_sched = jnp.asarray(list(window_end) + [False])
        # The step fn closes over the (n_collect, n_discard)-derived schedule
        # at trace time, so the jitted runner is keyed on the _StepFn's
        # identity.  Cache one per run-shape: repeat runs with the same
        # lengths reuse the compiled program instead of retracing (a 20+ min
        # recompile through the TPU tunnel).  Mutating sampler config between
        # runs is not supported (construct a new sampler instead).
        cache = getattr(self, "_stepfn_cache", None)
        if cache is None:
            cache = self._stepfn_cache = {}
        # auto mode with a warmup builds a depth-TRACKING xla step fn here;
        # run() resolves the collection backend from the tracked statistics
        # at the warmup→collection boundary (_collection_step_fn).  Caps > 8
        # resolve to xla unconditionally (_choose_backend's first rule), so
        # they skip tracking entirely — the default cap (10) pays neither
        # the accumulators nor the extra boundary program.
        track = (self.backend == "auto" and n_discard > 0
                 and self.max_tree_depth <= 6)
        key = (n_collect, n_discard, id(self._extract_fn), track)
        if key not in cache:
            sched = _Sched(n_discard, self._collect_sched, self._window_sched,
                           track_depth=track)
            cache[key] = self._make_step_fn(
                step=lambda c, m, _s=sched: self._step(c, m, _s)
            )
        self._step_fn = cache[key]

    def _collection_step_fn(self, n_collect: int, n_discard: int,
                            backend: str) -> _StepFn:
        """Step fn for the post-warmup collection phase of an auto run:
        same schedule as :meth:`_prepare_run`'s (dual averaging still keys
        off the real ``n_discard``), resolved ``backend``, no depth
        tracking (run() strips the accumulators at the boundary)."""
        cache = self._stepfn_cache
        key = (n_collect, n_discard, id(self._extract_fn), backend)
        if key not in cache:
            sched = _Sched(n_discard, self._collect_sched, self._window_sched,
                           backend=backend)
            cache[key] = self._make_step_fn(
                step=lambda c, m, _s=sched: self._step(c, m, _s)
            )
        return cache[key]

    # -- carry --------------------------------------------------------------
    def _init_carry(self):
        x0 = self.initial_positions
        dtype = x0.dtype
        n, d = x0.shape
        lp0, grad0 = jax.vmap(self._vg)(x0)
        lp0 = lp0.astype(dtype)
        grad0 = grad0.astype(dtype)
        keys = self._chain_keys
        mass = jax.vmap(lambda _: identity_mass(d, self._dense, dtype))(
            jnp.arange(n)
        )
        if self.step_size is not None:
            eps0 = jnp.full((n,), self.step_size, dtype)
        else:
            init_keys = jax.vmap(lambda k: jax.random.fold_in(k, 2**31 - 1))(keys)
            # Jitted + cached on the sampler: run eagerly, the vmapped
            # double-while dispatch re-traces (and can re-compile) on EVERY
            # run — TPU-profiled at ~0.9 s of a 10.4 s benchmark reap per
            # repetition.  The cached version costs one compile total.
            if self._find_eps_jit is None:

                def find_eps(k, x, m):
                    mom = sample_momentum(k, m, self._dense)
                    return find_reasonable_epsilon(self._vg, x, mom, m, self._dense)

                self._find_eps_jit = jax.jit(jax.vmap(find_eps))
            eps0 = self._find_eps_jit(init_keys, x0, mass)
        mu = jnp.log(10.0 * eps0)
        welford = _Welford(
            count=jnp.zeros((n,), jnp.int32),
            mean=jnp.zeros((n, d), dtype),
            m2_diag=jnp.zeros((n, d), dtype),
            m2_dense=jnp.zeros((n, d, d) if self._dense else (n, 0, 0), dtype),
        )
        carry = dict(
            pos=x0,
            lp=lp0,
            grad=grad0,
            keys=keys,
            eps=eps0,
            eps_bar=eps0,
            h_bar=jnp.zeros((n,), dtype),
            mu=mu,
            mass=mass,
            welford=welford,
            n_divergent=jnp.zeros((n,), jnp.int32),
            n_leapfrog=jnp.zeros((n,), jnp.int64)
            if jax.config.jax_enable_x64
            else jnp.zeros((n,), jnp.int32),
        )
        if (self.backend == "auto" and self._n_discard > 0
                and self.max_tree_depth <= 6):
            # realized-depth accumulators for the collection-backend choice
            # (skipped for caps > 6, where auto is unconditionally xla)
            carry["depth_sum"] = jnp.zeros((n,), jnp.int32)
            carry["depth_sqsum"] = jnp.zeros((n,), jnp.int32)
        return carry

    # -- transition ---------------------------------------------------------
    def _step(self, carry, m, sched: _Sched | None = None):
        if sched is None:  # direct calls outside a prepared run
            sched = _Sched(self._n_discard, self._collect_sched, self._window_sched)
        dtype = carry["pos"].dtype
        m1 = (m + 1).astype(dtype)  # 1-based step number

        backend = sched.backend
        if backend is None:
            # auto warmups always run the dynamic tree (it pays only for
            # the depth actually realized, and its realized depths are the
            # selection signal); run() swaps in a resolved-backend step fn
            # for collection.
            backend = "xla" if self.backend == "auto" else self.backend
        if backend == "static":
            from ..ops.tree import TreeStepResult
            from ..ops.static_tree import static_nuts_step

            keys = jax.vmap(step_key, in_axes=(0, None))(carry["keys"], m)

            def run_static(depth):
                r = static_nuts_step(
                    keys,
                    carry["pos"],
                    carry["lp"],
                    carry["grad"],
                    carry["eps"],
                    carry["mass"].inv,
                    carry["mass"].scale,
                    self._vg,
                    depth,
                    dense=self._dense,
                    multinomial=self._multinomial,
                )
                return TreeStepResult(
                    pos=r.pos, lp=r.lp, grad=r.grad, alpha=r.alpha,
                    n_alpha=r.n_alpha, depth=r.depth, diverged=r.diverged,
                    leapfrogs=r.leapfrogs,
                )

            # A resolved collection fn (sched.backend set) only ever runs
            # post-warmup steps — don't trace the warmup-depth branch (it
            # is dead, and warmup_tree_depth may exceed the static cap).
            if (self.warmup_tree_depth != self.max_tree_depth
                    and sched.backend is None):
                tree = jax.lax.cond(
                    m < sched.n_discard,
                    lambda: run_static(self.warmup_tree_depth),
                    lambda: run_static(self.max_tree_depth),
                )
            else:
                tree = run_static(self.max_tree_depth)
        else:
            keys = jax.vmap(step_key, in_axes=(0, None))(carry["keys"], m)

            def run_tree(depth):
                def go(k, p, lp, g, e, mass):
                    return nuts_tree_step(
                        k, p, lp, g, e, mass, self._dense, self._vg, depth,
                        ckpt_dtype=self.ckpt_dtype,
                        multinomial=self._multinomial,
                    )

                return jax.vmap(go)(
                    keys, carry["pos"], carry["lp"], carry["grad"],
                    carry["eps"], carry["mass"],
                )

            if (self.warmup_tree_depth != self.max_tree_depth
                    and sched.backend is None):
                # scalar phase switch: only one branch executes per step
                tree = jax.lax.cond(
                    m < sched.n_discard,
                    lambda: run_tree(self.warmup_tree_depth),
                    lambda: run_tree(self.max_tree_depth),
                )
            else:
                tree = run_tree(self.max_tree_depth)

        # Dual averaging (generic_nuts.rs:882-895).
        eta = 1.0 / (m1 + _T0)
        accept_stat = tree.alpha / tree.n_alpha.astype(dtype)
        h_bar = (1.0 - eta) * carry["h_bar"] + eta * (self.target_accept_p - accept_stat)
        warmup = m1 <= sched.n_discard
        eps_w = jnp.exp(carry["mu"] - jnp.sqrt(m1) / _GAMMA * h_bar)
        eta2 = m1 ** (-_KAPPA)
        eps_bar_w = jnp.exp(
            (1.0 - eta2) * jnp.log(carry["eps_bar"]) + eta2 * jnp.log(eps_w)
        )
        eps = jnp.where(warmup, eps_w, carry["eps_bar"])
        eps_bar = jnp.where(warmup, eps_bar_w, carry["eps_bar"])

        new = dict(
            pos=tree.pos,
            lp=tree.lp,
            grad=tree.grad,
            keys=carry["keys"],
            eps=eps,
            eps_bar=eps_bar,
            h_bar=h_bar,
            mu=carry["mu"],
            mass=carry["mass"],
            welford=carry["welford"],
            n_divergent=carry["n_divergent"]
            + (tree.diverged & ~warmup).astype(jnp.int32),
            n_leapfrog=carry["n_leapfrog"] + tree.leapfrogs,
        )

        # backend="auto" depth statistics: accumulate realized tree depth
        # (sum + sum of squares, per chain) over the LAST QUARTER of warmup
        # — earlier depths reflect the unadapted metric and, decisively,
        # the per-chain dual-averaging ε wander: tracked over the second
        # half, a uniform-depth 100-d Gaussian measured depth std 0.87
        # (round-5 calibration probes) purely from ε exploration, which
        # would misread the xla-winning regime as funnel-like.  By the
        # last quarter ε_m has largely settled toward ε̄ (κ=0.75 decay),
        # so the window approximates the collection regime the choice is
        # about.  The fields must pass through unchanged when present but
        # not tracked (scan carries are structure-invariant; a resolved
        # collection fn may still see a tracking carry in
        # chain()/run_progress flows).
        if "depth_sum" in carry:
            if sched.track_depth:
                win = max(sched.n_discard // 4, 1)
                in_win = (m >= sched.n_discard - win) & (m < sched.n_discard)
                d = tree.depth.astype(jnp.int32)
                zero = jnp.zeros_like(d)
                new["depth_sum"] = carry["depth_sum"] + jnp.where(
                    in_win, d, zero
                )
                new["depth_sqsum"] = carry["depth_sqsum"] + jnp.where(
                    in_win, d * d, zero
                )
            else:
                new["depth_sum"] = carry["depth_sum"]
                new["depth_sqsum"] = carry["depth_sqsum"]

        if self.mass_config.adaptation != "none":
            new = self._mass_adaptation(new, m, sched)
        return new

    # -- mass-matrix warmup -------------------------------------------------
    def _mass_adaptation(self, carry, m, sched: _Sched):
        m_idx = jnp.minimum(m, sched.collect.shape[0] - 1)
        collect = sched.collect[m_idx]
        window_end = sched.window[m_idx]
        carry = dict(carry)
        carry["welford"] = self._welford_update(
            carry["welford"], carry["pos"], collect
        )
        return jax.lax.cond(
            window_end, self._window_update, lambda c, _m: c, carry, m
        )

    def _welford_update(self, w: _Welford, x, collect):
        """Masked batched Welford update (RunningCov::update,
        generic_nuts.rs:109-131)."""
        cnt = w.count + collect.astype(jnp.int32)
        cntf = jnp.maximum(cnt, 1).astype(x.dtype)[:, None]
        delta = x - w.mean
        mean = jnp.where(collect, w.mean + delta / cntf, w.mean)
        delta2 = x - mean
        m2_diag = jnp.where(collect, w.m2_diag + delta * delta2, w.m2_diag)
        if self._dense:
            m2_dense = jnp.where(
                collect,
                w.m2_dense + delta[:, :, None] * delta2[:, None, :],
                w.m2_dense,
            )
        else:
            m2_dense = w.m2_dense
        return _Welford(jnp.where(collect, cnt, w.count), mean, m2_diag, m2_dense)

    def _window_update(self, carry, m):
        """End-of-window: refresh the mass matrix from the Welford state,
        re-find ε under the new metric, reset dual averaging and the
        accumulator (generic_nuts.rs:897-921, 948-997)."""
        cfg = self.mass_config
        w: _Welford = carry["welford"]
        dtype = carry["pos"].dtype
        reg = jnp.asarray(cfg.regularize, dtype)
        jitter = jnp.asarray(max(cfg.jitter, 1e-10), dtype)
        have = w.count >= 5  # update gate (generic_nuts.rs:952-954)
        denom = jnp.maximum(w.count - 1, 1).astype(dtype)

        old_mass: MassMatrix = carry["mass"]
        if self._dense:
            raw = w.m2_dense / denom[:, None, None]
            d = raw.shape[-1]
            eye = jnp.eye(d, dtype=dtype)
            cov = (1.0 - reg) * raw
            diag = jnp.maximum(
                (1.0 - reg) * jnp.diagonal(raw, axis1=1, axis2=2) + reg, jitter
            )
            cov = cov * (1.0 - eye) + jax.vmap(jnp.diag)(diag)

            def chol_with_retries(c):
                # Stan metric: M⁻¹ = Σ̂, momenta ~ N(0, Σ̂⁻¹).  With
                # Σ̂ = L Lᵀ the momentum transform is scale = L⁻ᵀ
                # (cov(L⁻ᵀ z) = Σ̂⁻¹).  Jittered Cholesky with ×10
                # escalation, 8 tries (generic_nuts.rs:209-225).
                def attempt(state, k):
                    found, inv_cov, mom_scale = state
                    j = jitter * (10.0 ** k.astype(dtype))
                    trial = c + j * eye
                    L = jnp.linalg.cholesky(trial)
                    ok = jnp.all(jnp.isfinite(L))
                    Ls = jnp.where(ok, L, eye)
                    L_inv = jax.scipy.linalg.solve_triangular(Ls, eye, lower=True)
                    ok = ok & jnp.all(jnp.isfinite(L_inv))
                    take = ok & ~found
                    return (
                        found | ok,
                        jnp.where(take, trial, inv_cov),
                        jnp.where(take, L_inv.T, mom_scale),
                    ), None

                (found, inv_cov, mom_scale), _ = jax.lax.scan(
                    attempt, (jnp.asarray(False), eye, eye), jnp.arange(8)
                )
                return found, inv_cov, mom_scale

            found, inv_mass, mom_scale = jax.vmap(chol_with_retries)(cov)
            use = (have & found)[:, None, None]
            mass = MassMatrix(
                inv=jnp.where(use, inv_mass, old_mass.inv),
                scale=jnp.where(use, mom_scale, old_mass.scale),
            )
            updated = have & found
        else:
            raw = w.m2_diag / denom[:, None]
            var = jnp.maximum((1.0 - reg) * raw + reg, jitter)
            use = have[:, None]
            # Stan metric: M⁻¹ = diag(σ̂²) → inv = σ̂², momentum std = 1/σ̂.
            mass = MassMatrix(
                inv=jnp.where(use, var, old_mass.inv),
                scale=jnp.where(use, 1.0 / jnp.sqrt(var), old_mass.scale),
            )
            updated = have

        # ε re-search under the new metric + dual-averaging reset
        # (generic_nuts.rs:904-920).
        probe_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, 2**31 - 2)
        )(jax.vmap(step_key, in_axes=(0, None))(carry["keys"], m))

        def find_eps(k, x, mm):
            mom = sample_momentum(k, mm, self._dense)
            return find_reasonable_epsilon(self._vg, x, mom, mm, self._dense)

        eps_new = jax.vmap(find_eps)(probe_keys, carry["pos"], mass)
        eps = jnp.where(updated, eps_new, carry["eps"])
        mu = jnp.where(updated, jnp.log(10.0 * eps_new), carry["mu"])
        eps_bar = jnp.where(updated, eps_new, carry["eps_bar"])
        h_bar = jnp.where(updated, 0.0, carry["h_bar"])
        w_reset = _Welford(
            count=jnp.where(updated, 0, w.count),
            mean=jnp.where(updated[:, None], 0.0, w.mean),
            m2_diag=jnp.where(updated[:, None], 0.0, w.m2_diag),
            m2_dense=jnp.where(updated[:, None, None], 0.0, w.m2_dense)
            if self._dense
            else w.m2_dense,
        )
        out = dict(carry)
        out.update(mass=mass, eps=eps, mu=mu, eps_bar=eps_bar, h_bar=h_bar,
                   welford=w_reset)
        return out

    def _positions(self, carry):
        return carry["pos"]

    # -- backend="auto" -----------------------------------------------------
    @staticmethod
    def _choose_backend(measured_cap: int, mean_depth: float,
                        std_depth: float, max_cap: int,
                        static_cap: int = 6) -> str:
        """Collection-backend choice from warmup depth statistics — the
        measured round-4 crossover rule (docs/BENCH_HISTORY.md, v5e sweep at
        10240 chains × 100-d) as code:

        - caps > ``static_cap``: xla.  Every measured static win is at
          caps 4–6 (1.5–2.0×); above that the unrolled window's COMPILE
          becomes the hazard an automatic mode must not pick — a cap-7
          static program (127 unrolled leapfrogs + a T=128 Gram) burned
          >30 min of CPU compile without finishing (round-5 bisect), and
          cap-8 windows at the bench shape crash the remote TPU
          compile-helper (docs/ROADMAP.md #6).  The CPU (LLVM) backend
          already chokes at cap 6 (>10 min vs 58 s at cap 5, round-5
          probes), so :meth:`run` passes ``static_cap=5`` there and 6 on
          TPU.  ``backend="static"`` still allows caps ≤ 8 explicitly —
          there the user owns the compile budget;
        - saturated regime (typical depth within ~1.25 of the cap the
          depths were measured under): static measured 1.66× the xla tree
          at cap 4 / depth 3.98, 1.5× end-to-end on the round-3 bench
          → static;
        - varied depths, std ≥ 1.0 (funnel-like: static 1.85–2.0× at caps
          4–6, because under vmap every chain pays the batch-max tree
          anyway while static's per-leaf machinery is leaner) → static.
          The threshold is calibrated against last-quarter-of-warmup
          tracking (round-5 probes): the 100-d funnel measures std 1.13+
          while uniform-depth Gaussians measure ≤ 0.74 (pure per-chain
          dual-averaging ε wander + depth jitter — the regime whose
          trees self-terminate early, where xla wins 1.4–3.4×) and
          low-dim Gaussians ≈ 0.88 (binomial depth jitter around a mean
          far below the cap — also an xla regime: the dynamic tree stops
          at ~2^2.4 leapfrogs vs the window's fixed 2^cap − 1);
        - else (uniformly shallow self-terminating trees) → xla.

        ``measured_cap`` is the cap the warmup depths were realized under
        (``warmup_tree_depth``); ``max_cap`` is the collection cap.
        """
        if max_cap > static_cap:
            return "xla"
        if measured_cap - mean_depth <= 1.25:
            return "static"
        if std_depth >= 1.0:
            return "static"
        return "xla"

    def run(self, n_collect: int, n_discard: int = 0, thin: int = 1):
        """:meth:`BatchSampler.run`, plus backend resolution when
        ``backend="auto"``: warmup runs the dynamic xla tree while
        accumulating realized-depth statistics in the carry; at the
        warmup→collection boundary (already a separate dispatch in
        :func:`~..core.run_kernel`) the statistics are read back (one host
        sync, same cost ChEES pays for its static-L read) and
        :meth:`_choose_backend` picks the collection backend.  The choice
        and the statistics are exposed as ``backend_selected`` and
        ``depth_stats``.  Incremental (:meth:`~.base.BatchSampler.chain`)
        and progress drivers run the whole program one-backend (xla) —
        they have no boundary dispatch to resolve at; :meth:`resume`
        reuses the previous selection."""
        if (self.backend != "auto" or n_discard == 0
                or self.max_tree_depth > 6
                or jax.process_count() > 1):
            if self.backend == "auto":
                # Resolved without measuring: caps > 6 are always xla
                # (_choose_backend's first rule — skipping the boundary
                # program keeps the default cap on the exact pre-auto
                # path); no warmup means nothing to measure; multi-process
                # boundary depth read-back would be a cross-host sync on a
                # non-fully-addressable carry.  The dynamic tree is the
                # safe default in all three cases.
                self.backend_selected = "xla"
            return super().run(n_collect, n_discard, thin)
        from ..core import run_kernel

        self._prepare_run(n_collect, n_discard)
        out = run_kernel(self._step_fn, self._init_carry(), 0, n_discard)
        carry = dict(out.carry)
        d_sum = carry.pop("depth_sum")
        d_sq = carry.pop("depth_sqsum")
        win = max(n_discard // 4, 1)  # tracked steps per chain (last quarter)
        total = max(win * self.n_chains, 1)
        mean = float(jnp.sum(d_sum)) / total
        var = max(float(jnp.sum(d_sq)) / total - mean * mean, 0.0)
        std = var ** 0.5
        choice = self._choose_backend(
            self.warmup_tree_depth, mean, std, self.max_tree_depth,
            # the CPU (LLVM) backend's static-window compile wall explodes
            # one cap earlier than the TPU toolchain's (see _choose_backend)
            static_cap=6 if jax.default_backend() != "cpu" else 5,
        )
        self.backend_selected = choice
        self.depth_stats = (mean, std)
        fn = self._collection_step_fn(n_collect, n_discard, choice)
        out = run_kernel(fn, carry, n_collect, 0, step_offset=n_discard,
                         thin=thin)
        self._final_carry = out.carry
        self._steps_done = n_collect * thin + n_discard
        return jnp.swapaxes(out.samples, 0, 1)

    def resume(self, path: str, n_collect: int):
        if self.backend == "auto":
            # post-warmup continuation: keep the run()'s resolved backend
            # (collection-phase trajectories continue under the same law);
            # fall back to xla when no selection has happened yet.
            choice = getattr(self, "backend_selected", "xla")
            from ..core import run_kernel
            from ..utils.checkpoint import load_carry

            state = load_carry(path)
            carry, offset = state["carry"], int(state["steps"])
            self._prepare_run(n_collect, 0)
            fn = self._collection_step_fn(n_collect, 0, choice)
            out = run_kernel(fn, carry, n_collect, 0, step_offset=offset)
            self._final_carry = out.carry
            self._steps_done = offset + n_collect
            return jnp.swapaxes(out.samples, 0, 1)
        return super().resume(path, n_collect)

    # -- extras -------------------------------------------------------------
    @property
    def divergences(self):
        """Per-chain post-warmup divergence counts from the last run."""
        return getattr(self, "_final_carry", {}).get("n_divergent")

    @property
    def adapted_step_size(self):
        return getattr(self, "_final_carry", {}).get("eps_bar")

    @property
    def leapfrog_count(self):
        """Per-chain total gradient evaluations from the last run."""
        return getattr(self, "_final_carry", {}).get("n_leapfrog")
