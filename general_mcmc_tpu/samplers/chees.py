"""ChEES-HMC: cross-chain adaptive Hamiltonian Monte Carlo.

Beyond-reference extension (the reference's only adaptive sampler is NUTS,
nuts.rs + generic_nuts.rs).  ChEES-HMC is the accelerator-native answer to
the same problem NUTS solves — "how long should a trajectory be?" — from
Hoffman, Radul & Sountsov, *An Adaptive MCMC Scheme for Setting Trajectory
Lengths in Hamiltonian Monte Carlo* (AISTATS 2021; see also the tfp.mcmc
hardware paper, arXiv:2002.01184).  Instead of per-chain tree building it
runs plain fixed-length HMC whose (shared, scalar) trajectory length is
adapted from *cross-chain* statistics:

- every iteration integrates ALL chains for the same jittered time
  ``t_m = u_m · T`` (``u_m``: base-2 Halton sequence on the absolute step
  index), so the leapfrog loop is a scalar-bounded ``fori_loop`` over a
  full-batch body — no per-chain control flow, no batch-max tree, no
  checkpoint stacks.  On TPU this is the shape XLA compiles to
  near-roofline leapfrogs (the round-3 bare-leapfrog probe measured ~19×
  the tree backends' grad-eval throughput at the benchmark batch);
- ``T`` maximizes the ChEES criterion ``E[(‖θ⁺−μ⁺‖² − ‖θ−μ‖²)²]/4`` by
  Adam on ``log T``, with the analytic time-derivative ``dθ⁺/dt = v⁺``
  (the final velocity) and proposals importance-weighted by their MH
  acceptance probability — all cross-chain reductions, which is why the
  scheme *wants* the many-chain regime this package is built around;
- the (shared, scalar) step size ε follows the same dual-averaging law as
  NUTS (γ=0.05, t₀=10, κ=0.75; generic_nuts.rs:638-643) but driven by the
  cross-chain mean acceptance probability, targeting the HMC-optimal 0.651
  by default;
- the diagonal metric follows Stan's convention (M⁻¹ = Σ̂, like
  :mod:`.nuts`) but Σ̂ is estimated from the *cross-chain* variance of the
  current batch (EMA-smoothed), refreshed every warmup step — with ≥10⁴
  chains a single batch already estimates marginal variances to ~1%, so
  no Welford windows are needed.

All adaptation state is scalar/[d] and lives in the scan carry; after
``n_discard`` steps everything freezes (ε = ε̄, T and M⁻¹ at their final
values) and only the Halton jitter remains active, so collection draws a
valid (jittered-HMC) Markov chain.  Checkpoint/resume therefore composes
exactly like the other samplers: a resumed run is post-warmup by
construction and keeps the adapted state frozen.

Deviations from the paper (documented per the repo convention):

- jitter uses the plain base-2 van der Corput sequence (the 1-D Halton
  sequence) on the absolute step index instead of a *scrambled* Halton
  sequence — deterministic, stateless, resume/thin-consistent;
- the ChEES gradient is normalized by the criterion value before the Adam
  step (the tfp.mcmc implementation's trick), making the learning rate
  scale-free;
- trajectories are capped at ``max_leapfrog`` steps per iteration (the
  paper's unbounded ``⌈t/ε⌉`` can explode while ε is still adapting).

Geometry guidance (measured, docs/BENCH_HISTORY.md rounds 4-5): on
HMC-amenable targets ChEES dominates the tree backends (12× NUTS on the
headline Gaussian, 10.8× on the non-centered hierarchical logistic); on
centered funnel geometry NEITHER law passes the convergence gate (the
neck defeats any fixed-metric HMC-family sampler — ChEES still measured
2.3× NUTS's min-ESS/s with smaller v-bias at equal non-gating quality).
Reparameterize funnels (models/regression.py non-centered variants) and
watch ``divergences``.

Strong CORRELATION is NOT a blind spot of the diagonal metric, despite
the conjecture that NUTS-dense should win there (scripts/
exp_correlated.py, v5e, round 5): on a 50-d Gaussian with uniform
off-diagonal 0.9 (condition 451 — invisible to any diagonal rescaling),
ChEES at 4096 chains × 512+512 reached 1.58M min-ESS/s (R-hat 1.0006,
moment audit 8e-4) while NUTS-dense managed 4.8k and FAILED the gate
(R-hat 1.02 at 512 warmup, 1.09 at 1536): Stan-window dense adaptation
estimates each chain's 50×50 covariance from its OWN ≤400 window draws
— far too few — whereas ChEES needs no covariance at all: the adapted
trajectory length grows to traverse the slow eigendirection and the
Halton jitter decorrelates the fast ones.  At many-chain TPU scale,
cross-chain adaptation beats per-chain dense adaptation on exactly the
geometry dense adaptation was designed for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.distributions import as_grad_fn, as_logp_fn
from ..ops.tree import find_reasonable_epsilon, identity_mass, sample_momentum
from ..rng import step_key
from .base import BatchSampler

__all__ = ["ChEESHMC", "halton_base2"]

# Dual-averaging constants, shared with NUTS (generic_nuts.rs:638-643).
_GAMMA = 0.05
_T0 = 10.0
_KAPPA = 0.75
# Adam moments for the log-T ascent (paper §4: standard Adam).
_B1 = 0.9
_B2 = 0.999
_ADAM_EPS = 1e-8
# Energy-error divergence threshold, as in the NUTS backends (Δ_max).
_DELTA_MAX = 1000.0


def halton_base2(m):
    """Base-2 radical inverse (van der Corput / 1-D Halton) of ``m + 1``.

    Jittable and stateless: bit-reverse the 32-bit counter and scale by
    2⁻³², giving the low-discrepancy sequence 0.5, 0.25, 0.75, 0.125, …
    strictly inside (0, 1).  Evaluated on the *absolute* step index so
    thinned, resumed and incrementally-driven runs see the same jitter
    stream as one fused run.
    """
    n = (jnp.asarray(m) + 1).astype(jnp.uint32)
    n = (n << 16) | (n >> 16)
    n = ((n & 0x00FF00FF) << 8) | ((n >> 8) & 0x00FF00FF)
    n = ((n & 0x0F0F0F0F) << 4) | ((n >> 4) & 0x0F0F0F0F)
    n = ((n & 0x33333333) << 2) | ((n >> 2) & 0x33333333)
    n = ((n & 0x55555555) << 1) | ((n >> 1) & 0x55555555)
    return n.astype(jnp.float32) * jnp.float32(2.0**-32)


class ChEESHMC(BatchSampler):
    """Jittered HMC with cross-chain ChEES trajectory-length adaptation.

    Parameters
    ----------
    target : callable or object with ``unnorm_logp``
        Differentiable log density of one state, ``logp(x: [dim]) -> scalar``.
    initial_positions : [n_chains, dim] float array
    target_accept_p : dual-averaging acceptance target δ (default 0.651,
        the optimal acceptance rate for plain HMC; NUTS uses 0.8+).
    step_size : optional fixed initial ε (skips the ε search; ε still
        adapts during warmup — pass ``n_discard=0`` to freeze it).
    trajectory_length : initial maximum trajectory *time* T (default 1.0;
        each iteration integrates for ``u_m · T`` with ``u_m`` ~ Halton).
    max_leapfrog : hard cap on leapfrog steps per iteration (default 256).
        Bounds the while-loop trip count while ε is still small early in
        warmup; post-warmup trajectories on well-adapted metrics use a few
        to a few dozen steps.
    adam_lr : Adam learning rate for the log-T ascent (default 0.025, the
        paper's setting; raise for very short warmups).
    mass_adaptation : adapt the diagonal metric from cross-chain variance
        during warmup (default True).  The Stan convention M⁻¹ = Σ̂ is
        used, matching :mod:`.nuts`.
    mass_ema : EMA weight for the per-step cross-chain variance estimate
        (default 0.1; the effective averaging window is ~1/mass_ema steps).
    jitter_amount : fraction of the trajectory that jitters (default 1.0,
        the paper's law: t = u·T with u ~ Halton on (0, 1)).  With
        ``jitter_amount=j`` the integration time is ``t = (1 − j·u)·T``,
        i.e. uniform on ((1−j)·T, T).  Lower values trade gradient
        evaluations for ESS-per-draw: trajectories stay near the adapted
        optimum instead of averaging half of it, which pays when collected
        draws (not gradients) are the scarce resource — e.g. HBM-capped
        collection phases at large chain counts.  Keep some jitter
        (j ≳ 0.3) to break resonances on near-Gaussian targets.
    static_collection : opt-in TPU performance mode (default False).  When
        True, :meth:`run` (and :meth:`resume`) collect with
        :meth:`_static_collect_step`: a trace-time-constant leapfrog count
        ``L = round(T·(1−j/2)/ε̄)`` with the jitter moved to the step size
        — same momentum/accept RNG stream, same stationary law, but the
        integration loop unrolls at compile time instead of paying the
        dynamic while_loop's ~150 µs/step scheduling overhead (v5e,
        docs/BENCH_HISTORY.md round 4).  The warmup phase, and the
        interactive paths (:meth:`~.base.BatchSampler.run_progress`,
        :meth:`~.base.BatchSampler.chain`, ``run_sharded``), always use the
        adaptive (ε fixed / L jittered) law — the two laws sample the same
        target but draw different trajectories, so don't compare their
        streams draw-by-draw.
    static_leapfrog : explicit collection leapfrog count for
        ``static_collection`` (default None = derive ``round(T·(1−j/2)/ε̄)``
        from the adapted state).  The derived L reproduces the adaptive
        law's *mean* trajectory; the adaptive law's ⌈t/ε⌉ rounds up, so
        L+1 can buy a few percent ESS-per-draw at one extra gradient.
    """

    def __init__(
        self,
        target,
        initial_positions,
        target_accept_p: float = 0.651,
        seed=0,
        step_size: float | None = None,
        trajectory_length: float = 1.0,
        max_leapfrog: int = 256,
        adam_lr: float = 0.025,
        mass_adaptation: bool = True,
        mass_ema: float = 0.1,
        jitter_amount: float = 1.0,
        static_collection: bool = False,
        static_leapfrog: int | None = None,
    ):
        self.target = as_logp_fn(target)
        self.initial_positions = jnp.asarray(initial_positions)
        if not jnp.issubdtype(self.initial_positions.dtype, jnp.floating):
            self.initial_positions = self.initial_positions.astype(jnp.float32)
        self.dim = self.initial_positions.shape[1]
        self.target_accept_p = float(target_accept_p)
        self.step_size = step_size
        if trajectory_length <= 0.0:
            raise ValueError("trajectory_length must be positive")
        self.trajectory_length0 = float(trajectory_length)
        self.max_leapfrog = int(max_leapfrog)
        if self.max_leapfrog < 1:
            raise ValueError("max_leapfrog must be >= 1")
        self.adam_lr = float(adam_lr)
        self.mass_adaptation = bool(mass_adaptation)
        self.mass_ema = float(mass_ema)
        if not 0.0 < jitter_amount <= 1.0:
            raise ValueError("jitter_amount must be in (0, 1]")
        self.jitter_amount = float(jitter_amount)
        self.static_collection = bool(static_collection)
        if static_leapfrog is not None and int(static_leapfrog) < 1:
            raise ValueError("static_leapfrog must be >= 1")
        self.static_leapfrog = (
            None if static_leapfrog is None else int(static_leapfrog)
        )
        self._vg = jax.value_and_grad(self.target)
        self._vgrad = jax.vmap(self._vg)
        # Analytic-gradient override (as_grad_fn, distributions.rs:80-90
        # parity note): interior leapfrogs only need ∇logp — the log
        # density is consumed at trajectory ends — so a target that
        # provides one lets the integrators skip the per-step primal
        # reduce that reverse-mode value_and_grad always pays.
        _g = as_grad_fn(target)
        self._ggrad = None if _g is None else jax.vmap(_g)
        self._init_jit = None
        self._n_discard = 0
        super().__init__(n_chains=self.initial_positions.shape[0], seed=seed)

    # -- per-run preparation --------------------------------------------------
    def _prepare_run(self, n_collect: int, n_discard: int) -> None:
        # The warmup gate is the only run-length-derived state; bind it into
        # the cached step fn so lazily-traced BatchChain step fns can never
        # adopt a later run's schedule (the NUTS _Sched pattern).
        self._n_discard = n_discard
        cache = getattr(self, "_stepfn_cache", None)
        if cache is None:
            cache = self._stepfn_cache = {}
        key = (n_discard, id(self._extract_fn))
        if key not in cache:
            cache[key] = self._make_step_fn(
                step=lambda c, m, _nd=n_discard: self._step(c, m, _nd)
            )
        self._step_fn = cache[key]

    # -- carry ----------------------------------------------------------------
    def _init_carry(self):
        """Build the initial carry in ONE compiled program.

        Eagerly this is ~9 device dispatches (vgrad, fold-in vmap, the
        ε search, and a handful of constant fills); on the remote-TPU
        tunnel each eager dispatch pays round-trip latency, and the
        round-4 phase breakdown (scripts/exp_chees_phases.py) measured
        the eager init at ~95 ms of the 340 ms bench rep — ~30× the
        actual compute.  A single jitted program makes it one dispatch.
        """
        if self._init_jit is None:
            # Python-level config branches (step_size, x64) are baked at
            # trace time; the program is cached on the sampler instance.
            def build(x0, keys):
                dtype = x0.dtype
                n, d = x0.shape
                lp0, grad0 = self._vgrad(x0)
                lp0 = lp0.astype(dtype)
                grad0 = grad0.astype(dtype)
                if self.step_size is not None:
                    eps0 = jnp.asarray(self.step_size, dtype)
                else:
                    init_keys = jax.vmap(
                        lambda k: jax.random.fold_in(k, 2**31 - 1)
                    )(keys)

                    def find_eps(k, x):
                        mass = identity_mass(d, False, dtype)
                        mom = sample_momentum(k, mass, False)
                        return find_reasonable_epsilon(
                            self._vg, x, mom, mass, False
                        )

                    # one shared scalar ε: the cross-chain median of the
                    # per-chain searches is robust to stragglers in the
                    # initial batch
                    eps0 = jnp.median(jax.vmap(find_eps)(init_keys, x0)).astype(
                        dtype
                    )
                zero = jnp.zeros((), dtype)
                return dict(
                    pos=x0,
                    lp=lp0,
                    grad=grad0,
                    keys=keys,
                    eps=eps0,
                    eps_bar=eps0,
                    h_bar=zero,
                    mu=jnp.log(10.0 * eps0),
                    log_t=jnp.log(
                        jnp.asarray(self.trajectory_length0, dtype)
                    ),
                    adam_m=zero,
                    adam_v=zero,
                    # per-chain [n, d] like the NUTS MassMatrix: every row
                    # is identical (the metric is cross-chain), but the
                    # per-chain leading axis keeps the carry uniformly
                    # shardable over a chains mesh (parallel/mesh.py
                    # shards all 1-D leaves)
                    mass_inv=jnp.ones((n, d), dtype),
                    n_divergent=jnp.zeros((n,), jnp.int32),
                    n_leapfrog=jnp.zeros((n,), jnp.int64)
                    if jax.config.jax_enable_x64
                    else jnp.zeros((n,), jnp.int32),
                )

            self._init_jit = jax.jit(build)
        return self._init_jit(self.initial_positions, self._chain_keys)

    # -- shared proposal machinery -------------------------------------------
    def _propose(self, carry, m, integrate):
        """Momentum refresh + MH accept around a trajectory integrator.

        ``integrate(pos, mom, grad, lp, inv) -> (pos_p, mom_p, grad_p,
        lp_p)`` supplies the leapfrog loop (dynamic while_loop for the
        adaptive law; trace-time-unrolled for the static-collection law).
        Returns the accepted state dict plus the raw proposal pieces the
        adaptation branch consumes.  Non-finite trajectories are rejected
        via a -inf log-acceptance rather than sanitized here — the
        cross-chain-reduction sanitization lives in the (warmup-only)
        adaptation branch, keeping the steady-state step lean.  Assumption
        (shared with ops/static_tree.py): a non-finite proposal shows up in
        its log-density or kinetic energy; a target returning finite logp
        *and* finite gradient at a non-finite position could poison the
        carried gradient on accept.
        """
        pos, lp, grad = carry["pos"], carry["lp"], carry["grad"]
        dtype = pos.dtype
        inv = carry["mass_inv"]  # [n, d] diag of M⁻¹ = Σ̂ (rows identical)
        mom_std = 1.0 / jnp.sqrt(inv)

        k = jax.vmap(step_key, in_axes=(0, None))(carry["keys"], m)
        k_mom = jax.vmap(lambda kk: jax.random.fold_in(kk, 0))(k)
        k_u = jax.vmap(lambda kk: jax.random.fold_in(kk, 1))(k)
        z = jax.vmap(
            lambda kk, ref: jax.random.normal(kk, ref.shape, dtype)
        )(k_mom, pos)
        mom = mom_std * z
        ke0 = 0.5 * jnp.sum(inv * mom * mom, axis=1)

        pos_p, mom_p, grad_p, lp_p = integrate(pos, mom, grad, lp, inv)
        ke_p = 0.5 * jnp.sum(inv * mom_p * mom_p, axis=1)

        ok = (
            jnp.isfinite(lp_p)
            & jnp.all(jnp.isfinite(pos_p), axis=1)
            & jnp.all(jnp.isfinite(mom_p), axis=1)
        )
        raw = (lp_p - lp) + (ke0 - ke_p)
        log_accept = jnp.where(ok, raw, -jnp.inf)
        diverged = ~ok | (-raw > _DELTA_MAX)

        u_acc = jax.vmap(lambda kk: jax.random.uniform(kk, (), dtype))(k_u)
        accept = jnp.log(u_acc) < log_accept  # false wherever ~ok
        new = dict(
            pos=jnp.where(accept[:, None], pos_p, pos),
            lp=jnp.where(accept, lp_p, lp),
            grad=jnp.where(accept[:, None], grad_p, grad),
        )
        return new, (pos_p, mom_p, ok, log_accept), diverged

    # -- transition (adaptive law) ---------------------------------------------
    def _step(self, carry, m, n_discard: int | None = None):
        if n_discard is None:  # direct calls outside a prepared run
            n_discard = self._n_discard
        pos = carry["pos"]
        dtype = pos.dtype
        m1 = (m + 1).astype(dtype)
        warmup = m1 <= n_discard
        eps = carry["eps"]

        # jittered integration time and the shared scalar leapfrog count
        u = halton_base2(m).astype(dtype)
        t = (1.0 - self.jitter_amount * u) * jnp.exp(carry["log_t"])
        n_steps = jnp.clip(
            jnp.ceil(t / eps), 1, self.max_leapfrog
        ).astype(jnp.int32)
        t_eff = n_steps.astype(dtype) * eps  # the time actually integrated

        def integrate(pos, mom, grad, lp, inv):
            # Fused-kick leapfrog: the textbook half/half form repeats the
            # SAME gradient across step boundaries (the step-k closing
            # half-kick and the step-k+1 opening half-kick), which XLA
            # cannot merge across loop iterations.  Open with one
            # half-kick, use FULL kicks in a uniform body, and subtract
            # the surplus half-kick after the loop — one fewer [B, d]
            # multiply-add per leapfrog, and ``inv·eps`` hoisted saves
            # another multiply.  Identical real-arithmetic trajectory
            # (float rounding differs; the MH accept keeps the law exact).
            half = 0.5 * eps
            inv_eps = inv * eps

            # Measured, rejected (round 4): 4×-unrolling this dynamic loop
            # (main loop over n_steps//4 + three mask-selected tail
            # leapfrogs, trajectories identical) left the warmup phase wall
            # unchanged at ~515 µs/step — the gap to the static law's
            # 79 µs/step is adaptation/refresh work, not while_loop
            # scheduling, so the plain loop stays (no masked-tail waste).
            if self._ggrad is None:

                def lf_body(_, st):
                    p, q, g, _lp = st
                    p = p + q * inv_eps
                    lpn, g = self._vgrad(p)
                    # targets with f64 parameters promote under x64; the
                    # carry is dtype-stable in the positions' dtype
                    q = q + g.astype(dtype) * eps
                    return (p, q, g.astype(dtype), lpn.astype(dtype))

                p, q, g, lpn = jax.lax.fori_loop(
                    0, n_steps, lf_body, (pos, mom + grad * half, grad, lp)
                )
                return p, q - g * half, g, lpn

            # analytic-gradient interior (no per-step primal reduce); the
            # final leapfrog runs value_and_grad for the MH log density
            def lf_body_g(_, st):
                p, q, _g = st
                p = p + q * inv_eps
                g = self._ggrad(p).astype(dtype)
                return (p, q + g * eps, g)

            p, q, _g = jax.lax.fori_loop(
                0, n_steps - 1, lf_body_g, (pos, mom + grad * half, grad)
            )
            p = p + q * inv_eps
            lpn, g = self._vgrad(p)
            g = g.astype(dtype)
            return p, q + g * half, g, lpn.astype(dtype)

        new, (pos_p, mom_p, ok, log_accept), diverged = self._propose(
            carry, m, integrate
        )
        pos_new = new["pos"]

        def adapt():
            """Warmup-only cross-chain adaptation (ChEES/Adam on log T, dual
            averaging on ε, variance metric) — behind a scalar lax.cond so
            post-warmup steps skip its ~8 extra [B, d] passes."""
            inv = carry["mass_inv"]
            alpha = jnp.minimum(1.0, jnp.exp(log_accept))  # exp(-inf) = 0
            # sanitize before any cross-chain reduction: one NaN chain would
            # poison the batch means the adaptation feeds on
            pos_ps = jnp.where(ok[:, None], pos_p, pos)
            mom_ps = jnp.where(ok[:, None], mom_p, jnp.zeros_like(mom_p))

            # ChEES criterion E[(‖θ⁺−μ⁺‖² − ‖θ−μ‖²)²]/4 over proposals,
            # importance-weighted by acceptance probability; dθ⁺/dt = v⁺ =
            # M⁻¹p⁺ gives the analytic time derivative, dt/d(log T) = t.
            w = alpha / (jnp.mean(alpha) + 1e-20)
            c0 = pos - jnp.mean(pos, axis=0)
            cp = pos_ps - jnp.mean(pos_ps, axis=0)
            a_gap = jnp.sum(cp * cp, axis=1) - jnp.sum(c0 * c0, axis=1)
            da_dt = 2.0 * jnp.sum(cp * (inv * mom_ps), axis=1)
            chees = jnp.mean(w * a_gap * a_gap) * 0.25
            d_chees = jnp.mean(w * a_gap * da_dt) * 0.5 * t_eff
            # criterion-normalized gradient (scale-free lr, tfp.mcmc's
            # trick), clipped: with a near-zero criterion (barely-moving
            # early chains) the ratio can overflow f32 when squared for the
            # Adam second moment — inf/inf then latches log T at NaN
            # (observed on the hierarchical logistic target); Adam's
            # normalized update is ~lr regardless, so the clip only tames
            # transients.  The clip alone is NOT latch-proof: clip(NaN) is
            # NaN, and the criterion itself can go non-finite — a REJECTED
            # proposal with finite log-density but huge coordinates (the
            # NC logistic's quadratic prior keeps lp finite out to
            # |z| ~ 1e19) contributes w·a_gap² = 0·inf = NaN to the means,
            # and an accepted one gives chees = inf and g = inf/inf.  A
            # non-finite gradient estimate carries no usable signal, so
            # skip this step's T update instead of poisoning Adam forever.
            g_raw = d_chees / (chees + 1e-20)
            g_norm = jnp.where(
                jnp.isfinite(g_raw), jnp.clip(g_raw, -1e3, 1e3), 0.0
            )
            adam_m = _B1 * carry["adam_m"] + (1.0 - _B1) * g_norm
            adam_v = _B2 * carry["adam_v"] + (1.0 - _B2) * g_norm * g_norm
            m_hat = adam_m / (1.0 - _B1**m1)
            v_hat = adam_v / (1.0 - _B2**m1)
            log_t = carry["log_t"] + self.adam_lr * m_hat / (
                jnp.sqrt(v_hat) + _ADAM_EPS
            )
            # static clamp: keeps ⌈t/ε⌉ representable and recoverable even if
            # a pathological early gradient runs away before ε has adapted
            log_t = jnp.clip(log_t, -6.0, 12.0)

            # dual averaging on the shared ε (cross-chain mean acceptance)
            accept_stat = jnp.mean(alpha)
            eta = 1.0 / (m1 + _T0)
            h_bar = (1.0 - eta) * carry["h_bar"] + eta * (
                self.target_accept_p - accept_stat
            )
            # log-space clamp: a run of all-accepts early in warmup can push
            # the exponent past f32 overflow (eps = inf latches eps_bar at
            # inf through its own log — observed on the hierarchical
            # logistic target); ±16/+8 nats is far outside any useful ε
            log_eps_w = jnp.clip(
                carry["mu"] - jnp.sqrt(m1) / _GAMMA * h_bar, -16.0, 8.0
            )
            eps_w = jnp.exp(log_eps_w)
            eta2 = m1 ** (-_KAPPA)
            eps_bar = jnp.exp(
                (1.0 - eta2) * jnp.log(carry["eps_bar"]) + eta2 * log_eps_w
            )

            # diagonal metric from cross-chain variance (Stan M⁻¹ = Σ̂);
            # ≥10⁴ chains estimate marginal variances to ~1% in one batch
            if self.mass_adaptation:
                var = jnp.var(pos_new, axis=0)
                mass_inv = jnp.maximum(
                    (1.0 - self.mass_ema) * inv + self.mass_ema * var[None, :],
                    1e-8,
                )
            else:
                mass_inv = inv
            return eps_w, eps_bar, h_bar, log_t, adam_m, adam_v, mass_inv

        def frozen():
            return (
                carry["eps_bar"],
                carry["eps_bar"],
                carry["h_bar"],
                carry["log_t"],
                carry["adam_m"],
                carry["adam_v"],
                carry["mass_inv"],
            )

        eps_new, eps_bar, h_bar, log_t, adam_m, adam_v, mass_inv = jax.lax.cond(
            warmup, adapt, frozen
        )

        return dict(
            pos=new["pos"],
            lp=new["lp"],
            grad=new["grad"],
            keys=carry["keys"],
            eps=eps_new,
            eps_bar=eps_bar,
            h_bar=h_bar,
            mu=carry["mu"],
            log_t=log_t,
            adam_m=adam_m,
            adam_v=adam_v,
            mass_inv=mass_inv,
            n_divergent=carry["n_divergent"]
            + (diverged & ~warmup).astype(jnp.int32),
            n_leapfrog=carry["n_leapfrog"]
            + n_steps.astype(carry["n_leapfrog"].dtype),
        )

    # -- transition (static-collection law) -------------------------------------
    def _static_collect_step(self, n_leapfrog: int):
        """Frozen-adaptation collection step with a STATIC leapfrog count.

        The per-transition jitter moves from the step count to the step
        size: ``eps_m = t_m / L`` with the same Halton trajectory time
        ``t_m = (1 − j·u_m)·T`` — the ε-jitter Neal recommends (Handbook of
        MCMC 2011, §5.4.3.3).  Each transition is an exact MH kernel for
        the target at its (deterministic in ``m``) step size, so the
        composition preserves the stationary law; only the discretization
        of the jittered trajectory differs from the adaptive-phase law
        (L fixed / ε jittered vs ε fixed / L jittered).  The win: L is a
        trace-time constant, so the integration loop fully unrolls —
        measured on v5e, the dynamic while_loop's scheduling overhead is
        ~150 µs/transition (~37% of the steady-state step) at the bench
        shape (docs/BENCH_HISTORY.md round 4).
        """
        L = int(n_leapfrog)

        def step(carry, m):
            dtype = carry["pos"].dtype
            u = halton_base2(m).astype(dtype)
            t = (1.0 - self.jitter_amount * u) * jnp.exp(carry["log_t"])
            eps_m = t / L

            def integrate(pos, mom, grad, lp, inv):
                # Fused-kick form (see the adaptive integrator): one
                # opening half-kick, full kicks in the uniform body, and
                # a closing half-kick — saves a [B, d] multiply-add per
                # leapfrog and hoists ``inv·eps``.  With an analytic
                # gradient (as_grad_fn) the L−1 interior steps also skip
                # the log-density reduce; the final step runs
                # value_and_grad for the MH log density.
                half = 0.5 * eps_m
                inv_eps = inv * eps_m

                def one_g(st):
                    p, q, _g = st
                    p = p + q * inv_eps
                    g = self._ggrad(p).astype(dtype)
                    return (p, q + g * eps_m, g)

                def one(st):
                    p, q, g, _lp = st
                    p = p + q * inv_eps
                    lpn, g = self._vgrad(p)
                    q = q + g.astype(dtype) * eps_m
                    return (p, q, g.astype(dtype), lpn.astype(dtype))

                n_uniform = L if self._ggrad is None else L - 1
                body = one if self._ggrad is None else one_g
                st = (
                    (pos, mom + grad * half, grad, lp)
                    if self._ggrad is None
                    else (pos, mom + grad * half, grad)
                )
                if L <= 32:  # full trace-time unroll
                    for _ in range(n_uniform):
                        st = body(st)
                else:  # static trip count, 8x unrolled scan
                    st = jax.lax.scan(
                        lambda c, _: (body(c), None), st, None,
                        length=n_uniform, unroll=8,
                    )[0]
                if self._ggrad is None:
                    p, q, g, lpn = st
                    return p, q - g * half, g, lpn
                p, q, _g = st
                p = p + q * inv_eps
                lpn, g = self._vgrad(p)
                g = g.astype(dtype)
                return p, q + g * half, g, lpn.astype(dtype)

            new, _aux, diverged = self._propose(carry, m, integrate)
            out = dict(carry)
            out.update(new)
            out["eps"] = carry["eps_bar"]
            out["n_divergent"] = carry["n_divergent"] + diverged.astype(jnp.int32)
            out["n_leapfrog"] = carry["n_leapfrog"] + jnp.asarray(
                L, carry["n_leapfrog"].dtype
            )
            return out

        return step

    def _run_static(self, carry, n_collect: int, offset: int, thin: int = 1,
                    with_stats: bool = False):
        """Collection via the static-L law: derive L from the (frozen)
        adapted state on host — ``run_kernel`` already splits burn-in and
        collection into two dispatches, so the read-back costs one sync —
        then scan the unrolled step.  Compiled programs are cached per L.

        ``with_stats=True`` routes through :func:`~..core.run_kernel_stats`:
        the collection program additionally emits the per-split-chain
        diagnostic sufficient statistics (stashed on ``self._suffstats``
        for :func:`~..diagnostics.stats.combine_suffstats_host`), so
        benchmark harnesses need no standalone diagnostics compile (the
        round-4 tunnel-flake attack surface).  Samples and trajectories
        are identical either way."""
        from ..core import run_kernel, run_kernel_stats

        if self.static_leapfrog is not None:
            L = min(self.max_leapfrog, self.static_leapfrog)
        else:
            eps_bar = float(carry["eps_bar"])
            t_max = float(jnp.exp(carry["log_t"]))
            import math

            if not (math.isfinite(eps_bar) and math.isfinite(t_max)
                    and eps_bar > 0.0):
                raise RuntimeError(
                    f"ChEES warmup produced a non-finite adapted state "
                    f"(eps_bar={eps_bar}, T={t_max}) — the target likely "
                    "returned non-finite log-densities throughout warmup; "
                    "check the initial positions / target, or pass "
                    "static_leapfrog / step_size explicitly"
                )
            mean_t = t_max * (1.0 - 0.5 * self.jitter_amount)
            L = max(1, min(self.max_leapfrog, round(mean_t / eps_bar)))
        self._static_L = L  # observable (bench logging, tests)
        cache = getattr(self, "_static_stepfn_cache", None)
        if cache is None:
            cache = self._static_stepfn_cache = {}
        key = (L, id(self._extract_fn))
        if key not in cache:
            cache[key] = self._make_step_fn(step=self._static_collect_step(L))
        runner = run_kernel_stats if with_stats else run_kernel
        out = runner(cache[key], carry, n_collect, 0, step_offset=offset,
                     thin=thin)
        self._suffstats = out.suffstats if with_stats else None
        self._final_carry = out.carry
        self._steps_done = offset + n_collect * thin
        return out.samples

    def run(self, n_collect: int, n_discard: int = 0, thin: int = 1):
        if not self.static_collection:
            return super().run(n_collect, n_discard, thin=thin)
        from ..core import run_kernel

        self._prepare_run(n_collect, n_discard)
        carry = self._init_carry()
        offset = 0
        if n_discard > 0:
            out = run_kernel(self._step_fn, carry, 0, n_discard)
            carry = out.carry
            offset = n_discard
        samples = self._run_static(carry, n_collect, offset, thin=thin)
        return jnp.swapaxes(samples, 0, 1)

    def resume(self, path: str, n_collect: int):
        if not self.static_collection:
            return super().resume(path, n_collect)
        from ..utils.checkpoint import load_carry

        state = load_carry(path)
        carry, offset = state["carry"], int(state["steps"])
        self._prepare_run(n_collect, 0)
        samples = self._run_static(carry, n_collect, offset)
        return jnp.swapaxes(samples, 0, 1)

    def _positions(self, carry):
        return carry["pos"]

    # -- extras ----------------------------------------------------------------
    @property
    def divergences(self):
        """Per-chain post-warmup divergence counts from the last run."""
        return getattr(self, "_final_carry", {}).get("n_divergent")

    @property
    def adapted_step_size(self):
        return getattr(self, "_final_carry", {}).get("eps_bar")

    @property
    def adapted_trajectory_length(self):
        """Adapted maximum trajectory time T (jitter draws from (0, T))."""
        c = getattr(self, "_final_carry", {})
        return None if "log_t" not in c else jnp.exp(c["log_t"])

    @property
    def adapted_mass_inv(self):
        """Adapted diagonal M⁻¹ = Σ̂ ([d]; every chain shares the metric)."""
        m = getattr(self, "_final_carry", {}).get("mass_inv")
        return None if m is None else m[0]

    @property
    def leapfrog_count(self):
        """Per-chain total gradient evaluations from the last run."""
        return getattr(self, "_final_carry", {}).get("n_leapfrog")
