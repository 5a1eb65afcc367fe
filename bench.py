#!/usr/bin/env python
"""Headline benchmark: 100-d ill-conditioned Gaussian, 10k chains.

The BASELINE.json north-star workload: min-ESS/sec (and leapfrog
grad-evals/sec) for an adaptive sampler with metric warmup on a 100-d
Gaussian whose marginal scales span 1..10, with >=10k vmapped chains on one
chip.  R-hat must be < 1.01 for the number to count.

Default sampler: ChEES-HMC (samplers/chees.py — cross-chain adaptive
trajectory lengths, static-collection mode), the TPU-native flagship: it
measures ~3.7x the static-NUTS champion on this workload because its step
is pure batched leapfrogs (no per-chain tree).  ``GMT_BENCH_SAMPLER=nuts``
reproduces the NUTS benchmark (the reference's algorithm family); the CPU
surrogate baseline always runs the reference's own algorithm (NUTS, its
only adaptive sampler), so vs_baseline is a framework-vs-framework
comparison at each side's best available sampler — the sampler is named in
the metric string, and docs/BENCH_HISTORY.md records the law-identical
NUTS-vs-NUTS ratios alongside.

The Rust reference publishes no numbers (BASELINE.md); its multi-threaded
CPU throughput is estimated at REF_MIN_ESS_PER_SEC below (16 threads x
~10k NUTS steps/sec/thread on a 100-d quadratic target x ~0.3 ESS/step,
rounded up to be conservative).  ``vs_baseline`` is measured/estimated.

Output contract: prints one JSON line {"metric", "value", "unit",
"vs_baseline"} per measurement, final measurement LAST — progressive
output, so a run killed by an external timeout still leaves the best
verified-so-far number on stdout.  All human-readable detail goes to
stderr.  Headline protocol (round 5): the emitted value is the MEDIAN of
up to 3 warm-rep walls (every rep's wall listed in the metric string), not
the best rep — the tunnel's ~4x run-to-run wall variance made best-of-N a
luck measurement.

Robustness (the round-1 driver run produced nothing, rc=124):
- the XLA compilation cache lives INSIDE the repo (committed after being
  warmed on the same machine/jaxlib), so a fresh driver invocation compiles
  warm instead of paying the 20-40 min cold remote compile;
- a wall-clock budget (GMT_BENCH_BUDGET_S) caps retries: the transient-
  tunnel retry is skipped when the first attempt already consumed the
  budget.
"""

import gc
import json
import os
import sys
import time

_REPO_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _REPO_CACHE)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# CPU smoke-testing: JAX_PLATFORMS env alone cannot override the axon
# sitecustomize (it force-selects via jax.config.update at interpreter
# start); this knob re-overrides the config so a tiny-config CPU run never
# touches the single-client TPU tunnel.
if os.environ.get("GMT_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GMT_BENCH_PLATFORM"])

# Workload constants; GMT_BENCH_* env overrides exist for experiments only
# (the driver's invocation uses the defaults).
# GMT_BENCH_WORKLOAD=logistic switches to the BASELINE.md stretch workload:
# hierarchical logistic regression (models/regression.py), where the
# vmapped likelihood X·β batches into a real MXU matmul.
WORKLOAD = os.environ.get("GMT_BENCH_WORKLOAD", "gauss")
# Sampler family: "chees" (default — ChEES-HMC, the TPU-native flagship;
# v5e round 4: 71.7M min-ESS/s at warmup 192 / accept 0.98 / jitter 0.5 /
# static L 10 with the steps-major store pin, vs the 5.97M static-NUTS
# champion) | "nuts" (the reference's algorithm; reproduces the round-3/4
# NUTS benchmark exactly).
SAMPLER = os.environ.get("GMT_BENCH_SAMPLER", "chees")
CHEES_ACCEPT = float(os.environ.get("GMT_BENCH_CHEES_ACCEPT", 0.98))
CHEES_JITTER = float(os.environ.get("GMT_BENCH_CHEES_JITTER", 0.5))
# Logistic-leg jitter (round-5 sweep, scripts/exp_logistic_sweep.py):
# full Halton jitter is the stable point on THIS geometry — min-ESS/s
# 2.34M/2.31M across seeds vs 1.66M/2.93M at jitter 0.5 (equal mean,
# ~1.75x seed spread), and delta=0.90 only passes the R-hat gate at
# full jitter.  The gauss headline keeps 0.5 (its own measured
# optimum, round-4 sweep).
LOGISTIC_JITTER = float(os.environ.get("GMT_BENCH_LOGISTIC_JITTER", 1.0))
# Explicit static-collection leapfrog count: the derived L (= mean adapted
# trajectory / eps) underestimates the adaptive law's round-up bias; the
# round-4 sweep peaked at accept 0.98 / L 10 (L 11 equal,
# L derived=8 at accept 0.98 and accept 0.95 variants 19-22M).  0 = derive.
CHEES_L = int(os.environ.get("GMT_BENCH_CHEES_L", 10))
N_CHAINS = int(os.environ.get("GMT_BENCH_CHAINS", 10_240))
DIM = int(os.environ.get("GMT_BENCH_DIM", 100))
N_OBS = int(os.environ.get("GMT_BENCH_OBS", 256))  # logistic only
# Collection 1024→3072 scales min-ESS linearly with no HBM cliff at the
# depth-4 stacks (output buffer 12.6 GB of 16 GB; round-1's cliff was with
# depth-8 stacks); warmup amortizes to 6%.
N_COLLECT = int(os.environ.get("GMT_BENCH_COLLECT", 3072))
# Warmup budget sweep (384/256/192/160, R-hat + min-ESS gated): 192 is the
# knee — the Stan windows still complete (windows end at 100/150 + forced
# 141, then the same 51-step step-size tail) and min-ESS even improves
# (10.4M vs 7.8M at 384); 160 degrades the final mass window (7.7M).
N_WARMUP = int(os.environ.get("GMT_BENCH_WARMUP", 192))
# Collection depth cap 4: min-ESS and R-hat identical to cap 8 on the
# headline target (collection trees self-terminate; ≤8k of 165M leapfrogs
# clipped) while the [max_depth, d] checkpoint stacks shrink 8→4 slots —
# 665k→1.14M min-ESS/s.  Cap 3 clips hard (min-ESS 7.8M→4.6M); see
# docs/BENCH_HISTORY.md round-2 sweep.
MAX_TREE_DEPTH = int(os.environ.get("GMT_BENCH_MAX_DEPTH", 4))
# NUTS backend: "static" (default: static-window schedule,
# ops/static_tree.py — same transition law as the dynamic tree,
# oracle-verified, 1.28x its end-to-end min-ESS/s at the cap-4 headline
# config; needs MAX_TREE_DEPTH <= 8) | "xla" (dynamic tree — use for
# deep caps).  The fused Pallas NUTS backend was retired round 4
# (docs/MOSAIC_RULES.md).
_WARMUP_DEPTH = int(os.environ.get("GMT_BENCH_WARMUP_DEPTH", 4))
BACKEND = os.environ.get(
    "GMT_BENCH_BACKEND",
    "static" if max(MAX_TREE_DEPTH, _WARMUP_DEPTH) <= 8 else "xla",
)
# Acceptance-target sweep (0.65…0.95, R-hat gated): broad optimum at
# 0.89–0.91 — under the depth-4 cap the leapfrog cost stays ~flat while
# ESS/chain/step climbs to 1.37 (antithetic NUTS draws); 0.65 halves ESS,
# 0.95 declines.  See docs/BENCH_HISTORY.md.
TARGET_ACCEPT = float(os.environ.get("GMT_BENCH_ACCEPT", 0.90))
# Proposal law: "multinomial" (default — Stan's modern weighted proposal,
# a beyond-reference extension measured at +13% headline min-ESS/s round 4,
# R-hat/moment gates identical; the proposal is labeled in the metric
# string) | "slice" (the reference's algorithm — the law the CPU surrogate
# runs; its headline numbers are recorded alongside in
# docs/BENCH_HISTORY.md for law-identical comparison).
PROPOSAL = os.environ.get("GMT_BENCH_PROPOSAL", "multinomial")
SEED = int(os.environ.get("GMT_BENCH_SEED", 0))  # experiments only
# Total wall-clock budget; measured attempts stop (and retries are skipped)
# once it is spent.  The driver's observed window is ~30 min — leave slack.
# Note: run_kernel dispatches burn-in and collection as TWO programs on
# TPU (core.py — the one-program form schedules the collection body ~15%
# slower), so a fully-cold first run pays two remote compiles; the first
# [incl. compile] JSON line is emitted as soon as they complete, and the
# tunnel compile wall has been observed from 28 s up to ~17 min for one
# program — the budget covers the typical case, not the worst pair.
BUDGET_S = float(os.environ.get("GMT_BENCH_BUDGET_S", 1500))
_T_START = time.perf_counter()

# Reference baseline for vs_baseline.  Preferred: a MEASURED CPU-surrogate
# number (scripts/measure_cpu_baseline.py runs this package's own NUTS tree
# kernel single-chain-per-process across all cores — a faithful stand-in for
# the Rust reference's Rayon chain parallelism, nuts.rs:699-729 — and writes
# docs/CPU_BASELINE.json).  Fallback: the round-1 back-of-envelope estimate
# (no Rust toolchain exists in this image, so the reference itself cannot be
# timed; BASELINE.md).
_EST_REF_MIN_ESS_PER_SEC = 5.0e4


def _load_baseline(workload: str = "gauss"):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "CPU_BASELINE.json")
    try:
        with open(path) as f:
            rec = json.load(f)
        if workload.startswith("logistic"):
            rec = rec["logistic"]
        return float(rec["min_ess_per_sec"]), (
            f"measured CPU surrogate {rec['min_ess_per_sec']:,.0f} ESS/s "
            f"(x{rec.get('n_workers', '?')} threads, scaling validated by "
            f"scaling_check; docs/CPU_BASELINE.json)"
        )
    except (OSError, KeyError, ValueError):
        return _EST_REF_MIN_ESS_PER_SEC, "estimate (unmeasured; BASELINE.md)"


REF_MIN_ESS_PER_SEC, REF_BASELINE_KIND = _load_baseline(WORKLOAD)
if SAMPLER == "chees":
    # honesty: the surrogate stands in for the reference, which implements
    # only NUTS — vs_baseline compares each framework's best sampler
    REF_BASELINE_KIND += " [surrogate runs the reference's NUTS]"


def _left() -> float:
    return BUDGET_S - (time.perf_counter() - _T_START)


def build_sampler():
    from general_mcmc_tpu import (
        ChEESHMC,
        NUTS,
        GaussianND,
        NUTSMassMatrixConfig,
        init_with_seed,
    )

    if WORKLOAD.startswith("logistic"):
        from general_mcmc_tpu.models.regression import (
            HierarchicalLogistic,
            HierarchicalLogisticNC,
            make_logistic_data,
        )

        p = DIM - 2  # θ = [μ, log τ, β₁..β_p] (or z₁..z_p non-centered)
        X, y, _ = make_logistic_data(jax.random.PRNGKey(1), N_OBS, p)
        cls = HierarchicalLogisticNC if WORKLOAD == "logistic_nc" else HierarchicalLogistic
        target = cls(X, y)
        assert target.dim == DIM
    else:
        scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(
            jnp.float32
        )
        target = GaussianND(mean=jnp.zeros(DIM, jnp.float32), cov=scales)
    if SAMPLER == "chees":
        return ChEESHMC(
            target,
            init_with_seed(N_CHAINS, DIM, SEED),
            target_accept_p=CHEES_ACCEPT,
            jitter_amount=CHEES_JITTER,
            static_collection=True,
            static_leapfrog=CHEES_L or None,
            seed=SEED,
        )
    return NUTS(
        target,
        init_with_seed(N_CHAINS, DIM, SEED),
        target_accept_p=TARGET_ACCEPT,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
        max_tree_depth=MAX_TREE_DEPTH,
        # Pre-adaptation trees hit the depth cap and every chain pays the
        # batch max under vmap; capping warmup depth bounds that waste
        # without touching sampling quality (min-ESS and R-hat identical
        # at caps 8/6/5/4 — see docs/BENCH_HISTORY.md).
        warmup_tree_depth=_WARMUP_DEPTH,
        seed=SEED,
        backend=BACKEND,
        proposal=PROPOSAL,
        # GMT_BENCH_CKPT_BF16=1: bf16 checkpoint stacks (U-turn sign tests
        # only; R-hat/min-ESS gated like every experiment knob)
        ckpt_dtype=jnp.bfloat16 if os.environ.get("GMT_BENCH_CKPT_BF16") == "1" else None,
    )


def _run_steps_major(sampler, n_collect, n_warmup=None):
    """Run without materializing the [chains, steps, dim] transpose: samples
    stay in the scan's [steps, chains, dim] layout and diagnostics consume
    it directly (halves peak HBM, enabling longer collection phases).  The
    ChEES static-collection split (warmup program → host read-back of the
    adapted scalars → unrolled collection program) mirrors ChEESHMC.run."""
    from general_mcmc_tpu.core import run_kernel

    n_warmup = N_WARMUP if n_warmup is None else n_warmup
    sampler._prepare_run(n_collect, n_warmup)
    if getattr(sampler, "static_collection", False):
        out = run_kernel(sampler._step_fn, sampler._init_carry(), 0, n_warmup)
        return sampler._run_static(out.carry, n_collect, n_warmup)
    out = run_kernel(sampler._step_fn, sampler._init_carry(), n_collect, n_warmup)
    sampler._final_carry = out.carry
    return out.samples


def _roofline(leapfrogs: int, wall: float) -> str:
    """Achieved-bandwidth estimate for the XLA tree (VERDICT round 1 #6).

    The NUTS hot loop is HBM-bound: at 10k-chain batches the while_loop
    carry cannot stay resident, so every leaf-pair iteration streams it
    in and out of HBM once.  Per chain the build_subtree carry holds 5
    [d] vectors (pos/mom/grad/prop_pos/prop_grad) + the checkpoint stack
    (2 x [max_depth, d] + [max_depth]); one iteration covers 2 leapfrogs.
    This is a *model* (XLA may keep fragments in VMEM or spill more), but
    it bounds how far the measured rate sits from the ~819 GB/s HBM peak
    of a v5e — i.e. whether further tuning can pay.
    """
    per_chain_floats = 5 * DIM + 2 * MAX_TREE_DEPTH * DIM + MAX_TREE_DEPTH
    bytes_per_leapfrog = per_chain_floats * 4 * 2 / 2  # r+w, 2 leapfrogs/iter
    achieved = leapfrogs * bytes_per_leapfrog / wall
    return (
        f"roofline: ~{achieved / 1e9:.0f} GB/s modeled carry traffic "
        f"({achieved / 819e9 * 100:.0f}% of v5e 819 GB/s HBM peak)"
    )


SAMPLER_DESC = (
    f"ChEES-HMC (static collection, accept {CHEES_ACCEPT}, jitter "
    f"{CHEES_JITTER})"
    if SAMPLER == "chees"
    else "NUTS"
)

_WL_DESC = (
    f"{DIM}-d hierarchical logistic"
    + (" (non-centered)" if WORKLOAD == "logistic_nc" else "")
    + f" (n_obs={N_OBS})"
    if WORKLOAD.startswith("logistic")
    else f"{DIM}-d ill-conditioned Gaussian"
) + (
    ", multinomial proposal"
    if SAMPLER == "nuts" and PROPOSAL == "multinomial"
    else ""
)


_EMITTED = False  # at least one verified JSON line has been printed
_LAST_HEADLINE = None  # last emitted headline-workload payload (re-print last)


def _emit(min_ess_per_sec, rhat_max, grad_evals_per_sec, n_collect, note="",
          wl_desc=None, ref=None, ref_kind=None, n_warmup=None,
          headline=True, sampler_desc=None):
    global _EMITTED, _LAST_HEADLINE
    ref = REF_MIN_ESS_PER_SEC if ref is None else ref
    payload = {
        "metric": f"min-ESS/sec, {sampler_desc or SAMPLER_DESC} "
        f"{wl_desc or _WL_DESC}, "
        f"{N_CHAINS} chains ({n_warmup or N_WARMUP} warmup + {n_collect} "
        f"collected), max R-hat {rhat_max:.4f}, "
        f"{grad_evals_per_sec:.3g} grad-evals/s"
        f", baseline: {ref_kind or REF_BASELINE_KIND}"
        # headline numbers are seed-sensitive: a non-default seed must be
        # visible in the artifact itself (ADVICE round 4)
        + (f", seed {SEED}" if SEED != 0 else "") + note,
        "value": round(min_ess_per_sec, 1),
        "unit": "ESS/s",
        "vs_baseline": round(min_ess_per_sec / ref, 2),
    }
    print(json.dumps(payload), flush=True)
    _EMITTED = True
    if headline:
        _LAST_HEADLINE = payload


# Largest sample the host-CPU diagnostics fallback will transfer.  The
# logistic stretch sample (1024 x 10240 x 50 f32 = 2.1 GB) qualifies; the
# 12.6 GB gauss headline sample does not (a one-core CPU FFT pass over 3M
# series would burn more budget than a fresh TPU attempt).
_CPU_DIAG_MAX_BYTES = int(os.environ.get("GMT_BENCH_CPU_DIAG_MAX", 4 << 30))


def _d2h_steps_chunked(sample, n_steps):
    """Pull the first ``n_steps`` of a steps-major resident sample to host
    numpy in ≤256 MiB major-axis slices with per-chunk retries.

    BENCH_r04 post-mortem (VERDICT r4 #1): a monolithic
    ``jax.device_put(sample, cpu)`` pulled the whole sample D2H in one
    shot through the same sick tunnel the compile retries just failed
    on — the fallback shared its failure domain.  Chunked major-axis
    (steps) slices survive transient faults and never relayout (steps is
    the major axis of the pinned (0,2,1) layout; minor-axis slicing is
    the round-3 relayout trap)."""
    import numpy as np

    per_step = sample.size // sample.shape[0] * sample.dtype.itemsize
    chunk = max(1, int((256 << 20) // per_step))
    parts = []
    for s in range(0, n_steps, chunk):
        blk = sample[s : min(s + chunk, n_steps)]
        for attempt in range(3):
            try:
                parts.append(np.asarray(blk))
                break
            except (jax.errors.JaxRuntimeError, RuntimeError, ValueError):
                if attempt == 2:
                    raise
                print(
                    f"chunk D2H failed at step {s} (attempt {attempt + 1}), "
                    "retrying",
                    file=sys.stderr,
                )
                time.sleep(10 * (attempt + 1))
    out = np.concatenate(parts, axis=0)
    del parts
    return out


def _diagnostics_with_retry(sample, tries=3):
    """split_rhat_mean_ess with retries: the remote tunnel's compile helper
    (a server-side subprocess shared across compiles) sometimes crashes with
    `HTTP 500: tpu_compile_helper subprocess exit code 1` when the
    diagnostics program compiles right after the big NUTS program — round-3
    rehearsals showed the SAME program compiling cleanly from a fresh
    helper.  A retry re-requests the compile from a respawned helper; the
    sample stays resident, so retries cost only the compile wall.

    The round-4 two-workload rehearsal showed the flake can be STICKY
    (`ValueError: INVALID_ARGUMENT: TPU backend error` three times, 20 s
    apart, for a program that ran cleanly standalone minutes earlier), so
    retries now clear the in-process executable cache and back off harder,
    and the final fallback computes the diagnostics on the host CPU backend
    when the sample is small enough to transfer — the numbers are identical
    (golden tests run this exact function on CPU) and only the diagnostics
    wall (not the measured sampling wall) is affected."""
    from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

    for attempt in range(tries):
        try:
            out = split_rhat_mean_ess(sample, steps_major=True, return_moments=True)
            jax.block_until_ready(out)
            return out
        # ValueError: the round-4 NUTS rehearsal hit the helper flake as
        # `ValueError: INVALID_ARGUMENT: TPU backend error` (the same
        # program compiled and executed cleanly in isolation right after),
        # which escaped the original RuntimeError-only net.
        except (jax.errors.JaxRuntimeError, RuntimeError, ValueError) as e:
            last_exc = e
            if attempt == tries - 1 or _left() < 180:
                break
            print(
                f"diagnostics compile/exec failed (attempt {attempt + 1}), "
                f"retrying: {str(e)[:500]}",
                file=sys.stderr,
            )
            # Drop the cached (possibly poisoned) executables so the retry
            # re-requests a fresh server-side compile, and give the remote
            # helper longer to respawn on each round.
            jax.clear_caches()
            time.sleep(20 * (attempt + 1))
    nbytes = sample.size * sample.dtype.itemsize
    if nbytes > _CPU_DIAG_MAX_BYTES:
        raise last_exc
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        raise last_exc
    print(
        f"diagnostics falling back to host CPU ({nbytes / 2**30:.1f} GiB "
        "chunked transfer); sampling walls are unaffected",
        file=sys.stderr,
    )
    t0 = time.perf_counter()
    host = _d2h_steps_chunked(sample, sample.shape[0])
    with jax.default_device(cpu):
        out = split_rhat_mean_ess(host, steps_major=True, return_moments=True)
        jax.block_until_ready(out)
    print(
        f"CPU diagnostics done in {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )
    return out


def _measure_and_emit(sampler, sample, wall, n_collect, note=""):
    leapfrogs = int(jnp.sum(sampler.leapfrog_count))
    rhat, ess, _mean, std = _diagnostics_with_retry(sample)
    rhat_max = float(jnp.max(rhat))
    min_ess = float(jnp.min(ess))
    if WORKLOAD == "gauss":
        # Moment audit: R-hat only certifies that chains agree with each
        # other; also check they agree with the analytic target (per-dim
        # std spans 1..10).  Catches a globally-wrong stationary
        # distribution that convergence diagnostics cannot see.  The pooled
        # std comes from the diagnostics' own sufficient statistics —
        # reducing the raw sample here compiled a 12 GiB param-major
        # relayout temp (the round-2/3 OOM signature, stage-probed).
        scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM))
        max_rel = float(jnp.max(jnp.abs(std / scales - 1.0)))
        print(f"moment audit: max |std/scale - 1| = {max_rel:.4f}", file=sys.stderr)
        if max_rel > 0.05:
            print(f"WARNING: marginal std off by {max_rel:.1%}", file=sys.stderr)
    min_ess_per_sec = min_ess / wall
    grad_evals_per_sec = leapfrogs / wall
    print(
        f"wall={wall:.2f}s min_ess={min_ess:.0f} max_rhat={rhat_max:.4f} "
        f"leapfrogs={leapfrogs} grad_evals/s={grad_evals_per_sec:.3g} "
        f"min_ess/s={min_ess_per_sec:.3g}",
        file=sys.stderr,
    )
    if WORKLOAD.startswith("logistic"):
        # Likelihood matmul FLOPs per chain-leapfrog: forward X·β
        # (2·n_obs·p) + backward Xᵀ·residual (2·n_obs·p).  This is the MXU
        # utilization figure VERDICT round 1 #9 asks for (f32 run, peak
        # quoted as the v5e bf16 197 TFLOP/s for a stable denominator).
        flops = leapfrogs * 4 * N_OBS * (DIM - 2)
        print(
            f"MXU: {flops / wall / 1e12:.3f} TFLOP/s "
            f"({flops / wall / 197e12 * 100:.2f}% of v5e bf16 peak)",
            file=sys.stderr,
        )
    elif SAMPLER == "chees":
        print(
            f"roofline: {grad_evals_per_sec / 1.21e9 * 100:.0f}% of the "
            "measured bare-leapfrog ceiling (1.21e9 grad-evals/s, round-3 "
            "roofline probe)",
            file=sys.stderr,
        )
    else:
        print(_roofline(leapfrogs, wall), file=sys.stderr)
    if rhat_max >= 1.01:
        print(f"WARNING: R-hat {rhat_max:.3f} >= 1.01", file=sys.stderr)
    _emit(min_ess_per_sec, rhat_max, grad_evals_per_sec, n_collect, note)
    return min_ess_per_sec


def _rank_gate(sample):
    """Second convergence gate (VERDICT r4 #7): rank-normalized bulk/tail
    diagnostics (Vehtari et al. 2021; diagnostics/stats.py grid path —
    memory-bounded, TPU-validated round 4) on the resident headline sample,
    printed to stderr next to the classic split-R-hat gate.  Non-fatal and
    budget-gated: the headline JSON line is already out, and the logistic
    stretch leg (the round-5 priority) still needs ~420 s of budget.

    Failure ladder (both round-5 rehearsals lost this line to the sticky
    compile-helper flake, so the gate now guarantees SOME rank line):
    3 on-device attempts with executable-cache clears + escalating
    backoff, then a host-CPU computation on a ≤2 GiB steps-prefix of the
    sample pulled over the proven chunked D2H path — no helper compile
    involved, so it cannot flake; the prefix is labeled in the output
    (R-hat over the first K steps is a valid, slightly weaker gate)."""
    if os.environ.get("GMT_BENCH_SKIP_RANK_GATE") == "1" or _left() < 900:
        print(
            f"rank-normalized gate skipped (budget left {_left():.0f}s)",
            file=sys.stderr,
        )
        return
    # Up to 3 attempts with a 20 s backoff: the gate is a second big
    # compile right after the headline program — exactly the sticky
    # compile-helper flake's attack surface (HTTP 500 / `TPU backend
    # error`; round-5 rehearsal hit it once, non-fatally).  The flake
    # often clears after a pause; each retry is budget-gated.
    for attempt in range(3):
        try:
            from general_mcmc_tpu.diagnostics.stats import rank_normalized_summary

            t0 = time.perf_counter()
            rs = rank_normalized_summary(sample, steps_major=True)
            jax.block_until_ready(rs)
            rhat = float(jnp.max(rs.rhat))
            bulk = float(jnp.min(rs.ess_bulk))
            tail = float(jnp.min(rs.ess_tail))
            print(
                f"rank-normalized gate: max R-hat {rhat:.4f}, min bulk-ESS "
                f"{bulk:.0f}, min tail-ESS {tail:.0f} "
                f"({time.perf_counter() - t0:.1f}s)",
                file=sys.stderr,
            )
            if rhat >= 1.01:
                print(
                    f"WARNING: rank-normalized R-hat {rhat:.3f} >= 1.01 — "
                    "disagrees with the classic split-R-hat gate",
                    file=sys.stderr,
                )
            return
        except (jax.errors.JaxRuntimeError, RuntimeError, ValueError) as e:
            print(
                f"rank-normalized gate attempt {attempt + 1} failed "
                f"(non-fatal): {type(e).__name__}: {str(e)[:500]}",
                file=sys.stderr,
            )
            if attempt == 2 or _left() < 750:
                break
            # same medicine as the diagnostics ladder: drop the (possibly
            # poisoned) cached executables so the retry re-requests a
            # fresh server-side compile, and give the helper longer to
            # respawn each round (the round-5 NUTS rehearsal showed 20 s
            # flat retries alone don't clear the sticky state)
            jax.clear_caches()
            time.sleep(20.0 * (attempt + 1))
    # 800 s: the measured fallback wall at the headline shape was 533 s
    # for a 2 GiB prefix (round-5 21:00 rehearsal), so the current ≤1 GiB
    # prefix costs ~270 s — the gate must never squeeze the logistic
    # leg's 420 s allowance, so it only runs when both comfortably fit
    # (the 22:40 rehearsal skipped at 941 s left under the old 1000 s
    # gate; 800 keeps logistic ≥ 500 s while letting the gate run).
    if _left() < 800:
        print(
            f"rank-normalized gate CPU fallback skipped (budget left "
            f"{_left():.0f}s)",
            file=sys.stderr,
        )
        return
    try:
        from general_mcmc_tpu.diagnostics.stats import rank_normalized_summary

        per_step = sample.size // sample.shape[0] * sample.dtype.itemsize
        n_steps = min(sample.shape[0], max(2, (1 << 30) // per_step))
        # split-R-hat needs an even step count
        n_steps -= n_steps % 2
        t0 = time.perf_counter()
        host = _d2h_steps_chunked(sample, n_steps)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            rs = rank_normalized_summary(host, steps_major=True)
            jax.block_until_ready(rs)
        rhat = float(jnp.max(rs.rhat))
        bulk = float(jnp.min(rs.ess_bulk))
        tail = float(jnp.min(rs.ess_tail))
        print(
            f"rank-normalized gate (host CPU, first {n_steps}/"
            f"{sample.shape[0]} steps): max R-hat {rhat:.4f}, min bulk-ESS "
            f"{bulk:.0f}, min tail-ESS {tail:.0f} "
            f"({time.perf_counter() - t0:.1f}s)",
            file=sys.stderr,
        )
        if rhat >= 1.01:
            print(
                f"WARNING: rank-normalized R-hat {rhat:.3f} >= 1.01 — "
                "disagrees with the classic split-R-hat gate",
                file=sys.stderr,
            )
    except (jax.errors.JaxRuntimeError, RuntimeError, ValueError) as e:
        print(
            f"rank-normalized gate CPU fallback failed (non-fatal): "
            f"{type(e).__name__}: {str(e)[:500]}",
            file=sys.stderr,
        )


def _attach_with_watchdog():
    """First device contact, guarded: the tunnel can wedge SERVER-side
    (round-4, 2026-08-18: ``jax.devices()`` blocked >20 min inside the
    PJRT claim loop, across fresh processes, for over an hour).  A hung
    attach would otherwise burn the driver's whole observation window
    with zero output; the watchdog turns it into a fast, diagnosable
    failure.  The blocked PJRT call cannot be interrupted in-process, so
    the watchdog hard-exits (no JSON is lost — nothing was measured)."""
    import threading

    deadline = float(os.environ.get("GMT_BENCH_ATTACH_TIMEOUT_S", 600))
    attached = threading.Event()

    def _bail():
        if attached.wait(timeout=deadline):
            return
        print(
            f"FATAL: TPU attach exceeded {deadline:.0f}s — the tunnel is "
            "wedged server-side (PJRT claim loop; see CLAUDE.md).  No "
            "measurement is possible from this client; retry later.",
            file=sys.stderr,
        )
        sys.stderr.flush()
        os._exit(3)

    threading.Thread(target=_bail, daemon=True).start()
    try:
        # A RAISED error (e.g. transient UNAVAILABLE) is not a hang: the
        # ladder's retry handles it — the finally disarms the watchdog so
        # a stale thread can never hard-exit a later, healthy attempt.
        return jax.devices()
    finally:
        attached.set()


def main(n_collect):
    print(f"devices: {_attach_with_watchdog()}", file=sys.stderr)
    sampler = build_sampler()

    t0 = time.perf_counter()
    sample = _run_steps_major(sampler, n_collect)
    jax.block_until_ready(sample)
    t_first = time.perf_counter() - t0
    print(
        f"first run (compile + exec): {t_first:.2f}s  budget left: {_left():.0f}s",
        file=sys.stderr,
    )

    # Emit a first (conservative: wall includes any compile) verified line
    # immediately, so even a budget-killed process leaves a real number.
    _measure_and_emit(sampler, sample, t_first, n_collect, note=" [incl. compile]")

    # Timed reruns with a warm jit cache.  Protocol (VERDICT r4 #2): the
    # tunnel shows ~4x run-to-run wall variance on a ~0.3 s measurement, so
    # the emitted value is the MEDIAN of up to 3 warm reps (upper median
    # when only 2 fit the budget — conservative), with every rep's wall
    # recorded in the metric string; best-of-N luck can no longer set the
    # headline.  Reps are bit-identical trajectories (position-indexed RNG,
    # fixed seed), so only the wall varies.
    walls = []
    for _ in range(3):
        # A warm rep costs exec only (~1 s at the default config), not the
        # compile-dominated t_first; a fixed allowance keeps reps running
        # after a long cold compile (the round-2 collect-sweep run burned
        # 717 s compiling and then skipped its reps under the old
        # 2×t_first rule).
        if _left() < 180:
            print("budget low: skipping further timed reps", file=sys.stderr)
            break
        sample.delete()
        del sample
        t0 = time.perf_counter()
        sample = _run_steps_major(sampler, n_collect)
        jax.block_until_ready(sample)
        walls.append(time.perf_counter() - t0)
        print(f"warm rep {len(walls)}: {walls[-1]:.3f}s", file=sys.stderr)

    if walls:
        wall = sorted(walls)[len(walls) // 2]
        note = (
            f" [median of {len(walls)} warm reps: "
            + ", ".join(f"{w:.3f}s" for w in sorted(walls))
            + "]"
        )
        _measure_and_emit(sampler, sample, wall, n_collect, note=note)
    _rank_gate(sample)


def logistic_extra():
    """Second, non-Gaussian perf line in the default bench output (VERDICT
    r3 #2): the BASELINE.md stretch workload — 50-d non-centered
    hierarchical logistic regression (n_obs=256) — with its own measured
    CPU surrogate (docs/CPU_BASELINE.json \"logistic\").  Default sampler:
    ChEES-HMC (256 warmup, δ=0.95, jitter 1.0 — round-5 swept; the round-4
    hardware champion: 3.16M min-ESS/s, R-hat 1.0019, 10.8× the NUTS
    stretch line once the criterion NaN latch was fixed);
    GMT_BENCH_LOGISTIC_SAMPLER=nuts reproduces the NUTS line (depth cap
    5, δ=0.90, the round-2 champion config).  Runs after the headline
    only when budget remains; the caller re-prints the Gaussian headline
    afterwards so the driver-parsed LAST line never changes meaning.

    Flake-proof diagnostics (VERDICT r4 #1): this leg's metric line was
    eaten twice (one rehearsal + BENCH_r04) by the sticky tunnel-helper
    flake on the STANDALONE diagnostics compile — and the monolithic-D2H
    CPU fallback died with it.  The per-chain sufficient statistics now
    ride INSIDE the collection program (core.run_kernel_stats /
    ChEESHMC._run_static(with_stats=True)): one compile, one execution,
    then a KB-scale host transfer + pure-numpy combine.  The measured wall
    therefore includes the in-program statistics pass (labeled in the
    metric string) — conservative, and worth the line always existing."""
    from general_mcmc_tpu import (
        ChEESHMC,
        NUTS,
        NUTSMassMatrixConfig,
        init_with_seed,
    )
    from general_mcmc_tpu.core import run_kernel, run_kernel_stats
    from general_mcmc_tpu.diagnostics.stats import combine_suffstats_host
    from general_mcmc_tpu.models.regression import (
        HierarchicalLogisticNC,
        make_logistic_data,
    )

    ref, ref_kind = _load_baseline("logistic")
    dim, n_obs = 50, 256
    family = os.environ.get("GMT_BENCH_LOGISTIC_SAMPLER", "chees")
    if family == "chees":
        # honesty: the surrogate implements only NUTS (the reference's one
        # adaptive sampler) — same framework-vs-framework caveat as the
        # gauss headline
        ref_kind += " [surrogate runs the reference's NUTS]"
    cap = int(os.environ.get("GMT_BENCH_LOGISTIC_DEPTH", 5))
    # ChEES warmup 256 = the measured knee (scripts/exp_logistic_warmup.py,
    # round 5): min-ESS is warmup-invariant from 256 up at jitter 1.0
    # (adaptation converged), so the old 768 was pure wall; 192
    # under-adapts (min-ESS drops ~25% and the seed spread returns).
    warmup = int(os.environ.get(
        "GMT_BENCH_LOGISTIC_WARMUP", 256 if family == "chees" else 384
    ))
    collect = int(os.environ.get("GMT_BENCH_LOGISTIC_COLLECT", 1024))
    backend = os.environ.get("GMT_BENCH_LOGISTIC_BACKEND", "static")
    X, y, _ = make_logistic_data(jax.random.PRNGKey(1), n_obs, dim - 2)
    target = HierarchicalLogisticNC(X, y)
    if family == "chees":
        sampler = ChEESHMC(
            target,
            init_with_seed(N_CHAINS, dim, SEED),
            target_accept_p=0.95,
            jitter_amount=LOGISTIC_JITTER,
            static_collection=True,
            seed=SEED,
        )
        desc = (
            f"{dim}-d hierarchical logistic (non-centered) "
            f"(n_obs={n_obs}) [stretch workload]"
        )
        sampler_desc = (
            f"ChEES-HMC (static collection, accept 0.95, jitter "
            f"{LOGISTIC_JITTER})"
        )
    else:
        sampler = NUTS(
            target,
            init_with_seed(N_CHAINS, dim, SEED),
            target_accept_p=0.90,
            mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
            max_tree_depth=cap,
            seed=SEED,
            backend=backend,
            proposal=PROPOSAL,
        )
        desc = (
            f"{dim}-d hierarchical logistic (non-centered) (n_obs={n_obs}, "
            f"cap {cap}, backend {backend})"
            + (", multinomial proposal" if PROPOSAL == "multinomial" else "")
            + " [stretch workload]"
        )
        sampler_desc = "NUTS"
    sampler._prepare_run(collect, warmup)
    walls, sample, suffstats = [], None, None
    for rep in range(2):
        t0 = time.perf_counter()
        if family == "chees":
            out = run_kernel(sampler._step_fn, sampler._init_carry(), 0, warmup)
            sample_arr = sampler._run_static(
                out.carry, collect, warmup, with_stats=True
            )
            suffstats = sampler._suffstats
        else:
            out = run_kernel_stats(
                sampler._step_fn, sampler._init_carry(), collect, warmup
            )
            sampler._final_carry = out.carry
            sample_arr = out.samples
            suffstats = out.suffstats
        jax.block_until_ready((sample_arr, suffstats))
        walls.append(time.perf_counter() - t0)
        if sample is not None:
            sample.delete()
        sample = sample_arr
        print(f"logistic rep {rep}: {walls[-1]:.2f}s  budget left: {_left():.0f}s",
              file=sys.stderr)
        if rep == 0 and _left() < 150:
            break
        if rep == 0:
            sample.delete()
            sample = None
    wall = min(walls)
    leapfrogs = int(jnp.sum(sampler.leapfrog_count))
    # KB-scale D2H + pure-numpy combine: zero further device compiles (the
    # round-4 flake's entire attack surface is gone from this leg).
    rhat_a, ess_a, _m, _s = combine_suffstats_host(*suffstats)
    rhat_max = float(rhat_a.max())
    min_ess = float(ess_a.min())
    flops = leapfrogs * 4 * n_obs * (dim - 2)
    print(
        f"logistic: wall={wall:.2f}s min_ess={min_ess:.0f} "
        f"max_rhat={rhat_max:.4f} leapfrogs={leapfrogs} "
        f"grad_evals/s={leapfrogs / wall:.3g} "
        f"MXU {flops / wall / 1e12:.3f} TFLOP/s",
        file=sys.stderr,
    )
    if rhat_max >= 1.01:
        print(f"WARNING: logistic R-hat {rhat_max:.3f} >= 1.01", file=sys.stderr)
    _emit(
        min_ess / wall, rhat_max, leapfrogs / wall, collect,
        note=(" [incl. compile]" if len(walls) == 1 else "")
        + " [wall incl. in-program diagnostics]",
        wl_desc=desc, ref=ref, ref_kind=ref_kind, n_warmup=warmup,
        headline=False,
        # never inherit the global sampler label — this leg builds its own
        sampler_desc=sampler_desc,
    )


def _free_device_memory():
    """Release every live device buffer + compiled-executable reference so a
    fallback/retry attempt starts from an empty HBM.  The round-2 driver
    failure mode (VERDICT #1): re-entering main() from inside the ``except``
    block kept the dead attempt's ~11.7 GiB of buffers pinned via the
    exception traceback — deleting live arrays directly works even when
    Python references survive."""
    gc.collect()  # drop traceback-pinned frames first
    for a in jax.live_arrays():
        try:
            a.delete()
        except Exception:
            pass
    jax.clear_caches()
    gc.collect()


def _is_oom(msg: str) -> bool:
    return "RESOURCE_EXHAUSTED" in msg or "Ran out of memory" in msg


if __name__ == "__main__":
    # Attempt ladder (VERDICT round-2 #1): on RESOURCE_EXHAUSTED, free all
    # device memory and fall back to a smaller collection phase — the 2048
    # config measured 2.15M min-ESS/s in round 2, so even the fallback beats
    # the baseline by orders of magnitude.  On a transient tunnel fault
    # (UNAVAILABLE, single-client collisions), retry the same config once.
    # Every successful attempt emits its own JSON line; the LAST line is the
    # final measurement.
    ladder = [n for n in (N_COLLECT, 2048, 1024, 512) if n <= N_COLLECT]
    ladder = sorted(set(ladder), reverse=True)
    transient_retries = 1
    idx = 0
    while idx < len(ladder):
        failure = None  # (kind, message)
        try:
            main(ladder[idx])
            break
        except (jax.errors.JaxRuntimeError, RuntimeError, MemoryError,
                ValueError) as e:
            msg = f"{type(e).__name__}: {e}"
            # ValueError is only retry-worthy when it is the tunnel helper
            # flake (`ValueError: INVALID_ARGUMENT: TPU backend error`,
            # round 4); genuine programming errors must still fail fast.
            if isinstance(e, ValueError) and not (
                isinstance(e, jax.errors.JaxRuntimeError)
                or "TPU backend error" in msg
            ):
                raise
            # MemoryError (host OOM) steps down the ladder too: a same-size
            # retry would just OOM again and burn the transient budget.
            oom = _is_oom(msg) or isinstance(e, MemoryError)
            failure = ("oom" if oom else "transient", msg)
            del e  # drop the traceback reference before freeing buffers
        # Handled outside the except block so the dead attempt's frames are
        # collectable before the next attempt allocates.
        kind, msg = failure
        print(f"attempt failed ({kind}): {msg[:2000]}", file=sys.stderr)
        _free_device_memory()
        if kind == "oom":
            idx += 1
            if idx >= len(ladder):
                print("OOM at the smallest config, giving up", file=sys.stderr)
                sys.exit(0 if _EMITTED else 1)
            if _left() < 240:
                print("budget too low for an OOM fallback attempt", file=sys.stderr)
                sys.exit(0 if _EMITTED else 1)
            print(f"falling back to n_collect={ladder[idx]}", file=sys.stderr)
        else:
            if transient_retries <= 0 or _left() < 120:
                print("transient failure, no retry budget left", file=sys.stderr)
                sys.exit(0 if _EMITTED else 1)
            transient_retries -= 1
            print("transient TPU error, retrying once after 30s", file=sys.stderr)
            time.sleep(30)

    # Stretch-workload line (VERDICT r3 #2), budget permitting.  Emitted
    # BETWEEN headline prints: if the process dies during the logistic
    # compile the last stdout line is still the Gaussian headline, and on
    # any path after the logistic line is printed the headline is re-printed
    # LAST (the driver parses the final line).
    if (
        WORKLOAD == "gauss"
        and os.environ.get("GMT_BENCH_SKIP_LOGISTIC") != "1"
        and _LAST_HEADLINE is not None
        and _left() > 420
    ):
        try:
            _free_device_memory()
            logistic_extra()
        except (jax.errors.JaxRuntimeError, RuntimeError, MemoryError,
                ValueError) as e:
            print(
                f"logistic extra failed (non-fatal): {type(e).__name__}: "
                f"{str(e)[:1000]}",
                file=sys.stderr,
            )
        finally:
            if _LAST_HEADLINE is not None:
                print(json.dumps(_LAST_HEADLINE), flush=True)
