"""ChEES (diagonal metric) vs NUTS (dense mass) on a strongly CORRELATED
Gaussian (VERDICT round 4 #5).

ChEES-HMC's cross-chain metric is diagonal-only (samplers/chees.py:493-499),
so uniform correlation — which no diagonal rescaling can remove — is its
structural blind spot; NUTS with dense Stan-window adaptation
(reference parity: generic_nuts.rs:177-304) learns the full covariance and
should win here.  This experiment measures both (plus NUTS-diagonal as the
like-metric control) on a 50-d Gaussian with uniform off-diagonal
correlation 0.9 (eigenvalues 45.1 and 0.1x49 -> condition number 451),
at 4096 chains, and prints min-ESS/s for each so chees.py's geometry
guidance can state the measured crossover instead of a conjecture.

Diagnostics ride inside the collection program (run_kernel_stats /
_run_static(with_stats=True)) -- same flake-proof pattern as bench.py.

Run on the real TPU: `python scripts/exp_correlated.py` (serialize with any
other TPU process).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from general_mcmc_tpu import (  # noqa: E402
    ChEESHMC,
    NUTS,
    NUTSMassMatrixConfig,
    init_with_seed,
)
from general_mcmc_tpu.core import run_kernel, run_kernel_stats  # noqa: E402
from general_mcmc_tpu.diagnostics.stats import combine_suffstats_host  # noqa: E402
from general_mcmc_tpu.models.distributions import GaussianND  # noqa: E402

B, D, RHO = 4096, 50, 0.9
WARMUP, COLLECT = 512, 512


def measure(name, make_sampler, runner, warmup=WARMUP):
    sampler = make_sampler()
    walls = []
    suffstats = None
    for rep in range(2):
        t0 = time.perf_counter()
        suffstats = runner(sampler, warmup)
        jax.block_until_ready(suffstats)
        walls.append(time.perf_counter() - t0)
        print(f"  {name} rep {rep}: {walls[-1]:.2f}s", file=sys.stderr)
    wall = min(walls)
    rhat, ess, mean, std = combine_suffstats_host(*suffstats)
    min_ess, max_rhat = float(np.min(ess)), float(np.max(rhat))
    leapfrogs = int(jnp.sum(sampler.leapfrog_count))
    gating = "" if max_rhat < 1.01 else "  ** FAILS R-hat gate **"
    extra = ""
    if getattr(sampler, "backend_selected", None) is not None:
        extra = f"  backend_selected={sampler.backend_selected}"
    # moment audit vs the analytic target (zero mean, unit marginal var):
    # cross-chain adaptation couples chains, which can bias split-R-hat
    # optimistic — the analytic moments are the independent gate
    audit = max(float(np.max(np.abs(mean))), float(np.max(np.abs(std - 1.0))))
    print(
        f"{name:22s} min-ESS/s {min_ess / wall:12,.0f}   min_ess {min_ess:10,.0f}"
        f"   max_rhat {max_rhat:.4f}   moment_audit {audit:.4f}"
        f"   wall {wall:.2f}s"
        f"   grad/s {leapfrogs / wall:.3g}{extra}{gating}"
    )
    return min_ess / wall


def chees_runner(s, warmup):
    s._prepare_run(COLLECT, warmup)
    out = run_kernel(s._step_fn, s._init_carry(), 0, warmup)
    s._run_static(out.carry, COLLECT, warmup, with_stats=True)
    return s._suffstats


def nuts_runner(s, warmup):
    s._prepare_run(COLLECT, warmup)
    out = run_kernel_stats(s._step_fn, s._init_carry(), COLLECT, warmup)
    s._final_carry = out.carry
    return out.suffstats


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cov = jnp.full((D, D), RHO) + (1.0 - RHO) * jnp.eye(D)
    target = GaussianND(jnp.zeros(D), cov)

    def chees():
        return ChEESHMC(
            target, init_with_seed(B, D, 0), target_accept_p=0.95,
            static_collection=True, seed=0,
        )

    def nuts(adaptation):
        return NUTS(
            target, init_with_seed(B, D, 0), target_accept_p=0.90,
            mass_config=NUTSMassMatrixConfig(adaptation=adaptation),
            max_tree_depth=7, seed=0, backend="xla",
            proposal="multinomial",
        )

    import os

    legs = os.environ.get("GMT_EXP_LEGS", "chees,dense,diag,dense-long")
    r = {}
    if "chees" in legs:
        r["chees-diag"] = measure("ChEES (diag metric)", chees, chees_runner)
    if "dense" in legs.replace("dense-long", ""):
        r["nuts-dense"] = measure(
            "NUTS (dense mass)", lambda: nuts("dense"), nuts_runner
        )
    if "diag" in legs:
        r["nuts-diag"] = measure(
            "NUTS (diag mass)", lambda: nuts("diagonal"), nuts_runner
        )
    # fairness leg: dense adaptation may simply need more warmup than the
    # shared 512 — give it 3x (still charged to its wall via min-ESS/s of
    # the collection, like the others: wall covers warmup + collection)
    if "dense-long" in legs:
        r["nuts-dense-long"] = measure(
            "NUTS (dense, 1536 wu)", lambda: nuts("dense"), nuts_runner,
            warmup=1536,
        )
    if "nuts-dense" in r and "chees-diag" in r:
        line = (
            f"dense/chees ratio: "
            f"{r['nuts-dense'] / max(r['chees-diag'], 1e-9):.2f}x"
        )
        if "nuts-dense-long" in r:
            line += (
                f"   dense-long/chees: "
                f"{r['nuts-dense-long'] / max(r['chees-diag'], 1e-9):.2f}x"
            )
        print(line)


if __name__ == "__main__":
    main()
