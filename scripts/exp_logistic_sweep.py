"""ChEES accept-target / jitter sweep on the logistic stretch workload.

Round-5 MXU/Pallas analysis concluded the logistic gradient runs at its
HBM-bound speed-of-light (docs/BENCH_HISTORY.md round 5), so remaining
gains must come from the sampler law: fewer gradient evaluations per
effective sample.  The bench leg's config (δ=0.95, jitter 0.5) was
inherited from the gauss sweep, never swept on THIS geometry — this
experiment measures min-ESS/s over (δ, jitter) at the exact bench shape
(10,240 chains × 50-d NC hierarchical logistic, n_obs=256, 768+1024)
with the same in-program sufficient statistics the bench uses.

Interpretation caveat (BENCH_HISTORY "Current claim"): the logistic
min-ESS itself spreads ~1.75x run-to-run via the adaptive warmup's
realized state, so the winner must be confirmed on a second seed before
the bench config changes.

Run on the real TPU: `python scripts/exp_logistic_sweep.py`
(serialize with any other TPU process).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from general_mcmc_tpu import ChEESHMC, init_with_seed  # noqa: E402
from general_mcmc_tpu.core import run_kernel  # noqa: E402
from general_mcmc_tpu.diagnostics.stats import combine_suffstats_host  # noqa: E402
from general_mcmc_tpu.models.regression import (  # noqa: E402
    HierarchicalLogisticNC,
    make_logistic_data,
)

B, DIM, N_OBS = 10_240, 50, 256
WARMUP, COLLECT = 768, 1024


def measure(delta, jitter, seed):
    X, y, _ = make_logistic_data(jax.random.PRNGKey(1), N_OBS, DIM - 2)
    target = HierarchicalLogisticNC(X, y)
    s = ChEESHMC(
        target,
        init_with_seed(B, DIM, seed),
        target_accept_p=delta,
        jitter_amount=jitter,
        static_collection=True,
        seed=seed,
    )
    walls = []
    for rep in range(2):
        t0 = time.perf_counter()
        s._prepare_run(COLLECT, WARMUP)
        out = run_kernel(s._step_fn, s._init_carry(), 0, WARMUP)
        s._run_static(out.carry, COLLECT, WARMUP, with_stats=True)
        jax.block_until_ready(s._suffstats)
        walls.append(time.perf_counter() - t0)
        print(f"  rep {rep}: {walls[-1]:.2f}s", file=sys.stderr)
    wall = min(walls)
    rhat, ess, _mean, _std = combine_suffstats_host(*s._suffstats)
    min_ess, max_rhat = float(np.min(ess)), float(np.max(rhat))
    leapfrogs = int(jnp.sum(s.leapfrog_count))
    gate = "" if max_rhat < 1.01 else "  ** FAILS R-hat gate **"
    print(
        f"delta={delta:.2f} jitter={jitter:.1f} seed={seed}: "
        f"min-ESS/s {min_ess / wall:12,.0f}   min_ess {min_ess:10,.0f}   "
        f"max_rhat {max_rhat:.4f}   wall {wall:.2f}s   "
        f"grads {leapfrogs:.3g}   L {float(jnp.mean(s.adapted_trajectory_length) / jnp.mean(s.adapted_step_size)):.1f}{gate}",
        flush=True,
    )
    return min_ess / wall if max_rhat < 1.01 else 0.0


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    grid = [(d, j) for d in (0.90, 0.95, 0.98) for j in (0.5, 1.0)]
    results = {}
    for delta, jitter in grid:
        results[(delta, jitter)] = measure(delta, jitter, seed=0)
    best = max(results, key=results.get)
    print(f"\nbest on seed 0: delta={best[0]} jitter={best[1]} "
          f"({results[best]:,.0f} min-ESS/s); confirming on seed 1 vs the "
          f"incumbent (0.95, 0.5)", flush=True)
    measure(best[0], best[1], seed=1)
    if best != (0.95, 0.5):
        measure(0.95, 0.5, seed=1)


if __name__ == "__main__":
    main()
