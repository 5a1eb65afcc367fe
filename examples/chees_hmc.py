"""ChEES-HMC: the accelerator-native alternative to NUTS.

The reference's answer to "how long should a trajectory be?" is NUTS's
per-chain tree building (nuts.rs, generic_nuts.rs).  ChEES-HMC (Hoffman,
Radul & Sountsov, AISTATS 2021 — a beyond-reference extension,
samplers/chees.py) answers it with *cross-chain* adaptation instead: every
iteration integrates all chains for the same Halton-jittered time, and the
maximum trajectory length T ascends the ChEES criterion by Adam while a
shared step size dual-averages on the batch acceptance rate and the
diagonal metric comes from cross-chain variance.  No per-chain control
flow — on TPU the step is pure batched leapfrogs, which is why it beats
the tree backends ~3x end-to-end on the headline benchmark (17.8M vs 5.97M
min-ESS/s on the 100-d ill-conditioned Gaussian at 10,240 chains;
docs/BENCH_HISTORY.md round 4).

This miniature compares ChEES-HMC against NUTS on that benchmark target
and prints the adapted quantities.  ``static_collection=True`` additionally
freezes the leapfrog count after warmup and jitters the step size instead
(Neal 2011 §5.4.3.3), letting XLA unroll the integration loop — the mode
the TPU benchmark runs.
"""

import jax.numpy as jnp

from general_mcmc_tpu import ChEESHMC, NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed
from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

DIM = 16
N_CHAINS = 256


def target():
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)
    return GaussianND(mean=jnp.zeros(DIM, jnp.float32), cov=scales), scales


def main():
    tgt, scales = target()

    chees = ChEESHMC(
        tgt,
        init_with_seed(N_CHAINS, DIM, 0),
        target_accept_p=0.9,
        jitter_amount=0.5,
        static_collection=True,
        seed=0,
    )
    sample = chees.run(400, 300)
    rhat, ess, _mean, std = split_rhat_mean_ess(sample, return_moments=True)
    assert sample.shape == (N_CHAINS, 400, DIM)
    assert float(jnp.max(rhat)) < 1.05
    assert float(jnp.max(jnp.abs(std / scales - 1.0))) < 0.2
    print(
        f"ChEES-HMC: max R-hat {float(jnp.max(rhat)):.4f}  "
        f"min ESS {float(jnp.min(ess)):.0f}  "
        f"adapted eps {float(chees.adapted_step_size):.3f}  "
        f"T {float(chees.adapted_trajectory_length):.2f}  "
        f"collection leapfrogs/step {chees._static_L}  "
        f"grads/draw {int(jnp.sum(chees.leapfrog_count)) / (N_CHAINS * 700):.2f}"
    )

    nuts = NUTS(
        tgt,
        init_with_seed(N_CHAINS, DIM, 0),
        target_accept_p=0.9,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
        max_tree_depth=4,
        backend="static",
        proposal="multinomial",
        seed=0,
    )
    nuts_sample = nuts.run(400, 300)
    nrhat, ness = split_rhat_mean_ess(nuts_sample)
    print(
        f"NUTS      : max R-hat {float(jnp.max(nrhat)):.4f}  "
        f"min ESS {float(jnp.min(ness)):.0f}  "
        f"grads/draw {int(jnp.sum(nuts.leapfrog_count)) / (N_CHAINS * 700):.2f}"
    )
    # Both sample the same posterior; ChEES typically spends 3-4x fewer
    # gradients per draw (no tree building, no rejected subtrees).
    return sample


if __name__ == "__main__":
    main()
