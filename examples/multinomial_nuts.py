"""Stan's multinomial proposal vs the classic slice sampler (NUTS).

``proposal="multinomial"`` (a beyond-reference extension; the reference
implements only the slice sampler, generic_nuts.rs:764-768) weights every
trajectory leaf by ``exp(joint − joint₀)`` instead of thresholding against
a slice variable, so proposals land on low-density leaves less often —
same trajectories, same U-turn rule and adaptation, typically equal or
better ESS per gradient (measured +13% min-ESS/s on the 100-d benchmark;
docs/BENCH_HISTORY.md round 4).  Works on both backends and with diagonal
or dense mass.
"""

import jax.numpy as jnp

from general_mcmc_tpu import NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed
from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess


def run(proposal: str):
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), 16)).astype(jnp.float32)
    target = GaussianND(mean=jnp.zeros(16, jnp.float32), cov=scales)
    sampler = NUTS(
        target,
        init_with_seed(256, 16, 0),
        target_accept_p=0.9,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
        max_tree_depth=4,
        backend="static",
        proposal=proposal,
        seed=0,
    )
    sample = sampler.run(400, 200)
    rhat, ess = split_rhat_mean_ess(sample)
    return sample, float(jnp.max(rhat)), float(jnp.min(ess))


def main():
    results = {}
    for proposal in ("slice", "multinomial"):
        sample, rhat_max, min_ess = run(proposal)
        results[proposal] = (rhat_max, min_ess)
        print(f"{proposal:12s}: max R-hat {rhat_max:.4f}  min ESS {min_ess:.0f}")
        assert sample.shape == (256, 400, 16)
        assert rhat_max < 1.05
    # Both laws target the same posterior; the multinomial run is usually
    # the more ESS-efficient one (a statistical tendency, not a per-seed
    # guarantee — no assert on the ordering).
    return results


if __name__ == "__main__":
    main()
