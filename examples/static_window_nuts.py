"""The static-window NUTS backend — the benchmark's headline engine — on a
small ill-conditioned Gaussian.  ``backend="static"`` runs all
``2^max_tree_depth − 1`` leapfrogs up front and evaluates the tree logic
retrospectively (ops/static_tree.py); it produces the dynamic tree's exact
transition law and wins whenever trees are near-saturated at a small depth
cap (set ``max_tree_depth`` ≤ ~5; for deep caps use the ``"xla"`` tree —
or let the default ``backend="auto"`` measure the warmup and decide, see
examples/auto_backend_nuts.py).  Supports identity, diagonal and dense
mass matrices."""

import jax.numpy as jnp

from general_mcmc_tpu import NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed


def main():
    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), 16)).astype(jnp.float32)
    target = GaussianND(mean=jnp.zeros(16, jnp.float32), cov=scales)
    sampler = NUTS(
        target,
        init_with_seed(256, 16, 0),
        target_accept_p=0.9,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
        max_tree_depth=4,          # 15 leapfrogs per transition, always
        backend="static",
        seed=0,
    )
    sample, stats = sampler.run_progress(400, 200)
    print(f"Sample shape: {sample.shape}")
    print(stats)
    # The counter reports the schedule's actual constant work.
    print(f"leapfrogs/transition: "
          f"{int(sampler.leapfrog_count[0]) / 600:.0f}")
    assert sample.shape == (256, 400, 16)
    return sample


if __name__ == "__main__":
    main()
