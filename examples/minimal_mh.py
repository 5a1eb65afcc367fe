"""Minimal Metropolis–Hastings example (examples/minimal_mh.rs).

4 parallel chains sampling a standard 2D Gaussian with an isotropic
random-walk proposal.
"""

import jax.numpy as jnp

from general_mcmc_tpu import Gaussian2D, IsotropicGaussian, MetropolisHastings, init_det


def main():
    target = Gaussian2D(
        mean=jnp.array([0.0, 0.0]), cov=jnp.array([[1.0, 0.0], [0.0, 1.0]])
    )
    proposal = IsotropicGaussian(1.0)

    mh = MetropolisHastings(target, proposal, init_det(4, 2))
    sample = mh.run(1000, 100)

    assert sample.shape == (4, 1000, 2)
    print(f"Collected sample with shape {sample.shape}")
    return sample


if __name__ == "__main__":
    main()
