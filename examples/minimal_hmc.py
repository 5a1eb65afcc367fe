"""Minimal HMC example (examples/minimal_hmc.rs): batched HMC on the 3-D
Rosenbrock density."""

from general_mcmc_tpu import HMC, RosenbrockND, init_det


def main():
    sampler = HMC(RosenbrockND(), init_det(4, 3), step_size=0.032, n_leapfrog=10)
    sample = sampler.run(400, 50)
    print(f"Collected sample with shape: {sample.shape}")
    assert sample.shape == (4, 400, 3)
    return sample


if __name__ == "__main__":
    main()
