"""Minimal NUTS example (examples/minimal_nuts.rs): 4 chains on the 2-D
Rosenbrock density with dual-averaged step size, live progress."""

from general_mcmc_tpu import NUTS, Rosenbrock2D, init


def main():
    target = Rosenbrock2D(a=1.0, b=100.0)
    sampler = NUTS(target, init(4, 2), target_accept_p=0.95).set_seed(42)
    sample, stats = sampler.run_progress(400, 400)
    print(f"Sample shape: {sample.shape}")
    print(stats)
    assert sample.shape == (4, 400, 2)
    return sample


if __name__ == "__main__":
    main()
