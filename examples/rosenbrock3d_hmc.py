"""Batched HMC on the 3-D Rosenbrock density with a 3-D scatter plot and
wall-clock timing (examples/rosenbrock3d_hmc.rs)."""

import os

import numpy as np

from general_mcmc_tpu import HMC, RosenbrockND, init_det
from general_mcmc_tpu.utils import Timer

OUT_DIR = os.environ.get("EXAMPLE_OUT", "example_outputs")


def main(n_collect=1_000, burnin=100, n_chains=6, seed=42):
    sampler = HMC(
        RosenbrockND(), init_det(n_chains, 3), step_size=0.01, n_leapfrog=50
    ).set_seed(seed)
    timer = Timer()
    sample = sampler.run(n_collect, burnin)
    timer.log(f"HMC: {n_chains}×{n_collect} samples of 3-D Rosenbrock", block_on=sample)
    pooled = np.asarray(sample).reshape(-1, 3)

    os.makedirs(OUT_DIR, exist_ok=True)
    plot_path = os.path.join(OUT_DIR, "rosenbrock3d_hmc.png")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pooled[:, 0], pooled[:, 1], pooled[:, 2], s=3, alpha=0.3)
    ax.set_title("HMC samples from the 3-D Rosenbrock density")
    fig.savefig(plot_path, dpi=100)
    plt.close(fig)
    print(f"Wrote {plot_path}")
    return plot_path


if __name__ == "__main__":
    main()
