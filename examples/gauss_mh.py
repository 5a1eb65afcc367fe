"""2D Gaussian MH demo with scatter plot and Parquet export
(examples/gauss_mh.rs)."""

import os

import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import Gaussian2D, IsotropicGaussian, MetropolisHastings, init_det
from general_mcmc_tpu.io import save_parquet

OUT_DIR = os.environ.get("EXAMPLE_OUT", "example_outputs")


def main(sample_size=5_000, burnin=1_000, n_chains=4, seed=42):
    target = Gaussian2D(
        mean=jnp.array([0.0, 0.0]), cov=jnp.array([[2.0, 1.0], [1.0, 2.0]])
    )
    proposal = IsotropicGaussian(2.0)
    mh = MetropolisHastings(target, proposal, init_det(n_chains, 2)).seed(seed)

    sample, stats = mh.run_progress(sample_size // n_chains, burnin)
    pooled = np.asarray(sample).reshape(sample_size, 2)
    print(f"Generated {len(pooled)} samples\n{stats}")
    print(f"Mean after burn-in: ({pooled[:, 0].mean():.2f}, {pooled[:, 1].mean():.2f})")

    os.makedirs(OUT_DIR, exist_ok=True)
    parquet_path = os.path.join(OUT_DIR, "gauss_mh.parquet")
    save_parquet(np.asarray(sample), parquet_path)

    plot_path = os.path.join(OUT_DIR, "gauss_mh_scatter.png")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(pooled[:, 0], pooled[:, 1], s=6, alpha=0.4, color="steelblue")
    ax.set_title("MH samples from a correlated 2D Gaussian")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    fig.savefig(plot_path, dpi=100)
    plt.close(fig)
    print(f"Wrote {parquet_path} and {plot_path}")
    return parquet_path, plot_path


if __name__ == "__main__":
    main()
