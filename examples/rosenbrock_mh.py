"""Random-walk MH on the 2-D Rosenbrock banana with a density-contour plot
(examples/rosenbrock_mh.rs)."""

import os

import numpy as np

from general_mcmc_tpu import IsotropicGaussian, MetropolisHastings, Rosenbrock2D, init_det

OUT_DIR = os.environ.get("EXAMPLE_OUT", "example_outputs")


def main(sample_size=8_000, burnin=2_000, n_chains=4, seed=42):
    target = Rosenbrock2D(a=1.0, b=100.0)
    proposal = IsotropicGaussian(0.5)
    mh = MetropolisHastings(target, proposal, init_det(n_chains, 2)).seed(seed)
    sample = mh.run(sample_size // n_chains, burnin)
    pooled = np.asarray(sample).reshape(-1, 2)
    print(f"Rosenbrock MH: {len(pooled)} samples, mean=({pooled[:,0].mean():.2f}, "
          f"{pooled[:,1].mean():.2f})")

    os.makedirs(OUT_DIR, exist_ok=True)
    plot_path = os.path.join(OUT_DIR, "rosenbrock_mh.png")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = np.linspace(-2.5, 2.5, 200)
    ys = np.linspace(-1.0, 5.0, 200)
    xx, yy = np.meshgrid(xs, ys)
    logp = -((1.0 - xx) ** 2 + 100.0 * (yy - xx**2) ** 2)
    fig, ax = plt.subplots(figsize=(7, 6))
    ax.contour(xx, yy, logp, levels=np.quantile(logp, [0.9, 0.97, 0.995, 0.9995]),
               colors="gray", linewidths=0.8)
    ax.scatter(pooled[:, 0], pooled[:, 1], s=4, alpha=0.3, color="crimson")
    ax.set_title("MH samples on the Rosenbrock banana")
    fig.savefig(plot_path, dpi=100)
    plt.close(fig)
    print(f"Wrote {plot_path}")
    return plot_path


if __name__ == "__main__":
    main()
