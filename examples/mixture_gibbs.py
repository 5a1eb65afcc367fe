"""Gibbs sampling of a two-component Gaussian mixture with a histogram plot
(examples/mixture_gibbs.rs).

State is [x, z]: x | z ~ N(μ_z, σ_z²); z | x from the posterior odds.
"""

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import GibbsSampler, init_det

OUT_DIR = os.environ.get("EXAMPLE_OUT", "example_outputs")


@dataclasses.dataclass(frozen=True, eq=False)
class MixtureConditional:
    mu0: float = -2.0
    sigma0: float = 1.0
    mu1: float = 3.0
    sigma1: float = 1.5
    pi0: float = 0.4

    def _pdf(self, x, mu, sigma):
        var = sigma * sigma
        return jnp.exp(-((x - mu) ** 2) / (2 * var)) / jnp.sqrt(2 * math.pi * var)

    def sample(self, key, i, state):
        if i == 0:
            z = state[1]
            eps = jax.random.normal(key, (), state.dtype)
            return jnp.where(
                z < 0.5, self.mu0 + self.sigma0 * eps, self.mu1 + self.sigma1 * eps
            )
        x = state[0]
        p0 = self.pi0 * self._pdf(x, self.mu0, self.sigma0)
        p1 = (1 - self.pi0) * self._pdf(x, self.mu1, self.sigma1)
        prob_z1 = jnp.where(p0 + p1 > 0, p1 / (p0 + p1), 0.5)
        return (jax.random.uniform(key, (), state.dtype) < prob_z1).astype(state.dtype)


def main(n_collect=20_000, burnin=2_000, n_chains=4, seed=42):
    cond = MixtureConditional()
    inits = jnp.concatenate([init_det(n_chains, 1), jnp.zeros((n_chains, 1))], axis=1)
    sampler = GibbsSampler(cond, inits).set_seed(seed)
    sample, stats = sampler.run_progress(n_collect, burnin)
    x = np.asarray(sample)[:, :, 0].ravel()
    print(f"Mixture Gibbs: {len(x)} samples, mean={x.mean():.3f}, var={x.var():.3f}")
    print(stats)

    os.makedirs(OUT_DIR, exist_ok=True)
    plot_path = os.path.join(OUT_DIR, "mixture_gibbs_hist.png")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    grid = np.linspace(-7, 9, 400)
    c = cond
    density = c.pi0 * np.exp(-((grid - c.mu0) ** 2) / (2 * c.sigma0**2)) / (
        c.sigma0 * math.sqrt(2 * math.pi)
    ) + (1 - c.pi0) * np.exp(-((grid - c.mu1) ** 2) / (2 * c.sigma1**2)) / (
        c.sigma1 * math.sqrt(2 * math.pi)
    )
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.hist(x, bins=80, density=True, alpha=0.6, color="steelblue", label="Gibbs")
    ax.plot(grid, density, "k-", lw=1.5, label="true density")
    ax.legend()
    ax.set_title("Gibbs sampling of a Gaussian mixture")
    fig.savefig(plot_path, dpi=100)
    plt.close(fig)
    print(f"Wrote {plot_path}")
    return plot_path


if __name__ == "__main__":
    main()
