"""Discrete MH on a Poisson(λ) target with a frequency bar chart
(examples/poisson_mh.rs).

Uses the nonnegative random-walk proposal: from 0 always propose 1; from
x > 0 propose x±1 with probability ½ each — an asymmetric proposal whose
forward/backward densities enter the acceptance ratio.
"""

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import MetropolisHastings, Poisson

OUT_DIR = os.environ.get("EXAMPLE_OUT", "example_outputs")


@dataclasses.dataclass(frozen=True, eq=False)
class NonnegativeWalkProposal:
    """0 → 1 with certainty; x → x±1 with probability ½ (poisson_mh.rs:31-75)."""

    def sample(self, key, current):
        x = current[0]
        up = jax.random.bernoulli(key, 0.5)
        step = jnp.where(up, 1, -1).astype(current.dtype)
        proposed = jnp.where(x == 0, jnp.asarray(1, current.dtype), x + step)
        return proposed[None]

    def logp(self, from_, to):
        x, y = from_[0], to[0]
        ln_half = jnp.asarray(math.log(0.5), jnp.float32)
        from_zero = jnp.where(y == 1, 0.0, -jnp.inf)
        from_pos = jnp.where(jnp.abs(y - x) == 1, ln_half, -jnp.inf)
        return jnp.where(x == 0, from_zero, from_pos)


def main(n_collect=5_000, burnin=1_000, n_chains=4, lam=4.0, seed=42):
    target = Poisson(lam)
    inits = jnp.full((n_chains, 1), int(lam), jnp.int32)
    mh = MetropolisHastings(target, NonnegativeWalkProposal(), inits).seed(seed)
    sample = mh.run(n_collect, burnin)
    ks = np.asarray(sample).reshape(-1).astype(int)
    print(f"Poisson MH: {len(ks)} samples, mean={ks.mean():.3f} (λ={lam})")

    k_max = 15
    counts = np.bincount(ks, minlength=k_max + 1)[: k_max + 1]
    freqs = counts / len(ks)
    exact = np.array(
        [math.exp(-lam) * lam**k / math.factorial(k) for k in range(k_max + 1)]
    )

    os.makedirs(OUT_DIR, exist_ok=True)
    plot_path = os.path.join(OUT_DIR, "poisson_mh_bars.png")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    kk = np.arange(k_max + 1)
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.bar(kk - 0.2, freqs, width=0.4, label="MH frequency")
    ax.bar(kk + 0.2, exact, width=0.4, label="exact pmf")
    ax.set_xlabel("k")
    ax.legend()
    ax.set_title(f"Discrete MH on Poisson({lam:g})")
    fig.savefig(plot_path, dpi=100)
    plt.close(fig)
    print(f"Wrote {plot_path}")
    return plot_path


if __name__ == "__main__":
    main()
