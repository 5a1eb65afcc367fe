"""Neal's funnel under NUTS: divergence diagnostics in action.

The funnel's neck defeats fixed-step integrators; NUTS flags those
trajectories as divergences (the Δ > 1000 check, generic_nuts.rs:1199).
This example contrasts a coarse fixed step (many divergences — results
untrustworthy near the neck) with dual-averaged adaptation (few).
"""

import os

import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import NUTS, NealsFunnel, init_with_seed

OUT_DIR = os.environ.get("EXAMPLE_OUT", "example_outputs")


def main(n_chains=64, dim=8, n_collect=400, n_warmup=400, seed=0):
    funnel = NealsFunnel(dim=dim)
    inits = 0.5 * init_with_seed(n_chains, dim, seed)

    coarse = NUTS(funnel, inits, step_size=1.0, max_tree_depth=8, seed=seed)
    s_coarse = coarse.run(n_collect, 0)
    div_coarse = int(jnp.sum(coarse.divergences))

    adapted = NUTS(funnel, inits, target_accept_p=0.9, max_tree_depth=8, seed=seed)
    s_adapted = adapted.run(n_collect, n_warmup)
    div_adapted = int(jnp.sum(adapted.divergences))

    total = n_chains * n_collect
    print(f"fixed ε=1.0:   {div_coarse} divergent transitions / {total}")
    print(f"dual-averaged: {div_adapted} divergent transitions / {total}")

    os.makedirs(OUT_DIR, exist_ok=True)
    plot_path = os.path.join(OUT_DIR, "funnel_nuts.png")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    flat = np.asarray(s_adapted).reshape(-1, dim)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(flat[:, 0], flat[:, -1], s=3, alpha=0.25)
    ax.set_xlabel("x₁")
    ax.set_ylabel("v (log-scale parameter)")
    ax.set_title("NUTS samples from Neal's funnel (adapted ε)")
    fig.savefig(plot_path, dpi=100)
    plt.close(fig)
    print(f"Wrote {plot_path}")
    return div_coarse, div_adapted, plot_path


if __name__ == "__main__":
    main()
