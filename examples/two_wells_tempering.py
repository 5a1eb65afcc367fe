"""Replica-exchange sampling of a two-well mixture (beyond-reference demo).

Every chain starts deep in the LEFT well.  Plain random-walk MH essentially
never crosses the barrier; the tempered ensemble recovers the 50/50 mode
mass through even-odd swap rounds.  Writes a histogram plot when
matplotlib is available.
"""

import os

import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import (
    IsotropicGaussian,
    MetropolisHastings,
    ReplicaExchange,
    geometric_temperatures,
)

OUT_DIR = os.environ.get("EXAMPLE_OUT", "example_outputs")


def two_wells(x):
    a = -0.5 * jnp.sum((x + 4.0) ** 2) / 0.25
    b = -0.5 * jnp.sum((x - 4.0) ** 2) / 0.25
    return jnp.logaddexp(a, b)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    init = jnp.full((16, 1), -4.0)

    mh = MetropolisHastings(two_wells, IsotropicGaussian(0.5), init).seed(0)
    trapped = np.asarray(mh.run(2000, 300)).reshape(-1)

    pt = ReplicaExchange(
        two_wells, init, geometric_temperatures(6, 64.0), scale=0.5
    ).seed(0)
    mixed, stats = pt.run_progress(2000, 300, progress=False)
    mixed = np.asarray(mixed).reshape(-1)

    print(f"plain MH right-mode mass:     {(trapped > 0).mean():.3f}")
    print(f"tempered right-mode mass:     {(mixed > 0).mean():.3f} (target 0.5)")
    print(stats)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(9, 3), sharey=True)
        for ax, data, title in (
            (axes[0], trapped, "plain MH (trapped)"),
            (axes[1], mixed, "replica exchange"),
        ):
            ax.hist(data, bins=80, density=True)
            ax.set_title(title)
        out = os.path.join(OUT_DIR, "two_wells_tempering.png")
        fig.savefig(out, dpi=100, bbox_inches="tight")
        print(f"wrote {out}")
    except ImportError:
        out = os.path.join(OUT_DIR, "two_wells_tempering.npz")
        np.savez(out, trapped=trapped, mixed=mixed)
        print(f"matplotlib unavailable; wrote {out}")
    return (trapped > 0).mean(), (mixed > 0).mean()


if __name__ == "__main__":
    main()
