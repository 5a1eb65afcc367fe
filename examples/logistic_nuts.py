"""Hierarchical logistic regression with NUTS (the BASELINE.json stretch
workload): hundreds of vmapped chains over a (p+2)-dimensional posterior."""

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import NUTS, NUTSMassMatrixConfig, init_with_seed
from general_mcmc_tpu.models.regression import HierarchicalLogistic, make_logistic_data


def main(n_obs=200, n_features=8, n_chains=256, n_collect=300, n_warmup=300, seed=0):
    X, y, beta_true = make_logistic_data(jax.random.key(seed), n_obs, n_features)
    model = HierarchicalLogistic(X, y)
    sampler = NUTS(
        model,
        0.1 * init_with_seed(n_chains, model.dim, seed + 1),
        target_accept_p=0.8,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal", start_buffer=50,
                                         end_buffer=25, initial_window=25),
        seed=seed,
    )
    sample, stats = sampler.run_progress(n_collect, n_warmup, progress=False)
    print(stats)
    beta_hat = np.asarray(sample)[:, :, 2:].reshape(-1, n_features).mean(axis=0)
    err = np.abs(beta_hat - np.asarray(beta_true))
    print(f"posterior-mean beta error: max={err.max():.3f} mean={err.mean():.3f}")
    return sample, beta_hat, np.asarray(beta_true)


if __name__ == "__main__":
    main()
