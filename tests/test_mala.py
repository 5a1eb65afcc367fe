"""MALA tests (bonus sampler beyond reference parity)."""

import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import GaussianND, init_det
from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess
from general_mcmc_tpu.samplers.mala import MALA


def test_mala_gaussian_moments():
    target = GaussianND(mean=jnp.array([1.0, -2.0]), cov=jnp.array([1.0, 2.0]))
    sampler = MALA(target, init_det(8, 2), step_size=0.9).set_seed(4)
    sample = np.asarray(sampler.run(3000, 500))
    flat = sample.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [1.0, -2.0], atol=0.15)
    np.testing.assert_allclose(flat.std(axis=0), [1.0, 2.0], rtol=0.15)


def test_mala_marginals_ks():
    from scipy import stats as sps

    target = GaussianND(mean=jnp.zeros(2), cov=jnp.array([1.0, 1.0]))
    sampler = MALA(target, init_det(8, 2), step_size=0.9).set_seed(9)
    sample = np.asarray(sampler.run(4000, 500))
    draws = sample[:, ::8, 0].ravel()
    stat, _ = sps.kstest(draws, "norm")
    assert stat < 0.03, stat


def test_mala_beats_rw_mixing():
    """Gradient-informed proposals must out-mix a random walk at equal
    budget (the reason MALA exists)."""
    from general_mcmc_tpu import IsotropicGaussian, MetropolisHastings

    target = GaussianND(mean=jnp.zeros(4), cov=jnp.ones(4))
    mala = MALA(target, init_det(6, 4), step_size=0.8).set_seed(1)
    _, ess_mala = split_rhat_mean_ess(mala.run(1500, 300))
    mh = MetropolisHastings(target, IsotropicGaussian(0.6), init_det(6, 4)).seed(1)
    _, ess_mh = split_rhat_mean_ess(mh.run(1500, 300))
    assert float(jnp.min(ess_mala)) > 1.5 * float(jnp.min(ess_mh))


def test_mala_determinism():
    target = GaussianND(mean=jnp.zeros(2), cov=jnp.ones(2))
    a = MALA(target, init_det(3, 2), 0.5).set_seed(2).run(30, 5)
    b = MALA(target, init_det(3, 2), 0.5).set_seed(2).run(30, 5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
