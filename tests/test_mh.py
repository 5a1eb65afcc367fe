"""Metropolis–Hastings tests.

Ports the reference's statistical envelopes: 2D-Gaussian moment accuracy
(metropolis_hastings.rs:342-386), the accept/falsify pairing from
tests/metrohast_2d_gaussian_test.rs:36-102, and the discrete Poisson/Binomial
frequency tests from tests/metrohast_poisson_test.rs:91-132, 221-253.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from general_mcmc_tpu import Binomial, Gaussian2D, IsotropicGaussian, Poisson, init_det
from general_mcmc_tpu.diagnostics.stats import RunStats
from general_mcmc_tpu.samplers.metropolis_hastings import (
    DiscreteWalkProposal,
    MetropolisHastings,
)

TARGET_MEAN = [0.0, 1.0]
TARGET_COV = [[4.0, 2.0], [2.0, 3.0]]


def _run_gaussian(sample_size, n_chains, use_progress=False, seed=42):
    target = Gaussian2D(mean=jnp.array(TARGET_MEAN), cov=jnp.array(TARGET_COV))
    proposal = IsotropicGaussian(1.0)
    mh = MetropolisHastings(target, proposal, init_det(n_chains, 2)).seed(seed)
    if use_progress:
        sample, _ = mh.run_progress(sample_size // n_chains, 500, progress=False)
    else:
        sample = mh.run(sample_size // n_chains, 500)
    assert sample.shape == (n_chains, sample_size // n_chains, 2)
    return np.asarray(sample)


def _check_moments(sample, mean, cov, mean_tol=0.3, cov_tol=0.5):
    flat = sample.reshape(-1, sample.shape[-1])
    emp_mean = flat.mean(axis=0)
    centered = flat - emp_mean
    emp_cov = centered.T @ centered / (len(flat) - 1)
    np.testing.assert_allclose(emp_mean, mean, atol=mean_tol)
    np.testing.assert_allclose(emp_cov, cov, atol=cov_tol)


def test_single_chain_shape():
    _run_gaussian(100, 1)


def test_3_chains_moments():
    # metropolis_hastings.rs:394-396 with the :384-385 tolerances
    sample = _run_gaussian(6000, 3)
    _check_moments(sample, TARGET_MEAN, TARGET_COV)


def test_progress_3_chains_moments():
    sample = _run_gaussian(6000, 3, use_progress=True)
    _check_moments(sample, TARGET_MEAN, TARGET_COV)


def test_run_and_run_progress_agree():
    """Both paths execute the identical kernel: same seed → same samples."""
    target = Gaussian2D(mean=jnp.array(TARGET_MEAN), cov=jnp.array(TARGET_COV))
    mh1 = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(3, 2)).seed(7)
    mh2 = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(3, 2)).seed(7)
    s1 = mh1.run(50, 10)
    s2, _ = mh2.run_progress(50, 10, progress=False)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_determinism_same_seed():
    target = Gaussian2D(mean=jnp.array(TARGET_MEAN), cov=jnp.array(TARGET_COV))
    runs = []
    for _ in range(2):
        mh = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(2, 2)).seed(3)
        runs.append(np.asarray(mh.run(20, 5)))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_different_seeds_differ():
    target = Gaussian2D(mean=jnp.array(TARGET_MEAN), cov=jnp.array(TARGET_COV))
    mh1 = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(2, 2)).seed(1)
    mh2 = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(2, 2)).seed(2)
    assert not np.allclose(np.asarray(mh1.run(20, 5)), np.asarray(mh2.run(20, 5)))


def test_falsification_wrong_target_deviates():
    """tests/metrohast_2d_gaussian_test.rs:73-102 — sampling the *wrong*
    target must NOT satisfy the tight covariance envelope, guarding against
    vacuous tolerances."""
    wrong = Gaussian2D(mean=jnp.array([0.0, 1.0]), cov=jnp.array([[9.0, 0.0], [0.0, 9.0]]))
    mh = MetropolisHastings(wrong, IsotropicGaussian(1.0), init_det(3, 2)).seed(42)
    sample = np.asarray(mh.run(2000, 500))
    flat = sample.reshape(-1, 2)
    emp_cov = np.cov(flat.T)
    assert np.max(np.abs(emp_cov - np.array(TARGET_COV))) > 1.0


@pytest.mark.parametrize(
    "target,pmf,k_max",
    [
        (Poisson(4.0), lambda k: sps.poisson.pmf(k, 4.0), 15),
        (Binomial(10, 0.3), lambda k: sps.binom.pmf(k, 10, 0.3), 10),
    ],
)
def test_discrete_mh_frequencies(target, pmf, k_max):
    """tests/metrohast_poisson_test.rs: 20k samples, per-k frequency within
    0.05 of the exact pmf."""
    n_chains, n_collect = 4, 5000
    inits = jnp.full((n_chains, 1), 4, jnp.int32)
    mh = MetropolisHastings(target, DiscreteWalkProposal(), inits).seed(42)
    sample = np.asarray(mh.run(n_collect, 1000))
    ks = sample.reshape(-1).astype(int)
    counts = np.bincount(ks, minlength=k_max + 1)
    freqs = counts[: k_max + 1] / len(ks)
    expected = pmf(np.arange(k_max + 1))
    assert np.max(np.abs(freqs - expected)) < 0.05


def test_runstats_on_mh_sample():
    sample = _run_gaussian(6000, 3)
    stats = RunStats.from_sample(sample)
    assert stats.rhat.max < 1.2
    assert stats.ess.min > 20.0


def test_mh_marginals_ks():
    """KS distance of thinned MH draws against the exact marginals."""
    from scipy import stats as sps

    from general_mcmc_tpu import GaussianND

    target = GaussianND(mean=jnp.zeros(2), cov=jnp.array([1.0, 2.0]))
    mh = MetropolisHastings(target, IsotropicGaussian(1.2), init_det(8, 2)).seed(11)
    sample = np.asarray(mh.run(8000, 1000))
    for j, sd in enumerate([1.0, 2.0]):
        draws = sample[:, ::40, j].ravel()  # thin: MH mixes slowly
        stat, _ = sps.kstest(draws, "norm", args=(0.0, sd))
        assert stat < 0.05, (j, stat)


def test_pcn_standard_normal_always_accepts():
    """For a standard-normal target the pCN Hastings ratio is exactly 1
    (Cotter et al. 2013) — every proposal is accepted, so consecutive
    states always differ.  This pins the full asymmetric accept rule
    (metropolis_hastings.rs:310-312): a symmetric-walk treatment of the
    same proposal would reject a large fraction."""
    import numpy as np

    from general_mcmc_tpu import GaussianND, PCNProposal

    target = GaussianND(mean=jnp.zeros(3), cov=jnp.ones(3))
    mh = MetropolisHastings(target, PCNProposal(0.6), init_det(8, 3)).seed(2)
    s = np.asarray(mh.run(200, 0))
    moved = (np.diff(s, axis=1) != 0).any(axis=2)
    assert moved.all()


def test_pcn_moments_nontrivial_target():
    import numpy as np

    from general_mcmc_tpu import GaussianND, PCNProposal

    target = GaussianND(mean=jnp.array([1.0, -1.0]), cov=jnp.array([0.5, 0.25]))
    mh = MetropolisHastings(target, PCNProposal(0.7), init_det(64, 2)).seed(3)
    s = np.asarray(mh.run(1500, 300)).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(axis=0), [1.0, -1.0], atol=0.1)
    # 1-D cov argument is std-dev scales (models/distributions.py GaussianND)
    np.testing.assert_allclose(s.std(axis=0), [0.5, 0.25], rtol=0.15)


def test_thinning_equals_strided_full_run():
    """thin=k records exactly every k-th state of the unthinned run (the
    per-step RNG is position-indexed, so trajectories coincide), and the
    final carry matches, so checkpoints continue identically."""
    import numpy as np

    target = Gaussian2D(mean=jnp.zeros(2), cov=jnp.eye(2))

    def make():
        return MetropolisHastings(target, IsotropicGaussian(1.0), init_det(3, 2))

    full = np.asarray(make().seed(5).run(30, 4))
    thin = np.asarray(make().seed(5).run(10, 4, thin=3))
    np.testing.assert_array_equal(thin, full[:, 2::3])
