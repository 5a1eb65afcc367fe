"""Gibbs sampler tests, porting gibbs.rs:207-445.

Covers: constant-conditional convergence (gibbs.rs:289-318), sequential
within-sweep dependence, and the two-component Gaussian-mixture moment tests
(gibbs.rs:341-418, 10% tolerance envelopes).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import init_det
from general_mcmc_tpu.samplers.gibbs import GibbsSampler


def constant_conditional(c):
    def sample(key, i, state):
        return jnp.asarray(c, state.dtype)

    return sample


@dataclasses.dataclass(frozen=True, eq=False)
class MixtureConditional:
    """State [x, z]: x | z ~ N(mu_z, sigma_z²); z | x by posterior odds
    (gibbs.rs:228-286)."""

    mu0: float
    sigma0: float
    mu1: float
    sigma1: float
    pi0: float

    def _pdf(self, x, mu, sigma):
        var = sigma * sigma
        return jnp.exp(-((x - mu) ** 2) / (2 * var)) / jnp.sqrt(2 * math.pi * var)

    def sample(self, key, i, state):
        if i == 0:
            z = state[1]
            noise = jax.random.normal(key, (), state.dtype)
            return jnp.where(
                z < 0.5, self.mu0 + self.sigma0 * noise, self.mu1 + self.sigma1 * noise
            )
        x = state[0]
        p0 = self.pi0 * self._pdf(x, self.mu0, self.sigma0)
        p1 = (1.0 - self.pi0) * self._pdf(x, self.mu1, self.sigma1)
        total = p0 + p1
        prob_z1 = jnp.where(total > 0.0, p1 / total, 0.5)
        return (jax.random.uniform(key, (), state.dtype) < prob_z1).astype(state.dtype)


def test_gibbs_constant_conditional():
    # gibbs.rs:305-318: every coordinate converges to the constant.
    sampler = GibbsSampler(constant_conditional(42.0), init_det(4, 2)).set_seed(42)
    sample = sampler.run(10, 5)
    assert sample.shape == (4, 10, 2)
    np.testing.assert_allclose(np.asarray(sample), 42.0)


def test_gibbs_run_progress():
    sampler = GibbsSampler(constant_conditional(42.0), init_det(4, 2))
    sample, stats = sampler.run_progress(10, 5, progress=False)
    assert sample.shape == (4, 10, 2)
    np.testing.assert_allclose(np.asarray(sample), 42.0)


def test_gibbs_sequential_dependence():
    """Coordinate 1 must see coordinate 0's value from the *same* sweep."""

    def copy_conditional(key, i, state):
        if i == 0:
            return state[0] + 1.0
        return state[0]  # sees the already-incremented value

    sampler = GibbsSampler(copy_conditional, jnp.zeros((1, 2)))
    sample = np.asarray(sampler.run(3, 0))
    # After sweep k: x0 = k+1, x1 = x0 (same sweep) = k+1
    np.testing.assert_allclose(sample[0, :, 0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(sample[0, :, 1], [1.0, 2.0, 3.0])


def _mixture_sim(mu0, sigma0, mu1, sigma1, pi0, n_chains, n_collect, n_discard, seed):
    # gibbs.rs:341-418
    theo_mean = pi0 * mu0 + (1 - pi0) * mu1
    theo_var = pi0 * (sigma0**2 + (mu0 - theo_mean) ** 2) + (1 - pi0) * (
        sigma1**2 + (mu1 - theo_mean) ** 2
    )
    cond = MixtureConditional(mu0, sigma0, mu1, sigma1, pi0)
    inits = jnp.concatenate(
        [init_det(n_chains, 1), jnp.zeros((n_chains, 1))], axis=1
    )
    sampler = GibbsSampler(cond, inits).set_seed(seed)
    sample = np.asarray(sampler.run(n_collect, n_discard))
    x = sample[:, :, 0].ravel()
    assert abs(x.mean() - theo_mean) < abs(theo_mean) / 10.0
    assert abs(x.var(ddof=1) - theo_var) < abs(theo_var) / 10.0


def test_gibbs_mixture_1():
    _mixture_sim(-2.0, 1.0, 3.0, 1.5, 0.5, 4, 25_000, 2_000, 42)


def test_gibbs_mixture_2():
    _mixture_sim(-42.0, 69.0, 1.0, 2.0, 0.123, 4, 25_000, 2_000, 42)


def test_gibbs_scan_sweep_high_dim():
    """static_sweep=False: traced-index sweep for large dims; a Gaussian
    chain-graph conditional (x_i | rest ~ N(mean of neighbors / 2, 1))
    must preserve within-sweep sequential dependence identically."""
    dim = 64

    def cond(key, i, state):
        # x_i | x_{i-1} ~ N(0.5 * x_{i-1}, 1); wraps i=0 to prior N(0,1)
        prev = jnp.where(i > 0, state[jnp.maximum(i - 1, 0)], 0.0)
        return 0.5 * prev + jax.random.normal(key, (), state.dtype)

    s_scan = GibbsSampler(cond, jnp.zeros((4, dim)), static_sweep=False).set_seed(3)
    sample = np.asarray(s_scan.run(500, 100))
    assert sample.shape == (4, 500, dim)
    assert np.isfinite(sample).all()
    # stationary AR(1)-along-coordinates: var_i -> 4/3, corr(x_{i-1},x_i)=0.5
    flat = sample.reshape(-1, dim)
    assert abs(flat[:, dim // 2].var() - 4.0 / 3.0) < 0.15
    corr = np.corrcoef(flat[:, 30], flat[:, 31])[0, 1]
    assert abs(corr - 0.5) < 0.1


def test_gibbs_scan_matches_unrolled():
    """Both sweep modes run the same kernel math (identical keys per
    coordinate), so a traceable conditional must produce identical chains."""

    def cond(key, i, state):
        return 0.3 * state[jnp.maximum(jnp.asarray(i) - 1, 0)] + jax.random.normal(
            key, (), state.dtype
        )

    a = GibbsSampler(cond, jnp.zeros((2, 5)), static_sweep=True).set_seed(8).run(20, 0)
    b = GibbsSampler(cond, jnp.zeros((2, 5)), static_sweep=False).set_seed(8).run(20, 0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
