"""Model-layer tests ported from distributions.rs test modules."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu.models.distributions import (
    Binomial,
    Categorical,
    DiffableGaussian2D,
    Gaussian2D,
    GaussianND,
    IsotropicGaussian,
    Poisson,
    Rosenbrock2D,
    RosenbrockND,
)


def _normalize_isogauss(x, d, std):
    # distributions.rs:575-578
    log_norm = -(d / 2.0) * (math.log(2.0) + math.log(math.pi) + 2.0 * math.log(std))
    return math.exp(x + log_norm)


def test_iso_gauss_unnorm_logp_1():
    # distributions.rs:580-590
    d = IsotropicGaussian(1.0)
    p = _normalize_isogauss(float(d.unnorm_logp(jnp.array([1.0]))), 1, 1.0)
    assert abs(p - 0.24197072451914337) < 1e-7


def test_iso_gauss_unnorm_logp_2():
    # distributions.rs:592-602
    d = IsotropicGaussian(2.0)
    p = _normalize_isogauss(float(d.unnorm_logp(jnp.array([0.42, 9.6]))), 2, 2.0)
    assert abs(p - 3.864661987252467e-7) < 1e-15


def test_iso_gauss_unnorm_logp_3():
    # distributions.rs:604-614
    d = IsotropicGaussian(3.0)
    p = _normalize_isogauss(float(d.unnorm_logp(jnp.array([1.0, 2.0, 3.0]))), 3, 3.0)
    assert abs(p - 0.001080393185560214) < 1e-8


def test_gaussian2d_normalized_logp_golden():
    # distributions.rs:821-839
    g = Gaussian2D(mean=jnp.array([0.0, 0.0]), cov=jnp.array([[1.0, 0.0], [0.0, 1.0]]))
    lp = float(g.logp(jnp.array([0.5, -0.5])))
    assert abs(lp - (-2.0878770664093453)) < 1e-10


def test_diffable_gaussian_matches_gaussian2d_up_to_constant():
    g = Gaussian2D(mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]]))
    dg = DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )
    x = jnp.array([0.7, -0.3])
    # DiffableGaussian2D includes the normalizing constant (Normalized role).
    assert abs(float(dg.unnorm_logp(x)) - float(g.logp(x))) < 1e-10


def test_diffable_gaussian_grad():
    dg = DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )
    x = jnp.array([1.0, 2.0])
    grad = jax.grad(dg.unnorm_logp)(x)
    expected = -np.asarray(dg.inv_cov) @ (np.asarray(x) - np.asarray(dg.mean))
    np.testing.assert_allclose(np.asarray(grad), expected, atol=1e-10)


def test_categorical_logp():
    # distributions.rs:629-671
    cat = Categorical(jnp.array([0.2, 0.3, 0.5]))
    assert abs(float(cat.logp(0)) - math.log(0.2)) < 1e-6
    assert abs(float(cat.logp(1)) - math.log(0.3)) < 1e-6
    assert abs(float(cat.logp(2)) - math.log(0.5)) < 1e-6
    assert float(cat.logp(3)) == -np.inf
    assert float(cat.unnorm_logp(jnp.array([1]))) == float(cat.logp(1))


def test_categorical_sampling_frequencies():
    # distributions.rs:676-703: 100k draws within 1% of the pmf.
    probs = [0.2, 0.3, 0.5]
    cat = Categorical(jnp.array(probs))
    keys = jax.random.split(jax.random.key(0), 100_000)
    draws = jax.vmap(cat.sample)(keys)
    counts = np.bincount(np.asarray(draws), minlength=3)
    freqs = counts / 100_000
    np.testing.assert_allclose(freqs, probs, atol=0.01)


def test_categorical_normalizes():
    cat = Categorical(jnp.array([2.0, 3.0, 5.0]))
    np.testing.assert_allclose(np.asarray(cat.probs), [0.2, 0.3, 0.5], atol=1e-6)


def test_rosenbrock2d_mode():
    r = Rosenbrock2D(a=1.0, b=100.0)
    assert float(r.unnorm_logp(jnp.array([1.0, 1.0]))) == 0.0
    assert float(r.unnorm_logp(jnp.array([0.0, 1.0]))) < -1.0


def test_rosenbrock_nd_matches_2d():
    r2 = Rosenbrock2D(a=1.0, b=100.0)
    rn = RosenbrockND()
    x = jnp.array([0.3, -0.7])
    assert abs(float(r2.unnorm_logp(x)) - float(rn.unnorm_logp(x))) < 1e-10


def test_gaussian_nd_diag_and_full_agree():
    scales = jnp.array([1.0, 2.0, 3.0])
    mean = jnp.zeros(3)
    g_diag = GaussianND(mean=mean, cov=scales)
    g_full = GaussianND(mean=mean, cov=jnp.diag(scales**2))
    x = jnp.array([0.5, -1.0, 2.0])
    assert abs(float(g_diag.unnorm_logp(x)) - float(g_full.unnorm_logp(x))) < 1e-8


def test_gaussian_nd_analytic_grad_matches_autodiff():
    """The as_grad_fn override must be semantically identical to
    jax.grad(unnorm_logp) (it is a pure optimization — samplers skip the
    interior log-density reduce with it)."""
    import jax

    from general_mcmc_tpu.models.distributions import as_grad_fn

    scales = jnp.array([1.0, 2.0, 3.0])
    mean = jnp.array([0.5, -1.0, 2.0])
    cov_full = jnp.array([[4.0, 1.0, 0.0], [1.0, 3.0, 0.5], [0.0, 0.5, 2.0]])
    x = jnp.array([0.3, -0.7, 1.2])
    for target in (
        GaussianND(mean=mean, cov=scales),
        GaussianND(mean=mean, cov=cov_full),
    ):
        grad_fn = as_grad_fn(target)
        assert grad_fn is not None
        np.testing.assert_allclose(
            np.asarray(grad_fn(x)),
            np.asarray(jax.grad(target.unnorm_logp)(x)),
            rtol=1e-10, atol=1e-12,
        )
    # targets without the hook report None (autodiff path stays)
    assert as_grad_fn(lambda x: -0.5 * jnp.sum(x * x)) is None


def test_poisson_binomial_pmfs():
    from scipy import stats as sps

    pois = Poisson(4.0)
    for k in range(10):
        assert abs(
            float(pois.unnorm_logp(jnp.array([k]))) - sps.poisson.logpmf(k, 4.0)
        ) < 1e-5
    assert float(pois.unnorm_logp(jnp.array([-1]))) == -np.inf

    binom = Binomial(10, 0.3)
    for k in range(11):
        assert abs(
            float(binom.unnorm_logp(jnp.array([k]))) - sps.binom.logpmf(k, 10, 0.3)
        ) < 1e-5
    assert float(binom.unnorm_logp(jnp.array([11]))) == -np.inf


def test_hierarchical_logistic_nc_consistency():
    """Non-centered logp equals the centered logp at the transformed point
    plus the log-Jacobian p·log τ (β = μ + τ·z ⇒ |dβ/dz| = τ^p)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from general_mcmc_tpu.models.regression import (
        HierarchicalLogistic,
        HierarchicalLogisticNC,
        make_logistic_data,
    )

    X, y, _ = make_logistic_data(jax.random.PRNGKey(3), 32, 5)
    c = HierarchicalLogistic(X, y)
    nc = HierarchicalLogisticNC(X, y)
    rng = np.random.default_rng(0)
    for _ in range(4):
        mu, log_tau = rng.normal(), rng.normal() * 0.5
        z = rng.normal(size=5)
        theta_nc = jnp.asarray(np.concatenate([[mu, log_tau], z]), jnp.float64)
        beta = mu + np.exp(log_tau) * z
        theta_c = jnp.asarray(np.concatenate([[mu, log_tau], beta]), jnp.float64)
        lhs = float(nc.unnorm_logp(theta_nc))
        rhs = float(c.unnorm_logp(theta_c)) + 5 * log_tau
        np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
        # beta() maps sampled theta back to coefficients (batched axis too)
        np.testing.assert_allclose(
            np.asarray(nc.beta(theta_nc)), beta, rtol=1e-10
        )


def test_logistic_analytic_grad_matches_autodiff():
    """The logistic targets' as_grad_fn overrides must be semantically
    identical to jax.grad(unnorm_logp) — pure optimization (interior
    leapfrogs skip the softplus + log-density reduce on the bench stretch
    workload)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from general_mcmc_tpu.models.distributions import as_grad_fn
    from general_mcmc_tpu.models.regression import (
        HierarchicalLogistic,
        HierarchicalLogisticNC,
        make_logistic_data,
    )

    X, y, _ = make_logistic_data(jax.random.PRNGKey(7), 48, 6)
    rng = np.random.default_rng(1)
    for target in (HierarchicalLogistic(X, y), HierarchicalLogisticNC(X, y)):
        grad_fn = as_grad_fn(target)
        assert grad_fn is not None
        for _ in range(4):
            theta = jnp.asarray(
                np.concatenate(
                    [[rng.normal(), 0.5 * rng.normal()], rng.normal(size=6)]
                ),
                jnp.float64,
            )
            np.testing.assert_allclose(
                np.asarray(grad_fn(theta)),
                np.asarray(jax.grad(target.unnorm_logp)(theta)),
                rtol=1e-9, atol=1e-11,
            )
