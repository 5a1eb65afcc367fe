"""Example smoke tests: each example's main() runs and produces its
artifacts (the reference runs every example under #[test] fn test_main,
e.g. gauss_mh.rs:109-126)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples"))


@pytest.fixture(autouse=True)
def _example_out(tmp_path, monkeypatch):
    monkeypatch.setenv("EXAMPLE_OUT", str(tmp_path))
    yield tmp_path


def test_minimal_mh():
    import minimal_mh

    minimal_mh.main()


def test_minimal_hmc():
    import minimal_hmc

    minimal_hmc.main()


def test_minimal_nuts():
    import minimal_nuts

    # smaller than the example default to keep CI fast
    from general_mcmc_tpu import NUTS, Rosenbrock2D, init_det

    sampler = NUTS(Rosenbrock2D(1.0, 100.0), init_det(4, 2), 0.95).set_seed(42)
    sample, _ = sampler.run_progress(50, 50, progress=False)
    assert sample.shape == (4, 50, 2)


def test_gauss_mh(_example_out):
    import gauss_mh

    parquet_path, plot_path = gauss_mh.main(sample_size=2000, burnin=200)
    assert os.path.exists(parquet_path)
    assert os.path.exists(plot_path)


def test_rosenbrock_mh(_example_out):
    import rosenbrock_mh

    path = rosenbrock_mh.main(sample_size=2000, burnin=200)
    assert os.path.exists(path)


def test_rosenbrock3d_hmc(_example_out):
    import rosenbrock3d_hmc

    path = rosenbrock3d_hmc.main(n_collect=100, burnin=20)
    assert os.path.exists(path)


def test_mixture_gibbs(_example_out):
    import mixture_gibbs

    path = mixture_gibbs.main(n_collect=2000, burnin=200)
    assert os.path.exists(path)


def test_poisson_mh(_example_out):
    import poisson_mh

    path = poisson_mh.main(n_collect=2000, burnin=200)
    assert os.path.exists(path)


def test_logistic_nuts():
    import logistic_nuts

    sample, beta_hat, beta_true = logistic_nuts.main(
        n_obs=120, n_features=4, n_chains=32, n_collect=150, n_warmup=150
    )
    assert sample.shape == (32, 150, 6)
    import numpy as np

    # With 120 observations the posterior is wide; require only loose
    # recovery and the right sign structure for the strong coefficients.
    assert np.max(np.abs(beta_hat - beta_true)) < 1.5
    strong = np.abs(beta_true) > 0.5
    assert np.all(np.sign(beta_hat[strong]) == np.sign(beta_true[strong]))


def test_regression_nc_track():
    import regression_nc_track

    sample, stats, beta_true = regression_nc_track.main(
        n_obs=120, n_features=4, n_chains=32, n_collect=150, n_warmup=150
    )
    # tracked quantity is beta (p dims), not theta (p+2 dims)
    assert sample.shape == (32, 150, 4)
    assert stats.rhat.max < 1.2  # R-hat computed on the transformed scale


def test_custom_gradient_nuts():
    """User-supplied analytic gradients (distributions.rs:83-90's override
    story via jax.custom_vjp): the hand-coded rule feeds the sampler and the
    posterior is still correct."""
    import custom_gradient_nuts
    import numpy as np

    sample, stats = custom_gradient_nuts.main(
        n_chains=32, n_collect=300, n_warmup=150
    )
    flat = np.asarray(sample).reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(axis=0), [1.0, -2.0, 3.0], atol=0.25)
    np.testing.assert_allclose(
        flat.var(axis=0), [0.5, 2.0, 4.0], rtol=0.35
    )
    assert stats.rhat.max < 1.05


def test_custom_vjp_rule_actually_used():
    """A custom vjp whose backward pass is deliberately WRONG must change the
    gradients the samplers compute — proving value_and_grad routes through
    the user rule, not silent autodiff."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.custom_vjp
    def logp(x):
        return -0.5 * jnp.sum(x * x)

    def fwd(x):
        return -0.5 * jnp.sum(x * x), x

    def bwd(res, ct):
        return (ct * (-3.0 * res),)  # wrong on purpose: 3x the true gradient

    logp.defvjp(fwd, bwd)
    g = jax.grad(logp)(jnp.array([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(g), [-3.0, -6.0], rtol=1e-6)


def test_sharded_nuts_example():
    import sharded_nuts

    sample = sharded_nuts.main(n_chains=64, dim=8, n_collect=30, n_warmup=80)
    assert sample.shape[0] == 64


def test_funnel_nuts(_example_out):
    import funnel_nuts

    div_coarse, div_adapted, path = funnel_nuts.main(
        n_chains=16, dim=6, n_collect=120, n_warmup=200
    )
    assert os.path.exists(path)
    assert div_coarse > div_adapted  # adaptation reduces divergences
    assert div_coarse > 0


def test_two_wells_tempering(_example_out):
    import two_wells_tempering

    trapped_frac, mixed_frac = two_wells_tempering.main()
    assert trapped_frac < 0.05
    assert 0.3 < mixed_frac < 0.7


def test_static_window_nuts_example():
    import numpy as np
    import static_window_nuts

    sample = static_window_nuts.main()
    flat = np.asarray(sample).reshape(-1, 16)
    scales = np.exp(np.linspace(0.0, np.log(10.0), 16))
    np.testing.assert_allclose(flat.std(axis=0), scales, rtol=0.12)


def test_multinomial_nuts_example():
    import multinomial_nuts

    results = multinomial_nuts.main()  # asserts shapes + R-hat internally
    assert set(results) == {"slice", "multinomial"}
    for rhat_max, min_ess in results.values():
        assert rhat_max < 1.05
        assert min_ess > 500


def test_chees_hmc_example():
    import numpy as np
    import chees_hmc

    sample = chees_hmc.main()  # asserts R-hat + moment audit internally
    flat = np.asarray(sample).reshape(-1, 16)
    scales = np.exp(np.linspace(0.0, np.log(10.0), 16))
    np.testing.assert_allclose(flat.std(axis=0), scales, rtol=0.12)


def test_auto_backend_nuts_example():
    import numpy as np
    import auto_backend_nuts

    sample_a, sample_b = auto_backend_nuts.main()  # asserts choices internally
    for s in (sample_a, sample_b):
        flat = np.asarray(s)[:, 128:, :].reshape(-1, 8)
        assert np.abs(flat.mean(axis=0)).max() < 0.3
        np.testing.assert_allclose(flat.std(axis=0), 1.0, atol=0.25)
