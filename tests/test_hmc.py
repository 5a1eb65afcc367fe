"""HMC tests, porting hmc.rs:340-530 configurations and envelopes.

Reference workload (hmc.rs:513-669): 2D Gaussian mean [0,1],
cov [[4,2],[2,3]], 3 chains × 1000 collected (500 warmup), ε=0.1, L=10.
Single-run floor: ESS > 50 per parameter (hmc.rs:509-510); R-hat near 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import DiffableGaussian2D, RosenbrockND, init_det
from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess
from general_mcmc_tpu.samplers.hmc import HMC


def _gauss_target():
    return DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )


def test_hmc_shapes_and_finiteness():
    # hmc.rs:360-454 smoke tier
    sampler = HMC(_gauss_target(), init_det(3, 2), 0.1, 10).set_seed(42)
    sample = sampler.run(50, 10)
    assert sample.shape == (3, 50, 2)
    assert np.isfinite(np.asarray(sample)).all()


def test_hmc_gaussian_ess_and_rhat():
    # hmc.rs:509-510 single-run ESS floor + hmc.rs:658-668 R-hat envelope
    sampler = HMC(_gauss_target(), init_det(3, 2), 0.1, 10).set_seed(42)
    sample = sampler.run(1000, 500)
    rhat, ess = split_rhat_mean_ess(sample)
    assert float(jnp.min(ess)) > 50.0
    assert 0.9 < float(jnp.min(rhat)) and float(jnp.max(rhat)) < 1.1


def test_hmc_gaussian_moments():
    sampler = HMC(_gauss_target(), init_det(4, 2), 0.25, 12).set_seed(1)
    sample = np.asarray(sampler.run(4000, 500)).reshape(-1, 2)
    np.testing.assert_allclose(sample.mean(axis=0), [0.0, 1.0], atol=0.3)
    emp_cov = np.cov(sample.T)
    np.testing.assert_allclose(emp_cov, [[4.0, 2.0], [2.0, 3.0]], atol=0.6)


def test_hmc_rosenbrock_3d():
    # examples/rosenbrock3d_hmc.rs / minimal_hmc.rs configuration
    sampler = HMC(RosenbrockND(), init_det(4, 3), 0.032, 10).set_seed(42)
    sample = sampler.run(400, 50)
    assert sample.shape == (4, 400, 3)
    assert np.isfinite(np.asarray(sample)).all()


def test_hmc_progress_path_matches_run():
    s1 = HMC(_gauss_target(), init_det(3, 2), 0.1, 10).set_seed(9)
    s2 = HMC(_gauss_target(), init_det(3, 2), 0.1, 10).set_seed(9)
    a = s1.run(40, 20)
    b, _ = s2.run_progress(40, 20, progress=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_hmc_accept_preserves_gradient_consistency():
    """Carried gradient must equal the true gradient at the carried position
    after accept/reject masking."""
    sampler = HMC(_gauss_target(), init_det(5, 2), 0.3, 5).set_seed(4)
    sampler.run(10, 0)
    x, lp, grad, _ = sampler._final_carry
    lp_true, grad_true = jax.vmap(jax.value_and_grad(sampler.target))(x)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_true), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_true), atol=1e-6)


def test_hmc_marginals_ks():
    from scipy import stats as sps

    from general_mcmc_tpu import GaussianND

    target = GaussianND(mean=jnp.zeros(3), cov=jnp.array([1.0, 2.0, 0.5]))
    sampler = HMC(target, init_det(8, 3), 0.25, 10).set_seed(13)
    sample = np.asarray(sampler.run(2000, 500))
    for j, sd in enumerate([1.0, 2.0, 0.5]):
        draws = sample[:, ::4, j].ravel()
        stat, _ = sps.kstest(draws, "norm", args=(0.0, sd))
        assert stat < 0.03, (j, stat)


def test_hmc_analytic_grad_interior_matches_autodiff():
    """With a target providing as_grad_fn (GaussianND), interior leapfrogs
    skip the log-density reduce; the chain must match the value_and_grad
    path to tight tolerance (f64 test config — far below accept-flip
    scale)."""
    from general_mcmc_tpu import GaussianND

    target = GaussianND(
        mean=jnp.zeros(4), cov=jnp.array([1.0, 2.0, 3.0, 4.0])
    )

    def run(disable_override):
        s = HMC(target, init_det(8, 4), 0.2, 7).set_seed(3)
        assert s._ggrad is not None
        if disable_override:
            s._ggrad = None
        return np.asarray(s.run(32, 8))

    np.testing.assert_allclose(run(False), run(True), rtol=1e-9, atol=1e-9)


def test_mass_matrix_hmc_moments_and_efficiency():
    """Diagonal-mass HMC (extension beyond the reference's unit-mass
    engine): on an ill-conditioned Gaussian the correct metric both keeps
    the moments right and mixes dramatically better than unit mass."""
    import numpy as np

    from general_mcmc_tpu import GaussianND
    from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

    scales = jnp.array([1.0, 10.0, 0.1, 5.0])
    target = GaussianND(mean=jnp.zeros(4), cov=scales)
    mass_inv = scales**2  # M⁻¹ = target covariance (optimal metric)

    tuned = HMC(target, init_det(32, 4), 0.9, 8, mass_inv=mass_inv).seed(2)
    s = np.asarray(tuned.run(800, 200))
    flat = s.reshape(-1, 4)
    np.testing.assert_allclose(flat.mean(axis=0), np.zeros(4), atol=0.3)
    np.testing.assert_allclose(flat.std(axis=0), scales, rtol=0.15)
    _, ess_tuned = split_rhat_mean_ess(s)

    unit = HMC(target, init_det(32, 4), 0.09, 8).seed(2)  # ε limited by 0.1-scale dim
    _, ess_unit = split_rhat_mean_ess(np.asarray(unit.run(800, 200)))
    assert float(jnp.min(ess_tuned)) > 3.0 * float(jnp.min(ess_unit))


def test_mass_matrix_hmc_pallas_interpret_matches():
    """The fused kernel implements the same metric: moments agree on the
    ill-conditioned target under the interpret-mode PRNG."""
    import numpy as np

    from general_mcmc_tpu import GaussianND
    from general_mcmc_tpu.ops.pallas_hmc import fused_hmc_run

    scales = jnp.array([1.0, 5.0], jnp.float32)
    target = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=scales)
    s = np.asarray(
        fused_hmc_run(
            target.unnorm_logp, init_det(64, 2), 0.8, 8, 200, 100,
            seed=4, interpret=True, mass_inv=scales**2,
        )
    )
    flat = s.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.3)
    np.testing.assert_allclose(flat.std(axis=0), scales, rtol=0.2)


def test_dense_mass_hmc_correlated_target():
    """Dense M⁻¹ = target precision decorrelates a strongly correlated
    Gaussian: moments (incl. the cross term) match and min-ESS beats the
    diagonal metric."""
    import numpy as np

    from general_mcmc_tpu.diagnostics.stats import split_rhat_mean_ess

    cov = jnp.array([[1.0, 0.95], [0.95, 1.0]])
    target = DiffableGaussian2D(mean=jnp.zeros(2), cov=cov)

    # With M⁻¹ = Σ the whitened dynamics are a unit harmonic oscillator, so
    # pick ε·L ≈ 1.4 rad (avoid the 2π resonance where trajectories return
    # to their start and ESS collapses — empirically ε=0.8, L=8 does
    # exactly that while still passing the moment checks).
    dense = HMC(target, init_det(32, 2), 0.35, 4, mass_inv=cov).seed(5)
    s = np.asarray(dense.run(800, 200))
    flat = s.reshape(-1, 2)
    np.testing.assert_allclose(np.cov(flat.T), np.asarray(cov), atol=0.1)
    _, ess_dense = split_rhat_mean_ess(s)
    # near-iid draws: the whitened oscillator decorrelates in ~1 step
    assert float(jnp.min(ess_dense)) > 0.4 * flat.shape[0]


def test_dense_mass_rejected_on_pallas_backend():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dense"):
        HMC(_gauss_target(), init_det(4, 2), 0.2, 5, backend="pallas",
            mass_inv=jnp.eye(2))
