"""Fused Pallas kernel tests.

On CPU the TPU interpreter stubs the hardware PRNG (prng_random_bits
returns constants); kernels seeded through ``pallas_hmc.seed_prng`` fall
back to a hash PRNG in interpret mode, so interpret tests here assert real
target *moments*, not just shapes.  Hardware-PRNG statistical runs live in
the tests marked `tpu` (and bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_mcmc_tpu import DiffableGaussian2D, init_det
from general_mcmc_tpu.ops.pallas_hmc import fused_hmc_run

_ON_TPU = jax.default_backend() not in ("cpu",)


def _target():
    return DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0], jnp.float32),
        cov=jnp.array([[4.0, 2.0], [2.0, 3.0]], jnp.float32),
    )


def test_fused_hmc_interpret_structure():
    s = fused_hmc_run(
        _target().unnorm_logp, init_det(8, 2), 0.2, 5, 10, 4, seed=0,
        interpret=True,
    )
    assert s.shape == (8, 10, 2)
    assert np.isfinite(np.asarray(s)).all()


def test_fused_hmc_interpret_moments():
    """The interpret-mode PRNG fallback (pallas_hmc.seed_prng) makes CPU
    kernel runs statistically meaningful: actual target moments, not just
    shapes."""
    t = _target()
    s = np.asarray(
        fused_hmc_run(t.unnorm_logp, init_det(64, 2), 0.25, 10, 150, 50,
                      seed=1, interpret=True)
    )
    flat = s.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.4)
    np.testing.assert_allclose(
        np.cov(flat.T), [[4.0, 2.0], [2.0, 3.0]], atol=1.0
    )


@pytest.mark.skipif(not _ON_TPU, reason="needs real TPU PRNG")
def test_fused_hmc_tpu_moments():
    t = _target()
    s = np.asarray(
        fused_hmc_run(t.unnorm_logp, init_det(512, 2), 0.25, 10, 400, 100, seed=1)
    )
    flat = s.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.3)
    np.testing.assert_allclose(
        np.cov(flat.T), [[4.0, 2.0], [2.0, 3.0]], atol=0.6
    )


def test_nuts_pallas_backend_retired():
    """The fused NUTS kernels were retired (round 4; docs/MOSAIC_RULES.md):
    the backend name must fail loudly with routing guidance, not fall back
    silently."""
    import pytest
    from general_mcmc_tpu import NUTS

    for name in ("pallas", "pallas2"):
        with pytest.raises(ValueError, match="retired"):
            NUTS(_target(), init_det(8, 2), 0.8, backend=name)


def test_hmc_pallas_backend_interpret():
    from general_mcmc_tpu import HMC, GaussianND

    t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.array([1.0, 2.0], jnp.float32))
    # interpret mode only validates plumbing on CPU (stubbed PRNG)
    from general_mcmc_tpu.ops import pallas_hmc

    s = pallas_hmc.fused_hmc_run(
        t.unnorm_logp, init_det(8, 2), 0.2, 3, 6, 2, seed=0, interpret=True
    )
    assert s.shape == (8, 6, 2)


@pytest.mark.skipif(not _ON_TPU, reason="needs real TPU PRNG")
def test_hmc_pallas_backend_tpu():
    from general_mcmc_tpu import HMC, GaussianND

    t = GaussianND(mean=jnp.zeros(4, jnp.float32), cov=jnp.array([1.0, 2.0, 0.5, 3.0], jnp.float32))
    sampler = HMC(t, init_det(256, 4), 0.3, 10, backend="pallas").set_seed(2)
    s = np.asarray(sampler.run(500, 100)).reshape(-1, 4)
    np.testing.assert_allclose(s.mean(axis=0), np.zeros(4), atol=0.3)
    np.testing.assert_allclose(s.std(axis=0), [1.0, 2.0, 0.5, 3.0], rtol=0.25)


def test_mh_pallas_interpret_structure():
    from general_mcmc_tpu.ops.pallas_mh import fused_mh_run
    from general_mcmc_tpu import GaussianND

    t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.array([1.0, 2.0], jnp.float32))
    s = fused_mh_run(t.unnorm_logp, init_det(8, 2), 0.5, 6, 2, seed=0, interpret=True)
    assert s.shape == (8, 6, 2)
    assert np.isfinite(np.asarray(s)).all()


@pytest.mark.skipif(not _ON_TPU, reason="needs real TPU PRNG")
def test_mh_pallas_backend_tpu():
    from general_mcmc_tpu import GaussianND, MetropolisHastings
    from general_mcmc_tpu.samplers.metropolis_hastings import RandomWalkProposal

    t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.array([1.0, 2.0], jnp.float32))
    mh = MetropolisHastings(
        t, RandomWalkProposal(1.0), init_det(512, 2), backend="pallas"
    ).seed(5)
    s = np.asarray(mh.run(2000, 500)).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(axis=0), [0.0, 0.0], atol=0.2)
    np.testing.assert_allclose(s.std(axis=0), [1.0, 2.0], rtol=0.2)


@pytest.mark.slow
@pytest.mark.skipif(not _ON_TPU, reason="needs real TPU")
def test_mh_pallas_80m_stress():
    """metropolis_hastings.rs:408-418 at full scale: 16 chains × 5M steps."""
    import time

    from general_mcmc_tpu import Gaussian2D
    from general_mcmc_tpu.ops.pallas_mh import fused_mh_run

    target = Gaussian2D(
        mean=jnp.array([0.0, 1.0], jnp.float32),
        cov=jnp.array([[4.0, 2.0], [2.0, 3.0]], jnp.float32),
    )
    t0 = time.perf_counter()
    s = fused_mh_run(
        target.unnorm_logp, init_det(16, 2), 1.0, 5_000_000, 500,
        seed=7, block_chains=16,
    )
    jax.block_until_ready(s)
    wall = time.perf_counter() - t0
    flat = np.asarray(s[:, ::50]).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.05)
    np.testing.assert_allclose(
        np.cov(flat.T), [[4.0, 2.0], [2.0, 3.0]], atol=0.1
    )
    print(f"80M samples in {wall:.1f}s = {80e6/wall:.3g} samples/s")


def test_mh_pallas_asymmetric_pcn_interpret():
    """The fused kernel computes the full Hastings ratio for asymmetric
    proposals: with a standard-normal target, pCN accepts every step
    (ratio ≡ 1), which only holds if the q-correction is included."""
    from general_mcmc_tpu import GaussianND, PCNProposal
    from general_mcmc_tpu.ops.pallas_mh import fused_mh_run

    t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.ones(2, jnp.float32))
    s = fused_mh_run(
        t.unnorm_logp, init_det(8, 2), None, 50, 0, seed=1,
        interpret=True, proposal=PCNProposal(0.6),
    )
    s = np.asarray(s)
    assert s.shape == (8, 50, 2)
    moved = (np.diff(s, axis=1) != 0).any(axis=2)
    assert moved.all()


@pytest.mark.skipif(not _ON_TPU, reason="needs real TPU PRNG")
def test_mh_pallas_asymmetric_pcn_tpu_moments():
    from general_mcmc_tpu import GaussianND, MetropolisHastings, PCNProposal

    t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.array([1.0, 1.0], jnp.float32))
    mh = MetropolisHastings(
        t, PCNProposal(0.5), init_det(512, 2), backend="pallas"
    ).seed(6)
    s = np.asarray(mh.run(2000, 500)).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(axis=0), [0.0, 0.0], atol=0.15)
    np.testing.assert_allclose(s.std(axis=0), [1.0, 1.0], rtol=0.15)


def test_mh_pallas_thinning_interpret():
    """Fused-kernel thinning keeps the stride's last write per block: exact
    agreement with the strided unthinned kernel run (same seed → same
    per-(block, step) PRNG streams)."""
    from general_mcmc_tpu import GaussianND
    from general_mcmc_tpu.ops.pallas_mh import fused_mh_run

    t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.ones(2, jnp.float32))
    full = np.asarray(
        fused_mh_run(t.unnorm_logp, init_det(8, 2), 0.7, 12, 4, seed=3,
                     interpret=True)
    )
    thin = np.asarray(
        fused_mh_run(t.unnorm_logp, init_det(8, 2), 0.7, 4, 4, seed=3,
                     interpret=True, thin=3)
    )
    np.testing.assert_array_equal(thin, full[:, 2::3])
