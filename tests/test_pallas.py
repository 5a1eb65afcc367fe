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


def test_pallas_nuts_interpret_moments():
    """Repeated fused-NUTS (v2 kernel) transitions under the interpreter with
    the hash PRNG fallback reach the target distribution."""
    from general_mcmc_tpu.ops.pallas_nuts2 import pallas_nuts2_step

    t = _target()
    logp = t.unnorm_logp
    pos = init_det(32, 2).astype(jnp.float32)
    lp, grad = jax.vmap(jax.value_and_grad(logp))(pos)
    lp, grad = lp.astype(jnp.float32), grad.astype(jnp.float32)

    @jax.jit  # seed is a traced SMEM input: one kernel trace for all steps
    def step(pos, lp, grad, seed):
        return pallas_nuts2_step(
            logp, pos, lp, grad,
            jnp.full((32,), 0.4, jnp.float32),
            jnp.ones((32, 2), jnp.float32),
            jnp.ones((32, 2), jnp.float32),
            seed=seed, max_depth=5, interpret=True,
        )[:3]

    collected = []
    for i in range(60):
        pos, lp, grad = step(pos, lp, grad, jnp.int32(i))
        if i >= 20:
            collected.append(np.asarray(pos))
    flat = np.concatenate(collected).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.5)
    np.testing.assert_allclose(
        np.cov(flat.T), [[4.0, 2.0], [2.0, 3.0]], atol=1.2
    )


@pytest.mark.skipif(not _ON_TPU, reason="needs real TPU PRNG")
def test_pallas_nuts_tpu_moments():
    """backend="pallas" routes to the v2 (block-synchronized) fused kernel."""
    from general_mcmc_tpu import NUTS

    sampler = NUTS(_target(), init_det(512, 2), 0.8, backend="pallas").set_seed(3)
    s = np.asarray(sampler.run(400, 200)).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(axis=0), [0.0, 1.0], atol=0.3)
    np.testing.assert_allclose(np.cov(s.T), [[4.0, 2.0], [2.0, 3.0]], atol=0.7)


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


def test_pallas_nuts2_interpret_structure():
    from general_mcmc_tpu.ops.pallas_nuts2 import pallas_nuts2_step

    t = _target()
    pos = init_det(8, 2).astype(jnp.float32)
    lp, grad = jax.vmap(jax.value_and_grad(t.unnorm_logp))(pos)
    out = pallas_nuts2_step(
        t.unnorm_logp, pos, lp.astype(jnp.float32), grad.astype(jnp.float32),
        jnp.full((8,), 0.3, jnp.float32), jnp.ones((8, 2), jnp.float32),
        jnp.ones((8, 2), jnp.float32), seed=0, max_depth=5, interpret=True,
    )
    assert out[0].shape == (8, 2)
    assert np.isfinite(np.asarray(out[0])).all()
    assert np.all(np.asarray(out[4]) >= 1)  # n_alpha
    assert np.all(np.asarray(out[6]) >= 1)  # depth


@pytest.mark.skipif(not _ON_TPU, reason="needs real TPU PRNG")
def test_pallas_nuts2_tpu_moments():
    from general_mcmc_tpu.ops.pallas_nuts2 import pallas_nuts2_step
    from general_mcmc_tpu import GaussianND

    t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.array([1.0, 3.0], jnp.float32))
    N = 512
    pos = init_det(N, 2).astype(jnp.float32)
    lp, grad = jax.vmap(jax.value_and_grad(t.unnorm_logp))(pos)

    @jax.jit
    def many(pos, lp, grad):
        def body(carry, s):
            p, l, g = carry
            p, l, g, *_ = pallas_nuts2_step(
                t.unnorm_logp, p, l, g, jnp.full((N,), 0.5, jnp.float32),
                jnp.ones((N, 2), jnp.float32), jnp.ones((N, 2), jnp.float32),
                seed=s, max_depth=6, block_chains=256,
            )
            return (p, l, g), p
        _, xs = jax.lax.scan(body, (pos, lp, grad), jnp.arange(600, dtype=jnp.int32))
        return xs

    xs = many(pos, lp.astype(jnp.float32), grad.astype(jnp.float32))
    flat = np.asarray(xs[200:]).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(flat.std(axis=0), [1.0, 3.0], rtol=0.1)


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


def test_pallas2_backend_end_to_end_interpret():
    """The full adaptive NUTS pipeline (eps search, warmup windows, dual
    averaging, warmup-depth phase switch) through backend='pallas2' with
    the interpret-mode kernel reaches the target distribution."""
    from general_mcmc_tpu import NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed

    t = GaussianND(
        mean=jnp.zeros(2, jnp.float32), cov=jnp.array([1.0, 3.0], jnp.float32)
    )
    s = NUTS(
        t,
        init_with_seed(16, 2, 0),
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal"),
        max_tree_depth=4,
        warmup_tree_depth=3,
        seed=0,
        backend="pallas2",
        pallas_options={
            "block_chains": 16,
            "vmem_limit_mb": 64,
            "interpret": True,
        },
    )
    out = np.asarray(s.run(24, 24))
    assert out.shape == (16, 24, 2)
    flat = out.reshape(-1, 2)
    assert np.isfinite(flat).all()
    # loose moment envelope (tiny run) - catches gross selection bias like
    # the round-2 dead-U-turn bug (~57% std inflation)
    np.testing.assert_allclose(flat.std(axis=0), [1.0, 3.0], rtol=0.35)
