"""Checkpoint/resume tests — the capability the reference lists as TODO
(core.rs:177)."""

import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import (
    DiffableGaussian2D,
    Gaussian2D,
    IsotropicGaussian,
    MetropolisHastings,
    NUTS,
    init_det,
)
from general_mcmc_tpu.utils.checkpoint import load_carry, save_carry


def test_carry_roundtrip(tmp_path):
    target = Gaussian2D(mean=jnp.zeros(2), cov=jnp.eye(2))
    mh = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(3, 2)).seed(1)
    mh.run(10, 5)
    path = str(tmp_path / "carry.npz")
    save_carry(mh._final_carry, path)
    back = load_carry(path)
    x, lp, keys = mh._final_carry
    bx, blp, bkeys = back
    np.testing.assert_array_equal(np.asarray(x), np.asarray(bx))
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(blp))
    # keys survive the round trip functionally
    import jax

    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(keys)), np.asarray(jax.random.key_data(bkeys))
    )


def test_resume_equals_uninterrupted_run(tmp_path):
    """checkpoint at step K then resume must reproduce the uninterrupted
    run exactly (same step indices → same per-step keys)."""
    target = Gaussian2D(mean=jnp.zeros(2), cov=jnp.eye(2))

    full = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(3, 2)).seed(9)
    ref = np.asarray(full.run(40, 0))

    part = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(3, 2)).seed(9)
    first = np.asarray(part.run(25, 0))
    path = str(tmp_path / "ckpt.npz")
    part.save_checkpoint(path)

    fresh = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(3, 2)).seed(9)
    rest = np.asarray(fresh.resume(path, 15))

    np.testing.assert_allclose(first, ref[:, :25], atol=1e-12)
    np.testing.assert_allclose(rest, ref[:, 25:], atol=1e-12)


def test_nuts_resume_continues_post_warmup(tmp_path):
    target = DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )
    sampler = NUTS(target, init_det(3, 2), 0.8).set_seed(4)
    sampler.run(20, 50)
    eps_before = np.asarray(sampler.adapted_step_size)
    path = str(tmp_path / "nuts.npz")
    sampler.save_checkpoint(path)

    fresh = NUTS(target, init_det(3, 2), 0.8).set_seed(4)
    more = fresh.resume(path, 30)
    assert more.shape == (3, 30, 2)
    assert np.isfinite(np.asarray(more)).all()
    # adapted step size stays frozen through the resumed segment
    np.testing.assert_allclose(
        np.asarray(fresh.adapted_step_size), eps_before, atol=1e-7
    )


def test_gibbs_and_mala_resume_exactness(tmp_path):
    """resume == uninterrupted for every scan-based sampler."""
    import jax

    from general_mcmc_tpu import GaussianND, GibbsSampler
    from general_mcmc_tpu.samplers.mala import MALA

    def cond(key, i, state):
        return 0.5 * state[jnp.maximum(i - 1, 0)] + jax.random.normal(
            key, (), state.dtype
        )

    g_full = GibbsSampler(cond, jnp.zeros((3, 4))).set_seed(6)
    ref = np.asarray(g_full.run(30, 0))
    g_part = GibbsSampler(cond, jnp.zeros((3, 4))).set_seed(6)
    g_part.run(18, 0)
    p = str(tmp_path / "g.npz")
    g_part.save_checkpoint(p)
    rest = np.asarray(GibbsSampler(cond, jnp.zeros((3, 4))).set_seed(6).resume(p, 12))
    np.testing.assert_allclose(rest, ref[:, 18:], atol=1e-12)

    target = GaussianND(mean=jnp.zeros(2), cov=jnp.ones(2))
    m_full = MALA(target, init_det(3, 2), 0.5).set_seed(6)
    ref = np.asarray(m_full.run(30, 0))
    m_part = MALA(target, init_det(3, 2), 0.5).set_seed(6)
    m_part.run(18, 0)
    p = str(tmp_path / "m.npz")
    m_part.save_checkpoint(p)
    rest = np.asarray(MALA(target, init_det(3, 2), 0.5).set_seed(6).resume(p, 12))
    np.testing.assert_allclose(rest, ref[:, 18:], atol=1e-10)


# ---------------------------------------------------------------------------
# Property sweep: resume(K) ≡ uninterrupted, across samplers × dtypes × splits
# ---------------------------------------------------------------------------

import pytest

from general_mcmc_tpu import GaussianND, GibbsSampler, HMC, MALA, Poisson
from general_mcmc_tpu.samplers.metropolis_hastings import DiscreteWalkProposal


def _cond(key, i, state):
    import jax

    return 0.5 * state[jnp.maximum(i - 1, 0)] + jax.random.normal(
        key, (), state.dtype
    )


_FACTORIES = {
    "mh_f32": lambda: MetropolisHastings(
        Gaussian2D(mean=jnp.zeros(2), cov=jnp.eye(2)),
        IsotropicGaussian(1.0),
        init_det(4, 2),
    ),
    "mh_f64": lambda: MetropolisHastings(
        Gaussian2D(mean=jnp.zeros(2), cov=jnp.eye(2)),
        IsotropicGaussian(1.0),
        init_det(4, 2, dtype=jnp.float64),
    ),
    "mh_int32": lambda: MetropolisHastings(
        Poisson(4.0), DiscreteWalkProposal(), jnp.full((4, 1), 4, jnp.int32)
    ),
    "hmc": lambda: HMC(
        DiffableGaussian2D(
            mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
        ),
        init_det(4, 2),
        0.2,
        5,
    ),
    "mala": lambda: MALA(GaussianND(mean=jnp.zeros(3), cov=jnp.ones(3)),
                         init_det(4, 3), 0.4),
    "gibbs": lambda: GibbsSampler(_cond, jnp.zeros((4, 3))),
    "tempering": lambda: __import__("general_mcmc_tpu").ReplicaExchange(
        lambda x: -0.5 * jnp.sum(x * x),
        init_det(4, 2),
        jnp.array([1.0, 4.0, 16.0]),
    ),
    # post-warmup NUTS (fixed ε): schedule clamping makes resume bit-exact
    "nuts": lambda: NUTS(
        DiffableGaussian2D(
            mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
        ),
        init_det(4, 2),
        0.8,
        step_size=0.3,
    ),
    # static-window backend: the per-step RNG is position-indexed just like
    # the dynamic tree's, so resume must be bit-exact here too
    "nuts_static": lambda: NUTS(
        DiffableGaussian2D(
            mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
        ),
        init_det(4, 2),
        0.8,
        step_size=0.3,
        max_tree_depth=3,
        backend="static",
    ),
    # multinomial proposal: the weight accounting is stateless per
    # transition, so resume exactness must be unaffected (both backends'
    # laws covered by the two entries below)
    "nuts_multinomial": lambda: NUTS(
        DiffableGaussian2D(
            mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
        ),
        init_det(4, 2),
        0.8,
        step_size=0.3,
        proposal="multinomial",
    ),
    "nuts_static_multinomial": lambda: NUTS(
        DiffableGaussian2D(
            mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
        ),
        init_det(4, 2),
        0.8,
        step_size=0.3,
        max_tree_depth=3,
        backend="static",
        proposal="multinomial",
    ),
    # post-warmup ChEES-HMC: the Halton jitter is indexed by the absolute
    # step counter and the adapted state rides in the carry, so a resumed
    # run replays the exact trajectory-length stream
    "chees": lambda: __import__("general_mcmc_tpu").ChEESHMC(
        DiffableGaussian2D(
            mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
        ),
        init_det(4, 2),
        step_size=0.3,
        trajectory_length=1.8,
    ),
}


@pytest.mark.parametrize("name", sorted(_FACTORIES))
@pytest.mark.parametrize("seed,total,k", [(0, 22, 9), (13, 22, 1)])
def test_resume_exactness_property(tmp_path, name, seed, total, k):
    """For every scan-based sampler and state dtype, checkpointing after K
    steps and resuming reproduces the uninterrupted run bit-for-bit (the
    per-step fold_in RNG scheme makes the streams position-dependent, not
    history-dependent)."""
    make = _FACTORIES[name]
    ref = np.asarray(make().seed(seed).run(total, 0))

    part = make().seed(seed)
    first = np.asarray(part.run(k, 0))
    path = str(tmp_path / f"{name}.npz")
    part.save_checkpoint(path)
    rest = np.asarray(make().seed(seed).resume(path, total - k))

    np.testing.assert_array_equal(first, ref[:, :k])
    np.testing.assert_array_equal(rest, ref[:, k:])
