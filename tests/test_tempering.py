"""Replica-exchange (parallel tempering) tests — beyond-reference extension.

The decisive check is the classic two-well mixture: plain random-walk MH
started in one mode essentially never crosses (the falsification control),
while the tempered ensemble recovers both modes' mass.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from general_mcmc_tpu import (
    IsotropicGaussian,
    MetropolisHastings,
    ReplicaExchange,
    geometric_temperatures,
    init_det,
)


def _two_wells(x):
    # equal mixture of N(-4, 0.5^2) and N(+4, 0.5^2), 1-D
    a = -0.5 * jnp.sum((x + 4.0) ** 2) / 0.25
    b = -0.5 * jnp.sum((x - 4.0) ** 2) / 0.25
    return jnp.logaddexp(a, b)


def test_geometric_ladder():
    t = np.asarray(geometric_temperatures(5, 16.0))
    np.testing.assert_allclose(t[0], 1.0)
    np.testing.assert_allclose(t[-1], 16.0)
    np.testing.assert_allclose(t[1:] / t[:-1], t[1] / t[0])  # geometric


def test_two_wells_mode_recovery_and_mh_control():
    init = jnp.full((8, 1), -4.0)  # everyone starts in the LEFT well

    # control: plain MH stays trapped (falsification pairing, SURVEY §4)
    mh = MetropolisHastings(_two_wells, IsotropicGaussian(0.5), init).seed(0)
    s = np.asarray(mh.run(1500, 200))
    right_frac_mh = (s.reshape(-1) > 0).mean()
    assert right_frac_mh < 0.05

    # tempered ensemble crosses freely and recovers ~50/50 mass
    pt = ReplicaExchange(
        _two_wells, init, geometric_temperatures(6, 64.0), scale=0.5
    ).seed(0)
    s = np.asarray(pt.run(1500, 200))
    right_frac = (s.reshape(-1) > 0).mean()
    assert 0.3 < right_frac < 0.7, right_frac
    # and the cold replica still samples the wells at the right width
    left = s.reshape(-1)[s.reshape(-1) < 0]
    np.testing.assert_allclose(left.mean(), -4.0, atol=0.15)
    np.testing.assert_allclose(left.std(), 0.5, atol=0.15)


def test_cold_chain_exactness_single_mode():
    """On a unimodal target the cold chain's moments match regardless of
    the ladder (swaps preserve the joint distribution)."""
    target = lambda x: -0.5 * jnp.sum(x * x)
    pt = ReplicaExchange(
        target, init_det(16, 2), geometric_temperatures(4, 8.0), scale=0.8
    ).seed(3)
    s = np.asarray(pt.run(2000, 300)).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(axis=0), [0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(s.std(axis=0), [1.0, 1.0], atol=0.1)


def test_ladder_validation():
    with pytest.raises(ValueError, match="ladder"):
        ReplicaExchange(lambda x: 0.0, init_det(2, 1), jnp.ones(1))


def test_runner_integration():
    """Progress, thinning and checkpointing compose (cold-replica layout)."""
    target = lambda x: -0.5 * jnp.sum(x * x)
    pt = ReplicaExchange(target, init_det(4, 2),
                         geometric_temperatures(3, 4.0)).seed(1)
    s, stats = pt.run_progress(40, 10, progress=False, mode="stream")
    assert s.shape == (4, 40, 2)
    thin = np.asarray(
        ReplicaExchange(target, init_det(4, 2), geometric_temperatures(3, 4.0))
        .seed(1).run(10, 10, thin=4)
    )
    full = np.asarray(
        ReplicaExchange(target, init_det(4, 2), geometric_temperatures(3, 4.0))
        .seed(1).run(40, 10)
    )
    np.testing.assert_array_equal(thin, full[:, 3::4])


def test_ladder_must_start_at_one_and_ascend():
    with pytest.raises(ValueError, match="temperatures\\[0\\]"):
        ReplicaExchange(lambda x: 0.0, init_det(2, 1), jnp.array([2.0, 8.0]))
    with pytest.raises(ValueError, match="ascending"):
        ReplicaExchange(lambda x: 0.0, init_det(2, 1), jnp.array([1.0, 8.0, 4.0]))


def test_integer_inits_are_cast():
    pt = ReplicaExchange(
        lambda x: -0.5 * jnp.sum(x * x),
        jnp.zeros((4, 2), jnp.int32),
        jnp.array([1.0, 4.0]),
    ).seed(0)
    s = pt.run(5, 0)
    assert jnp.issubdtype(s.dtype, jnp.floating)
