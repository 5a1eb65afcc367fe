"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

The analog of the reference running its statistical tests at several
n_chains values (SURVEY.md §4): here the *same kernels* must produce
identical results whether the chain axis lives on one device or eight, and
the dim-sharded (tensor-parallel analog) path must compile and agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_mcmc_tpu import (
    DiffableGaussian2D,
    GaussianND,
    IsotropicGaussian,
    MetropolisHastings,
    NUTS,
    NUTSMassMatrixConfig,
    init_det,
)
from general_mcmc_tpu.diagnostics.stats import ChainStats, collect_rhat
from general_mcmc_tpu.parallel import (
    chain_mesh,
    make_mesh,
    pooled_rhat_sharded,
    run_sharded,
)
from general_mcmc_tpu.samplers.hmc import HMC

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _gauss2():
    return DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0]), cov=jnp.array([[4.0, 2.0], [2.0, 3.0]])
    )


def test_mh_sharded_matches_unsharded():
    target = _gauss2()
    mh1 = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(16, 2)).seed(4)
    ref = np.asarray(mh1.run(30, 10))
    mh2 = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(16, 2)).seed(4)
    mesh = chain_mesh(8)
    shard = np.asarray(run_sharded(mh2, 30, 10, mesh))
    np.testing.assert_allclose(shard, ref, atol=1e-12)


def test_hmc_sharded_matches_unsharded():
    target = _gauss2()
    h1 = HMC(target, init_det(16, 2), 0.1, 5).seed(4)
    ref = np.asarray(h1.run(20, 5))
    h2 = HMC(target, init_det(16, 2), 0.1, 5).seed(4)
    shard = np.asarray(run_sharded(h2, 20, 5, chain_mesh(8)))
    np.testing.assert_allclose(shard, ref, atol=1e-10)


def test_nuts_sharded_matches_unsharded():
    target = _gauss2()
    n1 = NUTS(target, init_det(16, 2), 0.8).seed(4)
    ref = np.asarray(n1.run(10, 10))
    n2 = NUTS(target, init_det(16, 2), 0.8).seed(4)
    shard = np.asarray(run_sharded(n2, 10, 10, chain_mesh(8)))
    np.testing.assert_allclose(shard, ref, atol=1e-8)


def test_nuts_static_backend_sharded_matches_unsharded():
    """The static-window schedule ([B, T, d] leaf stacks, one-hot Gram
    permutes) must be chain-shardable.  Position tolerance is ULP-scale,
    not exact: the fully-unrolled integration loop gives XLA 15 separate
    leapfrog bodies whose mul-add fusions can differ between the sharded
    and unsharded compiles (~5e-7 relative over this run).  Discrete
    outputs are immune to that float noise, so they are pinned EXACTLY:
    per-chain divergence counters, and the per-transition move/stay
    pattern (a stayed transition re-selects the initial leaf bitwise, so
    any sharding-induced U-turn/selection flip perturbs the pattern even
    where downstream positions drift back under the loose tolerance)."""
    target = _gauss2()
    n1 = NUTS(target, init_det(16, 2), 0.8, max_tree_depth=4, backend="static").seed(4)
    ref = np.asarray(n1.run(10, 10))
    n2 = NUTS(target, init_det(16, 2), 0.8, max_tree_depth=4, backend="static").seed(4)
    shard = np.asarray(run_sharded(n2, 10, 10, chain_mesh(8)))
    np.testing.assert_allclose(shard, ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(n2.divergences), np.asarray(n1.divergences)
    )
    moved_ref = (ref[:, 1:] != ref[:, :-1]).any(axis=-1)
    moved_shard = (shard[:, 1:] != shard[:, :-1]).any(axis=-1)
    np.testing.assert_array_equal(moved_shard, moved_ref)


def test_nuts_dim_sharded_2d_mesh():
    """Chains × dim 2-D mesh (4×2): the tensor-parallel analog for large-d
    targets.  XLA partitions the logp dot products with auto-inserted
    collectives; in f64 the short run must match the unsharded result
    (cross-shard reduction order only perturbs at machine epsilon)."""
    target = GaussianND(
        mean=jnp.zeros(8), cov=jnp.linspace(1.0, 3.0, 8).astype(jnp.float64)
    )
    inits = init_det(8, 8, dtype=jnp.float64)
    n1 = NUTS(target, inits, 0.8).seed(11)
    ref = np.asarray(n1.run(6, 6))
    n2 = NUTS(target, inits, 0.8).seed(11)
    mesh = make_mesh(4, 2)
    shard = np.asarray(run_sharded(n2, 6, 6, mesh, shard_dim=True))
    np.testing.assert_allclose(shard, ref, atol=1e-8)


def test_nuts_dim_sharded_with_adaptation_compiles():
    """Full warmup pipeline (Welford windows, mass refresh, ε re-search)
    under a 2-D mesh must compile and produce finite samples."""
    target = GaussianND(mean=jnp.zeros(8), cov=jnp.linspace(1.0, 3.0, 8))
    sampler = NUTS(
        target, init_det(8, 8), 0.8,
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal", start_buffer=5,
                                         end_buffer=5, initial_window=10),
    ).seed(11)
    shard = np.asarray(run_sharded(sampler, 5, 30, make_mesh(4, 2), shard_dim=True))
    assert shard.shape == (8, 5, 8)
    assert np.isfinite(shard).all()


def test_chees_sharded_matches_unsharded():
    """ChEES-HMC is the one sampler whose *adaptation* reduces across
    chains every warmup step (batch means/variances for the ChEES gradient
    and the metric), so sharding must reproduce those collectives.  f64
    keeps the cross-shard reduction-order noise far below the ⌈t/ε⌉
    leapfrog-count decision boundaries; positions then match to 1e-8."""
    from general_mcmc_tpu import ChEESHMC

    target = DiffableGaussian2D(
        mean=jnp.array([0.0, 1.0], jnp.float64),
        cov=jnp.array([[4.0, 2.0], [2.0, 3.0]], jnp.float64),
    )
    inits = init_det(16, 2, dtype=jnp.float64)
    c1 = ChEESHMC(target, inits, seed=4)
    ref = np.asarray(c1.run(12, 12))
    c2 = ChEESHMC(target, inits, seed=4)
    shard = np.asarray(run_sharded(c2, 12, 12, chain_mesh(8)))
    np.testing.assert_allclose(shard, ref, atol=1e-8)
    np.testing.assert_array_equal(
        np.asarray(c2.divergences), np.asarray(c1.divergences)
    )


def test_chees_static_collection_sharded_matches_unsharded():
    """The bench path: sharded warmup carry flowing into the unrolled
    static-collection program (the exact program split bench.py dispatches)
    must reproduce the unsharded chain — covers the analytic-gradient
    interior and the host read-back of adapted scalars from a sharded
    carry."""
    from general_mcmc_tpu import ChEESHMC
    from general_mcmc_tpu.core import run_kernel
    from general_mcmc_tpu.parallel.mesh import shard_carry

    target = GaussianND(
        mean=jnp.zeros(4), cov=jnp.linspace(1.0, 2.0, 4).astype(jnp.float64)
    )
    inits = init_det(16, 4, dtype=jnp.float64)

    def make():
        return ChEESHMC(
            target, inits, seed=5, static_collection=True, static_leapfrog=4
        )

    c1 = make()
    ref = np.asarray(c1.run(12, 12))
    c2 = make()
    c2._prepare_run(12, 12)
    carry = shard_carry(c2._init_carry(), chain_mesh(8))
    out = run_kernel(c2._step_fn, carry, 0, 12)
    samples = c2._run_static(out.carry, 12, 12)
    shard = np.asarray(jnp.swapaxes(samples, 0, 1))
    np.testing.assert_allclose(shard, ref, atol=1e-8)
    assert c2._static_L == c1._static_L


def test_chees_dim_sharded_2d_mesh():
    """chains × dim mesh: the [n, d] metric rows and the [d]-axis
    reductions (kinetic energy, ChEES norms) partition over ``dim`` with
    XLA-inserted collectives."""
    from general_mcmc_tpu import ChEESHMC

    target = GaussianND(
        mean=jnp.zeros(8), cov=jnp.linspace(1.0, 3.0, 8).astype(jnp.float64)
    )
    inits = init_det(8, 8, dtype=jnp.float64)
    c1 = ChEESHMC(target, inits, seed=11)
    ref = np.asarray(c1.run(8, 8))
    c2 = ChEESHMC(target, inits, seed=11)
    shard = np.asarray(run_sharded(c2, 8, 8, make_mesh(4, 2), shard_dim=True))
    np.testing.assert_allclose(shard, ref, atol=1e-8)


def test_pooled_rhat_sharded_matches_host():
    key = jax.random.key(0)
    n_chains, n_steps, p = 16, 40, 3
    draws = jax.random.normal(key, (n_chains, n_steps, p), jnp.float32)
    mean = jnp.mean(draws, axis=1)
    sm2 = jnp.var(draws, axis=1, ddof=1)
    mesh = chain_mesh(8)
    rhat_dev = np.asarray(pooled_rhat_sharded(mean, sm2, n_steps, mesh))
    stats = [
        ChainStats(jnp.asarray(n_steps), jnp.asarray(1.0), mean[i], sm2[i])
        for i in range(n_chains)
    ]
    # collect_rhat uses between-means/(c-1) without the n-scaling
    # (streaming variant); compute the within_and_var-style value here.
    gm = np.asarray(mean).mean(axis=0)
    within = np.asarray(sm2).mean(axis=0)
    between = ((np.asarray(mean) - gm) ** 2).sum(axis=0) * (n_steps / (n_chains - 1))
    var = within * (n_steps - 1) / n_steps + between / n_steps
    np.testing.assert_allclose(rhat_dev, np.sqrt(var / within), rtol=1e-5)


def test_tempering_sharded_matches_unsharded():
    from general_mcmc_tpu import ReplicaExchange, geometric_temperatures

    target = lambda x: -0.5 * jnp.sum(x * x)

    def make():
        return ReplicaExchange(
            target, init_det(16, 2), geometric_temperatures(4, 8.0)
        ).seed(2)

    ref = np.asarray(make().run(20, 5))
    sh = np.asarray(run_sharded(make(), 20, 5, chain_mesh()))
    np.testing.assert_array_equal(sh, ref)


def test_pin_device_guards():
    """core._pin_device gates the TPU entry-layout pin: it must decline on
    the CPU backend, on mesh-sharded carries, under tracing, and for
    non-2-D extracts — every case where the Format pin would be wrong
    (docs/BENCH_HISTORY.md round 4 "Store-layout pin")."""
    from general_mcmc_tpu.core import _pin_device
    from general_mcmc_tpu.samplers.base import _StepFn
    from general_mcmc_tpu.parallel import shard_carry

    step = _StepFn(lambda c, m: c, lambda c: c["pos"])
    carry = {"pos": jnp.zeros((16, 3)), "eps": jnp.zeros(()), "n": 7}

    # CPU backend (this suite): always None
    assert _pin_device(step, carry, 8) is None
    # n_collect == 0: None regardless of backend
    assert _pin_device(step, carry, 0) is None
    # sharded carry: every leaf spans 8 devices
    sharded = shard_carry(carry, chain_mesh(8))
    assert _pin_device(step, sharded, 8) is None
    # tracer leaves (nested-trace caller)
    jax.jit(lambda c: (_pin_device(step, c, 8) is None) or 1 / 0)(carry)
    # non-2-D extract
    step3 = _StepFn(lambda c, m: c, lambda c: c["pos"][None])
    assert _pin_device(step3, carry, 8) is None
