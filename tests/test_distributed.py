"""Multi-host recipe helpers, validated single-process on the virtual mesh.

A real cluster is unavailable (the reference has no cluster dimension
either); what *is* testable is every property the recipe relies on:
idempotent/no-op initialization outside clusters, a global mesh covering
all devices, and layout-invariant process-local initialization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_mcmc_tpu.parallel import (
    chain_mesh,
    global_chain_mesh,
    init_positions_on_mesh,
    initialize,
)
from general_mcmc_tpu.parallel.distributed import _row_keys

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_initialize_noop_single_process(monkeypatch):
    from general_mcmc_tpu.parallel.distributed import _CLUSTER_ENV_VARS

    for v in _CLUSTER_ENV_VARS:
        monkeypatch.delenv(v, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")  # single-host VM
    assert initialize() is False
    assert not jax.distributed.is_initialized()


def test_global_mesh_covers_all_devices():
    mesh = global_chain_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("chains",)


def _reference_rows(n_chains, dim, seed):
    keys = _row_keys(seed, 0, n_chains)
    return np.asarray(
        jax.vmap(lambda k: jax.random.normal(k, (dim,), jnp.float32))(keys)
    )


def test_init_positions_layout_invariant():
    """The same global array regardless of how many shards build it."""
    ref = _reference_rows(64, 5, seed=3)
    for n_dev in (1, 2, 8):
        mesh = chain_mesh(n_dev)
        arr = init_positions_on_mesh(64, 5, seed=3, mesh=mesh)
        assert arr.shape == (64, 5)
        np.testing.assert_array_equal(np.asarray(arr), ref)


def test_init_positions_uneven_chains_clear_error():
    with pytest.raises(ValueError, match="divisible"):
        init_positions_on_mesh(100, 3, seed=1, mesh=global_chain_mesh())


def test_init_positions_sharded_and_usable():
    mesh = global_chain_mesh()
    arr = init_positions_on_mesh(32, 4, seed=0, mesh=mesh)
    # committed to the mesh, chains axis split over all devices
    assert len(arr.sharding.device_set) == len(jax.devices())
    assert arr.addressable_shards[0].data.shape == (4, 4)

    from general_mcmc_tpu import GaussianND, MetropolisHastings, IsotropicGaussian
    from general_mcmc_tpu.parallel import run_sharded

    target = GaussianND(mean=jnp.zeros(4), cov=jnp.ones(4))
    mh = MetropolisHastings(target, IsotropicGaussian(1.0), arr).seed(1)
    out = run_sharded(mh, 10, 5, mesh)
    assert out.shape == (32, 10, 4)
    assert np.isfinite(np.asarray(out)).all()
