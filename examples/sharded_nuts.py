"""Multi-chip NUTS: chains sharded over a device mesh.

Demonstrates the scale-out path (SURVEY.md §2.1's TPU equivalents): chains
ride a ``chains`` mesh axis with communication-free SPMD sampling, and the
pooled R-hat reduces per-chain moments with an explicit ``psum`` over the
interconnect.  Run under a real multi-chip topology, or virtually:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
        python examples/sharded_nuts.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import NUTS, GaussianND, NUTSMassMatrixConfig, init_with_seed
from general_mcmc_tpu.parallel import chain_mesh, pooled_rhat_sharded, run_sharded


def main(n_chains=512, dim=16, n_collect=200, n_warmup=200, seed=0):
    mesh = chain_mesh()
    n_dev = mesh.devices.size
    n_chains -= n_chains % n_dev  # chains must tile the mesh
    print(f"mesh: {n_dev} device(s), {n_chains} chains")

    scales = jnp.exp(jnp.linspace(0.0, jnp.log(5.0), dim)).astype(jnp.float32)
    target = GaussianND(mean=jnp.zeros(dim, jnp.float32), cov=scales)
    sampler = NUTS(
        target,
        init_with_seed(n_chains, dim, seed),
        mass_config=NUTSMassMatrixConfig(adaptation="diagonal", start_buffer=50,
                                         end_buffer=25, initial_window=25),
        seed=seed,
    )
    sample = run_sharded(sampler, n_collect, n_warmup, mesh)
    print(f"samples: {sample.shape}, sharding: {sample.sharding}")

    # Cross-device pooled R-hat from per-chain sufficient statistics.
    mean = jnp.mean(sample, axis=1)
    sm2 = jnp.var(sample, axis=1, ddof=1)
    rhat = pooled_rhat_sharded(mean, sm2, n_collect, mesh)
    print(f"pooled R-hat (psum over mesh): max={float(jnp.max(rhat)):.4f}")
    assert np.isfinite(np.asarray(sample)).all()
    return sample


if __name__ == "__main__":
    main()
