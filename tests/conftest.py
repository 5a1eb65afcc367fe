"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without real hardware by forcing the host
platform to expose 8 virtual devices — the analog of the reference testing
chain-parallel correctness at several n_chains values (SURVEY.md §4).
float64 is enabled so golden-value tests can match the reference's f64 paths;
samplers themselves remain dtype-generic (f32 by default on TPU).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The TPU-tunnel plugin (axon sitecustomize) force-selects its backend with
# jax.config.update at interpreter startup; override it back to CPU here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
