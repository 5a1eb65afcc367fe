"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without real hardware by forcing the host
platform to expose 8 virtual devices — the analog of the reference testing
chain-parallel correctness at several n_chains values (SURVEY.md §4).
float64 is enabled so golden-value tests can match the reference's f64 paths;
samplers themselves remain dtype-generic (f32 by default on TPU).
"""

import os
import sys

_TPU_MODE = os.environ.get("GMT_TESTS_TPU") == "1"

if not _TPU_MODE:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _TPU_MODE:
    # The TPU-tunnel plugin (axon sitecustomize) force-selects its backend
    # with jax.config.update at interpreter startup; override back to CPU.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# GMT_TESTS_TPU=1 = hardware-validation mode: keep the sitecustomize's TPU
# backend and leave x64 off (f64 silently degrades on TPU; golden tests are
# CPU-only — run only the TPU-marked selections in this mode, serialized
# with anything else using the single-client tunnel).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
