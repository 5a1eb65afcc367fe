"""Numerical-safety helpers.

The reference relies on Rust's type system for safety and has no NaN
tooling (SURVEY.md §5 "race detection / sanitizers").  In a pure-functional
JAX sampler the corresponding hazard is numerical: non-finite log-densities
or gradients silently poisoning a chain.  These helpers give samplers a
cheap post-hoc audit and an opt-in traced guard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["validate_sample", "guard_finite"]


def validate_sample(samples, name: str = "sample") -> None:
    """Raise with a per-chain report if any collected state is non-finite.

    ``samples``: [chains, steps, dim].
    """
    finite = jnp.all(jnp.isfinite(samples), axis=(1, 2))
    if bool(jnp.all(finite)):
        return
    bad = [int(i) for i in jnp.nonzero(~finite)[0]]
    raise FloatingPointError(
        f"{name}: non-finite states in chains {bad} "
        f"({len(bad)}/{samples.shape[0]} chains affected)"
    )


def guard_finite(x, what: str = "value"):
    """Traced NaN/Inf guard: debug-prints the first offending batch inside
    jit (jax.debug.print has no effect when everything is finite)."""
    ok = jnp.all(jnp.isfinite(x))
    jax.lax.cond(
        ok,
        lambda: None,
        lambda: jax.debug.print("WARNING: non-finite {} detected", what),
    )
    return x
