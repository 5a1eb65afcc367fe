"""Counter-based RNG utilities.

The Rust reference derives per-chain determinism from integer seed arithmetic
(``chain_seed = 1 + seed + i`` in metropolis_hastings.rs:189-197, ``seed + i``
in gibbs.rs:179-188, ``seed + i + 1`` in generic_nuts.rs:550-556).  The
TPU-native equivalent is JAX's counter-based Threefry: one global key per
sampler, per-chain keys via ``jax.random.fold_in(key, chain_index)``, and
per-step keys via ``fold_in(chain_key, step)``.  This gives the same property
the reference wants (deterministic, independent per-chain streams derived from
one global seed) while staying fully on-device and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["as_key", "chain_keys", "step_key", "split_n"]


def as_key(seed_or_key) -> jax.Array:
    """Coerce an int seed or an existing PRNG key to a PRNG key."""
    if isinstance(seed_or_key, jax.Array) and jnp.issubdtype(
        seed_or_key.dtype, jax.dtypes.prng_key
    ):
        return seed_or_key
    return jax.random.key(int(seed_or_key))


def chain_keys(key: jax.Array, n_chains: int) -> jax.Array:
    """Derive ``n_chains`` independent per-chain keys from a global key.

    Mirrors the reference's per-chain seed derivation (seed + chain index)
    with collision-free Threefry fold_in.
    """
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_chains))


def step_key(key: jax.Array, step) -> jax.Array:
    """Per-step key derived from a (per-chain) key and a step counter."""
    return jax.random.fold_in(key, step)


def split_n(key: jax.Array, n: int):
    """Split a key into ``n`` subkeys, returned as a tuple."""
    keys = jax.random.split(key, n)
    return tuple(keys[i] for i in range(n))
