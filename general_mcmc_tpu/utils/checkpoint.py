"""Sampler checkpoint/resume.

The reference acknowledges this as missing — ``// TODO: Somehow save state
of the chains and enable continuing runs`` (core.rs:177).  Here the entire
sampler state (positions, log-densities, adaptation state, RNG keys) is a
pytree of arrays, so checkpointing is a flatten + savez: PRNG key arrays are
serialized via ``jax.random.key_data`` and re-wrapped on load.
"""

from __future__ import annotations

import io
import pickle

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_carry", "load_carry"]

_KEY_MARK = "__prng_key__:"


def _is_key(leaf) -> bool:
    return isinstance(leaf, jax.Array) and jnp.issubdtype(
        leaf.dtype, jax.dtypes.prng_key
    )


def save_carry(carry, path: str) -> None:
    """Serialize a sampler carry pytree to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(carry)
    arrays = {}
    kinds = []
    for i, leaf in enumerate(leaves):
        if _is_key(leaf):
            arrays[f"leaf_{i}"] = np.asarray(jax.random.key_data(leaf))
            kinds.append(str(jax.random.key_impl(leaf)))
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
            kinds.append("")
    buf = io.BytesIO()
    pickle.dump({"treedef": treedef, "kinds": kinds}, buf)
    arrays["__meta__"] = np.frombuffer(buf.getvalue(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_carry(path: str):
    """Load a carry pytree saved by :func:`save_carry`."""
    data = np.load(path, allow_pickle=False)
    meta = pickle.loads(data["__meta__"].tobytes())
    treedef, kinds = meta["treedef"], meta["kinds"]
    leaves = []
    for i, kind in enumerate(kinds):
        arr = data[f"leaf_{i}"]
        if kind:
            leaves.append(jax.random.wrap_key_data(jnp.asarray(arr), impl=kind))
        else:
            leaves.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, leaves)
