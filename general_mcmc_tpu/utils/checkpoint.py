"""Sampler checkpoint/resume.

The reference acknowledges this as missing — ``// TODO: Somehow save state
of the chains and enable continuing runs`` (core.rs:177).  Here the entire
sampler state (positions, log-densities, adaptation state, RNG keys) is a
pytree of arrays, so checkpointing is a flatten + savez: PRNG key arrays are
serialized via ``jax.random.key_data`` and re-wrapped on load.

The pytree *structure* is stored as a JSON description (dict/list/tuple/
NamedTuple nodes), not a pickle: loading a checkpoint therefore never
executes pickle opcodes.  NamedTuple nodes are rebuilt by importing their
class by module+qualname and verifying it actually is a NamedTuple type —
loading can import a module present in the environment but cannot run
attacker-chosen code the way ``pickle.loads`` can.
"""

from __future__ import annotations

import importlib
import json

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_carry", "load_carry"]


def _describe(node, leaves_out: list) -> dict:
    """Recursively describe a pytree's structure, appending leaves in
    flatten order to ``leaves_out``.  Supports the node types sampler
    carries actually use: dict, list, tuple, NamedTuple, None, leaf."""
    if node is None:
        return {"t": "none"}
    if isinstance(node, dict):
        keys = list(node.keys())
        if any(not isinstance(k, str) for k in keys):
            raise TypeError("checkpoint dict keys must be strings")
        return {
            "t": "dict",
            "keys": keys,
            "children": [_describe(node[k], leaves_out) for k in keys],
        }
    if isinstance(node, tuple) and hasattr(node, "_fields"):
        cls = type(node)
        return {
            "t": "namedtuple",
            "module": cls.__module__,
            "qualname": cls.__qualname__,
            "children": [_describe(c, leaves_out) for c in node],
        }
    if isinstance(node, (list, tuple)):
        return {
            "t": "list" if isinstance(node, list) else "tuple",
            "children": [_describe(c, leaves_out) for c in node],
        }
    leaves_out.append(node)
    return {"t": "leaf"}


def _resolve_namedtuple(module: str, qualname: str):
    obj = importlib.import_module(module)
    for part in qualname.split("."):
        obj = getattr(obj, part)
    if not (isinstance(obj, type) and issubclass(obj, tuple) and hasattr(obj, "_fields")):
        raise TypeError(f"{module}.{qualname} is not a NamedTuple type")
    return obj


def _rebuild(desc: dict, leaves: list):
    t = desc["t"]
    if t == "none":
        return None
    if t == "leaf":
        return leaves.pop(0)
    children = [_rebuild(c, leaves) for c in desc["children"]]
    if t == "dict":
        return dict(zip(desc["keys"], children))
    if t == "namedtuple":
        return _resolve_namedtuple(desc["module"], desc["qualname"])(*children)
    if t == "list":
        return children
    if t == "tuple":
        return tuple(children)
    raise ValueError(f"unknown checkpoint node type {t!r}")


def _is_key(leaf) -> bool:
    return isinstance(leaf, jax.Array) and jnp.issubdtype(
        leaf.dtype, jax.dtypes.prng_key
    )


def save_carry(carry, path: str) -> str:
    """Serialize a sampler carry pytree to ``path`` (.npz).

    Writes through an open file handle so the on-disk name is exactly
    ``path`` (``np.savez(str)`` would silently append ``.npz``, making
    ``save_carry('state'); load_carry('state')`` fail).  Returns ``path``.
    """
    leaves: list = []
    structure = _describe(carry, leaves)
    arrays = {}
    kinds = []
    for i, leaf in enumerate(leaves):
        if _is_key(leaf):
            arrays[f"leaf_{i}"] = np.asarray(jax.random.key_data(leaf))
            kinds.append(str(jax.random.key_impl(leaf)))
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
            kinds.append("")
    meta = json.dumps({"structure": structure, "kinds": kinds})
    arrays["__meta__"] = np.frombuffer(meta.encode("utf-8"), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    return path


def load_carry(path: str):
    """Load a carry pytree saved by :func:`save_carry`."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(data["__meta__"].tobytes().decode("utf-8"))
    structure, kinds = meta["structure"], meta["kinds"]
    leaves = []
    for i, kind in enumerate(kinds):
        arr = data[f"leaf_{i}"]
        if kind:
            leaves.append(jax.random.wrap_key_data(jnp.asarray(arr), impl=kind))
        else:
            leaves.append(jnp.asarray(arr))
    return _rebuild(structure, leaves)
