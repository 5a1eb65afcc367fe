#!/usr/bin/env python
"""Profile the static NUTS step on TPU and print the op-level time table.

Captures a jax.profiler trace of a few steady-state transitions and parses
the resulting xplane with tensorboard_plugin_profile to rank HLO ops by
self-time — the tool that localizes which phase of the static schedule
(integration / Gram / retro logic / epilogue) is burning the wall clock.

Env: GMT_EXP_CHAINS, GMT_EXP_DIM, GMT_EXP_DEPTH, GMT_EXP_EPS, GMT_EXP_STEPS.
"""

import glob
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

N = int(os.environ.get("GMT_EXP_CHAINS", 10_240))
DIM = int(os.environ.get("GMT_EXP_DIM", 100))
STEPS = int(os.environ.get("GMT_EXP_STEPS", 8))
DEPTH = int(os.environ.get("GMT_EXP_DEPTH", 4))
EPS = float(os.environ.get("GMT_EXP_EPS", 0.5))
TRACE_DIR = os.environ.get("GMT_TRACE_DIR", "/tmp/static_trace")


def _rank_from_trace_json():
    """Rank device ops by total duration from the .trace.json.gz capture —
    the path that works on this image (the xplane→op-stats converter's
    upb protobuf crashes).  Wrapper `while.*` rows are skipped so per-op
    rows are visible; divide totals by the step count for per-step cost."""
    import collections
    import gzip
    import json

    paths = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        print("no trace.json.gz captured", file=sys.stderr)
        return
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    tot, cnt = collections.Counter(), collections.Counter()
    for e in d.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and e.get("args", {}).get("hlo_category"):
            n = e.get("name", "?")
            if n.startswith("while."):
                continue
            tot[n] += e["dur"]
            cnt[n] += 1
    print(f"{'total_ms':>10}  {'count':>7}  op")
    for name, us in tot.most_common(40):
        print(f"{us / 1000:10.2f}  {cnt[name]:7d}  {name[:100]}")


def main():
    from general_mcmc_tpu import init_with_seed
    from general_mcmc_tpu.ops.static_tree import static_nuts_step

    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)

    def logp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    vg = jax.value_and_grad(logp)
    pos = init_with_seed(N, DIM, 0).astype(jnp.float32)
    lp, grad = jax.vmap(vg)(pos)
    inv = jnp.broadcast_to(scales**2, (N, DIM))
    mscale = jnp.broadcast_to(1.0 / scales, (N, DIM))
    eps = jnp.full((N,), EPS, jnp.float32)

    @jax.jit
    def many(pos, lp, grad):
        def body(carry, k):
            p, l, g = carry
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(3), k), N)
            r = static_nuts_step(keys, p, l, g, eps, inv, mscale, vg, DEPTH)
            return (r.pos, r.lp, r.grad), jnp.sum(r.depth)

        (p, l, g), ds = jax.lax.scan(body, (pos, lp, grad), jnp.arange(STEPS))
        return p, jnp.sum(ds)

    lp = lp.astype(jnp.float32)
    grad = grad.astype(jnp.float32)
    out = jax.block_until_ready(many(pos, lp, grad))  # compile + warm
    print("warm run done", file=sys.stderr)
    with jax.profiler.trace(TRACE_DIR):
        out = jax.block_until_ready(many(pos, lp, grad))

    # -- parse the xplane: rank ops by self time ---------------------------
    paths = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("no xplane captured", file=sys.stderr)
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [paths[-1]], "framework_op_stats", {"tqx": "out:csv;"}
        )
    except Exception as e:  # noqa: BLE001 — converter crashes (protobuf) on this image
        print(f"xplane converter unavailable ({type(e).__name__}); "
              "falling back to trace.json.gz", file=sys.stderr)
        _rank_from_trace_json()
        return
    out_csv = os.path.join(TRACE_DIR, "op_stats.csv")
    if isinstance(data, bytes):
        data = data.decode()
    with open(out_csv, "w") as f:
        f.write(data)
    import csv as _csv
    import io

    rows = list(_csv.reader(io.StringIO(data)))
    if not rows:
        print("empty op stats", file=sys.stderr)
        return
    hdr = rows[0]
    print("columns:", hdr, file=sys.stderr)

    def col(name):
        for i, h in enumerate(hdr):
            if name.lower() in h.lower():
                return i
        return None

    i_name = col("operation") if col("operation") is not None else col("op_name")
    i_self = col("total_self_time")
    i_type = col("type")
    body = rows[1:]
    try:
        body.sort(key=lambda r: -float(r[i_self]))
    except (TypeError, ValueError, IndexError):
        pass
    print(f"{'self_time':>12}  {'type':<24} op")
    for r in body[:40]:
        try:
            print(f"{float(r[i_self]):12.3f}  {r[i_type]:<24} {r[i_name][:110]}")
        except (TypeError, ValueError, IndexError):
            print(r[:6])


if __name__ == "__main__":
    main()
