#!/usr/bin/env python
"""Profile the post-warmup ChEES-HMC step on TPU; print the op time table.

Same tooling as profile_static.py (trace.json.gz ranking — the xplane
converter crashes on this image): scans GMT_EXP_STEPS frozen-adaptation
transitions at the bench shape and ranks HLO ops by total duration, to
localize the fixed per-step overhead (the sweep showed wall ~invariant to
grads/draw, so the leapfrog loop is NOT the bottleneck).

Env: GMT_EXP_CHAINS, GMT_EXP_DIM, GMT_EXP_STEPS, GMT_EXP_EPS, GMT_EXP_T.
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

N = int(os.environ.get("GMT_EXP_CHAINS", 10_240))
DIM = int(os.environ.get("GMT_EXP_DIM", 100))
STEPS = int(os.environ.get("GMT_EXP_STEPS", 16))
EPS = float(os.environ.get("GMT_EXP_EPS", 0.33))
T_MAX = float(os.environ.get("GMT_EXP_T", 1.83))
# GMT_EXP_STATIC=L: profile the static-collection step (trace-constant L
# unrolled integration, eps-jitter) instead of the adaptive frozen step —
# the bench champion's program (L=10 at the champion config).
STATIC_L = int(os.environ.get("GMT_EXP_STATIC", 0))
# GMT_EXP_STORE=1: profile the REAL collection program (run_kernel with the
# [steps, B, d] sample store) instead of the scalar-output scan — the phase
# breakdown (exp_chees_phases.py) showed 311 us/draw end-to-end vs 65 us
# for the storeless scan, so the store dominates and must be ranked.
STORE = os.environ.get("GMT_EXP_STORE") == "1"
TRACE_DIR = os.environ.get("GMT_TRACE_DIR", "/tmp/chees_trace")


def _rank_from_trace_json():
    paths = sorted(
        glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        print("no trace.json.gz captured", file=sys.stderr)
        return
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    tot, cnt = collections.Counter(), collections.Counter()
    wtot = collections.Counter()
    for e in d.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and e.get("args", {}).get("hlo_category"):
            n = e.get("name", "?")
            if n.startswith("while."):
                # wrapper rows: their duration minus the contained body ops
                # is the loop's scheduling overhead
                wtot[n] += e["dur"]
                continue
            tot[n] += e["dur"]
            cnt[n] += 1
    for name, us in wtot.most_common(5):
        print(f"WHILE wrapper {name[:80]}: {us / STEPS:.1f} us/step")
    print(f"device ops total: {sum(tot.values()) / STEPS:.1f} us/step")
    print(f"{'total_us':>10}  {'us/step':>8}  {'count':>6}  op")
    for name, us in tot.most_common(45):
        print(f"{us:10.0f}  {us / STEPS:8.1f}  {cnt[name]:6d}  {name[:100]}")


def main():
    from general_mcmc_tpu import ChEESHMC, GaussianND, init_with_seed

    scales = jnp.exp(jnp.linspace(0.0, jnp.log(10.0), DIM)).astype(jnp.float32)
    target = GaussianND(mean=jnp.zeros(DIM, jnp.float32), cov=scales)
    sampler = ChEESHMC(
        target,
        init_with_seed(N, DIM, 0),
        step_size=EPS,
        trajectory_length=T_MAX,
        jitter_amount=0.5,
        seed=0,
    )
    # frozen adaptation: n_discard=0 — the collection-phase program
    sampler._prepare_run(0, 0)
    step_fn = (
        sampler._static_collect_step(STATIC_L) if STATIC_L else sampler._step_fn
    )
    carry = sampler._init_carry()
    # realistic adapted metric
    carry["mass_inv"] = jnp.broadcast_to(scales**2, (N, DIM))

    if STORE:
        from general_mcmc_tpu.core import run_kernel

        wrapped = sampler._make_step_fn(step=step_fn)

        def many(carry):
            out = run_kernel(wrapped, carry, STEPS, 0)
            return out.carry, out.samples

    else:

        @jax.jit
        def many(carry):
            def body(c, m):
                c = step_fn(c, m)
                return c, c["lp"][0]
            return jax.lax.scan(body, carry, jnp.arange(STEPS))

    out = jax.block_until_ready(many(carry))
    t0 = time.perf_counter()
    out = jax.block_until_ready(many(carry))
    wall = time.perf_counter() - t0
    print(f"warm: {wall * 1e6 / STEPS:.0f} us/step ({STEPS} steps)", file=sys.stderr)
    with jax.profiler.trace(TRACE_DIR):
        out = jax.block_until_ready(many(carry))
    _rank_from_trace_json()


if __name__ == "__main__":
    main()
