"""Driver-artifact contract tests for bench.py.

The driver parses bench.py's stdout: one JSON object per line with
``metric/value/unit/vs_baseline``, and the LAST line must be the
(best) headline-workload measurement — the stretch-workload line is
emitted between headline prints precisely so a mid-logistic death never
changes the final line's meaning.  Rounds 1–2 produced no artifact at
all (rc=124, OOM), so this contract is load-bearing; these tests run the
real script as a subprocess at tiny CPU shapes.

The diagnostics retry/fallback test covers the round-4 rehearsal
incident: the remote tunnel's compile helper failed STICKILY
(``ValueError: INVALID_ARGUMENT: TPU backend error`` three times, 20 s
apart) for a program that ran cleanly standalone minutes earlier, which
silently dropped the logistic JSON line.  The fallback computes the same
diagnostics on the host CPU backend when the sample is small enough to
transfer (docs/BENCH_HISTORY.md round 4).
"""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TINY_ENV = {
    "GMT_BENCH_PLATFORM": "cpu",
    "JAX_PLATFORMS": "cpu",
    "GMT_BENCH_CHAINS": "64",
    "GMT_BENCH_DIM": "16",
    "GMT_BENCH_COLLECT": "128",
    "GMT_BENCH_WARMUP": "64",
    "GMT_BENCH_CHEES_L": "4",
    "GMT_BENCH_LOGISTIC_WARMUP": "96",
    "GMT_BENCH_LOGISTIC_COLLECT": "96",
}


def _run_bench(extra_env):
    env = dict(os.environ, **_TINY_ENV, **extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, cwd=_REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    assert lines, proc.stderr[-3000:]
    for payload in lines:
        assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
        assert payload["unit"] == "ESS/s"
        assert payload["value"] > 0
        # rounded to 2 decimals — tiny CPU-smoke shapes can round to 0.0
        assert payload["vs_baseline"] >= 0
        assert "max R-hat" in payload["metric"]
    return lines, proc.stderr


def test_headline_contract():
    """Headline-only run: progressive output, final line is the best
    (warm) headline measurement of the headline workload."""
    lines, _ = _run_bench({"GMT_BENCH_SKIP_LOGISTIC": "1"})
    assert len(lines) >= 2  # [incl. compile] line + at least one warm rep
    assert "[incl. compile]" in lines[0]["metric"]
    last = lines[-1]
    assert "Gaussian" in last["metric"]
    assert "[incl. compile]" not in last["metric"]
    # warm measurement must not be slower than the compile-inclusive one
    assert last["value"] >= lines[0]["value"]


@pytest.mark.slow
def test_two_workload_contract():
    """Full default output: the logistic stretch line is present and the
    headline is re-printed LAST (the driver parses the final line)."""
    lines, _ = _run_bench({})
    logistic = [l for l in lines if "logistic" in l["metric"]]
    assert len(logistic) == 1
    assert "[stretch workload]" in logistic[0]["metric"]
    # its own baseline denominator (CPU_BASELINE.json "logistic"), not the
    # Gaussian's
    with open(os.path.join(_REPO, "docs", "CPU_BASELINE.json")) as f:
        ref = json.load(f)["logistic"]["min_ess_per_sec"]
    # vs_baseline is rounded to 2 decimals in the payload; at tiny CPU
    # smoke scale the rounding dominates, so allow half a rounding unit
    assert logistic[0]["vs_baseline"] == pytest.approx(
        logistic[0]["value"] / ref, rel=0.05, abs=0.006
    )
    assert "Gaussian" in lines[-1]["metric"]
    # the re-printed headline is byte-identical to the best headline line
    headline = [
        l for l in lines[:-1]
        if "Gaussian" in l["metric"] and "[incl. compile]" not in l["metric"]
    ]
    assert lines[-1] == headline[-1]


def test_diagnostics_retry_falls_back_to_cpu(monkeypatch):
    """Sticky TPU-side failures must not lose the measurement: after the
    retries are exhausted the fallback recomputes on the host CPU backend
    and returns identical statistics."""
    import bench
    import general_mcmc_tpu.diagnostics.stats as stats

    real = stats.split_rhat_mean_ess
    calls = {"n": 0}

    def flaky(sample, **kw):
        calls["n"] += 1
        if calls["n"] <= 3:
            raise ValueError("INVALID_ARGUMENT: TPU backend error")
        return real(sample, **kw)

    monkeypatch.setattr(stats, "split_rhat_mean_ess", flaky)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((64, 32, 4)).astype(np.float32)
    )
    out = bench._diagnostics_with_retry(x, tries=3)
    assert calls["n"] == 4  # 3 TPU-path failures + the CPU fallback call
    ref = real(x, steps_major=True, return_moments=True)
    for a, b in zip(out, ref):
        assert jnp.allclose(a, b)

    # over the transfer-size gate the original error must propagate
    calls["n"] = 0
    monkeypatch.setattr(bench, "_CPU_DIAG_MAX_BYTES", 10)
    with pytest.raises(ValueError, match="TPU backend error"):
        bench._diagnostics_with_retry(x, tries=2)


def test_rank_gate_falls_back_to_cpu_prefix(monkeypatch, capsys):
    """Round-5 incident: BOTH driver-style rehearsals lost the
    rank-normalized gate line to the sticky compile-helper flake, and the
    on-device retries (even with executable-cache clears) never cleared
    it.  The gate's final rung therefore computes the summary on a
    host-CPU steps-prefix pulled over the chunked D2H path; it must print
    a labeled gate line with the correct statistics instead of giving up."""
    import bench
    import general_mcmc_tpu.diagnostics.stats as stats

    real = stats.rank_normalized_summary
    calls = {"n": 0}

    def flaky(sample, **kw):
        calls["n"] += 1
        if calls["n"] <= 3:
            raise RuntimeError("INTERNAL: remote_compile: HTTP 500")
        return real(sample, **kw)

    monkeypatch.setattr(stats, "rank_normalized_summary", flaky)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((64, 16, 3)).astype(np.float32)
    )
    bench._rank_gate(x)
    err = capsys.readouterr().err
    assert calls["n"] == 4  # 3 on-device failures + the CPU fallback call
    assert "rank-normalized gate (host CPU, first" in err
    assert "max R-hat" in err

    # the happy path prints the plain gate line on the first attempt
    calls["n"] = 10
    bench._rank_gate(x)
    err = capsys.readouterr().err
    assert "rank-normalized gate: max R-hat" in err
