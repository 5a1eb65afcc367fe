"""Progress subsystem tests (utils/progress.py + the run_progress plumbing)."""

import io
import re

import jax.numpy as jnp

from general_mcmc_tpu import Gaussian2D, IsotropicGaussian, MetropolisHastings, init_det
from general_mcmc_tpu.diagnostics.stats import MultiChainTracker
from general_mcmc_tpu.utils.progress import ProgressRenderer


def test_renderer_draws_bars_and_stats():
    buf = io.StringIO()
    r = ProgressRenderer(n_chains=3, total_steps=100, stream=buf, min_interval=0.0)
    tracker = MultiChainTracker(3, 2)
    tracker.step(jnp.ones((3, 2)))
    tracker.step(2.0 * jnp.ones((3, 2)))
    r.update(50, tracker)
    r.update(100, tracker)
    r.close()
    out = buf.getvalue()
    assert "Global" in out
    assert "Chain 0" in out and "Chain 2" in out
    assert "p(accept)" in out and "max(rhat)" in out
    # global bar shows chain-aggregated progress (reference semantics:
    # global total = n_chains * total, core.rs:436)
    assert re.search(r"150/300", out)
    assert re.search(r"300/300", out)


def test_renderer_caps_chain_bars():
    buf = io.StringIO()
    r = ProgressRenderer(n_chains=100, total_steps=10, stream=buf, min_interval=0.0)
    r.update(10, None)
    out = buf.getvalue()
    assert "Chain 4" in out and "Chain 5" not in out  # ≤5 bars (core.rs:440)


def test_run_progress_renders(capsys):
    target = Gaussian2D(mean=jnp.zeros(2), cov=jnp.eye(2))
    mh = MetropolisHastings(target, IsotropicGaussian(1.0), init_det(2, 2)).seed(1)
    sample, stats = mh.run_progress(50, 10, progress=True)
    err = capsys.readouterr().err
    assert "Global" in err
    assert sample.shape == (2, 50, 2)
