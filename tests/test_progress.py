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


def test_renderer_per_chain_p_accept():
    """Chain bars carry *per-chain* acceptance (core.rs:288-306), not a
    cosmetic copy of the global stat — each bar shows its own value and the
    values update between draws."""
    buf = io.StringIO()
    r = ProgressRenderer(n_chains=3, total_steps=10, stream=buf, min_interval=0.0)
    tracker = MultiChainTracker(3, 2)
    # chain 0 rejects (state frozen), chains 1-2 accept every step
    tracker.step(jnp.asarray([[1.0, 1.0], [1.0, 1.0], [2.0, 2.0]]))
    tracker.step(jnp.asarray([[1.0, 1.0], [3.0, 1.0], [4.0, 2.0]]))
    r.update(5, tracker)
    first = buf.getvalue()
    chain_lines = [l for l in first.splitlines() if l.startswith("Chain")]
    vals = [re.search(r"p\(accept\)≈([\d.]+)", l) for l in chain_lines]
    assert all(v is not None for v in vals)
    assert float(vals[0].group(1)) < float(vals[1].group(1))  # 0 rejects
    assert vals[1].group(1) == vals[2].group(1)
    # acceptance moves when chain 0 starts accepting (enough steps for the
    # EWMA to cross the 2-decimal display resolution: 0.99 -> 1.00)
    for _ in range(150):
        tracker.step(tracker._state.last_state + 1.0)
    buf2 = io.StringIO()
    r2 = ProgressRenderer(n_chains=3, total_steps=10, stream=buf2, min_interval=0.0)
    r2.update(9, tracker)
    lines2 = [l for l in buf2.getvalue().splitlines() if l.startswith("Chain")]
    v0_new = float(re.search(r"p\(accept\)≈([\d.]+)", lines2[0]).group(1))
    assert v0_new > float(vals[0].group(1))


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


def _mh(n_chains=4):
    target = Gaussian2D(mean=jnp.zeros(2), cov=jnp.eye(2))
    return MetropolisHastings(target, IsotropicGaussian(1.0), init_det(n_chains, 2))


def test_stream_mode_matches_run_exactly():
    """The io_callback path must not perturb the sampling stream: identical
    samples to a plain run, including a non-multiple-of-stride tail."""
    import numpy as np

    ref = np.asarray(_mh().seed(7).run(75, 33))
    sample, stats = _mh().seed(7).run_progress(75, 33, progress=False, mode="stream")
    np.testing.assert_array_equal(np.asarray(sample), ref)


def test_stream_mode_hook_cadence_and_values(capsys):
    """Ticks arrive in order at the stride cadence with finite stats."""
    from general_mcmc_tpu.core import run_kernel_progress_stream

    mh = _mh().seed(2)
    mh._prepare_run(100, 60)
    ticks = []
    out = run_kernel_progress_stream(
        mh._step_fn, mh._init_carry(), 100, 60,
        lambda done, rhat, pacc, start, pchain: ticks.append(
            (int(done), float(rhat), float(pacc), int(start), pchain)
        ),
        stride=64,
    )
    assert out.samples.shape == (100, 4, 2)
    # burn phase (60 steps) emits at its boundary; collect phase chunks at
    # the stride with a remainder tick at the end of the run
    assert [t[0] for t in ticks] == [60, 124, 160]
    last = ticks[-1]
    assert 0.5 < last[1] < 3.0  # plausible R-hat
    assert 0.0 <= last[2] <= 1.0  # acceptance in [0, 1]


def test_single_step_runstats_nan_not_crash():
    """A 1-step collection yields NaN diagnostics (the reference's f64
    division-by-zero semantics, stats.rs:456-504), not ZeroDivisionError."""
    import numpy as np

    sample, stats = _mh().seed(1).run_progress(1, 3, progress=False, mode="stream")
    assert sample.shape == (4, 1, 2)
    assert np.isnan(stats.rhat.mean)  # BasicStats over all-NaN R-hats


def test_stream_mode_renders(capsys):
    sample, stats = _mh(2).seed(1).run_progress(50, 10, progress=True, mode="stream")
    err = capsys.readouterr().err
    assert "Global" in err and "max(rhat)" in err
    assert sample.shape == (2, 50, 2)


def test_stream_mode_int_states():
    """Integer-state samplers work in stream mode (tracker tracks in f32,
    exactly like the chunked MultiChainTracker path)."""
    from general_mcmc_tpu import Poisson
    from general_mcmc_tpu.samplers.metropolis_hastings import DiscreteWalkProposal

    mh = MetropolisHastings(
        Poisson(4.0), DiscreteWalkProposal(), jnp.full((4, 1), 4, jnp.int32)
    ).seed(1)
    s, stats = mh.run_progress(80, 20, progress=False, mode="stream")
    assert s.shape == (4, 80, 1)
    assert s.dtype == jnp.int32


def test_stream_mode_p_accept_matches_chunked():
    """Stream-mode acceptance stats mirror the chunked tracker (same init,
    same fold), and are sane from the first tick (no -1 sentinel decay)."""
    from general_mcmc_tpu.core import run_kernel_progress_stream
    from general_mcmc_tpu.diagnostics.stats import MultiChainTracker

    mh = _mh().seed(4)
    mh._prepare_run(64, 0)
    ticks = []
    out = run_kernel_progress_stream(
        mh._step_fn, mh._init_carry(), 64, 0,
        lambda done, rhat, pacc, start, pchain: ticks.append(
            (int(done), float(pacc), (int(start), pchain))
        ),
        stride=64,
    )
    tracker = MultiChainTracker(4, 2)
    tracker.step_batch(out.samples)
    assert ticks[0][0] == 64
    assert abs(ticks[0][1] - tracker.p_accept) < 1e-5
    assert 0.0 <= ticks[0][1] <= 1.0
    # the rotating per-chain window matches the chunked tracker's per-chain
    # EWMA at the window's start offset (core.rs:288-296 rotation semantics)
    import numpy as np

    start, window = ticks[0][2]
    idx = (start + np.arange(len(window))) % 4
    np.testing.assert_allclose(
        np.asarray(window),
        np.asarray(tracker.p_accept_chain)[idx],
        atol=1e-5,
    )


def test_steps_done_after_run_progress(tmp_path):
    """save_checkpoint works right after run_progress, and the stored step
    count advances the RNG past the progress run (never-replay guarantee)."""
    import numpy as np

    for mode in ("chunked", "stream"):
        mh = _mh().seed(8)
        mh.run_progress(30, 10, progress=False, mode=mode)
        p = str(tmp_path / f"{mode}.npz")
        mh.save_checkpoint(p)

        ref = np.asarray(_mh().seed(8).run(45, 10))
        rest = np.asarray(_mh().seed(8).resume(p, 15))
        np.testing.assert_array_equal(rest, ref[:, 30:])


def test_chain_bar_rotation_cycles_all_chains(capsys):
    """With more chains than bars, successive redraws rotate which chains
    own the ≤5 live bars (core.rs:288-296, 344-360)."""
    import io

    from general_mcmc_tpu.utils.progress import ProgressRenderer

    buf = io.StringIO()
    r = ProgressRenderer(8, 100, min_interval=0.0, stream=buf)

    class T:
        p_accept = 0.5
        p_accept_chain = [0.5] * 8

        def max_rhat(self):
            return 1.0

    for step in range(8):
        r.update(step + 1, T())
    out = buf.getvalue()
    for i in range(8):
        assert f"Chain {i}" in out  # every chain appeared in some redraw


def test_auto_mode_selects_by_staged_bytes():
    """mode="auto" (the default) picks stream for large runs and chunked for
    small ones — VERDICT round-2 #9's 'stream by default for large runs'."""
    import numpy as np

    mh = _mh().seed(3)
    # tiny run → chunked path (observable: identical results either way,
    # so assert on the documented selector directly)
    staged_small = (30 + 10) * 4 * 2 * 4
    assert staged_small <= mh._AUTO_STREAM_BYTES
    s_small, _ = mh.run_progress(30, 10, progress=False)  # auto → chunked
    assert s_small.shape == (4, 30, 2)

    # force the threshold down so auto picks stream, and check equality
    mh2 = _mh().seed(3)
    mh2._AUTO_STREAM_BYTES = 0
    s_stream, _ = mh2.run_progress(30, 10, progress=False)  # auto → stream
    np.testing.assert_array_equal(np.asarray(s_stream), np.asarray(s_small))


def test_stream_window_indexing_small_chain_count(capsys):
    """Review finding: with n_chains <= 5 the stream-mode rotated window has
    full length; the renderer must index it POSITIONALLY (via the explicit
    p_chain_is_window flag), not by chain id."""
    import io

    from general_mcmc_tpu.utils.progress import ProgressRenderer

    buf = io.StringIO()
    r = ProgressRenderer(4, 100, min_interval=0.0, stream=buf)

    class T:
        p_accept = 0.5
        p_chain_is_window = True
        p_accept_chain_start = 1  # window = chains [1, 2, 3, 0]
        p_accept_chain = [0.20, 0.30, 0.40, 0.10]  # values of chains 1,2,3,0

        def max_rhat(self):
            return 1.0

    r.update(10, T())
    out = buf.getvalue()
    for chain, val in ((1, 0.20), (2, 0.30), (3, 0.40), (0, 0.10)):
        line = next(l for l in out.splitlines() if l.startswith(f"Chain {chain} "))
        assert f"{val:.2f}" in line, (chain, line)


def test_stream_mode_static_nuts_matches_run():
    """Stream-mode progress composes with the static-window NUTS backend:
    identical samples to a plain run (same scan, tracker rides the carry)."""
    import numpy as np

    from general_mcmc_tpu import NUTS, GaussianND, init_det

    def mk():
        t = GaussianND(mean=jnp.zeros(2, jnp.float32), cov=jnp.ones(2, jnp.float32))
        return NUTS(t, init_det(8, 2), 0.8, max_tree_depth=3, step_size=0.5,
                    backend="static").seed(9)

    ref = np.asarray(mk().run(40, 12))
    sample, stats = mk().run_progress(40, 12, progress=False, mode="stream")
    np.testing.assert_array_equal(np.asarray(sample), ref)
