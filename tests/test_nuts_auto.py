"""backend="auto" tests: the warmup-depth-statistics collection-backend
choice (VERDICT round 4 #4 — the measured round-4 crossover rule encoded
as :meth:`NUTS._choose_backend`, resolved at the warmup→collection
boundary dispatch).

Every sampler config here is calibration-probed (round 5): the realized
last-quarter-of-warmup depth statistics sit on the intended side of the
rule's thresholds with margin, and no config lets auto pick a static
window whose CPU compile explodes (cap ≤ 5 static on the CPU backend;
the cap-6/7 static compile bombs are exactly what the rule's
``static_cap`` guards — see _choose_backend's docstring).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from general_mcmc_tpu import NealsFunnel, init_det
from general_mcmc_tpu.samplers.nuts import NUTS


def _std_normal(x):
    return -0.5 * jnp.sum(x * x)


def test_choose_backend_rule_table():
    """The decision rule encodes the three measured crossover regimes
    (docs/BENCH_HISTORY.md round 4) plus the backend-aware static cap."""
    choose = NUTS._choose_backend
    # saturated: depth within ~1.25 of the measured cap -> static
    assert choose(4, 3.98, 0.2, 4) == "static"
    assert choose(4, 3.0, 0.1, 4) == "static"
    # varied depths (funnel-like, std >= 1.0) -> static
    assert choose(6, 3.5, 1.4, 6) == "static"
    assert choose(5, 3.34, 1.13, 5) == "static"  # measured funnel cap-5 stats
    # shallow self-terminating trees -> xla, including the sub-threshold
    # jitter regimes the round-5 calibration measured (uniform 100-d gauss
    # 0.74; low-dim gauss 0.88 — binomial depth jitter, not variedness)
    assert choose(6, 3.41, 0.74, 6) == "xla"
    assert choose(5, 2.35, 0.88, 5) == "xla"
    # caps above static_cap: the unrolled window's compile is the hazard
    # -> xla regardless of the statistics
    assert choose(7, 6.9, 0.2, 7) == "xla"
    assert choose(8, 7.9, 2.0, 8) == "xla"
    assert choose(10, 9.9, 0.1, 10) == "xla"
    # the CPU backend tightens the cap to 5 (LLVM compile wall at 6)
    assert choose(6, 5.9, 0.2, 6, static_cap=5) == "xla"
    assert choose(5, 4.9, 0.2, 5, static_cap=5) == "static"


def test_auto_uniform_shallow_picks_xla_and_matches_bitwise():
    """64-d standard normal at ε=0.5 under cap 6: trees self-terminate at
    depth ≈ 3.3 with last-quarter std ≈ 0.73 (probe-measured) -> xla; and
    because the auto warmup IS the xla tree (tracking fields don't touch
    the RNG stream), the resolved run must be bit-identical to
    backend="xla"."""
    ref = NUTS(_std_normal, init_det(16, 64), 0.8, max_tree_depth=6,
               step_size=0.5, backend="xla").set_seed(11)
    want = np.asarray(ref.run(32, 64))

    auto = NUTS(_std_normal, init_det(16, 64), 0.8, max_tree_depth=6,
                step_size=0.5, backend="auto").set_seed(11)
    got = np.asarray(auto.run(32, 64))
    assert auto.backend_selected == "xla"
    mean, std = auto.depth_stats
    # consistency with the selection: neither static rule fired
    assert 6 - mean > 1.25 and std < 1.0
    np.testing.assert_array_equal(got, want)


def test_auto_saturated_picks_static():
    """A tiny initial ε under a small cap keeps every warmup tree at the
    cap (probe: mean 2.29 at cap 3) -> the saturation rule fires."""
    s = NUTS(_std_normal, init_det(16, 3), 0.8, max_tree_depth=3,
             step_size=0.05, backend="auto").set_seed(3)
    sample = s.run(32, 32)
    assert s.backend_selected == "static"
    mean, _std = s.depth_stats
    assert 3 - mean <= 1.25
    assert np.isfinite(np.asarray(sample)).all()
    assert sample.shape == (16, 32, 3)


def test_auto_varied_depth_funnel_picks_static():
    """Neal's funnel realizes strongly varied depths across chains/steps
    (probe: std 1.13 at cap 5) -> static even though the mean is well
    below the cap."""
    s = NUTS(NealsFunnel(dim=4), init_det(24, 4), 0.8, max_tree_depth=5,
             backend="auto").set_seed(5)
    sample = s.run(32, 48)
    assert s.backend_selected == "static"
    _mean, std = s.depth_stats
    assert std >= 1.0
    assert np.isfinite(np.asarray(sample)).all()


def test_auto_cap6_on_cpu_resolves_xla():
    """On the CPU backend the static window is auto-eligible only to cap 5
    (the cap-6 LLVM compile takes >10 min, round-5 probe), so the same
    funnel that picks static at cap 5 must resolve to xla at cap 6 —
    even though its depth statistics stay funnel-like."""
    s = NUTS(NealsFunnel(dim=4), init_det(24, 4), 0.8, max_tree_depth=6,
             backend="auto").set_seed(5)
    sample = s.run(16, 48)
    assert s.backend_selected == "xla"
    _mean, std = s.depth_stats
    assert std >= 1.0  # the stats say funnel; the static_cap guard overrode
    assert np.isfinite(np.asarray(sample)).all()


def test_auto_deep_cap_picks_xla():
    """Caps above the broadest static_cap resolve to xla upfront — no
    tracking fields, no boundary program, the exact pre-auto path."""
    s = NUTS(_std_normal, init_det(8, 2), 0.8, max_tree_depth=10,
             step_size=0.05, backend="auto").set_seed(9)
    s.run(8, 16)
    assert s.backend_selected == "xla"
    assert not hasattr(s, "depth_stats")


def test_auto_no_warmup_defaults_to_xla():
    s = NUTS(_std_normal, init_det(8, 2), 0.8, backend="auto").set_seed(1)
    sample = s.run(16, 0)
    assert s.backend_selected == "xla"
    assert sample.shape == (8, 16, 2)


def test_auto_checkpoint_resume(tmp_path):
    """resume() continues under the run's resolved backend; the resumed
    trajectory equals the uninterrupted one (collection is post-warmup,
    position-indexed RNG)."""
    path = os.path.join(tmp_path, "ck.npz")

    full = NUTS(_std_normal, init_det(8, 3), 0.8, max_tree_depth=3,
                step_size=0.05, backend="auto").set_seed(7)
    want = np.asarray(full.run(24, 16))

    part = NUTS(_std_normal, init_det(8, 3), 0.8, max_tree_depth=3,
                step_size=0.05, backend="auto").set_seed(7)
    first = np.asarray(part.run(12, 16))
    assert part.backend_selected == "static"
    part.save_checkpoint(path)
    rest = np.asarray(part.resume(path, 12))
    got = np.concatenate([first, rest], axis=1)
    np.testing.assert_array_equal(got, want)
