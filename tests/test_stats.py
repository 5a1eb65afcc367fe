"""Diagnostics golden tests ported from the reference's stats.rs test module.

Golden expectations come from stats.rs:734-783 (streaming R-hat),
stats.rs:808-839 (autocovariance BF + FFT), and stats.rs:842-865 (iid ESS
sanity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_mcmc_tpu.diagnostics.stats import (
    ChainTracker,
    MultiChainTracker,
    RunStats,
    autocov_bf,
    autocov_fft,
    basic_stats,
    collect_rhat,
    ess_bulk,
    ess_tail,
    max_skipnan,
    rank_normalized_rhat,
    split_rhat_mean_ess,
)


def _run_rhat_test(data0, data1, expected, tol):
    """Mirrors run_rhat_test_generic (stats.rs:712-732)."""
    tracker = MultiChainTracker(3, 4)
    tracker.step(jnp.asarray(data0, jnp.float32))
    tracker.step(jnp.asarray(data1, jnp.float32))
    rhat = np.asarray(tracker.rhat())
    np.testing.assert_allclose(rhat, expected, atol=tol)


def test_rhat_golden_1():
    # stats.rs:734-751
    data0 = [[0.0, 1.0, 0.0, 1.0], [1.0, 2.0, 0.0, 2.0], [0.0, 0.0, 0.0, 2.0]]
    data1 = [[1.0, 2.0, 2.0, 0.0], [1.0, 1.0, 1.0, 1.0], [0.0, 1.0, 0.0, 0.0]]
    expected = [np.sqrt(2.0), 1.0801234, 0.8944271, 0.8660254]
    _run_rhat_test(data0, data1, expected, 1e-6)


def test_rhat_golden_2():
    # stats.rs:769-783
    data0 = [[1.0, 0.0, 0.0, 1.0], [1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 2.0]]
    data1 = [[1.0, 2.0, 0.0, 2.0], [1.0, 2.0, 0.0, 0.0], [2.0, 0.0, 1.0, 2.0]]
    expected = [1.0 / np.sqrt(2.0), 0.74535599, 1.0, 1.5]
    _run_rhat_test(data0, data1, expected, 1e-6)


def test_autocov_single_param():
    # stats.rs:808-820
    data = jnp.array([[1.0], [2.0], [3.0], [4.0]], jnp.float32)
    expected = np.array([[1.25], [0.3125], [-0.375], [-0.5625]])
    np.testing.assert_allclose(np.asarray(autocov_bf(data)), expected, atol=1e-6)
    np.testing.assert_allclose(np.asarray(autocov_fft(data)), expected, atol=1e-6)


def test_autocov_two_params():
    # stats.rs:825-839
    data = jnp.array([[1.0, 0.3], [2.0, 2.0], [3.0, -2.0], [4.0, 5.0]], jnp.float32)
    expected = np.array(
        [
            [1.25, 6.516875],
            [0.3125, -3.7889063],
            [-0.375, 1.4721875],
            [-0.5625, -0.94171875],
        ]
    )
    np.testing.assert_allclose(np.asarray(autocov_bf(data)), expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(autocov_fft(data)), expected, atol=1e-5)


def test_autocov_bf_fft_agree_long():
    """BF and FFT must agree above the crossover too (stats.rs checks both)."""
    key = jax.random.key(0)
    data = jax.random.normal(key, (257, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(autocov_bf(data)), np.asarray(autocov_fft(data)), atol=1e-4
    )


def test_ess_iid_sanity():
    # stats.rs:842-865: 4 chains × 1000 iid uniforms → ESS near the sample
    # count, split R-hat ≈ 1.
    key = jax.random.key(42)
    data = jax.random.uniform(key, (4, 1000, 1), jnp.float32)
    stats = RunStats.from_sample(data)
    assert stats.ess.min > 3000.0
    assert stats.rhat.max < 1.01


def test_split_rhat_detects_disagreement():
    """Chains at different locations must show R-hat >> 1 (Stan orientation:
    sqrt(var_plus/W) > 1 for disagreeing chains)."""
    key = jax.random.key(1)
    base = jax.random.normal(key, (4, 500, 2), jnp.float32)
    shifted = base + jnp.arange(4.0)[:, None, None] * 5.0
    rhat, _ = split_rhat_mean_ess(shifted)
    assert float(jnp.min(rhat)) > 1.5


def test_split_rhat_correlated_chain_low_ess():
    """A strongly autocorrelated series must have ESS far below n."""
    key = jax.random.key(2)
    noise = np.asarray(jax.random.normal(key, (4, 1000), jnp.float32))
    ar = np.zeros_like(noise)
    for t in range(1, noise.shape[1]):
        ar[:, t] = 0.95 * ar[:, t - 1] + noise[:, t]
    _, ess = split_rhat_mean_ess(ar[:, :, None])
    assert float(ess[0]) < 600.0


def test_chain_tracker_stats():
    tracker = ChainTracker(2, [0.0, 0.0])
    xs = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    for x in xs:
        tracker.step(jnp.asarray(x))
    s = tracker.stats()
    np.testing.assert_allclose(np.asarray(s.mean), [3.0, 4.0], atol=1e-6)
    # unbiased variance of [1,3,5] and [2,4,6] is 4.0
    np.testing.assert_allclose(np.asarray(s.sm2), [4.0, 4.0], atol=1e-5)
    assert int(s.n) == 3


def test_collect_rhat_pooled():
    """collect_rhat pools ChainStats; iid-equal chains give rhat ≈ 1."""
    trackers = [ChainTracker(2, [0.0, 0.0]) for _ in range(3)]
    key = jax.random.key(3)
    for i, tr in enumerate(trackers):
        draws = jax.random.normal(jax.random.fold_in(key, i), (200, 2))
        for x in draws:
            tr.step(x)
    rhat = collect_rhat([tr.stats() for tr in trackers])
    assert float(jnp.max(jnp.abs(rhat - 1.0))) < 0.1


def test_max_skipnan():
    assert max_skipnan(jnp.array([1.0, jnp.nan, 3.0])) == 3.0
    assert np.isnan(max_skipnan(jnp.array([jnp.nan, jnp.nan])))


def test_basic_stats_median_descending_convention():
    # stats.rs:342-368 sorts descending and indexes len//2.
    bs = basic_stats("x", jnp.array([1.0, 2.0, 3.0, 4.0]))
    assert bs.min == 1.0 and bs.max == 4.0
    assert bs.median == 2.0  # descending [4,3,2,1], index 2
    np.testing.assert_allclose(bs.mean, 2.5)


def test_steps_major_matches_chain_major():
    key = jax.random.key(5)
    x = jax.random.normal(key, (6, 300, 4), jnp.float32)
    r1, e1 = split_rhat_mean_ess(x)
    r2, e2 = split_rhat_mean_ess(jnp.swapaxes(x, 0, 1), steps_major=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-5)


def test_rank_normalize_matches_numpy_oracle():
    """The pooled fractional-rank normal transform must match a direct numpy
    implementation of Vehtari et al. 2021 eq. 14 (Blom offsets 3/8, 1/4)."""
    from scipy.stats import norm

    import general_mcmc_tpu.diagnostics.stats as S

    key = jax.random.key(11)
    x = jax.random.normal(key, (3, 40, 2), jnp.float32) * 2.0 + 1.0
    z = np.asarray(S._rank_normalize(jnp.asarray(x, jnp.float32)))
    flat = np.asarray(x).reshape(-1, 2)
    S_n = flat.shape[0]
    for k in range(2):
        ranks = np.empty(S_n)
        ranks[np.argsort(flat[:, k])] = np.arange(1, S_n + 1)
        expected = norm.ppf((ranks - 0.375) / (S_n + 0.25))
        np.testing.assert_allclose(z[:, :, k].reshape(-1), expected, atol=1e-4)


def test_rank_rhat_iid_near_one_and_tail_ess_sane():
    key = jax.random.key(12)
    x = jax.random.normal(key, (4, 1000, 2), jnp.float32)
    rr = rank_normalized_rhat(x)
    assert float(jnp.max(rr)) < 1.01
    te = ess_tail(x)
    be = ess_bulk(x)
    # iid draws: tail and bulk ESS are near the total draw count 4000
    assert float(jnp.min(te)) > 2500.0
    assert float(jnp.min(be)) > 3000.0


def test_folded_rank_rhat_catches_scale_disagreement():
    """Chains with EQUAL means but different variances: classic split-R-hat
    is blind (B ≈ 0 ⇒ sqrt(V̂/W) ≈ 1) while the folded rank-normalized
    component must flag the failure — the paper's motivating case."""
    key = jax.random.key(13)
    x = np.array(jax.random.normal(key, (4, 800, 1), jnp.float32))
    x *= np.array([0.3, 1.0, 2.5, 5.0])[:, None, None]  # same mean, mixed scales
    classic, _ = split_rhat_mean_ess(x)
    rr = rank_normalized_rhat(x)
    assert float(classic[0]) < 1.05  # classic barely notices
    assert float(rr[0]) > 1.2  # folded rank component flags it hard


def test_rank_rhat_detects_location_disagreement_heavy_tails():
    """Shifted heavy-tailed (Cauchy) chains: rank normalization keeps R-hat
    meaningful where moment-based R-hat is dominated by tail draws."""
    key = jax.random.key(14)
    x = np.asarray(jax.random.cauchy(key, (4, 800, 1)), np.float32)
    x += np.array([0.0, 0.0, 6.0, 6.0])[:, None, None]
    rr = rank_normalized_rhat(x)
    assert float(rr[0]) > 1.2


def test_rank_grid_path_matches_exact():
    """The memory-bounded grid-ECDF rank path (VERDICT r3 #7 / roadmap #14)
    must reproduce the exact pooled-sort path: same monotone transform up to
    within-grid-cell interpolation, so rhat to ~1e-3 relative and ESS to a
    few percent — including a heavy-tailed marginal and non-trivial
    autocorrelation structure."""
    import general_mcmc_tpu.diagnostics.stats as S

    key = jax.random.key(17)
    x = jax.random.normal(key, (16, 400, 4), jnp.float32)
    x = x * jnp.array([1.0, 3.0, 0.5, 10.0]) + jnp.array([0.0, 1.0, -2.0, 5.0])
    x = x.at[..., 2].set(jnp.sign(x[..., 2]) * jnp.abs(x[..., 2]) ** 1.5)
    # AR(1)-ish smoothing for real autocorrelation in the ESS
    x = 0.6 * x + 0.4 * jnp.roll(x, 1, axis=1)

    exact = S.rank_normalized_summary(x, method="exact")
    grid = S.rank_normalized_summary(x, method="grid")
    np.testing.assert_allclose(
        np.asarray(grid.rhat), np.asarray(exact.rhat), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(grid.ess_bulk), np.asarray(exact.ess_bulk), rtol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(grid.ess_tail), np.asarray(exact.ess_tail), rtol=0.05
    )
    # individual APIs route through the same summary
    np.testing.assert_allclose(
        np.asarray(S.rank_normalized_rhat(x, method="grid")),
        np.asarray(grid.rhat),
    )


def test_rank_grid_path_chunked_and_tail(monkeypatch):
    """Grid path with REAL chunking engaged (tiny chunk budget, steps-major
    layout, prime chain count exercising the main+tail split): results must
    match the unchunked grid computation exactly — chunk boundaries must not
    leak into counts or sufficient statistics."""
    import general_mcmc_tpu.diagnostics.stats as S

    key = jax.random.key(18)
    x = jax.random.normal(key, (23, 128, 2), jnp.float32) * jnp.array([1.0, 4.0])
    ref = S.rank_normalized_summary(x, method="grid")

    monkeypatch.setattr(S, "_ESS_CHUNK_BYTES", 16 * 4096)
    plan = S._plan_chunks(128, 23, 2, split=True)
    assert plan is not None and plan[2] < 23  # chunking + tail both engaged
    chunked = S.rank_normalized_summary(
        jnp.swapaxes(x, 0, 1), steps_major=True, method="grid"
    )
    np.testing.assert_allclose(
        np.asarray(chunked.rhat), np.asarray(ref.rhat), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(chunked.ess_bulk), np.asarray(ref.ess_bulk), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(chunked.ess_tail), np.asarray(ref.ess_tail), rtol=1e-4
    )
    # auto-dispatch engages the grid path once a plan exists
    auto = S.rank_normalized_rhat(jnp.swapaxes(x, 0, 1), steps_major=True)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(chunked.rhat))


def test_rank_diagnostics_memory_bounded_at_bench_shape():
    """Compiled-memory assertion (VERDICT r3 #7) at the driver bench's exact
    sample shape ([3072, 10240, 100] steps-major, 11.7 GiB): every program
    the grid rank path compiles must keep temps + outputs far below the
    sample size — the rank transform must not materialize a full-size copy
    (the classic-path OOM signature was a 12 GiB param-major relayout)."""
    import general_mcmc_tpu.diagnostics.stats as S

    n0, c0, p = 3072, 10_240, 100
    plan = S._plan_chunks(n0, c0, p, split=True)
    assert plan is not None
    chunk, W, main = plan
    assert main == c0
    K = S._RANK_GRID_K
    full = jax.ShapeDtypeStruct((n0, c0, p), jnp.float32)
    f32 = jnp.float32

    def extra_bytes(per_chunk, consts):
        ma = (
            S._chunked_chains_pass.lower(
                full, consts, per_chunk, W, chunk, main, steps_major=True
            )
            .compile()
            .memory_analysis()
        )
        return ma.temp_size_in_bytes + ma.output_size_in_bytes

    cap = 3 * 2**30  # same order as the classic suffstats program's bound
    b0 = extra_bytes(S._pc_minmax, {})
    assert b0 < cap, f"minmax pass temps {b0 / 2**30:.2f} GiB"
    bA = extra_bytes(S._quantile_table_fn(S._RANK_SKETCH_Q), {})
    assert bA < cap, f"quantile-table pass temps {bA / 2**30:.2f} GiB"
    # the standalone merge+count step (outside the chunk maps)
    n_chunks = main // chunk
    R = n_chunks * min(S._RANK_SKETCH_Q, chunk * n0)
    maM = (
        jax.jit(S._weighted_counts_at_grid)
        .lower(
            jax.ShapeDtypeStruct((R, p), f32),
            jax.ShapeDtypeStruct((R,), f32),
            jax.ShapeDtypeStruct((K, p), f32),
        )
        .compile()
        .memory_analysis()
    )
    bM = maM.temp_size_in_bytes + maM.output_size_in_bytes
    assert bM < cap, f"merge/count temps {bM / 2**30:.2f} GiB"
    vec = jax.ShapeDtypeStruct((p,), f32)
    grid = jax.ShapeDtypeStruct((K, p), f32)
    consts = {
        "lo": vec, "w": vec, "F": grid, "zlo": vec, "zw": vec, "Fz": grid,
        "total": jax.ShapeDtypeStruct((), f32), "med": vec, "q05": vec,
        "q95": vec,
    }
    for pc in (S._pc_rank_bulk, S._pc_rank_fold, S._pc_rank_tail):
        bB = extra_bytes(pc, consts)
        assert bB < cap, f"{pc.__name__} pass temps {bB / 2**30:.2f} GiB"


def test_blom_z_finite_at_bench_scale_totals():
    """f32 regression (round 4, found on hardware): at S ≳ 2²³ pooled draws
    the Blom quantile (r−3/8)/(S+1/4) rounds to exactly 1.0 in f32 for the
    top ranks, and ndtri(1) = +inf poisoned the bench-shape (31.4M-draw)
    rank diagnostics.  The open-interval clamp must keep every rank's z
    finite at any total."""
    import general_mcmc_tpu.diagnostics.stats as S

    for total in (1.0e4, 2.0**23, 31_457_280.0, 2.0**31):
        t = jnp.float32(total)
        r = jnp.asarray([1.0, total / 2, total - 1.0, total], jnp.float32)
        z = np.asarray(S._blom_z(r, t))
        assert np.isfinite(z).all(), (total, z)
        # still a deep-tail z, not squashed (≈3.84 at S=1e4, ≈5.5 at 31M)
        assert z[-1] > 3.5
        assert z[-1] >= z[-2] >= z[1] >= z[0]  # monotone in rank


def test_runstats_rank_normalized_fields():
    key = jax.random.key(15)
    x = jax.random.normal(key, (4, 300, 2), jnp.float32)
    rs = RunStats.from_sample(x, rank_normalized=True)
    assert rs.rank_rhat is not None and rs.tail_ess is not None
    assert rs.rank_rhat.max < 1.02
    assert "Tail ESS" in str(rs)
    assert RunStats.from_sample(x).rank_rhat is None


def test_steps_major_rank_apis_match():
    key = jax.random.key(16)
    x = jax.random.normal(key, (4, 200, 3), jnp.float32)
    xt = jnp.swapaxes(x, 0, 1)
    np.testing.assert_allclose(
        np.asarray(rank_normalized_rhat(x)),
        np.asarray(rank_normalized_rhat(xt, steps_major=True)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ess_tail(x)), np.asarray(ess_tail(xt, steps_major=True)),
        rtol=1e-5,
    )


def test_chunked_matches_single_shot(monkeypatch):
    """Forcing the chain-chunked path must reproduce the one-shot result (per-
    chain sufficient statistics combine exactly across chunks)."""
    from general_mcmc_tpu.diagnostics import stats as S

    key = jax.random.key(7)
    x = jax.random.normal(key, (12, 200, 3), jnp.float32) * jnp.array([1.0, 3.0, 0.5])
    r_ref, e_ref = split_rhat_mean_ess(x)
    # Shrink the budget so 12 chains need multiple chunks (both layouts).
    monkeypatch.setattr(S, "_ESS_CHUNK_BYTES", 2 * 512 * 3 * 8 * 4)
    assert S._ess_chain_chunk(24, 100, 3) < 12  # chunking actually engaged
    r_c, e_c = split_rhat_mean_ess(x)
    r_s, e_s = split_rhat_mean_ess(jnp.swapaxes(x, 0, 1), steps_major=True)
    np.testing.assert_allclose(np.asarray(r_c), np.asarray(r_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e_c), np.asarray(e_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e_s), np.asarray(e_ref), rtol=1e-4)


def test_chunked_odd_chain_count(monkeypatch):
    """A chain count with no convenient divisor exercises the remainder-shape
    path and must still combine exactly."""
    from general_mcmc_tpu.diagnostics import stats as S

    key = jax.random.key(8)
    x = jax.random.normal(key, (13, 128, 2), jnp.float32)
    r_ref, e_ref = split_rhat_mean_ess(x)
    monkeypatch.setattr(S, "_ESS_CHUNK_BYTES", 2 * 256 * 2 * 8 * 5)
    r_c, e_c = split_rhat_mean_ess(x)
    np.testing.assert_allclose(np.asarray(r_c), np.asarray(r_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e_c), np.asarray(e_ref), rtol=1e-4)


def test_diagnostics_memory_bounded_at_bench_shape():
    """Compiled-memory assertion (VERDICT round-2 #2): at the driver bench's
    exact sample shape ([3072, 10240, 100] steps-major, 11.7 GiB), every
    program the chunked diagnostics path compiles must keep temps + outputs
    far below the sample size — i.e. no full-size relayout/copy like the
    f32[104,3072,10240] pad temp that OOMed BENCH_r02.  Lowering needs no
    real buffers, so this runs on CPU against the real TPU shapes.
    """
    from general_mcmc_tpu.diagnostics import stats as S

    n0, c0, p = 3072, 10_240, 100
    # Use the EXACT plan production uses (shared helper — review finding:
    # a copy-pasted heuristic here would silently diverge from the bench).
    plan = S._plan_chunks(n0, c0, p, split=True)
    assert plan is not None  # the bench shape must engage chunking
    chunk, W, main = plan
    assert main == c0  # 10240 has divisor-friendly chunk sizes

    # The one-program nested-map sufficient-statistics kernel takes the FULL
    # sample as an argument (aliasing the existing buffer) and must keep
    # temps + outputs bounded — a full-size relayout like round 2's pad temp
    # would show up as ~12 GiB of temp right here.  (On the real TPU backend
    # the same lowering measured temp ≈ 1.7 GiB, probed round 3.)
    full = jax.ShapeDtypeStruct((n0, c0, p), jnp.float32)
    ma = (
        S._suffstats_all.lower(full, W, chunk, main, split=True, steps_major=True)
        .compile()
        .memory_analysis()
    )
    extra = ma.temp_size_in_bytes + ma.output_size_in_bytes
    assert extra < 2.5 * 2**30, f"suffstats program temps {extra / 2**30:.2f} GiB"

    c, n = 2 * c0, n0 // 2  # split chains / split length
    means = jax.ShapeDtypeStruct((c, p), jnp.float32)
    sq = jax.ShapeDtypeStruct((c, p), jnp.float32)
    acov = jax.ShapeDtypeStruct((n, p), jnp.float32)
    ma2 = jax.jit(S._combine_suffstats).lower(means, sq, acov).compile().memory_analysis()
    assert ma2.temp_size_in_bytes + ma2.output_size_in_bytes < 64 * 2**20


def test_return_moments_matches_numpy(monkeypatch):
    """Pooled (mean, std) from the sufficient statistics must equal a direct
    numpy reduce over the draws — in both the single-shot and chunked paths
    (the bench's moment audit depends on this; a raw full-sample reduce
    compiles a full relayout temp on TPU, so the bench cannot do it)."""
    from general_mcmc_tpu.diagnostics import stats as S

    key = jax.random.key(21)
    x = jax.random.normal(key, (8, 200, 3), jnp.float32) * jnp.array([1.0, 2.0, 0.5])
    flat = np.asarray(x).reshape(-1, 3)

    r, e, m, sd = split_rhat_mean_ess(x, return_moments=True)
    np.testing.assert_allclose(np.asarray(m), flat.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sd), flat.std(axis=0), rtol=1e-5)

    monkeypatch.setattr(S, "_ESS_CHUNK_BYTES", 2 * 512 * 3 * 8 * 4)
    r2, e2, m2, sd2 = split_rhat_mean_ess(
        jnp.swapaxes(x, 0, 1), steps_major=True, return_moments=True
    )
    np.testing.assert_allclose(np.asarray(m2), flat.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sd2), flat.std(axis=0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), rtol=1e-5)


def test_chunked_prime_chain_count_tail_path(monkeypatch):
    """A prime chain count larger than the chunk budget exercises the
    main+tail split (review finding: the old divisor-forcing degraded to
    chunk=1); results must still combine exactly."""
    from general_mcmc_tpu.diagnostics import stats as S

    key = jax.random.key(31)
    x = jax.random.normal(key, (23, 128, 2), jnp.float32)
    r_ref, e_ref = split_rhat_mean_ess(x)
    monkeypatch.setattr(S, "_ESS_CHUNK_BYTES", 16 * 4096)
    plan = S._plan_chunks(128, 23, 2, split=True)
    assert plan is not None
    chunk, W, main = plan
    assert main < 23 and 23 - main < chunk  # tail path engaged
    r_c, e_c = split_rhat_mean_ess(x)
    np.testing.assert_allclose(np.asarray(r_c), np.asarray(r_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e_c), np.asarray(e_ref), rtol=1e-4)


def test_chain_suffstats_host_combine_matches(monkeypatch):
    """The fused in-program diagnostics path (chain_suffstats embedded in an
    outer jit + pure-numpy combine_suffstats_host) must reproduce
    split_rhat_mean_ess(return_moments=True) exactly — single-shot AND
    chunked plans.  This is the no-second-compile path the bench's stretch
    line rides (VERDICT round 4 #1)."""
    from general_mcmc_tpu.diagnostics import stats as S

    key = jax.random.key(11)
    x = jax.random.normal(key, (10, 256, 3), jnp.float32) * jnp.array(
        [1.0, 2.5, 0.5]
    )
    r_ref, e_ref, m_ref, s_ref = split_rhat_mean_ess(x, return_moments=True)

    def run_fused(arr):
        # embed in an OUTER jit, steps-major — exactly how
        # core.run_kernel_stats consumes it
        fused = jax.jit(
            lambda s: S.chain_suffstats(s, split=True, steps_major=True)
        )
        return fused(jnp.swapaxes(arr, 0, 1))

    for engage_chunking in (False, True):
        if engage_chunking:
            monkeypatch.setattr(S, "_ESS_CHUNK_BYTES", 2 * 512 * 3 * 8 * 4)
            assert S._plan_chunks(256, 10, 3, split=True) is not None
        ms, sqs, acs = run_fused(x)
        r, e, m, sd = S.combine_suffstats_host(ms, sqs, acs)
        np.testing.assert_allclose(r, np.asarray(r_ref), rtol=1e-5)
        np.testing.assert_allclose(e, np.asarray(e_ref), rtol=1e-4)
        np.testing.assert_allclose(m, np.asarray(m_ref), atol=1e-5)
        np.testing.assert_allclose(sd, np.asarray(s_ref), rtol=1e-5)


def test_combine_suffstats_host_matches_jitted():
    """Host combine ≡ the jitted _combine_suffstats on arbitrary sufficient
    statistics (not just ones produced by a real sample)."""
    from general_mcmc_tpu.diagnostics import stats as S

    rng = np.random.default_rng(5)
    c, n, p = 14, 64, 4
    ms = rng.normal(size=(c, p)).astype(np.float32)
    sq = rng.uniform(0.5, 2.0, size=(c, p)).astype(np.float32)
    ac = rng.normal(scale=0.1, size=(n, p)).astype(np.float32)
    ac[0] = sq.mean(axis=0) * c  # lag-0 ≈ within-variance sum, keeps rho sane
    got = S.combine_suffstats_host(ms, sq, ac)
    want = S._combine_suffstats(jnp.asarray(ms), jnp.asarray(sq), jnp.asarray(ac))
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), rtol=2e-5)
