"""Convergence diagnostics: streaming trackers, split-R-hat, FFT-based ESS.

TPU-native rebuild of the reference's stats.rs (910 LoC): the same Stan
methodology (stats.rs:520-522 cites the Stan reference manual), but all batch
math runs on device over the whole ``[chains, steps, params]`` tensor at once
— autocovariance is a single batched ``jnp.fft.rfft`` instead of
rayon-parallel per-parameter rustfft loops (stats.rs:603-647), and the Geyer
initial-monotone-sequence truncation (stats.rs:545-573) is vectorized with
cumulative ops instead of a sequential break.

Deviations from the reference (both deliberate, documented in SURVEY.md §3.4):

- ``split_rhat`` returns ``sqrt(var_plus / within)`` (Stan's orientation).
  The reference's split path computes the reciprocal ``sqrt(W/V̂)``
  (stats.rs:452-454) while its streaming path uses the Stan orientation
  (stats.rs:148-151, 314-318); we follow Stan in both.
- ``collect_rhat`` divides the between-chain variance by ``(n_chains - 1)``;
  the reference divides by ``n_chains * n_params - 1`` (an element-count
  artifact, stats.rs:183).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ALPHA",
    "ChainStats",
    "ChainTracker",
    "MultiChainTracker",
    "collect_rhat",
    "max_skipnan",
    "split_rhat_mean_ess",
    "chain_suffstats",
    "combine_suffstats_host",
    "rank_normalized_rhat",
    "rank_normalized_summary",
    "RankSummary",
    "ess_bulk",
    "ess_tail",
    "ess_from_chainstats",
    "autocov",
    "autocov_fft",
    "autocov_bf",
    "basic_stats",
    "BasicStats",
    "RunStats",
]

# EWMA smoothing constant for streaming acceptance estimates (stats.rs:11).
ALPHA = 0.01

# Lag count at or below which brute-force autocovariance beats FFT
# (stats.rs:575-581 crossover).
_AUTOCOV_BF_MAX = 100


class ChainStats(NamedTuple):
    """Sufficient statistics of one chain (stats.rs:41-46).

    The merge-sufficient-statistics protocol: progress aggregation pools
    these across chains (reference: mpsc channels; here: a stacked array or a
    psum over a device mesh).
    """

    n: jax.Array  # number of steps tracked
    p_accept: jax.Array  # EWMA acceptance probability
    mean: jax.Array  # [n_params] running mean
    sm2: jax.Array  # [n_params] running (unbiased) variance


class _TrackerState(NamedTuple):
    n: jax.Array
    p_accept: jax.Array
    last_state: jax.Array
    mean: jax.Array
    mean_sq: jax.Array
    # Per-chain acceptance EWMA ([n_chains]; multi-chain tracking only —
    # None for the single-chain ChainTracker, whose p_accept IS per-chain).
    p_chain: jax.Array | None = None


def _tracker_update(state: _TrackerState, x: jax.Array) -> _TrackerState:
    """One streaming update of running mean / mean-square / p_accept.

    Matches ChainTracker::step (stats.rs:87-124): mean and mean_sq are
    incremental averages; acceptance is inferred from state change and
    smoothed with EWMA(ALPHA), with the first step initializing the EWMA
    from the accept indicator itself (stats.rs:104-114).
    """
    n = state.n + 1
    nf = n.astype(state.mean.dtype)
    mean = (state.mean * (nf - 1.0) + x) / nf
    mean_sq = jnp.where(n == 1, x * x, (state.mean_sq * (nf - 1.0) + x * x) / nf)
    accepted = jnp.any(x != state.last_state).astype(state.p_accept.dtype)
    p_start = jnp.where(state.p_accept >= 0.0, state.p_accept, accepted)
    p_accept = (1.0 - ALPHA) * p_start + ALPHA * accepted
    return _TrackerState(n, p_accept, x, mean, mean_sq)


class ChainTracker:
    """Streaming statistics for a single chain (stats.rs:24-139)."""

    def __init__(self, n_params: int, initial_state, dtype=jnp.float32):
        init = jnp.asarray(initial_state, dtype)
        self._state = _TrackerState(
            n=jnp.zeros((), jnp.int32),
            p_accept=jnp.asarray(-1.0, dtype),
            last_state=init,
            mean=jnp.zeros(n_params, dtype),
            mean_sq=jnp.zeros(n_params, dtype),
        )
        self._update = jax.jit(_tracker_update)

    def step(self, x):
        self._state = self._update(self._state, jnp.asarray(x, self._state.mean.dtype))

    def stats(self) -> ChainStats:
        s = self._state
        nf = s.n.astype(s.mean.dtype)
        sm2 = (s.mean_sq - s.mean**2) * nf / (nf - 1.0)
        return ChainStats(s.n, s.p_accept, s.mean, sm2)


def _multi_update(state: _TrackerState, x: jax.Array) -> _TrackerState:
    """MultiChainTracker::step (stats.rs:238-269): x is [n_chains, n_params].

    The acceptance EWMA is folded sequentially across chains within the step
    (stats.rs:260-265); the closed form below reproduces that fold exactly:
    p' = (1-a)^C p + a * sum_i (1-a)^(C-1-i) * accepted_i.

    ``p_chain`` additionally keeps a plain per-chain acceptance EWMA (the
    per-chain figure the reference's chain progress bars display,
    core.rs:288-306); it starts at the first observed accept/reject rather
    than decaying from a sentinel.
    """
    n = state.n + 1
    nf = n.astype(state.mean.dtype)
    mean = (state.mean * (nf - 1.0) + x) / nf
    mean_sq = jnp.where(n == 1, x * x, (state.mean_sq * (nf - 1.0) + x * x) / nf)
    accepted = jnp.any(x != state.last_state, axis=1).astype(state.p_accept.dtype)
    c = accepted.shape[0]
    decay = (1.0 - ALPHA) ** jnp.arange(c - 1, -1, -1, dtype=state.p_accept.dtype)
    p_accept = (1.0 - ALPHA) ** c * state.p_accept + ALPHA * jnp.sum(decay * accepted)
    p_start = jnp.where(state.p_chain >= 0.0, state.p_chain, accepted)
    p_chain = (1.0 - ALPHA) * p_start + ALPHA * accepted
    return _TrackerState(n, p_accept, x, mean, mean_sq, p_chain)


def _multi_within_and_var(state: _TrackerState):
    """within_and_var (stats.rs:320-338), golden-tested by stats.rs:734-783."""
    nf = state.n.astype(state.mean.dtype)
    n_chains = state.mean.shape[0]
    mean_chain = jnp.mean(state.mean, axis=0)
    fac = nf / (n_chains - 1.0)
    between = jnp.sum((state.mean - mean_chain) ** 2, axis=0) * fac
    sm2 = (state.mean_sq - state.mean**2) * nf / (nf - 1.0)
    within = jnp.mean(sm2, axis=0)
    var = within * ((nf - 1.0) / nf) + between * (1.0 / nf)
    return within, var


class MultiChainTracker:
    """Streaming cross-chain statistics (stats.rs:199-339): running per-chain
    mean/mean-square plus a pooled acceptance EWMA, yielding live R-hat.
    """

    def __init__(self, n_chains: int, n_params: int, dtype=jnp.float32):
        self._state = _TrackerState(
            n=jnp.zeros((), jnp.int32),
            p_accept=jnp.zeros((), dtype),
            last_state=jnp.zeros((n_chains, n_params), dtype),
            mean=jnp.zeros((n_chains, n_params), dtype),
            mean_sq=jnp.zeros((n_chains, n_params), dtype),
            p_chain=jnp.full((n_chains,), -1.0, dtype),
        )
        self._update = jax.jit(_multi_update)
        self._update_batch = jax.jit(
            lambda s, xs: jax.lax.scan(lambda c, x: (_multi_update(c, x), None), s, xs)[0]
        )

    @property
    def p_accept(self) -> float:
        return float(self._state.p_accept)

    @property
    def p_accept_chain(self):
        """Per-chain acceptance EWMA ([n_chains] array; the reference's
        chain-bar statistic, core.rs:288-306).  Entries are -1 until the
        chain has been stepped once."""
        return self._state.p_chain

    def step(self, x):
        self._state = self._update(self._state, jnp.asarray(x, self._state.mean.dtype))

    def step_batch(self, xs):
        """Update with a [steps, n_chains, n_params] block in one jit call."""
        self._state = self._update_batch(
            self._state, jnp.asarray(xs, self._state.mean.dtype)
        )

    def rhat(self) -> jax.Array:
        """R-hat per parameter, sqrt(var_plus/W) (stats.rs:314-318)."""
        within, var = _multi_within_and_var(self._state)
        return jnp.sqrt(var / within)

    def max_rhat(self) -> float:
        return float(jnp.max(self.rhat()))

    def stats(self, sample) -> "RunStats":
        """Batch post-hoc stats from the full sample (stats.rs:271-294)."""
        return RunStats.from_sample(sample)


def collect_rhat(chain_stats: list[ChainStats]) -> jax.Array:
    """Pooled R-hat from per-chain sufficient statistics (stats.rs:148-151,
    165-188).  Used by the progress aggregator; see module docstring for the
    between-variance denominator deviation.
    """
    means = jnp.stack([cs.mean for cs in chain_stats])
    sm2s = jnp.stack([cs.sm2 for cs in chain_stats])
    ns = jnp.stack([jnp.asarray(cs.n, means.dtype) for cs in chain_stats])
    within = jnp.mean(sm2s, axis=0)
    gmean = jnp.mean(means, axis=0)
    c = means.shape[0]
    between = jnp.sum((means - gmean) ** 2, axis=0) / (c - 1.0)
    n = jnp.mean(ns)
    var = between + within * ((n - 1.0) / n)
    return jnp.sqrt(var / within)


def max_skipnan(values) -> float:
    """Max of the finite entries; NaN when all entries are NaN
    (stats.rs:156-163)."""
    values = jnp.asarray(values)
    any_ok = jnp.any(~jnp.isnan(values))
    mx = jnp.max(jnp.where(jnp.isnan(values), -jnp.inf, values))
    return float(jnp.where(any_ok, mx, jnp.nan))


# ---------------------------------------------------------------------------
# Batch (post-hoc) diagnostics
# ---------------------------------------------------------------------------


def _splitcat(sample: jax.Array) -> jax.Array:
    """(c, n, p) -> (2c, n//2, p) by splitting each chain in half
    (stats.rs:419-425; odd middle observation dropped)."""
    n = sample.shape[1]
    half = n // 2
    return jnp.concatenate([sample[:, :half], sample[:, n - half :]], axis=0)


def _withinvar(sample: jax.Array):
    """Per-parameter within-chain variance W and pooled variance estimate V̂
    (stats.rs:456-504).  ``sample`` is (chains, steps, params)."""
    # Degenerate step counts (a split 1-step sample has n=0) yield NaN, like
    # the reference's f64 division-by-zero (stats.rs:456-504), rather than a
    # Python ZeroDivisionError from the static-shape arithmetic below.
    n = sample.shape[1] or float("nan")
    c = sample.shape[0]
    chain_means = jnp.mean(sample, axis=1)  # (c, p)
    overall = jnp.mean(chain_means, axis=0)  # (p,)
    b = jnp.sum((chain_means - overall) ** 2, axis=0) * (n / (c - 1.0))
    sq = jnp.mean((sample - chain_means[:, None, :]) ** 2, axis=1)  # biased /n
    w = jnp.mean(sq, axis=0)
    v = ((n - 1.0) / n) * w + b / n
    return w, v


def autocov_fft(sample: jax.Array) -> jax.Array:
    """Autocovariance of each column of an (n, d) array via zero-padded FFT
    (stats.rs:603-647).  Biased normalization (divides by n).  Batched: also
    accepts (..., n, d) and vectorizes over leading axes.
    """
    n = sample.shape[-2]
    n_padded = 1
    while n_padded < 2 * n - 1:
        n_padded <<= 1
    centered = sample - jnp.mean(sample, axis=-2, keepdims=True)
    f = jnp.fft.rfft(centered, n=n_padded, axis=-2)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=n_padded, axis=-2)[..., :n, :]
    return acov / n


def autocov_bf(sample: jax.Array) -> jax.Array:
    """Brute-force autocovariance (stats.rs:659-681); O(n²) but cheap for the
    short-series regime, as one masked matmul on the MXU."""
    n = sample.shape[-2]
    centered = sample - jnp.mean(sample, axis=-2, keepdims=True)
    # lagmat[lag, t] = 1 if t + lag < n  →  acov[lag] = Σ_t x[t]·x[t+lag]
    idx = jnp.arange(n)
    gather = idx[:, None] + idx[None, :]  # (lag, t) -> t+lag
    valid = gather < n
    shifted = jnp.where(
        valid[..., None], jnp.take(centered, jnp.minimum(gather, n - 1), axis=-2), 0.0
    )  # (..., lag, t, d)
    return jnp.einsum("...td,...ltd->...ld", centered, shifted) / n


def autocov(sample: jax.Array) -> jax.Array:
    """Dispatch brute-force vs FFT on series length (stats.rs:575-581)."""
    if sample.shape[-2] <= _AUTOCOV_BF_MAX:
        return autocov_bf(sample)
    return autocov_fft(sample)


def _geyer_tau(rho: jax.Array) -> jax.Array:
    """Integrated autocorrelation time from normalized rho (steps, params):
    pairwise sums, truncated at the first non-positive pair, enforced
    monotone non-increasing (stats.rs:545-573).
    """
    n = rho.shape[0]
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]  # (n_pairs, p)
    positive_prefix = jnp.cumprod(pairs > 0.0, axis=0).astype(rho.dtype)
    mono = jax.lax.cummin(pairs, axis=0)
    out = jnp.sum(mono * positive_prefix, axis=0)
    return -1.0 + 2.0 * out


def _ess(sample: jax.Array, within: jax.Array, var: jax.Array) -> jax.Array:
    """ESS per parameter (stats.rs:523-573): average per-chain autocovariance,
    normalize to rho via (W, V̂), Geyer truncation, N_eff = c·n/τ.

    Always uses the FFT autocovariance: the reference's brute-force
    crossover at n ≤ 100 (stats.rs:575-581) is a scalar-CPU heuristic; on
    TPU the batched FFT is faster at every length and O(n log n) memory,
    while the O(n²)-memory brute force cannot scale to 10k-chain batches.
    """
    c, n, _ = sample.shape
    avg_rho = jnp.mean(autocov_fft(sample), axis=0)
    rho = 1.0 - (within - avg_rho) / var
    return (c * n) / _geyer_tau(rho)


# Per-chunk FFT working-set budget for the chunked diagnostics path.
# With complex64 spectra the per-chain working set is ~2·n_padded·p·8 bytes;
# 512 MB keeps the whole diagnostics pass far below HBM limits even with a
# >10 GB sample resident.
_ESS_CHUNK_BYTES = 512 * 1024 * 1024


def _ess_chain_chunk(c: int, n: int, p: int) -> int:
    """Chain-chunk size bounding the per-block FFT buffer (complex spectra +
    inverse-transform temp) to ``_ESS_CHUNK_BYTES``."""
    n_padded = 1
    while n_padded < 2 * n - 1:
        n_padded <<= 1
    per_chain = 2 * n_padded * p * 8  # complex64 spectrum + irfft temp
    return int(max(1, min(c, _ESS_CHUNK_BYTES // per_chain)))


def _pick_chain_chunk(c0: int, want: int) -> int:
    """Largest chunk ≤ ``want`` that divides ``c0`` (single compiled chunk
    shape); fall back to ``want`` itself (one extra remainder-shape compile)
    when c0 has no convenient divisor."""
    for cand in range(min(want, c0), 0, -1):
        if c0 % cand == 0:
            if cand >= max(1, want // 4):
                return cand
            break  # only tiny divisors exist; a remainder shape is cheaper
    return min(want, c0)


def _chunk_suffstats_of(blk: jax.Array, split: bool, steps_major: bool):
    """Sufficient statistics of one chains-chunk: per-(split-)chain means and
    biased within-chain squared deviations ([cc, p] each) plus the SUM over
    the chunk's chains of per-chain autocovariances ([n, p]).

    These are exactly the per-chain terms _withinvar/_ess reduce over, so the
    host-side combine reproduces the unchunked math; nothing cross-chain is
    computed here, which is what makes chains the safe chunk axis.
    """
    blk = blk.astype(jnp.float32)
    if steps_major:
        blk = jnp.swapaxes(blk, 0, 1)
    if split:
        blk = _splitcat(blk)
    chain_means = jnp.mean(blk, axis=1)  # (cc, p)
    sq = jnp.mean((blk - chain_means[:, None, :]) ** 2, axis=1)  # biased /n
    acov_sum = jnp.sum(autocov_fft(blk), axis=0)  # (n, p)
    return chain_means, sq, acov_sum


@functools.partial(jax.jit,
                   static_argnames=("W", "chunk", "main", "split", "steps_major"))
def _suffstats_all(sample: jax.Array, W: int, chunk: int, main: int,
                   split: bool, steps_major: bool):
    """ALL chunks' sufficient statistics in ONE compiled program: an outer
    ``lax.map`` over blocks of ``W`` chains (traced-offset chains slice +
    steps→chains rotation), an inner ``lax.map`` over ``chunk``-chain
    sub-blocks of the rotated block (traced-offset major-axis slice + FFT
    autocovariance).

    Why this exact shape (round-3 TPU findings at [3072, 10240, 100]):

    - one-static-slice-per-chunk compiles O(c0/chunk) distinct executables
      (256 at the bench shape) — minutes of remote-compile churn and a
      finalize that exhausted backend resources when outputs stayed on
      device for a many-operand concatenate;
    - a chunk-per-dispatch host loop works but costs 256 tunnel round
      trips (~10 min wall on the remote-TPU tunnel);
    - a single FLAT map over all 256 chunks crashes the remote compile
      helper (HTTP 500) — the unrolled FFT body is too much program;
    - the NESTED two-level map compiles to temp ≈ 1.7 GB at the bench
      shape (verified via compile-only memory_analysis on the TPU backend)
      and runs as ONE dispatch.

    Requires ``chunk | W`` and ``W | main`` where ``main <= c0`` is the
    covered chain prefix (callers handle the < chunk-sized tail with one
    extra small program when c0 has no convenient divisor)."""
    p = sample.shape[-1]
    axis = 1 if steps_major else 0

    def outer(g):
        blk1 = jax.lax.dynamic_slice_in_dim(sample, g * W, W, axis=axis)
        if steps_major:
            blk1 = jnp.swapaxes(blk1, 0, 1)  # → [W, n, p] chains-major

        def inner(k):
            blk = jax.lax.dynamic_slice_in_dim(blk1, k * chunk, chunk, axis=0)
            return _chunk_suffstats_of(blk, split=split, steps_major=False)

        ms, sqs, acs = jax.lax.map(inner, jnp.arange(W // chunk))
        return ms.reshape(-1, p), sqs.reshape(-1, p), jnp.sum(acs, axis=0)

    ms, sqs, acs = jax.lax.map(outer, jnp.arange(main // W))
    return ms.reshape(-1, p), sqs.reshape(-1, p), jnp.sum(acs, axis=0)


@jax.jit
def _combine_suffstats(chain_means, sq, acov_sum):
    """Combine per-chain sufficient statistics into (rhat, ess, pooled mean,
    pooled std), reproducing _withinvar + _ess exactly (stats.rs:439-450,
    523-573).  The pooled moments come free from the same statistics — the
    law of total variance over equal-length chains — so callers auditing
    sample moments need NO extra pass over the raw sample (a fresh
    full-sample reduce at the bench shape compiles a 12 GiB param-major
    relayout temp on TPU — the round-2/3 OOM signature)."""
    c, _ = chain_means.shape
    n = acov_sum.shape[0]
    overall = jnp.mean(chain_means, axis=0)
    b = jnp.sum((chain_means - overall) ** 2, axis=0) * (n / (c - 1.0))
    w = jnp.mean(sq, axis=0)
    v = ((n - 1.0) / n) * w + b / n
    rhat = jnp.sqrt(v / w)
    avg_rho = acov_sum / c
    rho = 1.0 - (w - avg_rho) / v
    ess = (c * n) / _geyer_tau(rho)
    # pooled biased variance = within + between (equal-length chains)
    pooled_var = w + jnp.mean((chain_means - overall) ** 2, axis=0)
    return rhat, ess, overall, jnp.sqrt(pooled_var)


def _plan_chunks(n0: int, c0: int, p: int, split: bool):
    """Chunk plan for the chains-chunked sufficient-statistics pass.

    Returns ``None`` when the whole sample fits one fused program, else
    ``(chunk, W, main)`` with ``chunk | W``, ``W | main``, ``main <= c0``:
    the nested-map program covers the first ``main`` chains; the
    ``c0 - main < chunk`` tail (only for chain counts without a convenient
    divisor) gets one extra small program.  Factored out so the
    compiled-memory test lowers EXACTLY the plan production uses."""
    c = 2 * c0 if split else c0
    n = (n0 // 2) if split else n0
    want = _ess_chain_chunk(c, n, p)
    if split:
        want = max(1, want // 2)  # want counts split chains; slices are pre-split
    if want >= c0:
        return None
    chunk = _pick_chain_chunk(c0, want)
    main = (c0 // chunk) * chunk
    n_chunks = main // chunk
    # Outer-block width: ~sqrt(#chunks) chunks per block balances the two
    # map levels, capped so a rotated block stays ≲ 1 GiB; must divide
    # n_chunks exactly (search down from the sqrt; M=1 always divides).
    per_chain_bytes = n0 * p * 4
    cap_chunks = max(1, int((2**30) // per_chain_bytes) // chunk)
    m_target = max(1, min(int(n_chunks**0.5), cap_chunks))
    M = next(d for d in range(m_target, 0, -1) if n_chunks % d == 0)
    return chunk, M * chunk, main


_tail_suffstats = functools.partial(
    jax.jit, static_argnames=("split", "steps_major")
)(_chunk_suffstats_of)


@functools.partial(jax.jit, static_argnames=("split", "steps_major"))
def _single_shot_stats(sample: jax.Array, split: bool, steps_major: bool):
    """One fused program for samples small enough to skip chunking."""
    blk = sample.astype(jnp.float32)
    if steps_major:
        blk = jnp.swapaxes(blk, 0, 1)
    if split:
        blk = _splitcat(blk)
    within, var = _withinvar(blk)
    rhat, ess = jnp.sqrt(var / within), _ess(blk, within, var)
    flat = blk.reshape(-1, blk.shape[-1])
    return rhat, ess, jnp.mean(flat, axis=0), jnp.std(flat, axis=0)


def _split_rhat_ess_impl(sample: jax.Array, split: bool = True,
                         steps_major: bool = False,
                         return_moments: bool = False):
    """Memory-bounded split-R-hat + ESS (+ optionally pooled moments),
    chunked over the CHAINS axis.

    The round-2 driver bench OOMed because the previous implementation
    chunked the *parameter* axis — on TPU the parameter axis is the minor
    (lane) axis, and slicing it forced XLA to repack the whole >10 GB
    sample param-major (a full-size padded relayout temp).  Chains are the
    sublane/batch axis: per-chain statistics combine exactly across chunks
    (autocovariance, within-chain variance, and chain means are all
    per-chain quantities), and :func:`_suffstats_all` computes every
    chunk's statistics in ONE nested-map program with ~1.7 GB of temps at
    the bench shape (design rationale in its docstring).  Verified by the
    compiled-memory test in tests/test_stats.py and by round-3 hardware
    runs at [3072, 10240, 100].
    """
    if steps_major:
        n0, c0, p = sample.shape
    else:
        c0, n0, p = sample.shape

    plan = _plan_chunks(n0, c0, p, split)
    if plan is None:
        rhat, ess, mean, std = _single_shot_stats(
            sample, split=split, steps_major=steps_major
        )
    else:
        chunk, W, main = plan
        ms, sqs, acs = _suffstats_all(
            sample, W, chunk, main, split=split, steps_major=steps_major
        )
        if main < c0:
            # < chunk-sized tail for chain counts without a convenient
            # divisor: one extra small program on a static tail slice.
            axis = 1 if steps_major else 0
            tail = jax.lax.slice_in_dim(sample, main, c0, axis=axis)
            m_t, sq_t, a_t = _tail_suffstats(
                tail, split=split, steps_major=steps_major
            )
            ms = jnp.concatenate([ms, m_t], axis=0)
            sqs = jnp.concatenate([sqs, sq_t], axis=0)
            acs = acs + a_t
        rhat, ess, mean, std = _combine_suffstats(ms, sqs, acs)
    if not return_moments:
        return rhat, ess
    return rhat, ess, mean, std


def chain_suffstats(sample, split: bool = True, steps_major: bool = False):
    """Per-(split-)chain sufficient statistics of a sample as PURE traced
    ops: ``(chain_means [C, p], sq [C, p], acov_sum [n, p])`` with
    ``C = 2·chains`` when ``split`` (half-chains) and ``n`` the
    (half-)chain length.  These are exactly the inputs
    :func:`_combine_suffstats` / :func:`combine_suffstats_host` reduce to
    (R-hat, ESS, pooled moments).

    Unlike :func:`split_rhat_mean_ess` this is embeddable inside a LARGER
    jitted program — e.g. chained directly onto a sampling scan
    (``core.run_kernel_stats``), so the diagnostics need no standalone
    compile.  Motivation (VERDICT round 4 #1): the remote-TPU tunnel's
    compile helper can flake stickily on a second big compile issued right
    after a big sampling program — two driver runs lost their logistic
    metric line to it even though sampling succeeded.  When the
    sufficient statistics ride in the sampling program itself, a
    successful sampling run *is* a successful diagnostics run; only a
    ~KB-scale host transfer and pure-numpy combine remain.

    Internally uses the same chains-chunked plan as the standalone path
    (``_plan_chunks`` → nested-map ``_suffstats_all``) so the FFT working
    set stays bounded at any sample size.
    """
    sample = jnp.asarray(sample)
    if steps_major:
        n0, c0, p = sample.shape
    else:
        c0, n0, p = sample.shape
    plan = _plan_chunks(n0, c0, p, split)
    if plan is None:
        return _tail_suffstats(sample, split=split, steps_major=steps_major)
    chunk, W, main = plan
    ms, sqs, acs = _suffstats_all(
        sample, W, chunk, main, split=split, steps_major=steps_major
    )
    if main < c0:
        axis = 1 if steps_major else 0
        tail = jax.lax.slice_in_dim(sample, main, c0, axis=axis)
        m_t, sq_t, a_t = _tail_suffstats(
            tail, split=split, steps_major=steps_major
        )
        ms = jnp.concatenate([ms, m_t], axis=0)
        sqs = jnp.concatenate([sqs, sq_t], axis=0)
        acs = acs + a_t
    return ms, sqs, acs


def _geyer_tau_np(rho: np.ndarray) -> np.ndarray:
    """Numpy mirror of :func:`_geyer_tau` (host-side combine)."""
    n = rho.shape[0]
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]
    positive_prefix = np.cumprod(pairs > 0.0, axis=0).astype(rho.dtype)
    mono = np.minimum.accumulate(pairs, axis=0)
    return -1.0 + 2.0 * np.sum(mono * positive_prefix, axis=0)


def combine_suffstats_host(chain_means, sq, acov_sum):
    """Pure-numpy mirror of :func:`_combine_suffstats`: per-chain sufficient
    statistics → ``(rhat, ess, pooled_mean, pooled_std)``.

    Host-side on purpose: the combine consumes KB-scale arrays, and running
    it through jax would issue a fresh device compile — the exact failure
    domain :func:`chain_suffstats` exists to remove (sticky tunnel-helper
    flake, VERDICT round 4 #1).  Agreement with the jitted combine is
    tested in tests/test_stats.py.
    """
    cm = np.asarray(chain_means, np.float64)
    sq = np.asarray(sq, np.float64)
    ac = np.asarray(acov_sum, np.float64)
    c = cm.shape[0]
    n = ac.shape[0]
    overall = cm.mean(axis=0)
    b = np.sum((cm - overall) ** 2, axis=0) * (n / (c - 1.0))
    w = sq.mean(axis=0)
    v = ((n - 1.0) / n) * w + b / n
    rhat = np.sqrt(v / w)
    avg_rho = ac / c
    rho = 1.0 - (w - avg_rho) / v
    ess = (c * n) / _geyer_tau_np(rho)
    pooled_var = w + np.mean((cm - overall) ** 2, axis=0)
    return rhat, ess, overall, np.sqrt(pooled_var)


def split_rhat_mean_ess(sample, steps_major: bool = False,
                        return_moments: bool = False):
    """Split-R-hat and ESS per parameter, Stan methodology
    (stats.rs:439-450).  ``sample`` is (chains, observations, parameters) —
    or the scan-native (observations, chains, parameters) with
    ``steps_major=True`` — each chain is split in half and both metrics are
    computed over the 2c half-chains, entirely on device.

    ``return_moments=True`` additionally returns the pooled per-parameter
    (mean, biased std) of the draws (split-sample pooled: for odd-length
    chains the dropped middle draw is excluded), derived from the SAME
    per-chain sufficient statistics — callers auditing sample moments against an
    analytic target must use this instead of reducing the raw sample
    themselves (a fresh full-sample reduce compiles a full param-major
    relayout temp at >10 GB shapes on TPU).
    """
    return _split_rhat_ess_impl(
        jnp.asarray(sample), split=True, steps_major=steps_major,
        return_moments=return_moments,
    )


# ---------------------------------------------------------------------------
# Rank-normalized diagnostics (Vehtari, Gelman, Simpson, Carpenter, Bürkner
# 2021, "Rank-normalization, folding, and localization: an improved R-hat").
# The reference lists these as unshipped roadmap work (lib.rs:225-227); this
# rebuild ships them.  Two execution paths, auto-dispatched on sample size
# exactly like the classic split-R-hat (``_plan_chunks``):
#
# - exact: pooled argsort ranks per parameter (moderate samples);
# - grid (memory-bounded, >10 GB samples): a chains-chunked scheme
#   mirroring ``_suffstats_all``'s design — pass A emits per-chunk sorted
#   quantile tables (every draw for small chunks, midpoint order statistics
#   beyond ``_RANK_SKETCH_Q``), which merge OUTSIDE the chunk maps into a
#   pooled ECDF at ``_RANK_GRID_K`` uniform grid knots (binary searches
#   cannot run inside a TPU ``lax.map``; see _pc_quantile_table); the
#   transform passes then re-read each chunk, map every draw through the
#   piecewise-linear ECDF (z = Φ⁻¹((r−3/8)/(S+1/4)) with r the interpolated
#   pooled count) and reduce the transformed series to per-chain sufficient
#   statistics on the spot.  Two approximations, both shared monotone-map
#   distortions (the statistic remains an exact rank-R-hat of a discretized
#   transform): within-grid-cell linear interpolation of ranks
#   (O(density·range/K) ≈ 1e-4 CDF units at the default K) and, for
#   chunks bigger than ``_RANK_SKETCH_Q`` draws, the quantile-table
#   subsampling (rank error ≤ (draws/Q)/2 per chunk, ≈1.2e-4 pooled at
#   the bench shape; chunks at or below Q stay exact).  Folded R-hat and
#   the 5%/95% tail cuts come from the SAME grid ECDF
#   (F_ζ(t) = F(med+t) − F(med−t)), so no extra SORTING passes are needed.
#
#   The transform work is split across THREE chunked programs (bulk /
#   folded / tail indicators) instead of one.  Round-4 hardware finding
#   (bench-shape bisect, 10 probe variants): beyond the in-map binary-
#   search crash above, the TPU runtime deterministically faults
#   ("UNAVAILABLE: TPU device error") on chunk-map bodies that combine
#   table-interpolation gathers and FFTs past a threshold — two interp
#   pairs into two DIFFERENT [K, p] tables fault even with no FFT; one
#   pair + the 3 tail FFTs faults; one wider [K, 2p] pair faults; while
#   one interp pair + one FFT (bulk), one pair + no FFT (folded), two
#   pairs into the SAME table + one FFT, and gather-free bodies all pass.
#   Each split program sits in a directly-probed-safe envelope; the extra
#   sample reads cost ~seconds at the >10 GB scale that enables this path.
# ---------------------------------------------------------------------------

# ECDF grid resolution for the memory-bounded rank path.  [K, p] f32 tables
# are ~13 MB at the bench's p=100 — negligible next to the >10 GB sample that
# triggers this path.
_RANK_GRID_K = 32768


def _as_chains_major(sample, steps_major: bool) -> jax.Array:
    x = jnp.asarray(sample, jnp.float32)
    return jnp.swapaxes(x, 0, 1) if steps_major else x


# Largest f32 strictly below 1.  The Blom quantile (r − 3/8)/(S + 1/4) is
# < 1 in real arithmetic, but for S ≳ 2²³ draws both numerator and
# denominator round to S in f32 and the ratio lands EXACTLY on 1.0 — and
# ndtri(1) = +inf then poisons every downstream mean/FFT (found at the
# 31.4M-draw bench shape; z saturates at ~5.5 there, so clamping to the
# open interval is exact to f32 resolution).  Symmetric tiny floor for the
# low end.
_Q_HI = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
_Q_LO = 1e-30


def _blom_z(r, total):
    """z = Φ⁻¹((r − 3/8)/(S + 1/4)) with the quantile clamped to the open
    unit interval (see _Q_HI)."""
    from jax.scipy.special import ndtri

    return ndtri(jnp.clip((r - 0.375) / (total + 0.25), _Q_LO, _Q_HI))


def _rank_normalize(x: jax.Array) -> jax.Array:
    """Pooled fractional-rank normal transform per parameter: ranks over all
    c·n draws, z = Φ⁻¹((r − 3/8)/(S + 1/4)) (Vehtari et al. 2021, eq. 14;
    Blom offsets).  Ties (measure-zero for continuous draws) break by sort
    order."""
    c, n, p = x.shape
    flat = x.reshape(c * n, p)
    # rank = position in sort order: argsort(argsort) gives 0-based ranks
    r = jnp.argsort(jnp.argsort(flat, axis=0), axis=0).astype(jnp.float32) + 1.0
    z = _blom_z(r, jnp.float32(c * n))
    return z.reshape(c, n, p)


def _split_rhat_of(x: jax.Array) -> jax.Array:
    blk = _splitcat(x)
    within, var = _withinvar(blk)
    return jnp.sqrt(var / within)


class RankSummary(NamedTuple):
    """Joint output of the rank-normalized diagnostics (one shared set of
    data passes — the efficient entry point for >10 GB samples)."""

    rhat: jax.Array  # max(bulk, folded) rank-normalized split-R-hat [p]
    ess_bulk: jax.Array  # split ESS of the rank-normal draws [p]
    ess_tail: jax.Array  # min(5%, 95%) quantile-indicator split ESS [p]


def _dispatch_rank(sample, steps_major: bool, method: str):
    """Pick exact vs grid path: same size heuristic as the classic
    diagnostics (``_plan_chunks`` returning a plan means the sample is too
    big for single-program full-sample math)."""
    if method not in ("auto", "exact", "grid"):
        raise ValueError(f"method must be auto|exact|grid, got {method!r}")
    if method != "auto":
        return method
    if steps_major:
        n0, c0, p = jnp.shape(sample)
    else:
        c0, n0, p = jnp.shape(sample)
    return "exact" if _plan_chunks(n0, c0, p, split=True) is None else "grid"


def rank_normalized_rhat(sample, steps_major: bool = False,
                         method: str = "auto") -> jax.Array:
    """max(bulk, folded) rank-normalized split-R-hat per parameter.

    ``bulk`` is split-R-hat of the rank-normal-transformed draws (catches
    location disagreement robustly, even for heavy-tailed targets);
    ``folded`` applies the same transform to ζ = |θ − median(θ)| (catches
    SCALE disagreement, which classic R-hat is blind to: chains with equal
    means but different variances pass sqrt(V̂/W) ≈ 1).  Convergence gate:
    max < 1.01 (Vehtari et al. 2021 recommend this over 1.1).

    ``method="auto"`` switches to the memory-bounded grid-ECDF path for
    samples too large for pooled sorts (section comment above); when you
    also need ``ess_bulk``/``ess_tail`` on such a sample, call
    :func:`rank_normalized_summary` once instead of the three functions
    (they would each redo the chunked passes)."""
    if _dispatch_rank(sample, steps_major, method) == "grid":
        return _rank_grid_summary(sample, steps_major).rhat
    x = _as_chains_major(sample, steps_major)
    bulk = _split_rhat_of(_rank_normalize(x))
    med = jnp.median(x.reshape(-1, x.shape[-1]), axis=0)
    folded = _split_rhat_of(_rank_normalize(jnp.abs(x - med)))
    return jnp.maximum(bulk, folded)


def ess_bulk(sample, steps_major: bool = False,
             method: str = "auto") -> jax.Array:
    """Split ESS of the rank-normal-transformed draws (Vehtari et al. 2021
    §4.1) — the robust replacement for mean-ESS on heavy-tailed targets."""
    if _dispatch_rank(sample, steps_major, method) == "grid":
        return _rank_grid_summary(sample, steps_major).ess_bulk
    x = _as_chains_major(sample, steps_major)
    blk = _splitcat(_rank_normalize(x))
    within, var = _withinvar(blk)
    return _ess(blk, within, var)


def ess_tail(sample, steps_major: bool = False,
             method: str = "auto") -> jax.Array:
    """Tail ESS: min over the 5% and 95% pooled-quantile indicator series of
    their split ESS (Vehtari et al. 2021 §4.3).  Low tail-ESS flags
    unreliable credible-interval endpoints even when bulk ESS looks fine.
    Degenerate (constant) indicator series yield NaN."""
    if _dispatch_rank(sample, steps_major, method) == "grid":
        return _rank_grid_summary(sample, steps_major).ess_tail
    x = _as_chains_major(sample, steps_major)
    flat = x.reshape(-1, x.shape[-1])

    def ess_q(q):
        cut = jnp.quantile(flat, q, axis=0)
        ind = (x <= cut).astype(jnp.float32)
        blk = _splitcat(ind)
        within, var = _withinvar(blk)
        return _ess(blk, within, var)

    return jnp.minimum(ess_q(0.05), ess_q(0.95))


def rank_normalized_summary(sample, steps_major: bool = False,
                            method: str = "auto") -> RankSummary:
    """All three rank-normalized diagnostics in one call.

    On the grid path this shares the chunked data passes (3 reads of the
    sample total instead of 3 per statistic); on the exact path it simply
    collects the three full-sample computations."""
    if _dispatch_rank(sample, steps_major, method) == "grid":
        return _rank_grid_summary(sample, steps_major)
    return RankSummary(
        rhat=rank_normalized_rhat(sample, steps_major, method="exact"),
        ess_bulk=ess_bulk(sample, steps_major, method="exact"),
        ess_tail=ess_tail(sample, steps_major, method="exact"),
    )


# -- memory-bounded grid-ECDF path ------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("per_chunk", "W", "chunk", "main", "steps_major")
)
def _chunked_chains_pass(sample, consts, per_chunk, W: int, chunk: int,
                         main: int, steps_major: bool):
    """Generic nested-map over chains-chunks — the same two-level ``lax.map``
    structure as :func:`_suffstats_all` (see its docstring for why that
    exact shape: single dispatch, O(1) executables, ~GB-bounded temps).

    ``per_chunk(blk, consts)`` takes a ``[chunk, n, p]`` chains-major block
    and returns ``(stack_tree, sum_tree)``: leaves of the first MUST carry a
    leading per-chunk axis (e.g. split-chain rows) and are concatenated
    across all ``main // chunk`` chunks; leaves of the second are summed.
    ``consts`` is a pytree of small traced arrays shared by every chunk
    (grid tables, cuts)."""
    axis = 1 if steps_major else 0
    merge = lambda a: a.reshape((-1,) + a.shape[2:])

    def outer(g):
        blk1 = jax.lax.dynamic_slice_in_dim(sample, g * W, W, axis=axis)
        if steps_major:
            blk1 = jnp.swapaxes(blk1, 0, 1)

        def inner(k):
            blk = jax.lax.dynamic_slice_in_dim(blk1, k * chunk, chunk, axis=0)
            return per_chunk(blk, consts)

        st, sm = jax.lax.map(inner, jnp.arange(W // chunk))
        return (
            jax.tree.map(merge, st),
            jax.tree.map(lambda a: jnp.sum(a, axis=0), sm),
        )

    st, sm = jax.lax.map(outer, jnp.arange(main // W))
    st = jax.tree.map(merge, st)
    return st, jax.tree.map(lambda a: jnp.sum(a, axis=0), sm)


def _run_chunked_pass(sample, consts, per_chunk, plan, steps_major, c0):
    """Main nested-map program + the < chunk-sized tail program (chain
    counts without a convenient divisor), combined: stacked leaves
    concatenate, summed leaves add."""
    chunk, W, main = plan
    st, sm = _chunked_chains_pass(
        sample, consts, per_chunk, W, chunk, main, steps_major
    )
    if main < c0:
        axis = 1 if steps_major else 0
        tail = jax.lax.slice_in_dim(sample, main, c0, axis=axis)
        if steps_major:
            tail = jnp.swapaxes(tail, 0, 1)
        st_t, sm_t = jax.jit(per_chunk)(tail, consts)
        st = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), st, st_t
        )
        sm = jax.tree.map(jnp.add, sm, sm_t)
    return st, sm


def _pc_minmax(blk, consts):
    """Pass 0: per-parameter min/max of one chunk ([1, p] leading chunk
    axis per the stack-tree contract)."""
    del consts
    blk = blk.astype(jnp.float32)
    return (
        {
            "lo": jnp.min(blk, axis=(0, 1))[None, :],
            "hi": jnp.max(blk, axis=(0, 1))[None, :],
        },
        {},
    )


# Per-chunk quantile-table size for the grid rank path's pass A.  Chunks
# with ≤ this many draws emit every sorted draw (the merged ECDF is then
# EXACT at the grid knots); bigger chunks emit midpoint order statistics,
# bounding the rank error of any downstream query by ~(draws/Q)/2 per
# chunk (≈1.2e-4 of the pooled rank at the bench shape).
_RANK_SKETCH_Q = 4096


def _pc_quantile_table(blk, consts, Q: int):
    """Pass A: per-chunk sorted quantile table at FIXED positions.

    Emits ``q = min(Q, draws)`` midpoint order statistics (positions
    ``floor((j+0.5)·m/q)``) plus the per-row draw mass ``m/q``.  Only
    map-safe ops: sort, constant-index take.  This replaces an in-map
    ``searchsorted`` over the uniform grid — round-4 hardware finding:
    data-DEPENDENT gather chains (binary search — ``jnp.searchsorted``
    or a hand-rolled fixed-trip variant) deterministically CRASH the TPU
    inside a ``lax.map`` body, while the same ops standalone and
    constant/single-level data-dependent gathers in-map are fine.  The
    grid counting therefore happens OUTSIDE the maps, on the merged
    tables (:func:`_weighted_counts_at_grid`)."""
    del consts
    cc, n, p = blk.shape
    m = cc * n
    q = min(Q, m)
    flat = jnp.sort(blk.astype(jnp.float32).reshape(m, p), axis=0)
    pos = np.clip(((np.arange(q) + 0.5) * m / q).astype(np.int64), 0, m - 1)
    table = jnp.take(flat, jnp.asarray(pos, jnp.int32), axis=0)  # [q, p]
    return {"table": table, "weight": jnp.full((1,), m / q, jnp.float32)}, {}


@functools.lru_cache(maxsize=8)
def _quantile_table_fn(Q: int):
    """Stable (hash-cached) per-Q partial: ``per_chunk`` is a jit static
    argument, and a fresh ``functools.partial`` per call would miss the
    jit cache and re-trace every invocation."""
    return functools.partial(_pc_quantile_table, Q=Q)


def _weighted_counts_at_grid(vals, wrows, grid):
    """Weighted pooled counts ≤ each grid knot from merged chunk tables:
    co-sort (values, row masses) per parameter, prefix-sum the masses,
    read the prefix at ``searchsorted`` positions.  Runs standalone (not
    inside a chunk map), so ``jnp.searchsorted`` is safe here.  Exact
    counts whenever every chunk emitted all of its draws with mass 1."""
    order = jnp.argsort(vals, axis=0)
    vs = jnp.take_along_axis(vals, order, axis=0)
    ws = jnp.take_along_axis(
        jnp.broadcast_to(wrows[:, None], vals.shape), order, axis=0
    )
    cumw = jnp.cumsum(ws, axis=0)
    idx = jax.vmap(
        lambda col, g: jnp.searchsorted(col, g, side="right"),
        in_axes=(1, 1), out_axes=1,
    )(vs, grid)  # [K, p]
    return jnp.where(
        idx > 0,
        jnp.take_along_axis(cumw, jnp.clip(idx - 1, 0, vals.shape[0] - 1), axis=0),
        jnp.zeros((), jnp.float32),
    )


def _interp_counts(x, lo, w, F):
    """Piecewise-linear interpolation of the pooled count function at the
    draws: F is [K, p] counts-at-grid, x is [..., p] in original units."""
    K = F.shape[0]
    p = F.shape[1]
    t = (x - lo) / w  # grid coordinates in [0, K-1]
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, K - 2)
    frac = jnp.clip(t - i0.astype(t.dtype), 0.0, 1.0)
    flat_i0 = i0.reshape(-1, p)
    F0 = jnp.take_along_axis(F, flat_i0, axis=0).reshape(x.shape)
    F1 = jnp.take_along_axis(F, flat_i0 + 1, axis=0).reshape(x.shape)
    return F0 + frac * (F1 - F0)


def _grid_z(x, lo, w, F, total):
    """Rank-normal transform through the grid ECDF: z = Φ⁻¹((r−3/8)/(S+1/4))
    with r the interpolated pooled count (Blom offsets and open-interval
    quantile clamp as in :func:`_blom_z`; r clipped to [1, S] like true
    ranks)."""
    r = jnp.clip(_interp_counts(x, lo, w, F), 1.0, total)
    return _blom_z(r, total)


def _suff(series, with_acov):
    """Split-chain means/sq (and optionally the pooled autocovariance sum)
    of one derived series — the shared reduction of the transform passes."""
    s = _splitcat(series)
    means = jnp.mean(s, axis=1)
    sq = jnp.mean((s - means[:, None, :]) ** 2, axis=1)
    if not with_acov:
        return (means, sq), ()
    return (means, sq), (jnp.sum(autocov_fft(s), axis=0),)


def _pc_rank_bulk(blk, consts):
    """Transform pass 1 of 3: bulk rank-normal z — ONE interp-gather pair
    (the F table) + ONE FFT, the probe-proven safe combination (section
    comment)."""
    x = blk.astype(jnp.float32)
    z = _grid_z(x, consts["lo"], consts["w"], consts["F"], consts["total"])
    (mb, sb), (ab,) = _suff(z, True)
    return {"bulk": (mb, sb)}, {"acov_bulk": ab}


def _pc_rank_fold(blk, consts):
    """Transform pass 2 of 3: folded rank-normal z — one interp-gather pair
    (the derived Fζ table), no FFT (folded feeds R-hat only)."""
    x = blk.astype(jnp.float32)
    z = _grid_z(
        jnp.abs(x - consts["med"]), consts["zlo"], consts["zw"],
        consts["Fz"], consts["total"],
    )
    (mf, sf), () = _suff(z, False)
    return {"fold": (mf, sf)}, {}


def _pc_rank_tail(blk, consts):
    """Transform pass 3 of 3: the 5%/95% tail indicator series — gather-free
    comparisons + two FFTs."""
    x = blk.astype(jnp.float32)
    (m5, s5), (a5,) = _suff((x <= consts["q05"]).astype(jnp.float32), True)
    (m9, s9), (a9,) = _suff((x <= consts["q95"]).astype(jnp.float32), True)
    return {"i05": (m5, s5), "i95": (m9, s9)}, {"acov_i05": a5, "acov_i95": a9}


def _inverse_ecdf(F_frac, lo, w, level):
    """Inverse of the piecewise-linear grid ECDF at ``level`` per parameter:
    linear interpolation between the bracketing grid knots."""
    K = F_frac.shape[0]
    # index of the last knot strictly below the level (monotone F)
    i = jnp.clip(
        jnp.sum((F_frac < level).astype(jnp.int32), axis=0) - 1, 0, K - 2
    )  # [p]
    i2 = i[None, :]
    F0 = jnp.take_along_axis(F_frac, i2, axis=0)[0]
    F1 = jnp.take_along_axis(F_frac, i2 + 1, axis=0)[0]
    frac = jnp.clip((level - F0) / jnp.maximum(F1 - F0, 1e-12), 0.0, 1.0)
    return lo + (i.astype(jnp.float32) + frac) * w


def _rank_grid_summary(sample, steps_major: bool) -> RankSummary:
    """Memory-bounded rank-normalized diagnostics (section comment above):
    three chunked passes — min/max, grid-ECDF counts, transformed-series
    sufficient statistics — reusing the classic path's chunk plan and
    combine math."""
    sample = jnp.asarray(sample)
    if steps_major:
        n0, c0, p = sample.shape
    else:
        c0, n0, p = sample.shape
    plan = _plan_chunks(n0, c0, p, split=True)
    if plan is None:  # tiny sample forced onto this path (tests)
        plan = (c0, c0, c0)
    K = _RANK_GRID_K
    total = jnp.float32(c0 * n0)

    # pass 0: per-parameter range
    st, _ = _run_chunked_pass(sample, {}, _pc_minmax, plan, steps_major, c0)
    lo = jnp.min(st["lo"], axis=0)
    hi = jnp.max(st["hi"], axis=0)
    w = jnp.maximum(hi - lo, jnp.float32(1e-30)) / (K - 1)

    # pass A: per-chunk quantile tables (map-safe), merged + counted at the
    # K uniform knots outside the maps (see _pc_quantile_table for why the
    # counting cannot live inside the chunk map on TPU)
    grid = lo[None, :] + w[None, :] * jnp.arange(K, dtype=jnp.float32)[:, None]
    st, _ = _run_chunked_pass(
        sample, {}, _quantile_table_fn(_RANK_SKETCH_Q), plan, steps_major, c0
    )
    tables = st["table"]  # [R, p]: all chunks' rows concatenated
    wchunk = st["weight"]  # [n_chunks(+tail)] per-row draw mass by chunk
    chunk, _W, main = plan
    q_main = min(_RANK_SKETCH_Q, chunk * n0)
    n_main = main // chunk
    rows = [jnp.repeat(wchunk[:n_main], q_main, total_repeat_length=n_main * q_main)]
    if main < c0:
        q_tail = min(_RANK_SKETCH_Q, (c0 - main) * n0)
        rows.append(jnp.repeat(wchunk[n_main:], q_tail,
                               total_repeat_length=q_tail))
    wrows = jnp.concatenate(rows)
    F = _weighted_counts_at_grid(tables, wrows, grid)  # [K, p] ~counts ≤ knot
    F_frac = F / total

    # pooled median and tail cuts from the same grid ECDF
    med = _inverse_ecdf(F_frac, lo, w, 0.5)
    q05 = _inverse_ecdf(F_frac, lo, w, 0.05)
    q95 = _inverse_ecdf(F_frac, lo, w, 0.95)

    # folded ECDF on a ζ = |x − med| grid, derived from F (no extra pass):
    # count(ζ ≤ t) = count(x ≤ med+t) − count(x < med−t) ≈ F(med+t) − F(med−t)
    zhi = jnp.maximum(hi - med, med - lo)
    zw = jnp.maximum(zhi, jnp.float32(1e-30)) / (K - 1)
    zgrid = zw[None, :] * jnp.arange(K, dtype=jnp.float32)[:, None]
    Fz = _interp_counts(med[None, :] + zgrid, lo, w, F) - _interp_counts(
        med[None, :] - zgrid, lo, w, F
    )
    Fz = jnp.maximum(jax.lax.cummax(Fz, axis=0), 0.0)  # monotone, ≥ 0

    consts = {
        "lo": lo, "w": w, "F": F, "zlo": jnp.zeros_like(lo), "zw": zw,
        "Fz": Fz, "total": total, "med": med, "q05": q05, "q95": q95,
    }
    # three probe-proven programs instead of one (section comment: the TPU
    # runtime faults on bigger gather+FFT combinations in one map body)
    st, sm = {}, {}
    for pc in (_pc_rank_bulk, _pc_rank_fold, _pc_rank_tail):
        st_i, sm_i = _run_chunked_pass(sample, consts, pc, plan, steps_major, c0)
        st.update(st_i)
        sm.update(sm_i)

    def combine(key, acov_key):
        means, sq = st[key]
        rhat, ess, _, _ = _combine_suffstats(means, sq, sm[acov_key])
        return rhat, ess

    rhat_bulk, essb = combine("bulk", "acov_bulk")
    ess5 = combine("i05", "acov_i05")[1]
    ess9 = combine("i95", "acov_i95")[1]
    # folded R-hat needs no ESS: combine means/sq directly
    mf, sf = st["fold"]
    nsplit = (n0 // 2) or float("nan")
    overall = jnp.mean(mf, axis=0)
    b = jnp.sum((mf - overall) ** 2, axis=0) * (nsplit / (mf.shape[0] - 1.0))
    wth = jnp.mean(sf, axis=0)
    v = ((nsplit - 1.0) / nsplit) * wth + b / nsplit
    rhat_fold = jnp.sqrt(v / wth)

    return RankSummary(
        rhat=jnp.maximum(rhat_bulk, rhat_fold),
        ess_bulk=essb,
        ess_tail=jnp.minimum(ess5, ess9),
    )


def ess_from_chainstats(sample, chain_stats: list[ChainStats]) -> jax.Array:
    """ESS using streaming (unsplit) chain statistics (stats.rs:695-698)."""
    sample = jnp.asarray(sample, jnp.float32)
    means = jnp.stack([cs.mean for cs in chain_stats])
    sm2s = jnp.stack([cs.sm2 for cs in chain_stats])
    ns = jnp.stack([jnp.asarray(cs.n, jnp.float32) for cs in chain_stats])
    within = jnp.mean(sm2s, axis=0)
    gmean = jnp.mean(means, axis=0)
    c = means.shape[0]
    between = jnp.sum((means - gmean) ** 2, axis=0) / (c - 1.0)
    n = jnp.mean(ns)
    var = between + within * ((n - 1.0) / n)
    return _ess(sample, within, var)


# ---------------------------------------------------------------------------
# Summaries
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BasicStats:
    """min/median/max/mean/std summary of a metric vector (stats.rs:396-415)."""

    name: str
    min: float
    median: float
    max: float
    mean: float
    std: float

    def __str__(self):
        return (
            f"{self.name} in [{self.min:.2f}, {self.max:.2f}], "
            f"median: {self.median:.2f}, mean: {self.mean:.2f} ± {self.std:.2f}"
        )


def basic_stats(name: str, data) -> BasicStats:
    """Summary statistics matching basic_stats (stats.rs:342-368): data is
    sorted descending and the median taken at index len//2 of that order."""
    arr = np.sort(np.asarray(jax.device_get(data)).ravel())[::-1]
    return BasicStats(
        name=name,
        min=float(arr[-1]),
        median=float(arr[len(arr) // 2]),
        max=float(arr[0]),
        mean=float(arr.mean()),
        std=float(arr.std(ddof=1)) if len(arr) > 1 else 0.0,
    )


@dataclasses.dataclass
class RunStats:
    """ESS + split-R-hat summaries of a finished run (stats.rs:370-394).

    ``rank_rhat``/``tail_ess`` (rank-normalized max(bulk, folded) R-hat and
    tail ESS, Vehtari et al. 2021) are populated by
    ``from_sample(..., rank_normalized=True)`` — diagnostics the reference
    only roadmapped (lib.rs:225-227)."""

    ess: BasicStats
    rhat: BasicStats
    rank_rhat: BasicStats | None = None
    tail_ess: BasicStats | None = None

    def __str__(self):
        lines = [str(self.ess), str(self.rhat)]
        if self.rank_rhat is not None:
            lines.append(str(self.rank_rhat))
        if self.tail_ess is not None:
            lines.append(str(self.tail_ess))
        return "\n".join(lines)

    @classmethod
    def from_sample(cls, sample, rank_normalized: bool = False) -> "RunStats":
        rhat, ess = split_rhat_mean_ess(sample)
        extra = {}
        if rank_normalized:
            extra = dict(
                rank_rhat=basic_stats(
                    "Rank-normalized R-hat", rank_normalized_rhat(sample)
                ),
                tail_ess=basic_stats("Tail ESS", ess_tail(sample)),
            )
        return cls(
            ess=basic_stats("ESS", ess),
            rhat=basic_stats("Split R-hat", rhat),
            **extra,
        )
