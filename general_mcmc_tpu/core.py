"""Chain runtime: initializers and the fused scan-based chain runner.

The Rust reference's chain runtime (core.rs) runs each chain in its own Rayon
task around a serial hot loop (``run_chain``, core.rs:95-115) and aggregates
progress via mpsc channels (``ChainRunner::run_progress``, core.rs:251-403).
The TPU-native design inverts this: *all* chains advance together as one
batched tensor program — a single ``lax.scan`` over steps whose body is the
(vmapped) transition kernel — so the whole sampling run is one XLA program
with no host round-trips.  Burn-in and collection are two scans sharing the
same step function (discard scan carries no outputs, so XLA allocates nothing
for it).

Progress mode (the analog of core.rs:251-403's channel/progress-bar plumbing)
chunk-wise re-enters jit from the host at a throttled cadence; the hot path of
``run`` itself contains zero callbacks.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .rng import as_key

__all__ = [
    "init",
    "init_det",
    "init_with_seed",
    "advance_kernel",
    "run_kernel",
    "run_kernel_stats",
    "run_kernel_progress",
    "run_kernel_progress_stream",
    "KernelRun",
    "KernelRunStats",
]

DEFAULT_SEED = 42  # init_det's fixed seed, matching core.rs:449-452.


def init_with_seed(n_chains: int, dim: int, seed, dtype=jnp.float32) -> jax.Array:
    """n_chains × dim standard-normal starting positions (core.rs:456-459)."""
    return jax.random.normal(as_key(seed), (n_chains, dim), dtype=dtype)


def init_det(n_chains: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Deterministic standard-normal inits with seed 42 (core.rs:449-452)."""
    return init_with_seed(n_chains, dim, DEFAULT_SEED, dtype=dtype)


def init(n_chains: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Random standard-normal starting positions (core.rs:434-444)."""
    import random

    return init_with_seed(n_chains, dim, random.getrandbits(63), dtype=dtype)


class KernelRun(NamedTuple):
    """Result of a raw kernel run: final carry + collected states."""

    carry: Any
    # [n_collect, n_chains, dim] states, in collection order.
    samples: jax.Array


class KernelRunStats(NamedTuple):
    """Result of :func:`run_kernel_stats`: final carry, collected states,
    and the per-split-chain diagnostic sufficient statistics computed
    INSIDE the collection program."""

    carry: Any
    samples: jax.Array  # [n_collect, n_chains, dim], steps-major
    # (chain_means [2c, p], sq [2c, p], acov_sum [n_collect//2, p]) —
    # feed to diagnostics.stats.combine_suffstats_host for (rhat, ess,
    # pooled mean, pooled std) with zero further device compiles.
    suffstats: tuple


def _scan_steps(step_fn, carry, start: int, n_steps: int, collect: bool,
                thin: int = 1):
    """Scan ``step_fn`` over absolute step indices [start, start+n_steps·thin);
    when collecting, only every ``thin``-th post-step state is recorded (the
    scan body advances ``thin`` transitions, so skipped states never hit HBM)."""

    def advance(c, m0):
        if thin == 1:
            return step_fn(c, m0)
        return jax.lax.fori_loop(0, thin, lambda k, cc: step_fn(cc, m0 + k), c)

    def body(c, m0):
        c = advance(c, m0)
        out = step_fn.extract(c) if collect else None
        return c, out

    steps = jnp.arange(start, start + n_steps * thin, thin)
    carry, ys = jax.lax.scan(body, carry, steps)
    return carry, ys


def _run_impl(step_fn, carry, n_collect: int, n_discard: int, offset: int,
              thin: int = 1):
    if n_discard > 0:
        carry, _ = _scan_steps(step_fn, carry, offset, n_discard, collect=False)
    carry, samples = _scan_steps(
        step_fn, carry, offset + n_discard, n_collect, collect=True, thin=thin
    )
    return carry, samples


_run_compiled = functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))(
    _run_impl
)


def _run_stats_impl(step_fn, carry, n_collect: int, n_discard: int,
                    offset: int, thin: int = 1):
    """:func:`_run_impl` + per-split-chain diagnostic sufficient statistics
    of the collected samples, all in ONE traced program (the samples stay
    in their scan-native steps-major layout; ``chain_suffstats`` consumes
    that orientation directly)."""
    from .diagnostics.stats import chain_suffstats

    carry, samples = _run_impl(step_fn, carry, n_collect, n_discard, offset,
                               thin)
    ms, sqs, acs = chain_suffstats(samples, split=True, steps_major=True)
    return carry, samples, (ms, sqs, acs)


_run_stats_compiled = functools.partial(
    jax.jit, static_argnums=(0, 2, 3, 4, 5)
)(_run_stats_impl)

# Per-device cache of layout-pinned runners (see _pinned_runner).
_PINNED_RUNNERS: dict = {}
_PINNED_STATS_RUNNERS: dict = {}


def _pinned_runner(dev):
    """A jitted runner whose SAMPLES output entry layout is pinned
    steps-major: ``major_to_minor=(0, 2, 1)`` — steps, then dim, chains on
    the minor (lane) axis.

    Left to itself the TPU compiler picks a d-MAJOR layout ({1,0,2}) for
    the [steps, chains, dim] scan buffer, turning every per-step store into
    ~8× write-amplified strided plane writes — profiled at 217 µs per
    4.1 MB slice, 3× the whole collection step's compute on the benchmark
    shapes.  `jax.experimental.layout.with_layout_constraint` does NOT fix
    this: jax 0.9 emits the LayoutConstraint custom-call with swapped
    operand/result conventions and XLA drops it (AOT HLO shows the buffer
    still {1,0,2} and no constraint surviving).  Pinning the ENTRY
    computation output layout via jit(out_shardings=Format(...)) IS
    honored and propagates steps-major into the while-loop buffer, making
    every per-step store contiguous.  Measured on the ChEES collection
    program (1024×10240×100): 347 → 123 µs/draw (2.8×).

    Why (0, 2, 1) and not row-major (0, 1, 2): XLA's loop buffer is
    steps-major-chains-minor either way (it minimizes padding: d pads
    100→104 sublanes vs 100→128 lanes); requesting row-major therefore
    appends a full relayout copy — ~10 ms AND a second 16 GiB buffer at
    the bench shape (3072×10240×100), an OOM where the copy-free (0,2,1)
    pin peaks at 13.1 GiB (the pre-pin d-major buffer was 12.6 GiB).
    Chains stay the minor axis exactly as in the pre-pin layout, so the
    chains-chunked diagnostics see the orientation they were probed with
    in round 3 (traced-offset lane slices — safe; stats._suffstats_all).
    """
    try:
        return _PINNED_RUNNERS[dev]
    except KeyError:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        fmt = Format(
            Layout(major_to_minor=(0, 2, 1)), SingleDeviceSharding(dev)
        )
        runner = jax.jit(
            _run_impl,
            static_argnums=(0, 2, 3, 4, 5),
            out_shardings=(None, fmt),
        )
        _PINNED_RUNNERS[dev] = runner
        return runner


def _pinned_stats_runner(dev):
    """Layout-pinned variant of :func:`_run_stats_impl` (same rationale and
    (0, 2, 1) samples pin as :func:`_pinned_runner`; the KB-scale suffstats
    outputs keep default layouts)."""
    try:
        return _PINNED_STATS_RUNNERS[dev]
    except KeyError:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        fmt = Format(
            Layout(major_to_minor=(0, 2, 1)), SingleDeviceSharding(dev)
        )
        runner = jax.jit(
            _run_stats_impl,
            static_argnums=(0, 2, 3, 4, 5),
            out_shardings=(None, fmt, None),
        )
        _PINNED_STATS_RUNNERS[dev] = runner
        return runner


def _pin_device(step_fn, carry, n_collect: int):
    """The device to pin the samples layout on, or None to run unpinned.

    Pinning applies only where the write-amplification pathology exists and
    the entry-layout mechanism is valid: a non-CPU backend, every carry
    leaf resident on ONE common device (sharded runs keep jit-inferred
    shardings), and a plain 2-D non-PRNG-key extract (PRNG-key arrays hide
    a trailing dim, so their ndim lies to the layout API)."""
    if n_collect == 0 or jax.default_backend() == "cpu":
        return None
    dev = None
    for leaf in jax.tree.leaves(carry):
        if isinstance(leaf, jax.core.Tracer):
            return None  # nested-trace caller — leave layouts alone
        if not isinstance(leaf, jax.Array):
            continue  # python/numpy scalar: placed on the default device
        ds = leaf.sharding.device_set
        if len(ds) != 1:
            return None
        (d,) = ds
        if dev is None:
            dev = d
        elif d != dev:
            return None
    if dev is None or dev.platform == "cpu":
        return None
    snap = jax.eval_shape(step_fn.extract, carry)
    leaves = jax.tree.leaves(snap)
    if len(leaves) != 1 or leaves[0].ndim != 2 or jnp.issubdtype(
        leaves[0].dtype, jax.dtypes.prng_key
    ):
        return None
    return dev


def run_kernel(step_fn, carry, n_collect: int, n_discard: int,
               step_offset: int = 0, thin: int = 1) -> KernelRun:
    """Advance a transition kernel ``n_discard + n_collect·thin`` steps,
    collecting every ``thin``-th post-step state of the last ``n_collect·thin``
    (run_chain, core.rs:95-115; thinning is an extension — the per-step RNG
    is position-indexed, so a thinned run visits exactly the states of the
    unthinned run and records a strided subset without staging the rest).

    ``step_fn`` must be hashable (use a module-level function or a frozen
    dataclass) with signature ``step_fn(carry, m) -> carry`` where ``m`` is the
    absolute 0-based step index, and expose ``step_fn.extract(carry)`` mapping
    a carry to the [n_chains, dim] state snapshot to record.  ``step_offset``
    shifts the step indices — resumed runs use it so per-step RNG streams
    never replay the original segment's.

    Burn-in and collection are dispatched as TWO compiled programs (one
    host round-trip, ~1 ms): TPU-profiled, the two-scans-in-one-program
    form makes the compiler schedule the collection body ~15% slower per
    step (+0.36 ms on the benchmark shapes, ~1 s per default run) than the
    identical body compiled alone.  Trajectories are unchanged — the RNG
    is position-indexed, so splitting is invisible to sampling semantics.
    """
    if thin < 1:
        raise ValueError(f"thin must be >= 1, got {thin}")
    if n_discard > 0 and n_collect > 0 and jax.default_backend() != "cpu":
        # TPU only: on CPU the scheduling pathology doesn't exist and the
        # split would just double every test's compile count.
        carry, _ = _run_compiled(step_fn, carry, 0, n_discard, step_offset, 1)
        step_offset += n_discard
        n_discard = 0
    pin_dev = _pin_device(step_fn, carry, n_collect)
    runner = _pinned_runner(pin_dev) if pin_dev is not None else _run_compiled
    carry, samples = runner(
        step_fn, carry, n_collect, n_discard, step_offset, thin
    )
    return KernelRun(carry, samples)


def run_kernel_stats(step_fn, carry, n_collect: int, n_discard: int,
                     step_offset: int = 0, thin: int = 1) -> KernelRunStats:
    """Like :func:`run_kernel`, but the collection program ALSO computes the
    per-split-chain diagnostic sufficient statistics (chain means, biased
    within-chain squared deviations, summed per-chain autocovariances) of
    the collected samples before returning.

    Why fuse (VERDICT round 4 #1): on the remote-TPU tunnel, a standalone
    diagnostics program compiled right after a big sampling program can hit
    a sticky compile-helper flake (`INVALID_ARGUMENT: TPU backend error`)
    that two driver runs could not escape even via a host-CPU fallback —
    the sample D2H shares the sick tunnel.  With the statistics chained
    into the sampling program there is exactly ONE compile and ONE
    execution; if sampling succeeds the diagnostics exist, and the only
    remaining host work is a KB-scale transfer plus
    :func:`~.diagnostics.stats.combine_suffstats_host` (pure numpy).

    Trajectories are identical to :func:`run_kernel` (same scan, same RNG);
    the fused program's wall includes the statistics pass, so timed
    benchmark reps that use this runner must label the inclusion.
    """
    if thin < 1:
        raise ValueError(f"thin must be >= 1, got {thin}")
    if n_discard > 0 and n_collect > 0 and jax.default_backend() != "cpu":
        carry, _ = _run_compiled(step_fn, carry, 0, n_discard, step_offset, 1)
        step_offset += n_discard
        n_discard = 0
    pin_dev = _pin_device(step_fn, carry, n_collect)
    runner = (
        _pinned_stats_runner(pin_dev) if pin_dev is not None
        else _run_stats_compiled
    )
    carry, samples, suffstats = runner(
        step_fn, carry, n_collect, n_discard, step_offset, thin
    )
    return KernelRunStats(carry, samples, suffstats)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _advance_compiled(step_fn, carry, n: int, offset):
    def body(c, i):
        c = step_fn(c, offset + i)
        return c, step_fn.extract(c)

    return jax.lax.scan(body, carry, jnp.arange(n))


def advance_kernel(step_fn, carry, n: int, step_offset) -> KernelRun:
    """Advance ``n`` transitions from absolute step index ``step_offset``,
    collecting every post-step state.  Unlike :func:`run_kernel`, the offset
    is TRACED — repeated incremental calls (the per-step chain API,
    nuts.rs:311-438) reuse one compiled program per block length instead of
    recompiling at every new offset."""
    carry, samples = _advance_compiled(step_fn, carry, n,
                                       jnp.asarray(step_offset, jnp.int32))
    return KernelRun(carry, samples)


def run_kernel_progress(
    step_fn,
    carry,
    n_collect: int,
    n_discard: int,
    callback: Callable[[int, jax.Array], None],
    chunk: int = 64,
) -> KernelRun:
    """Like :func:`run_kernel` but yields to ``callback(step_count, states)``
    after every ``chunk`` steps, where ``states`` is the [chunk, n_chains, dim]
    block of post-step states (burn-in included).  This is the TPU analog of
    the reference's throttled mpsc progress channels (core.rs:132-179): the
    sampler stays jitted per chunk; the host only sees chunk boundaries.

    Returns the same collected samples as :func:`run_kernel`.
    """
    total = n_discard + n_collect

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_chunk(c, n, start):
        def body(cc, i):
            cc = step_fn(cc, start + i)
            return cc, step_fn.extract(cc)

        return jax.lax.scan(body, c, jnp.arange(n))

    blocks = []
    done = 0
    while done < total:
        n = min(chunk, total - done)
        carry, states = run_chunk(carry, n, done)
        done += n
        callback(done, states)
        # Only keep post-burn-in states on host.
        if done > n_discard:
            keep = min(n, done - n_discard)
            blocks.append(states[n - keep :])
    samples = jnp.concatenate(blocks, axis=0) if blocks else jnp.zeros((0,))
    return KernelRun(carry, samples)


def run_kernel_progress_stream(
    step_fn,
    carry,
    n_collect: int,
    n_discard: int,
    hook: Callable[[int, float, float], None],
    stride: int = 64,
) -> KernelRun:
    """Progress without leaving jit: the whole run is ONE compiled program
    (vs :func:`run_kernel_progress`'s per-chunk jit re-entry, which pays a
    fresh compile at every distinct remainder-chunk length).  A streaming
    :class:`~..diagnostics.stats.MultiChainTracker` state rides in the scan
    carry, and every ``stride`` steps an ordered ``io_callback`` emits three
    scalars plus a rotating ≤5-chain window of acceptance EWMAs —
    ``hook(steps_done, max_rhat, p_accept, window_start, p_chain_window)``
    — so the host sees O(1) bytes per tick instead of the state block.  The
    window start advances one chain per tick, cycling every chain's bar
    through the display (core.rs:288-296, 344-360).  This is the closest
    analog of the reference's 1 Hz mpsc ``ChainStats`` messages
    (core.rs:151-175): sufficient statistics leave the device, samples never
    do.

    Collected samples stay on device ([n_collect, n_chains, dim], steps
    major), unlike the chunked path which stages every state block through
    host memory.
    """
    from jax.experimental import io_callback

    from .diagnostics.stats import _TrackerState, _multi_update, _multi_within_and_var

    def emit(done, tstate):
        within, var = _multi_within_and_var(tstate)
        rhat = jnp.sqrt(var / within)
        finite = jnp.isfinite(rhat)
        # all-NaN (first tracker updates) displays as NaN, not -inf
        max_rhat = jnp.where(
            jnp.any(finite),
            jnp.max(jnp.where(finite, rhat, -jnp.inf)),
            jnp.nan,
        )
        # a ROTATING ≤5-chain window of acceptance EWMAs — the reference
        # rotates live bars across all chains (core.rs:288-296, 344-360);
        # the window start advances one chain per emitted tick and the
        # wraparound gather happens on device, so the host still sees O(1)
        # bytes regardless of n_chains
        n_chains_t = tstate.p_chain.shape[0]
        n_head = min(5, n_chains_t)
        start = (jnp.asarray(done, jnp.int32) // stride) % n_chains_t
        wrapped = jnp.concatenate([tstate.p_chain, tstate.p_chain[:n_head]])
        window = jax.lax.dynamic_slice_in_dim(wrapped, start, n_head)
        io_callback(
            hook,
            None,
            done,
            max_rhat.astype(jnp.float32),
            tstate.p_accept.astype(jnp.float32),
            start,
            window.astype(jnp.float32),
            ordered=True,
        )

    def phase(aug, start: int, n: int, collect: bool):
        """Scan ``n`` steps from absolute index ``start`` in stride-sized
        chunks, emitting progress after each chunk (+ remainder)."""

        def inner(aug, m):
            c, ts = aug
            c = step_fn(c, m)
            x = step_fn.extract(c)
            # track in float32 like MultiChainTracker.step_batch (int states
            # are cast; the tracker state stays dtype-stable across carries)
            ts = _multi_update(ts, x.astype(jnp.float32))
            return (c, ts), (x if collect else None)

        def chunk(aug, chunk_start):
            aug, ys = jax.lax.scan(
                inner, aug, chunk_start + jnp.arange(stride)
            )
            emit(chunk_start + stride, aug[1])
            return aug, ys

        n_main, rem = divmod(n, stride)
        ys = None
        if n_main:
            starts = start + stride * jnp.arange(n_main)
            aug, ys = jax.lax.scan(chunk, aug, starts)
            if collect:
                ys = ys.reshape((n_main * stride,) + ys.shape[2:])
        if rem:
            aug, ys_rem = jax.lax.scan(
                inner, aug, start + n_main * stride + jnp.arange(rem)
            )
            emit(start + n, aug[1])
            if collect:
                ys = ys_rem if ys is None else jnp.concatenate([ys, ys_rem])
        return aug, ys

    @jax.jit
    def run(carry):
        x0 = step_fn.extract(carry)
        # mirror MultiChainTracker's initial state exactly (float32, zeros,
        # p_accept 0.0) so stream mode reports the same statistics as the
        # chunked path for any state dtype
        zeros = jnp.zeros(x0.shape, jnp.float32)
        tstate = _TrackerState(
            n=jnp.zeros((), jnp.int32),
            p_accept=jnp.zeros((), jnp.float32),
            last_state=zeros,
            mean=zeros,
            mean_sq=zeros,
            p_chain=jnp.full((x0.shape[0],), -1.0, jnp.float32),
        )
        aug = (carry, tstate)
        if n_discard:
            aug, _ = phase(aug, 0, n_discard, collect=False)
        aug, samples = phase(aug, n_discard, n_collect, collect=True)
        return aug[0], samples

    carry, samples = run(carry)
    return KernelRun(carry, samples)
