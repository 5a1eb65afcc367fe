"""Built-in target, proposal, and conditional distributions.

The reference's model layer (distributions.rs) is a set of traits —
``Target`` (unnorm_logp, distributions.rs:107-110), ``Proposal``
(sample/logp/set_seed, distributions.rs:94-103), ``GradientTarget`` /
``BatchedGradientTarget`` (autodiff log-density, distributions.rs:67-90),
``Conditional`` (distributions.rs:489-491), ``Normalized`` and ``Discrete`` —
plus concrete distributions implementing them.

The TPU-native design collapses every trait to a *pure jittable function*:

- a **target** is any callable ``logp(x: [dim]) -> scalar`` (samplers vmap it
  over the chain axis and differentiate it with ``jax.grad`` — there is no
  separate GradientTarget: autodiff is ambient);
- a **proposal** is a pair ``sample(key, x) -> x'`` and ``logp(from, to)``
  (stateless: randomness comes from explicit keys);
- a **conditional** is ``sample(key, i, state) -> new_value`` used by Gibbs.

The classes below bundle parameters with those functions for API parity with
the reference; sampler constructors accept either a bare callable or any
object exposing ``unnorm_logp``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

__all__ = [
    "Gaussian2D",
    "DiffableGaussian2D",
    "IsotropicGaussian",
    "Categorical",
    "Rosenbrock2D",
    "RosenbrockND",
    "GaussianND",
    "NealsFunnel",
    "Poisson",
    "Binomial",
    "as_logp_fn",
    "as_grad_fn",
]


def as_logp_fn(target):
    """Coerce a target (callable or object with ``unnorm_logp``) to a fn."""
    if callable(target) and not hasattr(target, "unnorm_logp"):
        return target
    return target.unnorm_logp


def as_grad_fn(target):
    """Optional analytic-gradient override: ``target.unnorm_logp_grad(x)
    -> [dim]`` if the target provides one, else ``None``.

    This is the TPU-native analog of the reference's gradient override
    point (``GradientTarget::unnorm_logp_and_grad`` has a default autodiff
    implementation that concrete targets may replace,
    distributions.rs:80-90).  Autodiff remains ambient — the hook exists
    because reverse-mode ``value_and_grad`` must compute the primal
    (the log-density reduce) on every call, while gradient-guided
    integrators only consume the log density at trajectory ends: a
    sampler that sees an analytic gradient can skip the per-leapfrog
    reduce entirely (samplers/chees.py uses it on interior leapfrogs).
    Purely an optimization: semantics must match ``jax.grad(logp)``.
    """
    fn = getattr(target, "unnorm_logp_grad", None)
    return fn if callable(fn) else None


def _asarray(x, dtype=None):
    return jnp.asarray(x, dtype=dtype)


@dataclasses.dataclass(frozen=True, eq=False)
class Gaussian2D:
    """2D Gaussian with full covariance (distributions.rs:160-208).

    ``unnorm_logp`` omits the normalizing constant (Target role);
    ``logp`` includes it (Normalized role, distributions.rs:166-189).
    """

    mean: jax.Array
    cov: jax.Array

    def __post_init__(self):
        object.__setattr__(self, "mean", _asarray(self.mean))
        object.__setattr__(self, "cov", _asarray(self.cov))

    def _quad(self, x):
        a, b = self.cov[0, 0], self.cov[0, 1]
        c, d = self.cov[1, 0], self.cov[1, 1]
        det = a * d - b * c
        diff = jnp.asarray(x) - self.mean
        d0, d1 = diff[0], diff[1]
        # explicit 2x2 quadratic form (elementwise: Pallas/Mosaic-safe and
        # cheaper than a matvec at this size)
        quad = (d * d0 * d0 - (b + c) * d0 * d1 + a * d1 * d1) / det
        return quad, det

    def unnorm_logp(self, x):
        quad, _ = self._quad(x)
        return -0.5 * quad

    def logp(self, x):
        quad, det = self._quad(x)
        return -jnp.log(2 * jnp.pi) - 0.5 * jnp.log(jnp.abs(det)) - 0.5 * quad

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class DiffableGaussian2D:
    """2D Gaussian with precomputed inverse covariance and normalizing
    constant (distributions.rs:214-320).  Differentiable; used as the HMC and
    NUTS reference workload.  Returns the *normalized* log-density, matching
    the reference's ``unnorm_logp_batch`` (distributions.rs:265-291), whose
    constant offset is irrelevant to sampling but pinned by golden tests.
    """

    mean: jax.Array
    cov: jax.Array
    inv_cov: jax.Array = dataclasses.field(init=False)
    norm_const: jax.Array = dataclasses.field(init=False)

    def __post_init__(self):
        mean = _asarray(self.mean)
        cov = _asarray(self.cov)
        det = cov[0, 0] * cov[1, 1] - cov[0, 1] * cov[1, 0]
        inv = (
            jnp.array([[cov[1, 1], -cov[0, 1]], [-cov[1, 0], cov[0, 0]]]) / det
        )
        norm_const = -(2.0 * jnp.log(2.0 * jnp.pi) + jnp.log(det)) / 2.0
        object.__setattr__(self, "mean", mean)
        object.__setattr__(self, "cov", cov)
        object.__setattr__(self, "inv_cov", inv)
        object.__setattr__(self, "norm_const", norm_const)

    def unnorm_logp(self, x):
        diff = jnp.asarray(x) - self.mean
        d0, d1 = diff[0], diff[1]
        ic = self.inv_cov
        quad = (
            ic[0, 0] * d0 * d0
            + (ic[0, 1] + ic[1, 0]) * d0 * d1
            + ic[1, 1] * d1 * d1
        )
        return self.norm_const - 0.5 * quad

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class GaussianND:
    """N-dimensional Gaussian with arbitrary covariance — the benchmark
    target for the 100-d NUTS north star.  Accepts either a diagonal
    (1-D ``scales``: std devs) or a full covariance matrix.
    """

    mean: jax.Array
    cov: jax.Array

    def __post_init__(self):
        mean = _asarray(self.mean)
        cov = _asarray(self.cov)
        if cov.ndim == 1:
            prec = 1.0 / cov**2  # cov given as std-dev scales
            object.__setattr__(self, "_diag_prec", prec)
            object.__setattr__(self, "_chol", None)
        else:
            # Cholesky, not an explicit inverse: diffᵀΣ⁻¹diff = ‖L⁻¹diff‖²
            # stays accurate on the ill-conditioned covariances this target
            # is benchmarked with (round-2 review item: jnp.linalg.inv loses
            # digits exactly where the condition number is the point).
            object.__setattr__(self, "_diag_prec", None)
            object.__setattr__(self, "_chol", jnp.linalg.cholesky(cov))
        object.__setattr__(self, "mean", mean)
        object.__setattr__(self, "cov", cov)

    def unnorm_logp(self, x):
        diff = jnp.asarray(x) - self.mean
        if self._diag_prec is not None:
            return -0.5 * jnp.sum(diff * diff * self._diag_prec)
        y = jax.scipy.linalg.solve_triangular(self._chol, diff, lower=True)
        return -0.5 * jnp.sum(y * y)

    def unnorm_logp_grad(self, x):
        """Analytic ∇logp = −Σ⁻¹(x − μ) (see :func:`as_grad_fn`): lets
        gradient-guided samplers skip the log-density reduce on interior
        leapfrogs.  Matches ``jax.grad(unnorm_logp)`` to float rounding."""
        diff = jnp.asarray(x) - self.mean
        if self._diag_prec is not None:
            return -diff * self._diag_prec
        y = jax.scipy.linalg.solve_triangular(self._chol, diff, lower=True)
        return -jax.scipy.linalg.solve_triangular(
            self._chol.T, y, lower=False
        )

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class IsotropicGaussian:
    """Isotropic Gaussian usable as Proposal or Target for any dimension
    (distributions.rs:348-406).

    Proposal role: ``sample(key, x)`` adds N(0, std²) noise per coordinate;
    ``logp(from, to)`` is the (normalized) transition density.  The constant
    term uses the correct Gaussian normalization ``d/2·ln(2πσ²)`` — the
    reference's constant (distributions.rs:388) is idiosyncratic but cancels
    in symmetric MH ratios, so behavior is identical.
    """

    std: float

    def sample(self, key, current):
        noise = jax.random.normal(key, jnp.shape(current), _asarray(current).dtype)
        return current + noise * self.std

    def logp(self, from_, to):
        diff = jnp.asarray(to) - jnp.asarray(from_)
        var = self.std * self.std
        d = diff.shape[-1]
        return (
            -0.5 * jnp.sum(diff * diff, axis=-1) / var
            - 0.5 * d * math.log(2 * math.pi * var)
        )

    def unnorm_logp(self, x):
        x = jnp.asarray(x)
        return -0.5 * jnp.sum(x * x) / (self.std * self.std)

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class Categorical:
    """Categorical distribution over ``len(probs)`` categories
    (distributions.rs:425-481).  Probabilities are normalized on
    construction.  State for the Target role is a length-1 int vector.
    """

    probs: jax.Array

    def __post_init__(self):
        p = _asarray(self.probs, jnp.float32)
        object.__setattr__(self, "probs", p / jnp.sum(p))

    def sample(self, key):
        """Inverse-CDF sample, matching distributions.rs:451-463."""
        return jax.random.categorical(key, jnp.log(self.probs))

    def logp(self, index):
        index = jnp.asarray(index)
        in_range = (index >= 0) & (index < self.probs.shape[0])
        safe = jnp.clip(index, 0, self.probs.shape[0] - 1)
        return jnp.where(in_range, jnp.log(self.probs[safe]), -jnp.inf)

    def unnorm_logp(self, state):
        return self.logp(jnp.asarray(state)[0])

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class Rosenbrock2D:
    """2D Rosenbrock density ``-(a-x)² - b(y-x²)²`` (distributions.rs:494-530)."""

    a: float
    b: float

    def unnorm_logp(self, pos):
        x, y = pos[0], pos[1]
        return -((self.a - x) ** 2 + self.b * (y - x * x) ** 2)

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class RosenbrockND:
    """N-dimensional Rosenbrock (distributions.rs:534-555, arXiv:1903.09556):
    ``-(Σ_i 100(x_{i+1}-x_i²)² + (1-x_i)²)``.
    """

    def unnorm_logp(self, pos):
        low, high = pos[:-1], pos[1:]
        return -jnp.sum(100.0 * (high - low**2) ** 2 + (1.0 - low) ** 2)

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class Poisson:
    """Poisson(λ) pmf as a discrete MH target over length-1 int states
    (mirrors examples/poisson_mh.rs).  Negative states get -inf."""

    lam: float

    def unnorm_logp(self, state):
        k = jnp.asarray(state)[0].astype(jnp.float32)
        valid = k >= 0
        safe_k = jnp.maximum(k, 0.0)
        lp = safe_k * math.log(self.lam) - self.lam - jax.lax.lgamma(safe_k + 1.0)
        return jnp.where(valid, lp, -jnp.inf)

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class Binomial:
    """Binomial(n, p) pmf as a discrete MH target over length-1 int states."""

    n: int
    p: float

    def unnorm_logp(self, state):
        k = jnp.asarray(state)[0].astype(jnp.float32)
        n = float(self.n)
        valid = (k >= 0) & (k <= n)
        safe_k = jnp.clip(k, 0.0, n)
        log_choose = (
            jax.lax.lgamma(n + 1.0)
            - jax.lax.lgamma(safe_k + 1.0)
            - jax.lax.lgamma(n - safe_k + 1.0)
        )
        lp = log_choose + safe_k * math.log(self.p) + (n - safe_k) * math.log(1 - self.p)
        return jnp.where(valid, lp, -jnp.inf)

    __call__ = unnorm_logp


@dataclasses.dataclass(frozen=True, eq=False)
class NealsFunnel:
    """Neal's funnel: v ~ N(0, 3²), x_i | v ~ N(0, e^v) for i < dim-1
    (state layout ``[x_1..x_{d-1}, v]``).

    The canonical pathological geometry for HMC-family samplers — fixed
    step sizes diverge in the funnel's neck, which is exactly what the
    divergence counters (``NUTS.divergences``) are for.  Not in the
    reference's model zoo; included as the standard stress target.
    """

    dim: int = 10
    v_std: float = 3.0

    def unnorm_logp(self, theta):
        x, v = theta[:-1], theta[-1]
        lp_v = -0.5 * (v / self.v_std) ** 2
        lp_x = -0.5 * jnp.sum(x * x) * jnp.exp(-v) - 0.5 * (self.dim - 1) * v
        return lp_v + lp_x

    __call__ = unnorm_logp
