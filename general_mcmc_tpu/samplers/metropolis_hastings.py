"""Metropolis–Hastings over arbitrary continuous or discrete state types.

TPU-native rebuild of the reference's MH sampler (metropolis_hastings.rs):
the per-chain serial hot loop (MHMarkovChain::step, metropolis_hastings.rs:
306-318) becomes a vmapped single-chain kernel inside a fused ``lax.scan`` —
one XLA program advances every chain each step, with the log-space accept rule
realized as a ``jnp.where`` mask instead of a branch.

The state dtype is generic: float vectors for continuous targets, int vectors
for discrete ones (the reference's ``S`` type parameter).  The target is any
callable ``logp(state) -> scalar``; the proposal any object with
``sample(key, state) -> state`` and ``logp(from, to) -> scalar``
(distributions.rs:94-110 trait pair).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.distributions import as_logp_fn
from ..rng import step_key
from .base import BatchSampler

__all__ = [
    "MetropolisHastings",
    "RandomWalkProposal",
    "DiscreteWalkProposal",
    "PCNProposal",
]


@dataclasses.dataclass(frozen=True, eq=False)
class RandomWalkProposal:
    """Gaussian random-walk proposal with per-coordinate std ``scale``."""

    scale: float = 1.0
    symmetric = True

    def propose(self, current, z):
        """Reparameterized sample (``z`` standard normal) — lets the fused
        Pallas backend draw ``z`` from the hardware PRNG."""
        return current + self.scale * z

    def sample(self, key, current):
        return self.propose(
            current,
            jax.random.normal(key, jnp.shape(current), jnp.asarray(current).dtype),
        )

    def logp(self, from_, to):
        diff = (jnp.asarray(to) - jnp.asarray(from_)) / self.scale
        return -0.5 * jnp.sum(diff * diff)  # symmetric: constant omitted


@dataclasses.dataclass(frozen=True, eq=False)
class PCNProposal:
    """Preconditioned Crank–Nicolson proposal: ``y = √(1−β²)·x + β·z``.

    The classic dimension-robust proposal for targets dominated by a
    standard-normal component (preconditioned Crank–Nicolson; Cotter, Roberts, Stuart & White 2013, "MCMC methods for functions", arXiv:1202.0709).  It is
    *asymmetric* — ``q(y|x) ≠ q(x|y)`` — so it exercises the full Hastings
    ratio (metropolis_hastings.rs:310-312) on both backends; the Gaussian
    normalization constant is equal in the two directions and omitted.
    """

    beta: float = 0.5
    symmetric = False

    @property
    def _rho(self) -> float:
        return float(np.sqrt(1.0 - self.beta * self.beta))

    def propose(self, current, z):
        return self._rho * current + self.beta * z

    def sample(self, key, current):
        return self.propose(
            current,
            jax.random.normal(key, jnp.shape(current), jnp.asarray(current).dtype),
        )

    def logp(self, from_, to):
        diff = (jnp.asarray(to) - self._rho * jnp.asarray(from_)) / self.beta
        return -0.5 * jnp.sum(diff * diff)


@dataclasses.dataclass(frozen=True, eq=False)
class DiscreteWalkProposal:
    """±step random walk on integer states (examples/poisson_mh.rs analog).

    Symmetric (q(a|b)=q(b|a)), so ``logp`` is constant.
    """

    step: int = 1

    def sample(self, key, current):
        current = jnp.asarray(current)
        sign = jax.random.bernoulli(key, 0.5, jnp.shape(current))
        delta = jnp.where(sign, self.step, -self.step).astype(current.dtype)
        return current + delta

    def logp(self, from_, to):
        return jnp.zeros((), jnp.float32)


class MetropolisHastings(BatchSampler):
    """Batched-chain Metropolis–Hastings (metropolis_hastings.rs:90-197).

    Parameters
    ----------
    target : callable or object with ``unnorm_logp``
        Unnormalized log density of a single state vector.
    proposal : object with ``sample(key, x)`` and ``logp(from, to)``
    initial_states : [n_chains, dim] array (float or int dtype)
    seed : int or PRNG key (per-chain streams derived via fold_in;
        the reference's ``chain_seed = 1 + seed + i``, :189-197)
    """

    def __init__(self, target, proposal, initial_states, seed=0,
                 backend: str = "xla"):
        self.target: Callable = as_logp_fn(target)
        self.proposal = proposal
        self.initial_states = jnp.asarray(initial_states)
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        if backend == "pallas" and not any(
            hasattr(proposal, a) for a in ("propose", "scale", "std")
        ):
            raise ValueError(
                "pallas backend needs a continuous proposal: either a "
                "Gaussian random walk (.scale/.std) or a reparameterized "
                "propose(x, z) + logp(from, to) pair; discrete proposals "
                "use backend='xla'"
            )
        self.backend = backend
        super().__init__(n_chains=self.initial_states.shape[0], seed=seed)

    def run(self, n_collect: int, n_discard: int = 0, thin: int = 1):
        if self.backend == "pallas":
            # Whole run in one fused kernel (ops/pallas_mh.py).
            from ..ops.pallas_mh import fused_mh_run

            seed = int(jax.random.key_data(self._key).ravel()[-1]) & 0x7FFFFFFF
            if hasattr(self.proposal, "propose"):
                scale, proposal = None, self.proposal
            else:  # plain Gaussian walk described by a width attribute
                scale = getattr(self.proposal, "scale", None)
                if scale is None:
                    scale = self.proposal.std
                proposal = None
            samples = fused_mh_run(
                self.target,
                self.initial_states,
                scale,
                n_collect,
                n_discard,
                seed=seed,
                proposal=proposal,
                thin=thin,
            )
            self._steps_done = n_collect * thin + n_discard
            return samples
        return super().run(n_collect, n_discard, thin=thin)

    def _init_carry(self):
        x0 = self.initial_states
        lp0 = jax.vmap(self.target)(x0)
        return (x0, lp0, self._chain_keys)

    def _chain_step(self, x, lp, key, m):
        """One MH update for one chain (metropolis_hastings.rs:306-318)."""
        k = step_key(key, m)
        k_prop, k_accept = jax.random.split(k)
        proposed = self.proposal.sample(k_prop, x)
        proposed_lp = self.target(proposed)
        log_q_forward = self.proposal.logp(x, proposed)
        log_q_backward = self.proposal.logp(proposed, x)
        log_accept = (proposed_lp + log_q_backward) - (lp + log_q_forward)
        u = jax.random.uniform(k_accept, (), log_accept.dtype)
        accept = log_accept > jnp.log(u)
        x_new = jnp.where(accept, proposed, x)
        lp_new = jnp.where(accept, proposed_lp, lp)
        return x_new, lp_new

    def _step(self, carry, m):
        x, lp, keys = carry
        x_new, lp_new = jax.vmap(self._chain_step, in_axes=(0, 0, 0, None))(
            x, lp, keys, m
        )
        return (x_new, lp_new, keys)

    def _positions(self, carry):
        return carry[0]
