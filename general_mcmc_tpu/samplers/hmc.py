"""Batched Hamiltonian Monte Carlo — "the batch IS the particle".

TPU-native rebuild of the reference's device-batched HMC engine
(batched_hmc.rs + hmc.rs): the whole ``[n_chains, dim]`` position tensor
moves through phase space as one object, with

- ``jax.vmap(jax.value_and_grad(logp))`` replacing the burn autodiff
  backward pass (hmc.rs:42-62),
- a ``lax.scan`` of leapfrog steps replacing the buffer-mutating loop
  (batched_hmc.rs:166-190) — XLA fuses the kick/drift/kick chain into the
  gradient computation,
- a ``jnp.where`` mask replacing ``mask_where`` acceptance
  (euclidean.rs:474-482), and
- the accepted log-density *and gradient* carried across steps so each HMC
  step costs exactly ``n_leapfrog`` gradient evaluations (the reference
  re-evaluates the gradient twice more per step, batched_hmc.rs:138,169).

Gradients never leave the device; samples are only read back when the caller
materializes them (the analog of ``run_positions``, batched_hmc.rs:115-123).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.distributions import as_grad_fn, as_logp_fn
from ..rng import step_key
from .base import BatchSampler

__all__ = ["HMC", "leapfrog"]


def leapfrog(value_and_grad_fn, position, momentum, grad, step_size, n_leapfrog,
             inv_mul=None, grad_fn=None):
    """``n_leapfrog`` leapfrog steps on a [n_chains, dim] batch
    (batched_hmc.rs:166-190 semantics; fused-kick form: the step-boundary
    half-kicks share one gradient, so one opening half-kick, full kicks in
    the loop, and the surplus half-kick subtracted after — one fewer
    [n_chains, dim] multiply-add per leapfrog than the textbook
    half/half order, identical real-arithmetic trajectory).

    ``grad`` is the gradient at ``position``; ``inv_mul`` an optional map
    ``p -> M⁻¹p`` on the batch for a non-identity metric; ``grad_fn`` an
    optional analytic batch gradient (see
    :func:`..models.distributions.as_grad_fn`) — with it, the ``n−1``
    interior steps skip the log-density primal reduce that reverse-mode
    ``value_and_grad`` always pays, and only the final step computes the
    log density.  Returns ``(position', momentum', logp', grad')``.
    """
    half = 0.5 * step_size
    if inv_mul is None:
        inv_mul = lambda p: p
    momentum = momentum + grad * half

    if grad_fn is None:

        def body(carry, _):
            pos, mom, g = carry
            pos = pos + inv_mul(mom) * step_size
            logp, g = value_and_grad_fn(pos)
            mom = mom + g * step_size
            return (pos, mom, g), logp

        (position, momentum, grad), logps = jax.lax.scan(
            body, (position, momentum, grad), None, length=n_leapfrog
        )
        return position, momentum - grad * half, logps[-1], grad

    def body_g(carry, _):
        pos, mom, g = carry
        pos = pos + inv_mul(mom) * step_size
        # targets with f64 parameters promote under x64; keep the carry
        # dtype-stable in the positions' dtype
        g = grad_fn(pos).astype(pos.dtype)
        mom = mom + g * step_size
        return (pos, mom, g), None

    (position, momentum, grad), _ = jax.lax.scan(
        body_g, (position, momentum, grad), None, length=n_leapfrog - 1
    )
    position = position + inv_mul(momentum) * step_size
    logp, grad = value_and_grad_fn(position)
    return position, momentum + grad * half, logp, grad


class HMC(BatchSampler):
    """Batched-chain HMC sampler (hmc.rs:113-338).

    Parameters
    ----------
    target : callable or object with ``unnorm_logp``
        Per-state log density ``logp(x: [dim]) -> scalar``; vmapped and
        differentiated internally (the BatchedGradientTarget role,
        distributions.rs:67-78).
    initial_positions : [n_chains, dim] float array
    step_size : leapfrog step size ε
    n_leapfrog : leapfrog steps per proposal L
    mass_inv : optional [dim] diagonal or [dim, dim] dense M⁻¹ (extension
        beyond the reference's unit-mass HMC, hmc.rs:113-134): momenta are
        drawn from N(0, M), drifts use M⁻¹p, kinetic energy is ½pᵀM⁻¹p —
        the same metric NUTS adapts, so a NUTS-warmup mass (diagonal or
        dense) can be reused here.  Dense is XLA-backend only.
    """

    def __init__(self, target, initial_positions, step_size, n_leapfrog, seed=0,
                 backend: str = "xla", mass_inv=None):
        self.target = as_logp_fn(target)
        self.initial_positions = jnp.asarray(initial_positions)
        if not jnp.issubdtype(self.initial_positions.dtype, jnp.floating):
            self.initial_positions = self.initial_positions.astype(jnp.float32)
        self.step_size = step_size
        self.n_leapfrog = int(n_leapfrog)
        dtype = self.initial_positions.dtype
        dim = self.initial_positions.shape[1]
        if mass_inv is None:
            self.mass_inv = jnp.ones((dim,), dtype)
        else:
            self.mass_inv = jnp.asarray(mass_inv, dtype)
        self.dense_mass = self.mass_inv.ndim == 2
        if self.dense_mass:
            if backend == "pallas":
                raise ValueError("dense mass_inv needs backend='xla'")
            # p = S·z with S Sᵀ = M = (M⁻¹)⁻¹ gives p ~ N(0, M).  Factor
            # M⁻¹ = L Lᵀ and use S = L⁻ᵀ (one Cholesky + triangular solve;
            # no explicit inverse — the pattern the NUTS warmup uses, and
            # numerically consistent with the kinetic energy's M⁻¹ for
            # ill-conditioned metrics).
            from jax.scipy.linalg import solve_triangular

            chol = jnp.linalg.cholesky(self.mass_inv)
            if not bool(jnp.all(jnp.isfinite(chol))):
                raise ValueError("dense mass_inv must be symmetric positive definite")
            self.mass_scale = solve_triangular(
                chol, jnp.eye(dim, dtype=dtype), lower=True
            ).T
        else:
            self.mass_inv = self.mass_inv.reshape(dim)
            # p = scale·z, z ~ N(0, I) gives p ~ N(0, M) for M = diag(1/inv)
            self.mass_scale = 1.0 / jnp.sqrt(self.mass_inv)
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self._vgrad = jax.vmap(jax.value_and_grad(self.target))
        # Analytic-gradient override (as_grad_fn): interior leapfrogs skip
        # the log-density reduce when the target provides one.
        _g = as_grad_fn(target)
        self._ggrad = None if _g is None else jax.vmap(_g)
        super().__init__(n_chains=self.initial_positions.shape[0], seed=seed)

    def run(self, n_collect: int, n_discard: int = 0, thin: int = 1):
        if self.backend == "pallas":
            # Whole run in one fused kernel (ops/pallas_hmc.py): the batch
            # stays VMEM-resident, one HBM write per collected step.
            from ..ops.pallas_hmc import fused_hmc_run

            seed = int(jax.random.key_data(self._key).ravel()[-1]) & 0x7FFFFFFF
            samples = fused_hmc_run(
                self.target,
                self.initial_positions,
                self.step_size,
                self.n_leapfrog,
                n_collect,
                n_discard,
                seed=seed,
                thin=thin,
                mass_inv=self.mass_inv,
            )
            self._steps_done = n_collect * thin + n_discard
            return samples
        return super().run(n_collect, n_discard, thin=thin)

    def _init_carry(self):
        x0 = self.initial_positions
        lp0, grad0 = self._vgrad(x0)
        return (x0, lp0, grad0, self._chain_keys)

    def _step(self, carry, m):
        """One batched HMC step (batched_hmc.rs:129-163)."""
        x, lp, grad, keys = carry
        dtype = x.dtype
        k = jax.vmap(step_key, in_axes=(0, None))(keys, m)
        k_mom = jax.vmap(lambda kk: jax.random.fold_in(kk, 0))(k)
        k_u = jax.vmap(lambda kk: jax.random.fold_in(kk, 1))(k)
        # Per-chain momentum via per-chain keys keeps sampling invariant to
        # how chains are sharded across the mesh.
        z = jax.vmap(
            lambda kk, shape_ref: jax.random.normal(kk, shape_ref.shape, dtype)
        )(k_mom, x)
        if self.dense_mass:
            momentum = z @ self.mass_scale.T  # [n, d] of L·z per chain
            inv = self.mass_inv

            def inv_mul(p):
                return p @ inv.T  # symmetric, but keep the M⁻¹p orientation
        else:
            momentum = self.mass_scale * z
            inv = self.mass_inv

            def inv_mul(p):
                return inv * p
        ke_current = 0.5 * jnp.sum(momentum * inv_mul(momentum), axis=1)

        pos_new, mom_new, lp_new, grad_new = leapfrog(
            self._vgrad, x, momentum, grad, jnp.asarray(self.step_size, dtype),
            self.n_leapfrog, inv_mul=inv_mul, grad_fn=self._ggrad,
        )
        ke_proposed = 0.5 * jnp.sum(mom_new * inv_mul(mom_new), axis=1)
        log_accept = (lp_new - lp) + (ke_current - ke_proposed)
        u = jax.vmap(lambda kk: jax.random.uniform(kk, (), dtype))(k_u)
        accept = jnp.log(u) < log_accept
        x = jnp.where(accept[:, None], pos_new, x)
        lp = jnp.where(accept, lp_new, lp)
        grad = jnp.where(accept[:, None], grad_new, grad)
        return (x, lp, grad, keys)

    def _positions(self, carry):
        return carry[0]
