"""Differential oracle test for the fused Pallas NUTS v2 kernel.

Replicates the interpret-mode hash PRNG (ops/pallas_hmc.py `_bits`)
bit-exactly in numpy, drives a straightforward sequential NUTS transition
with reference semantics (ops/tree.py; generic_nuts.rs:755-925) on the SAME
draws, and requires the kernel's output position, tree depth, and leapfrog
count to match per chain.  This is the strongest test tier for the kernel:
a statistical bug that moment tests need thousands of samples to expose
(e.g. the round-2 uninitialized-checkpoint-stack bug that silently disabled
every within-subtree U-turn check) shows up here as an exact mismatch on a
handful of transitions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from general_mcmc_tpu import GaussianND, init_det
from general_mcmc_tpu.ops.pallas_nuts2 import pallas_nuts2_step

M1 = np.int64(0x85EBCA6B - (1 << 32))
M2 = np.int64(0xC2B2AE35 - (1 << 32))
GOLD = np.int64(0x9E3779B9 - (1 << 32))
MASK = np.int64(0xFFFFFFFF)
DELTA = 1000.0


def _i32(x):
    x = np.int64(x) & MASK
    return np.where(x >= np.int64(1 << 31), x - (np.int64(1) << 32), x)


def _shr(x, k):
    return (np.int64(x) & MASK) >> np.int64(k)


def _fmix(x):
    x = _i32(x ^ _shr(x, 16))
    x = _i32(x * M1)
    x = _i32(x ^ _shr(x, 13))
    x = _i32(x * M2)
    x = _i32(x ^ _shr(x, 16))
    return x


def _bits(shape, base, n, salt=None):
    """ops/pallas_hmc._bits for trace-time counter value ``n`` (the counter
    BEFORE the call: the kernel's k-th draw site uses n = k-1)."""
    idx = np.zeros(shape, np.int64)
    last = len(shape) - 1
    idx += np.arange(shape[last]).reshape((1,) * last + (shape[last],))
    for ax in range(last):
        rs = [1] * len(shape)
        rs[ax] = shape[ax]
        idx = idx + (np.arange(shape[ax]).reshape(rs) + 1) * 7919 * (ax + 1)
    x = _i32(_i32(idx * GOLD) + _i32(np.int64(base) * M2) + (n + 1))
    if salt is not None:
        x = _i32(x + _i32((np.int64(salt) + 1) * M1))
    return _fmix(_fmix(x))


def _uniform(shape, base, n, salt=None):
    u24 = _shr(_bits(shape, base, n, salt), 8)
    return u24.astype(np.float64) * 2.0**-24 + 2.0**-25


def _std_normal(shape, base, n0):
    u1 = _uniform(shape, base, n0)
    u2 = _uniform(shape, base, n0 + 1)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(6.283185307179586 * u2)


def test_prng_replication():
    from general_mcmc_tpu.ops import pallas_hmc as ph

    ph.seed_prng(jnp.asarray(7, jnp.int32), interpret=True)
    a = np.asarray(ph._standard_normal((4, 3)))
    b = np.asarray(ph._uniform_01((4, 1), salt=5))
    np.testing.assert_allclose(a, _std_normal((4, 3), 7, 0), atol=1e-6)
    np.testing.assert_allclose(b, _uniform((4, 1), 7, 2, salt=5), atol=1e-7)


def _oracle(pos, lp0, grad, eps, inv, seed, max_depth, vg):
    """Sequential NUTS transitions with the v2 kernel's exact draw sites:
    n=0,1 momentum Box-Muller; n=2 slice; per doubling j: n=3 direction
    (salt=j), n=4 leaf reservoir (salt=j*2^20+i), n=5 outer swap (salt=j)."""
    B, d = pos.shape
    base = seed  # single block: program_id == 0
    mom0 = _std_normal((B, d), base, 0)
    u_logu = _uniform((B, 1), base, 2)[:, 0]
    joint0 = lp0 - 0.5 * np.sum(mom0 * inv * mom0, axis=1)
    logu = joint0 + np.log(u_logu)

    prop = pos.copy()
    lf = np.zeros(B, np.int64)
    depth = np.zeros(B, np.int64)
    for b in range(B):
        pm = pos[b].copy(); mm = mom0[b].copy(); gm = grad[b].copy()
        pp = pos[b].copy(); mp_ = mom0[b].copy(); gp = grad[b].copy()
        n = 1.0
        s = True
        for j in range(max_depth):
            if not s:
                break
            v = -1.0 if _uniform((B, 1), base, 3, salt=j)[b, 0] < 0.5 else 1.0
            fp, fm, fg = (pm, mm, gm) if v < 0 else (pp, mp_, gp)
            fp, fm, fg = fp.copy(), fm.copy(), fg.copy()
            nsub = 0.0
            sub_s = True
            sprop = None
            pos_ck = np.zeros((max_depth, d))
            vel_ck = np.zeros((max_depth, d))
            c1_ck = np.zeros(max_depth)
            for i in range(1 << j):
                m1 = fm + fg * (v * eps * 0.5)
                p1 = fp + inv[b] * m1 * (v * eps)
                lp1, g1 = vg(p1)
                m1 = m1 + g1 * (v * eps * 0.5)
                vel1 = inv[b] * m1
                joint = lp1 - 0.5 * np.dot(m1, vel1)
                valid = logu[b] < joint
                ok = (logu[b] - DELTA) < joint
                lf[b] += 1
                nsub += float(valid)
                u_t = _uniform((B, 1), base, 4, salt=j * 1048576 + i)[b, 0]
                if i == 0 or (valid and u_t * nsub < 1.0):
                    sprop = p1.copy()
                fp, fm, fg = p1, m1, g1
                slot = bin(i >> 1).count("1")
                turned = False
                if i % 2 == 0:
                    pos_ck[slot] = p1
                    vel_ck[slot] = vel1
                    c1_ck[slot] = np.dot(p1, vel1)
                else:
                    to = bin(((i + 1) & -(i + 1)) - 1).count("1")
                    c1 = np.dot(p1, vel1)
                    for k in range(slot - to + 1, slot + 1):
                        if (v * (np.dot(vel_ck[k], p1) - c1_ck[k]) < 0
                                or v * (c1 - np.dot(pos_ck[k], vel1)) < 0):
                            turned = True
                sub_s = ok and not turned
                if not sub_s:
                    break
            if v < 0:
                pm, mm, gm = fp, fm, fg
            else:
                pp, mp_, gp = fp, fm, fg
            u_s = _uniform((B, 1), base, 5, salt=j)[b, 0]
            if sub_s and u_s * n < nsub:
                prop[b] = sprop
            n += nsub
            diff = pp - pm
            glob = (np.dot(diff, inv[b] * mm) >= 0
                    and np.dot(diff, inv[b] * mp_) >= 0)
            depth[b] += 1
            s = sub_s and glob
    return prop, lf, depth


def test_v2_kernel_matches_oracle():
    t = GaussianND(
        mean=jnp.zeros(2, jnp.float32), cov=jnp.array([1.0, 3.0], jnp.float32)
    )
    N, D, DEPTH = 16, 2, 4
    pos = init_det(N, D).astype(jnp.float32)
    lp, grad = jax.vmap(jax.value_and_grad(t.unnorm_logp))(pos)
    lp, grad = lp.astype(jnp.float32), grad.astype(jnp.float32)
    inv = np.ones((N, D))
    vgf = jax.value_and_grad(t.unnorm_logp)

    def vg_np(x):
        l, g = vgf(jnp.asarray(x, jnp.float32))
        return float(l), np.asarray(g, np.float64)

    for seed in (0, 1):
        kp, _klp, _kg, _a, _na, klf, kdep, _div = pallas_nuts2_step(
            t.unnorm_logp, pos, lp, grad, jnp.full((N,), 0.5, jnp.float32),
            jnp.ones((N, D), jnp.float32), jnp.ones((N, D), jnp.float32),
            seed=seed, max_depth=DEPTH, block_chains=N, interpret=True,
        )
        op, olf, odep = _oracle(
            np.asarray(pos, np.float64), np.asarray(lp, np.float64),
            np.asarray(grad, np.float64), 0.5, inv, seed, DEPTH, vg_np,
        )
        np.testing.assert_array_equal(np.asarray(kdep), odep)
        np.testing.assert_array_equal(np.asarray(klf), olf)
        np.testing.assert_allclose(np.asarray(kp), op, atol=1e-3)


def test_v2_kernel_divergence_contract():
    """A huge step size forces divergence at the first leaf: the kernel must
    report div=1, one leapfrog, depth 1, and an unchanged proposal — same
    as the sequential oracle (the clamped frontier values never escape)."""
    t = GaussianND(
        mean=jnp.zeros(2, jnp.float32), cov=jnp.array([1.0, 1.0], jnp.float32)
    )
    N, D, DEPTH = 8, 2, 4
    pos = init_det(N, D).astype(jnp.float32)
    lp, grad = jax.vmap(jax.value_and_grad(t.unnorm_logp))(pos)
    lp, grad = lp.astype(jnp.float32), grad.astype(jnp.float32)
    kp, _klp, _kg, _a, _na, klf, kdep, kdiv = pallas_nuts2_step(
        t.unnorm_logp, pos, lp, grad, jnp.full((N,), 80.0, jnp.float32),
        jnp.ones((N, D), jnp.float32), jnp.ones((N, D), jnp.float32),
        seed=0, max_depth=DEPTH, block_chains=N, interpret=True,
    )
    vgf = jax.value_and_grad(t.unnorm_logp)

    def vg_np(x):
        l, g = vgf(jnp.asarray(x, jnp.float32))
        return float(l), np.asarray(g, np.float64)

    op, olf, odep = _oracle(
        np.asarray(pos, np.float64), np.asarray(lp, np.float64),
        np.asarray(grad, np.float64), 80.0, np.ones((N, D)), 0, DEPTH, vg_np,
    )
    np.testing.assert_array_equal(np.asarray(kdiv), 1)
    np.testing.assert_array_equal(np.asarray(klf), olf)
    np.testing.assert_array_equal(np.asarray(kdep), odep)
    np.testing.assert_allclose(np.asarray(kp), op, atol=1e-3)


def test_v2_kernel_matmul_target_interpret():
    """A target whose logp contains a real matmul (hierarchical logistic
    likelihood X·β) exercises the kernel's jaxpr const-hoisting with 2-D
    constants; finite sampling through repeated transitions."""
    from general_mcmc_tpu.models.regression import (
        HierarchicalLogisticNC,
        make_logistic_data,
    )

    X, y, _ = make_logistic_data(jax.random.PRNGKey(5), 24, 4)
    t = HierarchicalLogisticNC(X, y)
    N, D = 8, 6
    pos = 0.1 * init_det(N, D).astype(jnp.float32)
    lp, grad = jax.vmap(jax.value_and_grad(t.unnorm_logp))(pos)
    lp, grad = lp.astype(jnp.float32), grad.astype(jnp.float32)
    for s in range(6):
        pos, lp, grad, *_rest = pallas_nuts2_step(
            t.unnorm_logp, pos, lp, grad, jnp.full((N,), 0.2, jnp.float32),
            jnp.ones((N, D), jnp.float32), jnp.ones((N, D), jnp.float32),
            seed=s, max_depth=3, block_chains=N, interpret=True,
        )
    assert np.isfinite(np.asarray(pos)).all()
    assert np.isfinite(np.asarray(lp)).all()
