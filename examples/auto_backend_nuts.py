"""``backend="auto"`` (the NUTS default): the sampler picks its own tree
engine.  The warmup runs the dynamic xla tree while tracking the realized
tree depths; at the warmup→collection boundary the measured
static↔dynamic crossover rule (docs/BENCH_HISTORY.md round 4/5) chooses
the collection backend — static when warmup trees saturate the cap or
realize strongly varied depths (where the static window measured
1.5–2.0× the dynamic tree on v5e), the dynamic tree otherwise and always
for caps > 6.  ``.backend_selected`` / ``.depth_stats`` expose the
decision after ``run()``."""

import jax.numpy as jnp

from general_mcmc_tpu import NUTS, init_with_seed


def main():
    def logp(x):
        return -0.5 * jnp.sum(x * x)

    # A standard normal's adapted trees reach depth 2-3, so a cap of 3
    # stays saturated even after the step size converges -> auto resolves
    # the collection phase to the static window (7 unconditional
    # leapfrogs/transition, tree logic evaluated retrospectively — the
    # benchmark's headline schedule).
    saturated = NUTS(
        logp, init_with_seed(128, 8, 0),
        target_accept_p=0.8, max_tree_depth=3, step_size=0.05,
        backend="auto", seed=0,
    )
    sample_a = saturated.run(256, 128)
    mean, std = saturated.depth_stats
    print(f"saturated cap-3 run:  backend_selected={saturated.backend_selected}"
          f"  (warmup depth mean {mean:.2f}, std {std:.2f})")

    # The default cap (10) always resolves to the dynamic tree — the
    # static window's 2^10 - 1 leapfrogs per transition would be absurd,
    # so auto skips tracking entirely and runs the exact xla path.
    roomy = NUTS(
        logp, init_with_seed(128, 8, 1),
        target_accept_p=0.8, backend="auto", seed=1,
    )
    sample_b = roomy.run(256, 128)
    print(f"default cap-10 run:   backend_selected={roomy.backend_selected}")

    assert saturated.backend_selected == "static"
    assert roomy.backend_selected == "xla"
    assert sample_a.shape == sample_b.shape == (128, 256, 8)
    return sample_a, sample_b


if __name__ == "__main__":
    main()
