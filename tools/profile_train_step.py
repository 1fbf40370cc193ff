"""Decompose the fused GAN train step on TPU: generator forward,
generator loss+grad, discriminator loss+grad, optimizer updates.

Usage: python tools/profile_train_step.py [batch=8] [precision=bfloat16]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.train import build  # noqa: E402
from aero_tpu.train.train_step import (  # noqa: E402
    LossComputer, init_state, make_train_step)
from aero_tpu.parallel import mesh as pmesh  # noqa: E402
from aero_tpu.utils.config import load_config  # noqa: E402


def timeit(fn, *args, n=8):
    """Steady-state per-call time: dispatch ``n`` calls asynchronously
    (one executor stream serializes them on-chip), force ONE scalar
    fetch depending on the last call — the ~30-90 ms tunnel round trip
    is paid once and amortized away (same methodology as bench.py
    pipelined mode). Median of 3 reps."""
    outs = fn(*args)
    jax.block_until_ready(outs)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            outs = fn(*args)
        leaf = jax.tree_util.tree_leaves(outs)[0]
        float(jnp.sum(leaf))
        reps.append((time.perf_counter() - t0) / n)
    return float(np.median(reps))


def timeit_chained(step, state, lr, hr, n=8):
    """Like timeit for the full (state->state) train step: chain the
    state through ``n`` calls so XLA cannot elide any of them. ``step``
    must donate its state argument (otherwise n live states OOM)."""
    s = jax.tree.map(jnp.copy, state)
    s, m = step(s, lr, hr)
    jax.block_until_ready(m)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            s, m = step(s, lr, hr)
        float(jnp.sum(m["total"]))
        reps.append((time.perf_counter() - t0) / n)
    return float(np.median(reps))


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.pop("batch", 8))
    overrides = [f"{k}={v}" for k, v in kv.items()]
    args = load_config("conf", "main_config",
                       ["experiment=aero_4-16_512_64", "dset=debug",
                        "precision=bfloat16"] + overrides)

    models = build.build_models(args)
    mesh = pmesh.make_mesh()
    lr_shape, hr_shape = build.segment_shapes(args)
    rng = jax.random.PRNGKey(0)
    init_rng, state_rng = jax.random.split(rng)
    variables = build.init_variables(args, models, init_rng, lr_shape,
                                     hr_shape)
    state = init_state(args, models, variables, state_rng)
    state = pmesh.replicate(state, mesh)
    step = make_train_step(args, models, mesh, donate=True)

    exp = args.experiment
    seg = int(exp.segment * exp.lr_sr)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(0.1 * rng.standard_normal((batch, 1, seg)), jnp.float32)
    hr = jnp.asarray(0.1 * rng.standard_normal((batch, 1, seg * 4)),
                     jnp.float32)

    t_full = timeit_chained(step, state, lr, hr)
    aud = batch * float(exp.segment)
    print(f"full train step (B={batch}): {t_full * 1e3:8.1f} ms   "
          f"({aud / t_full:.1f} audio-sec/s)")

    lc = LossComputer(args, models)
    lstate = pmesh.local_state(state)
    gen = models["generator"]

    fwd = jax.jit(lambda s, a: gen.apply(
        {"params": s.gen_params, **s.gen_state}, a, train=True,
        mutable=["batch_stats"]))
    print(f"  gen fwd (train=True):      "
          f"{timeit(fwd, lstate, lr) * 1e3:8.1f} ms")

    def gen_loss(params, s, a, b):
        pr, _ = gen.apply({"params": params, **s.gen_state}, a,
                          train=True, mutable=["batch_stats"])
        losses = lc.generator_losses(pr, b, s.disc_params, s.disc_state,
                                     train=True)
        return sum(losses.values())

    ggrad = jax.jit(lambda s, a, b: jax.grad(gen_loss)(
        s.gen_params, s, a, b))
    print(f"  gen loss+grad:             "
          f"{timeit(ggrad, lstate, lr, hr) * 1e3:8.1f} ms")

    # discriminator side: loss+grad w.r.t. disc params (pr detached),
    # the 3 disc forwards + backwards of solver.py:479-497 equivalent
    pr = jax.jit(lambda s, a: gen.apply(
        {"params": s.gen_params, **s.gen_state}, a, train=False))(lstate, lr)
    pr = jax.block_until_ready(pr)

    def disc_loss(dparams, s, p, b):
        losses, _ = lc.discriminator_losses(p, b, dparams, s.disc_state,
                                            train=True)
        return sum(losses.values())

    if lc.adversarial:
        dgrad = jax.jit(lambda s, p, b: jax.grad(disc_loss)(
            s.disc_params, s, p, b))
        print(f"  disc loss+grad:            "
              f"{timeit(dgrad, lstate, pr, hr) * 1e3:8.1f} ms")

        dfwd = jax.jit(lambda s, p, b: disc_loss(s.disc_params, s, p, b))
        print(f"  disc loss fwd only:        "
              f"{timeit(dfwd, lstate, pr, hr) * 1e3:8.1f} ms")

    # optimizer update cost (gen tree, adam)
    from aero_tpu.train.train_step import make_optimizer
    import optax
    opt = make_optimizer(args)
    gg = jax.jit(lambda s, a, b: jax.grad(gen_loss)(s.gen_params, s, a, b))(
        lstate, lr, hr)
    gg = jax.block_until_ready(gg)

    def opt_step(grads, s):
        upd, new_opt = opt.update(grads, s.gen_opt_state, s.gen_params)
        return optax.apply_updates(s.gen_params, upd), new_opt

    print(f"  gen adam update:           "
          f"{timeit(jax.jit(opt_step), gg, lstate) * 1e3:8.1f} ms")

    extra(args, models, lstate, lr, hr)




def extra(args, models, lstate, lr, hr):
    """Deeper decomposition of the generator backward."""
    import functools
    gen = models["generator"]
    lc = LossComputer(args, models)

    def l1_loss(params, s, a, b):
        pr, _ = gen.apply({"params": params, **s.gen_state}, a,
                          train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.abs(pr - b).astype(jnp.float32))

    g1 = jax.jit(lambda s, a, b: jax.grad(l1_loss)(s.gen_params, s, a, b))
    print(f"  grad of l1-only:           "
          f"{timeit(g1, lstate, lr, hr) * 1e3:8.1f} ms")

    def stft_loss(params, s, a, b):
        pr, _ = gen.apply({"params": params, **s.gen_state}, a,
                          train=True, mutable=["batch_stats"])
        losses = lc.generator_losses(pr, b, s.disc_params, s.disc_state,
                                     train=True)
        # keep only the non-adversarial terms; XLA DCE prunes the disc
        return sum(v for k2, v in losses.items()
                   if "melgan" not in k2 and "hifi" not in k2
                   and "adversarial" not in k2 and "features" not in k2)

    g2 = jax.jit(lambda s, a, b: jax.grad(stft_loss)(s.gen_params, s, a, b))
    print(f"  grad of l1+stft (no disc): "
          f"{timeit(g2, lstate, lr, hr) * 1e3:8.1f} ms")

    def adv_loss(params, s, a, b):
        """Adversarial+feature terms only: isolates the disc-through-
        generator backward (3rd disc forward, solver.py:481 equiv)."""
        pr, _ = gen.apply({"params": params, **s.gen_state}, a,
                          train=True, mutable=["batch_stats"])
        losses = lc.generator_losses(pr, b, s.disc_params, s.disc_state,
                                     train=True)
        return sum(v for k2, v in losses.items()
                   if "adversarial" in k2 or "features" in k2)

    if lc.adversarial:
        g3 = jax.jit(lambda s, a, b: jax.grad(adv_loss)(
            s.gen_params, s, a, b))
        print(f"  grad of adv-only (gen):    "
              f"{timeit(g3, lstate, lr, hr) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
