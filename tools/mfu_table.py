"""Per-block and whole-model MFU on the real chip (VERDICT r3 #1 +
r4 #3).

Inference mode (default): for each encoder/decoder layer and the full
forward (canonical aero_4-16_512_64, B=16, 10 s, bf16 by default),
measures latency-compensated per-call ms (tools/profile_layers.py
methodology) AND analytic matmul/conv FLOPs
(aero_tpu/utils/flops.count_flops on the exact dispatched jaxpr), then
reports achieved FLOP/s as a fraction of the chip's bf16 dense peak.
This is the quantitative form of PERF.md's per-block floor claims — a
block "at its floor" with single-digit MFU is bandwidth/emission-bound
by design, not left on the table.

Train mode (``train=1``): the same discipline for the fused GAN step
(B=16, 2 s segments): full step, gen fwd, l1-only grad (U-Net fwd+bwd),
STFT-loss-bwd increment, adv-through-gen increment, disc fwd+bwd, Adam,
plus isolated attention-bwd / LSTM-bwd blocks at the enc2/enc3 train
shapes — each with ms, analytic TF, and MFU (PERF.md "Train-step MFU
table"). Loss semantics mirror /root/reference/src/solver.py:277-349.

Usage: python tools/mfu_table.py [precision=bfloat16] [batch=16] [sec=10]
       python tools/mfu_table.py train=1 [batch=16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

import profile_layers as PL  # noqa: E402  (selects platform on import)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.models.aero import Aero, HDecLayer, HEncLayer  # noqa: E402
from aero_tpu.train import build  # noqa: E402
from aero_tpu.utils.config import load_config  # noqa: E402
from aero_tpu.utils.flops import count_flops, peak_flops_per_sec  # noqa: E402


def row(label, ms, flops, peak):
    tf = flops / 1e12
    mfu = (flops / (ms / 1e3) / peak * 100) if ms > 0 and peak else float("nan")
    print(f"{label:44s} {ms:8.2f} ms {tf:9.4f} TF {mfu:6.1f} % MFU")
    return mfu


def train_main(overrides):
    """Per-piece MFU of the fused GAN train step (VERDICT r4 #3)."""
    import profile_train_step as PT

    from aero_tpu.models.modules import BLSTM, LocalState, set_compute_dtype
    from aero_tpu.parallel import mesh as pmesh
    from aero_tpu.train.train_step import (
        LossComputer, init_state, make_train_step,
    )

    batch = int(overrides.pop("batch", 16))
    cfg = [f"{k}={v}" for k, v in overrides.items()]
    if not any(c.startswith("precision=") for c in cfg):
        cfg.append("precision=bfloat16")
    args = load_config("conf", "main_config",
                       ["experiment=aero_4-16_512_64", "dset=debug"] + cfg)
    models = build.build_models(args)
    mesh = pmesh.make_mesh()
    lr_shape, hr_shape = build.segment_shapes(args)
    lr_shape = (batch,) + lr_shape[1:]
    hr_shape = (batch,) + hr_shape[1:]
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = pmesh.replicate(
        init_state(args, models, variables, jax.random.PRNGKey(1)), mesh)
    lstate = pmesh.local_state(state)
    peak = peak_flops_per_sec()
    dev = jax.devices()[0]
    print(f"device {getattr(dev, 'device_kind', dev.platform)}, peak "
          f"{(peak or 0) / 1e12:.0f} bf16 TFLOP/s, B={batch}, "
          f"{args.experiment.segment}s segments, train step")

    rng = np.random.default_rng(0)
    lr = jnp.asarray(0.1 * rng.standard_normal(lr_shape), jnp.float32)
    hr = jnp.asarray(0.1 * rng.standard_normal(hr_shape), jnp.float32)
    gen = models["generator"]
    lc = LossComputer(args, models)

    # full fused step: chained-donated timing, FLOPs from a non-donating
    # twin (same jaxpr, donation only affects buffer reuse)
    step = make_train_step(args, models, mesh, donate=True)
    t_full = PT.timeit_chained(step, state, lr, hr) * 1e3
    step_nd = make_train_step(args, models, mesh, donate=False)
    fc_full = count_flops(step_nd, state, lr, hr).total
    row("FULL fused GAN step", t_full, fc_full, peak)

    fwd = jax.jit(lambda s, a: gen.apply(
        {"params": s.gen_params, **s.gen_state}, a, train=True,
        mutable=["batch_stats"]))
    ms = PT.timeit(fwd, lstate, lr) * 1e3
    row("gen fwd (train=True)", ms, count_flops(fwd, lstate, lr).total, peak)

    def make_grad(term_filter):
        def loss(params, s, a, b):
            pr, _ = gen.apply({"params": params, **s.gen_state}, a,
                              train=True, mutable=["batch_stats"])
            losses = lc.generator_losses(pr, b, s.disc_params, s.disc_state,
                                         train=True)
            return sum((v for k, v in losses.items() if term_filter(k)),
                       jnp.float32(0.0))

        return jax.jit(lambda s, a, b: jax.grad(loss)(s.gen_params, s, a, b))

    is_adv = lambda k: "adversarial" in k or "features" in k \
        or "melgan" in k or "hifi" in k  # noqa: E731

    # U-Net fwd+bwd in isolation: the canonical config has losses=[stft]
    # (no waveform-l1 term), so use an inline l1 PROXY head — same U-Net
    # backward, trivial loss head (profile_train_step.extra discipline)
    def l1_proxy(params, s, a, b):
        pr, _ = gen.apply({"params": params, **s.gen_state}, a,
                          train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.abs(pr - b).astype(jnp.float32))

    g_l1 = jax.jit(lambda s, a, b: jax.grad(l1_proxy)(s.gen_params, s, a, b))
    ms_l1 = PT.timeit(g_l1, lstate, lr, hr) * 1e3
    fc_l1 = count_flops(g_l1, lstate, lr, hr).total
    row("l1-proxy grad (U-Net fwd+bwd)", ms_l1, fc_l1, peak)

    g_stft = make_grad(lambda k: not is_adv(k))
    ms_st = PT.timeit(g_stft, lstate, lr, hr) * 1e3
    fc_st = count_flops(g_stft, lstate, lr, hr).total
    row("  + stft increment (STFT loss bwd)", ms_st - ms_l1,
        fc_st - fc_l1, peak)

    g_all = make_grad(lambda k: True)
    ms_all = PT.timeit(g_all, lstate, lr, hr) * 1e3
    fc_all = count_flops(g_all, lstate, lr, hr).total
    row("  + adv increment (disc-through-gen)", ms_all - ms_st,
        fc_all - fc_st, peak)
    row("gen loss+grad (all terms)", ms_all, fc_all, peak)

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
        ms_d = PT.timeit(dgrad, lstate, pr, hr) * 1e3
        row("disc loss+grad (pr detached + hr)", ms_d,
            count_flops(dgrad, lstate, pr, hr).total, peak)

    import optax

    from aero_tpu.train.train_step import make_optimizer

    opt = make_optimizer(args)
    gg = jax.block_until_ready(g_all(lstate, lr, hr))

    def opt_step(grads, s):
        upd, new_opt = opt.update(grads, s.gen_opt_state, s.gen_params)
        return optax.apply_updates(s.gen_params, upd), new_opt

    ms_o = PT.timeit(jax.jit(opt_step), gg, lstate) * 1e3
    row("gen Adam update (elementwise; MFU n/a)", ms_o, 0.0, peak)

    # isolated hot blocks of the U-Net backward at train shapes: the
    # fused step can't be sliced op-by-op, so attention-bwd / LSTM-bwd
    # get their own rooflines here (enc2/enc3 geometry, bf16).
    # These blocks are 2-30 ms — small enough that per-dispatch tunnel
    # overhead dominates PT.timeit's async-dispatch stream (measured
    # ~3x inflation at the attention sites), so they use the
    # latency-compensated in-jit fori_loop timer instead
    # (profile_layers discipline, generalized to pytree outputs).
    import statistics
    import time as _time

    def timed_injit(fn, args, reps=8, trials=5):
        def looped(*a):
            def body(i, acc):
                out = fn(a[0] * (1.0 + 1e-9 * acc), *a[1:])
                return acc + sum(jnp.sum(x.astype(jnp.float32)) * 1e-9
                                 for x in jax.tree.leaves(out))

            return jax.lax.fori_loop(0, reps, body, 0.0)

        f = jax.jit(looped)
        _ = float(f(*args))
        ts = []
        for _i in range(trials):
            t0 = _time.perf_counter()
            _ = float(f(*args))
            ts.append(_time.perf_counter() - t0)
        t_loop = statistics.median(ts)
        g = jax.jit(lambda x: jax.lax.fori_loop(
            0, reps, lambda i, a: a + jnp.sum(x.astype(jnp.float32)) * 1e-9,
            0.0))
        _ = float(g(args[0]))
        t0 = _time.perf_counter()
        _ = float(g(args[0]))
        overhead = _time.perf_counter() - t0
        return max(0.0, (t_loop - overhead) / reps) * 1e3

    set_compute_dtype(jnp.bfloat16)
    t_frames = lr_shape[-1] // gen.true_hop_length + 1
    for layer, (channels, f) in {2: (192, 16), 3: (384, 8)}.items():
        hidden = channels // 4
        rows_ = batch * f
        h = jnp.asarray(0.1 * rng.standard_normal((rows_, t_frames, hidden)),
                        jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        for name, mod, kw in (
                (f"attention enc{layer}", LocalState(hidden, heads=4,
                                                     ndecay=4), {}),
                (f"BLSTM enc{layer}", BLSTM(hidden, layers=2, max_steps=200,
                                            skip=True), {"train": False})):
            v = jax.jit(lambda k, y, m=mod, kk=kw: m.init(k, y, **kk))(key, h)

            def fwd1(y, vv, m=mod, kk=kw):
                return m.apply(vv, y, **kk)

            f_fwd = jax.jit(fwd1)
            ms_f = timed_injit(fwd1, (h, v))
            row(f"{name} fwd (rows={rows_}, T={t_frames}, H={hidden})",
                ms_f, count_flops(f_fwd, h, v).total, peak)

            def fwd_bwd(y, vv, m=mod, kk=kw):
                def scalar(yy, vv2):
                    return jnp.sum(m.apply(vv2, yy, **kk)
                                   .astype(jnp.float32))

                gy, gv = jax.grad(scalar, argnums=(0, 1))(y, vv)
                return (jnp.sum(gy.astype(jnp.float32))
                        + sum(jnp.sum(g.astype(jnp.float32))
                              for g in jax.tree.leaves(gv)))

            f_bwd = jax.jit(fwd_bwd)
            ms_b = timed_injit(fwd_bwd, (h, v))
            row(f"{name} fwd+bwd", ms_b, count_flops(f_bwd, h, v).total,
                peak)


def main():
    overrides = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    if overrides.pop("train", None):
        train_main(overrides)
        return
    batch = int(overrides.pop("batch", 16))
    sec = float(overrides.pop("sec", 10))
    cfg = [f"{k}={v}" for k, v in overrides.items()]
    if not any(c.startswith("precision=") for c in cfg):
        cfg.append("precision=bfloat16")
    args = load_config("conf", "main_config",
                       ["experiment=aero_4-16_512_64", "dset=4-16"] + cfg)
    models = build.build_models(args)
    gen: Aero = models["generator"]
    peak = peak_flops_per_sec()
    dev = jax.devices()[0]
    print(f"device {getattr(dev, 'device_kind', dev.platform)}, peak "
          f"{(peak or 0) / 1e12:.0f} bf16 TFLOP/s, B={batch}, {sec:g}s")

    lr_sr = int(args.experiment.lr_sr)
    t_wav = int(lr_sr * sec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal((batch, 1, t_wav)), jnp.float32)

    plan = gen._layer_plan()
    t_frames = t_wav // gen.true_hop_length + 1

    variables = jax.jit(lambda k, y: gen.init(k, y, train=False))(
        jax.random.PRNGKey(0), x[:1, :, :lr_sr])
    fwd = jax.jit(lambda lr, v: gen.apply(v, lr, train=False))
    full_ms = PL.timed(fwd, x, variables)
    full_fc = count_flops(fwd, x, variables)
    row("FULL forward", full_ms, full_fc.total, peak)
    covered = 0

    for p in plan:
        enc = HEncLayer(chout=p["chout"], dconv=bool(gen.dconv_mode & 1),
                        context=gen.context_enc, is_first=p["index"] == 0,
                        freq_attn=p["freq_attn"], freq_dim=p["freqs_in"],
                        **p["kw"])
        cin = p["enc_chin"]
        xin = jnp.asarray(
            0.1 * rng.standard_normal((batch, p["freqs_in"], t_frames, cin)),
            jnp.float32)
        v = jax.jit(lambda k, y, m=enc: m.init(k, y, train=False))(
            jax.random.PRNGKey(0), xin)
        f = jax.jit(lambda y, vv, m=enc: m.apply(vv, y, train=False))
        ms = PL.timed(f, xin, v)
        fc = count_flops(f, xin, v)
        covered += fc.total
        row(f"enc{p['index']} (F={p['freqs_in']}, C={cin}->{p['chout']})",
            ms, fc.total, peak)

    for j, p in enumerate(reversed(plan)):
        stri = p["kw"]["stride"]
        f_in = p["freqs_in"] // stri if p["kw"]["freq"] else p["freqs_in"]
        dec = HDecLayer(chin=2 * p["chout"], chout=p["dec_chout"],
                        last=p["index"] == 0, dconv=bool(gen.dconv_mode & 2),
                        context=gen.context, **p["kw"])
        xin = jnp.asarray(
            0.1 * rng.standard_normal((batch, f_in, t_frames, p["chout"])),
            jnp.float32)
        skip = xin
        v = jax.jit(lambda k, a, b, m=dec: m.init(k, a, b, t_frames,
                                                  train=False))(
            jax.random.PRNGKey(0), xin, skip)
        f = jax.jit(lambda a, b, vv, m=dec: m.apply(vv, a, b, t_frames,
                                                    train=False))
        ms = PL.timed(f, xin, skip, v)
        fc = count_flops(f, xin, skip, v)
        covered += fc.total
        row(f"dec{j} (from enc{p['index']}, F={f_in}, C={p['chout']})",
            ms, fc.total, peak)

    print(f"\nper-layer FLOP coverage of the full forward: "
          f"{covered / full_fc.total * 100:.1f}% "
          f"(rest = STFT/iSTFT GEMMs + freq-embedding glue)")


if __name__ == "__main__":
    main()
