"""Per-layer latency profiler for the AERO forward pass.

The remote-tunneled TPU makes op-level traces impractical (per-call
round trip 30-90 ms, unreliable async timing), so this tool times each
encoder/decoder layer standalone with latency-compensated in-jit
repetition: the layer runs R times inside one jit (data-dependent so XLA
cannot hoist it), and a same-structure trivial loop is subtracted as
overhead.

Usage:
    python tools/profile_layers.py [precision=bfloat16] [batch=16] [sec=10]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import statistics  # noqa: E402
import time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.models.aero import Aero, HDecLayer, HEncLayer  # noqa: E402
from aero_tpu.train import build  # noqa: E402
from aero_tpu.utils.config import load_config  # noqa: E402


def timed(fn, *args, reps=10, trials=3):
    """Latency-compensated per-call milliseconds."""

    def looped(*a):
        def body(i, acc):
            # perturb the first arg so XLA cannot hoist the call
            out = fn(a[0] * (1.0 + 1e-9 * acc), *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)

    f = jax.jit(looped)
    _ = float(f(*args))
    ts = []
    for _i in range(trials):
        t0 = time.perf_counter()
        _ = float(f(*args))
        ts.append(time.perf_counter() - t0)
    t_loop = statistics.median(ts)

    g = jax.jit(lambda x: jax.lax.fori_loop(
        0, reps, lambda i, a: a + jnp.sum(x.astype(jnp.float32)) * 1e-9, 0.0))
    _ = float(g(args[0]))
    t0 = time.perf_counter()
    _ = float(g(args[0]))
    overhead = time.perf_counter() - t0
    return max(0.0, (t_loop - overhead) / reps) * 1000


def main():
    overrides = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(overrides.pop("batch", 16))
    sec = float(overrides.pop("sec", 10))
    cfg = [f"{k}={v}" for k, v in overrides.items()]
    args = load_config("conf", "main_config",
                       ["experiment=aero_4-16_512_64", "dset=4-16"] + cfg)
    models = build.build_models(args)
    gen: Aero = models["generator"]

    lr_sr = int(args.experiment.lr_sr)
    t_wav = int(lr_sr * sec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal((batch, 1, t_wav)), jnp.float32)

    # representative per-layer inputs from the plan
    plan = gen._layer_plan()
    t_frames = t_wav // gen.true_hop_length + 1
    rows = []

    # full forward
    variables = jax.jit(lambda k, y: gen.init(k, y, train=False))(
        jax.random.PRNGKey(0), x[:1, :, :lr_sr])
    full_ms = timed(jax.jit(
        lambda lr, v: gen.apply(v, lr, train=False)), x, variables)
    rows.append(("FULL forward", full_ms))

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
        ms = timed(jax.jit(
            lambda y, vv, m=enc: m.apply(vv, y, train=False)), xin, v)
        rows.append((f"encoder_{p['index']} (F={p['freqs_in']}, C={cin}->"
                     f"{p['chout']})", ms))

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
        ms = timed(jax.jit(
            lambda a, vv, b, m=dec: m.apply(vv, a, b, t_frames, train=False)),
            xin, v, skip)
        rows.append((f"decoder_{j} (F={f_in}->, C=2x{p['chout']}->"
                     f"{p['dec_chout']})", ms))

    print(f"\nPer-layer latency (batch={batch}, {sec:.0f}s audio, "
          f"precision={args.get('precision')}, reps-compensated):")
    layer_sum = sum(ms for name, ms in rows[1:])
    for name, ms in rows:
        print(f"  {name:44s} {ms:8.2f} ms")
    print(f"  {'sum of layers':44s} {layer_sum:8.2f} ms "
          f"(full fwd includes STFT/iSTFT + glue)")


if __name__ == "__main__":
    main()
