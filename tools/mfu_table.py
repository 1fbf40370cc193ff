"""Per-block and whole-model MFU on the real chip (VERDICT r3 #1).

For each encoder/decoder layer and the full forward (canonical
aero_4-16_512_64, B=16, 10 s, bf16 by default), measures
latency-compensated per-call ms (tools/profile_layers.py methodology)
AND analytic matmul/conv FLOPs (aero_tpu/utils/flops.count_flops on the
exact dispatched jaxpr), then reports achieved FLOP/s as a fraction of
the chip's bf16 dense peak. This is the quantitative form of PERF.md's
per-block floor claims — a block "at its floor" with single-digit MFU
is bandwidth/emission-bound by design, not left on the table.

Usage: python tools/mfu_table.py [precision=bfloat16] [batch=16] [sec=10]
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


def main():
    overrides = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
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
