"""Measure how LOCAL the trained LocalState attention actually is.

Decides whether a banded attention kernel (compute scores only for
|t - s| <= W) can replace the exact O(T^2) one at serving time without
changing results beyond rounding. The exact kernel is score-emission
bound (PERF.md "Attention"), so a valid band W << T cuts the dominant
attention cost by ~T/(2W).

Method: load a trained checkpoint, run the generator forward on a real
eval-length input with flax 'intermediates' mutable — `LocalState` sows
its (queries, keys, content, decay_w) — then for every attention site
compute the DENSE exact softmax (f32) and report, per band half-width W:

  - tail_mass: max over (batch, head, query) of the softmax probability
    mass OUTSIDE the band — the quantity a banded kernel drops;
  - out_rel:   max relative L2 error of the banded output vs exact,
    per query row (the end-to-end effect on the attention result).

Also prints the trained per-head decay-slope stats (min slope bounds the
worst-case tail: mass beyond W scales like exp(-w_min * W) relative).

Usage:
  AERO_PLATFORM=cpu python tools/attn_band_probe.py \
      checkpoint=/tmp/canon_r4/run/outputs/debug/aero-nfft=512-hl=64/best.atpu \
      [duration=10] [widths=64,128,256,512]

Runs fine on CPU (dense T^2 in f32, a few hundred MB).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

os.environ.setdefault("AERO_PLATFORM", "cpu")
from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.train import build  # noqa: E402
from aero_tpu.utils.config import load_config  # noqa: E402


def _kv(argv):
    out = {}
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            out[k] = v
    return out


def band_report(q, k, v, w, widths, tag):
    """q/k/v: [B, T, H, C] f32; w: [B, T, H] (per-query decay slope)."""
    b, t, h, c = q.shape
    scores = np.einsum("bthc,bshc->bhts", k, q,
                       optimize=True).astype(np.float32)
    idx = np.arange(t)
    delta = np.abs(idx[:, None] - idx[None, :]).astype(np.float32)  # [t, s]
    scores -= delta[None, None] * w.transpose(0, 2, 1)[:, :, None, :].astype(
        np.float32)
    np.einsum("bhtt->bht", scores)[...] = -100.0  # self mask (diag view)
    scores -= scores.max(axis=2, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=2, keepdims=True)  # softmax over keys t
    out_exact = np.einsum("bhts,bthc->bshc", p, v, optimize=True)
    norm = np.linalg.norm(out_exact, axis=-1)  # [b, h?, ...] -> [b,s,h]
    print(f"\n{tag}: B={b} T={t} H={h} C'={c}")
    wmin = w.min(axis=(0, 1))
    wmed = np.median(w, axis=(0, 1))
    print("  decay slope per head: min", np.array2string(wmin, precision=4),
          " median", np.array2string(wmed, precision=4))
    rows = []
    for W in widths:
        inband = (delta <= W)[None, None]  # [1,1,t,s]
        pb = np.where(inband, p, 0.0)
        pb_sum = pb.sum(axis=2, keepdims=True)
        tail = 1.0 - pb_sum[:, :, 0]  # [b,h,s]
        pb = pb / np.maximum(pb_sum, 1e-30)
        out_band = np.einsum("bhts,bthc->bshc", pb, v, optimize=True)
        rel = (np.linalg.norm(out_band - out_exact, axis=-1)
               / np.maximum(norm, 1e-12))
        rows.append((W, tail.max(), float(np.quantile(tail, 0.999)),
                     rel.max(), float(np.quantile(rel, 0.999))))
    print("     W   tail_max   tail_p999   out_rel_max  out_rel_p999")
    for W, tm, tq, rm, rq in rows:
        print(f"  {W:>4}   {tm:.3e}  {tq:.3e}   {rm:.3e}    {rq:.3e}")
    return rows


def main():
    kv = _kv(sys.argv[1:])
    ckpt = kv.get("checkpoint")
    assert ckpt and os.path.exists(ckpt), f"checkpoint not found: {ckpt}"
    duration = float(kv.get("duration", "10"))
    widths = [int(x) for x in kv.get("widths", "32,64,128,256,512").split(",")]

    args = load_config("conf", "main_config", [
        "experiment=aero_4-16_512_64", "dset=debug",
        f"checkpoint_file={ckpt}", "precision=float32",
    ])
    models = build.build_models(args)
    state = build.load_generator_state(args, models)
    gen = models["generator"]
    variables = {"params": state.gen_params, **state.gen_state}

    # Eval-length input drawn from the same synthetic family the
    # checkpoint was trained on (speech-shaped harmonics + noise).
    rng = np.random.default_rng(0)
    sr = int(args.experiment.lr_sr)
    n = int(duration * sr)
    tt = np.arange(n) / sr
    f0 = 110 * 2 ** rng.uniform(0, 1)
    x = np.zeros(n)
    for hnum in range(1, 12):
        x += rng.uniform(0.05, 1.0) / hnum * np.sin(
            2 * np.pi * f0 * hnum * tt + rng.uniform(0, 2 * np.pi))
    x += 0.01 * rng.standard_normal(n)
    x = (0.2 * x / np.abs(x).max()).astype(np.float32)[None, None]

    out, inter = gen.apply(variables, jnp.asarray(x), train=False,
                           mutable=["intermediates"])
    print(f"forward ok: in {x.shape} -> out {np.asarray(out).shape}")

    sites = []

    def walk(tree, path):
        if isinstance(tree, dict):
            for kk, vv in tree.items():
                walk(vv, path + "/" + kk)
        else:
            # sow stores a tuple of appended values; each value is the
            # (queries, keys, content, decay_w) tuple from one call
            for item in tree:
                sites.append((path, tuple(np.asarray(a) for a in item)))

    walk(dict(inter)["intermediates"], "")

    worst = {}
    for path, (q, k, v, w) in sites:
        rows = band_report(np.asarray(q, np.float32), np.asarray(k, np.float32),
                           np.asarray(v, np.float32), np.asarray(w, np.float32),
                           widths, path)
        for W, tm, _, rm, _ in rows:
            a, b_ = worst.get(W, (0.0, 0.0))
            worst[W] = (max(a, tm), max(b_, rm))

    print("\n== overall worst over all attention sites ==")
    print("     W   tail_max   out_rel_max")
    for W in widths:
        tm, rm = worst[W]
        print(f"  {W:>4}   {tm:.3e}   {rm:.3e}")


if __name__ == "__main__":
    main()
