"""T-minor layout experiment: enc0 forward as [B, F, C, T] (time on the
128-lane axis, 2501->2560 = 2.4% pad) vs the production channels-last
[B, F, T, C] (C=48 -> 128 lanes = 2.7x pad on every tensor).

Replicates the canonical enc0 composition: pre_conv 1x1 (2->48), FTB,
freq conv k=8 s=4, gelu (norm_starts=2 => no GroupNorm at enc0), DConv
(depth 2, snake, GroupNorm(1), LayerScale), rewrite 1x1 + GLU.
Weights are random (timing experiment; weight-permutation for parity is
an import-shim detail).

Variants for the two time-axis convs (FTB conv1d k=9, DConv conv1 k=3):
  ncw  : XLA conv_general_dilated in NCW
  nwc  : transpose sandwich -> NWC conv -> transpose back

Usage: python tools/enc0_tminor.py [batch=16] [sec=10]
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "tools")
from profile_layers import timed  # noqa: E402

B_F, C0, C, R = 256, 2, 48, 5   # freq bins, in-ch, channels, FTB r
H = 12                          # DConv hidden


def conv_t_ncw(x, k, dilation=1):
    """x [N, Cin, T], k [k, Cin, Cout] -> [N, Cout, T] (same pad)."""
    kk = jnp.transpose(k, (2, 1, 0))  # OIW
    pad = dilation * (k.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, kk, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NCW", "OIW", "NCW"))


def conv_t_nwc(x, k, dilation=1):
    """Transpose sandwich: NWC conv with features minor."""
    pad = dilation * (k.shape[0] // 2)
    y = jnp.transpose(x, (0, 2, 1))
    y = jax.lax.conv_general_dilated(
        y, k, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return jnp.transpose(y, (0, 2, 1))


def make_params(rng):
    def r(*shape):
        return jnp.asarray(0.1 * rng.standard_normal(shape), jnp.bfloat16)

    return dict(
        pre_w=r(C0, C), pre_b=r(C),
        ftb_c1_w=r(C, R), ftb_c1_b=r(R),
        ftb_c1d_w=r(9, R * B_F, C), ftb_c1d_b=r(C),
        ftb_fc=r(B_F, B_F),
        ftb_c2_wa=r(C, C), ftb_c2_wb=r(C, C), ftb_c2_b=r(C),
        fconv_w=r(8 * C, C), fconv_b=r(C),
        dc=[dict(c1_w=r(3, C, H), c1_b=r(H),
                 snake_a=jnp.abs(r(64)) + 0.5,
                 c2_w=r(H, 2 * C), c2_b=r(2 * C),
                 scale=r(C) * 0.01)
            for _ in range(2)],
        rw_w=r(C, 2 * C), rw_b=r(2 * C),
    )


def enc0_tminor(p, z, conv_t, stage=99):
    """z [B, F=256, C0=2, T] -> [B, 64, C, T]."""
    b, f, _, t = z.shape
    x = jnp.einsum("bfct,cd->bfdt", z, p["pre_w"]) \
        + p["pre_b"][None, None, :, None]
    if stage <= 0:
        return x

    # ---- FTB ----
    h = jnp.einsum("bfct,cr->bfrt", x, p["ftb_c1_w"]) \
        + p["ftb_c1_b"][None, None, :, None]
    h = jax.nn.relu(h)                       # (BN folds into affine; skip)
    h = h.reshape(b, f * R, t)               # f-major flatten
    h = conv_t(h, p["ftb_c1d_w"]) + p["ftb_c1d_b"][None, :, None]
    h = jax.nn.relu(h)                       # [B, C, T]
    att = h[:, None, :, :] * x               # [B, F, C, T]
    m = jnp.einsum("bfct,cd->bfdt", att, p["ftb_c2_wa"])
    m = jnp.einsum("gf,bfct->bgct", p["ftb_fc"], m)
    x = m + jnp.einsum("bfct,cd->bfdt", x, p["ftb_c2_wb"]) \
        + p["ftb_c2_b"][None, None, :, None]
    x = jax.nn.relu(x)
    if stage <= 1:
        return x

    # ---- freq conv k=8 s=4 (pad 2) ----
    # No gather: pad F to 260 = 65*4, view as 4-blocks; each output f
    # reads blocks f and f+1 (taps 0-3 and 4-7). Two slice+einsum pairs.
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    xb = xp.reshape(b, 65, 4, C, t)
    wk = p["fconv_w"].reshape(8, C, C)
    x = (jnp.einsum("bfjct,jcd->bfdt", xb[:, :64], wk[:4])
         + jnp.einsum("bfjct,jcd->bfdt", xb[:, 1:65], wk[4:])
         + p["fconv_b"][None, None, :, None])
    x = jax.nn.gelu(x, approximate=False)    # [B, 64, C, T]
    if stage <= 2:
        return x

    # ---- DConv (depth 2, snake, GroupNorm(1), LayerScale) ----
    rows = x.reshape(b * 64, C, t)
    for d in range(2):
        q = p["dc"][d]
        hh = conv_t(rows, q["c1_w"], dilation=2 ** d) \
            + q["c1_b"][None, :, None]
        mu = jnp.mean(hh.astype(jnp.float32), axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(hh.astype(jnp.float32)), axis=(1, 2),
                       keepdims=True) - mu * mu
        hh = ((hh.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
              ).astype(hh.dtype)
        # per-freq snake a; row r = bi*64 + f  =>  tile the f-vector
        a = jnp.tile(q["snake_a"].astype(hh.dtype), (b,))[:, None, None]
        hh = hh + (1.0 / a) * jnp.sin(hh * a) ** 2
        hh = jnp.einsum("rct,cd->rdt", hh, q["c2_w"]) \
            + q["c2_b"][None, :, None]
        ga, gb = jnp.split(hh, 2, axis=1)
        hh = ga * jax.nn.sigmoid(gb)
        rows = rows + q["scale"][None, :, None] * hh
    x = rows.reshape(b, 64, C, t)
    if stage <= 3:
        return x

    # ---- rewrite 1x1 + GLU ----
    y = jnp.einsum("bfct,cd->bfdt", x, p["rw_w"]) \
        + p["rw_b"][None, None, :, None]
    ya, yb = jnp.split(y, 2, axis=2)
    return ya * jax.nn.sigmoid(yb)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.get("batch", 16))
    sec = float(kv.get("sec", 10))
    t = int(sec * 4000) // 16 + 1

    rng = np.random.default_rng(0)
    p = make_params(rng)
    z = jnp.asarray(0.1 * rng.standard_normal((batch, B_F, C0, t)),
                    jnp.bfloat16)

    print(f"T-minor enc0 (batch={batch}, T={t}, bf16); CL reference: "
          f"~64 ms (profile_layers encoder_0)")
    stages = ["pre", "+FTB", "+fconv/gelu", "+DConv", "+rewrite"]
    for stage in range(5):
        fn = jax.jit(functools.partial(enc0_tminor, conv_t=conv_t_ncw,
                                       stage=stage))
        ms = timed(lambda zz, pp: fn(pp, zz), z, p)
        print(f"  stage {stage} {stages[stage]:12s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
