"""Control experiment: enc0 with the SAME matmul-ized formulation as
tools/enc0_tminor.py but channels-last [B, F, T, C] arrays. Isolates
layout choice from formulation (conv_general/gather vs pure einsum).

Usage: python tools/enc0_clmm.py [batch=16] [sec=10]
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
from enc0_tminor import make_params, B_F, C0, C, R, H  # noqa: E402


def conv_t_cl(x, k, dilation=1):
    """x [N, T, Cin], k [k, Cin, Cout] -> [N, T, Cout] (same pad)."""
    pad = dilation * (k.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, k, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))


def enc0_clmm(p, z, stage=99):
    """z [B, F=256, T, C0=2] -> [B, 64, T, C]."""
    b, f, t, _ = z.shape
    x = jnp.einsum("bftc,cd->bftd", z, p["pre_w"]) + p["pre_b"]
    if stage <= 0:
        return x

    # ---- FTB ----
    h = jnp.einsum("bftc,cr->btrf", x, p["ftb_c1_w"]) \
        + p["ftb_c1_b"][None, None, :, None]
    h = jax.nn.relu(h)
    h = h.reshape(b, t, R * f)               # r-major flatten (torch order)
    w1d = p["ftb_c1d_w"].reshape(9, f, R, C).transpose(0, 2, 1, 3) \
        .reshape(9, R * f, C)                # f-major -> r-major rows
    h = conv_t_cl(h, w1d) + p["ftb_c1d_b"]
    h = jax.nn.relu(h)                       # [B, T, C]
    att = h[:, None] * x                     # [B, F, T, C]
    m = jnp.einsum("bftc,cd->bftd", att, p["ftb_c2_wa"])
    m = jnp.einsum("gf,bftc->bgtc", p["ftb_fc"], m)
    x = m + jnp.einsum("bftc,cd->bftd", x, p["ftb_c2_wb"]) + p["ftb_c2_b"]
    x = jax.nn.relu(x)
    if stage <= 1:
        return x

    # ---- freq conv k=8 s=4 (pad 2), slice-based (no gather) ----
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    xb = xp.reshape(b, 65, 4, t, C)
    wk = p["fconv_w"].reshape(8, C, C)
    x = (jnp.einsum("bfjtc,jcd->bftd", xb[:, :64], wk[:4])
         + jnp.einsum("bfjtc,jcd->bftd", xb[:, 1:65], wk[4:])
         + p["fconv_b"])
    x = jax.nn.gelu(x, approximate=False)    # [B, 64, T, C]
    if stage <= 2:
        return x

    # ---- DConv (depth 2, snake, GroupNorm(1), LayerScale) ----
    rows = x.reshape(b * 64, t, C)
    for d in range(2):
        q = p["dc"][d]
        hh = conv_t_cl(rows, q["c1_w"], dilation=2 ** d) + q["c1_b"]
        mu = jnp.mean(hh.astype(jnp.float32), axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(hh.astype(jnp.float32)), axis=(1, 2),
                       keepdims=True) - mu * mu
        hh = ((hh.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
              ).astype(hh.dtype)
        a = jnp.tile(q["snake_a"].astype(hh.dtype), (b,))[:, None, None]
        hh = hh + (1.0 / a) * jnp.sin(hh * a) ** 2
        hh = jnp.einsum("rtc,cd->rtd", hh, q["c2_w"]) + q["c2_b"]
        ga, gb = jnp.split(hh, 2, axis=-1)
        hh = ga * jax.nn.sigmoid(gb)
        rows = rows + q["scale"][None, None, :] * hh
    x = rows.reshape(b, 64, t, C)
    if stage <= 3:
        return x

    # ---- rewrite 1x1 + GLU ----
    y = jnp.einsum("bftc,cd->bftd", x, p["rw_w"]) + p["rw_b"]
    ya, yb = jnp.split(y, 2, axis=-1)
    return ya * jax.nn.sigmoid(yb)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.get("batch", 16))
    sec = float(kv.get("sec", 10))
    t = int(sec * 4000) // 16 + 1

    rng = np.random.default_rng(0)
    p = make_params(rng)
    z = jnp.asarray(0.1 * rng.standard_normal((batch, B_F, t, C0)),
                    jnp.bfloat16)

    print(f"CL matmul-ized enc0 (batch={batch}, T={t}, bf16); "
          f"CL-module ~64 ms, T-minor ~35 ms")
    stages = ["pre", "+FTB", "+fconv/gelu", "+DConv", "+rewrite"]
    for stage in range(5):
        fn = jax.jit(functools.partial(enc0_clmm, stage=stage))
        ms = timed(lambda zz, pp: fn(pp, zz), z, p)
        print(f"  stage {stage} {stages[stage]:12s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
