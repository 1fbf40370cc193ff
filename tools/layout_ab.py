"""A/B: channels-last [BF, T, C] vs time-minor [BF, C, T] for enc0 ops.

Usage: python tools/layout_ab.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "tools")
from profile_layers import timed  # noqa: E402

B, F, T, C = 16, 64, 2501, 48
H = 12


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(0.1 * rng.standard_normal(shape), jnp.bfloat16)

    x_cl = mk((B * F, T, C))      # channels-last
    x_tm = mk((B * F, C, T))      # time-minor
    k3 = mk((3, C, H))            # conv1 kernel
    k1 = mk((C, 2 * C))           # rewrite kernel

    print(f"rows={B * F} T={T} C={C} (bf16)")

    # gelu + per-row norm (groupnorm(1) ~ mean/var over (T, C))
    def gn_gelu_cl(x):
        m = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                     keepdims=True) - m * m
        y = (x - m.astype(x.dtype)) * jax.lax.rsqrt(v + 1e-5).astype(x.dtype)
        return jax.nn.gelu(y)

    print(f"  norm+gelu   CL {timed(jax.jit(gn_gelu_cl), x_cl):7.2f} ms   "
          f"TM {timed(jax.jit(gn_gelu_cl), x_tm):7.2f} ms")

    # conv1 k=3 C->H over T
    def conv_cl(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"))

    def conv_tm(x, k):
        return jax.lax.conv_general_dilated(
            x, jnp.transpose(k, (2, 1, 0)), (1,), [(1, 1)],
            dimension_numbers=("NCW", "OIW", "NCW"))

    def conv_tm_dot(x, k):
        # three shifted [H, C] @ [C, T] matmuls accumulated
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
        acc = None
        for i in range(3):
            y = jnp.einsum("ch,bct->bht", k[i], xp[:, :, i:i + T])
            acc = y if acc is None else acc + y
        return acc

    print(f"  conv1 k=3   CL {timed(jax.jit(conv_cl), x_cl, k3):7.2f} ms   "
          f"TM {timed(jax.jit(conv_tm), x_tm, k3):7.2f} ms   "
          f"TMdot {timed(jax.jit(conv_tm_dot), x_tm, k3):7.2f} ms")

    # rewrite 1x1 C->2C + GLU
    def rw_cl(x, k):
        y = x @ k
        a, b = jnp.split(y, 2, -1)
        return a * jax.nn.sigmoid(b)

    def rw_tm(x, k):
        y = jnp.einsum("bct,cd->bdt", x, k)
        a, b = jnp.split(y, 2, 1)
        return a * jax.nn.sigmoid(b)

    print(f"  rewrite+glu CL {timed(jax.jit(rw_cl), x_cl, k1):7.2f} ms   "
          f"TM {timed(jax.jit(rw_tm), x_tm, k1):7.2f} ms")

    # freq conv k=8 s=4 (on [B, F=256, T, C] vs [B, C, F=256, T])
    xf_cl = mk((B, 256, T, C))
    xf_tm = mk((B, C, 256, T))
    kf = mk((8, 1, C, C))

    def fc_cl(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (4, 1), [(2, 2), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def fc_tm(x, k):
        return jax.lax.conv_general_dilated(
            x, jnp.transpose(k, (3, 2, 0, 1)), (4, 1), [(2, 2), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    print(f"  freqconv    CL {timed(jax.jit(fc_cl), xf_cl, kf):7.2f} ms   "
          f"TM {timed(jax.jit(fc_tm), xf_tm, kf):7.2f} ms")


if __name__ == "__main__":
    main()
