"""Decompose enc0 cost: pre_conv, FTB, freq conv, DConv, rewrite.

Usage: python tools/profile_enc0.py [batch=16] [sec=10]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.models.modules import (  # noqa: E402
    FTB, Conv2d, DConv, GroupNorm, set_compute_dtype)

sys.path.insert(0, "tools")
from profile_layers import timed  # noqa: E402


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.get("batch", 16))
    sec = float(kv.get("sec", 10))

    set_compute_dtype(jnp.bfloat16)
    t = int(sec * 4000) // 16 + 1
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def mk(shape):
        return jnp.asarray(0.1 * rng.standard_normal(shape), jnp.bfloat16)

    out = []
    x2 = mk((batch, 256, t, 2))
    x48 = mk((batch, 256, t, 48))
    x64_48 = mk((batch, 64, t, 48))

    pre = Conv2d(48, (1, 1))
    v = pre.init(key, x2)
    out.append(("pre_conv 1x1 2->48 (F=256)", timed(jax.jit(
        lambda y, vv: pre.apply(vv, y)), x2, v)))

    ftb = FTB(input_dim=256, in_channel=48)
    v = jax.jit(lambda k, y: ftb.init(k, y, train=False))(key, x48)
    out.append(("FTB (F=256, C=48)", timed(jax.jit(
        lambda y, vv: ftb.apply(vv, y, train=False)), x48, v)))

    conv = Conv2d(48, (8, 1), (4, 1), (2, 0))
    v = conv.init(key, x48)
    out.append(("freq conv k=8 s=4 48->48", timed(jax.jit(
        lambda y, vv: conv.apply(vv, y)), x48, v)))

    gn = GroupNorm(1)
    v = gn.init(key, x64_48)
    out.append(("groupnorm (F=64, C=48)", timed(jax.jit(
        lambda y, vv: gn.apply(vv, y)), x64_48, v)))

    dc = DConv(48, norm=True, act_func="gelu", reshape=True)
    v = jax.jit(lambda k, y: dc.init(k, y, train=False))(key, x64_48)
    out.append(("DConv (rows=B*64, H=12)", timed(jax.jit(
        lambda y, vv: dc.apply(vv, y, train=False)), x64_48, v)))

    rw = Conv2d(96, (1, 1))
    v = rw.init(key, x64_48)
    out.append(("rewrite 1x1 48->96", timed(jax.jit(
        lambda y, vv: rw.apply(vv, y)), x64_48, v)))

    print(f"\nenc0 decomposition (batch={batch}, T={t}, bf16):")
    for name, ms in out:
        print(f"  {name:32s} {ms:8.2f} ms")
    print(f"  {'sum':32s} {sum(m for _, m in out):8.2f} ms")


if __name__ == "__main__":
    main()
