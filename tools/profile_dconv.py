"""Decompose enc2/enc3 DConv cost: conv1, norm, act, BLSTM, attention,
conv2 — each timed standalone with the latency-compensated in-jit loop.

Usage: python tools/profile_dconv.py [batch=16] [sec=10] [layer=2]
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
    BLSTM, Conv1d, DConv, GroupNorm, LocalState, set_compute_dtype)

sys.path.insert(0, "tools")
from profile_layers import timed  # noqa: E402


def main():
    overrides = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(overrides.get("batch", 16))
    sec = float(overrides.get("sec", 10))
    layer = int(overrides.get("layer", 2))

    set_compute_dtype(jnp.bfloat16)

    # enc2: C=192, F=16; enc3: C=384, F=8 (after its stride)
    cfg = {2: (192, 16), 3: (384, 8)}[layer]
    channels, f = cfg
    hidden = channels // 4
    t = int(sec * 4000) // 16 + 1  # frames at hop 16
    rows = batch * f
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(0.1 * rng.standard_normal(shape), jnp.bfloat16)

    x = mk((rows, t, channels))
    h = mk((rows, t, hidden))
    key = jax.random.PRNGKey(0)
    out = []

    # full DConv (reshape path as used in the model)
    x4 = mk((batch, f, t, channels))
    m = DConv(channels, time_attn=True, lstm=True, norm=True,
              act_func="gelu", reshape=True)
    v = jax.jit(lambda k, y: m.init(k, y, train=False))(key, x4)
    out.append(("DConv full (depth=2)", timed(jax.jit(
        lambda y, vv: m.apply(vv, y, train=False)), x4, v)))

    # conv1 k=3 dilated
    c1 = Conv1d(hidden, 3, padding=1, dilation=1)
    v1 = c1.init(key, x)
    out.append((f"conv1 k=3 {channels}->{hidden}", timed(jax.jit(
        lambda y, vv: c1.apply(vv, y)), x, v1)))

    gn = GroupNorm(1)
    vg = gn.init(key, h)
    out.append((f"groupnorm C={hidden}", timed(jax.jit(
        lambda y, vv: gn.apply(vv, y)), h, vg)))

    bl = BLSTM(hidden, layers=2, max_steps=200, skip=True)
    vb = jax.jit(lambda k, y: bl.init(k, y, train=False))(key, h)
    out.append((f"BLSTM H={hidden} (scan)", timed(jax.jit(
        lambda y, vv: bl.apply(vv, y, train=False)), h, vb)))

    ls = LocalState(hidden, heads=4, ndecay=4)
    vl = jax.jit(lambda k, y: ls.init(k, y))(key, h)
    out.append((f"LocalState H={hidden}", timed(jax.jit(
        lambda y, vv: ls.apply(vv, y)), h, vl)))

    c2 = Conv1d(2 * channels, 1)
    v2 = c2.init(key, h)
    out.append((f"conv2 1x1 {hidden}->{2 * channels}", timed(jax.jit(
        lambda y, vv: c2.apply(vv, y)), h, v2)))

    print(f"\nenc{layer} DConv decomposition (batch={batch}, rows={rows}, "
          f"T={t}, C={channels}, H={hidden}, bf16):")
    for name, ms in out:
        print(f"  {name:36s} {ms:8.2f} ms")
    body = sum(ms for n, ms in out[1:])
    print(f"  {'sum of pieces x2 (depth=2)':36s} {2 * body:8.2f} ms")


if __name__ == "__main__":
    main()
