"""Decompose decoder-layer cost: rewrite (ConcatConv 3x3+GLU), DConv,
conv_tr (transposed freq conv), norm/gelu — cumulative stages.

Usage: python tools/profile_dec.py [batch=16] [sec=10] [layer=0]
layer=0 -> F=4, C=2x384->192 ... layer=3 -> F=64, C=2x48->2
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.models import modules as M  # noqa: E402

sys.path.insert(0, "tools")
from profile_layers import timed  # noqa: E402

# (chin per-input, chout, stride, F_in) after reversed plan
CFG = {0: (384, 192, 2, 4), 1: (192, 96, 2, 8),
       2: (96, 48, 4, 16), 3: (48, 2, 4, 64)}


class DecPrefix(M.nn.Module):
    chin: int
    chout: int
    stride: int
    stage: int
    last: bool = False

    @M.nn.compact
    def __call__(self, x, skip, train: bool = False):
        # x/skip each carry ``chin`` channels; the cat is 2*chin and the
        # rewrite outputs 4*chin (GLU halves back to 2*chin), matching
        # HDecLayer(chin=2*enc_chout).
        y = M.ConcatConv2d(4 * self.chin, (3, 3), (1, 1),
                           name="rewrite")(x, skip)
        y = M.glu(y, axis=-1)
        if self.stage <= 0:
            return y
        z = M.ConvTranspose2dFreq(self.chout, 8, self.stride,
                                  name="conv_tr")(y)
        if self.stage <= 1:
            return z
        if not self.last:  # last layer has norm=False (norm_starts=2)
            z = M.GroupNorm(4, name="norm2")(z)
        pad = (8 - self.stride) // 2
        z = z[:, pad:-pad, :, :]
        if not self.last:
            z = M.gelu(z)
        return z


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.get("batch", 16))
    sec = float(kv.get("sec", 10))
    layer = int(kv.get("layer", 0))

    M.set_compute_dtype(jnp.bfloat16)
    chin, chout, stride, f = CFG[layer]
    t = int(sec * 4000) // 16 + 1
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(0.1 * rng.standard_normal((batch, f, t, chin)),
                    jnp.bfloat16)
    skip = jnp.asarray(0.1 * rng.standard_normal((batch, f, t, chin)),
                       jnp.bfloat16)

    names = ["rewrite+glu", "+conv_tr", "+norm/gelu/unpad"]
    print(f"dec{layer} cumulative (batch={batch}, F={f}, C=2x{chin}->"
          f"{chout}, T={t}, bf16):")
    for stage in range(3):
        m = DecPrefix(chin, chout, stride, stage, last=layer == 3)
        v = jax.jit(lambda k, a, b, mm=m: mm.init(k, a, b))(key, x, skip)
        ms = timed(jax.jit(
            lambda a, vv, b, mm=m: mm.apply(vv, a, b)), x, v, skip)
        print(f"  stage {stage} {names[stage]:18s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
