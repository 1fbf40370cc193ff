"""Find the composition pathology in enc0: time cumulative prefixes.

Usage: python tools/profile_enc0_cum.py [batch=16] [sec=10]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.models.aero import HEncLayer  # noqa: E402
from aero_tpu.models import modules as M  # noqa: E402

sys.path.insert(0, "tools")
from profile_layers import timed  # noqa: E402


class Enc0Prefix(M.nn.Module):
    """HEncLayer-0 clone that stops after `stage`; optional barriers."""

    stage: int
    barrier: bool = False

    @M.nn.compact
    def __call__(self, x, train: bool = False):
        bar = (jax.lax.optimization_barrier if self.barrier
               else (lambda y: y))
        x = M.Conv2d(48, (1, 1), name="pre_conv")(x)
        x = bar(x)
        if self.stage <= 0:
            return x
        x = M.FTB(input_dim=256, in_channel=48, name="freq_attn_block")(
            x, train)
        x = bar(x)
        if self.stage <= 1:
            return x
        x = M.Conv2d(48, (8, 1), (4, 1), (2, 0), name="conv")(x)
        x = bar(x)
        if self.stage <= 2:
            return x
        x = M.GroupNorm(1, name="norm1")(x)
        x = M.gelu(x)
        if self.stage <= 3:
            return x
        x = M.DConv(48, reshape=True, name="dconv")(x, train)
        x = bar(x)
        if self.stage <= 4:
            return x
        x = M.Conv2d(96, (1, 1), (1, 1), (0, 0), name="rewrite")(x)
        x = M.GroupNorm(1, name="norm2")(x)
        x = M.glu(x, axis=-1)
        return x


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.get("batch", 16))
    sec = float(kv.get("sec", 10))

    M.set_compute_dtype(jnp.bfloat16)
    t = int(sec * 4000) // 16 + 1
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(0.1 * rng.standard_normal((batch, 256, t, 2)),
                    jnp.bfloat16)

    names = ["pre_conv", "+FTB", "+freq conv", "+norm/gelu", "+DConv",
             "+rewrite/glu"]
    prev = 0.0
    print(f"enc0 cumulative stages (batch={batch}, T={t}, bf16):")
    for stage, barrier in [(5, False), (5, True), (1, True), (2, True)]:
        m = Enc0Prefix(stage, barrier)
        v = jax.jit(lambda k, y, mm=m: mm.init(k, y, train=False))(key, x)
        ms = timed(jax.jit(
            lambda y, vv, mm=m: mm.apply(vv, y, train=False)), x, v)
        print(f"  stage {stage} barrier={barrier} {names[stage]:14s} "
              f"{ms:8.2f} ms")


if __name__ == "__main__":
    main()
