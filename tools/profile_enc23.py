"""Decompose enc2/enc3 cost with cumulative stages + BLSTM kernel A/B.

Usage: python tools/profile_enc23.py [batch=16] [sec=10] [layer=2]
"""

from __future__ import annotations

import os
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

CFG = {2: (96, 192, 16, 2), 3: (192, 384, 8, 2)}  # cin, cout, F_in, stride


class EncPrefix(M.nn.Module):
    cin: int
    cout: int
    f_in: int
    stride: int
    stage: int

    @M.nn.compact
    def __call__(self, x, train: bool = False):
        x = M.FTB(input_dim=self.f_in, in_channel=self.cin,
                  name="freq_attn_block")(x, train)
        if self.stage <= 0:
            return x
        x = M.Conv2d(self.cout, (8, 1), (self.stride, 1), (3, 0),
                     name="conv")(x)
        x = M.GroupNorm(4, name="norm1")(x)
        x = M.gelu(x)
        if self.stage <= 1:
            return x
        x = M.DConv(self.cout, reshape=True, time_attn=False, lstm=True,
                    act_func="snake", freq_dim=self.f_in // self.stride,
                    name="dconv_lstm_only")(x, train)
        if self.stage <= 2:
            return x
        x = M.DConv(self.cout, reshape=True, time_attn=True, lstm=False,
                    act_func="snake", freq_dim=self.f_in // self.stride,
                    name="dconv_attn_only")(x, train)
        if self.stage <= 3:
            return x
        x = M.Conv2d(2 * self.cout, (1, 1), name="rewrite")(x)
        x = M.GroupNorm(4, name="norm2")(x)
        return M.glu(x, axis=-1)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.get("batch", 16))
    sec = float(kv.get("sec", 10))
    layer = int(kv.get("layer", 2))

    M.set_compute_dtype(jnp.bfloat16)
    cin, cout, f_in, stride = CFG[layer]
    t = int(sec * 4000) // 16 + 1
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(0.1 * rng.standard_normal((batch, f_in, t, cin)),
                    jnp.bfloat16)

    names = ["FTB", "+conv/norm/gelu", "+DConv[lstm x2]",
             "+DConv[attn x2]", "+rewrite/glu"]
    print(f"enc{layer} cumulative (batch={batch}, F={f_in}, "
          f"C={cin}->{cout}, T={t}, bf16, "
          f"LSTM_KERNEL={os.environ.get('AERO_LSTM_KERNEL', '1')}):")
    prev = 0.0
    for stage in range(5):
        m = EncPrefix(cin, cout, f_in, stride, stage)
        v = jax.jit(lambda k, y, mm=m: mm.init(k, y, train=False))(key, x)
        ms = timed(jax.jit(
            lambda y, vv, mm=m: mm.apply(vv, y, train=False)), x, v)
        print(f"  stage {stage} {names[stage]:18s} {ms:8.2f} ms "
              f"(delta {ms - prev:+7.2f})")
        prev = ms


if __name__ == "__main__":
    main()
