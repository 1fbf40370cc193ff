"""Micro-bench the fused local-attention kernel variants at model shapes.

Usage: python tools/profile_attn.py [rows=128] [t=2501] [heads=4] [ch=12]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.ops import attention as A  # noqa: E402

sys.path.insert(0, "tools")
from profile_layers import timed  # noqa: E402


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    rows = int(kv.get("rows", 128))
    t = int(kv.get("t", 2501))
    heads = int(kv.get("heads", 4))
    ch = int(kv.get("ch", 12))

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(0.3 * rng.standard_normal(shape), jnp.bfloat16)

    q = mk((rows, t, heads, ch))
    k = mk((rows, t, heads, ch))
    v = mk((rows, t, heads, ch))
    w = jnp.abs(mk((rows, t, heads))) * 0.1

    print(f"shapes: rows={rows} t={t} heads={heads} ch={ch} (bf16)")
    for bq in (128, 256, 512):
        ms = timed(jax.jit(lambda q, k, v, w, bq=bq: A.pallas_attention(
            q, k, v, w, block_q=bq)), q, k, v, w)
        print(f"  pallas resident block_q={bq:4d}   {ms:8.2f} ms")


if __name__ == "__main__":
    main()
