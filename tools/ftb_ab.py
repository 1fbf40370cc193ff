"""A/B the composed-XLA FTB tail vs the fused Pallas kernel on the chip.

Times the full FTB module (inference) at the encoder shapes of the
canonical model (enc0 F=256 C=48, enc1 F=64 C=96), toggling
AERO_FTB_KERNEL in-process. Methodology per PERF.md (scalar fetch per
call, median of reps).

Usage: python tools/ftb_ab.py [batch=16] [sec=10] [reps=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.models.modules import FTB, set_compute_dtype  # noqa: E402


def med_time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[..., 0]))  # force a real fetch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[..., 0]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.get("batch", 16))
    sec = float(kv.get("sec", 10))
    reps = int(kv.get("reps", 5))

    set_compute_dtype(jnp.bfloat16)
    t = int(sec * 4000) // 16 + 1
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    for f, c in ((256, 48), (64, 96)):
        x = jnp.asarray(0.1 * rng.standard_normal((batch, f, t, c)),
                        jnp.bfloat16)
        ftb = FTB(input_dim=f, in_channel=c)
        v = jax.jit(lambda k, y, m=ftb: m.init(k, y, train=False))(key, x)
        fn = jax.jit(lambda y, vv, m=ftb: m.apply(vv, y, train=False))

        os.environ["AERO_FTB_KERNEL"] = "0"
        composed = med_time(fn, x, v, reps=reps)
        os.environ["AERO_FTB_KERNEL"] = "1"
        try:
            fused = med_time(jax.jit(
                lambda y, vv, m=ftb: m.apply(vv, y, train=False)), x, v,
                reps=reps)
            msg = f"fused {fused*1e3:8.2f} ms"
        except Exception as e:  # Mosaic rejection etc.
            fused = None
            msg = f"fused FAILED: {type(e).__name__}: {str(e)[:200]}"
        print(f"FTB F={f:4d} C={c:4d}: composed {composed*1e3:8.2f} ms | "
              f"{msg}", flush=True)


if __name__ == "__main__":
    main()
