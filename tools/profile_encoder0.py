"""Sub-component profile of encoder layer 0 (the FTB-dominated layer).

Times each stage of HEncLayer-0 standalone with latency-compensated
in-jit repetition. Informs kernel-fusion priorities (STATUS.md).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import statistics  # noqa: E402
import time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.models.modules import (  # noqa: E402
    Conv2d, DConv, FTB, set_compute_dtype,
)


def timed(apply_fn, variables, xin, reps=8, trials=3):
    def looped(y, v):
        def body(i, acc):
            out = apply_fn(v, y * (1.0 + 1e-9 * acc))
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)

    f = jax.jit(looped)
    _ = float(f(xin, variables))
    ts = []
    for _i in range(trials):
        t0 = time.perf_counter()
        _ = float(f(xin, variables))
        ts.append(time.perf_counter() - t0)

    g = jax.jit(lambda y: jax.lax.fori_loop(
        0, reps, lambda i, a: a + jnp.sum(y.astype(jnp.float32)) * 1e-9, 0.0))
    _ = float(g(xin))
    t0 = time.perf_counter()
    _ = float(g(xin))
    ov = time.perf_counter() - t0
    return max(0.0, (statistics.median(ts) - ov) / reps) * 1000


def main():
    set_compute_dtype(jnp.bfloat16)
    b, f, t, c = 8, 256, 2501, 48
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(0.1 * rng.standard_normal((b, f, t, c)), jnp.float32)
    x2 = jnp.asarray(0.1 * rng.standard_normal((b, 1, t, 2)), jnp.float32)
    x3 = jnp.asarray(0.1 * rng.standard_normal((b, 64, t, c)), jnp.float32)

    rows = []

    pre = Conv2d(c, (1, 1))
    xin2 = jnp.asarray(0.1 * rng.standard_normal((b, f, t, 2)), jnp.float32)
    v = jax.jit(lambda k, y: pre.init(k, y))(key, xin2)
    rows.append(("pre_conv 1x1 (2->48) @F256",
                 timed(lambda vv, y: pre.apply(vv, y), v, xin2)))

    ftb = FTB(input_dim=f, in_channel=c)
    v = jax.jit(lambda k, y: ftb.init(k, y, train=False))(key, x)
    rows.append(("FTB @F256",
                 timed(lambda vv, y: ftb.apply(vv, y, train=False), v, x)))

    conv = Conv2d(c, (8, 1), (4, 1), (2, 0))
    v = jax.jit(lambda k, y: conv.init(k, y))(key, x)
    rows.append(("main conv k8s4 overF (48ch) @F256",
                 timed(lambda vv, y: conv.apply(vv, y), v, x)))

    dconv = DConv(c, depth=2, compress=4, init_value=1e-3, act_func="snake",
                  freq_dim=64, reshape=True)
    v = jax.jit(lambda k, y: dconv.init(k, y, train=False))(key, x3)
    rows.append(("DConv (2 layers, snake) @F64",
                 timed(lambda vv, y: dconv.apply(vv, y, train=False), v, x3)))

    rw = Conv2d(2 * c, (1, 1))
    v = jax.jit(lambda k, y: rw.init(k, y))(key, x3)
    rows.append(("rewrite 1x1 (48->96) @F64",
                 timed(lambda vv, y: rw.apply(vv, y), v, x3)))

    print("\nencoder_0 sub-components (B=8, 10 s, bf16):")
    for name, ms in rows:
        print(f"  {name:38s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
