"""A/B the disc strided-conv input-gradient lowering: XLA autodiff
(lhs_dilation conv) vs the polyphase custom-VJP (AERO_CONVGRAD=poly).

The full-step A/B is inconclusive: the effect (~10 ms) is inside the
tunnel's +-10% session noise (PERF.md "Measurement rules"). This tool
isolates the melgan-MSD backward (grad wrt input waveform + params,
the exact thing the lowering changes) and times it latency-compensated:
N reps inside one jit via lax.fori_loop with a data dependency, minus a
same-structure trivial loop. The env gate is read at trace time, so one
process traces both variants back-to-back on identical inputs.

Usage: python tools/convgrad_ab.py [reps=20]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax
import jax.numpy as jnp
import numpy as np

from aero_tpu.models.discriminators import MelganDiscriminator
from aero_tpu.models.modules import set_compute_dtype


def timed(fn, *args, n=7):
    fn(*args)[0].block_until_ready()
    outs = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        float(r[0])  # force a scalar fetch
        outs.append(time.perf_counter() - t0)
    return statistics.median(outs)


def main():
    reps = int(sys.argv[1].split("=")[-1]) if len(sys.argv) > 1 else 20
    set_compute_dtype(jnp.bfloat16)
    B = int(os.environ.get("AERO_AB_B", "16"))
    T = int(os.environ.get("AERO_AB_T", "32000"))
    disc = MelganDiscriminator(num_D=3, ndf=16, n_layers=4,
                              downsampling_factor=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, 1), jnp.float32)
    params = disc.init(rng, x)

    def loss(p, xx):
        outs = disc.apply(p, xx)
        tot = 0.0
        for scale in outs:
            tot = tot + jnp.mean(scale[-1].astype(jnp.float32) ** 2)
            for f in scale[:-1]:
                tot = tot + jnp.mean(jnp.abs(f.astype(jnp.float32)))
        return tot

    def make(mode):
        os.environ["AERO_CONVGRAD"] = mode

        @jax.jit
        def run(p, xx):
            def body(i, carry):
                s, xc = carry
                l, (gx,) = jax.value_and_grad(loss, argnums=(1,))(p, xc)
                # data dependency: next iter's input depends on this grad
                return s + l, xc + 1e-12 * gx.astype(xc.dtype)

            s, xf = jax.lax.fori_loop(0, reps, body, (0.0, xx))
            return s, xf

        @jax.jit
        def trivial(p, xx):
            def body(i, carry):
                s, xc = carry
                return s + jnp.mean(xc), xc * (1.0 + 1e-12)

            s, xf = jax.lax.fori_loop(0, reps, body, (0.0, xx))
            return s, xf

        return run, trivial

    results = {}
    for mode in ("xla", "poly", "polyconv",
                 "xla", "poly", "polyconv"):  # interleave vs drift
        run, trivial = make(mode)
        t_run = timed(run, params, x)
        t_triv = timed(trivial, params, x)
        per = (t_run - t_triv) / reps * 1e3
        results.setdefault(mode, []).append(per)
        print(f"{mode:5s}: {per:8.3f} ms/disc-bwd  "
              f"(loop {t_run*1e3:.1f} ms, trivial {t_triv*1e3:.1f} ms)")
    for mode, vals in results.items():
        print(f"{mode:5s} median: {statistics.median(vals):.3f} ms")


if __name__ == "__main__":
    main()
