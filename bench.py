"""Benchmark: realtime factor of the flagship AERO 4->16 kHz model.

The reference's latency measurement point is ``predict.py``'s
``prediction duration`` over 10 s chunks (/root/reference/predict.py:22,74-83);
the north-star metric is audio-seconds generated per wall-second per chip
(BASELINE.md: >10x realtime on one TPU v5e chip).

Prints ONE JSON line:
  {"metric": "realtime_factor", "value": N, "unit": "audio_sec_per_sec",
   "vs_baseline": N / 10.0}
"""

from __future__ import annotations

from aero_tpu.utils.platform import select_platform_from_env

select_platform_from_env()

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from aero_tpu.train import build
from aero_tpu.utils.config import load_config

CHUNK_SEC = 10.0  # predict.py SEGMENT_DURATION_SEC
WARMUP = 3
ITERS = 20
BASELINE_RTF = 10.0  # throughput gate from BASELINE.json


def main():
    overrides = [a for a in sys.argv[1:] if "=" in a]
    args = load_config("conf", "main_config",
                       ["experiment=aero_4-16_512_64", "dset=4-16"] + overrides)

    models = build.build_models(args)
    gen = models["generator"]

    lr_sr = int(args.experiment.lr_sr)
    chunk = int(lr_sr * CHUNK_SEC)
    x = jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal((1, 1, chunk)),
        dtype=jnp.float32)

    variables = jax.jit(lambda k, y: gen.init(k, y, train=False))(
        jax.random.PRNGKey(0), x[:, :, :lr_sr])

    @jax.jit
    def forward(variables, lr):
        return gen.apply(variables, lr, train=False)

    # compile + warmup
    out = forward(variables, x)
    out.block_until_ready()
    for _ in range(WARMUP):
        forward(variables, x).block_until_ready()

    # Distinct inputs + forced scalar fetch per call: the only timing the
    # remote tunnel cannot fake (block_until_ready through the relay has
    # been observed returning before execution). Includes tunnel latency,
    # so this UNDERSTATES on-chip throughput.
    xs = [x * (1.0 + 0.01 * i) for i in range(ITERS)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(ITERS):
        acc += float(jnp.sum(forward(variables, xs[i])))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(acc)

    rtf = CHUNK_SEC / dt
    print(json.dumps({
        "metric": "realtime_factor",
        "value": round(rtf, 2),
        "unit": "audio_sec_per_sec",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }))


if __name__ == "__main__":
    main()
