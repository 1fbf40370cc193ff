"""Benchmark: realtime factor of the flagship AERO 4->16 kHz model.

The reference's latency measurement point is ``predict.py``'s
``prediction duration`` over 10 s chunks (/root/reference/predict.py:22,74-83);
the north-star metric is audio-seconds generated per wall-second per chip
(BASELINE.md: >10x realtime on one TPU v5e chip).

Measurement notes (remote-tunneled chip): per-op ``block_until_ready``
through the axon relay has been observed returning before execution, and
per-call round-trip latency (~60-90 ms) dwarfs on-chip time. So we time
a BATCH of chunks per call and force a scalar fetch that depends on
every output (un-fakeable). By default the iterations are dispatched
asynchronously and fetched once (steady-state serving throughput,
amortizing the tunnel round trip); AERO_BENCH_PIPELINED=0 reverts to a
per-call fetch (single-call latency, tunnel included).

Prints ONE JSON line:
  {"metric": "realtime_factor", "value": N, "unit": "audio_sec_per_sec",
   "vs_baseline": N / 10.0}

Env overrides: AERO_BENCH_BATCH (default 16 — the recorded numbers are
batch-16 amortized throughput), AERO_BENCH_ITERS (default 5 inference /
8 train), plus any config override args (e.g. ``precision=float32``).
AERO_BENCH_TRAIN=1 benches the full fused GAN training step instead
(one JSON line, metric ``train_throughput`` in audio-seconds trained
per second).
"""

from __future__ import annotations

from aero_tpu.utils.platform import select_platform_from_env

select_platform_from_env()

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from aero_tpu.train import build
from aero_tpu.utils.config import load_config
from aero_tpu.utils.flops import count_flops, mfu, peak_flops_per_sec

CHUNK_SEC = 10.0  # predict.py SEGMENT_DURATION_SEC
BASELINE_RTF = 10.0  # throughput gate from BASELINE.json
# No reference train-throughput number exists (BASELINE.md records no
# GPU step time), so the train-mode gate is 1x realtime: training
# consumes audio at least as fast as it plays.
TRAIN_BASELINE = 1.0


def _watchdog(seconds: int = 900):
    """The remote TPU tunnel occasionally goes fully unresponsive; fail
    loudly instead of hanging the benchmark driver."""
    import signal

    def on_alarm(_sig, _frm):
        print(json.dumps({"metric": "realtime_factor", "value": 0,
                          "unit": "audio_sec_per_sec", "vs_baseline": 0,
                          "error": "device unresponsive (watchdog)"}))
        sys.stdout.flush()
        import os as _os
        _os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def bench_train(args):
    """Training throughput: full fused GAN step (gen fwd+bwd, 3 disc
    passes, both adam updates — train_step.py) at the canonical batch,
    reported as audio-seconds trained per wall-second. Methodology:
    chain the donated state through N steps so XLA cannot elide any,
    force one scalar fetch at the end (same tunnel-amortizing rationale
    as the inference path). Enable with AERO_BENCH_TRAIN=1."""
    from aero_tpu.parallel import mesh as pmesh
    from aero_tpu.train.train_step import init_state, make_train_step

    batch = int(os.environ.get("AERO_BENCH_BATCH", 16))
    iters = int(os.environ.get("AERO_BENCH_ITERS", 8))
    models = build.build_models(args)
    mesh = pmesh.make_mesh()
    lr_shape, hr_shape = build.segment_shapes(args)
    rng = jax.random.PRNGKey(0)
    init_rng, state_rng = jax.random.split(rng)
    variables = build.init_variables(args, models, init_rng, lr_shape,
                                     hr_shape)
    state = init_state(args, models, variables, state_rng)
    state = pmesh.replicate(state, mesh)
    step = make_train_step(args, models, mesh, donate=True)

    exp = args.experiment
    # segment_shapes handles non-integer rate ratios and upsample mode
    # (lr pre-resampled to hr length); only the batch dim is overridden
    gen = np.random.default_rng(0)
    lr = jnp.asarray(0.1 * gen.standard_normal((batch,) + lr_shape[1:]),
                     jnp.float32)
    hr = jnp.asarray(0.1 * gen.standard_normal((batch,) + hr_shape[1:]),
                     jnp.float32)

    state, metrics = step(state, lr, hr)
    jax.block_until_ready(metrics)
    reps = []
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, lr, hr)
        acc = float(jnp.sum(metrics["total"]))
        reps.append((time.perf_counter() - t0) / iters)
    assert np.isfinite(acc)
    dt = statistics.median(reps)

    # Analytic matmul/conv FLOPs of ONE full step (gen fwd+bwd, all disc
    # passes, both Adam updates) -> MFU vs the mesh's aggregate bf16
    # dense peak. count_flops sees the GLOBAL sharded program, so the
    # denominator must scale by the participating device count or a
    # multi-chip run would report ~n_dev x the true per-chip MFU.
    fc = count_flops(step, state, lr, hr)
    n_dev = int(mesh.devices.size)
    peak = peak_flops_per_sec()
    step_mfu = mfu(fc.total, dt, peak * n_dev if peak else None)

    aud = batch * float(exp.segment)
    print(json.dumps({
        "metric": "train_throughput",
        "value": round(aud / dt, 2),
        "unit": "audio_sec_trained_per_sec",
        "vs_baseline": round((aud / dt) / TRAIN_BASELINE, 3),
        "mode": "chained",
        "step_ms": round(dt * 1e3, 1),
        "batch": batch,
        "model_tflops": round(fc.total / 1e12, 4),
        "mfu": round(step_mfu, 4) if step_mfu is not None else None,
        "devices": n_dev,
        "peak_tflops": round(peak * n_dev / 1e12, 1) if peak else None,
        "peak_dtype": "bf16",
    }))


def main():
    _watchdog()
    overrides = [a for a in sys.argv[1:] if "=" in a]
    # bfloat16 is the production TPU serving precision (f32 islands keep
    # STFT/normalization exact; forward stays within ~1% of f32 — see
    # tests/test_precision.py). Override with precision=float32.
    conf_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "conf")  # cwd-independent, like the CLIs
    args = load_config(conf_dir, "main_config",
                       ["experiment=aero_4-16_512_64", "dset=4-16",
                        "precision=bfloat16"] + overrides)
    if os.environ.get("AERO_BENCH_TRAIN", "0") == "1":
        bench_train(args)
        return
    batch = int(os.environ.get("AERO_BENCH_BATCH", 16))
    iters = int(os.environ.get("AERO_BENCH_ITERS", 5))

    models = build.build_models(args)
    gen = models["generator"]

    lr_sr = int(args.experiment.lr_sr)
    chunk = int(lr_sr * CHUNK_SEC)
    x = jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal((batch, 1, chunk)),
        dtype=jnp.float32)

    variables = jax.jit(lambda k, y: gen.init(k, y, train=False))(
        jax.random.PRNGKey(0), x[:1, :, :lr_sr])

    @jax.jit
    def forward(variables, lr):
        return gen.apply(variables, lr, train=False)

    # compile + warmup (forced fetch)
    acc = float(jnp.sum(forward(variables, x)))

    # Steady-state throughput: dispatch all iterations asynchronously,
    # then force ONE scalar fetch that depends on every output. Each
    # call's compute is un-fakeable (the final scalar needs it), but the
    # ~30-90 ms tunnel round trip is paid once instead of per call —
    # this measures serving throughput, not single-call latency. Set
    # AERO_BENCH_PIPELINED=0 for the per-call-fetch latency variant.
    pipelined = os.environ.get("AERO_BENCH_PIPELINED", "1") == "1"
    xs = [x * (1.0 + 0.01 * (i + 1)) for i in range(iters)]
    for xi in xs:
        xi.block_until_ready()
    if pipelined:
        reps = []
        for _rep in range(3):
            t0 = time.perf_counter()
            outs = [forward(variables, xi) for xi in xs]
            tot = jnp.sum(jnp.stack([jnp.sum(o) for o in outs]))
            acc += float(tot)
            reps.append((time.perf_counter() - t0) / iters)
        dt = min(reps)
    else:
        times = []
        for xi in xs:
            t0 = time.perf_counter()
            acc += float(jnp.sum(forward(variables, xi)))
            times.append(time.perf_counter() - t0)
        dt = statistics.median(times)
    assert np.isfinite(acc)

    rtf = batch * CHUNK_SEC / dt

    # Analytic matmul/conv FLOPs of one forward call -> MFU vs the
    # chip's bf16 dense peak (aero_tpu/utils/flops.py; VERDICT r3 #1).
    # Traced in-process so the count reflects the exact dispatched path
    # (Pallas attention on TPU, blockwise scan on CPU).
    fc = count_flops(forward, variables, x)
    peak = peak_flops_per_sec()
    fwd_mfu = mfu(fc.total, dt, peak)

    # "mode" records the methodology so numbers are never silently
    # compared across estimators (pipelined = amortized async-dispatch
    # throughput; latency = per-call-fetch median).
    print(json.dumps({
        "metric": "realtime_factor",
        "value": round(rtf, 2),
        "unit": "audio_sec_per_sec",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
        "mode": "pipelined" if pipelined else "latency",
        "model_tflops": round(fc.total / 1e12, 4),
        "mfu": round(fwd_mfu, 4) if fwd_mfu is not None else None,
        "peak_tflops": round(peak / 1e12, 1) if peak else None,
        "peak_dtype": "bf16",
    }))


if __name__ == "__main__":
    main()
