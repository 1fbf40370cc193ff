"""Single-file inference CLI (reference /root/reference/predict.py).

Usage:
    python predict.py dset=<d> experiment=<e> +filename=<in.wav> +output=<dir>

Splits the input into 10 s chunks (predict.py:22), forwards each through
the jitted generator, concatenates, times the prediction (the realtime-
factor measurement point, predict.py:74-83), saves ``<stem>_pr.wav``.
"""

from __future__ import annotations

import time

_T0 = time.time()  # before the heavy imports: jax/backends dominate

from aero_tpu.utils.platform import select_platform_from_env

select_platform_from_env()

import logging
import os
import sys

import jax

from aero_tpu.data import audio_io
from aero_tpu.eval.enhance import write
from aero_tpu.eval.forward import ChunkedInference, EvalForward
from aero_tpu.ops.resample import resample_np
from aero_tpu.parallel import mesh as pmesh
from aero_tpu.train import build
from aero_tpu.utils.config import load_config, run_dir_for
from aero_tpu.utils.log import setup_logging

logger = logging.getLogger(__name__)

CONF_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "conf")
SEGMENT_DURATION_SEC = 10


def _stage(label, t_prev):
    """Cold-start attribution (PERF.md 'Cold-start predict'): log how
    long each serving stage takes so cold-vs-warm gaps are diagnosable
    from any run's log."""
    now = time.time()
    logger.info(f"stage {label}: {now - t_prev:.2f}s (t+{now - _T0:.2f}s)")
    return now


def main():
    t_imports = time.time()
    args = load_config(CONF_DIR, "main_config", sys.argv[1:])
    filename = os.path.abspath(str(args.filename))
    output_dir = os.path.abspath(str(args.output))
    setup_logging(bool(args.verbose))
    logger.info(f"stage imports+backend-init: {t_imports - _T0:.2f}s")
    t = _stage("config", t_imports)

    run_dir = run_dir_for(args)
    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)

    models = build.build_models(args)
    state = build.load_generator_state(args, models)
    t = _stage("build+checkpoint-load", t)

    exp = args.experiment
    lr_sig, sr = audio_io.load(filename)
    if exp.get("upsample", False):
        lr_sig = resample_np(lr_sig, sr, int(exp.hr_sr))
        sr = int(exp.hr_sr)
    logger.info(f"lr wav shape: {lr_sig.shape}")

    scale = (float(exp.hr_sr) / float(exp.lr_sr)
             if not exp.get("upsample", False) else 1.0)
    # multi-chip serving: with N local devices the 10 s chunks of one
    # file run data-parallel over the mesh (chunk batch sharded on dp,
    # params replicated); single chip degenerates to the plain path
    mesh = pmesh.make_mesh(jax.local_devices()) \
        if jax.local_device_count() > 1 else None
    # AOT-serialized serving executables (+aot=0 disables): warm process
    # starts deserialize the compiled executable instead of re-tracing
    # and hitting the XLA compile cache — see eval/aot.py and PERF.md
    # 'Cold-start predict'. Keyed by config + precision + input shape.
    aot_dir = None
    if bool(args.get("aot", True)) and mesh is None:
        from aero_tpu.eval.aot import default_aot_dir

        aot_dir = default_aot_dir()
    aot_tag = (f"{exp.name}|{args.get('precision', 'float32')}|"
               f"bucket={args.get('eval_bucket_s', 1.0)}")
    fwd = EvalForward(models["generator"], state, scale=scale, lr_sr=sr,
                      bucket_s=float(args.get("eval_bucket_s", 1.0)),
                      mesh=mesh, aot_dir=aot_dir, aot_tag=aot_tag)
    # all full 10 s chunks run as one (optionally mesh-sharded) batch
    # +pad_tail_to_chunk=1: single-executable serving mode — the ragged
    # tail is reflect-padded to a full chunk so only ONE jit shape ever
    # compiles (halves cold warmup; tail samples differ slightly from
    # the reference's exact-tail forward — see ChunkedInference)
    chunked = ChunkedInference(lambda x: fwd(x), sr,
                               segment_s=SEGMENT_DURATION_SEC,
                               batch_chunks=bool(args.get("batch_chunks",
                                                          True)),
                               mesh=mesh,
                               pad_tail=bool(args.get("pad_tail_to_chunk",
                                                      False)),
                               scale=scale)

    x = lr_sig[None]  # [1, C, T]
    # warmup/compile outside the timed region reflects steady-state
    # serving. Must run the FULL input once: the batched multi-chunk
    # forward and the ragged-tail bucket are separate jit shapes — a
    # single-chunk warmup would leave their compiles inside the timing.
    t = _stage("model-setup", t)
    if bool(args.get("predict_warmup", True)):
        _ = chunked(x)
    t = _stage("warmup (compile or cache hit + param upload)", t)

    pred_start = time.time()
    pr = chunked(x)[0]
    pred_duration = time.time() - pred_start
    logger.info(f"prediction duration: {pred_duration}")
    audio_sec = lr_sig.shape[-1] / sr
    logger.info(f"realtime factor: {audio_sec / pred_duration:.2f}x")

    logger.info(f"pr wav shape: {pr.shape}")
    file_basename = os.path.splitext(os.path.basename(filename))[0]
    out_filename = os.path.join(output_dir, file_basename + "_pr.wav")
    os.makedirs(output_dir, exist_ok=True)
    logger.info(f"saving to: {out_filename}, with sample_rate: {exp.hr_sr}")
    write(pr, out_filename, int(exp.hr_sr))
    _stage("fetch+write", pred_start + pred_duration)
    logger.info(f"end-to-end: {time.time() - _T0:.2f}s "
                f"({audio_sec / (time.time() - _T0):.1f}x realtime incl. "
                f"startup)")


if __name__ == "__main__":
    main()
