"""Measure the first-party ViSQOL scorer across a degradation x shift
matrix and print the JSON table recorded in native/VISQOL_DIVERGENCE.md.

Usage: python tools/visqol_divergence_matrix.py [out=/tmp/visqol_matrix.json]
Runs on CPU (the scorer is a native binary; signals are synthesized).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("AERO_PLATFORM", "cpu")

from aero_tpu.data import audio_io  # noqa: E402
from aero_tpu.data.prep import make_speech_like  # noqa: E402
from aero_tpu.ops.resample import resample_np  # noqa: E402

NATIVE = os.path.join(REPO, "native")


def run_visqol(ref, deg, sr=16000, speech=True):
    with tempfile.TemporaryDirectory() as td:
        rp, dp = os.path.join(td, "r.wav"), os.path.join(td, "d.wav")
        audio_io.save(rp, ref, sr, bits_per_sample=16)
        audio_io.save(dp, deg, sr, bits_per_sample=16)
        cmd = (f"cd {NATIVE}; ./bazel-bin/visqol --reference_file {rp} "
               f"--degraded_file {dp}")
        if speech:
            cmd += " --use_speech_mode"
        proc = subprocess.run(cmd, shell=True, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
        return float(proc.stdout.decode().split("\t")[-1].strip())


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    out = kv.get("out", "/tmp/visqol_matrix.json")
    sr = 16000
    rng = np.random.default_rng(7)
    sig = make_speech_like(sr, 3.0, seed=0)[None]

    def bandlimit(x, mid_sr):
        y = resample_np(x, sr, mid_sr)
        return resample_np(y, mid_sr, sr)[:, :x.shape[-1]]

    def noisy(x, snr_db):
        n = rng.standard_normal(x.shape).astype(np.float32)
        n *= np.sqrt((x ** 2).mean() / (n ** 2).mean() / 10 ** (snr_db / 10))
        return (x + n).astype(np.float32)

    def quantize(x, bits):
        q = 2.0 ** (bits - 1)
        return (np.round(np.clip(x, -1, 1) * q) / q).astype(np.float32)

    def shift(x, sec):
        if sec == 0:
            return x
        return np.concatenate(
            [np.zeros((1, int(sec * sr)), np.float32), x], axis=-1)

    degradations = {
        "identity": lambda x: x,
        "noise_snr20": lambda x: noisy(x, 20),
        "noise_snr10": lambda x: noisy(x, 10),
        "noise_snr0": lambda x: noisy(x, 0),
        "lowpass_8k": lambda x: bandlimit(x, 8000),
        "lowpass_4k": lambda x: bandlimit(x, 4000),
        "lowpass_2k": lambda x: bandlimit(x, 2000),
        "quant_6bit": lambda x: quantize(x, 6),
        "quant_4bit": lambda x: quantize(x, 4),
        "unrelated": lambda x: make_speech_like(sr, 3.0, seed=99)[None],
    }
    shifts = [0.0, 0.05, 0.13]

    matrix = {}
    for name, fn in degradations.items():
        row = {}
        deg = fn(sig)
        for sh in shifts:
            row[f"shift_{sh:g}s"] = round(run_visqol(sig, shift(deg, sh)), 3)
        matrix[name] = row
        print(f"{name:14s} " + "  ".join(
            f"{k}={v:.3f}" for k, v in row.items()), flush=True)

    with open(out, "w") as f:
        json.dump(matrix, f, indent=1)
    print(f"written: {out}")


if __name__ == "__main__":
    main()
