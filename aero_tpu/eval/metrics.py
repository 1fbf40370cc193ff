"""Quality metrics: LSD and ViSQOL.

Parity: /root/reference/src/metrics.py —
- LSD (:37-70): log-spectral distance on STFT(2048, hop 512, Hann)
  log10-power magnitudes, RMS over frequency then mean.
- ViSQOL (:74-138): external C++ CLI via subprocess, 16-bit wavs
  resampled to 16 kHz (speech) / 48 kHz (audio); stdout float parsed;
  0 on any failure (excluded from averages upstream).
"""

from __future__ import annotations

import errno
import logging
import os
import subprocess

import numpy as np

from aero_tpu.data import audio_io
from aero_tpu.ops.resample import resample_np
from aero_tpu.utils.hoststft import stft_frames_np

logger = logging.getLogger(__name__)

VISQOL_MIN_DURATION = 0.48

# Scorer version stamp of the most recent successful ViSQOL run in this
# process. MOS numbers are only comparable within one stamp (the round-1
# "aero-native v1" calibration is NOT comparable with v2); the solver
# records this next to every history.json entry that carries a visqol
# value. "external" = a scorer that prints no VISQOL-COMPAT line (e.g.
# the official google/visqol binary dropped in via ``visqol_path``).
_scorer_version: str | None = None


def visqol_scorer_version(visqol_path: str | None = None) -> str | None:
    """Version stamp parsed from the scorer's last successful run; if no
    run happened yet in this process and ``visqol_path`` is given, ask
    the scorer CLI directly (``--version``) and cache the answer — so
    logs/history carry a stamp even when zero files got scored."""
    global _scorer_version
    if _scorer_version is None and visqol_path:
        _scorer_version = probe_scorer_version(visqol_path)
    return _scorer_version


def probe_scorer_version(visqol_path: str) -> str:
    """Ask the scorer CLI for its version stamp without scoring anything.

    First-party scorers answer ``--version`` with a ``VISQOL-COMPAT:``
    line; a scorer that RUNS but prints no such line (e.g. the official
    google/visqol binary dropped in via ``visqol_path``) is ``external``;
    a probe that cannot run at all (binary missing, crash, timeout) is
    ``unknown`` — so a broken first-party build is never stamped into
    history.json as if it were a genuine official-binary run."""
    try:
        # argv-list + cwd (not an interpolated shell string) so paths
        # with spaces/metachars can't silently misclassify the scorer.
        proc = subprocess.run(
            [os.path.join(visqol_path, "bazel-bin", "visqol"), "--version"],
            cwd=visqol_path,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=30)
        return _parse_scorer_version(proc.stdout.decode("utf-8"))
    except Exception:  # noqa: BLE001 - probing must never break eval
        return "unknown"


def _parse_scorer_version(stdout: str) -> str:
    for line in stdout.splitlines():
        if line.startswith("VISQOL-COMPAT:"):
            return line.split(":", 1)[1].strip()
    return "external"


def stft_mag_np(x: np.ndarray, nfft: int = 2048, hop: int = 512) -> np.ndarray:
    """|STFT| with Hann(nfft), center-reflect, not normalized — matches
    the reference STFTMag buffer setup (metrics.py:37-56).

    Pure numpy on purpose: both signals are already host-side here, and
    the previous eager-jax formulation dispatched every DFT op through
    the device transport (measured multiple seconds per eval file on a
    tunneled chip) or, jitted, recompiled per distinct file length. The
    rfft of an eval file is microseconds of host work."""
    z = stft_frames_np(np.atleast_2d(np.asarray(x, np.float32)), nfft, hop)
    return np.abs(z).swapaxes(-1, -2)                 # [B, F, frames]


def get_lsd(ref_sig: np.ndarray, out_sig: np.ndarray) -> float:
    """ref/out: [B, T]. Reference metrics.py:59-70."""
    sp = np.log10(np.maximum(stft_mag_np(ref_sig) ** 2, 1e-8))
    st = np.log10(np.maximum(stft_mag_np(out_sig) ** 2, 1e-8))
    return float(np.mean(np.sqrt(np.mean((sp - st) ** 2, axis=1))))


def get_visqol(ref_sig: np.ndarray, out_sig: np.ndarray, filename: str,
               sr: int, speech_mode: bool, visqol_path: str) -> float:
    """Reference CLI contract (metrics.py:74-138): writes 16-bit wavs,
    runs ``./bazel-bin/visqol`` from ``visqol_path``, parses the trailing
    float from stdout. Returns 0 on any failure."""
    tmp_reference = os.path.abspath(f"{filename}_ref.wav")
    tmp_estimation = os.path.abspath(f"{filename}_est.wav")

    if speech_mode:
        target_sr = 16000
    else:
        target_sr = 48000

    try:
        ref = np.atleast_2d(ref_sig)
        out = np.atleast_2d(out_sig)
        if sr != target_sr:
            ref = resample_np(ref, sr, target_sr)
            out = resample_np(out, sr, target_sr)
        audio_io.save(tmp_reference, ref, target_sr, bits_per_sample=16)
        audio_io.save(tmp_estimation, out, target_sr, bits_per_sample=16)

        if not os.path.isfile(tmp_reference):
            raise FileNotFoundError(errno.ENOENT, os.strerror(errno.ENOENT),
                                    tmp_reference)
        if ref.shape[-1] / target_sr < VISQOL_MIN_DURATION or \
                out.shape[-1] / target_sr < VISQOL_MIN_DURATION:
            raise ValueError("File duration is too small.")

        # argv-list + cwd, NOT an interpolated shell string: the reference
        # (metrics.py:108-121) uses `cd {path}; ./bazel-bin/visqol ...`
        # shell=True, where a path or eval filename containing spaces or
        # shell metachars makes scoring silently return 0.0. Keep the CLI
        # semantics (run from visqol_path, same flags), not the bug.
        argv = [os.path.join(visqol_path, "bazel-bin", "visqol"),
                "--reference_file", tmp_reference,
                "--degraded_file", tmp_estimation]
        if speech_mode:
            argv.append("--use_speech_mode")
        proc = subprocess.run(argv, cwd=visqol_path, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
        stdout = proc.stdout.decode("utf-8")
        value = stdout.split("\t")[-1].replace("\n", "")
        visqol = float(value)
        global _scorer_version
        _scorer_version = _parse_scorer_version(stdout)
    except Exception as e:  # noqa: BLE001 - reference swallows everything
        logger.info(f"failed to get visqol of {filename}: {e}")
        return 0.0
    else:
        return visqol
    finally:
        # the reference leaks the temp wavs on failure (metrics.py:123-131);
        # SURVEY §2.5 says don't replicate defects
        for tmp in (tmp_reference, tmp_estimation):
            if os.path.exists(tmp):
                os.remove(tmp)


def run_metrics(clean: np.ndarray, estimate: np.ndarray, args, filename: str):
    """clean/estimate: [B, 1, T] (or [1, T]). Returns (lsd, visqol)."""
    hr_sr = args.experiment.hr_sr if "experiment" in args else args.hr_sr
    exp = args.get("experiment", args)
    speech_mode = bool(exp.get("speech_mode", True))
    clean = np.asarray(clean)
    estimate = np.asarray(estimate)
    if clean.ndim == 3:
        clean = clean[:, 0, :]
    if estimate.ndim == 3:
        estimate = estimate[:, 0, :]

    lsd = get_lsd(clean, estimate)
    visqol_path = args.get("visqol_path") or default_visqol_path()
    calc_visqol = bool(args.get("visqol")) and visqol_path
    visqol = get_visqol(clean, estimate, filename, int(hr_sr), speech_mode,
                        str(visqol_path)) if calc_visqol else 0.0
    return lsd, visqol


def default_visqol_path() -> str | None:
    """Our first-party ViSQOL-contract scorer (native/bazel-bin/visqol),
    if built."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    native = os.path.join(root, "native")
    if os.path.exists(os.path.join(native, "bazel-bin", "visqol")):
        return native
    return None
