"""Inference + artifact saving (reference /root/reference/src/enhance.py).

- ``write``: clip-safe wav write (:18-21)
- ``save_wavs``: _lr/_hr/_pr.wav triple (:24-29)
- ``save_specs``: log-power heatmap PNGs (:31-49)
- ``enhance``: sweep a loader, save estimates (:52-77)
"""

from __future__ import annotations

import logging
import os

import numpy as np

from aero_tpu.data import audio_io
from aero_tpu.utils.log import LogProgress
from aero_tpu.utils.viz import save_heatmap_png

logger = logging.getLogger(__name__)


def write(wav: np.ndarray, filename: str, sr: int) -> None:
    wav = np.asarray(wav)
    wav = wav / max(float(np.abs(wav).max()), 1.0)
    audio_io.save(filename, wav, sr)


def save_wavs(processed_sigs, lr_sigs, hr_sigs, filenames, lr_sr, hr_sr):
    for lr, hr, pr, filename in zip(lr_sigs, hr_sigs, processed_sigs, filenames):
        write(lr, filename + "_lr.wav", sr=lr_sr)
        write(hr, filename + "_hr.wav", sr=hr_sr)
        write(pr, filename + "_pr.wav", sr=hr_sr)


def _log_power(spec: np.ndarray) -> np.ndarray:
    return np.log2(np.maximum(np.abs(spec) ** 2, 1e-12))


def save_specs(lr_spec, pr_spec, hr_spec, filename):
    """Save per-file _lr/_pr/_hr_spec.png heatmaps; lr/hr are skipped if
    they already exist (reference :31-49). Specs: [C, F, T] complex."""
    lr_path = filename + "_lr_spec.png"
    if lr_spec is not None and not os.path.isfile(lr_path):
        save_heatmap_png(_log_power(np.asarray(lr_spec))[0], lr_path)
    hr_path = filename + "_hr_spec.png"
    if hr_spec is not None and not os.path.isfile(hr_path):
        save_heatmap_png(_log_power(np.asarray(hr_spec))[0], hr_path)
    save_heatmap_png(_log_power(np.asarray(pr_spec))[0], filename + "_pr_spec.png")


def enhance(dataloader, forward_fn, args):
    """Sweep the loader, save _lr/_hr/_pr triples. ``forward_fn(lr)``
    maps a [B, 1, T] numpy batch to [B, 1, T*scale]."""
    os.makedirs(args.samples_dir, exist_ok=True)
    exp = args.experiment
    lr_sr = exp.hr_sr if exp.get("upsample") else exp.lr_sr
    hr_sr = exp.hr_sr

    total_filenames = []
    iterator = LogProgress(logger, dataloader, name="Generate enhanced files")
    limit = int(args.get("enhance_samples_limit", -1))
    for i, data in enumerate(iterator):
        (lr_sigs, lr_paths), (hr_sigs, _hr_paths) = data
        names = [os.path.basename(p).rsplit(".", 1)[0] for p in lr_paths]
        filenames = [os.path.join(args.samples_dir, n) for n in names]
        total_filenames += names
        estimates = np.asarray(forward_fn(lr_sigs))
        save_wavs(estimates, lr_sigs, hr_sigs, filenames, lr_sr, hr_sr)
        if i == limit:
            break
    return total_filenames
