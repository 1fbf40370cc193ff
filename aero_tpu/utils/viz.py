"""Spectrogram heatmap PNGs (reference src/utils.py:133-156, cv2 INFERNO;
here matplotlib's inferno LUT + PIL, no OpenCV needed)."""

from __future__ import annotations

import numpy as np


def scale_minmax(x, lo=0.0, hi=1.0):
    x = np.array(x, dtype=np.float32, copy=True)
    x[x == np.inf] = 1e9
    x[x == -np.inf] = 1e-9
    x[np.isnan(x)] = 1e-9
    rng = x.max() - x.min()
    std = (x - x.min()) / (rng if rng else 1.0)
    return std * (hi - lo) + lo


_LUT = None


def _inferno_lut():
    global _LUT
    if _LUT is None:
        from matplotlib import colormaps

        _LUT = (np.asarray(colormaps["inferno"](np.linspace(0, 1, 256)))
                [:, :3] * 255).astype(np.uint8)
    return _LUT


def convert_spectrogram_to_heatmap(spectrogram: np.ndarray) -> np.ndarray:
    """log-power spectrogram [F, T] -> RGB uint8 heatmap (freq axis flipped,
    matching reference utils.py:148-156)."""
    spec = np.asarray(spectrogram, dtype=np.float32) + 1e-9
    spec = scale_minmax(spec, 0, 255).astype(np.uint8).squeeze()
    spec = np.flip(spec, axis=0)
    spec = 255 - spec
    lut = _inferno_lut()
    return lut[spec]


def save_heatmap_png(spectrogram: np.ndarray, path: str) -> None:
    from PIL import Image

    # compress_level=1: ~2% larger files, several times faster encode —
    # these are per-eval-file artifacts on the training hot path
    Image.fromarray(convert_spectrogram_to_heatmap(spectrogram)).save(
        path, compress_level=1)


def power_spectrogram_np(x: np.ndarray, n_fft: int = 400,
                         hop: int | None = None) -> np.ndarray:
    """|STFT|^2 [F, T] of a waveform — numpy equivalent of torchaudio's
    default ``Spectrogram()`` (hann 400, hop 200, centered reflect,
    power 2), used by the reference wandb logger
    (src/wandb_logger.py:56-57). Logging path only — not jitted."""
    from aero_tpu.utils.hoststft import stft_frames_np

    x = np.asarray(x, np.float64).reshape(1, -1)
    spec = stft_frames_np(x, n_fft, hop or n_fft // 2)[0]
    return (np.abs(spec) ** 2).T
