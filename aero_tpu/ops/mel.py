"""Mel spectrogram (torchaudio.transforms.MelSpectrogram parity).

Used by the 'hifi' adversarial path for the L1 mel loss
(/root/reference/src/solver.py:89-93,537-540). torchaudio defaults:
power=2.0, htk mel scale, no filterbank norm, center=True reflect pad,
Hann window.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from aero_tpu.ops.spec import stft


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=16)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """HTK-scale triangular filterbank [n_freqs, n_mels] (torchaudio melscale_fbanks)."""
    f_max = f_max or sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_spectrogram(x, sample_rate: int, n_fft: int = 400,
                    win_length: int | None = None, hop_length: int | None = None,
                    n_mels: int = 128, f_min: float = 0.0,
                    f_max: float | None = None, power: float = 2.0):
    """x: [..., T] -> [..., n_mels, frames]."""
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 2
    z = stft(x, n_fft, hop_length, win_length, normalized=False,
             center=True, pad_mode="reflect")
    if power == 2.0:
        # |z|^2 directly: abs() computes a sqrt the square would undo
        # (hifi-loss hot path — runs twice per train step); matches
        # losses/stft_loss.py's re^2+im^2 form
        spec = jnp.real(z) ** 2 + jnp.imag(z) ** 2
    else:
        spec = jnp.abs(z) ** power  # [..., freqs, frames]
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max))
    return jnp.einsum("...ft,fm->...mt", spec, fb)
