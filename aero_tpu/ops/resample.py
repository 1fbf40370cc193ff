"""Polyphase windowed-sinc resampling (torchaudio.functional.resample parity).

The reference resamples with ``torchaudio.functional.resample`` on the
data path (``src/data/datasets.py:143-145``, ``src/models/seanet.py:166``,
``predict.py:56``) with default parameters: ``lowpass_filter_width=6``,
``rolloff=0.99``, Hann-windowed sinc interpolation.

TPU-first design: the polyphase kernel bank is built once in numpy
(static shapes), and application is a single strided convolution with
``new_freq`` output channels — one MXU matmul per input block — followed
by a transpose/reshape interleave. Also provides a numpy variant for
host-side (data loading / metric prep) use.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _resample_kernel(orig_freq: int, new_freq: int,
                     lowpass_filter_width: int = 6,
                     rolloff: float = 0.99) -> tuple[np.ndarray, int]:
    """Returns (kernel [new_freq, 1, width*2 + orig_freq], width).

    Mirrors torchaudio's ``_get_sinc_resample_kernel`` for the default
    ``sinc_interp_hann`` method (both rates already gcd-reduced).
    """
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    scale = base_freq / orig_freq
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * scale
    return kernel[:, None, :].astype(np.float32), width


def _target_length(length: int, orig_freq: int, new_freq: int) -> int:
    return math.ceil(new_freq * length / orig_freq)


def resample(x: jax.Array, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jax.Array:
    """Resample along the last axis. x: [..., T] -> [..., ceil(T*new/orig)]."""
    if orig_freq == new_freq:
        return x
    gcd = math.gcd(int(orig_freq), int(new_freq))
    of, nf = int(orig_freq) // gcd, int(new_freq) // gcd
    kernel, width = _resample_kernel(of, nf, lowpass_filter_width, rolloff)

    *lead, length = x.shape
    x2 = x.reshape(-1, 1, length).astype(jnp.float32)
    x2 = jnp.pad(x2, ((0, 0), (0, 0), (width, width + of)))
    y = jax.lax.conv_general_dilated(
        x2, jnp.asarray(kernel),
        window_strides=(of,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, nf, frames]
    y = jnp.swapaxes(y, 1, 2).reshape(x2.shape[0], -1)  # interleave phases
    tgt = _target_length(length, of, nf)
    return y[:, :tgt].reshape(*lead, tgt)


def resample_np(x: np.ndarray, orig_freq: int, new_freq: int,
                lowpass_filter_width: int = 6, rolloff: float = 0.99) -> np.ndarray:
    """Host-side numpy twin of :func:`resample` (for data prep / metrics)."""
    if orig_freq == new_freq:
        return x
    gcd = math.gcd(int(orig_freq), int(new_freq))
    of, nf = int(orig_freq) // gcd, int(new_freq) // gcd
    kernel, width = _resample_kernel(of, nf, lowpass_filter_width, rolloff)
    kernel = kernel[:, 0, :]  # [nf, K]

    *lead, length = x.shape
    x2 = x.reshape(-1, length).astype(np.float32)
    x2 = np.pad(x2, ((0, 0), (width, width + of)))
    n_frames = (x2.shape[-1] - kernel.shape[-1]) // of + 1
    # frame with stride tricks then one matmul
    s0, s1 = x2.strides
    frames = np.lib.stride_tricks.as_strided(
        x2, (x2.shape[0], n_frames, kernel.shape[-1]), (s0, s1 * of, s1))
    y = np.einsum("bfk,pk->bfp", frames, kernel)  # [B, frames, nf]
    y = y.reshape(x2.shape[0], -1)
    tgt = _target_length(length, of, nf)
    return y[:, :tgt].reshape(*lead, tgt)
