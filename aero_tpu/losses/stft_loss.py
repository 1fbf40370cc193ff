"""Multi-resolution STFT loss (parity: /root/reference/src/models/stft_loss.py).

Spectral-convergence + log-magnitude L1 at resolutions
(1024,120,600), (2048,240,1200), (512,50,240) — reference :99-103.
The reference's ``stft`` there uses torch defaults: center=True,
reflect pad, NOT normalized (:11-27), magnitude clamped at 1e-7.

Reuses the MXU-fused STFT from ``aero_tpu.ops.spec``.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

from aero_tpu.ops.spec import stft


def stft_magnitude(x, fft_size: int, hop_size: int, win_length: int):
    """x: [B, T] -> magnitude [B, frames, freqs] (reference transposes)."""
    z = stft(x, fft_size, hop_size, win_length, normalized=False,
             center=True, pad_mode="reflect")
    mag = jnp.sqrt(jnp.maximum(jnp.real(z) ** 2 + jnp.imag(z) ** 2, 1e-7))
    return jnp.swapaxes(mag, -1, -2)


def spectral_convergence_loss(x_mag, y_mag):
    """||y - x||_F / ||y||_F (reference :30-45)."""
    return jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)


def log_stft_magnitude_loss(x_mag, y_mag):
    """L1 on log magnitudes (reference :48-63)."""
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


def _frame_mask(n_frames: int, n_valid_frames):
    """[1, n_frames, 1] mask of frames < n_valid_frames (traced scalar)."""
    idx = jnp.arange(n_frames)[None, :, None]
    return (idx < n_valid_frames).astype(jnp.float32)


def stft_loss(x, y, fft_size: int, hop_size: int, win_length: int,
              n_valid=None):
    """Single-resolution (sc, mag) losses.

    ``n_valid``: optional traced sample count. When given, x/y are
    signals padded past ``n_valid`` (with a reflected tail of >=
    fft_size//2 samples, so frames covering only the first n_valid
    samples are bit-identical to an exact-length STFT) and the losses
    are computed over exactly the frames a length-``n_valid`` input
    would produce (1 + n//hop, torch.stft centered) — masked means, not
    padded means. Gives exact-length reference loss semantics
    (/root/reference/src/solver.py:353-425) at one compile per bucket.
    """
    x_mag = stft_magnitude(x, fft_size, hop_size, win_length)
    y_mag = stft_magnitude(y, fft_size, hop_size, win_length)
    if n_valid is None:
        return (spectral_convergence_loss(x_mag, y_mag),
                log_stft_magnitude_loss(x_mag, y_mag))
    nf_valid = 1 + n_valid // hop_size
    m = _frame_mask(x_mag.shape[1], nf_valid)
    sc = jnp.linalg.norm((y_mag - x_mag) * m) / jnp.linalg.norm(y_mag * m)
    denom = x_mag.shape[0] * nf_valid * x_mag.shape[2]
    mag = jnp.sum(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)) * m) / denom
    return sc, mag


def multi_resolution_stft_loss(
    x, y,
    fft_sizes: tp.Sequence[int] = (1024, 2048, 512),
    hop_sizes: tp.Sequence[int] = (120, 240, 50),
    win_lengths: tp.Sequence[int] = (600, 1200, 240),
    factor_sc: float = 0.1,
    factor_mag: float = 0.1,
    n_valid=None,
):
    """x, y: [B, T] predicted / ground-truth. Returns (sc_loss, mag_loss).
    ``n_valid``: see ``stft_loss`` (exact masked losses under bucketing)."""
    sc_loss = 0.0
    mag_loss = 0.0
    for fs, ss, wl in zip(fft_sizes, hop_sizes, win_lengths):
        sc, mag = stft_loss(x, y, fs, ss, wl, n_valid=n_valid)
        sc_loss += sc
        mag_loss += mag
    n = len(fft_sizes)
    return factor_sc * sc_loss / n, factor_mag * mag_loss / n


# margin needed past n_valid for masked-exact STFT losses: max center pad
STFT_LOSS_PAD_MARGIN = 2048 // 2
