"""Framed STFT / iSTFT built TPU-first.

Reproduces the exact semantics of the reference wrapper
(``/root/reference/src/models/spec.py:9-39``), i.e. ``torch.stft`` /
``torch.istft`` with ``center=True``, ``pad_mode='reflect'``,
``normalized=True`` and a periodic Hann window zero-padded symmetrically
from ``win_length`` to ``n_fft`` — but implemented as XLA-friendly ops:

- **Analysis**: framing, windowing and the real DFT are fused into one
  strided 1-D convolution whose kernel is the windowed Fourier basis.
  On TPU this is a single MXU matmul per frame instead of a gather +
  FFT; for the small FFT sizes used here (<= 2048) the systolic array
  beats a radix FFT by a wide margin and XLA fuses the surrounding
  elementwise work into it.
- **Synthesis**: the inverse real DFT is one matmul; overlap-add is a
  sum of ``n_fft // hop`` shifted reshapes (exact whenever ``hop``
  divides ``n_fft``, which holds for every AERO configuration), with a
  scatter-add fallback for exotic hop sizes. The window-envelope
  normalization of ``torch.istft`` is applied identically.

Everything here is shape-static and jit/grad/vmap-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


def _padded_window(n_fft: int, win_length: int) -> np.ndarray:
    """Hann window of ``win_length`` zero-padded symmetrically to ``n_fft``.

    Mirrors torch.stft's internal window padding: left pad is
    ``(n_fft - win_length) // 2``.
    """
    if win_length > n_fft:
        raise ValueError(f"win_length {win_length} > n_fft {n_fft}")
    win = hann_window(win_length, dtype=np.float64)
    left = (n_fft - win_length) // 2
    padded = np.zeros(n_fft, dtype=np.float64)
    padded[left:left + win_length] = win
    return padded


@functools.lru_cache(maxsize=64)
def _analysis_basis(n_fft: int, win_length: int, normalized: bool) -> np.ndarray:
    """Windowed real-DFT basis, shape [2 * freqs, n_fft] (real rows then imag).

    ``Z[f] = sum_n x[n] w[n] exp(-2i pi f n / n_fft)``; row ``f`` holds the
    real part basis, row ``freqs + f`` the imaginary part.
    """
    freqs = n_fft // 2 + 1
    win = _padded_window(n_fft, win_length)
    n = np.arange(n_fft, dtype=np.float64)
    f = np.arange(freqs, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(f, n) / n_fft
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0) * win[None, :]
    if normalized:
        basis = basis / np.sqrt(n_fft)
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _synthesis_basis(n_fft: int, win_length: int, normalized: bool) -> np.ndarray:
    """Windowed inverse-rDFT basis, shape [n_fft, 2 * freqs].

    Maps stacked (real, imag) spectra of one frame to the windowed time
    frame ``w[n] * irfft(Z)[n]`` (including the ``sqrt(n_fft)``
    de-normalization torch.istft applies when ``normalized=True``).
    """
    freqs = n_fft // 2 + 1
    win = _padded_window(n_fft, win_length)
    n = np.arange(n_fft, dtype=np.float64)
    f = np.arange(freqs, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, f) / n_fft
    # irfft: y[n] = (1/N) * sum_f c_f * (Re cos - Im sin), c_0 = c_{N/2} = 1, else 2
    coef = np.full(freqs, 2.0)
    coef[0] = 1.0
    if n_fft % 2 == 0:
        coef[-1] = 1.0
    re_basis = np.cos(ang) * coef[None, :] / n_fft
    im_basis = -np.sin(ang) * coef[None, :] / n_fft
    basis = np.concatenate([re_basis, im_basis], axis=1) * win[:, None]
    if normalized:
        basis = basis * np.sqrt(n_fft)
    return basis.astype(np.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _framed_analysis(x, n_fft: int, hop_length: int, win_length: int,
                     normalized: bool):
    """Strided-conv frame+window+rDFT. ``x``: [B, L] (already padded).

    Returns [B, 2F, n_frames]. Wrapped in a custom_vjp because XLA's
    adjoint of a strided conv is a transposed conv (lhs_dilation) that
    lowers pathologically on TPU — measured 338 ms of a 547 ms train
    step just for the multi-res STFT loss backward at B=8. The explicit
    adjoint below (one GEMM + reshape overlap-add) is ~forward-cost.
    """
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    basis = jnp.asarray(_analysis_basis(n_fft, win_length, normalized))
    out = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),
        basis[:, None, :],
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, :, :n_frames]


def _framed_analysis_fwd(x, n_fft, hop_length, win_length, normalized):
    # residuals must be JAX types: carry the primal dtype in a
    # zero-sized array (a raw np.dtype is rejected by the tracer)
    return (_framed_analysis(x, n_fft, hop_length, win_length, normalized),
            (x.shape[-1], jnp.zeros((0,), x.dtype)))


def _framed_analysis_bwd(n_fft, hop_length, win_length, normalized,
                         res, g):
    # dx[m] = sum_{c,k} g[c,k] * basis[c, m - k*hop]: one GEMM into
    # per-frame gradients, then overlap-add (reshape fast path).
    padded_len, dtype_carrier = res
    x_dtype = dtype_carrier.dtype
    basis = jnp.asarray(_analysis_basis(n_fft, win_length, normalized))
    gf = jnp.einsum("bck,cn->bkn", g.astype(jnp.float32), basis)
    dx = _overlap_add(gf, hop_length)
    if dx.shape[-1] < padded_len:
        dx = jnp.pad(dx, ((0, 0), (0, padded_len - dx.shape[-1])))
    # custom_vjp contract: cotangent dtype must match the primal input
    # (a bf16 signal differentiated through stft/mel would otherwise
    # TypeError at trace time — the math above stays f32)
    return (dx.astype(x_dtype),)


_framed_analysis.defvjp(_framed_analysis_fwd, _framed_analysis_bwd)


def stft(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    normalized: bool = True,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """torch.stft-compatible analysis. ``x``: [..., T] real.

    Returns complex64 [..., n_fft // 2 + 1, n_frames].
    """
    win_length = win_length or n_fft
    *lead, length = x.shape
    x = x.reshape(-1, length)
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode=pad_mode)
    padded_len = x.shape[-1]
    if padded_len < n_fft:
        raise ValueError(f"signal ({padded_len}) shorter than n_fft ({n_fft})")
    n_frames = 1 + (padded_len - n_fft) // hop_length

    out = _framed_analysis(x, n_fft, hop_length, win_length, normalized)
    freqs = n_fft // 2 + 1
    z = jax.lax.complex(out[:, :freqs, :], out[:, freqs:, :])
    return z.reshape(*lead, freqs, n_frames)


def _overlap_add(frames: jax.Array, hop_length: int) -> jax.Array:
    """Overlap-add. ``frames``: [B, n_frames, n_fft] -> [B, n_fft + hop*(F-1)].

    A sum of ``ceil(n_fft / hop)`` non-overlapping reshapes (pure layout
    work for XLA). When ``hop`` does not divide ``n_fft`` the frames are
    zero-padded up to the next hop multiple first — zeros contribute
    nothing, and this keeps the reshape fast path universal (the old
    scatter-add fallback was a TPU performance hazard).
    """
    b, n_frames, n_fft = frames.shape
    out_len = n_fft + hop_length * (n_frames - 1)
    m = -(-n_fft // hop_length)
    if n_fft % hop_length != 0:
        frames = jnp.pad(frames,
                         ((0, 0), (0, 0), (0, m * hop_length - n_fft)))
    chunks = frames.reshape(b, n_frames, m, hop_length)
    total = jnp.zeros((b, out_len + m * hop_length - n_fft), frames.dtype)
    for j in range(m):
        seq = chunks[:, :, j, :].reshape(b, n_frames * hop_length)
        total = total.at[:, j * hop_length:j * hop_length + n_frames * hop_length].add(seq)
    return total[:, :out_len]


@functools.lru_cache(maxsize=64)
def _window_envelope(n_fft: int, win_length: int, hop_length: int, n_frames: int) -> np.ndarray:
    """Sum of squared windows at each output sample (torch.istft denominator)."""
    win = _padded_window(n_fft, win_length) ** 2
    out_len = n_fft + hop_length * (n_frames - 1)
    env = np.zeros(out_len, dtype=np.float64)
    for t in range(n_frames):
        env[t * hop_length:t * hop_length + n_fft] += win
    return env.astype(np.float32)


def istft(
    z: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    normalized: bool = True,
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """torch.istft-compatible synthesis. ``z``: [..., freqs, frames] complex."""
    win_length = win_length or n_fft
    *lead, freqs, n_frames = z.shape
    if freqs != n_fft // 2 + 1:
        raise ValueError(f"expected {n_fft // 2 + 1} bins, got {freqs}")
    z = z.reshape(-1, freqs, n_frames)

    spec = jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=1)  # [B, 2F, T]
    basis = jnp.asarray(_synthesis_basis(n_fft, win_length, normalized))
    # [B, 2F, T] x [n_fft, 2F] -> [B, T, n_fft] windowed frames, one matmul.
    frames = jnp.einsum("bct,nc->btn", spec, basis)
    y = _overlap_add(frames, hop_length)

    env = jnp.asarray(_window_envelope(n_fft, win_length, hop_length, n_frames))
    y = y / jnp.maximum(env[None, :], 1e-11)

    # torch.istft slices [start : start+length] from the *untrimmed*
    # envelope-divided OLA buffer (so a requested length longer than the
    # default keeps reconstruction tail, not zeros).
    total = y.shape[-1]
    start = n_fft // 2 if center else 0
    end = start + length if length is not None else total - (n_fft // 2 if center else 0)
    if end <= total:
        y = y[:, start:end]
    else:
        y = jnp.pad(y[:, start:], ((0, 0), (0, end - total)))
    return y.reshape(*lead, y.shape[-1])


def spectro(x: jax.Array, n_fft: int = 512, hop_length: int | None = None,
            pad: int = 0, win_length: int | None = None) -> jax.Array:
    """Reference-compatible STFT wrapper (``src/models/spec.py:9-22``).

    ``x``: [..., T] -> complex [..., freqs, frames]; normalized, centered,
    reflect-padded, periodic Hann of ``win_length`` padded to ``n_fft``.
    """
    return stft(
        x,
        n_fft * (1 + pad),
        hop_length or n_fft // 4,
        win_length=win_length or n_fft,
        normalized=True,
        center=True,
        pad_mode="reflect",
    )


def ispectro(z: jax.Array, hop_length: int | None = None, length: int | None = None,
             pad: int = 0, win_length: int | None = None) -> jax.Array:
    """Reference-compatible iSTFT wrapper (``src/models/spec.py:25-39``)."""
    *_, freqs, _frames = z.shape
    n_fft = 2 * freqs - 2
    win_length = win_length or n_fft // (1 + pad)
    return istft(
        z,
        n_fft,
        hop_length or n_fft // 2,
        win_length=win_length,
        normalized=True,
        center=True,
        length=length,
    )
