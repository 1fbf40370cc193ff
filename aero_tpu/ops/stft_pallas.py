"""Pallas framed-STFT kernel (SURVEY.md §2.4: the cuFFT-equivalent).

Computes frames_block @ windowed-DFT-basis per grid step with frames
gathered straight from the (reflect-padded) signal in VMEM — framing,
windowing and the real DFT in one fused kernel, double-buffered by the
pallas pipeline.

This is an alternative backend to ``aero_tpu.ops.spec.stft`` (which
lowers to one XLA strided convolution — also a single MXU GEMM, the
formulation the GEMM-native-DFT literature recommends for accelerators).
On v5e the XLA path is bandwidth-trivial next to the model and stays the
default. Note: current Mosaic toolchains reject the unaligned lane-dim
dynamic slices this kernel's framing needs (hop offsets are not
128-aligned), so on-TPU use requires a hop that is a multiple of 128 or
interpret mode; the kernel is parity-tested in interpret mode and kept
as the base for future on-kernel fusion work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aero_tpu.ops.spec import _analysis_basis

_INTERPRET = False

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x, m):
    return -(-x // m) * m


def _stft_kernel(x_ref, basis_ref, out_ref, frames_ref, *, hop: int,
                 n_fft: int, block_frames: int):
    """x_ref: [1, 1, T_pad]; basis_ref: [n_fft, 2F_pad];
    out: [1, BF, 2F_pad]; frames_ref: VMEM scratch [BF, n_fft]."""
    j = pl.program_id(1)
    frame0 = j * block_frames

    def gather_frame(i, _):
        start = (frame0 + i) * hop
        frames_ref[pl.ds(i, 1), :] = x_ref[0, 0, pl.ds(start, n_fft)][None, :]
        return 0

    jax.lax.fori_loop(0, block_frames, gather_frame, 0)
    out_ref[0, :, :] = jax.lax.dot_general(
        frames_ref[:, :], basis_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def stft_pallas(x: jax.Array, n_fft: int, hop_length: int,
                win_length: int | None = None, normalized: bool = True,
                center: bool = True, pad_mode: str = "reflect",
                block_frames: int = 256) -> jax.Array:
    """Pallas twin of ``aero_tpu.ops.spec.stft``. x: [..., T] ->
    complex64 [..., n_fft//2+1, n_frames]."""
    win_length = win_length or n_fft
    *lead, length = x.shape
    x = x.reshape(-1, length)
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode=pad_mode)
    padded_len = x.shape[-1]
    n_frames = 1 + (padded_len - n_fft) // hop_length
    freqs = n_fft // 2 + 1

    basis = _analysis_basis(n_fft, win_length, normalized).T  # [n_fft, 2F]
    f2_pad = _round_up(basis.shape[1], 128)
    basis = np.pad(basis, ((0, 0), (0, f2_pad - basis.shape[1])))

    nf_pad = _round_up(n_frames, block_frames)
    # signal must cover the last padded frame's window, and the mosaic
    # lowering wants the trailing dim a multiple of 128
    need = _round_up(max((nf_pad - 1) * hop_length + n_fft, padded_len), 128)
    if need > padded_len:
        x = jnp.pad(x, ((0, 0), (0, need - padded_len)))

    b = x.shape[0]
    kernel = functools.partial(_stft_kernel, hop=hop_length, n_fft=n_fft,
                               block_frames=block_frames)
    out = pl.pallas_call(
        kernel,
        grid=(b, nf_pad // block_frames),
        in_specs=[
            pl.BlockSpec((1, 1, x.shape[-1]), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((n_fft, f2_pad), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_frames, f2_pad),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nf_pad, f2_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_frames, n_fft), jnp.float32)],
        interpret=_INTERPRET,
    )(x.astype(jnp.float32)[:, None, :], jnp.asarray(basis))

    out = out[:, :n_frames, :2 * freqs]  # [B, T, 2F]
    z = jax.lax.complex(out[..., :freqs], out[..., freqs:2 * freqs])
    return jnp.swapaxes(z, -1, -2).reshape(*lead, freqs, n_frames)
