"""Golden parity tests: aero_tpu.ops.spec vs torch.stft/istft.

The reference model's correctness hinges on bit-near STFT/iSTFT parity
(SURVEY.md §7 "hard parts"); torch (CPU) is the golden oracle here.
Covers the exact parameterizations used by the reference:
- model analysis:  nfft=512, hop=hop_length//scale, win=nfft//scale
  (src/models/aero.py:324-328)
- model synthesis: hop=hop_length, win=nfft (src/models/aero.py:423-428)
- stft_loss resolutions 1024/120/600, 2048/240/1200, 512/50/240
  (src/models/stft_loss.py:99-103, normalized=False)
- LSD metric 2048/512 (src/metrics.py:37-56)
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from aero_tpu.ops import spec as jspec


def torch_stft(x, n_fft, hop, win_length, normalized):
    return torch.stft(
        torch.from_numpy(x),
        n_fft,
        hop,
        win_length=win_length,
        window=torch.hann_window(win_length),
        normalized=normalized,
        center=True,
        return_complex=True,
        pad_mode="reflect",
    ).numpy()


CASES = [
    # (n_fft, hop, win_length, normalized, T)
    (512, 16, 128, True, 8000),     # 4->16 kHz analysis (scale 4)
    (512, 64, 512, True, 8000),     # synthesis-side framing
    (512, 32, 256, True, 16000),    # 8->16 kHz analysis (scale 2)
    (1024, 120, 600, False, 32000),  # stft_loss res 1
    (2048, 240, 1200, False, 32000),  # stft_loss res 2
    (512, 50, 240, False, 32000),   # stft_loss res 3
    (2048, 512, 2048, False, 40000),  # LSD metric
]


@pytest.mark.parametrize("n_fft,hop,win,normalized,T", CASES)
def test_stft_matches_torch(n_fft, hop, win, normalized, T):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, T)).astype(np.float32)
    ref = torch_stft(x, n_fft, hop, win, normalized)
    got = np.asarray(jspec.stft(jnp.asarray(x), n_fft, hop, win, normalized=normalized))
    assert got.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=0)


ISTFT_CASES = [
    # (n_fft, hop, win_length, T) — synthesis params used by _ispec
    (512, 64, 512, 8000 * 4),
    (512, 128, 512, 8000 * 4),
    (512, 256, 512, 8000 * 4),
    (512, 128, 256, 16000 * 2),   # 8->16: win = nfft//scale * scale = 512? general case
]


@pytest.mark.parametrize("n_fft,hop,win,T", ISTFT_CASES)
def test_istft_matches_torch(n_fft, hop, win, T):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, T)).astype(np.float32)
    z = torch_stft(x, n_fft, hop, win, normalized=True)
    ref = torch.istft(
        torch.from_numpy(z),
        n_fft,
        hop,
        win_length=win,
        window=torch.hann_window(win),
        normalized=True,
        center=True,
    ).numpy()
    got = np.asarray(
        jspec.istft(jnp.asarray(z), n_fft, hop, win, normalized=True, center=True)
    )
    assert got.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got, ref, atol=3e-4 * scale, rtol=0)


def test_spectro_ispectro_roundtrip_asymmetric():
    """The AERO spectral-upsampling contract: analysis with hop//scale &
    win//scale, synthesis with hop & win=nfft gives scale-times the samples
    (src/models/aero.py:324-328,423-428)."""
    rng = np.random.default_rng(2)
    nfft, hop, scale = 512, 64, 4
    T = 8000  # already multiple of hop//scale = 16
    x = rng.standard_normal((1, 1, T)).astype(np.float32)

    z = jspec.spectro(jnp.asarray(x), nfft, hop // scale, win_length=nfft // scale)
    z = z[..., :-1, :]  # drop last bin as the model does (aero.py:420)
    assert z.shape[-2] == nfft // 2

    z = jnp.pad(z, [(0, 0)] * (z.ndim - 2) + [(0, 1), (0, 0)])
    y = jspec.ispectro(z, hop, win_length=nfft)
    assert y.shape[-1] >= T * scale - hop * scale
    # energy sanity: output is a valid signal, not NaN/garbage
    assert np.isfinite(np.asarray(y)).all()


def test_spectro_matches_reference_wrapper():
    """spectro() wrapper vs the reference wrapper semantics via torch."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 1, 8000)).astype(np.float32)
    got = np.asarray(jspec.spectro(jnp.asarray(x), 512, 16, win_length=128))

    xt = torch.from_numpy(x.reshape(-1, 8000))
    ref = torch.stft(xt, 512, 16, window=torch.hann_window(128), win_length=128,
                     normalized=True, center=True, return_complex=True,
                     pad_mode="reflect").numpy().reshape(got.shape)
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=0)


def test_istft_length_trim_and_pad():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 4096)).astype(np.float32)
    z = torch_stft(x, 512, 256, 512, normalized=True)
    for length in (4000, 4096, 4200):
        ref = torch.istft(torch.from_numpy(z), 512, 256, win_length=512,
                          window=torch.hann_window(512), normalized=True,
                          center=True, length=length).numpy()
        got = np.asarray(jspec.istft(jnp.asarray(z), 512, 256, 512,
                                     normalized=True, length=length))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=3e-4, rtol=0)


def test_grad_flows():
    import jax

    def loss(x):
        z = jspec.spectro(x, 512, 16, win_length=128)
        return jnp.sum(jnp.abs(z) ** 2)

    x = jnp.ones((1, 2048))
    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_istft_hop_not_dividing_nfft():
    """OLA scatter-add fallback path (hop does not divide n_fft)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 6000)).astype(np.float32)
    z = torch_stft(x, 512, 120, 512, normalized=True)
    ref = torch.istft(torch.from_numpy(z), 512, 120, win_length=512,
                      window=torch.hann_window(512), normalized=True,
                      center=True).numpy()
    got = np.asarray(jspec.istft(jnp.asarray(z), 512, 120, 512,
                                 normalized=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=0)
