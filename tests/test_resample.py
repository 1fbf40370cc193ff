"""Property tests for the polyphase resampler (torchaudio-default params)."""

import numpy as np
import jax.numpy as jnp

from aero_tpu.ops.resample import resample, resample_np


def test_length_formula():
    x = jnp.zeros((3, 8000))
    for of, nf in [(4000, 16000), (8000, 16000), (11025, 44100), (16000, 4000),
                   (8000, 24000), (12000, 48000)]:
        y = resample(x, of, nf)
        assert y.shape == (3, int(np.ceil(8000 * nf / of)))


def test_tone_preserved_upsample():
    sr, new_sr, f0 = 4000, 16000, 440.0
    t = np.arange(8000) / sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x[None]), sr, new_sr))[0]
    t2 = np.arange(len(y)) / new_sr
    ref = np.sin(2 * np.pi * f0 * t2)
    # ignore filter edges
    m = slice(200, -200)
    err = np.abs(y[m] - ref[m]).max()
    assert err < 2e-2, err


def test_downsample_antialiases():
    """Energy above the new Nyquist must be strongly attenuated."""
    sr, new_sr = 16000, 4000
    t = np.arange(16000) / sr
    x = np.sin(2 * np.pi * 3500.0 * t).astype(np.float32)  # above 2 kHz Nyquist
    y = np.asarray(resample(jnp.asarray(x[None]), sr, new_sr))[0]
    assert np.sqrt(np.mean(y[200:-200] ** 2)) < 0.15


def test_np_matches_jax():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5000)).astype(np.float32)
    a = np.asarray(resample(jnp.asarray(x), 8000, 24000))
    b = resample_np(x, 8000, 24000)
    np.testing.assert_allclose(a, b, atol=1e-5)
