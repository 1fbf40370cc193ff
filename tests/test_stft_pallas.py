"""Pallas framed-STFT kernel vs the XLA-conv STFT (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aero_tpu.ops import stft_pallas as sp
from aero_tpu.ops.spec import stft


@pytest.fixture(autouse=True)
def interpret_mode():
    old = sp._INTERPRET
    sp._INTERPRET = True
    yield
    sp._INTERPRET = old


@pytest.mark.parametrize("n_fft,hop,win,normalized,t", [
    (512, 16, 128, True, 8000),
    (512, 64, 512, True, 5000),
    (1024, 120, 600, False, 7000),
])
def test_pallas_stft_matches_xla(n_fft, hop, win, normalized, t):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32))
    want = np.asarray(stft(x, n_fft, hop, win, normalized=normalized))
    got = np.asarray(sp.stft_pallas(x, n_fft, hop, win,
                                    normalized=normalized, block_frames=64))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(got, want, atol=3e-5 * scale, rtol=0)
