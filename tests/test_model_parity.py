"""Forward-pass parity: aero_tpu models vs the reference PyTorch models.

The reference (CPU torch) is imported as a test oracle; identical weights
are loaded through the torch-import shim and outputs compared. This
validates every block in the graph (STFT, convs, GroupNorm, GLU, DConv,
Snake, BLSTM chunking, LocalState attention, FTB/BatchNorm, embeddings,
transposed convs, iSTFT) in one shot.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from src.models.aero import Aero as TorchAero  # noqa: E402
from src.models.discriminators import Discriminator as TorchMelganDisc  # noqa: E402

from aero_tpu.models.aero import Aero  # noqa: E402
from aero_tpu.models.discriminators import MelganDiscriminator  # noqa: E402
from aero_tpu.train.torch_import import import_aero_state  # noqa: E402

AERO_KW = dict(
    channels=16,
    growth=2,
    nfft=512,
    hop_length=64,
    strides=[4, 4, 2, 2],
    enc_freq_attn=0,  # FTB on all layers (canonical aero_4-16_512_64 config)
    norm_starts=2,
    norm_groups=4,
    dconv_mode=1,
    dconv_depth=2,
    dconv_comp=4,
    dconv_time_attn=2,
    dconv_lstm=2,
    dconv_init=1e-3,
    rescale=0.1,
    lr_sr=4000,
    hr_sr=16000,
    spec_upsample=True,
    act_func="snake",
)


@pytest.fixture(scope="module")
def aero_pair():
    torch.manual_seed(0)
    tm = TorchAero(**AERO_KW)
    tm.eval()

    kw = dict(AERO_KW)
    kw["strides"] = tuple(kw["strides"])
    jm = Aero(**kw)
    # 1 s at 4 kHz -> 251 STFT frames: exercises BLSTM 200-step chunking
    x = np.random.default_rng(0).standard_normal((1, 1, 4000)).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = import_aero_state(sd, jax.tree.map(np.asarray, dict(variables)))
    variables = jax.tree.map(jnp.asarray, variables)
    return tm, jm, variables


def test_param_count_matches(aero_pair):
    tm, _jm, variables = aero_pair
    t_count = sum(p.numel() for p in tm.parameters())
    j_count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert t_count == j_count


def test_aero_forward_parity(aero_pair):
    tm, jm, variables = aero_pair
    rng = np.random.default_rng(1)
    x = (0.1 * rng.standard_normal((2, 1, 4000))).astype(np.float32)

    with torch.no_grad():
        ref, ref_spec, ref_lr_spec = tm(torch.from_numpy(x), return_spec=True,
                                        return_lr_spec=True)
    ref = ref.numpy()

    got, got_spec, got_lr_spec = jm.apply(variables, jnp.asarray(x),
                                          train=False, return_spec=True,
                                          return_lr_spec=True)
    got = np.asarray(got)

    assert got.shape == ref.shape == (2, 1, 16000)
    # lr spec parity (pure DSP path)
    np.testing.assert_allclose(np.asarray(got_lr_spec), ref_lr_spec.numpy(),
                               atol=2e-4, rtol=0)
    # full network output parity
    scale = max(np.abs(ref).max(), 1e-9)
    err = np.abs(got - ref).max() / scale
    assert err < 2e-2, f"relative max err {err}"
    # spectral output too
    serr = (np.abs(np.asarray(got_spec) - ref_spec.numpy()).max()
            / max(np.abs(ref_spec.numpy()).max(), 1e-9))
    assert serr < 2e-2, f"spec relative max err {serr}"


def test_melgan_discriminator_parity():
    torch.manual_seed(0)
    kw = dict(num_D=3, ndf=16, n_layers=4, downsampling_factor=4)
    tm = TorchMelganDisc(**kw)
    tm.eval()
    jm = MelganDiscriminator(**kw)

    x = (0.1 * np.random.default_rng(2).standard_normal((2, 1, 8000))
         ).astype(np.float32)
    xj = jnp.asarray(np.swapaxes(x, 1, 2))  # [B, T, 1]

    variables = jm.init(jax.random.PRNGKey(0), xj)
    # import torch weights: disc_{i}.layer_{n} -> model.disc_{i}.model.layer_{n}
    params = jax.tree.map(np.asarray, dict(variables))["params"]
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    for di, dtree in params.items():
        for ln, ltree in dtree.items():
            base = f"model.{di}.model.{ln}"
            pref = f"{base}.1" if ln == "layer_0" else (
                f"{base}.0" if not ln.endswith(f"_{kw['n_layers'] + 2}") else base)
            ltree["v"] = np.transpose(sd[f"{pref}.weight_v"], (2, 1, 0))
            ltree["g"] = sd[f"{pref}.weight_g"].reshape(-1)
            ltree["bias"] = sd[f"{pref}.bias"]

    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    got = jm.apply({"params": jax.tree.map(jnp.asarray, params)}, xj)

    assert len(got) == len(ref) == 3
    for scale_ref, scale_got in zip(ref, got):
        assert len(scale_got) == len(scale_ref)
        for r, g in zip(scale_ref, scale_got):
            r = r.numpy()
            g = np.swapaxes(np.asarray(g), 1, 2)  # [B,T,C] -> [B,C,T]
            assert g.shape == r.shape
            err = np.abs(g - r).max() / max(np.abs(r).max(), 1e-9)
            assert err < 5e-3, err
