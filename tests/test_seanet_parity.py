"""Seanet forward parity vs the reference torch implementation.

The reference seanet imports torchaudio (unavailable here) only for
``resample``; we stub it with our own resampler so the oracle runs.
"""

import sys
import types

import numpy as np
import torch

import jax
import jax.numpy as jnp


def _install_torchaudio_stub():
    from aero_tpu.ops.resample import resample_np

    def resample(x, orig_freq, new_freq):
        return torch.from_numpy(
            resample_np(x.detach().numpy(), orig_freq, new_freq))

    ta = types.ModuleType("torchaudio")
    func = types.ModuleType("torchaudio.functional")
    func.resample = resample
    ta.functional = func
    sys.modules.setdefault("torchaudio", ta)
    sys.modules.setdefault("torchaudio.functional", func)


_install_torchaudio_stub()
sys.path.insert(0, "/root/reference")

from src.models.seanet import Seanet as TorchSeanet  # noqa: E402

from aero_tpu.models.seanet import Seanet  # noqa: E402

KW = dict(latent_space_size=16, ngf=4, n_residual_layers=2,
          ratios=[8, 8, 2, 2], lr_sr=4000, hr_sr=16000, upsample=True)


def _import_params(tm, jm, x_example):
    variables = jm.init(jax.random.PRNGKey(0), x_example)
    params = jax.tree.map(np.asarray, dict(variables))["params"]
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    def set_wn(tree, prefix, transpose):
        tree["v"] = np.transpose(sd[f"{prefix}.weight_v"], transpose)
        tree["g"] = sd[f"{prefix}.weight_g"].reshape(-1)
        tree["bias"] = sd[f"{prefix}.bias"]

    n_ratios = len(KW["ratios"])
    n_res = KW["n_residual_layers"]
    # encoder order in torch module list: [in_wrapper, blocks..., out_wrapper]
    set_wn(params["enc_in_conv"], "encoder.0.1", (2, 1, 0))
    for i in range(n_ratios):
        tmod = f"encoder.{i + 1}"
        for j in range(n_res):
            base = f"{tmod}.{j}"
            set_wn(params[f"enc_{i}_res_{j}"]["block_conv1"],
                   f"{base}.block.2", (2, 1, 0))
            set_wn(params[f"enc_{i}_res_{j}"]["block_conv2"],
                   f"{base}.block.4", (2, 1, 0))
            set_wn(params[f"enc_{i}_res_{j}"]["shortcut"],
                   f"{base}.shortcut", (2, 1, 0))
        set_wn(params[f"enc_{i}_conv"], f"{tmod}.{n_res + 1}", (2, 1, 0))
    set_wn(params["enc_out_conv"], f"encoder.{n_ratios + 1}.2", (2, 1, 0))

    set_wn(params["dec_in_conv"], "decoder.0.2", (2, 1, 0))
    for i in range(n_ratios):
        tmod = f"decoder.{i + 1}"
        set_wn(params[f"dec_{i}_convtr"], f"{tmod}.1", (2, 0, 1))
        for j in range(n_res):
            base = f"{tmod}.{j + 2}"
            set_wn(params[f"dec_{i}_res_{j}"]["block_conv1"],
                   f"{base}.block.2", (2, 1, 0))
            set_wn(params[f"dec_{i}_res_{j}"]["block_conv2"],
                   f"{base}.block.4", (2, 1, 0))
            set_wn(params[f"dec_{i}_res_{j}"]["shortcut"],
                   f"{base}.shortcut", (2, 1, 0))
    set_wn(params["dec_out_conv"], f"decoder.{n_ratios + 1}.2", (2, 1, 0))
    return {"params": jax.tree.map(jnp.asarray, params)}


def test_seanet_forward_parity():
    torch.manual_seed(0)
    tm = TorchSeanet(**KW)
    tm.eval()
    jm = Seanet(**{**KW, "ratios": tuple(KW["ratios"])})

    rng = np.random.default_rng(0)
    x = (0.2 * rng.standard_normal((2, 1, 4000))).astype(np.float32)
    variables = _import_params(tm, jm, jnp.asarray(x))

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(jm.apply(variables, jnp.asarray(x)))

    assert got.shape == want.shape == (2, 1, 16000)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert err < 2e-2, err


def test_seanet_torch_checkpoint_import(tmp_path):
    """Checkpoint-level parity: a reference-format checkpoint.th holding
    a torch Seanet state_dict loads through load_generator_variables
    (model='seanet') and reproduces the torch forward (the reference
    serializes ANY generator, src/model_serializer.py:39-63)."""
    from aero_tpu.train import checkpoint as ckpt

    torch.manual_seed(1)
    tm = TorchSeanet(**KW)
    tm.eval()
    path = str(tmp_path / "checkpoint.th")
    torch.save({
        "models": {"generator": {"class": None, "args": [], "kwargs": {},
                                 "state": tm.state_dict()}},
        "optimizers": {}, "history": [], "best_states": {}, "args": {},
    }, path)

    jm = Seanet(**{**KW, "ratios": tuple(KW["ratios"])})
    rng = np.random.default_rng(3)
    x = (0.2 * rng.standard_normal((1, 1, 4000))).astype(np.float32)
    template = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = ckpt.load_generator_variables(path, template, model="seanet")

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(jm.apply(jax.tree.map(jnp.asarray, dict(variables)),
                              jnp.asarray(x)))
    assert got.shape == want.shape
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert err < 2e-2, err
