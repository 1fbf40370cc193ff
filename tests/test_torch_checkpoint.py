"""Reference checkpoint.th import: build a checkpoint in the reference
serializer's exact layout (model_serializer.py:39-63) and load it through
our generator-loading contract."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from src.models.aero import Aero as TorchAero  # noqa: E402

from aero_tpu.models.aero import Aero  # noqa: E402
from aero_tpu.train import checkpoint as ckpt  # noqa: E402

KW = dict(channels=4, growth=2, nfft=512, hop_length=64, strides=[4, 4],
          enc_freq_attn=0, norm_starts=1, norm_groups=2, dconv_mode=1,
          dconv_depth=1, dconv_comp=1, dconv_time_attn=1, dconv_lstm=1,
          dconv_init=1e-3, rescale=0.1, lr_sr=4000, hr_sr=16000,
          spec_upsample=True, act_func="snake")


def test_load_reference_checkpoint_th(tmp_path):
    torch.manual_seed(0)
    tm = TorchAero(**KW)
    tm.eval()

    # reference package layout (model_serializer.py:19-48)
    package = {
        "models": {
            "generator": {
                "class": None,  # we never unpickle classes
                "args": [],
                "kwargs": KW,
                "state": {k: v.cpu() for k, v in tm.state_dict().items()},
            }
        },
        "optimizers": {},
        "history": [{"total_loss": 1.0}],
        "best_states": {},
        "args": {},
    }
    path = str(tmp_path / "checkpoint.th")
    torch.save(package, path)

    jm = Aero(**{**KW, "strides": (4, 4)})
    x = jnp.asarray(np.zeros((1, 1, 4000), np.float32))
    template = jax.tree.map(
        np.asarray,
        dict(jax.jit(lambda k, y: jm.init(k, y, train=False))(
            jax.random.PRNGKey(0), x)))

    loaded = ckpt.load_generator_variables(path, template)
    loaded = jax.tree.map(jnp.asarray, dict(loaded))

    xr = (0.1 * np.random.default_rng(0).standard_normal((1, 1, 4000))
          ).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(xr)).numpy()
    got = np.asarray(jm.apply(loaded, jnp.asarray(xr), train=False))
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert err < 2e-2, err


def test_export_roundtrip(tmp_path):
    """export_aero_state -> reference .th -> torch reference forward must
    match our forward (the reverse shim: take trained TPU weights back
    to the PyTorch reference)."""
    from aero_tpu.train.torch_import import save_torch_checkpoint

    jm = Aero(**{**KW, "strides": (4, 4)})
    x = (0.1 * np.random.default_rng(1).standard_normal((1, 1, 4000))
         ).astype(np.float32)
    variables = jax.tree.map(
        np.asarray,
        dict(jax.jit(lambda k, y: jm.init(k, y, train=False))(
            jax.random.PRNGKey(3), jnp.asarray(x))))

    path = str(tmp_path / "exported.th")
    save_torch_checkpoint(path, variables, KW)

    tm = TorchAero(**KW)
    pkg = torch.load(path, map_location="cpu", weights_only=False)
    tm.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) if not torch.is_tensor(v) else v
         for k, v in pkg["models"]["generator"]["state"].items()},
        strict=False)  # num_batches_tracked buffers absent by design
    tm.eval()

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(jm.apply(jax.tree.map(jnp.asarray, variables),
                              jnp.asarray(x), train=False))
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert err < 2e-2, err
