"""Resuming training from a reference checkpoint.th restores everything
the reference's Solver._load restores (src/solver.py:103-133): the
generator AND the melgan discriminator, history, and best_states — not
just the generator weights."""

import os
import sys

import numpy as np
import pytest
import torch

import jax

sys.path.insert(0, "/root/reference")

from src.models.aero import Aero as TorchAero  # noqa: E402
from src.models.discriminators import Discriminator as TorchMelganDisc  # noqa: E402

from aero_tpu.train import build  # noqa: E402
from aero_tpu.train.solver import Solver  # noqa: E402
from aero_tpu.train.train_step import init_state  # noqa: E402
from aero_tpu.train.torch_import import (  # noqa: E402
    import_aero_state, import_melgan_state,
)
from aero_tpu.utils.config import Config  # noqa: E402

AERO_KW = dict(channels=4, growth=2, nfft=512, hop_length=64,
               strides=[4, 4], enc_freq_attn=0, norm_starts=1,
               norm_groups=2, dconv_mode=1, dconv_depth=1, dconv_comp=1,
               dconv_time_attn=1, dconv_lstm=1, dconv_init=1e-3,
               rescale=0.1, lr_sr=4000, hr_sr=16000, spec_upsample=True,
               act_func="snake")
DISC_KW = dict(num_D=2, ndf=4, n_layers=2, downsampling_factor=4)


def _args(tmp_path):
    return Config._wrap(dict(
        lr=3e-4, beta2=0.999, losses=["l1"],
        stft_sc_factor=0.5, stft_mag_factor=0.5,
        epochs=3, eval_every=100, cross_valid=False, cross_valid_every=100,
        checkpoint=True, checkpoint_every=1,
        checkpoint_file="checkpoint.atpu",
        continue_from=str(tmp_path / "checkpoint.th"),
        continue_best=False, keep_history=True, restart=False,
        history_file="history.json", samples_dir="samples", num_prints=1,
        eval_bucket_s=1.0,
        experiment=dict(
            model="aero", aero=dict(AERO_KW),
            name="resume-test", lr_sr=4000, hr_sr=16000, segment=0.25,
            batch_size=2, upsample=False, adversarial=True,
            discriminator_models=["msd_melgan"],
            melgan_discriminator=dict(DISC_KW),
            features_loss_lambda=100,
            only_features_loss=False, only_adversarial_loss=False,
        ),
    ))


def test_solver_resume_from_reference_th(tmp_path, monkeypatch):
    torch.manual_seed(0)
    tm = TorchAero(**AERO_KW)
    td = TorchMelganDisc(**DISC_KW)
    tm_best = TorchAero(**AERO_KW)  # different weights = the "best" state

    def mp(name, module):
        return {"class": None, "args": [], "kwargs": {},
                "state": {k: v.cpu() for k, v in module.state_dict().items()}}

    history = [{"total_loss": 1.0}, {"total_loss": 0.5}]
    package = {
        "models": {"generator": mp("generator", tm),
                   "msd_melgan": mp("msd_melgan", td)},
        "optimizers": {},
        "history": history,
        "best_states": {"models": {"generator": mp("generator", tm_best)}},
        "args": {},
    }
    torch.save(package, str(tmp_path / "checkpoint.th"))

    args = _args(tmp_path)
    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))

    monkeypatch.chdir(tmp_path)  # checkpoint_file is relative
    data = {"tr_loader": None, "cv_loader": None, "tt_loader": None}
    solver = Solver(data, models, state, args)

    # history restored (training would resume at epoch len(history))
    assert solver.history == history

    # generator weights == the torch checkpoint's, via the import map
    host = jax.device_get(solver.state)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    expect_gen = import_aero_state(
        sd, {"params": host.gen_params, **host.gen_state})
    got = jax.tree.leaves(host.gen_params)
    want = jax.tree.leaves(expect_gen["params"])
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=0)

    # melgan discriminator restored too (was silently fresh-init once)
    dsd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    expect_disc = import_melgan_state(dsd, host.disc_params["msd_melgan"],
                                      DISC_KW["n_layers"])
    for g, w in zip(jax.tree.leaves(host.disc_params["msd_melgan"]),
                    jax.tree.leaves(expect_disc)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=0)

    # best_states imported in OUR format ({name: {'params': ...}})
    assert solver.best_states is not None
    assert "generator" in solver.best_states
    sd_best = {k: v.detach().numpy() for k, v in tm_best.state_dict().items()}
    expect_best = import_aero_state(
        sd_best, {"params": host.gen_params, **host.gen_state})
    for g, w in zip(jax.tree.leaves(solver.best_states["generator"]["params"]),
                    jax.tree.leaves(expect_best["params"])):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=0)
