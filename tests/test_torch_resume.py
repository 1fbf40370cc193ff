"""Resuming training from a reference checkpoint.th restores everything
the reference's Solver._load restores (src/solver.py:103-133): the
generator AND the melgan discriminator, history, best_states, and the
Adam moments (exp_avg/exp_avg_sq/step, reference solver.py:126-129) —
warm resume must continue the torch trajectory, not re-warm."""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/reference")

from src.models.aero import Aero as TorchAero  # noqa: E402
from src.models.discriminators import Discriminator as TorchMelganDisc  # noqa: E402

from aero_tpu.train import build  # noqa: E402
from aero_tpu.train.solver import Solver  # noqa: E402
from aero_tpu.train.train_step import init_state, make_train_step  # noqa: E402
from aero_tpu.train.torch_import import (  # noqa: E402
    import_aero_adam_moments, import_aero_state, import_melgan_adam_moments,
    import_melgan_state,
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


def _adam_states(opt_state):
    """All ScaleByAdamState nodes of an optax state."""
    return [s for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]


def _torch_gan_step(tm, td, gen_opt, disc_opt, lr_t, hr_t):
    """One reference GAN step with PERSISTENT optimizers (the grad-parity
    oracle re-creates fresh Adams; moment-resume needs continuity).
    Mirrors solver.py:292-321,475-520,602-612 with losses=['l1']."""
    pr = tm(lr_t)
    l1 = F.l1_loss(pr, hr_t)
    d_fake_det = td(pr.detach())
    d_real = td(hr_t)
    d_fake = td(pr)
    disc_loss = sum(F.relu(1 + s[-1]).mean() for s in d_fake_det) \
        + sum(F.relu(1 - s[-1]).mean() for s in d_real)
    w = (4.0 / (DISC_KW["n_layers"] + 1)) * (1.0 / DISC_KW["num_D"])
    feat = sum(w * F.l1_loss(d_fake[i][j], d_real[i][j].detach())
               for i in range(DISC_KW["num_D"])
               for j in range(len(d_fake[i]) - 1))
    adv = sum(F.relu(1 - s[-1]).mean() for s in d_fake)
    gen_total = l1 + adv + 100.0 * feat
    gen_opt.zero_grad()
    disc_opt.zero_grad()
    gen_total.backward(retain_graph=True)
    gen_opt.step()
    disc_opt.zero_grad()
    disc_loss.backward()
    disc_opt.step()


def test_adam_moment_import_and_first_update_parity(tmp_path, monkeypatch):
    """VERDICT r3 #4: a .th warm resume restores exp_avg/exp_avg_sq/step
    so the first post-resume update matches a torch oracle continuing
    the same checkpoint (was: fresh moments perturbing training for a
    few hundred steps)."""
    torch.manual_seed(1)
    tm = TorchAero(**AERO_KW)
    td = TorchMelganDisc(**DISC_KW)
    gen_opt = torch.optim.Adam(tm.parameters(), lr=3e-4, betas=(0.9, 0.999))
    disc_opt = torch.optim.Adam(td.parameters(), lr=3e-4, betas=(0.9, 0.999))

    rng = np.random.default_rng(7)

    def batch():
        lr = (0.1 * rng.standard_normal((1, 1, 1000))).astype(np.float32)
        hr = (0.1 * rng.standard_normal((1, 1, 4000))).astype(np.float32)
        return lr, hr

    # two warm-up steps populate both optimizers' moments
    for _ in range(2):
        lr_np, hr_np = batch()
        _torch_gan_step(tm, td, gen_opt, disc_opt,
                        torch.from_numpy(lr_np), torch.from_numpy(hr_np))

    def mp(module):
        return {"class": None, "args": [], "kwargs": {},
                "state": {k: v.cpu() for k, v in module.state_dict().items()}}

    package = {
        "models": {"generator": mp(tm), "msd_melgan": mp(td)},
        "optimizers": {"optimizer": gen_opt.state_dict(),
                       "disc_optimizer": disc_opt.state_dict()},
        "history": [],
        "best_states": {},
        "args": {},
    }
    torch.save(package, str(tmp_path / "checkpoint.th"))

    args = _args(tmp_path)
    args.experiment.adversarial = True
    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    monkeypatch.chdir(tmp_path)
    solver = Solver({"tr_loader": None, "cv_loader": None,
                     "tt_loader": None}, models, state, args)
    host = jax.device_get(solver.state)

    # 1. moments landed: counts == 2 and mu/nu equal the mapped torch state
    g_adam = _adam_states(host.gen_opt_state)
    d_adam = _adam_states(host.disc_opt_state)
    assert len(g_adam) == 1 and len(d_adam) == 1
    assert int(g_adam[0].count) == 2 and int(d_adam[0].count) == 2

    gsd_keys = [k for k in tm.state_dict().keys()]
    mu_w, nu_w, step_w = import_aero_adam_moments(
        _np_opt(gen_opt.state_dict()), gsd_keys, host.gen_params)
    assert step_w == 2
    for got, want in zip(jax.tree.leaves(g_adam[0].mu), jax.tree.leaves(mu_w)):
        np.testing.assert_allclose(np.asarray(got), want, atol=0)
    for got, want in zip(jax.tree.leaves(g_adam[0].nu), jax.tree.leaves(nu_w)):
        np.testing.assert_allclose(np.asarray(got), want, atol=0)

    dmu_w, dnu_w, dstep_w = import_melgan_adam_moments(
        _np_opt(disc_opt.state_dict()), [k for k in td.state_dict().keys()],
        jax.tree.map(np.asarray, host.disc_params["msd_melgan"]),
        DISC_KW["n_layers"])
    assert dstep_w == 2
    for got, want in zip(jax.tree.leaves(d_adam[0].mu["msd_melgan"]),
                         jax.tree.leaves(dmu_w)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)

    # 2. the FIRST post-resume update matches torch continuing in place
    lr_np, hr_np = batch()
    step_fn = make_train_step(args, models, mesh=None, donate=False)
    new_state, _ = step_fn(host, jnp.asarray(lr_np), jnp.asarray(hr_np))

    _torch_gan_step(tm, td, gen_opt, disc_opt,
                    torch.from_numpy(lr_np), torch.from_numpy(hr_np))
    tm_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params_np = jax.tree.map(np.asarray, host.gen_params)
    want_new = import_aero_state(
        tm_sd, {"params": params_np,
                **jax.tree.map(np.asarray, host.gen_state)})["params"]

    def flat_updates(old, new):
        d = jax.tree.map(lambda a, b: np.ravel(np.asarray(b)
                                               - np.asarray(a)), old, new)
        return np.concatenate(jax.tree.leaves(d))

    du_t = flat_updates(params_np, want_new)
    du_j = flat_updates(params_np, jax.tree.map(np.asarray,
                                                new_state.gen_params))
    rel_l2 = np.linalg.norm(du_t - du_j) / np.linalg.norm(du_t)
    assert rel_l2 < 0.05, f"post-resume generator update rel L2 {rel_l2:.3e}"
    # near-eps grads saturate Adam to +/-lr on sign noise; must be rare
    diff = np.abs(du_t - du_j)
    assert np.mean(diff > 0.5 * 3e-4) < 1e-3
    assert int(_adam_states(jax.device_get(
        new_state.gen_opt_state))[0].count) == 3


def _np_opt(osd):
    """torch optimizer.state_dict() -> the numpy layout
    load_torch_checkpoint produces."""
    state = {}
    for idx, ent in osd["state"].items():
        step = ent["step"]
        state[int(idx)] = {
            "step": float(step.item() if hasattr(step, "item") else step),
            "exp_avg": ent["exp_avg"].numpy(),
            "exp_avg_sq": ent["exp_avg_sq"].numpy(),
        }
    return {"state": state}


def test_torch_param_order_excludes_spectral_norm_buffers():
    """torch_param_order must reproduce torch's parameters() index space
    for modules mixing weight_norm (weight_v IS a parameter) and
    spectral_norm (weight_u/weight_v are BUFFERS) — the hifi MSD's
    first sub-discriminator is spectral-normed
    (/root/reference/src/models/discriminators.py:150-156)."""
    import torch
    from torch import nn as tnn

    from aero_tpu.train.torch_import import torch_param_order

    m = tnn.Sequential(
        tnn.utils.weight_norm(tnn.Conv1d(2, 3, 3)),
        tnn.utils.spectral_norm(tnn.Conv1d(3, 4, 3)),
        tnn.BatchNorm1d(4),
    )
    want = [n for n, _ in m.named_parameters()]
    got = torch_param_order(list(m.state_dict().keys()))
    assert got == want, (got, want)
