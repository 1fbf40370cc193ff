"""Training-dynamics parity: one full GAN train step vs the torch oracle.

From identical imported weights and an identical batch, the reference's
per-batch work (/root/reference/src/solver.py:277-349,428-520,602-612) is
replayed in torch — generator forward, l1 + multi-res-STFT + melgan
adversarial/feature losses, generator Adam step first, discriminator Adam
step second — and compared against our fused jitted train step:

- every loss value (rtol ~1e-3),
- raw generator + discriminator gradients (mapped through the linear
  torch->flax layout shim, so any init/weight-norm/stop-gradient/backward
  semantic drift fails loudly),
- post-step parameters of both networks (Adam semantics),
- FTB BatchNorm running-stat updates (train-mode statistics semantics).

The torch side mirrors the reference math with modern torch APIs (the
reference's own stft_loss uses the removed pre-return_complex API,
SURVEY §2.5 defect 7); nothing is copied.
"""

import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from src.models.aero import Aero as TorchAero  # noqa: E402
from src.models.discriminators import Discriminator as TorchMelganDisc  # noqa: E402

from aero_tpu.models.aero import Aero  # noqa: E402
from aero_tpu.models.discriminators import MelganDiscriminator  # noqa: E402
from aero_tpu.train.torch_import import (  # noqa: E402
    import_aero_state, import_melgan_state,
)
from aero_tpu.train.train_step import (  # noqa: E402
    LossComputer, init_state, make_train_step,
)
from aero_tpu.utils.config import Config  # noqa: E402

AERO_KW = dict(
    channels=16, growth=2, nfft=512, hop_length=64, strides=[4, 4, 2, 2],
    enc_freq_attn=0, norm_starts=2, norm_groups=4,
    dconv_mode=1, dconv_depth=2, dconv_comp=4, dconv_time_attn=2,
    dconv_lstm=2, dconv_init=1e-3, rescale=0.1,
    lr_sr=4000, hr_sr=16000, spec_upsample=True, act_func="snake",
)
DISC_KW = dict(num_D=3, ndf=16, n_layers=4, downsampling_factor=4)
LR, BETA2, FEAT_LAMBDA = 3e-4, 0.999, 100.0
SC_FACTOR = MAG_FACTOR = 0.5


def _args():
    return Config._wrap(dict(
        lr=LR, beta2=BETA2, losses=["l1", "stft"],
        stft_sc_factor=SC_FACTOR, stft_mag_factor=MAG_FACTOR,
        experiment=dict(
            model="aero", aero=dict(AERO_KW),
            lr_sr=4000, hr_sr=16000, segment=1.0, batch_size=1,
            upsample=False, adversarial=True,
            discriminator_models=["msd_melgan"],
            features_loss_lambda=FEAT_LAMBDA,
            only_features_loss=False, only_adversarial_loss=False,
            melgan_discriminator=dict(DISC_KW),
        ),
    ))


def torch_mrstft(x, y):
    """Reference MultiResolutionSTFTLoss math (src/models/stft_loss.py:96-138)
    with the modern return_complex API (same values, differentiable)."""
    def mag(sig, fft_size, hop, win_len):
        z = torch.stft(sig, fft_size, hop, win_len,
                       torch.hann_window(win_len), return_complex=True)
        return torch.sqrt(torch.clamp(z.real ** 2 + z.imag ** 2,
                                      min=1e-7)).transpose(2, 1)

    sc_total, mag_total = 0.0, 0.0
    for fs, ss, wl in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
        xm, ym = mag(x, fs, ss, wl), mag(y, fs, ss, wl)
        sc_total = sc_total + torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro")
        mag_total = mag_total + F.l1_loss(torch.log(ym), torch.log(xm))
    return SC_FACTOR * sc_total / 3 + MAG_FACTOR * mag_total / 3


def torch_disc_grads(td, pr_det, hr_t, dtype):
    """Discriminator-loss gradients in the given dtype (float64 gives the
    conditioning-free oracle: at init the disc grads are near-cancelling
    sums over T, so f32 reduction order dominates their small residual)."""
    td_c = TorchMelganDisc(**DISC_KW)  # weight_norm blocks deepcopy
    td_c.load_state_dict(td.state_dict())
    td_c = td_c.to(dtype)
    td_c.zero_grad()
    d_fake_det = td_c(pr_det.to(dtype))
    d_real = td_c(hr_t.to(dtype))
    loss = sum(F.relu(1 + s[-1]).mean() for s in d_fake_det) \
        + sum(F.relu(1 - s[-1]).mean() for s in d_real)
    loss.backward()
    return {k: p.grad.detach().clone().to(torch.float32).numpy()
            for k, p in td_c.named_parameters()}


def torch_train_step(tm, td, lr_t, hr_t):
    """One reference train step (solver.py:292-321,428-520,602-612).

    Returns (loss dict, gen grads, disc grads); tm/td updated in place.
    """
    tm.train()
    td.train()
    td.zero_grad()
    gen_opt = torch.optim.Adam(tm.parameters(), lr=LR, betas=(0.9, BETA2))
    disc_opt = torch.optim.Adam(td.parameters(), lr=LR, betas=(0.9, BETA2))

    pr = tm(lr_t)
    l1 = F.l1_loss(pr, hr_t)
    stft = torch_mrstft(pr.squeeze(1), hr_t.squeeze(1))

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
    gen_total = l1 + stft + adv + FEAT_LAMBDA * feat

    gen_opt.zero_grad()
    disc_opt.zero_grad()
    gen_total.backward(retain_graph=True)
    gen_grads = {k: p.grad.detach().clone().numpy()
                 for k, p in tm.named_parameters()}
    gen_opt.step()

    disc_opt.zero_grad()
    disc_loss.backward()
    disc_grads = {k: p.grad.detach().clone().numpy()
                  for k, p in td.named_parameters()}
    disc_opt.step()

    losses = dict(l1=float(l1), stft=float(stft), adversarial=float(adv),
                  features=float(FEAT_LAMBDA * feat),
                  disc=float(disc_loss.detach()),
                  total=float(gen_total.detach()))
    return losses, gen_grads, disc_grads, pr.detach().numpy()


def _tensor_errs(ref_tree, got_tree):
    """Per-leaf (max abs err, ref max) pairs."""
    refs = jax.tree.leaves(ref_tree)
    gots = jax.tree.leaves(got_tree)
    assert len(refs) == len(gots)
    return [(float(np.abs(np.asarray(r) - np.asarray(g)).max()),
             float(np.abs(np.asarray(r)).max())) for r, g in zip(refs, gots)]


def _assert_tree_close(ref_tree, got_tree, rel_tol, floor_frac=1e-3,
                       what=""):
    """Per-tensor max-err check, scale floored at floor_frac * global max
    (near-zero-grad tensors otherwise amplify float noise into failures)."""
    errs = _tensor_errs(ref_tree, got_tree)
    gmax = max(s for _, s in errs) or 1.0
    worst = max(e / max(s, floor_frac * gmax) for e, s in errs)
    assert worst < rel_tol, f"{what}: worst per-tensor rel err {worst:.3e}"


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TorchAero(**AERO_KW)
    td = TorchMelganDisc(**DISC_KW)

    kw = dict(AERO_KW)
    kw["strides"] = tuple(kw["strides"])
    jm = Aero(**kw)
    jd = MelganDiscriminator(**DISC_KW)

    rng = np.random.default_rng(0)
    lr = (0.1 * rng.standard_normal((1, 1, 4000))).astype(np.float32)
    hr = (0.1 * rng.standard_normal((1, 1, 16000))).astype(np.float32)

    gen_vars = jm.init(jax.random.PRNGKey(0), jnp.asarray(lr), train=False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    gen_vars = import_aero_state(sd, jax.tree.map(np.asarray, dict(gen_vars)))

    disc_vars = jd.init(jax.random.PRNGKey(1),
                        jnp.asarray(np.swapaxes(hr, 1, 2)))
    dsd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    disc_params = import_melgan_state(dsd, dict(disc_vars)["params"],
                                      DISC_KW["n_layers"])

    variables = {
        "generator": jax.tree.map(jnp.asarray, gen_vars),
        "msd_melgan": {"params": jax.tree.map(jnp.asarray, disc_params)},
    }
    return tm, td, jm, jd, variables, lr, hr


def test_train_step_grad_and_update_parity(pair):
    tm, td, jm, jd, variables, lr, hr = pair
    args = _args()
    models = {"generator": jm, "msd_melgan": jd}
    state = init_state(args, models, variables, jax.random.PRNGKey(2))

    # ---- JAX raw gradients (same graphs the train step differentiates) ----
    lc = LossComputer(args, models)
    lr_j, hr_j = jnp.asarray(lr), jnp.asarray(hr)

    def gen_loss_fn(gp):
        pr, _upd = jm.apply({"params": gp, **state.gen_state}, lr_j,
                            train=True, mutable=list(state.gen_state.keys()))
        losses = lc.generator_losses(pr, hr_j, state.disc_params,
                                     state.disc_state, train=True)
        return sum(losses.values()), pr

    (gen_total_j, pr_j), gen_grads_j = jax.jit(
        jax.value_and_grad(gen_loss_fn, has_aux=True))(state.gen_params)

    def disc_loss_fn(dp):
        losses, _ = lc.discriminator_losses(
            jax.lax.stop_gradient(pr_j), hr_j, dp, state.disc_state,
            train=True)
        return sum(losses.values())

    disc_grads_j = jax.jit(jax.grad(disc_loss_fn))(state.disc_params)

    # ---- torch oracle step (updates tm/td in place) ----
    td_pre = TorchMelganDisc(**DISC_KW)  # pre-step copy for the f64 oracle
    td_pre.load_state_dict(td.state_dict())
    hr_torch = torch.from_numpy(hr)
    losses_t, gen_grads_t, disc_grads_t, pr_torch = torch_train_step(
        tm, td, torch.from_numpy(lr), hr_torch)

    # ---- our fused train step ----
    step_fn = make_train_step(args, models, mesh=None, donate=False)
    new_state, metrics = step_fn(state, lr_j, hr_j)
    metrics = jax.tree.map(float, metrics)

    # 1. loss values
    np.testing.assert_allclose(metrics["generator_l1"], losses_t["l1"],
                               rtol=2e-3)
    np.testing.assert_allclose(metrics["generator_stft"], losses_t["stft"],
                               rtol=2e-3)
    np.testing.assert_allclose(metrics["generator_adversarial_melgan"],
                               losses_t["adversarial"], rtol=5e-3)
    np.testing.assert_allclose(metrics["generator_features_melgan"],
                               losses_t["features"], rtol=5e-3)
    np.testing.assert_allclose(metrics["discriminator_msd_melgan"],
                               losses_t["disc"], rtol=5e-3)
    np.testing.assert_allclose(metrics["total"], losses_t["total"], rtol=2e-3)
    np.testing.assert_allclose(float(gen_total_j), losses_t["total"],
                               rtol=2e-3)

    # 2. raw gradients (torch grads mapped through the linear layout shim)
    params_np = jax.tree.map(np.asarray, state.gen_params)
    gen_grads_t_tree = import_aero_state(gen_grads_t,
                                         {"params": params_np})["params"]
    _assert_tree_close(gen_grads_t_tree, gen_grads_j, rel_tol=5e-2,
                       what="generator grads")

    # Disc grads at init are near-cancelling sums (random-noise audio,
    # outputs ~0, hinge saturated): their f32 residual is conditioning-
    # noise-dominated. Oracle = torch float64; our f32 error budget =
    # 3x torch's own f32-vs-f64 error (self-calibrating), per tensor.
    disc_tree = jax.tree.map(np.asarray, state.disc_params["msd_melgan"])
    d64 = import_melgan_state(
        torch_disc_grads(td_pre, torch.from_numpy(pr_torch), hr_torch,
                         torch.float64),
        disc_tree, DISC_KW["n_layers"])
    d32_tree = import_melgan_state(disc_grads_t, disc_tree,
                                   DISC_KW["n_layers"])
    for (e_j, _), (e_t, s64) in zip(
            _tensor_errs(d64, disc_grads_j["msd_melgan"]),
            _tensor_errs(d64, d32_tree)):
        assert e_j <= 3 * e_t + 1e-6 + 1e-4 * s64, (e_j, e_t, s64)

    # 3. post-step params: compare parameter *updates* elementwise.
    # Adam's g/(sqrt(v)+eps) saturates update magnitude at ~lr, so float
    # noise on near-eps grads bounds accuracy; require the updates to agree
    # to a small fraction of the step size in aggregate and per tensor.
    tm_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    gen_vars_new_t = import_aero_state(
        tm_sd, {"params": params_np,
                "batch_stats": jax.tree.map(
                    np.asarray, state.gen_state["batch_stats"])})

    def upd(old, new):
        return jax.tree.map(lambda a, b: np.asarray(b) - np.asarray(a),
                            old, new)

    du_t = upd(params_np, gen_vars_new_t["params"])
    du_j = upd(params_np, jax.tree.map(np.asarray, new_state.gen_params))
    flat_t = np.concatenate([np.ravel(x) for x in jax.tree.leaves(du_t)])
    flat_j = np.concatenate([np.ravel(x) for x in jax.tree.leaves(du_j)])
    rel_l2 = np.linalg.norm(flat_t - flat_j) / np.linalg.norm(flat_t)
    assert rel_l2 < 0.05, f"generator update rel L2 err {rel_l2:.3e}"
    # Elementwise: where |g| ~ Adam's eps, update = lr*g/(|g|+eps) is a
    # sign function — float noise can flip it to the full +/-2*lr. Such
    # elements must be vanishingly rare; everything else must agree to a
    # small fraction of the step size.
    diff = np.abs(flat_t - flat_j)
    assert np.mean(diff > 0.5 * LR) < 1e-4, np.mean(diff > 0.5 * LR)
    assert np.quantile(diff, 0.999) < 0.2 * LR

    # Disc updates: Adam turns the conditioning-noise grads into
    # ~lr*sign(noise) for the noise-dominated elements, so elementwise
    # torch-f32-vs-jax-f32 update comparison is meaningless here (the
    # GENERATOR update check above already proves Adam semantics on
    # well-conditioned grads). Sanity only: both stepped, same magnitude.
    td_sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    old_disc = jax.tree.map(np.asarray, state.disc_params["msd_melgan"])
    disc_new_t = import_melgan_state(td_sd, old_disc, DISC_KW["n_layers"])
    ddu_t = upd(old_disc, disc_new_t)
    ddu_j = upd(old_disc,
                jax.tree.map(np.asarray, new_state.disc_params["msd_melgan"]))
    dflat_t = np.concatenate([np.ravel(x) for x in jax.tree.leaves(ddu_t)])
    dflat_j = np.concatenate([np.ravel(x) for x in jax.tree.leaves(ddu_j)])
    assert np.abs(dflat_j).max() > 0 and np.abs(dflat_t).max() > 0
    np.testing.assert_allclose(np.linalg.norm(dflat_j),
                               np.linalg.norm(dflat_t), rtol=0.3)

    # 4. FTB BatchNorm running stats after one train-mode forward
    _assert_tree_close(gen_vars_new_t["batch_stats"],
                       jax.tree.map(np.asarray,
                                    new_state.gen_state["batch_stats"]),
                       rel_tol=1e-2, what="batch_stats")
