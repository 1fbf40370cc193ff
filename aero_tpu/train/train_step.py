"""The jitted GAN train/valid step.

TPU-native re-design of the reference's per-batch work
(``/root/reference/src/solver.py:277-349,428-612``): the generator
forward, every configured loss, BOTH backward passes and BOTH optimizer
updates are fused into one jitted, donated step. The reference steps the
generator first and the discriminator second (solver.py:317-321), but
the discriminator loss graph is built *before* either update — i.e.
simultaneous gradients — which is exactly what computing both grads from
the same state and applying both updates does here.

Data parallelism: params are replicated, the batch is sharded on the
``dp`` mesh axis; XLA's partitioner inserts the gradient all-reduce
(replacing DDP bucket all-reduce, src/ddp/distrib.py:58-69).
"""

from __future__ import annotations

import typing as tp
from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import optax

from aero_tpu.losses.adversarial import (
    hifi_discriminator_loss, hifi_feature_loss, hifi_generator_loss,
    melgan_discriminator_loss, melgan_generator_losses,
)
from aero_tpu.losses.stft_loss import (
    STFT_LOSS_PAD_MARGIN, multi_resolution_stft_loss,
)
from aero_tpu.ops.mel import mel_spectrogram
from aero_tpu.parallel import mesh as pmesh


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    gen_params: tp.Any
    gen_state: tp.Any          # e.g. {'batch_stats': ...} (FTB BatchNorm)
    gen_opt_state: tp.Any
    disc_params: tp.Any        # {disc_name: params}; empty dict if no GAN
    disc_state: tp.Any         # {disc_name: {'spectral_stats': ...}}
    disc_opt_state: tp.Any
    rng: jnp.ndarray


def make_optimizer(args):
    """torch.optim.Adam(lr, betas=(0.9, beta2)) parity (train.py:83).

    AERO_FLAT_OPT=1 wraps the update in ``optax.flatten``: the moment
    buffers and the update math run on ONE raveled vector instead of
    hundreds of small leaves (identical math, different fusion shape —
    measured A/B on TPU before flipping any default; flat opt state is
    checkpoint-incompatible with the per-leaf layout)."""
    import os

    opt = optax.adam(learning_rate=float(args.lr), b1=0.9,
                     b2=float(args.beta2), eps=1e-8)
    if os.environ.get("AERO_FLAT_OPT", "0") == "1":
        opt = optax.flatten(opt)
    return opt


def with_adam_moments(opt_state, mu, nu, count: int):
    """Return ``opt_state`` with its ScaleByAdamState replaced by the
    given moment trees and step count (torch ``.th`` warm resume —
    reference solver.py:126-129 restores optimizer.state_dict()).
    ``mu``/``nu`` must mirror the params tree; ``count`` is torch's
    per-param 'step' (both sides apply bias correction with step+1 on
    the next update, so the counts align 1:1)."""

    def rep(s):
        if isinstance(s, optax.ScaleByAdamState):
            new_mu = jax.tree.map(
                lambda t, v: jnp.asarray(v, t.dtype), s.mu, mu)
            new_nu = jax.tree.map(
                lambda t, v: jnp.asarray(v, t.dtype), s.nu, nu)
            return s._replace(count=jnp.asarray(count, s.count.dtype),
                              mu=new_mu, nu=new_nu)
        return s

    return jax.tree_util.tree_map(
        rep, opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState))


def init_state(args, models, variables, rng) -> TrainState:
    gen_vars = dict(variables["generator"])
    gen_params = gen_vars.pop("params")
    disc_params = {}
    disc_state = {}
    for name, v in variables.items():
        if name == "generator":
            continue
        v = dict(v)
        disc_params[name] = v.pop("params")
        disc_state[name] = v

    opt = make_optimizer(args)
    gen_opt_state = opt.init(gen_params)
    disc_opt_state = opt.init(disc_params) if disc_params else ()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_state=gen_vars,
        gen_opt_state=gen_opt_state,
        disc_params=disc_params,
        disc_state=disc_state,
        disc_opt_state=disc_opt_state,
        rng=rng,
    )


def _to_tc(x):
    """[B, C, T] -> [B, T, C] for channels-last discriminators."""
    return jnp.swapaxes(x, 1, 2)


class LossComputer:
    """Config-driven loss assembly mirroring solver._get_losses
    (solver.py:428-468)."""

    def __init__(self, args, models):
        self.args = args
        self.models = models
        exp = args.experiment
        self.adversarial = bool(exp.get("adversarial", False))
        self.disc_names = list(exp.get("discriminator_models", [])) \
            if self.adversarial else []
        self.losses = list(args.losses)
        self.only_features = bool(exp.get("only_features_loss", False))
        self.only_adversarial = bool(exp.get("only_adversarial_loss", False))
        self.feat_lambda = float(exp.get("features_loss_lambda", 100))
        # Bucketed-exact mode precondition (ADVICE r4): DiscriminatorP's
        # on-device reflect fold-pad writes period-1 samples past n_valid;
        # every bucketing call site pads by STFT_LOSS_PAD_MARGIN, so the
        # margin must cover the largest configured period — otherwise the
        # dynamic_update_slice start would silently clamp and overwrite
        # the last valid samples. Guarded here, where periods are static.
        for name in self.disc_names:
            periods = getattr(models.get(name), "periods", None)
            if periods:
                assert max(periods) - 1 <= STFT_LOSS_PAD_MARGIN, (
                    f"discriminator '{name}' period {max(periods)} exceeds "
                    f"the bucket pad margin {STFT_LOSS_PAD_MARGIN}; raise "
                    "STFT_LOSS_PAD_MARGIN (losses/stft_loss.py) so the "
                    "bucketed-exact fold-pad stays off the valid samples")

    def generator_losses(self, pr, hr, disc_params, disc_state, train,
                         n_valid=None):
        """Returns ({name: loss}, {}) — gen losses given current discs.

        ``n_valid`` (traced scalar): bucketed-exact eval mode. pr/hr are
        exact length-n signals reflect-tail-padded to a static bucket
        (margin >= STFT_LOSS_PAD_MARGIN); every loss is computed with
        masks so it EQUALS the exact-length reference computation
        (solver.py:353-425) — l1/l2/stft/melgan and the hifi families
        alike (per-layer masked period/scale stacks + masked LS-GAN/
        feature/mel means; tests/test_valid_masking.py)."""
        exp = self.args.experiment
        out = {}
        if n_valid is not None:
            tmask = (jnp.arange(pr.shape[-1])[None, None, :]
                     < n_valid).astype(pr.dtype)
            denom = pr.shape[0] * pr.shape[1] * n_valid
        if "l1" in self.losses:
            out["l1"] = jnp.mean(jnp.abs(pr - hr)) if n_valid is None else \
                jnp.sum(jnp.abs(pr - hr) * tmask) / denom
        if "l2" in self.losses:
            out["l2"] = jnp.mean((pr - hr) ** 2) if n_valid is None else \
                jnp.sum(((pr - hr) ** 2) * tmask) / denom
        if "stft" in self.losses:
            sc, mag = multi_resolution_stft_loss(
                pr[:, 0, :], hr[:, 0, :],
                factor_sc=float(self.args.stft_sc_factor),
                factor_mag=float(self.args.stft_mag_factor),
                n_valid=n_valid)
            out["stft"] = sc + mag

        if not self.adversarial:
            return out

        pr_tc, hr_tc = _to_tc(pr), _to_tc(hr)
        if "msd_melgan" in self.disc_names:
            disc = self.models["msd_melgan"]
            p = disc_params["msd_melgan"]
            if n_valid is None:
                d_fake = disc.apply({"params": p}, pr_tc)
                d_real = disc.apply({"params": p}, hr_tc)
                lens = None
            else:
                d_fake, lens = disc.apply({"params": p}, pr_tc,
                                          n_valid=n_valid)
                d_real, _ = disc.apply({"params": p}, hr_tc,
                                       n_valid=n_valid)
            adv, feat = melgan_generator_losses(
                d_fake, d_real,
                n_layers=int(exp.melgan_discriminator.n_layers),
                num_d=int(exp.melgan_discriminator.num_D),
                valid_lengths=lens)
            if not self.only_features:
                out["adversarial_melgan"] = adv
            if not self.only_adversarial:
                out["features_melgan"] = self.feat_lambda * feat
        nv = {"n_valid": n_valid} if n_valid is not None else {}
        if "msd_hifi" in self.disc_names:
            disc = self.models["msd_hifi"]
            v = {"params": disc_params["msd_hifi"], **disc_state["msd_hifi"]}
            res = disc.apply(v, hr_tc, pr_tc, train=False, **nv)
            (_, y_g, fmap_r, fmap_g), mi = res[:4], (res[4] if n_valid
                                                     is not None else None)
            counts, lens = mi if mi is not None else (None, None)
            if not self.only_features:
                out["adversarial_msd"] = hifi_generator_loss(y_g, counts)
            if not self.only_adversarial:
                out["features_msd"] = self.feat_lambda * hifi_feature_loss(
                    fmap_r, fmap_g, lens)
        if "mpd" in self.disc_names:
            disc = self.models["mpd"]
            p = disc_params["mpd"]
            res = disc.apply({"params": p}, hr_tc, pr_tc, **nv)
            (_, y_g, fmap_r, fmap_g), mi = res[:4], (res[4] if n_valid
                                                     is not None else None)
            counts, lens = mi if mi is not None else (None, None)
            if not self.only_features:
                out["adversarial_mpd"] = hifi_generator_loss(y_g, counts)
            if not self.only_adversarial:
                out["features_mpd"] = self.feat_lambda * hifi_feature_loss(
                    fmap_r, fmap_g, lens)
        if "hifi" in self.disc_names:
            mpd, msd = self.models["mpd"], self.models["msd_hifi"]
            res_f = mpd.apply({"params": disc_params["mpd"]}, hr_tc, pr_tc,
                              **nv)
            (_, y_df_g, fmap_f_r, fmap_f_g) = res_f[:4]
            f_counts, f_lens = res_f[4] if n_valid is not None else (None,
                                                                     None)
            v = {"params": disc_params["msd_hifi"], **disc_state["msd_hifi"]}
            res_s = msd.apply(v, hr_tc, pr_tc, train=False, **nv)
            (_, y_ds_g, fmap_s_r, fmap_s_g) = res_s[:4]
            s_counts, s_lens = res_s[4] if n_valid is not None else (None,
                                                                     None)
            mel_kw = dict(exp.mel_spectrogram)
            pr_mel = mel_spectrogram(pr, int(exp.hr_sr), **mel_kw)
            hr_mel = mel_spectrogram(hr, int(exp.hr_sr), **mel_kw)
            mel_l1 = jnp.abs(hr_mel - pr_mel)
            if n_valid is None:
                mel_mean = jnp.mean(mel_l1)
            else:
                # centered STFT frames of a length-n signal: 1 + n//hop;
                # the reflect-tail margin past n makes frames covering
                # the boundary exact (see losses/stft_loss.stft_loss)
                hop = int(mel_kw.get("hop_length")
                          or (mel_kw.get("win_length")
                              or mel_kw["n_fft"]) // 2)
                nf = 1 + n_valid // hop
                fidx = jnp.arange(mel_l1.shape[-1])
                fmask = (fidx < nf).astype(mel_l1.dtype)
                mel_mean = jnp.sum(mel_l1 * fmask) / (
                    nf * (mel_l1.size // mel_l1.shape[-1]))
            loss_mel = mel_mean * float(exp.get("mel_spec_loss_lambda", 45))
            fm = hifi_feature_loss(fmap_s_r, fmap_s_g, s_lens) \
                + hifi_feature_loss(fmap_f_r, fmap_f_g, f_lens)
            if self.only_features:
                out["adversarial_hifi"] = fm
            else:
                out["adversarial_hifi"] = (
                    hifi_generator_loss(y_ds_g, s_counts)
                    + hifi_generator_loss(y_df_g, f_counts)
                    + fm + loss_mel)
        return out

    def discriminator_losses(self, pr_sg, hr, disc_params, disc_state, train,
                             n_valid=None):
        """Returns ({name: loss}, new_disc_state). ``n_valid``: bucketed-
        exact eval mode, see ``generator_losses``."""
        out = {}
        new_state = dict(disc_state)
        pr_tc, hr_tc = _to_tc(pr_sg), _to_tc(hr)
        if "msd_melgan" in self.disc_names:
            disc = self.models["msd_melgan"]
            p = disc_params["msd_melgan"]
            if n_valid is None:
                d_fake = disc.apply({"params": p}, pr_tc)
                d_real = disc.apply({"params": p}, hr_tc)
                lens = None
            else:
                d_fake, lens = disc.apply({"params": p}, pr_tc,
                                          n_valid=n_valid)
                d_real, _ = disc.apply({"params": p}, hr_tc,
                                       n_valid=n_valid)
            out["msd_melgan"] = melgan_discriminator_loss(
                d_fake, d_real, valid_lengths=lens)
        nv = {"n_valid": n_valid} if n_valid is not None else {}
        # Reference semantics (solver.py:443-468,607-612): every entry in
        # discriminator_models contributes its OWN loss key and
        # _optimize_adversarial sums them all — so 'hifi' combined with
        # 'msd_hifi'/'mpd' counts the shared disc twice, exactly like the
        # reference. The shared forwards below are computed once and the
        # loss VALUE reused (identical math, identical double gradient).
        msd_loss = mpd_loss = None
        if "msd_hifi" in self.disc_names or "hifi" in self.disc_names:
            disc = self.models["msd_hifi"]
            v = {"params": disc_params["msd_hifi"], **disc_state["msd_hifi"]}
            mutable = [k for k in disc_state["msd_hifi"]] if train else []
            if mutable:
                res, upd = disc.apply(v, hr_tc, pr_tc, train=train,
                                      mutable=mutable, **nv)
                new_state["msd_hifi"] = dict(upd)
            else:
                res = disc.apply(v, hr_tc, pr_tc, train=train, **nv)
            y_r, y_g = res[0], res[1]
            counts = res[4][0] if n_valid is not None else None
            msd_loss = hifi_discriminator_loss(y_r, y_g, counts)
            if "msd_hifi" in self.disc_names:
                out["msd"] = msd_loss
        if "mpd" in self.disc_names or "hifi" in self.disc_names:
            disc = self.models["mpd"]
            res = disc.apply({"params": disc_params["mpd"]}, hr_tc, pr_tc,
                             **nv)
            y_r, y_g = res[0], res[1]
            counts = res[4][0] if n_valid is not None else None
            mpd_loss = hifi_discriminator_loss(y_r, y_g, counts)
            if "mpd" in self.disc_names:
                out["mpd"] = mpd_loss
        if "hifi" in self.disc_names:
            out["hifi"] = msd_loss + mpd_loss
        return out, new_state


def make_train_step(args, models, mesh=None, donate=True):
    """Build the jitted train step: (state, lr, hr) -> (state, metrics).

    ``accum_steps=K`` (root config, default 1) runs the batch as K
    sequential microbatches inside one ``lax.scan``, averaging gradients
    and mutable-collection updates, then applies ONE optimizer update —
    the same effective batch with ~K× less live activation memory (the
    HBM lever for big-waveform configs, e.g. 11→44 music whose
    MPD/MSD-on-44.1kHz step does not fit a 16 GB chip at B=16).
    Semantics match K-way data-parallel training, not the monolithic
    step: losses/grads are exact means (equal microbatches), BatchNorm
    batch_stats update with the mean of per-microbatch statistics, and
    spectral-norm power iteration is exact (its update depends only on
    params). Grad exactness vs accum=1 is pinned by
    tests/test_train_step.py on a stateless model pair."""
    lc = LossComputer(args, models)
    gen = models["generator"]
    opt = make_optimizer(args)
    accum = int(args.get("accum_steps", 1) or 1)

    def step(state: TrainState, lr_batch, hr_batch):
        rng, dropout_rng = jax.random.split(state.rng)

        def gen_loss_fn(gen_params, lr_mb, hr_mb):
            variables = {"params": gen_params, **state.gen_state}
            mutable = list(state.gen_state.keys())
            if mutable:
                pr, gen_upd = gen.apply(variables, lr_mb, train=True,
                                        mutable=mutable)
                gen_upd = dict(gen_upd)
            else:
                pr = gen.apply(variables, lr_mb, train=True)
                gen_upd = {}
            losses = lc.generator_losses(pr, hr_mb, state.disc_params,
                                         state.disc_state, train=True)
            total = sum(losses.values())
            return total, (losses, gen_upd, pr)

        def disc_loss_fn(dparams, pr_sg, hr_mb):
            losses, new_dstate = lc.discriminator_losses(
                pr_sg, hr_mb, dparams, state.disc_state, train=True)
            return sum(losses.values()), (losses, new_dstate)

        def one_microbatch(lr_mb, hr_mb):
            """Returns the flat pytree of everything to average over
            microbatches: (gen_total, gen_losses, gen_upd, gen_grads,
            disc_losses, disc_state, disc_grads)."""
            (gen_total, (gen_losses, gen_upd, pr)), gen_grads = \
                jax.value_and_grad(gen_loss_fn, has_aux=True)(
                    state.gen_params, lr_mb, hr_mb)
            disc_losses = {}
            disc_state = state.disc_state
            disc_grads = jax.tree.map(jnp.zeros_like, state.disc_params)
            if lc.adversarial and state.disc_params:
                pr_sg = jax.lax.stop_gradient(pr)
                (_, (disc_losses, disc_state)), disc_grads = \
                    jax.value_and_grad(disc_loss_fn, has_aux=True)(
                        state.disc_params, pr_sg, hr_mb)
            return (gen_total, gen_losses, gen_upd, gen_grads,
                    disc_losses, disc_state, disc_grads)

        if accum == 1:
            (gen_total, gen_losses, gen_upd, gen_grads,
             disc_losses, disc_state, disc_grads) = one_microbatch(
                lr_batch, hr_batch)
        else:
            b = lr_batch.shape[0]
            assert b % accum == 0, (
                f"batch {b} not divisible by accum_steps={accum}")
            lr_mb = lr_batch.reshape(accum, b // accum, *lr_batch.shape[1:])
            hr_mb = hr_batch.reshape(accum, b // accum, *hr_batch.shape[1:])

            acc0 = jax.eval_shape(one_microbatch, lr_mb[0], hr_mb[0])
            acc0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), acc0)

            def body(acc, xs):
                out = one_microbatch(*xs)
                return jax.tree.map(jnp.add, acc, out), None

            acc, _ = jax.lax.scan(body, acc0, (lr_mb, hr_mb))
            (gen_total, gen_losses, gen_upd, gen_grads,
             disc_losses, disc_state, disc_grads) = jax.tree.map(
                lambda x: x / accum, acc)

        gen_updates, gen_opt_state = opt.update(gen_grads, state.gen_opt_state,
                                                state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)

        disc_params = state.disc_params
        disc_opt_state = state.disc_opt_state
        if lc.adversarial and state.disc_params:
            disc_updates, disc_opt_state = opt.update(
                disc_grads, state.disc_opt_state, state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, disc_updates)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            gen_state=gen_upd if gen_upd else state.gen_state,
            gen_opt_state=gen_opt_state,
            disc_params=disc_params,
            disc_state=disc_state,
            disc_opt_state=disc_opt_state,
            rng=rng,
        )
        metrics = {f"generator_{k}": v for k, v in gen_losses.items()}
        metrics.update({f"discriminator_{k}": v for k, v in disc_losses.items()})
        metrics["total"] = gen_total
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is not None:
        repl = pmesh.replicated(mesh)
        bsh = pmesh.batch_sharding(mesh)
        return jax.jit(step, donate_argnums=donate_argnums,
                       in_shardings=(repl, bsh, bsh),
                       out_shardings=(repl, repl))
    return jax.jit(step, donate_argnums=donate_argnums)


def make_valid_step(args, models, mesh=None):
    """No-update loss pass (solver cross-valid, solver.py:277-349)."""
    lc = LossComputer(args, models)
    gen = models["generator"]

    def step(state: TrainState, lr_batch, hr_batch):
        variables = {"params": state.gen_params, **state.gen_state}
        pr = gen.apply(variables, lr_batch, train=False)
        pr = pr[..., :hr_batch.shape[-1]]
        if pr.shape[-1] < hr_batch.shape[-1]:
            pr = jnp.pad(pr, [(0, 0)] * (pr.ndim - 1)
                         + [(0, hr_batch.shape[-1] - pr.shape[-1])])
        gen_losses = lc.generator_losses(pr, hr_batch, state.disc_params,
                                         state.disc_state, train=False)
        disc_losses, _ = lc.discriminator_losses(
            pr, hr_batch, state.disc_params, state.disc_state, train=False) \
            if lc.adversarial and state.disc_params else ({}, None)
        metrics = {f"generator_{k}": v for k, v in gen_losses.items()}
        metrics.update({f"discriminator_{k}": v for k, v in disc_losses.items()})
        metrics["total"] = sum(gen_losses.values())
        return metrics

    if mesh is not None:
        repl = pmesh.replicated(mesh)
        bsh = pmesh.batch_sharding(mesh)
        return jax.jit(step, in_shardings=(repl, bsh, bsh), out_shardings=repl)
    return jax.jit(step)


def make_forward(models, mesh=None):
    """Jitted inference forward: (state, lr) -> pr."""
    gen = models["generator"]

    def fwd(state: TrainState, lr_batch):
        variables = {"params": state.gen_params, **state.gen_state}
        return gen.apply(variables, lr_batch, train=False)

    if mesh is not None:
        repl = pmesh.replicated(mesh)
        bsh = pmesh.batch_sharding(mesh)
        return jax.jit(fwd, in_shardings=(repl, bsh), out_shardings=bsh)
    return jax.jit(fwd)
