"""Train-step coverage for the HiFi-GAN discriminator configs
(mpd + msd_hifi), including spectral-norm power-iteration state updates."""

import numpy as np

import jax
import jax.numpy as jnp

from aero_tpu.train import build
from aero_tpu.train.train_step import init_state, make_train_step
from aero_tpu.utils.config import Config


def hifi_args():
    aero = dict(
        in_channels=1, out_channels=1, channels=4, growth=2,
        nfft=512, hop_length=64, strides=[4, 4],
        enc_freq_attn=4, norm_starts=1, norm_groups=2,
        dconv_mode=1, dconv_depth=1, dconv_comp=1, dconv_time_attn=9,
        dconv_lstm=9, dconv_init=1e-3, rescale=0.1,
        lr_sr=4000, hr_sr=16000, spec_upsample=True, act_func="gelu",
    )
    return Config._wrap(dict(
        lr=3e-4, beta2=0.999, losses=["l1"],
        stft_sc_factor=0.5, stft_mag_factor=0.5,
        experiment=dict(
            model="aero", aero=aero,
            lr_sr=4000, hr_sr=16000, segment=0.25, batch_size=2,
            upsample=False, adversarial=True,
            discriminator_models=["mpd", "msd_hifi"],
            features_loss_lambda=100,
            only_features_loss=False, only_adversarial_loss=False,
            mpd=dict(hidden=4, periods=[2, 3]),
            msd=dict(hidden=16, num_D=2),
        ),
    ))


def test_hifi_gan_step():
    args = hifi_args()
    models = build.build_models(args)
    assert set(models) == {"generator", "mpd", "msd_hifi"}
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))

    step = make_train_step(args, models, mesh=None, donate=False)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(0.1 * rng.standard_normal(lr_shape), jnp.float32)
    hr = jnp.asarray(0.1 * rng.standard_normal(hr_shape), jnp.float32)

    new_state, metrics = step(state, lr, hr)
    metrics = jax.tree.map(float, metrics)
    for key in ("generator_l1", "generator_adversarial_mpd",
                "generator_features_mpd", "generator_adversarial_msd",
                "generator_features_msd", "discriminator_mpd",
                "discriminator_msd", "total"):
        assert key in metrics and np.isfinite(metrics[key]), (key, metrics)

    # spectral-norm u vectors update during the disc step
    u_old = jax.tree.leaves(state.disc_state["msd_hifi"])
    u_new = jax.tree.leaves(new_state.disc_state["msd_hifi"])
    changed = any(float(jnp.abs(a - b).max()) > 0
                  for a, b in zip(u_old, u_new))
    assert changed, "spectral norm power iteration did not advance"

    # disc params changed
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.disc_params, new_state.disc_params)
    assert max(jax.tree.leaves(d)) > 0


def test_hifi_joint_config_step():
    """discriminator_models=['hifi']: joint MPD+MSD LS-GAN + L1 mel loss
    (reference solver.py:523-554)."""
    args = hifi_args()
    args.experiment.discriminator_models = ["hifi"]
    args.experiment.mel_spectrogram = Config._wrap(dict(
        n_fft=512, hop_length=128, win_length=512, n_mels=32))
    args.experiment.mel_spec_loss_lambda = 45

    models = build.build_models(args)
    assert set(models) == {"generator", "mpd", "msd_hifi"}
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    step = make_train_step(args, models, mesh=None, donate=False)

    rng = np.random.default_rng(1)
    lr = jnp.asarray(0.1 * rng.standard_normal(lr_shape), jnp.float32)
    hr = jnp.asarray(0.1 * rng.standard_normal(hr_shape), jnp.float32)
    new_state, metrics = step(state, lr, hr)
    metrics = jax.tree.map(float, metrics)
    assert "generator_adversarial_hifi" in metrics
    assert "discriminator_hifi" in metrics
    assert np.isfinite(metrics["total"]), metrics
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.disc_params, new_state.disc_params)
    assert max(jax.tree.leaves(d)) > 0


def test_hifi_combined_with_melgan_keeps_both_disc_losses():
    """Reference semantics (solver.py:443-468, 607-612): EVERY entry in
    discriminator_models contributes its own discriminator loss and all
    of them are summed for the disc update — combining 'hifi' with
    'msd_melgan' must not drop the melgan loss (a dict overwrite once
    did, silently freezing the melgan discriminator)."""
    args = hifi_args()
    args.experiment.discriminator_models = ["msd_melgan", "hifi"]
    args.experiment.melgan_discriminator = Config._wrap(dict(
        num_D=2, ndf=4, n_layers=2, downsampling_factor=4))
    args.experiment.mel_spectrogram = Config._wrap(dict(
        n_fft=512, hop_length=128, win_length=512, n_mels=32))
    args.experiment.mel_spec_loss_lambda = 45

    models = build.build_models(args)
    assert set(models) == {"generator", "msd_melgan", "mpd", "msd_hifi"}
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    step = make_train_step(args, models, mesh=None, donate=False)

    rng = np.random.default_rng(2)
    lr = jnp.asarray(0.1 * rng.standard_normal(lr_shape), jnp.float32)
    hr = jnp.asarray(0.1 * rng.standard_normal(hr_shape), jnp.float32)
    new_state, metrics = step(state, lr, hr)
    metrics = jax.tree.map(float, metrics)
    for key in ("discriminator_msd_melgan", "discriminator_hifi",
                "generator_adversarial_melgan", "generator_adversarial_hifi"):
        assert key in metrics and np.isfinite(metrics[key]), (key, metrics)

    # the melgan discriminator actually trains (nonzero param delta)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.disc_params["msd_melgan"],
                     new_state.disc_params["msd_melgan"])
    assert max(jax.tree.leaves(d)) > 0


def test_msd_hifi_combined_with_hifi_double_counts_like_reference():
    """'msd_hifi' + 'hifi' together: the shared MSD loss appears under
    'msd' AND inside 'hifi' (reference computes it twice and sums both,
    solver.py:449-468)."""
    args = hifi_args()
    args.experiment.discriminator_models = ["msd_hifi", "hifi"]
    args.experiment.mel_spectrogram = Config._wrap(dict(
        n_fft=512, hop_length=128, win_length=512, n_mels=32))
    args.experiment.mel_spec_loss_lambda = 45

    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    step = make_train_step(args, models, mesh=None, donate=False)

    rng = np.random.default_rng(3)
    lr = jnp.asarray(0.1 * rng.standard_normal(lr_shape), jnp.float32)
    hr = jnp.asarray(0.1 * rng.standard_normal(hr_shape), jnp.float32)
    _, metrics = step(state, lr, hr)
    metrics = jax.tree.map(float, metrics)
    assert "discriminator_msd" in metrics, metrics
    assert "discriminator_hifi" in metrics, metrics
    # hifi total = shared msd loss + mpd loss >= the standalone msd loss
    assert metrics["discriminator_hifi"] >= metrics["discriminator_msd"] - 1e-6
