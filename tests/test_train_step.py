"""Train-step tests on the virtual 8-device CPU mesh: full GAN step
(gen + disc updates in one jit), data-parallel sharding, determinism,
and checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aero_tpu.parallel import mesh as pmesh
from aero_tpu.train import build, checkpoint as ckpt
from aero_tpu.train.train_step import (
    init_state, make_forward, make_train_step, make_valid_step,
)
from aero_tpu.utils.config import Config


def tiny_args(adversarial=True, losses=("l1", "stft")):
    aero = dict(
        in_channels=1, out_channels=1, channels=4, growth=2,
        nfft=512, hop_length=64, strides=[4, 2, 2, 2],
        enc_freq_attn=0, norm_starts=2, norm_groups=2,
        dconv_mode=1, dconv_depth=1, dconv_comp=4, dconv_time_attn=2,
        dconv_lstm=2, dconv_init=1e-3, rescale=0.1,
        lr_sr=4000, hr_sr=16000, spec_upsample=True, act_func="snake",
    )
    return Config._wrap(dict(
        lr=3e-4, beta2=0.999, losses=list(losses),
        stft_sc_factor=0.5, stft_mag_factor=0.5,
        experiment=dict(
            model="aero", aero=aero,
            lr_sr=4000, hr_sr=16000, segment=0.25, batch_size=8,
            upsample=False, adversarial=adversarial,
            discriminator_models=["msd_melgan"],
            features_loss_lambda=100,
            only_features_loss=False, only_adversarial_loss=False,
            melgan_discriminator=dict(n_layers=2, num_D=2,
                                      downsampling_factor=4, ndf=4),
        ),
    ))


@pytest.fixture(scope="module")
def setup():
    args = tiny_args()
    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    mesh = pmesh.make_mesh()
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    state = pmesh.replicate(state, mesh)
    return args, models, mesh, state, lr_shape, hr_shape


def _batch(lr_shape, hr_shape, seed=0):
    rng = np.random.default_rng(seed)
    lr = (0.1 * rng.standard_normal(lr_shape)).astype(np.float32)
    hr = (0.1 * rng.standard_normal(hr_shape)).astype(np.float32)
    return lr, hr


def test_gan_train_step_runs_and_updates(setup):
    args, models, mesh, state, lr_shape, hr_shape = setup
    step_fn = make_train_step(args, models, mesh, donate=False)
    lr, hr = _batch(lr_shape, hr_shape)
    lr = pmesh.shard_batch(jnp.asarray(lr), mesh)
    hr = pmesh.shard_batch(jnp.asarray(hr), mesh)

    new_state, metrics = step_fn(state, lr, hr)
    metrics = jax.tree.map(float, metrics)
    for key in ("generator_l1", "generator_stft", "generator_adversarial_melgan",
                "generator_features_melgan", "discriminator_msd_melgan", "total"):
        assert key in metrics and np.isfinite(metrics[key]), (key, metrics)

    # both networks' params changed
    d_gen = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.gen_params, new_state.gen_params)
    assert max(jax.tree.leaves(d_gen)) > 0
    d_disc = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.disc_params, new_state.disc_params)
    assert max(jax.tree.leaves(d_disc)) > 0
    assert int(new_state.step) == int(state.step) + 1

    # second step with same fn (no recompile crash), loss still finite
    _, metrics2 = step_fn(new_state, lr, hr)
    assert np.isfinite(float(metrics2["total"]))


def test_valid_and_forward(setup):
    args, models, mesh, state, lr_shape, hr_shape = setup
    valid_fn = make_valid_step(args, models, mesh)
    fwd = make_forward(models, mesh)
    lr, hr = _batch(lr_shape, hr_shape, seed=1)
    lrj = pmesh.shard_batch(jnp.asarray(lr), mesh)
    hrj = pmesh.shard_batch(jnp.asarray(hr), mesh)
    metrics = jax.tree.map(float, valid_fn(state, lrj, hrj))
    assert np.isfinite(metrics["total"])
    pr = fwd(state, lrj)
    assert pr.shape == hr_shape


def test_dp_matches_single_device(setup):
    """The sharded step must produce the same update as an unsharded one."""
    args, models, mesh, state, lr_shape, hr_shape = setup
    lr, hr = _batch(lr_shape, hr_shape, seed=2)

    step_sharded = make_train_step(args, models, mesh, donate=False)
    s1, m1 = step_sharded(state,
                          pmesh.shard_batch(jnp.asarray(lr), mesh),
                          pmesh.shard_batch(jnp.asarray(hr), mesh))

    step_plain = make_train_step(args, models, mesh=None, donate=False)
    host_state = jax.device_get(state)
    s2, m2 = step_plain(jax.tree.map(jnp.asarray, host_state),
                        jnp.asarray(lr), jnp.asarray(hr))

    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=2e-4)
    a = jax.tree.leaves(jax.device_get(s1.gen_params))
    b = jax.tree.leaves(jax.device_get(s2.gen_params))
    for x, y in zip(a, b):
        # float32 reduction-order noise is amplified to ~lr by Adam's
        # 1/sqrt(v) on near-zero grads; bound by 2*lr + small slack.
        np.testing.assert_allclose(x, y, atol=2 * 3e-4 + 1e-4)


def tiny_seanet_args(accum=1):
    seanet = dict(latent_space_size=16, ngf=4, n_residual_layers=1,
                  resample=1, normalize=True, floor=1e-3,
                  ratios=[8, 8, 2, 2], lr_sr=4000, hr_sr=16000,
                  upsample=True)
    return Config._wrap(dict(
        lr=3e-4, beta2=0.999, losses=["l1", "stft"],
        stft_sc_factor=0.5, stft_mag_factor=0.5, accum_steps=accum,
        experiment=dict(
            model="seanet", seanet=seanet,
            lr_sr=4000, hr_sr=16000, segment=0.25, batch_size=8,
            upsample=False, adversarial=True,
            discriminator_models=["msd_melgan"],
            features_loss_lambda=100,
            only_features_loss=False, only_adversarial_loss=False,
            melgan_discriminator=dict(n_layers=2, num_D=2,
                                      downsampling_factor=4, ndf=4),
        ),
    ))


def test_accum_steps_matches_monolithic():
    """accum_steps=K (microbatch scan + grad averaging) must produce the
    same update as the monolithic step on a stateless model pair
    (Seanet+MelGAN — no BatchNorm; with BN the semantics are K-way-DP,
    per-microbatch stats). The HBM lever for big-waveform configs
    (11→44 music OOMs a 16 GB chip at B=16 without it)."""
    args = tiny_seanet_args()
    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    assert not jax.tree.leaves(state.gen_state), \
        "exactness claim needs a stateless generator (no batch_stats)"
    lr, hr = _batch(lr_shape, hr_shape, seed=3)

    step_mono = make_train_step(args, models, mesh=None, donate=False)
    s1, m1 = step_mono(state, jnp.asarray(lr), jnp.asarray(hr))

    step_accum = make_train_step(tiny_seanet_args(accum=4), models,
                                 mesh=None, donate=False)
    s2, m2 = step_accum(state, jnp.asarray(lr), jnp.asarray(hr))

    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=2e-4)
    for net in ("gen_params", "disc_params"):
        for x, y in zip(jax.tree.leaves(jax.device_get(getattr(s1, net))),
                        jax.tree.leaves(jax.device_get(getattr(s2, net)))):
            # same Adam 1/sqrt(v) amplification bound as the DP test
            np.testing.assert_allclose(x, y, atol=2 * 3e-4 + 1e-4)

    # accum on the sharded path too: microbatches reshard cleanly
    mesh = pmesh.make_mesh()
    step_accum_dp = make_train_step(tiny_seanet_args(accum=4), models,
                                    mesh, donate=False)
    _, m3 = step_accum_dp(pmesh.replicate(state, mesh),
                          pmesh.shard_batch(jnp.asarray(lr), mesh),
                          pmesh.shard_batch(jnp.asarray(hr), mesh))
    np.testing.assert_allclose(float(m3["total"]), float(m1["total"]),
                               rtol=2e-4)


def test_accum_steps_with_batch_stats_runs(setup):
    """K-way-DP semantics with a BN generator (aero FTB): the accum step
    must run, average batch_stats updates, and keep losses finite — the
    exact combination the 11→44 music config trains with."""
    args, models, mesh, state, lr_shape, hr_shape = setup
    args2 = tiny_args()
    args2["accum_steps"] = 2
    step_fn = make_train_step(args2, models, mesh=None, donate=False)
    lr, hr = _batch(lr_shape, hr_shape, seed=4)
    host_state = jax.tree.map(jnp.asarray, jax.device_get(state))
    new_state, metrics = step_fn(host_state, jnp.asarray(lr),
                                 jnp.asarray(hr))
    assert np.isfinite(float(metrics["total"]))
    # batch_stats moved off the init values (BN updates were applied)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     host_state.gen_state, new_state.gen_state)
    assert max(jax.tree.leaves(d)) > 0


def test_checkpoint_roundtrip(tmp_path, setup):
    args, models, mesh, state, lr_shape, hr_shape = setup
    from aero_tpu.utils.config import to_plain

    host = jax.device_get(state)
    pkg = ckpt.package_from_state(host, [{"total_loss": 1.0}], None,
                                  {"note": "test"})
    path = str(tmp_path / "checkpoint.atpu")
    ckpt.save_package(path, pkg)

    loaded = ckpt.load_package(path)
    assert ckpt.history_from_package(loaded) == [{"total_loss": 1.0}]
    state2 = ckpt.state_from_package(loaded, host)
    for x, y in zip(jax.tree.leaves(host.gen_params),
                    jax.tree.leaves(state2.gen_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(host.gen_opt_state),
                    jax.tree.leaves(state2.gen_opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
