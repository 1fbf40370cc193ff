"""Bucketed valid losses must EQUAL the exact-length computation.

The reference computes valid losses on exact file lengths (eager torch,
/root/reference/src/solver.py:353-425). Our solver pads to a static
bucket for one-compile-per-bucket; these tests assert the masked losses
(LossComputer(..., n_valid=n)) on the padded signals equal the unmasked
losses on the exact-length signals — for l1/l2, the multi-res STFT loss
and the full melgan adversarial/feature path — for several lengths.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aero_tpu.eval.forward import _pad_reflect_tail
from aero_tpu.losses.stft_loss import STFT_LOSS_PAD_MARGIN
from aero_tpu.train import build
from aero_tpu.train.train_step import LossComputer, init_state
from aero_tpu.utils.config import Config


def _args():
    aero = dict(
        in_channels=1, out_channels=1, channels=4, growth=2,
        nfft=512, hop_length=64, strides=[4, 2, 2, 2],
        enc_freq_attn=0, norm_starts=2, norm_groups=2,
        dconv_mode=1, dconv_depth=1, dconv_comp=4, dconv_time_attn=2,
        dconv_lstm=2, dconv_init=1e-3, rescale=0.1,
        lr_sr=4000, hr_sr=16000, spec_upsample=True, act_func="snake",
    )
    return Config._wrap(dict(
        lr=3e-4, beta2=0.999, losses=["l1", "l2", "stft"],
        stft_sc_factor=0.5, stft_mag_factor=0.5,
        experiment=dict(
            model="aero", aero=aero,
            lr_sr=4000, hr_sr=16000, segment=0.25, batch_size=8,
            upsample=False, adversarial=True,
            discriminator_models=["msd_melgan"],
            features_loss_lambda=100,
            only_features_loss=False, only_adversarial_loss=False,
            melgan_discriminator=dict(n_layers=2, num_D=3,
                                      downsampling_factor=4, ndf=4),
        ),
    ))


@pytest.fixture(scope="module")
def setup():
    args = _args()
    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    return args, models, state


def _bucketed(x, n, bucket=16000):
    tgt = max(bucket,
              int(math.ceil((n + STFT_LOSS_PAD_MARGIN) / bucket)) * bucket)
    return _pad_reflect_tail(x, tgt)


@pytest.mark.parametrize("n", [7900, 12000, 16000, 20011])
def test_masked_bucketed_losses_equal_exact(setup, n):
    args, models, state = setup
    lc = LossComputer(args, models)
    rng = np.random.default_rng(n)
    pr = (0.1 * rng.standard_normal((1, 1, n))).astype(np.float32)
    hr = (pr + 0.02 * rng.standard_normal((1, 1, n))).astype(np.float32)

    exact = lc.generator_losses(jnp.asarray(pr), jnp.asarray(hr),
                                state.disc_params, state.disc_state,
                                train=False)
    exact = {k: float(v) for k, v in exact.items()}

    pr_b = jnp.asarray(_bucketed(pr, n))
    hr_b = jnp.asarray(_bucketed(hr, n))
    assert pr_b.shape[-1] >= n + STFT_LOSS_PAD_MARGIN
    masked = lc.generator_losses(pr_b, hr_b, state.disc_params,
                                 state.disc_state, train=False,
                                 n_valid=jnp.asarray(n, jnp.int32))
    masked = {k: float(v) for k, v in masked.items()}

    assert set(masked) == set(exact)
    for k in exact:
        np.testing.assert_allclose(masked[k], exact[k], rtol=2e-4,
                                   err_msg=f"loss {k} at n={n}")

    d_exact, _ = lc.discriminator_losses(
        jnp.asarray(pr), jnp.asarray(hr), state.disc_params,
        state.disc_state, train=False)
    d_masked, _ = lc.discriminator_losses(
        pr_b, hr_b, state.disc_params, state.disc_state, train=False,
        n_valid=jnp.asarray(n, jnp.int32))
    for k in d_exact:
        np.testing.assert_allclose(float(d_masked[k]), float(d_exact[k]),
                                   rtol=2e-4, err_msg=f"disc {k} at n={n}")


def _hifi_args(discs):
    """Small hifi-family config (mirrors tests/test_train_step_hifi.py)."""
    args = _args()
    args.experiment.discriminator_models = list(discs)
    args.experiment.mpd = Config._wrap(dict(hidden=4, periods=[2, 3, 5]))
    args.experiment.msd = Config._wrap(dict(hidden=16, num_D=2))
    args.experiment.mel_spectrogram = Config._wrap(dict(
        n_fft=1024, hop_length=256, win_length=1024, n_mels=80))
    args.experiment.mel_spec_loss_lambda = 45
    return args


@pytest.mark.parametrize("discs", [["mpd"], ["msd_hifi"], ["hifi"]])
@pytest.mark.parametrize("n", [7900, 16000, 20011])
def test_hifi_masked_bucketed_equals_exact(discs, n):
    """VERDICT r3 #2: the hifi period/scale stacks with per-layer valid
    lengths + masked LS-GAN/feature/mel means must reproduce the exact-
    length computation (reference solver.py:353-425) bit-near under
    bucketing — previously an unmasked mean over zero-masked padding
    whose value depended on the padded length."""
    args = _hifi_args(discs)
    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    lc = LossComputer(args, models)
    rng = np.random.default_rng(n)
    pr = (0.1 * rng.standard_normal((1, 1, n))).astype(np.float32)
    hr = (pr + 0.02 * rng.standard_normal((1, 1, n))).astype(np.float32)

    exact = lc.generator_losses(jnp.asarray(pr), jnp.asarray(hr),
                                state.disc_params, state.disc_state,
                                train=False)
    exact = {k: float(v) for k, v in exact.items()}

    pr_b = jnp.asarray(_bucketed(pr, n))
    hr_b = jnp.asarray(_bucketed(hr, n))
    masked = lc.generator_losses(pr_b, hr_b, state.disc_params,
                                 state.disc_state, train=False,
                                 n_valid=jnp.asarray(n, jnp.int32))
    masked = {k: float(v) for k, v in masked.items()}

    assert set(masked) == set(exact)
    for k in exact:
        np.testing.assert_allclose(masked[k], exact[k], rtol=2e-4,
                                   err_msg=f"loss {k} ({discs}) at n={n}")

    d_exact, _ = lc.discriminator_losses(
        jnp.asarray(pr), jnp.asarray(hr), state.disc_params,
        state.disc_state, train=False)
    d_masked, _ = lc.discriminator_losses(
        pr_b, hr_b, state.disc_params, state.disc_state, train=False,
        n_valid=jnp.asarray(n, jnp.int32))
    assert set(d_masked) == set(d_exact)
    for k in d_exact:
        np.testing.assert_allclose(
            float(d_masked[k]), float(d_exact[k]), rtol=2e-4,
            err_msg=f"disc {k} ({discs}) at n={n}")


def test_hifi_masked_padding_invariant():
    """The same (signal, n) in two different buckets must give identical
    masked losses — the property the old zero-mask approximation
    lacked."""
    args = _hifi_args(["hifi"])
    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    lc = LossComputer(args, models)
    n = 9000
    rng = np.random.default_rng(n)
    pr = (0.1 * rng.standard_normal((1, 1, n))).astype(np.float32)
    hr = (pr + 0.02 * rng.standard_normal((1, 1, n))).astype(np.float32)
    nv = jnp.asarray(n, jnp.int32)
    vals = []
    for bucket in (16000, 24000):
        g = lc.generator_losses(jnp.asarray(_bucketed(pr, n, bucket)),
                                jnp.asarray(_bucketed(hr, n, bucket)),
                                state.disc_params, state.disc_state,
                                train=False, n_valid=nv)
        vals.append({k: float(v) for k, v in g.items()})
    for k in vals[0]:
        np.testing.assert_allclose(vals[0][k], vals[1][k], rtol=1e-5,
                                   err_msg=f"padding-dependent loss {k}")


def test_one_compile_per_bucket(setup):
    """Same bucket, different n -> the jitted loss fn must not retrace."""
    args, models, state = setup
    lc = LossComputer(args, models)
    traces = []

    @jax.jit
    def loss_fn(pr, hr, n):
        traces.append(1)
        return sum(lc.generator_losses(pr, hr, state.disc_params,
                                       state.disc_state, train=False,
                                       n_valid=n).values())

    rng = np.random.default_rng(0)
    vals = []
    for n in (7900, 9000, 11000):
        pr = (0.1 * rng.standard_normal((1, 1, n))).astype(np.float32)
        hr = (pr + 0.02 * rng.standard_normal((1, 1, n))).astype(np.float32)
        vals.append(float(loss_fn(jnp.asarray(_bucketed(pr, n, 16000)),
                                  jnp.asarray(_bucketed(hr, n, 16000)),
                                  jnp.asarray(n, jnp.int32))))
    assert len(traces) == 1
    assert all(np.isfinite(v) for v in vals)
