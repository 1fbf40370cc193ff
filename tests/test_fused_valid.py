"""Fused valid pass == split (forward -> host -> masked loss) path.

The solver's fused per-file valid computation (``Solver._make_fused_valid``)
runs generator forward + length match + reflected-tail reconstruction +
masked losses in ONE jit with device-resident metrics. These tests
assert it produces the same numbers as the split path it replaces
(``EvalForward`` then ``Solver._valid_losses`` masked-bucketed losses,
themselves proven equal to the reference's exact-length computation by
tests/test_valid_masking.py; reference /root/reference/src/solver.py:353-425).
"""

import math
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aero_tpu.data.datasets import match_signal
from aero_tpu.eval.forward import EvalForward, _pad_reflect_tail
from aero_tpu.losses.stft_loss import STFT_LOSS_PAD_MARGIN
from aero_tpu.train import build
from aero_tpu.train.solver import Solver
from aero_tpu.train.train_step import LossComputer, init_state
from aero_tpu.utils.config import Config


def _args(adversarial=True):
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
        eval_bucket_s=1.0,
        experiment=dict(
            model="aero", aero=aero,
            lr_sr=4000, hr_sr=16000, segment=0.25, batch_size=8,
            upsample=False, adversarial=adversarial,
            discriminator_models=["msd_melgan"] if adversarial else [],
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


def _split_path_metrics(args, models, state, lr, hr):
    """The pre-fusion computation, verbatim: bucketed EvalForward, host
    match_signal, reflect-pad both signals to the margin bucket, masked
    losses (Solver._valid_losses semantics)."""
    n_hr = hr.shape[-1]
    ef = EvalForward(models["generator"], state, scale=4.0, lr_sr=4000,
                     bucket_s=1.0)
    pr = match_signal(ef(lr), n_hr)

    bucket = 16000
    tgt = max(bucket, int(math.ceil(
        (n_hr + STFT_LOSS_PAD_MARGIN) / bucket)) * bucket)
    pr_b = jnp.asarray(_pad_reflect_tail(np.asarray(pr, np.float32), tgt))
    hr_b = jnp.asarray(_pad_reflect_tail(np.asarray(hr, np.float32), tgt))
    n_valid = jnp.asarray(n_hr, jnp.int32)

    lc = LossComputer(args, models)
    gen_losses = lc.generator_losses(pr_b, hr_b, state.disc_params,
                                     state.disc_state, train=False,
                                     n_valid=n_valid)
    metrics = {f"generator_{k}": v for k, v in gen_losses.items()}
    if lc.adversarial and state.disc_params:
        disc_losses, _ = lc.discriminator_losses(
            pr_b, hr_b, state.disc_params, state.disc_state, train=False,
            n_valid=n_valid)
        metrics.update({f"discriminator_{k}": v
                        for k, v in disc_losses.items()})
    metrics["total"] = sum(gen_losses.values())
    return {k: float(v) for k, v in metrics.items()}


def _stub(args, models, scale=4.0):
    return SimpleNamespace(args=args, models=models,
                           eval_forward=SimpleNamespace(scale=scale))


@pytest.mark.parametrize("n_hr", [7900, 12040, 12042, 16000])
def test_fused_equals_split(setup, n_hr):
    """n_hr=12042 (= 4*n_lr + 2): the generator only covers
    int(n_lr*scale) samples, so the split path's match_signal zero-pads
    the last 2 — the fused path must replicate that (not leave real
    model output there)."""
    args, models, state = setup
    stub = _stub(args, models)
    fused = Solver._make_fused_valid(stub)

    n_lr = n_hr // 4
    rng = np.random.default_rng(n_hr)
    lr = (0.1 * rng.standard_normal((1, 1, n_lr))).astype(np.float32)
    hr = (0.1 * rng.standard_normal((1, 1, n_hr))).astype(np.float32)

    t_lr, t_hr, ok = Solver._fused_valid_shapes(stub, n_lr, n_hr)
    assert ok and t_lr % 4000 == 0 and t_hr == t_lr * 4 + STFT_LOSS_PAD_MARGIN

    lr_b = _pad_reflect_tail(lr, t_lr)
    hr_b = _pad_reflect_tail(hr, t_hr)
    got = {k: float(v) for k, v in fused(
        state, jnp.asarray(lr_b), jnp.asarray(hr_b),
        jnp.asarray(n_hr, jnp.int32),
        jnp.asarray(n_lr * 4, jnp.int32)).items()}

    want = _split_path_metrics(args, models, state, lr, hr)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4,
                                   err_msg=f"metric {k} at n={n_hr}")


def test_fused_shapes_fallbacks(setup):
    args, models, _ = setup
    stub = _stub(args, models)
    # file too short for the on-device tail reconstruction
    assert Solver._fused_valid_shapes(stub, 200, 800)[2] is False
    # exact-length mode (bucketing off)
    args0 = _args()
    args0["eval_bucket_s"] = 0.0
    assert Solver._fused_valid_shapes(
        _stub(args0, models), 1975, 7900)[2] is False


def test_one_compile_per_bucket(setup):
    """Files of different true lengths in the same bucket must reuse one
    executable (no per-length retrace)."""
    args, models, state = setup
    stub = _stub(args, models)
    fused = Solver._make_fused_valid(stub)
    rng = np.random.default_rng(0)
    for n_hr in (7900, 9000, 11000):
        n_lr = n_hr // 4
        t_lr, t_hr, ok = Solver._fused_valid_shapes(stub, n_lr, n_hr)
        assert ok and (t_lr, t_hr) == (4000, 17024)
        lr_b = _pad_reflect_tail(
            (0.1 * rng.standard_normal((1, 1, n_lr))).astype(np.float32),
            t_lr)
        hr_b = _pad_reflect_tail(
            (0.1 * rng.standard_normal((1, 1, n_hr))).astype(np.float32),
            t_hr)
        fused(state, jnp.asarray(lr_b), jnp.asarray(hr_b),
              jnp.asarray(n_hr, jnp.int32), jnp.asarray(n_lr * 4, jnp.int32))
    assert fused._cache_size() == 1


def test_hifi_family_fuses(setup):
    """Since the hifi period/scale stacks compute per-layer MASKED
    losses (r4; tests/test_valid_masking.py proves masked-bucketed ==
    exact-length for mpd/msd_hifi/hifi), their values are padding-
    invariant and the fused valid path must engage for every
    discriminator family (VERDICT r3 #2)."""
    args, models, _ = setup
    for discs in (["msd_hifi"], ["mpd"], ["hifi"], ["msd_melgan", "hifi"],
                  ["msd_melgan"]):
        args_h = _args()
        args_h.experiment.discriminator_models = discs
        stub = _stub(args_h, models)
        assert Solver._fused_valid_shapes(stub, 1975, 7900)[2] is True, discs
