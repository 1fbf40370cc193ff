"""Learning-signal sanity: overfitting a single batch must slash the loss.

Catches gradient-path bugs (bad stop_gradient placement, dead branches,
optimizer wiring) that forward-parity tests cannot see.
"""

import numpy as np

import jax
import jax.numpy as jnp

from aero_tpu.ops.resample import resample_np
from aero_tpu.train import build
from aero_tpu.train.train_step import init_state, make_train_step
from aero_tpu.utils.config import Config


def small_args():
    aero = dict(
        in_channels=1, out_channels=1, channels=8, growth=2,
        nfft=512, hop_length=64, strides=[4, 4],
        enc_freq_attn=4, norm_starts=0, norm_groups=2,
        dconv_mode=1, dconv_depth=1, dconv_comp=1, dconv_time_attn=9,
        dconv_lstm=9, dconv_init=1e-3, rescale=0.1,
        lr_sr=4000, hr_sr=16000, spec_upsample=True, act_func="gelu",
    )
    return Config._wrap(dict(
        lr=1e-3, beta2=0.999, losses=["l1", "stft"],
        stft_sc_factor=0.5, stft_mag_factor=0.5,
        experiment=dict(
            model="aero", aero=aero,
            lr_sr=4000, hr_sr=16000, segment=0.5, batch_size=2,
            upsample=False, adversarial=False,
        ),
    ))


def test_overfit_single_batch():
    args = small_args()
    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    step = make_train_step(args, models, mesh=None, donate=False)

    # realistic correlated audio: harmonic tone pair
    rng = np.random.default_rng(0)
    t = np.arange(hr_shape[-1]) / 16000.0
    hr = np.stack([
        (0.4 * np.sin(2 * np.pi * f * t)
         + 0.2 * np.sin(2 * np.pi * 3 * f * t)).astype(np.float32)
        for f in (220.0, 310.0)])[:, None, :]
    lr = resample_np(hr[:, 0, :], 16000, 4000)[:, None, :]

    lrj, hrj = jnp.asarray(lr), jnp.asarray(hr)
    first = None
    last = None
    for i in range(60):
        state, metrics = step(state, lrj, hrj)
        total = float(metrics["total"])
        if i == 0:
            first = total
        last = total
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)
