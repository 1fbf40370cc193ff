"""bfloat16 compute-path test: same params, bf16 vs f32 forward must agree
closely (f32 islands guard the sensitive numerics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aero_tpu.models import modules
from aero_tpu.models.aero import Aero

KW = dict(channels=8, growth=2, nfft=512, hop_length=64, strides=(4, 4),
          enc_freq_attn=0, norm_starts=1, norm_groups=2, dconv_mode=1,
          dconv_depth=1, dconv_comp=1, dconv_time_attn=1, dconv_lstm=1,
          dconv_init=1e-3, rescale=0.1, lr_sr=4000, hr_sr=16000,
          spec_upsample=True, act_func="snake")


@pytest.fixture(autouse=True)
def reset_dtype():
    yield
    modules.set_compute_dtype(jnp.float32)


def test_bf16_forward_close_to_f32():
    m = Aero(**KW)
    rng = np.random.default_rng(0)
    x = jnp.asarray((0.1 * rng.standard_normal((1, 1, 4000))).astype(np.float32))

    modules.set_compute_dtype(jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y32 = np.asarray(m.apply(variables, x, train=False))

    modules.set_compute_dtype(jnp.bfloat16)
    y16 = np.asarray(m.apply(variables, x, train=False))

    assert y16.dtype == np.float32  # output cast back to f32
    scale = max(np.abs(y32).max(), 1e-9)
    err = np.abs(y16 - y32).max() / scale
    assert err < 0.1, err
    # correlation: same signal content
    corr = np.corrcoef(y16.ravel(), y32.ravel())[0, 1]
    assert corr > 0.99, corr


def test_norms_bf16_drift_bounded():
    """The norms keep STATISTICS in f32 but normalize in the compute
    dtype (fused-reduce convention, no materialized f32 activation copy);
    this bounds the resulting bf16 drift against a full-f32 oracle."""
    rng = np.random.default_rng(1)
    x = jnp.asarray((3.0 + 2.0 * rng.standard_normal((2, 64, 33, 16)))
                    .astype(np.float32))

    gn = modules.GroupNorm(groups=4)
    variables = gn.init(jax.random.PRNGKey(0), x)

    modules.set_compute_dtype(jnp.float32)
    y32 = np.asarray(gn.apply(variables, x))
    modules.set_compute_dtype(jnp.bfloat16)
    y16 = np.asarray(gn.apply(variables, x.astype(jnp.bfloat16)),
                     dtype=np.float32)
    # normalized output is O(1); bf16 has ~2-3 decimal digits
    assert np.abs(y16 - y32).max() < 0.05, np.abs(y16 - y32).max()

    modules.set_compute_dtype(jnp.float32)
    bn = modules.BatchNorm()
    bvars = bn.init(jax.random.PRNGKey(0), x, train=False)
    z32 = np.asarray(bn.apply(bvars, x, train=False))
    modules.set_compute_dtype(jnp.bfloat16)
    z16 = np.asarray(bn.apply(bvars, x.astype(jnp.bfloat16), train=False),
                     dtype=np.float32)
    scale = max(np.abs(z32).max(), 1e-9)
    assert np.abs(z16 - z32).max() / scale < 0.02
