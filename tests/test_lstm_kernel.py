"""Fused Pallas LSTM recursion vs the lax.scan twin (interpret mode).

The inference path (train=False on TPU) runs the whole 200-step
recursion in one pallas_call (aero_tpu/ops/lstm.py); the training path
keeps the differentiable scan. Both must produce identical sequences —
including through BLSTM's 50%-overlap chunking (reference
src/models/modules.py:17-65).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aero_tpu.models.modules import BLSTM, LSTM
from aero_tpu.ops import lstm as lstm_ops


@pytest.fixture(autouse=True)
def interpret_mode():
    old = lstm_ops._INTERPRET
    lstm_ops._INTERPRET = True
    yield
    lstm_ops._INTERPRET = old


def _kernel_engaged(hidden):
    # the module only takes the Pallas path for lane/sublane-legal sizes
    return hidden % 8 == 0 and hidden <= lstm_ops._LANE


def test_lstm_pallas_matches_scan():
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.3 * rng.standard_normal((6, 37, 10)).astype(np.float32))
    assert _kernel_engaged(16)
    m = LSTM(16, layers=2)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    want = m.apply(v, x, train=True)   # scan
    got = m.apply(v, x, train=False)   # pallas (interpret on CPU)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_blstm_chunked_pallas_matches_scan():
    """Through the 200-step overlap chunking + skip connection."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(0.2 * rng.standard_normal((2, 311, 8)).astype(np.float32))
    m = BLSTM(8, layers=2, max_steps=100, skip=True)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    want = m.apply(v, x, train=True)
    got = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_lstm_pallas_batch_padding():
    """Batch not a multiple of the lane block (pad lanes are inert)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(0.3 * rng.standard_normal((3, 21, 6)).astype(np.float32))
    m = LSTM(8, layers=1)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    want = m.apply(v, x, train=True)
    got = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_lstm_odd_hidden_falls_back_to_scan():
    """hidden % 8 != 0 silently uses the scan (no crash, same result)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(0.3 * rng.standard_normal((2, 19, 5)).astype(np.float32))
    m = LSTM(12, layers=1)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    want = m.apply(v, x, train=True)
    got = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_lstm_wide_hidden_per_direction_path():
    """2H > 128 uses per-direction dots instead of the block-diagonal."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(0.2 * rng.standard_normal((2, 29, 14)).astype(np.float32))
    m = LSTM(72, layers=1)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    want = m.apply(v, x, train=True)
    got = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_lstm_time_scan_equalized_blocks():
    """b just above a block_b multiple: blocks are equalized (padding
    bounded at one lane-round per block, not a full extra block) and the
    result matches a single-block run."""
    from aero_tpu.ops.lstm import lstm_time_scan, pack_weights

    rng = np.random.default_rng(3)
    hidden, t, b = 8, 5, 520
    xp = jnp.asarray(0.2 * rng.standard_normal(
        (t, 8 * hidden, b)).astype(np.float32))
    w_f = 0.2 * rng.standard_normal((hidden, 4 * hidden)).astype(np.float32)
    w_b = 0.2 * rng.standard_normal((hidden, 4 * hidden)).astype(np.float32)
    w = pack_weights(jnp.asarray(w_f), jnp.asarray(w_b), hidden)

    one_block = lstm_time_scan(xp, w, hidden, block_b=4096)
    multi = lstm_time_scan(xp, w, hidden, block_b=512)  # 2 blocks of 384
    np.testing.assert_allclose(np.asarray(multi), np.asarray(one_block),
                               atol=1e-6)
