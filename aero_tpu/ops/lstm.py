"""Fused Pallas LSTM time-recursion for TPU (inference path, opt-in).

The BLSTM inside AERO's DConv branch (reference src/models/modules.py:
17-65) runs 200-step scans after overlap chunking. This kernel runs the
whole recursion inside ONE pallas_call: recurrent weights and the h/c
state live in VMEM scratch across the sequential time grid, per-step
input projections stream in through the pallas pipeline.

Layout: gates are lane-BLOCKED — each of (i, f, g, o) occupies its own
128-lane block, so gate splits are lane-aligned for any hidden size.
The input projection x @ W_ih + b (the parallelizable part) stays
outside as one big XLA GEMM that writes directly into the blocked
layout.

**Status: measured SLOWER than the XLA scan at the model's shapes and
therefore OFF by default** (enable with AERO_LSTM_KERNEL=1). End-to-end
A/B on v5e, bf16 batch-16 10 s inference, two stable repeats each:
scan 483.9x / 483.3x realtime vs kernel 421.7x / 421.2x. Cause: the
lane-blocked gate layout streams a [D, T, B, 4*128] input-projection
tensor from HBM — 10.7x the packed [D, B, T, 4H] the scan reads at
H=12, 2.7x at H=48. A transposed layout (B on lanes, gates on
sublanes) would fix the blow-up; not yet implemented because the scan
is already within ~13% of the kernel's best case here.

Used for the no-gradient path only; training keeps the differentiable
scan in models/modules.py (identical math, checked against it in
tests/test_lstm_kernel.py, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref, *, hidden: int):
    """Grid (D, n_bb, T); one step of the recursion per invocation.

    xp_ref:  [1, 1, BB, 4*LANE]   this step's input projection (+bias)
    whh_ref: [1, LANE, 4*LANE]    recurrent weights, gate-blocked lanes
    out_ref: [1, 1, BB, LANE]     h_t output
    h_ref:   [BB, LANE] (dtype)   hidden state, persists across t
    c_ref:   [BB, LANE] (f32)     cell state, persists across t
    """
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        h_ref[:, :] = jnp.zeros_like(h_ref)
        c_ref[:, :] = jnp.zeros_like(c_ref)

    h = h_ref[:, :]
    gates = xp_ref[0, 0, :, :].astype(jnp.float32) + jax.lax.dot_general(
        h, whh_ref[0, :, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, 0 * _LANE:1 * _LANE])
    f = jax.nn.sigmoid(gates[:, 1 * _LANE:2 * _LANE])
    g = jnp.tanh(gates[:, 2 * _LANE:3 * _LANE])
    o = jax.nn.sigmoid(gates[:, 3 * _LANE:4 * _LANE])
    c = f * c_ref[:, :] + i * g
    h_new = (o * jnp.tanh(c)).astype(h_ref.dtype)
    c_ref[:, :] = c
    h_ref[:, :] = h_new
    out_ref[0, 0, :, :] = h_new


def lstm_time_scan(xp, w_hh, hidden: int, block_b: int = 512):
    """Run the LSTM recursion over time for both directions.

    xp:   [D, T, B, 4*LANE] input projections + bias, gate-blocked lanes
          (gate k in lanes [k*128, k*128+hidden)); D = num directions.
    w_hh: [D, LANE, 4*LANE] recurrent weights, rows = h lanes (first
          ``hidden`` rows real, rest zero), gate-blocked columns.
    Returns h sequence [D, T, B, LANE] (first ``hidden`` lanes real).
    """
    d, t, b, gl = xp.shape
    assert gl == 4 * _LANE
    bb = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, bb)
    if b_pad != b:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, b_pad - b), (0, 0)))

    kernel = functools.partial(_kernel, hidden=hidden)
    out = pl.pallas_call(
        kernel,
        grid=(d, b_pad // bb, t),
        in_specs=[
            pl.BlockSpec((1, 1, bb, 4 * _LANE), lambda di, i, ti: (di, ti, i, 0)),
            pl.BlockSpec((1, _LANE, 4 * _LANE), lambda di, i, ti: (di, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bb, _LANE),
                               lambda di, i, ti: (di, ti, i, 0)),
        out_shape=jax.ShapeDtypeStruct((d, t, b_pad, _LANE), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, _LANE), xp.dtype),
            pltpu.VMEM((bb, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(xp, w_hh)
    return out[:, :, :b, :]


def pack_gate_blocked(w, hidden: int):
    """[in, 4H] torch-gate-ordered weights -> [in, 4*LANE] gate-blocked."""
    w = np.asarray(w) if isinstance(w, np.ndarray) else w
    in_dim = w.shape[0]
    out = jnp.zeros((in_dim, 4 * _LANE), w.dtype)
    for k in range(4):
        out = out.at[:, k * _LANE:k * _LANE + hidden].set(
            w[:, k * hidden:(k + 1) * hidden])
    return out


def pallas_available() -> bool:
    import os

    if not _HAS_PALLAS:
        return False
    if _INTERPRET:  # test mode: parity-check the kernel on CPU
        return True
    if os.environ.get("AERO_LSTM_KERNEL", "0") != "1":  # opt-in (see above)
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")
