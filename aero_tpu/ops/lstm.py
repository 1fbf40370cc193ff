"""Fused Pallas LSTM time-recursion for TPU (inference path).

The BLSTM inside AERO's DConv branch (reference src/models/modules.py:
17-65) runs 200-step scans after overlap chunking. Under XLA each scan
step is a separately dispatched tiny matmul + gate math with the h/c
carry bouncing through HBM; this kernel runs the whole recursion inside
ONE pallas_call with the state and recurrent weights resident in VMEM.

Layout (v2, "transposed"): batch rides the 128-lane axis and gates ride
sublanes — state is [H, B], the per-step input projection streams as
[4H, B] blocks, and the recurrent matmul is W_hh^T [4H, H] @ h [H, B].
Gate splits are sublane slices at offsets k*H (legal for H % 8 == 0).
A v1 layout with gate-BLOCKED lanes (each gate padded to its own
128-lane block) measured ~13% slower end-to-end than the XLA scan
(bf16 B=16 bench: 421x vs 484x realtime) because it streamed a
[D, T, B, 4*128] input projection — 2.7-10.7x the packed size. This
layout streams the packed [D, T, 4H, B] instead.

The input projection x @ W_ih + b (the parallelizable part) stays
outside as one big XLA GEMM.

Used for the no-gradient path only; training keeps the differentiable
scan in models/modules.py (identical math, checked against it in
tests/test_lstm_kernel.py, interpret mode). Disable with
AERO_LSTM_KERNEL=0 to fall back to the scan everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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

    xp_ref:  [1, 1, 4H, BB]   this step's input projection (+bias)
    whh_ref: [1, 4H, H]       recurrent weights transposed, lanes = H
    out_ref: [1, 1, H, BB]    h_t output
    h_ref:   [H, BB] (dtype)  hidden state, persists across t
    c_ref:   [H, BB] (f32)    cell state, persists across t
    """
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        h_ref[:, :] = jnp.zeros_like(h_ref)
        c_ref[:, :] = jnp.zeros_like(c_ref)

    h = h_ref[:, :]
    gates = xp_ref[0, 0, :, :].astype(jnp.float32) + jax.lax.dot_general(
        whh_ref[0, :, :], h, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[0 * hidden:1 * hidden, :])
    f = jax.nn.sigmoid(gates[1 * hidden:2 * hidden, :])
    g = jnp.tanh(gates[2 * hidden:3 * hidden, :])
    o = jax.nn.sigmoid(gates[3 * hidden:4 * hidden, :])
    c = f * c_ref[:, :] + i * g
    h_new = (o * jnp.tanh(c)).astype(h_ref.dtype)
    c_ref[:, :] = c
    h_ref[:, :] = h_new
    out_ref[0, 0, :, :] = h_new


def lstm_time_scan(xp, w_hh_t, hidden: int, block_b: int = 2048):
    """Run the LSTM recursion over time for both directions.

    xp:     [D, T, 4H, B] input projections + bias; D = num directions.
    w_hh_t: [D, 4H, H] recurrent weights, transposed (out-gates major).
    Returns the h sequence [D, T, H, B].
    """
    d, t, gh, b = xp.shape
    assert gh == 4 * hidden and hidden % 8 == 0 and hidden <= _LANE
    bb = min(block_b, _round_up(b, _LANE))
    b_pad = _round_up(b, bb)
    if b_pad != b:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, b_pad - b)))

    kernel = functools.partial(_kernel, hidden=hidden)
    out = pl.pallas_call(
        kernel,
        grid=(d, b_pad // bb, t),
        in_specs=[
            pl.BlockSpec((1, 1, gh, bb), lambda di, i, ti: (di, ti, 0, i)),
            pl.BlockSpec((1, gh, hidden), lambda di, i, ti: (di, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, hidden, bb),
                               lambda di, i, ti: (di, ti, 0, i)),
        out_shape=jax.ShapeDtypeStruct((d, t, hidden, b_pad), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((hidden, bb), xp.dtype),
            pltpu.VMEM((hidden, bb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(xp, w_hh_t)
    return out[:, :, :, :b]


def pallas_available() -> bool:
    import os

    if not _HAS_PALLAS:
        return False
    if _INTERPRET:  # test mode: parity-check the kernel on CPU
        return True
    if os.environ.get("AERO_LSTM_KERNEL", "1") == "0":
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")
