"""Fused Pallas LSTM time-recursion for TPU (inference path).

The BLSTM inside AERO's DConv branch (reference src/models/modules.py:
17-65) runs 200-step scans after overlap chunking. Under XLA each scan
step is a separately dispatched tiny matmul + gate math with the h/c
carry bouncing through HBM; this kernel runs the whole recursion inside
ONE pallas_call with the state and recurrent weights resident in VMEM.

Layout (v3): batch rides the 128-lane axis; BOTH directions run in the
same grid step with a block-diagonal recurrent matmul, and gates are
packed [i0 i1 f0 f1 g0 g1 o0 o1] — i.e. gate-major, direction-minor
— so the cell update is four contiguous [2H, B] sublane slices (legal
for H % 8 == 0). One grid step per time step total (vs 2 in the v2
direction-grid layout, vs 400 XLA dispatches for the scan), streaming
the packed [T, 8H, B] input projection.

History: v1 (gate-blocked 128-lane groups) measured ~13% slower than
the XLA scan end-to-end (it streamed 4*128 lanes of input projection
per step regardless of H); v2 (transposed, direction-gridded) measured
~1% faster than the scan (bench 527.6x vs 520.7x).

The input projection x @ W_ih + b (the parallelizable part) stays
outside as one big XLA GEMM.

Used for the no-gradient path only; training keeps the differentiable
scan in models/modules.py (identical math, checked against it in
tests/test_lstm_kernel.py, interpret mode). OPT-IN via
AERO_LSTM_KERNEL=1: the scan measures faster end-to-end (see
pallas_available).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aero_tpu.ops.util import round_up

_INTERPRET = False

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_LANE = 128


def _kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref, *, hidden2: int,
            blockdiag: bool):
    """Grid (n_bb, T); one time step for BOTH directions per invocation.

    xp_ref:  [1, 8H, BB]   this step's input projection (+bias),
                           gate-major/direction-minor packed rows
    whh_ref: [8H, 2H] block-diag recurrent weights (same row order), or
             [2, 4H, H] per-direction when 2H > 128 (the block-diagonal
             zeros would double the MXU K-passes there)
    out_ref: [1, 2H, BB]   h_t output ([0:H] fwd, [H:2H] bwd)
    h_ref:   [2H, BB]      hidden state, persists across t
    c_ref:   [2H, BB] f32  cell state, persists across t
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_ref[:, :] = jnp.zeros_like(h_ref)
        c_ref[:, :] = jnp.zeros_like(c_ref)

    h2 = hidden2
    hd = h2 // 2
    h = h_ref[:, :]
    xp = xp_ref[0, :, :].astype(jnp.float32)
    if blockdiag:
        gates = xp + jax.lax.dot_general(
            whh_ref[:, :], h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[0 * h2:1 * h2, :])
        f = jax.nn.sigmoid(gates[1 * h2:2 * h2, :])
        g = jnp.tanh(gates[2 * h2:3 * h2, :])
        o = jax.nn.sigmoid(gates[3 * h2:4 * h2, :])
    else:
        # per-direction dots on the [H, BB] state slices; gate rows of
        # each dot are torch-ordered [i f g o] x H
        gf = jax.lax.dot_general(
            whh_ref[0, :, :], h[:hd, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gb = jax.lax.dot_general(
            whh_ref[1, :, :], h[hd:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        def packed(k):  # [2H, BB] gate k rows for both directions
            return jnp.concatenate(
                [gf[k * hd:(k + 1) * hd, :], gb[k * hd:(k + 1) * hd, :]],
                axis=0)

        i = jax.nn.sigmoid(xp[0 * h2:1 * h2, :] + packed(0))
        f = jax.nn.sigmoid(xp[1 * h2:2 * h2, :] + packed(1))
        g = jnp.tanh(xp[2 * h2:3 * h2, :] + packed(2))
        o = jax.nn.sigmoid(xp[3 * h2:4 * h2, :] + packed(3))
    c = f * c_ref[:, :] + i * g
    h_new = (o * jnp.tanh(c)).astype(h_ref.dtype)
    c_ref[:, :] = c
    h_ref[:, :] = h_new
    out_ref[0, :, :] = h_new


def pack_weights(w_hh_fwd, w_hh_bwd, hidden: int):
    """[H, 4H] torch-gate-ordered per-direction recurrent weights ->
    the kernel's recurrent operand: [8H, 2H] block-diagonal
    (gate-major/direction-minor rows) when 2H <= 128, else [2, 4H, H]
    per-direction (transposed, gates row-major)."""
    h = hidden
    if 2 * h <= _LANE:
        blocks = []
        for gate in range(4):
            wf = w_hh_fwd[:, gate * h:(gate + 1) * h].T  # [H, H] rows out
            wb = w_hh_bwd[:, gate * h:(gate + 1) * h].T
            z = jnp.zeros_like(wf)
            blocks.append(jnp.concatenate([
                jnp.concatenate([wf, z], axis=1),
                jnp.concatenate([z, wb], axis=1)], axis=0))  # [2H, 2H]
        return jnp.concatenate(blocks, axis=0)               # [8H, 2H]
    return jnp.stack([w_hh_fwd.T, w_hh_bwd.T])               # [2, 4H, H]


def lstm_time_scan(xp, w_hh_packed, hidden: int, block_b: int = 4096):
    """Run the bidirectional LSTM recursion over time.

    xp:          [T, 8H, B] input projections + bias, rows packed
                 gate-major/direction-minor (i_f, i_b, f_f, f_b, ...).
    w_hh_packed: recurrent weights from ``pack_weights`` ([8H, 2H]
                 block-diag for 2H <= 128, else [2, 4H, H] per-dir).
    Returns the h sequence [T, 2H, B] ([: , 0:H] fwd, [:, H:2H] bwd).
    """
    t, gh, b = xp.shape
    assert gh == 8 * hidden and hidden % 8 == 0 and 2 * hidden <= 512
    # equalized lane-aligned blocks: round_up(b, bb) with bb=block_b
    # nearly DOUBLES the work when b is just above a block_b multiple
    # (b=4097 -> pad to 8192); splitting b evenly over ceil(b/block_b)
    # blocks bounds padding at one lane-round per block (4097 -> 4352)
    n_blocks = max(1, -(-b // block_b))
    bb = round_up(-(-b // n_blocks), _LANE)
    b_pad = n_blocks * bb
    if b_pad != b:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, b_pad - b)))

    h2 = 2 * hidden
    blockdiag = w_hh_packed.ndim == 2
    kernel = functools.partial(_kernel, hidden2=h2, blockdiag=blockdiag)
    w_spec = (pl.BlockSpec((gh, h2), lambda i, ti: (0, 0)) if blockdiag
              else pl.BlockSpec((2, 4 * hidden, hidden),
                                lambda i, ti: (0, 0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bb, t),
        in_specs=[
            pl.BlockSpec((1, gh, bb), lambda i, ti: (ti, 0, i)),
            w_spec,
        ],
        out_specs=pl.BlockSpec((1, h2, bb), lambda i, ti: (ti, 0, i)),
        out_shape=jax.ShapeDtypeStruct((t, h2, b_pad), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((h2, bb), xp.dtype),
            pltpu.VMEM((h2, bb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(xp, w_hh_packed)
    return out[:, :, :b]


def pallas_available() -> bool:
    import os

    from aero_tpu.ops.util import pallas_platform_ok

    if _INTERPRET and _HAS_PALLAS:  # test mode: parity-check on CPU
        return True
    # OFF by default: the XLA scan measures FASTER end-to-end than every
    # kernel iteration so far (pipelined bf16 B=16 bench: scan 567.6x vs
    # v3 543.0x vs v2 ~528x≈scan ~525x at the time). The sequential
    # 200-step recursion just isn't the bottleneck XLA-side once the
    # input projection is one big GEMM; kernel kept for future work.
    if os.environ.get("AERO_LSTM_KERNEL", "0") != "1":
        return False
    return pallas_platform_ok(_HAS_PALLAS, _INTERPRET)
