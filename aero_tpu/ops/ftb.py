"""Fused FTB tail (attention-multiply -> channel mix -> freq mix ->
residual channel mix -> bias -> ReLU) as one Pallas kernel.

The FTB block (reference src/models/modules.py:279-325) ends with:

    att = h[:, None] * x                  # [B, F, T, C], h is [B, T, C]
    m   = einsum(att, Ka)                 # 1x1 channel mix (conv2 att half)
    m   = einsum(W_freq, m)               # Linear over the F axis
    out = relu(m + einsum(x, Kb) + b2)    # conv2 x half + bias (+ BN fold)

Composed as XLA ops this reads the [B, F, T, C] activation from HBM
4-5 times (~12 ms at enc0's F=256 shapes). The kernel streams x ONCE
per block, keeps att/m in VMEM, and does the F-mix as a single
[F, F] @ [F, Tb*C] MXU dot.

Inference path only (BatchNorm folded into Ka/Kb/b2 by the caller);
training keeps the composed XLA graph. Parity-tested in interpret mode
(tests/test_ftb_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INTERPRET = False

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(x_ref, h_ref, ka_ref, kb_ref, w_ref, b2_ref, o_ref):
    """Grid (B, T/Tb). x_ref [1, F, Tb, C]; h_ref [1, Tb, C];
    ka/kb [C, C]; w [F, F]; b2 [1, C]; o_ref [1, F, Tb, C]."""
    f, tb, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]

    x = x_ref[0, :, :, :]                      # [F, Tb, C]
    h = h_ref[0, :, :]                         # [Tb, C]
    att = x * h[None, :, :]

    rows = att.reshape(f * tb, c)
    m1 = jax.lax.dot_general(rows, ka_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    m1 = m1.astype(x.dtype).reshape(f, tb * c)
    m2 = jax.lax.dot_general(w_ref[:, :], m1, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    m2 = m2.reshape(f * tb, c)

    xk = jax.lax.dot_general(x.reshape(f * tb, c), kb_ref[:, :],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    out = jax.nn.relu(m2 + xk + b2_ref[0, :].astype(jnp.float32)[None, :])
    o_ref[0, :, :, :] = out.astype(o_ref.dtype).reshape(f, tb, c)


def ftb_tail(x, h, ka, kb, w_freq, b2, block_t: int = 64):
    """x [B, F, T, C]; h [B, T, C]; ka/kb [C, C]; w_freq [F_out==F, F];
    b2 [C]. Returns relu(w_freq @ (h*x) @ ka + x @ kb + b2), [B, F, T, C].
    """
    b, f, t, c = x.shape
    cd = x.dtype
    t_pad = _round_up(t, block_t)
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        h = jnp.pad(h, ((0, 0), (0, t_pad - t), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(b, t_pad // block_t),
        in_specs=[
            pl.BlockSpec((1, f, block_t, c), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, block_t, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((f, f), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, block_t, c), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, f, t_pad, c), cd),
        interpret=_INTERPRET,
    )(x, h.astype(cd), ka.astype(cd), kb.astype(cd), w_freq.astype(cd),
      b2.reshape(1, -1))
    return out[:, :, :t, :]


def pallas_available() -> bool:
    import os

    if not _HAS_PALLAS:
        return False
    if _INTERPRET:
        return True
    if os.environ.get("AERO_FTB_KERNEL", "1") == "0":
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")
