"""Fused FTB tail as one XLA freq-mix einsum + one Pallas kernel.

The FTB block (reference src/models/modules.py:279-325) ends with:

    att = h[:, None] * x                  # [B, F, T, C], h is [B, T, C]
    m   = einsum(att, Ka)                 # 1x1 channel mix (conv2 att half)
    m   = einsum(W_freq, m)               # Linear over the F axis
    out = relu(m + einsum(x, Kb) + b2)    # conv2 x half + bias (+ BN fold)

Composed as XLA ops this makes 6-7 HBM passes over the [B, F, T, C]
activation. Here the freq mix runs FIRST (it commutes with the
pointwise-in-F ops: W @ ((h*x) @ Ka) == ((h * (W @ x)) @ Ka)) as one
clean MXU einsum, and a Pallas kernel fuses the rest — h-multiply,
both channel mixes, BN-folded bias, ReLU — into a single pass over
(y, x): 5 total HBM passes.

Inference path only (BatchNorm folded into Ka/Kb/b2 by the caller);
training keeps the composed XLA graph. Parity-tested in interpret mode
(tests/test_ftb_kernel.py) and on-chip (tools/pallas_tpu_parity.py).

SETTLED PERF NEGATIVE (r5): with the F-grid below the kernel compiles
at every encoder shape, but the latency-compensated on-chip A/B
(/tmp ftb_probe, recorded in PERF.md "FTB tail is at its floor") puts
the bare composed tail at 5.7 ms (enc0) — already AT the 5-HBM-pass
traffic roofline — while this kernel measures 51 ms (tiny-K/N MXU
fragmentation + 2560-cell grid overhead) and the commuted composed
form ties. Kept OPT-IN (AERO_FTB_KERNEL=1), parity-tested, claiming no
perf credit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aero_tpu.ops.util import round_up

_INTERPRET = False

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _kernel(y_ref, x_ref, h_ref, ka_ref, kb_ref, b2_ref, o_ref):
    """Grid (B, T/Tb). y_ref/x_ref [1, F, Tb, C] (y = W_freq @ x computed
    by one XLA einsum outside); h_ref [1, Tb, C]; ka/kb [C, C];
    b2 [1, C]; o_ref [1, F, Tb, C].

    Only leading-dim merges ([F, Tb, C] -> [F*Tb, C]) are used — Mosaic
    rejects lane-merge reshapes ([F, Tb, C] -> [F, Tb*C]) and 3-D-rhs
    dots (same reshape generated internally), which killed two earlier
    formulations that fused the freq mix in-kernel.
    """
    f, tb, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]

    y = y_ref[0, :, :, :]                      # [F, Tb, C] freq-mixed
    x = x_ref[0, :, :, :]
    h = h_ref[0, :, :]                         # [Tb, C]

    att = (y * h[None, :, :]).reshape(f * tb, c)
    m2 = jax.lax.dot_general(att, ka_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    xk = jax.lax.dot_general(x.reshape(f * tb, c), kb_ref[:, :],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    out = jax.nn.relu(m2 + xk + b2_ref[0, :].astype(jnp.float32)[None, :])
    o_ref[0, :, :, :] = out.astype(o_ref.dtype).reshape(f, tb, c)


def ftb_tail(x, h, ka, kb, w_freq, b2, block_t: int = 64,
             block_f: int = 64):
    """x [B, F, T, C]; h [B, T, C]; ka/kb [C, C]; w_freq [F_out==F, F];
    b2 [C]. Returns relu(w_freq @ (h*x) @ ka + x @ kb + b2), [B, F, T, C].

    The F axis is gridded in ``block_f`` rows (r5): Mosaic accepted the
    whole-F block at enc1 (F=64) but rejected enc0's F=256 ("unsupported
    shape cast" on the [F*Tb, C] leading merge); since the freq mix runs
    OUTSIDE the kernel, F blocks are independent, so gridding F reuses
    exactly the proven F=64 block shape at every layer.
    """
    b, f, t, c = x.shape
    cd = x.dtype
    t_pad = round_up(t, block_t)
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        h = jnp.pad(h, ((0, 0), (0, t_pad - t), (0, 0)))
    bf = min(block_f, f)
    f_pad = round_up(f, bf)
    if f_pad != f:
        x = jnp.pad(x, ((0, 0), (0, f_pad - f), (0, 0), (0, 0)))

    # freq mix as one XLA einsum (reads x once); the kernel fuses the
    # h-multiply + both channel mixes + bias + ReLU (commuted form:
    # W @ ((h*x) @ Ka) == ((h * (W @ x)) @ Ka), since the freq mix is
    # linear in F and the rest is pointwise in F).
    y = jnp.einsum("gf,bftc->bgtc", w_freq.astype(cd), x[:, :f, :, :])
    if f_pad != f:
        y = jnp.pad(y, ((0, 0), (0, f_pad - f), (0, 0), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(b, f_pad // bf, t_pad // block_t),
        in_specs=[
            pl.BlockSpec((1, bf, block_t, c), lambda i, j, k: (i, j, k, 0)),
            pl.BlockSpec((1, bf, block_t, c), lambda i, j, k: (i, j, k, 0)),
            pl.BlockSpec((1, block_t, c), lambda i, j, k: (i, k, 0)),
            pl.BlockSpec((c, c), lambda i, j, k: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j, k: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bf, block_t, c),
                               lambda i, j, k: (i, j, k, 0)),
        out_shape=jax.ShapeDtypeStruct((b, f_pad, t_pad, c), cd),
        interpret=_INTERPRET,
    )(y, x, h.astype(cd), ka.astype(cd), kb.astype(cd), b2.reshape(1, -1))
    return out[:, :f, :t, :]


def pallas_available() -> bool:
    import os

    from aero_tpu.ops.util import pallas_platform_ok

    if _INTERPRET and _HAS_PALLAS:
        return True
    # Opt-in until a Mosaic-compilable formulation lands: both the
    # lane-merge reshape ([F,Tb,C] -> [F,Tb*C]) and the 3-D-rhs dot
    # (which lowers to the same reshape internally) are rejected by
    # Mosaic on real TPU ("unsupported shape cast").
    if os.environ.get("AERO_FTB_KERNEL", "0") != "1":
        return False
    return pallas_platform_ok(_HAS_PALLAS, _INTERPRET)
