"""Experimental local-attention kernel variants, measured on TPU.

Variants over the resident kernel (ops/attention.py:_pallas_kernel_resident):
  base   : current production kernel
  mixed  : f32 index/penalty math, bf16 exp+matmul path, additive pad mask
  exp2   : mixed + q/w pre-scaled by log2(e) outside, jnp.exp2 inside
  nomax  : exp2 without the max subtraction (sum still f32)

Usage: python tools/attn_variants.py [rows=128] [t=2501] [ch=12]
"""

from __future__ import annotations

import functools
import math
import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from aero_tpu.ops import attention as A  # noqa: E402

sys.path.insert(0, "tools")
from profile_layers import timed  # noqa: E402

LOG2E = math.log2(math.e)


def _kernel_v(q_ref, k_ref, v_ref, w_ref, o_ref, *, block_q, t_real,
              exp2: bool, use_max: bool, bf16_exp: bool):
    t_pad, c = q_ref.shape[1], q_ref.shape[2]
    n_qb = t_pad // block_q

    k = k_ref[0, :, :]
    v = v_ref[0, :, :]
    t_idx = jax.lax.broadcasted_iota(
        jnp.int32, (1, t_pad), 1).astype(jnp.float32)
    pad_add = jnp.where(t_idx < t_real, 0.0, -jnp.inf)

    def body(j, _):
        q_blk = q_ref[0, pl.ds(j * block_q, block_q), :]
        w_blk = w_ref[0, pl.ds(j * block_q, block_q), :]
        s_idx = (jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                 + j * block_q).astype(jnp.float32)
        s = jax.lax.dot_general(q_blk, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        delta = jnp.abs(s_idx - t_idx)
        s = s - w_blk * delta + pad_add
        s = jnp.where(delta == 0.0, -jnp.inf, s)
        eexp = jnp.exp2 if exp2 else jnp.exp
        if use_max:
            m = jnp.max(s, axis=1, keepdims=True)
            z = s - m
        else:
            z = s
        if bf16_exp:
            p = eexp(z.astype(jnp.bfloat16))
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        else:
            p = eexp(z)
            l = jnp.sum(p, axis=1, keepdims=True)
            p = p.astype(v.dtype)
        out = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(j * block_q, block_q), :] = (
            out / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_qb, body, 0)


def run_variant(q, k, v, w, kernel_fn, block_q=256, exp2=False):
    b, t, h, c = q.shape
    if exp2:
        q = q * jnp.asarray(LOG2E, q.dtype)
        w = w * jnp.asarray(LOG2E, w.dtype)
    t_q = A._round_up(t, 256)
    c_pad = 128

    def fold(x):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, t, c)
        return jnp.pad(x, ((0, 0), (0, t_q - t), (0, c_pad - c)))

    qf, kf, vf = fold(q), fold(k), fold(v)
    wf = jnp.moveaxis(w, 2, 1).reshape(b * h, t, 1)
    wf = jnp.pad(wf, ((0, 0), (0, t_q - t), (0, 0)))
    kern = functools.partial(kernel_fn, block_q=block_q, t_real=t)
    out = pl.pallas_call(
        kern,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, t_q, c_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t_q, c_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t_q, c_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t_q, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_q, c_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t_q, c_pad), q.dtype),
    )(qf, kf, vf, wf)
    out = out[:, :t, :c].reshape(b, h, t, c)
    return jnp.moveaxis(out, 1, 2)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    rows = int(kv.get("rows", 128))
    t = int(kv.get("t", 2501))
    heads = int(kv.get("heads", 4))
    ch = int(kv.get("ch", 12))

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(0.3 * rng.standard_normal(shape), jnp.bfloat16)

    q = mk((rows, t, heads, ch))
    k = mk((rows, t, heads, ch))
    v = mk((rows, t, heads, ch))
    w = jnp.abs(mk((rows, t, heads))) * 0.1

    print(f"shapes: rows={rows} t={t} heads={heads} ch={ch}")
    base = timed(jax.jit(lambda *a: A.pallas_attention(*a)), q, k, v, w)
    print(f"  base                 {base:8.2f} ms")

    # error check on a 2-row slice (dense f32 reference is O(T^2) memory)
    sl = (slice(0, 2),)
    ref = np.asarray(A.reference_attention(
        *(x[sl].astype(jnp.float32) for x in (q, k, v, w)))).astype(
        np.float32)

    variants = [
        ("mixed", dict(exp2=False, use_max=True, bf16_exp=True)),
        ("exp2", dict(exp2=True, use_max=True, bf16_exp=True)),
        ("exp2 f32exp", dict(exp2=True, use_max=True, bf16_exp=False)),
        ("exp2 nomax", dict(exp2=True, use_max=False, bf16_exp=True)),
    ]
    # rank-1 variant (defined below)
    fn_r1 = jax.jit(functools.partial(run_rank1, interpret=False))
    try:
        out = np.asarray(fn_r1(q[sl], k[sl], v[sl], w[sl])).astype(np.float32)
        scale = np.maximum(np.abs(ref), 1e-3)
        err = np.max(np.abs(out - ref) / scale)
        ms = timed(fn_r1, q, k, v, w)
        print(f"  {'rank1':20s} {ms:8.2f} ms   max-rel-err vs f32 ref {err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"  rank1 FAILED: {type(e).__name__}: {e}")

    for name, kwargs in variants:
        kern = functools.partial(_kernel_v, **kwargs)
        fn = jax.jit(functools.partial(run_variant, kernel_fn=kern,
                                       exp2=kwargs["exp2"]))
        try:
            out = np.asarray(
                fn(q[sl], k[sl], v[sl], w[sl])).astype(np.float32)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:20s} FAILED: {type(e).__name__}: {e}")
            continue
        scale = np.maximum(np.abs(ref), 1e-3)
        err = np.max(np.abs(out - ref) / scale)
        ms = timed(fn, q, k, v, w)
        print(f"  {name:20s} {ms:8.2f} ms   max-rel-err vs f32 ref {err:.2e}")




# ---------------------------------------------------------------------------
# rank-1 variant: decay penalty + pad mask folded into the score matmul.
#
# For w >= 0:  qk - w|s-t|  =  min(qk - w(s-t), qk + w(s-t)),
# and each branch is rank-1 in (t, s):
#   left  = qk + w_s*t - w_s*s     right = qk - w_s*t + w_s*s
# Index channels are bf16-exact via a hi/lo split (t = 256*t_hi + t_lo,
# both < 256 => exact in bf16); the per-query constant w_s*s is applied
# as a row broadcast in f32 (bf16 product would cost up to +-5 in score
# units).  Pad kill rides a 0/1 key channel times -BIG.  The diagonal is
# removed post-softmax by a rank-1 correction instead of a T^2 mask.
# exp2 prescaling (log2 e) is folded into q/w outside the kernel.
# ---------------------------------------------------------------------------


def _kernel_rank1(q2_ref, k_ref, v_ref, a_ref, o_ref, *, block_q, t_real):
    """q2_ref: [1, 2*T_pad, C] stacked (left | right) aug queries;
    k_ref: [1, T_pad, C] aug keys; v_ref: [1, T_pad, C];
    a_ref: [1, T_pad, 1] per-query constant w_s*s (log2 units, f32-ish).
    """
    t_pad, c = k_ref.shape[1], k_ref.shape[2]
    n_qb = t_pad // block_q

    k = k_ref[0, :, :]
    v = v_ref[0, :, :]

    def body(j, _):
        ql = q2_ref[0, pl.ds(j * block_q, block_q), :]
        qr = q2_ref[0, pl.ds(t_pad + j * block_q, block_q), :]
        a_blk = a_ref[0, pl.ds(j * block_q, block_q), :]  # [BQ, 1]
        sl = jax.lax.dot_general(ql, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sr = jax.lax.dot_general(qr, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s = jnp.minimum(sl - a_blk, sr + a_blk)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2((s - m).astype(jnp.bfloat16))
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        acc = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        # rank-1 diagonal removal: s_ss = rowdot(ql, k_rows_at_block) - a
        k_blk = k_ref[0, pl.ds(j * block_q, block_q), :]
        v_blk = v_ref[0, pl.ds(j * block_q, block_q), :]
        s_ss = jnp.sum((ql * k_blk).astype(jnp.float32), axis=1,
                       keepdims=True) - a_blk
        p_ss = jnp.exp2((s_ss - m).astype(jnp.float32))
        l = l - p_ss
        acc = acc - p_ss * v_blk.astype(jnp.float32)
        o_ref[0, pl.ds(j * block_q, block_q), :] = (
            acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_qb, body, 0)


def run_rank1(q, k, v, w, block_q=256, interpret=False):
    b, t, h, c = q.shape
    assert c + 6 <= 128
    t_pad = A._round_up(t, max(block_q, 256))
    c_pad = 128
    cd = q.dtype
    big = jnp.asarray(1e9, jnp.float32)

    ln2 = jnp.asarray(LOG2E, jnp.float32)
    qs = (q.astype(jnp.float32) * ln2).astype(cd)
    ws = w.astype(jnp.float32) * ln2  # [B, T, H] f32, >= 0

    idx = jnp.arange(t_pad, dtype=jnp.float32)
    t_hi = jnp.floor(idx / 256.0)
    t_lo = idx - 256.0 * t_hi
    pad_ch = (idx >= t).astype(jnp.float32)

    def fold(x):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, t, c)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, c_pad - c)))

    kf = fold(k)
    vf = fold(v)
    # key aug channels: t_lo, t_hi*256 (twice: for w_hi and w_lo), 1,
    # pad flag
    ch = jnp.stack([t_lo, t_hi * 256.0, jnp.ones_like(idx), pad_ch,
                    t_lo, t_hi * 256.0], axis=-1).astype(cd)  # [T_pad, 6]
    kf = kf.at[:, :, c:c + 6].set(ch[None])

    wsf = jnp.moveaxis(ws, 2, 1).reshape(b * h, t)
    wsf = jnp.pad(wsf, ((0, 0), (0, t_pad - t)))
    qf = fold(qs)
    # left: + w_s * t  => channels against (t_lo, t_hi*256), with w split
    # into hi+lo bf16 parts so the penalty keeps ~f32 precision; the row
    # constant w_s*s uses the SAME split sum so w*(t-s) is exact in the
    # f32 accumulator.
    w_hi = wsf.astype(cd)
    w_lo = (wsf - w_hi.astype(jnp.float32)).astype(cd)
    w_eff = w_hi.astype(jnp.float32) + w_lo.astype(jnp.float32)

    def aug(sign):
        qa = qf.at[:, :, c].set(sign * w_hi).at[:, :, c + 1].set(
            sign * w_hi)
        qa = qa.at[:, :, c + 4].set(sign * w_lo).at[:, :, c + 5].set(
            sign * w_lo)
        return qa.at[:, :, c + 3].set(jnp.asarray(-big, cd))

    q2 = jnp.concatenate([aug(1.0), aug(-1.0)], axis=1)  # [BH, 2*T_pad, C]

    a_const = (w_eff * jnp.arange(t_pad, dtype=jnp.float32)[None])[
        ..., None]  # [BH, T_pad, 1]

    kern = functools.partial(_kernel_rank1, block_q=block_q, t_real=t)
    out = pl.pallas_call(
        kern,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, 2 * t_pad, c_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t_pad, c_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t_pad, c_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t_pad, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_pad, c_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, c_pad), q.dtype),
        interpret=interpret,
    )(q2, kf, vf, a_const)
    out = out[:, :t, :c].reshape(b, h, t, c)
    return jnp.moveaxis(out, 1, 2)


if __name__ == "__main__":
    main()


def _kernel_dotonly(q_ref, k_ref, v_ref, w_ref, o_ref, *, block_q, t_real,
                    with_exp=False):
    """Diagnostic: just the two matmuls (+optionally exp), no penalties/
    masks/reductions — isolates MXU+pipeline cost from elementwise."""
    t_pad, c = q_ref.shape[1], q_ref.shape[2]
    n_qb = t_pad // block_q
    k = k_ref[0, :, :]
    v = v_ref[0, :, :]

    def body(j, _):
        q_blk = q_ref[0, pl.ds(j * block_q, block_q), :]
        s = jax.lax.dot_general(q_blk, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if with_exp:
            s = jnp.exp(s - 1.0)
        p = s.astype(v.dtype)
        out = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(j * block_q, block_q), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_qb, body, 0)
