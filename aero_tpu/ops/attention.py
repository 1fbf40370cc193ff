"""Fused local-state attention (Pallas TPU kernel + JAX fallback).

The AERO DConv branch's `LocalState` attention (reference
src/models/modules.py:94-127) is, per (batch-row, head):

    scores[t, s] = <k_t, q_s> / sqrt(C')  -  w_s * |t - s|
    scores[s, s] = -100                      (self-reference kill)
    out_s        = sum_t softmax_t(scores)[t, s] * content_t

with ``w_s`` a per-query decay scalar (the reference's [ndecay, T, T]
einsum folded analytically — it is rank-1 in (t, s)).

The Pallas kernel computes this flash-attention style: online softmax
over key blocks, never materializing the T x T score matrix in HBM.
Memory traffic drops from O(T^2) to O(T * C'), which is the dominant
HBM cost of the whole model for long inputs.

Training uses a ``custom_vjp`` whose backward differentiates the JAX
reference implementation (one recomputed forward) — exact gradients,
fused forward.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False  # flipped by tests on CPU


def reference_attention(q, k, content, decay_w):
    """Dense JAX reference. q pre-scaled by 1/sqrt(C').

    q/k/content: [B, T, H, C']; decay_w: [B, T, H] (per query).
    Returns [B, T, H, C'].
    """
    b, t, h, c = q.shape
    scores = jnp.einsum("bthc,bshc->bhts", k, q)
    idx = jnp.arange(t, dtype=scores.dtype)
    delta = jnp.abs(idx[:, None] - idx[None, :])  # [t, s]
    scores = scores - delta[None, None] * decay_w.transpose(0, 2, 1)[:, :, None, :]
    scores = jnp.where(jnp.eye(t, dtype=bool)[None, None], -100.0, scores)
    weights = jax.nn.softmax(scores, axis=2)
    return jnp.einsum("bhts,bthc->bshc", weights, content)


def _pallas_kernel(q_ref, k_ref, v_ref, w_ref, o_ref, *, block_k: int,
                   t_real: int):
    """One (batch*head, query-block) program.

    q_ref: [BQ, C], k_ref/v_ref: [T, C], w_ref: [BQ, 1], o_ref: [BQ, C].
    """
    import jax.lax as lax

    _, bq, c = q_ref.shape
    t_pad = k_ref.shape[1]
    n_kb = t_pad // block_k

    q = q_ref[0, :, :]
    w = w_ref[0, :, :]  # [BQ, 1]
    s_idx = (jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)[:, 0]
             + pl.program_id(1) * bq)

    def body(kb, carry):
        m_i, l_i, acc = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        # scores [BQ, BK]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t_idx = (jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                 + kb * block_k)
        delta = jnp.abs(s_idx[:, None] - t_idx).astype(s.dtype)
        s = s - w * delta
        s = jnp.where(s_idx[:, None] == t_idx, -100.0, s)
        # mask padded keys
        s = jnp.where(t_idx < t_real, s, -jnp.inf)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, c), jnp.float32)
    _, l_fin, acc_fin = lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
    o_ref[0, :, :] = (acc_fin / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


try:  # Pallas import is environment-dependent; fall back gracefully.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _pallas_kernel_resident(q_ref, k_ref, v_ref, w_ref, o_ref, *,
                            block_q: int, t_real: int):
    """One program per (batch*head) row with Q/K/V fully VMEM-resident.

    The grid-over-query-blocks variant re-fetches K/V from HBM for every
    query block (~T/block_q redundant reads — the dominant cost at these
    tiny head dims); here K/V stream in once and the query loop runs
    in-kernel. Valid while q+k+v+scores fit VMEM (T up to ~3k).

    q_ref/.../o_ref: [1, T_pad, C]; w_ref: [1, T_pad, 1].
    """
    t_pad, c = q_ref.shape[1], q_ref.shape[2]
    n_qb = t_pad // block_q

    k = k_ref[0, :, :]
    v = v_ref[0, :, :]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1)
    key_pad_mask = t_idx < t_real  # [1, T_pad]

    def body(j, _):
        q_blk = q_ref[0, pl.ds(j * block_q, block_q), :]
        w_blk = w_ref[0, pl.ds(j * block_q, block_q), :]
        s_idx = (jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
                 + j * block_q)
        s = jax.lax.dot_general(q_blk, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        delta = jnp.abs(s_idx[:, None] - t_idx).astype(s.dtype)
        s = s - w_blk.astype(s.dtype) * delta
        s = jnp.where(s_idx[:, None] == t_idx, -100.0, s)
        s = jnp.where(key_pad_mask, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        out = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(j * block_q, block_q), :] = (
            out / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_qb, body, 0)


def _round_up(x, m):
    return -(-x // m) * m


def pallas_attention(q, k, content, decay_w, block_q: int = 256,
                     block_k: int | None = None):
    """Pallas flash local attention. Shapes as reference_attention.

    Block sizes tuned on v5e: a single whole-T key block (K/V resident
    in VMEM, no online-softmax loop carry) is ~20% faster than looped
    512/1024 blocks for T <= ~3k; beyond that cap at 2048 to bound VMEM.
    """
    b, t, h, c = q.shape
    if block_k is None:
        block_k = _round_up(t, 256) if t <= 3072 else 2048
    t_q = _round_up(t, block_q)
    t_k = _round_up(t, block_k)
    # fold (B, H) into rows; pad T and C
    c_pad = max(128, _round_up(c, 128))

    def fold(x, t_pad):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, t, c)  # [BH, T, C]
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, c_pad - c)))

    qf = fold(q, t_q)
    kf = fold(k, t_k)
    vf = fold(content, t_k)
    wf = jnp.moveaxis(decay_w, 2, 1).reshape(b * h, t, 1)
    wf = jnp.pad(wf, ((0, 0), (0, t_q - t), (0, 0)))

    if t_k <= 3072 and t_q == t_k:
        # resident path: K/V (and Q) stream from HBM exactly once
        kernel = functools.partial(_pallas_kernel_resident,
                                   block_q=block_q, t_real=t)
        out = pl.pallas_call(
            kernel,
            grid=(b * h,),
            in_specs=[
                pl.BlockSpec((1, t_q, c_pad), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, t_k, c_pad), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, t_k, c_pad), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, t_q, 1), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, t_q, c_pad), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t_q, c_pad), q.dtype),
            interpret=_INTERPRET,
        )(qf, kf, vf, wf)
        out = out[:, :t, :c].reshape(b, h, t, c)
        return jnp.moveaxis(out, 1, 2)

    grid = (b * h, t_q // block_q)
    kernel = functools.partial(_pallas_kernel, block_k=block_k, t_real=t)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t_k, c_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t_k, c_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, c_pad), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t_q, c_pad), q.dtype),
        interpret=_INTERPRET,
    )(qf, kf, vf, wf)
    out = out[:, :t, :c].reshape(b, h, t, c)
    return jnp.moveaxis(out, 1, 2)


@jax.custom_vjp
def fused_local_attention(q, k, content, decay_w):
    return pallas_attention(q, k, content, decay_w)


def _fla_fwd(q, k, content, decay_w):
    return pallas_attention(q, k, content, decay_w), (q, k, content, decay_w)


def _fla_bwd(res, g):
    # Exact gradients via the JAX reference graph (one recomputed forward).
    _, vjp = jax.vjp(reference_attention, *res)
    return vjp(g)


fused_local_attention.defvjp(_fla_fwd, _fla_bwd)


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon") or _INTERPRET
