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

Training uses a ``custom_vjp``: the backward is a flash-style Pallas
kernel as well (recompute-p over query blocks, dk/dv accumulated in
VMEM) so train-time peak memory is O(T*C) like the forward. Beyond the
kernels' VMEM limits (``MAX_PALLAS_T`` forward, 2048 backward) both
directions fall back to ``blockwise_attention`` — a checkpointed
query-block scan whose forward AND vjp stay O(T * block) — never to a
dense T x T graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aero_tpu.ops.util import round_up

_INTERPRET = False  # flipped by tests on CPU

# Both Pallas forward variants stage full [T_pad, 128] K/V rows in VMEM
# (the gridded path's block_k only tiles the score loop, NOT the K/V
# staging) — ~1 MB per 2048 rows f32, x2 for K+V, x2 double-buffering.
# 4096 keeps the staging under ~4 MB of the ~16 MB VMEM.
MAX_PALLAS_T = 4096


def reference_attention(q, k, content, decay_w):
    """Dense JAX reference. q pre-scaled by 1/sqrt(C').

    q/k/content: [B, T, H, C']; decay_w: [B, T, H] (per query).
    Returns [B, T, H, C']. Scores/softmax in f32 (parity with the
    kernels and ``_attend_block`` under bfloat16 compute).
    """
    b, t, h, c = q.shape
    scores = jnp.einsum("bthc,bshc->bhts", k, q,
                        preferred_element_type=jnp.float32)
    idx = jnp.arange(t, dtype=scores.dtype)
    delta = jnp.abs(idx[:, None] - idx[None, :])  # [t, s]
    scores = scores - delta[None, None] * (
        decay_w.transpose(0, 2, 1)[:, :, None, :].astype(scores.dtype))
    scores = jnp.where(jnp.eye(t, dtype=bool)[None, None], -100.0, scores)
    weights = jax.nn.softmax(scores, axis=2)
    return jnp.einsum("bhts,bthc->bshc", weights.astype(content.dtype),
                      content)


def blockwise_attention(q, k, content, decay_w, block_q: int = 512):
    """Query-block scan with ``jax.checkpoint`` per block: forward peak
    memory O(B*H*T*block_q) and — because the block scores are
    recomputed in the backward — the SAME bound under autodiff. The
    memory-safe fallback for T beyond the Pallas kernels' VMEM limits.
    """
    b, t, h, c = q.shape
    n_blocks = -(-t // block_q)
    pad = n_blocks * block_q - t
    q_p = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    w_p = jnp.pad(decay_w, ((0, 0), (0, pad), (0, 0)))
    q_blocks = q_p.reshape(b, n_blocks, block_q, h, c).transpose(1, 0, 2, 3, 4)
    w_blocks = w_p.reshape(b, n_blocks, block_q, h).transpose(1, 0, 2, 3)
    s_blocks = jnp.arange(n_blocks * block_q).reshape(n_blocks, block_q)
    t_idx = jnp.arange(t, dtype=jnp.float32)

    @jax.checkpoint
    def block(qb, wb, sb):
        scores = jnp.einsum("bthc,bshc->bhts", k, qb,
                            preferred_element_type=jnp.float32)
        delta = jnp.abs(t_idx[:, None] - sb[None, :].astype(jnp.float32))
        scores = scores - delta[None, None] * (
            wb.transpose(0, 2, 1)[:, :, None, :].astype(scores.dtype))
        self_mask = t_idx[:, None] == sb[None, :].astype(jnp.float32)
        scores = jnp.where(self_mask[None, None], -100.0, scores)
        weights = jax.nn.softmax(scores, axis=2)
        return jnp.einsum("bhts,bthc->bshc", weights.astype(content.dtype),
                          content)

    def body(_, args):
        qb, wb, sb = args
        return None, block(qb, wb, sb)

    _, out = jax.lax.scan(body, None, (q_blocks, w_blocks, s_blocks))
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, n_blocks * block_q, h, c)
    return out[:, :t]


def banded_reference_attention(q, k, content, decay_w, band: int):
    """Dense reference for BANDED local attention: identical to
    ``reference_attention`` except keys with |t - s| > band are excluded
    from the softmax. The approximation the banded kernels compute.
    """
    b, t, h, c = q.shape
    scores = jnp.einsum("bthc,bshc->bhts", k, q,
                        preferred_element_type=jnp.float32)
    idx = jnp.arange(t, dtype=scores.dtype)
    delta = jnp.abs(idx[:, None] - idx[None, :])  # [t, s]
    scores = scores - delta[None, None] * (
        decay_w.transpose(0, 2, 1)[:, :, None, :].astype(scores.dtype))
    scores = jnp.where(jnp.eye(t, dtype=bool)[None, None], -100.0, scores)
    scores = jnp.where(delta[None, None] > band, -jnp.inf, scores)
    weights = jax.nn.softmax(scores, axis=2)
    return jnp.einsum("bhts,bthc->bshc", weights.astype(content.dtype),
                      content)


def banded_blockwise_attention(q, k, content, decay_w, band: int,
                               block_q: int = 256):
    """Banded attention as a checkpointed query-block scan: each query
    block attends only to the static-size key window
    ``[q_lo - band, q_hi + band]`` (clipped), sliced with
    ``lax.dynamic_slice``. Compute AND memory are O(T * (2*band + bq))
    instead of O(T^2); autodiff-safe anywhere (the memory-bounded
    fallback and the backward oracle for the banded Pallas kernel).
    """
    b, t, h, c = q.shape
    win = 2 * band + block_q
    if win >= t:
        # window covers every key: dense banded (still the banded
        # SEMANTICS — must agree with the banded Pallas kernel, it is
        # the custom_vjp backward oracle)
        return banded_reference_attention(q, k, content, decay_w, band)
    n_blocks = -(-t // block_q)
    pad = n_blocks * block_q - t
    q_p = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    w_p = jnp.pad(decay_w, ((0, 0), (0, pad), (0, 0)))
    q_blocks = q_p.reshape(b, n_blocks, block_q, h, c).transpose(1, 0, 2, 3, 4)
    w_blocks = w_p.reshape(b, n_blocks, block_q, h).transpose(1, 0, 2, 3)
    s_blocks = jnp.arange(n_blocks * block_q).reshape(n_blocks, block_q)
    starts = jnp.clip(s_blocks[:, 0] - band, 0, t - win)

    @jax.checkpoint
    def block(qb, wb, sb, start):
        k_win = jax.lax.dynamic_slice(k, (0, start, 0, 0), (b, win, h, c))
        v_win = jax.lax.dynamic_slice(content, (0, start, 0, 0),
                                      (b, win, h, c))
        t_idx = (start + jnp.arange(win)).astype(jnp.float32)  # all real
        scores = jnp.einsum("bthc,bshc->bhts", k_win, qb,
                            preferred_element_type=jnp.float32)
        s_f = sb.astype(jnp.float32)
        delta = jnp.abs(t_idx[:, None] - s_f[None, :])
        scores = scores - delta[None, None] * (
            wb.transpose(0, 2, 1)[:, :, None, :].astype(scores.dtype))
        scores = jnp.where((t_idx[:, None] == s_f[None, :])[None, None],
                           -100.0, scores)
        # band mask on a CLAMPED query index so padded tail queries
        # (s >= t) still see >= 1 finite score (their rows are trimmed,
        # but NaNs would trip debug_nans)
        s_eff = jnp.minimum(s_f, float(t - 1))
        band_ok = jnp.abs(t_idx[:, None] - s_eff[None, :]) <= band
        scores = jnp.where(band_ok[None, None], scores, -jnp.inf)
        weights = jax.nn.softmax(scores, axis=2)
        return jnp.einsum("bhts,bthc->bshc", weights.astype(v_win.dtype),
                          v_win)

    def body(_, args):
        qb, wb, sb, start = args
        return None, block(qb, wb, sb, start)

    _, out = jax.lax.scan(body, None, (q_blocks, w_blocks, s_blocks, starts))
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, n_blocks * block_q, h, c)
    return out[:, :t]


def _pallas_kernel_banded(q_ref, k_ref, v_ref, w_ref, o_ref, *,
                          block_k: int, t_real: int, band: int):
    """Banded variant of ``_pallas_kernel``: one (batch*head,
    query-block) program that visits only the key blocks intersecting
    the band ``|t - s| <= band`` — a STATIC trip count of
    ceil((2*band + bq)/bk) + 1 iterations with the block index clamped
    into range and out-of-band/out-of-range contributions masked to
    -inf. Compute drops from O(T) to O(band) key columns per query.
    """
    _, bq, c = q_ref.shape
    t_pad = k_ref.shape[1]
    n_kb = t_pad // block_k

    q = q_ref[0, :, :]
    w = w_ref[0, :, :]  # [BQ, 1]
    j = pl.program_id(1)
    q_lo = j * bq
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)[:, 0] + q_lo
    # clamp the block's query range into the REAL rows so padded tail
    # queries still get >= 1 finite score (rows trimmed by the caller)
    s_eff = jnp.minimum(s_idx, t_real - 1)
    lo_key = jnp.maximum(jnp.minimum(q_lo, t_real - 1) - band, 0)
    kb_lo = lo_key // block_k
    n_iter = (2 * band + bq) // block_k + 2  # static

    def body(i, carry):
        m_i, l_i, acc = carry
        # clamp for safe addressing; a clamped (duplicate) iteration is
        # fully masked below via `valid`, so it contributes exp(-inf)=0
        valid = kb_lo + i < n_kb
        kb = jnp.minimum(kb_lo + i, n_kb - 1)
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t_idx = (jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                 + kb * block_k)
        delta = jnp.abs(s_idx[:, None] - t_idx).astype(s.dtype)
        s = s - w * delta
        s = jnp.where(s_idx[:, None] == t_idx, -100.0, s)
        in_band = jnp.abs(s_eff[:, None] - t_idx) <= band
        s = jnp.where(valid & in_band & (t_idx < t_real), s, -jnp.inf)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # m_new finite: self block always visited
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), -100.0, jnp.float32)  # finite: exp never NaNs
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, c), jnp.float32)
    _, l_fin, acc_fin = jax.lax.fori_loop(0, n_iter, body, (m0, l0, acc0))
    o_ref[0, :, :] = (acc_fin / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


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


def pallas_attention(q, k, content, decay_w, block_q: int = 128,
                     block_k: int | None = None):
    """Pallas flash local attention. Shapes as reference_attention.
    Requires t <= MAX_PALLAS_T (both variants stage full K/V rows in
    VMEM); ``fused_local_attention`` routes longer T to
    ``blockwise_attention``.

    Block sizes tuned on v5e: a single whole-T key block (K/V resident
    in VMEM, no online-softmax loop carry) is ~20% faster than looped
    512/1024 blocks for T <= ~3k; beyond that the score loop tiles at
    block_k=2048. block_q=128 measured ~10% faster than 256/512 at the
    model's enc2 shapes (T~2.5k, C'=12).
    """
    b, t, h, c = q.shape
    assert t <= MAX_PALLAS_T, (
        f"pallas_attention stages full K/V rows in VMEM; T={t} > "
        f"{MAX_PALLAS_T} must go through blockwise_attention")
    if block_k is None:
        block_k = round_up(t, 256) if t <= 3072 else 2048
    t_q = round_up(t, block_q)
    t_k = round_up(t, block_k)
    # fold (B, H) into rows; pad T and C
    c_pad = max(128, round_up(c, 128))

    def fold(x, t_pad):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, t, c)  # [BH, T, C]
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, c_pad - c)))

    qf = fold(q, t_q)
    kf = fold(k, t_k)
    vf = fold(content, t_k)
    wf = jnp.moveaxis(decay_w, 2, 1).reshape(b * h, t, 1)
    wf = jnp.pad(wf, ((0, 0), (0, t_q - t), (0, 0)))

    # Resident path stages Q+K+V+out whole-T rows in VMEM: 4 buffers x
    # t_q x 128 lanes x itemsize, x2 double-buffering, plus score
    # scratch. At 4-byte dtypes this crosses the 16 MB scoped-VMEM limit
    # at t_pad=2560 (measured: "16.29M > 16.00M" Mosaic stack OOM, found
    # by tools/pallas_tpu_parity.py r4) — the 3072 gate was tuned on
    # bf16. f32 takes the gridded path beyond 2048, which keeps only
    # K/V whole-T resident.
    resident_max = 3072 if q.dtype.itemsize <= 2 else 2048
    if t_k <= resident_max and t_q == t_k:
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


def _pallas_bwd_kernel(q_ref, k_ref, v_ref, w_ref, g_ref, o_ref,
                       dq_ref, dk_ref, dv_ref, dw_ref,
                       dk_acc, dv_acc, *, block_q: int, t_real: int):
    """Flash-style backward, one program per (batch*head) row.

    Math (s = score matrix [T keys, Q queries], p = softmax over keys):
      dv_t   = sum_q p[t,q] g_q
      dp[t,q]= v_t . g_q
      ds[t,q]= p[t,q] (dp[t,q] - D_q),  D_q = o_q . g_q
      ds[q,q]= 0  (the -100 self-mask is a constant, no gradient)
      dq_q   = sum_t ds[t,q] k_t
      dk_t   = sum_q ds[t,q] q_q
      dw_q   = -sum_t ds[t,q] |t - q|

    q/k/v/g/o refs: [1, T_pad, C]; w: [1, T_pad, 1]. p is recomputed per
    query block, so nothing O(T^2) ever leaves VMEM.
    """
    t_pad, c = q_ref.shape[1], q_ref.shape[2]
    n_qb = t_pad // block_q

    k = k_ref[0, :, :]
    v = v_ref[0, :, :]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)  # keys
    key_pad = (t_idx < t_real)  # [T, 1]

    dk_acc[:, :] = jnp.zeros((t_pad, c), jnp.float32)
    dv_acc[:, :] = jnp.zeros((t_pad, c), jnp.float32)

    def body(j, _):
        q_blk = q_ref[0, pl.ds(j * block_q, block_q), :]
        w_blk = w_ref[0, pl.ds(j * block_q, block_q), :]  # [BQ, 1]
        g_blk = g_ref[0, pl.ds(j * block_q, block_q), :]
        o_blk = o_ref[0, pl.ds(j * block_q, block_q), :]
        q_idx = (jax.lax.broadcasted_iota(jnp.int32, (1, block_q), 1)
                 + j * block_q)

        # recompute p for this block: s [T, BQ]
        s = jax.lax.dot_general(k, q_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        delta = jnp.abs(t_idx - q_idx).astype(jnp.float32)  # [T, BQ]
        s = s - jnp.transpose(w_blk).astype(jnp.float32) * delta
        diag = t_idx == q_idx
        s = jnp.where(diag, -100.0, s)
        s = jnp.where(key_pad, s, -jnp.inf)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.maximum(jnp.sum(p, axis=0, keepdims=True), 1e-30)

        dp = jax.lax.dot_general(v, g_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d_q = jnp.sum(o_blk.astype(jnp.float32) * g_blk.astype(jnp.float32),
                      axis=1, keepdims=True)  # [BQ, 1]
        ds = p * (dp - jnp.transpose(d_q))
        ds = jnp.where(diag, 0.0, ds)

        dq_ref[0, pl.ds(j * block_q, block_q), :] = jax.lax.dot_general(
            ds, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dw_ref[0, pl.ds(j * block_q, block_q), :] = (
            -jnp.sum(ds * delta, axis=0)[:, None]).astype(dw_ref.dtype)
        dk_acc[:, :] += jax.lax.dot_general(
            ds, q_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_acc[:, :] += jax.lax.dot_general(
            p, g_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_qb, body, 0)
    dk_ref[0, :, :] = dk_acc[:, :].astype(dk_ref.dtype)
    dv_ref[0, :, :] = dv_acc[:, :].astype(dv_ref.dtype)


def pallas_attention_bwd(q, k, content, decay_w, out, g, block_q: int = 256):
    """Pallas backward. Shapes as reference_attention; returns
    (dq, dk, dcontent, ddecay_w)."""
    b, t, h, c = q.shape
    t_pad = round_up(t, block_q)
    c_pad = max(128, round_up(c, 128))

    def fold(x):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, t, c)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, c_pad - c)))

    qf, kf, vf, gf, of = (fold(x) for x in (q, k, content, g, out))
    wf = jnp.moveaxis(decay_w, 2, 1).reshape(b * h, t, 1)
    wf = jnp.pad(wf, ((0, 0), (0, t_pad - t), (0, 0)))

    kernel = functools.partial(_pallas_bwd_kernel, block_q=block_q, t_real=t)
    row = lambda i: (i, 0, 0)
    spec = pl.BlockSpec((1, t_pad, c_pad), row)
    wspec = pl.BlockSpec((1, t_pad, 1), row)
    dq, dk, dv, dw = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec, spec, spec, wspec, spec, spec],
        out_specs=(spec, spec, spec, wspec),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_pad, c_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, t_pad, c_pad), k.dtype),
            jax.ShapeDtypeStruct((b * h, t_pad, c_pad), content.dtype),
            jax.ShapeDtypeStruct((b * h, t_pad, 1), decay_w.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((t_pad, c_pad), jnp.float32),
                        pltpu.VMEM((t_pad, c_pad), jnp.float32)],
        interpret=_INTERPRET,
    )(qf, kf, vf, wf, gf, of)

    def unfold(x):
        x = x[:, :t, :c].reshape(b, h, t, c)
        return jnp.moveaxis(x, 1, 2)

    dwu = dw[:, :t, 0].reshape(b, h, t)
    return unfold(dq), unfold(dk), unfold(dv), jnp.moveaxis(dwu, 1, 2)


def banded_pallas_attention(q, k, content, decay_w, band: int,
                            block_q: int = 128, block_k: int = 128):
    """Banded Pallas attention. Shapes as ``reference_attention``;
    computes ``banded_reference_attention`` semantics. K/V rows stage
    whole-T in VMEM (same budget as the gridded exact kernel, so
    t <= MAX_PALLAS_T), but the score/AV compute per query block visits
    only ~(2*band + bq)/bk key blocks instead of T/bk — the win, since
    the exact kernel is score-emission bound (PERF.md 'Attention')."""
    b, t, h, c = q.shape
    assert t <= MAX_PALLAS_T, "banded pallas stages whole-T K/V in VMEM"
    t_q = round_up(t, block_q)
    t_k = round_up(max(t, block_k), block_k)
    c_pad = max(128, round_up(c, 128))

    def fold(x, t_pad):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, t, c)  # [BH, T, C]
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, c_pad - c)))

    qf = fold(q, t_q)
    kf = fold(k, t_k)
    vf = fold(content, t_k)
    wf = jnp.moveaxis(decay_w, 2, 1).reshape(b * h, t, 1)
    wf = jnp.pad(wf, ((0, 0), (0, t_q - t), (0, 0)))

    grid = (b * h, t_q // block_q)
    kernel = functools.partial(_pallas_kernel_banded, block_k=block_k,
                               t_real=t, band=band)
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


def _banded_primal(q, k, content, decay_w, band):
    if q.shape[1] <= MAX_PALLAS_T and pallas_available():
        return banded_pallas_attention(q, k, content, decay_w, band)
    return banded_blockwise_attention(q, k, content, decay_w, band)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def banded_local_attention(q, k, content, decay_w, band: int):
    """LocalState attention restricted to the band |t - s| <= band.

    An APPROXIMATION of ``fused_local_attention`` whose error is the
    dropped softmax tail mass — bounded by exp(-w_min * band) via the
    learned decay slopes; measure it for a trained checkpoint with
    ``tools/attn_band_probe.py``. Opt-in via ``AERO_ATTN_BAND`` (see
    ``models.modules.LocalState``). Gradients are exact FOR THE BANDED
    operator (vjp of the checkpointed banded blockwise form), so
    training with a band on is self-consistent.

    MEASURED NEGATIVE RESULT on the r4 125-epoch checkpoint (PERF.md
    'Attention is global'): training drives the decay slopes to ~1e-10
    — the model LEARNS global attention, so banding drops 80-99% of the
    softmax mass at any practical W (probe: out_rel up to 1.4). And at
    the model's T=2501/bf16 geometry W=128 measured SLOWER end-to-end
    (514.8x vs 556.9x realtime, same session): this gridded kernel
    re-stages whole-T K/V per query block where the exact resident
    kernel fetches them once. Keep only for checkpoints whose probe
    shows local attention AND after a fresh speed A/B.
    """
    return _banded_primal(q, k, content, decay_w, band)


def _banded_fwd(q, k, content, decay_w, band):
    return _banded_primal(q, k, content, decay_w, band), (q, k, content,
                                                          decay_w)


def _banded_bwd(band, res, g):
    q, k, content, decay_w = res
    _, vjp = jax.vjp(
        lambda *a: banded_blockwise_attention(*a, band), q, k, content,
        decay_w)
    return vjp(g)


banded_local_attention.defvjp(_banded_fwd, _banded_bwd)


def _fla_primal(q, k, content, decay_w):
    if q.shape[1] <= MAX_PALLAS_T:
        return pallas_attention(q, k, content, decay_w)
    return blockwise_attention(q, k, content, decay_w)


@jax.custom_vjp
def fused_local_attention(q, k, content, decay_w):
    return _fla_primal(q, k, content, decay_w)


def _fla_fwd(q, k, content, decay_w):
    out = _fla_primal(q, k, content, decay_w)
    return out, (q, k, content, decay_w, out)


def _fla_bwd(res, g):
    q, k, content, decay_w, out = res
    t = q.shape[1]
    # VMEM budget: the bwd stages 10 whole-T [t_pad, 128] buffers per
    # grid step (6 inputs, 4 grads; x2 double-buffering) plus 2 f32
    # scratch accumulators. At bf16 that is ~12.6 MB at t_pad=2048; at
    # f32 the same gate measures a Mosaic stack OOM (>16 MB scoped
    # VMEM, found by tools/pallas_tpu_parity.py r4) — 4-byte dtypes cap
    # at 1024 (≈11.5 MB).
    bwd_max = 2048 if q.dtype.itemsize <= 2 else 1024
    if t <= bwd_max:  # resident accumulators fit VMEM
        return pallas_attention_bwd(q, k, content, decay_w, out, g)
    # memory-bounded fallback: checkpointed query-block scan, NOT the
    # dense T x T graph (which materializes [B*H, T, T] activations —
    # tens of GB at eval-length T)
    _, vjp = jax.vjp(blockwise_attention, q, k, content, decay_w)
    return vjp(g)


fused_local_attention.defvjp(_fla_fwd, _fla_bwd)


def pallas_available() -> bool:
    from aero_tpu.ops.util import pallas_platform_ok

    return pallas_platform_ok(_HAS_PALLAS, _INTERPRET)
