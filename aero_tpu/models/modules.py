"""Flax building blocks for the AERO generator family.

Re-designs the reference blocks (``/root/reference/src/models/modules.py``)
TPU-first: channels-last layouts everywhere (time-domain ``[B, T, C]``,
spectral ``[B, F, T, C]``), LSTMs as ``lax.scan`` with the reference's
200-step overlap chunking (which turns the sequential scan into short
fixed-length scans over a larger batch — ideal for XLA), attention and
convolutions expressed as einsums/convs that XLA tiles onto the MXU.

Block-by-block parity targets (reference citations):
- BLSTM:          src/models/modules.py:17-65
- LocalState:     src/models/modules.py:68-127
- LayerScale:     src/models/modules.py:130-141
- DConv:          src/models/modules.py:144-249
- ScaledEmbedding:src/models/modules.py:252-276
- FTB:            src/models/modules.py:279-325
- Snake:          src/models/snake.py:7-67
"""

from __future__ import annotations

import logging
import math
import os
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aero_tpu.models import init as tinit

# Global compute dtype for the hot path (set from config `precision`).
# Parameters are always stored float32; bfloat16 here halves HBM traffic
# for activations and weights in-flight. float32 islands are preserved
# where numerics demand it: STFT/iSTFT, normalization statistics, softmax
# and LSTM cell-state accumulation.
_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype) if dtype is not None else jnp.float32


def compute_dtype():
    return _COMPUTE_DTYPE


def gelu(x):
    """torch.nn.functional.gelu default == exact erf formulation."""
    return jax.nn.gelu(x, approximate=False)


def glu(x, axis=-1):
    """torch F.glu: first half gated by sigmoid of second half."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def leaky_relu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def unfold_time(x, width: int, stride: int):
    """[B, T, C] -> [B, n_frames, width, C] with zero padding so that
    n_frames = ceil(T / stride) (reference unfold, src/utils.py:50-63)."""
    b, t, c = x.shape
    n_frames = math.ceil(t / stride)
    tgt = (n_frames - 1) * stride + width
    x = jnp.pad(x, ((0, 0), (0, tgt - t), (0, 0)))
    frames = [x[:, k * stride:k * stride + width] for k in range(n_frames)]
    return jnp.stack(frames, axis=1)


class _RawConvParams(nn.Module):
    """nn.Conv-compatible kernel [*k, in, out] + bias params, declared
    without applying a conv (so callers can lower to einsums)."""

    kshape: tp.Tuple[int, ...]
    use_bias: bool = True
    kernel_init: tp.Optional[tp.Callable] = None
    bias_init: tp.Optional[tp.Callable] = None

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init or tinit.conv_kernel_init,
                       self.kshape)
        b = None
        if self.use_bias:
            b = self.param("bias",
                           self.bias_init
                           or tinit.conv_bias_init_for(self.kshape),
                           (self.kshape[-1],))
        return k, b


class Conv1d(nn.Module):
    """torch-initialized 1-D conv on [B, T, C].

    1x1 convs are lowered to a plain einsum instead of
    ``conv_general_dilated``: measured on v5e, a conv op in the graph
    poisons XLA's layout assignment for every downstream consumer of
    its output (enc0's composed FTB ran 31.7 ms after an nn.Conv
    pre_conv vs 12.2 ms after the identical einsum). Param layout stays
    nn.Conv-compatible (child ``conv`` with kernel [k, in, out] + bias).
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: tp.Optional[tp.Callable] = None
    bias_init: tp.Optional[tp.Callable] = None

    @nn.compact
    def __call__(self, x):
        kshape = (self.kernel_size, x.shape[-1] // self.groups, self.features)
        if (self.kernel_size == 1 and self.stride == 1 and self.padding == 0
                and self.groups == 1):
            k, b = _RawConvParams(
                kshape, use_bias=self.use_bias,
                kernel_init=self.kernel_init, bias_init=self.bias_init,
                name="conv")()
            cd = compute_dtype()
            y = x.astype(cd) @ k[0].astype(cd)
            return y + b.astype(cd) if b is not None else y
        return nn.Conv(
            self.features,
            (self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=compute_dtype(),
            kernel_init=self.kernel_init or tinit.conv_kernel_init,
            bias_init=self.bias_init or tinit.conv_bias_init_for(kshape),
            name="conv",
        )(x)


class Conv2d(nn.Module):
    """torch-initialized 2-D conv on [B, H, W, C] (here H=freq, W=time).

    Lowered to einsums wherever possible (1x1; freq-axis (k,1) strided
    convs via a block-slice decomposition) — conv ops in the graph
    poison XLA:TPU layout assignment for downstream consumers (see
    Conv1d docstring). Param layout stays nn.Conv-compatible.
    """

    features: int
    kernel_size: tp.Tuple[int, int] = (1, 1)
    stride: tp.Tuple[int, int] = (1, 1)
    padding: tp.Tuple[int, int] = (0, 0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kshape = (*self.kernel_size, x.shape[-1], self.features)
        kh, kw = self.kernel_size
        cd = compute_dtype()

        if self.kernel_size == (1, 1) and self.stride == (1, 1) \
                and self.padding == (0, 0):
            k, b = _RawConvParams(kshape, self.use_bias, name="conv")()
            y = x.astype(cd) @ k[0, 0].astype(cd)
            return y + b.astype(cd) if b is not None else y

        import os

        if (kw == 1 and self.stride[1] == 1 and self.padding[1] == 0
                and kh % self.stride[0] == 0
                and os.environ.get("AERO_FREQCONV", "blocked") == "blocked"):
            k, b = _RawConvParams(kshape, self.use_bias, name="conv")()
            y = _freq_conv_blocked(x.astype(cd), k[:, 0].astype(cd),
                                   self.stride[0], self.padding[0])
            return y + b.astype(cd) if b is not None else y

        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.stride,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            use_bias=self.use_bias,
            dtype=compute_dtype(),
            kernel_init=tinit.conv_kernel_init,
            bias_init=tinit.conv_bias_init_for(kshape),
            name="conv",
        )(x)


def _freq_conv_blocked(x, kernel, stride: int, pad: int):
    """Freq-axis strided conv as slice+einsum (no conv op, no gather).

    x [B, F, T, C]; kernel [k, C, D]; requires k % stride == 0.
    View the padded F axis as blocks of ``stride``; output f0's window
    [s*f0, s*f0 + k) covers k//s whole blocks starting at block f0, so
    the conv is a sum of k//s einsums over contiguous block slices.
    """
    b, f, t, ci = x.shape
    k, s = kernel.shape[0], stride
    f_out = (f + 2 * pad - k) // s + 1
    need = s * (f_out - 1) + k          # padded extent actually touched
    blocks = -(-need // s)
    right = blocks * s - f - pad
    if right >= 0:
        xp = jnp.pad(x, ((0, 0), (pad, right), (0, 0), (0, 0)))
    else:
        # conv discards the last |right| input rows (stride skips them)
        xp = jnp.pad(x[:, :f + right], ((0, 0), (pad, 0), (0, 0), (0, 0)))
    xb = xp.reshape(b, blocks, s, t, ci)
    wk = kernel.reshape(k // s, s, ci, kernel.shape[-1])
    y = None
    for a in range(k // s):
        term = jnp.einsum("bfjtc,jcd->bftd", xb[:, a:a + f_out], wk[a])
        y = term if y is None else y + term
    return y


def _conv_transpose(x, kernel, stride: int, padding: int, axis: int):
    """torch-semantics transposed conv along one spatial axis of
    channels-last input. Output length (L-1)*s + k - 2p.

    ``x``: [..., L, C_in] with the target axis moved to -2.
    ``kernel``: [k, in, out] (flax layout).

    Default lowering is the subpixel (polyphase) decomposition: phase r
    of the output is a plain (k/s)-tap correlation with sub-kernel
    w[s*a + r], so the whole op is k/s slice+matmuls followed by a
    phase-interleaving reshape — exactly the algorithmic FLOPs. The
    lax.conv_general_dilated(lhs_dilation=s) lowering (``AERO_CONVT=xla``
    reverts) makes XLA:TPU materialize the zero-dilated input and spend
    ~s x the MACs on inserted zeros, in forward AND in its transpose
    ops inside grad (measured: see PERF.md, decoder upsample rows).
    """
    k = kernel.shape[0]
    cd = compute_dtype()
    kernel = kernel.astype(cd)
    x = x.astype(cd)
    lead = x.shape[:-2]
    x2 = x.reshape(-1, x.shape[-2], x.shape[-1])
    if stride > 1 and os.environ.get("AERO_CONVT", "subpixel") == "subpixel":
        out = _conv_transpose_subpixel(x2, kernel, stride, padding)
    else:
        out = jax.lax.conv_general_dilated(
            x2,
            jnp.flip(kernel, 0),
            window_strides=(1,),
            padding=[(k - 1 - padding, k - 1 - padding)],
            lhs_dilation=(stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
    return out.reshape(*lead, out.shape[-2], out.shape[-1])


def _conv_transpose_subpixel(x2, kernel, s: int, padding: int,
                             out_len: int | None = None,
                             variant: str = "matmul"):
    """Polyphase transposed conv: no dilated conv op, no zero math.

    Derivation: the full (pad-free) output obeys
    ``y[s*q + r] = sum_a x[q - a] * w[s*a + r]`` (write the transposed
    conv's output index as ``o = s*i + j``, then split ``j = s*a + r``).
    So each output phase r is an A-tap correlation (A = ceil(k/s)) of x
    with the phase's sub-kernel. Two lowerings of that correlation, both
    exactly the algorithmic MACs (= s*Q*A*C*D) and both lhs_dilation-free
    in their own grads:

    - ``variant="matmul"``: A shifted slice+matmuls whose (q, r*D)
      results interleave into y by one row-major reshape. Good when A is
      small (the generator decoders: k=8, s in (2,4) -> A<=4).
    - ``variant="conv"``: ONE plain stride-1 dense conv with kernel
      [A, C, s*D] followed by the same interleave reshape — a single
      well-tiled pass where the matmul form would fragment into A
      slice+GEMMs (the discriminators' k=41/s=4 input-gradient: A=11).

    ``x2``: [N, L, C]; ``kernel``: [k, C, D] un-flipped (torch taps).
    """
    kk, C, D = kernel.shape
    A = -(-kk // s)
    if A * s != kk:  # pad kernel taps to a whole number of phases
        kernel = jnp.pad(kernel, ((0, A * s - kk), (0, 0), (0, 0)))
    n, L, _ = x2.shape
    Q = L + A - 1
    full = s * Q  # == (L-1)*s + A*s
    xp = jnp.pad(x2, ((0, 0), (A - 1, A - 1), (0, 0)))
    # wr[a, c, r*D + d] = kernel[s*a + r, c, d]
    wr = kernel.reshape(A, s, C, D).transpose(0, 2, 1, 3).reshape(A, C, s * D)
    if variant == "conv":
        # y[q] = sum_a xp[q + (A-1-a)] @ wr[a]: a VALID cross-correlation
        # over xp with the tap order flipped.
        y = jax.lax.conv_general_dilated(
            xp, jnp.flip(wr, 0), window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"))  # [N, Q, s*D]
    else:
        y = None
        for a in range(A):
            sl = jax.lax.slice_in_dim(xp, A - 1 - a, A - 1 - a + Q, axis=1)
            term = sl @ wr[a]  # [N, Q, s*D]
            y = term if y is None else y + term
    y = y.reshape(n, full, D)
    # Default: torch output length — trims both the padding and (for
    # k % s != 0) the all-zero tail contributed by the phase-padded
    # kernel taps. Callers that need the grad-of-strided-conv semantics
    # pass out_len=L_input explicitly: the torch trim would DROP input
    # rows the final strided window does touch whenever s does not
    # divide (L + 2p - k).
    if out_len is None:
        out_len = (L - 1) * s + kk - 2 * padding
    end = padding + out_len
    if end > full:  # rows beyond every window's reach: zero
        y = jnp.pad(y, ((0, 0), (0, end - full), (0, 0)))
    return jax.lax.slice_in_dim(y, padding, end, axis=1)


def _strided_conv1d_raw(x, w, stride: int, padding: int):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"))


def strided_conv1d_polygrad(x, w, stride: int, padding: int):
    """Dense stride-s conv1d on [N, L, C] whose INPUT-gradient avoids
    XLA's lhs_dilation lowering.

    Forward is XLA's native strided conv (optimal — window_strides skip
    input, no zero MACs). But autodiff's grad-wrt-input is a transposed
    conv that XLA lowers with ``lhs_dilation == stride``, materializing
    the zero-dilated cotangent and spending ~stride x the algorithmic
    MACs (the same pathology `_conv_transpose_subpixel` removes in
    forward transposed convs). This wrapper keeps XLA's forward and
    weight-gradient (rhs-dilated conv — already zero-free) and computes
    the input-gradient by the polyphase identity
    ``dx = convT(dy, w.swap(in,out))`` via `_conv_transpose_subpixel`,
    zero-padding the tail rows the strided window never touched.

    Variants (AERO_CONVGRAD):

    - ``xla`` (default): plain autodiff, lhs_dilation input-grad.
    - ``poly``: input-grad via `_conv_transpose_subpixel` as A=ceil(k/s)
      slice+matmuls.
    - ``polyconv``: input-grad as ONE dense stride-1 conv with kernel
      [A, C, s*D] + interleave reshape — algorithmic MACs in a single
      well-tiled pass (removes the fragmentation objection).

    SETTLED (tools/convgrad_ab.py, isolated latency-compensated
    melgan-MSD backward on v5e, B=16 T=32000 bf16): xla 15.20 <
    polyconv 16.04 < poly 19.18 ms — XLA's dilated-conv lowering
    already avoids paying for the inserted zeros at this k=41/s=4
    geometry, so the ~4x nominal-MAC saving buys nothing; both variants
    stay opt-in as a documented negative result (PERF.md). Contrast:
    the *forward* subpixel ConvTranspose lowering (AERO_CONVT) is a
    measured back-to-back win at the generator's small-k/s geometry —
    the knobs are independent measurements, not one rule.
    """
    if stride <= 1 or os.environ.get("AERO_CONVGRAD", "xla") not in (
            "poly", "polyconv"):
        return _strided_conv1d_raw(x, w, stride, padding)
    return _polygrad_call(x, w, stride, padding)


def _make_polygrad():
    def fn(stride, padding, x, w):
        return _strided_conv1d_raw(x, w, stride, padding)

    def fwd(stride, padding, x, w):
        return fn(stride, padding, x, w), (x, w)

    def bwd(stride, padding, res, dy):
        x, w = res
        variant = ("conv" if os.environ.get("AERO_CONVGRAD") == "polyconv"
                   else "matmul")
        dx = _conv_transpose_subpixel(dy, jnp.swapaxes(w, 1, 2),
                                      stride, padding,
                                      out_len=x.shape[1], variant=variant)
        # weight grad: XLA's own transpose rule is an rhs-dilated conv
        # (taps spread out, every MAC on real data) — reuse it via
        # linear_transpose, which emits ONLY the transposed conv (a
        # jax.vjp here would leave a dead primal conv in the jaxpr and
        # inflate count_flops' pre-DCE accounting).
        (dw,) = jax.linear_transpose(
            lambda ww: fn(stride, padding, x, ww), w)(dy)
        return dx.astype(x.dtype), dw

    f = jax.custom_vjp(fn, nondiff_argnums=(0, 1))
    f.defvjp(fwd, bwd)
    return lambda x, w, stride, padding: f(stride, padding, x, w)


_polygrad_call = _make_polygrad()


class ConvTranspose1d(nn.Module):
    """torch-initialized transposed 1-D conv on [B, T, C]."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0

    @nn.compact
    def __call__(self, x):
        kshape = (self.kernel_size, x.shape[-1], self.features)
        kernel = self.param("kernel", tinit.conv_transpose_kernel_init, kshape)
        bias = self.param("bias", tinit.conv_transpose_bias_init_for(kshape),
                          (self.features,))
        y = _conv_transpose(x, kernel, self.stride, self.padding, axis=-2)
        if self.output_padding:
            y = jnp.pad(y, ((0, 0), (0, self.output_padding), (0, 0)))
        return y + bias.astype(y.dtype)


class ConvTranspose2dFreq(nn.Module):
    """Transposed conv over the frequency axis of [B, F, T, C] with
    kernel [k, 1] / stride [s, 1] (the only 2-D transpose the model uses,
    src/models/aero.py:172)."""

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        kshape = (self.kernel_size, x.shape[-1], self.features)
        kernel = self.param("kernel", tinit.conv_transpose_kernel_init, kshape)
        bias = self.param("bias", tinit.conv_transpose_bias_init_for(kshape),
                          (self.features,))
        # [B, F, T, C] -> [B, T, F, C] so freq is the conv axis.
        xt = jnp.swapaxes(x, 1, 2)
        y = _conv_transpose(xt, kernel, self.stride, 0, axis=-2)
        y = jnp.swapaxes(y, 1, 2)
        return y + bias.astype(y.dtype)


class ConvTranspose2dTime(nn.Module):
    """Transposed conv over the time axis of [B, F, T, C] (kernel [1, k])."""

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        kshape = (self.kernel_size, x.shape[-1], self.features)
        kernel = self.param("kernel", tinit.conv_transpose_kernel_init, kshape)
        bias = self.param("bias", tinit.conv_transpose_bias_init_for(kshape),
                          (self.features,))
        y = _conv_transpose(x, kernel, self.stride, 0, axis=-2)
        return y + bias.astype(y.dtype)


class _ConcatConvInner(nn.Module):
    """Holds nn.Conv-compatible params (kernel HWIO + bias) and applies
    the conv to a CONCAT of two inputs without materializing the concat:
    conv(cat(a, b)) == conv_a(a) + conv_b(b) with the kernel split on the
    input-channel axis. Saves a full activation-tensor round trip to HBM
    per skip connection (checkpoint layout identical to Conv2d)."""

    features: int
    kernel_size: tp.Tuple[int, int]
    padding: tp.Tuple[int, int]

    @nn.compact
    def __call__(self, a, b):
        c_a, c_b = a.shape[-1], b.shape[-1]
        kshape = (*self.kernel_size, c_a + c_b, self.features)
        kernel = self.param("kernel", tinit.conv_kernel_init, kshape)
        bias = self.param("bias", tinit.conv_bias_init_for(kshape),
                          (self.features,))
        cd = compute_dtype()

        if self.kernel_size == (1, 1) and self.padding == (0, 0):
            y = (a.astype(cd) @ kernel[0, 0, :c_a].astype(cd)
                 + b.astype(cd) @ kernel[0, 0, c_a:].astype(cd))
            return y + bias.astype(y.dtype)

        import os

        if os.environ.get("AERO_CONV2D", "xla") == "tap":
            # decompose over freq taps: kh time-axis NWC convs on
            # freq-shifted slices (no 2-D conv op in the graph)
            y = (_conv2d_tapfreq(a.astype(cd), kernel[:, :, :c_a].astype(cd),
                                 *self.padding)
                 + _conv2d_tapfreq(b.astype(cd), kernel[:, :, c_a:].astype(cd),
                                   *self.padding))
            return y + bias.astype(y.dtype)

        pad = [(self.padding[0],) * 2, (self.padding[1],) * 2]

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x.astype(cd), k.astype(cd), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        y = conv(a, kernel[:, :, :c_a]) + conv(b, kernel[:, :, c_a:])
        return y + bias.astype(y.dtype)


def _conv2d_tapfreq(x, kernel, pad_f: int, pad_t: int):
    """[B, F, T, C] 2-D conv as a sum over freq taps of 1-D time convs.

    kernel [kh, kw, C, D]; stride 1. Each tap i contributes an NWC time
    conv of the freq-shifted slice — keeps 2-D conv ops (a measured
    XLA:TPU layout hazard) out of the graph at the cost of kh reads.
    """
    b, f, t, ci = x.shape
    kh = kernel.shape[0]
    f_out = f + 2 * pad_f - kh + 1
    xp = jnp.pad(x, ((0, 0), (pad_f, pad_f), (0, 0), (0, 0)))
    y = None
    for i in range(kh):
        xi = xp[:, i:i + f_out].reshape(b * f_out, t, ci)
        yi = jax.lax.conv_general_dilated(
            xi, kernel[i], (1,), [(pad_t, pad_t)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        y = yi if y is None else y + yi
    return y.reshape(b, f_out, t, -1)


class ConcatConv2d(nn.Module):
    """conv2d over the channel-concat of two tensors, concat-free."""

    features: int
    kernel_size: tp.Tuple[int, int] = (1, 1)
    padding: tp.Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, a, b):
        return _ConcatConvInner(self.features, self.kernel_size,
                                self.padding, name="conv")(a, b)


class GroupNorm(nn.Module):
    """torch GroupNorm(groups, C) on channels-last input.

    Stats in float32 via fused reductions (no materialized f32 copy —
    the upcast folds into the reduce), normalization in the compute
    dtype. Param layout matches flax nn.GroupNorm (child ``gn`` with
    scale/bias) so checkpoints and the torch-import shim are unchanged.
    """

    groups: int

    @nn.compact
    def __call__(self, x):
        return _RawGroupNorm(self.groups, name="gn")(x)


class _RawGroupNorm(nn.Module):
    groups: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        b = x.shape[0]
        xg = x.reshape(b, -1, g, c // g)  # [B, spatial, G, C/G]
        xf = xg.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)     # [B,1,G,1]
        var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (xg - mean.astype(x.dtype)) * inv.astype(x.dtype)
        y = y.reshape(x.shape)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class BatchNorm(nn.Module):
    """torch BatchNorm (momentum 0.1 -> flax momentum 0.9) on channels-last.

    Stats are computed in float32 (the f32-island convention) but WITHOUT
    materializing an f32 copy of the activation: the upcast feeds straight
    into XLA's fused reductions, and the normalization itself runs in the
    compute dtype. On bf16 enc0-sized tensors ([8,256,2501,48]) the old
    `x.astype(f32)` round-trip alone cost ~2.4 ms of HBM traffic."""

    @nn.compact
    def __call__(self, x, train: bool, axis: int = -1, fold_only: bool = False):
        return _RawBatchNorm(name="bn")(x, train, axis, fold_only)


class _RawBatchNorm(nn.Module):
    """Param/stat layout identical to flax nn.BatchNorm (scale/bias +
    batch_stats mean/var) so checkpoints and the torch-import shim keep
    working. ``axis`` is the channel axis (stats per channel over all
    other axes)."""

    @nn.compact
    def __call__(self, x, train: bool, axis: int = -1,
                 fold_only: bool = False):
        if fold_only:
            # Inference-only: return the per-channel affine (s, t) with
            # y == x * s + t, for folding into adjacent matmuls.
            assert not train
            c = int(x) if isinstance(x, int) else x.shape[axis]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            mean = self.variable("batch_stats", "mean",
                                 lambda: jnp.zeros((c,), jnp.float32)).value
            var = self.variable("batch_stats", "var",
                                lambda: jnp.ones((c,), jnp.float32)).value
            s = jax.lax.rsqrt(var + 1e-5) * scale
            return s, bias - mean * s
        axis = axis % x.ndim
        c = x.shape[axis]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        axes = tuple(a for a in range(x.ndim) if a != axis)
        if train:
            xf = x.astype(jnp.float32)  # fused into the reduces below
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(xf * xf, axis=axes) - mean * mean
            if not self.is_initializing():
                n = np.prod([x.shape[a] for a in axes])
                unbiased = var * (n / max(n - 1, 1))  # torch running_var
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        shape = [1] * x.ndim
        shape[axis] = c
        # single fused elementwise pass in the compute dtype
        return (x * inv.astype(x.dtype).reshape(shape)
                + (bias - mean * inv).astype(x.dtype).reshape(shape))


class Snake(nn.Module):
    """x + (1/a) sin^2(a x), trainable per-frequency ``a`` initialized from
    Exponential(rate=0.1) (src/models/snake.py:53-54). ``a`` is broadcast
    against the trailing dims of ``x`` after aligning to ``axis``."""

    features: int

    @nn.compact
    def __call__(self, x, axis: int):
        def exp_init(key, shape, dtype=jnp.float32):
            return jax.random.exponential(key, shape, dtype) * 10.0  # rate 0.1

        a = self.param("a", exp_init, (self.features,))
        shape = [1] * x.ndim
        shape[axis] = self.features
        a = a.reshape(shape).astype(x.dtype)
        return x + (1.0 / a) * jnp.sin(x * a) ** 2


class LSTM(nn.Module):
    """Multi-layer bidirectional LSTM, torch-compatible gates/init.

    Input/output: [B, T, C]; output feature size = 2 * hidden.
    Two backends with identical math:
    - training / CPU: a ``lax.scan`` whose per-step work is one
      [B, H] x [H, 4H] matmul; input projection batched up front.
    - opt-in (AERO_LSTM_KERNEL=1, inference on TPU): the fused Pallas
      recursion (``aero_tpu.ops.lstm``) — measured slower end-to-end
      than the scan in every iteration so far (see that module's
      docstring), kept for future work.
    """

    hidden: int
    layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        from aero_tpu.ops import lstm as lstm_ops

        init = tinit.lstm_init_for(self.hidden)
        cd = compute_dtype()
        use_pallas = (not train and self.hidden <= lstm_ops._LANE
                      and self.hidden % 8 == 0
                      and lstm_ops.pallas_available())
        for layer in range(self.layers):
            in_dim = x.shape[-1]
            ws = {}
            for direction in range(2):
                pref = f"l{layer}_d{direction}"
                ws[direction] = (
                    self.param(f"{pref}_w_ih", init, (in_dim, 4 * self.hidden)),
                    self.param(f"{pref}_w_hh", init, (self.hidden, 4 * self.hidden)),
                    self.param(f"{pref}_b_ih", init, (4 * self.hidden,)),
                    self.param(f"{pref}_b_hh", init, (4 * self.hidden,)),
                )
            # Both directions run in ONE pass: the reverse direction's
            # input is time-flipped and stacked on a leading axis, so the
            # sequential dependency chain is traversed once, with both
            # directions' recurrent matmuls batched per step.
            bias = jnp.stack([ws[0][2] + ws[0][3],
                              ws[1][2] + ws[1][3]]).astype(cd)  # [2, 4H]
            xd = jnp.stack([x, jnp.flip(x, 1)]).astype(cd)      # [2, B, T, C]

            if use_pallas:
                hd = self.hidden
                b_eff, t_len = x.shape[0], x.shape[1]
                w_ih = jnp.stack([ws[0][0], ws[1][0]]).astype(cd)
                # per-direction projections [2, T, 4H, B], then packed
                # rows gate-major/direction-minor -> [T, 8H, B]
                xp_d = jnp.einsum("dbtc,dcg->dtgb", xd, w_ih) \
                    + bias[:, None, :, None]
                xp = jnp.stack(
                    [xp_d[0].reshape(t_len, 4, hd, b_eff),
                     xp_d[1].reshape(t_len, 4, hd, b_eff)], axis=2)
                xp = xp.reshape(t_len, 8 * hd, b_eff)
                w_pk = lstm_ops.pack_weights(
                    ws[0][1], ws[1][1], hd).astype(cd)
                ys2 = lstm_ops.lstm_time_scan(xp, w_pk, hd)  # [T, 2H, B]
                ys = jnp.stack(
                    [jnp.transpose(ys2[:, :hd, :], (2, 0, 1)),
                     jnp.transpose(ys2[:, hd:, :], (2, 0, 1))])
            else:
                w_ih = jnp.stack([ws[0][0], ws[1][0]]).astype(cd)
                w_hh = jnp.stack([ws[0][1], ws[1][1]]).astype(cd)
                xp = jnp.einsum("dbtc,dcg->dbtg", xd, w_ih)                     + bias[:, None, None]

                def step(carry, xt, w_hh=w_hh):
                    h, c = carry  # h [2, B, H] compute dtype, c float32
                    gates = xt + jnp.einsum("dbh,dhg->dbg", h, w_hh)
                    i, f, g, o = jnp.split(gates.astype(jnp.float32), 4, -1)
                    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                    h = (jax.nn.sigmoid(o) * jnp.tanh(c)).astype(cd)
                    return (h, c), h

                b = x.shape[0]
                h0 = jnp.zeros((2, b, self.hidden), cd)
                c0 = jnp.zeros((2, b, self.hidden), jnp.float32)
                _, ys = jax.lax.scan(step, (h0, c0), jnp.moveaxis(xp, 2, 0))
                ys = jnp.moveaxis(ys, 0, 2)  # [2, B, T, H]
            x = jnp.concatenate([ys[0], jnp.flip(ys[1], 1)], -1)
        return x


class BLSTM(nn.Module):
    """BiLSTM with hidden == input dim and optional overlapped chunking
    (src/models/modules.py:17-65). Input/output [B, T, C]."""

    dim: int
    layers: int = 1
    max_steps: tp.Optional[int] = None
    skip: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, t, c = x.shape
        y = x
        framed = False
        if self.max_steps is not None and t > self.max_steps:
            width = self.max_steps
            stride = width // 2
            frames = unfold_time(x, width, stride)  # [B, F, width, C]
            n_frames = frames.shape[1]
            framed = True
            x = frames.reshape(b * n_frames, width, c)

        x = LSTM(self.dim, self.layers, name="lstm")(x, train)
        x = nn.Dense(
            self.dim,
            dtype=compute_dtype(),
            kernel_init=tinit.linear_kernel_init,
            bias_init=tinit.linear_bias_init_for(2 * self.dim),
            name="linear",
        )(x)

        if framed:
            frames = x.reshape(b, n_frames, width, c)
            limit = stride // 2
            out = [frames[:, 0, :-limit]]
            for k in range(1, n_frames - 1):
                out.append(frames[:, k, limit:-limit])
            if n_frames > 1:
                out.append(frames[:, n_frames - 1, limit:])
            x = jnp.concatenate(out, axis=1)[:, :t]
        if self.skip:
            x = x + y
        return x


def _attend_block(keys, content, queries_b, decay_w_b, s_idx_b, t,
                  freq_q_b=None, nfreqs: int = 0):
    """Attention for one query block.

    keys/content: [B, T, H, C]; queries_b: [B, Q, H, C] (pre-scaled);
    decay_w_b: [B, Q, H] per-query decay weight; s_idx_b: [Q] global
    query positions; freq_q_b: optional [B, Q, H, nfreqs] periodic
    queries (reference modules.py:106-111). Returns [B, Q, H, C].
    """
    scores = jnp.einsum("bthc,bshc->bhts", keys, queries_b,
                        preferred_element_type=jnp.float32)
    t_idx = jnp.arange(t, dtype=scores.dtype)
    sdelta = t_idx[:, None] - s_idx_b[None, :].astype(scores.dtype)  # [t, s]
    delta = jnp.abs(sdelta)
    # decay bias is rank-1 in (t, s): -|t-s| * w[b,h,s]
    scores = scores - delta[None, None] * decay_w_b.transpose(0, 2, 1)[:, :, None, :]
    if nfreqs:
        # periodic positional bias (the reference's nfreqs branch,
        # modules.py:106-111, NameError-dead there; implemented fixed):
        # scores += sum_f cos(2*pi*delta/period_f) * freq_q[b,h,f,s]
        periods = jnp.arange(1, nfreqs + 1, dtype=scores.dtype)
        freq_kernel = jnp.cos(
            2 * math.pi * sdelta[None] / periods[:, None, None])  # [f, t, s]
        scores = scores + jnp.einsum(
            "fts,bshf->bhts", freq_kernel, freq_q_b.astype(scores.dtype))
    # kill self reference (reference masked_fill with -100, modules.py:120)
    self_mask = t_idx[:, None] == s_idx_b[None, :].astype(scores.dtype)
    scores = jnp.where(self_mask[None, None], -100.0, scores)
    weights = jax.nn.softmax(scores, axis=2)  # over keys t (float32)
    return jnp.einsum("bhts,bthc->bshc", weights.astype(content.dtype),
                      content)


class LocalState(nn.Module):
    """Content-based local attention with learned distance-decay penalties
    and self-reference masking (src/models/modules.py:68-127).

    Input/output [B, T, C]. TPU-first re-derivation: the reference builds
    a [ndecay, T, T] decay kernel and contracts it with the decay queries
    (modules.py:112-117) — but that contraction is exactly
    ``-|t-s| * sum_f f * decay_q[b,h,f,s] / sqrt(ndecay)``, i.e. RANK-1
    in (t, s), so we fold it into a per-query scalar and never build the
    cubic tensor. For long sequences the T x T score matrix itself is
    computed blockwise over queries (a ``lax.scan``), bounding peak
    memory at B*H*T*block instead of B*H*T*T.
    """

    channels: int
    heads: int = 4
    ndecay: int = 4
    nfreqs: int = 0
    block_q: int = 256  # blockwise path kicks in for T > 2 * block_q

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        heads = self.heads
        ch = c // heads

        # All four input projections batched into ONE matmul (runtime
        # kernel concat; per-name param layout unchanged for checkpoint
        # and torch-import compatibility) — x is read from HBM once
        # instead of four times.
        cd = compute_dtype()
        kc, bc = _ConvParams((1, c, c), name="content")()
        kq, bq = _ConvParams((1, c, c), name="query")()
        kk, bk = _ConvParams((1, c, c), name="key")()
        cat_k = [kc[0], kq[0], kk[0]]
        cat_b = [bc, bq, bk]
        if self.ndecay:
            # Reference init: weight *= 0.01, bias = -2 so sigmoid starts
            # near 0 -> maximum initial attention window (modules.py:85-88).
            def decay_kernel_init(key, shape, dtype=jnp.float32):
                return tinit.conv_kernel_init(key, shape, dtype) * 0.01

            kshape_d = (1, c, heads * self.ndecay)
            kd, bd = _ConvParams(
                kshape_d, kernel_init=decay_kernel_init,
                bias_init=nn.initializers.constant(-2.0),
                name="query_decay")()
            cat_k.append(kd[0])
            cat_b.append(bd)

        y = x.astype(cd) @ jnp.concatenate(cat_k, axis=1).astype(cd) \
            + jnp.concatenate(cat_b).astype(cd)
        content = y[..., :c].reshape(b, t, heads, ch)
        queries = (y[..., c:2 * c] / math.sqrt(ch)).reshape(b, t, heads, ch)
        keys = y[..., 2 * c:3 * c].reshape(b, t, heads, ch)

        if self.ndecay:
            decay_q = jax.nn.sigmoid(
                y[..., 3 * c:].reshape(b, t, heads, self.ndecay)) / 2
            decays = jnp.arange(1, self.ndecay + 1, dtype=x.dtype)
            decay_w = jnp.einsum("bshf,f->bsh", decay_q,
                                 decays) / math.sqrt(self.ndecay)
        else:
            decay_w = jnp.zeros((b, t, heads), x.dtype)

        freq_q = None
        if self.nfreqs:
            freq_q = Conv1d(heads * self.nfreqs, 1, name="query_freqs")(x)
            freq_q = freq_q.reshape(b, t, heads, self.nfreqs) \
                / math.sqrt(self.nfreqs)

        # Diagnostic capture for offline analysis (tools/attn_band_probe
        # reads these to measure how localized the trained softmax is).
        # flax sow is a no-op unless apply() makes 'intermediates'
        # mutable, so this costs nothing in training/serving.
        self.sow("intermediates", "attn_inputs",
                 (queries, keys, content, decay_w))

        from aero_tpu.ops import attention as fused_attn

        # Opt-in banded attention (AERO_ATTN_BAND=<half-width>): restrict
        # the softmax to |t - s| <= band. Measured DOUBLE negative on
        # the r4 trained checkpoint — the model learns GLOBAL attention
        # (decay slopes -> ~1e-10) so banding is quality-unsafe, and
        # W=128 was also slower end-to-end (PERF.md 'Attention is
        # global'). Probe a checkpoint with tools/attn_band_probe.py
        # before ever enabling.
        band = int(os.environ.get("AERO_ATTN_BAND", "0") or 0)
        use_banded = band > 0 and not self.nfreqs and t > 2 * band
        if band > 0 and not use_banded:
            # Requested band cannot apply at this site (T too short for
            # the band, or nfreqs): say so at trace time — otherwise one
            # run silently mixes banded and exact operators across
            # layers/shapes and A/Bs become shape-dependent.
            logging.getLogger(__name__).warning(
                "AERO_ATTN_BAND=%d requested but attention site t=%d "
                "nfreqs=%d runs EXACT (band needs t > 2*band and "
                "nfreqs=0)", band, t, self.nfreqs)
        # Small-T dispatch (r5, SETTLED wash): at train geometry (T=501)
        # the ISOLATED in-jit A/B (tools/attn_smallt_ab.py) has the
        # Pallas custom-vjp fwd+bwd at 9.65/4.67 ms (enc2/enc3) vs
        # 12.9/6.3 ms dense-autodiff — but the FULL fused train step
        # measures identical either way (225.7-226.5 vs 225.9-226.4 ms,
        # 3 interleaved rounds, tools/attn_dispatch_ab.py): XLA overlaps
        # the dense attention backward with neighboring conv grads, so
        # the isolated win never materializes end-to-end (same story as
        # AERO_FLAT_OPT). Default stays dense at T <= 2*block_q;
        # AERO_ATTN_SMALLT=pallas opts small T into the fused kernel.
        small_t_pallas = os.environ.get("AERO_ATTN_SMALLT", "") == "pallas"
        use_pallas = (not self.nfreqs and fused_attn.pallas_available()
                      and (t > 2 * self.block_q or small_t_pallas))
        if use_banded:
            result = fused_attn.banded_local_attention(
                queries, keys, content, decay_w, band)
        elif use_pallas:
            # Flash-style Pallas kernel: no T x T materialization at all.
            result = fused_attn.fused_local_attention(queries, keys, content,
                                                      decay_w)
        elif t <= 2 * self.block_q:
            result = _attend_block(keys, content, queries, decay_w,
                                   jnp.arange(t), t, freq_q, self.nfreqs)
        else:
            bq = self.block_q
            n_blocks = -(-t // bq)
            pad = n_blocks * bq - t
            q_p = jnp.pad(queries, ((0, 0), (0, pad), (0, 0), (0, 0)))
            w_p = jnp.pad(decay_w, ((0, 0), (0, pad), (0, 0)))
            q_blocks = q_p.reshape(b, n_blocks, bq, heads, ch).transpose(
                1, 0, 2, 3, 4)
            w_blocks = w_p.reshape(b, n_blocks, bq, heads).transpose(
                1, 0, 2, 3)
            s_blocks = (jnp.arange(n_blocks * bq).reshape(n_blocks, bq))
            if self.nfreqs:
                f_p = jnp.pad(freq_q, ((0, 0), (0, pad), (0, 0), (0, 0)))
                f_blocks = f_p.reshape(
                    b, n_blocks, bq, heads, self.nfreqs).transpose(
                    1, 0, 2, 3, 4)
            else:
                f_blocks = jnp.zeros((n_blocks, b, bq, heads, 0), x.dtype)

            def body(_, args):
                qb, wb, sb, fb = args
                return None, _attend_block(
                    keys, content, qb, wb, sb, t,
                    fb if self.nfreqs else None, self.nfreqs)

            _, out = jax.lax.scan(body, None,
                                  (q_blocks, w_blocks, s_blocks, f_blocks))
            # [n_blocks, B, bq, H, C] -> [B, T, H, C]
            result = out.transpose(1, 0, 2, 3, 4).reshape(
                b, n_blocks * bq, heads, ch)[:, :t]

        result = result.reshape(b, t, c)
        return x + Conv1d(c, 1, name="proj")(result)


class LayerScale(nn.Module):
    """Diagonal residual rescale (src/models/modules.py:130-141).

    NOTE: the field is ``init_value`` (not ``init`` like the reference
    kwarg) because a field named ``init`` would shadow flax's
    ``Module.init`` method."""

    channels: int
    init_value: float = 0.0

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.constant(self.init_value),
                           (self.channels,))
        return scale.astype(x.dtype) * x


class ScaledEmbedding(nn.Module):
    """Embedding with boosted LR via ``scale`` and smooth (cumsum) init
    (src/models/modules.py:252-276)."""

    num_embeddings: int
    embedding_dim: int
    scale: float = 10.0
    smooth: bool = False

    @nn.compact
    def __call__(self, idx):
        def emb_init(key, shape, dtype=jnp.float32):
            w = jax.random.normal(key, shape, dtype)
            if self.smooth:
                w = jnp.cumsum(w, axis=0)
                w = w / jnp.sqrt(jnp.arange(1, shape[0] + 1, dtype=dtype))[:, None]
            return w / self.scale

        weight = self.param("weight", emb_init,
                            (self.num_embeddings, self.embedding_dim))
        return weight[idx] * self.scale


class _ConvParams(nn.Module):
    """Declares nn.Conv-compatible params (child scope ``conv`` holding
    ``kernel`` [*k, in, out] + ``bias``) WITHOUT applying a conv, so the
    caller can fuse the projection into a layout-changing einsum while
    keeping the checkpoint tree identical to a real Conv module."""

    kshape: tp.Tuple[int, ...]
    kernel_init: tp.Optional[tp.Callable] = None
    bias_init: tp.Optional[tp.Callable] = None

    @nn.compact
    def __call__(self):
        return _RawConvParams(self.kshape, kernel_init=self.kernel_init,
                              bias_init=self.bias_init, name="conv")()


class FTB(nn.Module):
    """Frequency transform block / T-F attention (src/models/modules.py:279-325).

    Input/output [B, F, T, C] with F == ``input_dim``, C == ``in_channel``.

    Layout note (the perf-critical design point): torch computes a 1x1
    conv down to ``r_channel=5`` channels, flattens [B, r, F, T] ->
    [B, r*F, T] and runs a k=9 conv1d over T (modules.py:291-312). A
    naive channels-last port keeps r=5 on the LANE dimension — TPU pads
    lanes 5 -> 128, a 25x HBM-traffic tax (~16 ms of enc0's 40 ms).
    Here the 1x1 projection is fused into a relayout einsum producing
    [B, T, r, F] (lanes = F), reshaped r-major to [B, T, r*F] — exactly
    torch's flatten order — and the conv1d runs as a single MXU GEMM
    over 1280 lane-aligned input features.
    """

    input_dim: int
    in_channel: int
    r_channel: int = 5

    @nn.compact
    def __call__(self, x, train: bool):
        b, f, t, c = x.shape
        k1, b1 = _ConvParams((1, 1, c, self.r_channel), name="conv1")()
        h = jnp.einsum("bftc,cr->btrf", x, k1[0, 0].astype(x.dtype))
        h = h + b1.astype(h.dtype)[:, None]
        h = BatchNorm(name="conv1_bn")(h, train, axis=-2)
        h = jax.nn.relu(h)

        h = h.reshape(b, t, self.r_channel * f)  # r-major == torch flatten
        h = Conv1d(self.in_channel, 9, padding=4, name="conv1d")(h)
        h = BatchNorm(name="conv1d_bn")(h, train)
        h = jax.nn.relu(h)  # [B, T, C]

        w = self.param("freq_fc", tinit.linear_kernel_init,
                       (self.input_dim, self.input_dim))
        # conv2 is a 1x1 over cat(freq_fc(att), x): expressed as channel
        # matmuls with the kernel split on the input-channel axis (concat
        # never materialized). The channel mix (conv2's att half) and the
        # freq mix (freq_fc) commute, and applying the channel mix FIRST
        # sidesteps an XLA fusion pathology measured at ~18 ms in enc0
        # (the einsum->conv_general_dilated pair triggered recomputing
        # relayouts per tile; pure dots are ~4x faster end-to-end).
        k2, b2 = _ConvParams((1, 1, 2 * c, self.in_channel), name="conv2")()
        cd = x.dtype

        from aero_tpu.ops import ftb as ftb_ops

        if not train and ftb_ops.pallas_available():
            # Fused Pallas tail: one HBM pass over x instead of 4-5, with
            # the inference BatchNorm folded into the mix weights.
            s, t0 = BatchNorm(name="conv2_bn")(self.in_channel, False,
                                               fold_only=True)
            k32 = k2[0, 0].astype(jnp.float32)
            ka_f = k32[:c] * s[None]
            kb_f = k32[c:] * s[None]
            b2_f = b2.astype(jnp.float32) * s + t0
            return ftb_ops.ftb_tail(x, h, ka_f, kb_f,
                                    w.T.astype(jnp.float32), b2_f)

        att = h[:, None] * x  # broadcast over freq -> [B, F, T, C]
        ka, kb = k2[0, 0, :c].astype(cd), k2[0, 0, c:].astype(cd)
        m = att @ ka  # [B, F, T, C'] channel-mixed
        # torch Linear over the freq axis: out[f'] = sum_f att[f] W[f', f]
        m = jnp.einsum("gf,bftc->bgtc", w.T.astype(cd), m)
        h = m + x @ kb + b2.astype(cd)
        h = BatchNorm(name="conv2_bn")(h, train)
        return jax.nn.relu(h)


class DConv(nn.Module):
    """Residual branch of dilated convs + optional BLSTM + local attention
    (src/models/modules.py:144-249).

    With ``reshape=True`` input is [B, F, T, C] and each frequency row is
    processed independently (batched as B*F); Snake's ``a`` is then
    per-frequency. Otherwise input is [B, T, C].
    """

    channels: int
    compress: float = 4
    depth: int = 2
    init_value: float = 1e-4  # named init in the reference; see LayerScale
    norm: bool = True
    time_attn: bool = False
    heads: int = 4
    ndecay: int = 4
    lstm: bool = False
    act_func: str = "gelu"
    freq_dim: tp.Optional[int] = None
    reshape: bool = False
    kernel: int = 3
    dilate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.reshape:
            b, f, t, c = x.shape
            x = x.reshape(b * f, t, c)

        hidden = int(self.channels / self.compress)
        depth = abs(self.depth)
        dilate = self.depth > 0

        for d in range(depth):
            dilation = 2 ** d if dilate else 1
            padding = dilation * (self.kernel // 2)
            skip = x
            h = Conv1d(hidden, self.kernel, padding=padding, dilation=dilation,
                       name=f"layers_{d}_conv1")(x)
            if self.norm:
                h = GroupNorm(1, name=f"layers_{d}_norm1")(h)

            if self.act_func == "snake":
                if self.reshape:
                    h4 = h.reshape(b, f, t, hidden)
                    h4 = Snake(self.freq_dim, name=f"layers_{d}_act")(h4, axis=1)
                    h = h4.reshape(b * f, t, hidden)
                else:
                    h = Snake(self.freq_dim, name=f"layers_{d}_act")(h, axis=-1)
            elif self.act_func == "gelu":
                h = gelu(h)
            else:
                h = jax.nn.relu(h)

            if self.lstm:
                h = BLSTM(hidden, layers=2, max_steps=200, skip=True,
                          name=f"layers_{d}_lstm")(h, train)
            if self.time_attn:
                h = LocalState(hidden, heads=self.heads, ndecay=self.ndecay,
                               name=f"layers_{d}_time_attn")(h)

            h = Conv1d(2 * self.channels, 1, name=f"layers_{d}_conv2")(h)
            if self.norm:
                h = GroupNorm(1, name=f"layers_{d}_norm2")(h)
            h = glu(h, axis=-1)
            h = LayerScale(self.channels, self.init_value,
                           name=f"layers_{d}_scale")(h)
            x = skip + h

        if self.reshape:
            x = x.reshape(b, f, t, c)
        return x
