"""GAN discriminators: MelGAN multi-scale, HiFi-GAN multi-period/multi-scale.

Parity with ``/root/reference/src/models/discriminators.py``:
- NLayerDiscriminator / Discriminator (MelGAN MSD): :14-78
- DiscriminatorP / MultiPeriodDiscriminator (HiFi MPD): :89-147
- DiscriminatorS / MultiScaleDiscriminator (HiFi MSD): :150-208

All weight-normalized convs use torch-default kaiming init with
``g = ||v||`` (note: the reference's ``weights_init`` N(0, 0.02) is a
silent no-op on weight-normed convs — the pre-forward hook recomputes
the weight — so the *effective* reference init is exactly this).

Layouts are channels-last: waveforms [B, T, C]; DiscriminatorP folds
time into [B, T/p, p, C].
"""

from __future__ import annotations

import os
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp

from aero_tpu.models import init as tinit
from aero_tpu.models.modules import (_conv_transpose, compute_dtype,
                                     leaky_relu, strided_conv1d_polygrad)

LRELU_SLOPE = 0.1

# Grouped-conv lowering on TPU. XLA's feature_group_count pads each
# group's tiny contraction (Cg=4..16 here) to a full MXU tile, so the
# grouped form wastes most of the systolic array. Expanding the weights
# to a dense block-diagonal kernel runs ONE well-tiled GEMM instead;
# measured (tools/profile_disc_conv.py, B=16 bf16): fwd 0.94->0.17 ms
# (g=4), 1.15->0.05 (g=16), 0.72->0.30 (g=64). The expansion inflates
# FLOPs and weight traffic by g, so huge kernels (k*C_in*C_out above
# AERO_DISC_DENSE_MAX elements) keep the grouped form in "auto".
#   AERO_DISC_CONV = auto (default) | grouped | dense
_DISC_CONV_MODE = os.environ.get("AERO_DISC_CONV", "auto")
_DISC_DENSE_MAX = int(os.environ.get("AERO_DISC_DENSE_MAX",
                                     str(12 * 1024 * 1024)))


def _dense_blockdiag(w, groups: int):
    """Expand grouped-conv weights [k, Cg, Cout] to dense block-diagonal
    [k, Cg*groups, Cout]. lax semantics: input channels split into
    `groups` contiguous blocks; output dim is group-major — input group
    i feeds output block i. Autodiff through the expansion restricts the
    dense gradient back to the blocks, so training math is unchanged."""
    k, cg, cout = w.shape
    og = cout // groups
    wg = w.reshape(k, cg, groups, og)
    eye = jnp.eye(groups, dtype=w.dtype)
    # dense[k, (h, c), (g, o)] = w[k, c, g, o] * [h == g]
    dense = jnp.einsum("kcgo,hg->khcgo", wg, eye)
    return dense.reshape(k, groups * cg, cout)


def grouped_conv1d(x, w, *, stride: int, padding: int, groups: int,
                   dilation: int = 1):
    """Grouped conv1d on [B, T, C] with TPU lowering dispatch."""
    use_dense = groups > 1 and (
        _DISC_CONV_MODE == "dense"
        or (_DISC_CONV_MODE == "auto"
            and w.shape[0] * x.shape[-1] * w.shape[-1] <= _DISC_DENSE_MAX))
    if use_dense:
        w = _dense_blockdiag(w, groups)
        groups = 1
    if groups == 1 and dilation == 1 and stride > 1:
        # optional polyphase input-gradient (AERO_CONVGRAD=poly);
        # measured SLOWER than XLA's lhs_dilation grad at this geometry
        # — default passes through to plain autodiff (see
        # modules.strided_conv1d_polygrad docstring for the A/B)
        return strided_conv1d_polygrad(x, w, stride, padding)
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _weight_norm(v, g):
    # torch weight_norm dim=0: per-output-channel norm. flax kernel layout
    # (*k, in, out): norm over all but the last axis.
    norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(v.ndim - 1)), keepdims=True))
    return v * (g / jnp.maximum(norm, 1e-12))


class WNConv1d(nn.Module):
    """Weight-normalized conv1d on [B, T, C] (src/models/modules.py:10-11)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1] // self.groups
        kshape = (self.kernel_size, in_ch, self.features)

        def v_init(key, shape, dtype=jnp.float32):
            return tinit.conv_kernel_init(key, shape, dtype)

        v = self.param("v", v_init, kshape)
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(v * v, axis=(0, 1), keepdims=True)).reshape(shape),
            (self.features,),
        )
        bias = self.param("bias", tinit.conv_bias_init_for(kshape),
                          (self.features,))
        cd = compute_dtype()
        # weight-norm math in f32 (params are f32), conv in compute dtype
        w = _weight_norm(v, g.reshape(1, 1, -1)).astype(cd)
        y = grouped_conv1d(x.astype(cd), w, stride=self.stride,
                           padding=self.padding, groups=self.groups,
                           dilation=self.dilation)
        return y + bias.astype(cd)


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed conv1d (src/models/modules.py:14-15).

    torch weight layout is [in, out, k] and weight_norm dim=0 normalizes
    per *input* channel there; we keep flax layout (k, in, out) and norm
    over (k, out) per input channel to match.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0

    @nn.compact
    def __call__(self, x):
        kshape = (self.kernel_size, x.shape[-1], self.features)
        v = self.param("v", tinit.conv_transpose_kernel_init, kshape)
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(v * v, axis=(0, 2), keepdims=True)).reshape(shape),
            (x.shape[-1],),
        )
        bias = self.param("bias", tinit.conv_transpose_bias_init_for(kshape),
                          (self.features,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True))
        cd = compute_dtype()
        w = v * (g.reshape(1, -1, 1) / jnp.maximum(norm, 1e-12))
        # shared lowering (modules._conv_transpose): subpixel/polyphase
        # by default — seanet's stride-2..8 upsamplers skip the
        # zero-dilated MACs the lhs_dilation form spends (AERO_CONVT=xla
        # reverts).
        y = _conv_transpose(x, w, self.stride, self.padding, axis=-2)
        if self.output_padding:
            y = jnp.pad(y, ((0, 0), (0, self.output_padding), (0, 0)))
        return y + bias.astype(cd)


class WNConv2d(nn.Module):
    """Weight-normalized conv2d on [B, H, W, C] (HiFi DiscriminatorP)."""

    features: int
    kernel_size: tp.Tuple[int, int]
    stride: tp.Tuple[int, int] = (1, 1)
    padding: tp.Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kshape = (*self.kernel_size, x.shape[-1], self.features)
        v = self.param("v", tinit.conv_kernel_init, kshape)
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(v * v, axis=(0, 1, 2), keepdims=True)).reshape(shape),
            (self.features,),
        )
        bias = self.param("bias", tinit.conv_bias_init_for(kshape),
                          (self.features,))
        cd = compute_dtype()
        w = _weight_norm(v, g.reshape(1, 1, 1, -1)).astype(cd)
        kw = self.kernel_size[1]
        if (kw == 1 and self.stride[1] == 1 and self.padding[1] == 0
                and self.stride[0] > 1
                and os.environ.get("AERO_CONVGRAD", "xla") in (
                    "poly", "polyconv")):
            # MPD geometry: kernel (k,1), stride (s,1) — the W (period)
            # axis is pure batch, so it can fold into batch and run the
            # 1-D strided conv with the polyphase input-gradient. Only
            # under the AERO_CONVGRAD=poly opt-in: the reshape form
            # changes lowering even without the custom grad, and the
            # poly grad measured slower on the melgan disc geometry
            # (see strided_conv1d_polygrad)
            b, hh, ww_, c = x.shape
            x1 = x.astype(cd).transpose(0, 2, 1, 3).reshape(b * ww_, hh, c)
            y1 = strided_conv1d_polygrad(x1, w[:, 0], self.stride[0],
                                         self.padding[0])
            y = y1.reshape(b, ww_, y1.shape[1], -1).transpose(0, 2, 1, 3)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(cd), w,
                window_strides=self.stride,
                padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + bias.astype(cd)


class SNConv1d(nn.Module):
    """Spectral-normalized conv1d (DiscriminatorS first scale,
    src/models/discriminators.py:154,185). One power iteration per
    training step with a persistent ``u`` vector, like torch."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1] // self.groups
        kshape = (self.kernel_size, in_ch, self.features)
        w = self.param("kernel", tinit.conv_kernel_init, kshape)
        bias = self.param("bias", tinit.conv_bias_init_for(kshape),
                          (self.features,))
        # torch reshapes weight to [out, -1] for the power iteration
        w_mat = w.reshape(-1, self.features).T  # [out, k*in]
        u = self.variable(
            "spectral_stats", "u",
            lambda: jax.random.normal(self.make_rng("params")
                                      if self.has_rng("params")
                                      else jax.random.PRNGKey(0),
                                      (self.features,)))
        u_val = u.value
        v = w_mat.T @ u_val
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u_new = w_mat @ v
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
        if train and not self.is_initializing():
            u.value = jax.lax.stop_gradient(u_new)
        sigma = jnp.einsum("o,oi,i->", jax.lax.stop_gradient(u_new), w_mat,
                           jax.lax.stop_gradient(v))
        cd = compute_dtype()
        # power iteration stays f32; the conv runs in the compute dtype
        w_sn = (w / sigma).astype(cd)
        y = grouped_conv1d(x.astype(cd), w_sn, stride=self.stride,
                           padding=self.padding, groups=self.groups)
        return y + bias.astype(cd)


def avg_pool1d(x, kernel: int, stride: int, padding: int,
               count_include_pad: bool = True, n_valid=None):
    """torch AvgPool1d on [B, T, C].

    ``n_valid`` (traced scalar): treat only the first n_valid samples as
    the signal — the count_include_pad=False divisor counts in-[0, n)
    positions, so outputs covering the n-boundary equal what torch
    produces on an exact length-n input (bucketed eval exactness)."""
    ones = jnp.ones((1, 1, kernel), x.dtype)  # OIH layout
    b, t, c = x.shape
    xt = jnp.moveaxis(x, -1, 1).reshape(b * c, 1, t)
    sums = jax.lax.conv_general_dilated(
        xt, ones, (stride,), [(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    if count_include_pad:
        out = sums / kernel
    else:
        support = jnp.ones((1, 1, t), x.dtype) if n_valid is None else \
            (jnp.arange(t)[None, None, :] < n_valid).astype(x.dtype)
        cnt = jax.lax.conv_general_dilated(
            support, ones, (stride,),
            [(padding, padding)], dimension_numbers=("NCH", "OIH", "NCH"))
        out = sums / jnp.maximum(cnt, 1e-12)
    out = out.reshape(b, c, -1)
    return jnp.moveaxis(out, 1, -1)


def _mask_time(x, n_valid):
    """Zero x beyond index n_valid (traced scalar) along axis 1.
    Works for [B, T, C] and [B, R, p, C] (broadcast over trailing dims)."""
    idx = jnp.arange(x.shape[1]).reshape((1, -1) + (1,) * (x.ndim - 2))
    return x * (idx < n_valid).astype(x.dtype)


def _reflect_tail_fix(x, n_valid, pad: int):
    """Write x[n-2-i] at positions n+i (i < pad) of [B, T, C] — the tail
    a reflect-pad of an exact length-``n_valid`` signal would read.
    Requires n_valid + pad <= T and n_valid >= pad + 2."""
    tail = jax.lax.dynamic_slice_in_dim(x, n_valid - pad - 1, pad, axis=1)
    return jax.lax.dynamic_update_slice_in_dim(
        x, jnp.flip(tail, axis=1), n_valid, axis=1)


def _conv_out_len(n, kernel: int, stride: int, padding: int):
    """torch Conv1d length arithmetic on a traced length."""
    return (n + 2 * padding - kernel) // stride + 1


def reflect_pad_time(x, pad: int):
    """Reflection padding along the time axis of [B, T, C]."""
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class NLayerDiscriminator(nn.Module):
    """MelGAN sub-discriminator (src/models/discriminators.py:14-56).
    Returns the list of all intermediate feature maps (last = logits)."""

    ndf: int
    n_layers: int
    downsampling_factor: int

    @nn.compact
    def __call__(self, x, n_valid=None):
        """``n_valid`` (traced scalar): x is a length-n signal padded to
        a static bucket; every feature map is zero-masked past the valid
        length an exact-length input would produce (features beyond each
        layer's valid extent are garbage computed from padding and would
        otherwise leak into the next layer, whereas the exact-length run
        sees the conv's implicit zeros there). With the reflected tail
        of ``reflect_pad_time`` already present at [n, n+7) the masked
        maps are bit-identical to the exact-length run. Returns
        (results, valid_lengths) in this mode."""
        results = []
        lengths = []
        h = reflect_pad_time(x, 7)
        h = WNConv1d(self.ndf, 15, name="layer_0")(h)
        h = leaky_relu(h, 0.2)
        ln = None
        if n_valid is not None:
            ln = n_valid                  # k=15, p=7 (explicit), s=1
            h = _mask_time(h, ln)
            lengths.append(ln)
        results.append(h)

        nf = self.ndf
        stride = self.downsampling_factor
        max_nf = (stride ** (self.n_layers - 1)) * self.ndf
        for n in range(1, self.n_layers + 1):
            nf_prev = nf
            nf = min(nf * stride, max_nf)
            h = WNConv1d(nf, stride * 10 + 1, stride=stride,
                         padding=stride * 5, groups=nf_prev // 4,
                         name=f"layer_{n}")(h)
            h = leaky_relu(h, 0.2)
            if n_valid is not None:
                ln = _conv_out_len(ln, stride * 10 + 1, stride, stride * 5)
                h = _mask_time(h, ln)
                lengths.append(ln)
            results.append(h)

        nf = min(nf * 2, max_nf)
        h = WNConv1d(nf, 5, stride=1, padding=2,
                     name=f"layer_{self.n_layers + 1}")(h)
        h = leaky_relu(h, 0.2)
        if n_valid is not None:
            ln = _conv_out_len(ln, 5, 1, 2)
            h = _mask_time(h, ln)
            lengths.append(ln)
        results.append(h)

        h = WNConv1d(1, 3, stride=1, padding=1,
                     name=f"layer_{self.n_layers + 2}")(h)
        if n_valid is not None:
            ln = _conv_out_len(ln, 3, 1, 1)
            h = _mask_time(h, ln)
            lengths.append(ln)
        results.append(h)
        if n_valid is not None:
            return results, lengths
        return results


class MelganDiscriminator(nn.Module):
    """MelGAN multi-scale discriminator (src/models/discriminators.py:59-78).

    Input [B, T, 1]; returns list (one per scale) of feature-map lists.
    """

    num_D: int
    ndf: int
    n_layers: int
    downsampling_factor: int

    @nn.compact
    def __call__(self, x, train: bool = False, n_valid=None):
        """``n_valid`` (traced scalar): bucketed-exact mode — see
        NLayerDiscriminator. Each scale gets a zero-masked signal with
        the reflected tail an exact-length run would see, and the
        between-scale AvgPool uses the masked divisor. Returns
        (results, valid_lengths) in this mode."""
        results = []
        if n_valid is None:
            for i in range(self.num_D):
                results.append(
                    NLayerDiscriminator(self.ndf, self.n_layers,
                                        self.downsampling_factor,
                                        name=f"disc_{i}")(x))
                x = avg_pool1d(x, 4, 2, 1, count_include_pad=False)
            return results

        lengths = []
        n = n_valid
        for i in range(self.num_D):
            xi = _reflect_tail_fix(_mask_time(x, n), n, 7)
            res, lens = NLayerDiscriminator(
                self.ndf, self.n_layers, self.downsampling_factor,
                name=f"disc_{i}")(xi, n_valid=n)
            results.append(res)
            lengths.append(lens)
            x = avg_pool1d(_mask_time(x, n), 4, 2, 1,
                           count_include_pad=False, n_valid=n)
            n = _conv_out_len(n, 4, 2, 1)
        return results, lengths


def get_padding(kernel_size, dilation=1):
    return int((kernel_size * dilation - dilation) / 2)


class DiscriminatorP(nn.Module):
    """HiFi-GAN period discriminator (src/models/discriminators.py:89-123)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    hidden: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False, n_valid=None):
        """``n_valid`` (traced scalar): bucketed-exact mode. x is a
        length-n signal padded to a static bucket with T >= n + period;
        the reflect pad the exact run's time-fold would produce is
        written on device (positions n+i <- x[n-2-i]), folded rows past
        the exact run's row count are zero-masked after every conv
        (mirroring the conv's implicit zero padding), and per-fmap valid
        row counts are returned: (logits, fmap, row_lens)."""
        fmap = []
        b, t, c = x.shape
        p = self.period
        if t % p != 0:
            static_pad = p - (t % p)
            if n_valid is None:
                x = jnp.pad(x, ((0, 0), (0, static_pad), (0, 0)),
                            mode="reflect")
            else:
                # bucket tail is masked garbage anyway; rows past the
                # valid count are zeroed below
                x = jnp.pad(x, ((0, 0), (0, static_pad), (0, 0)))
            t = t + static_pad
        lens = None
        if n_valid is not None:
            x = _mask_time(x, n_valid)
            if p > 1:
                # exact-run fold pad: reflect tail x[n-2-i] at n+i for
                # i < n_pad; entries i >= n_pad land at positions
                # >= n + n_pad = rows >= m, zeroed by the row mask.
                tail = jax.lax.dynamic_slice_in_dim(x, n_valid - p, p - 1,
                                                    axis=1)
                x = jax.lax.dynamic_update_slice_in_dim(
                    x, jnp.flip(tail, axis=1), n_valid, axis=1)
            m = (n_valid + p - 1) // p  # ceil: rows of the exact fold
            lens = []
        h = x.reshape(b, t // p, p, c)
        if n_valid is not None:
            h = _mask_time(h, m)

        chans = [self.hidden, self.hidden * 4, self.hidden * 16,
                 self.hidden * 32]
        for i, ch in enumerate(chans):
            h = WNConv2d(ch, (self.kernel_size, 1), (self.stride, 1),
                         (get_padding(5, 1), 0), name=f"convs_{i}")(h)
            h = leaky_relu(h, LRELU_SLOPE)
            if n_valid is not None:
                m = _conv_out_len(m, self.kernel_size, self.stride,
                                  get_padding(5, 1))
                h = _mask_time(h, m)
                lens.append(m)
            fmap.append(h)
        h = WNConv2d(self.hidden * 32, (self.kernel_size, 1), (1, 1),
                     (2, 0), name="convs_4")(h)
        h = leaky_relu(h, LRELU_SLOPE)
        if n_valid is not None:
            m = _conv_out_len(m, self.kernel_size, 1, 2)
            h = _mask_time(h, m)
            lens.append(m)
        fmap.append(h)
        h = WNConv2d(1, (3, 1), (1, 1), (1, 0), name="conv_post")(h)
        if n_valid is not None:
            m = _conv_out_len(m, 3, 1, 1)
            h = _mask_time(h, m)
            lens.append(m)
        fmap.append(h)
        if n_valid is not None:
            return h.reshape(b, -1), fmap, lens
        return h.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """(src/models/discriminators.py:126-147). Returns
    (real_logits, gen_logits, real_fmaps, gen_fmaps)."""

    hidden: int = 32
    periods: tp.Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat, train: bool = False, n_valid=None):
        """``n_valid`` (traced scalar): bucketed-exact mode, see
        DiscriminatorP. Returns the usual 4-tuple plus ``mask_info =
        (logit_valid_counts, fmap_row_lens)`` — per sub-disc, the valid
        element count of the flattened logits (rows * period) and the
        per-fmap valid row counts (shared by real/generated: same n)."""
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        counts, all_lens = [], []
        for i, period in enumerate(self.periods):
            d = DiscriminatorP(period, hidden=self.hidden,
                               name=f"discriminators_{i}")
            if n_valid is None:
                y_d_r, fmap_r = d(y, train)
                y_d_g, fmap_g = d(y_hat, train)
            else:
                y_d_r, fmap_r, lens = d(y, train, n_valid=n_valid)
                y_d_g, fmap_g, _ = d(y_hat, train, n_valid=n_valid)
                counts.append(lens[-1] * period)
                all_lens.append(lens)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        if n_valid is not None:
            return y_d_rs, y_d_gs, fmap_rs, fmap_gs, (counts, all_lens)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(nn.Module):
    """HiFi-GAN scale discriminator (src/models/discriminators.py:150-177)."""

    use_spectral_norm: bool = False
    hidden: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False, n_valid=None):
        """``n_valid`` (traced scalar): bucketed-exact mode — x must
        already be zero-masked past n_valid (the convs use zero padding,
        so masked-bucket values in [0, ln) are bit-identical to the
        exact-length run); feature maps are re-masked after every layer
        and per-fmap valid lengths returned: (logits, fmap, lens)."""
        hd = self.hidden
        specs = [
            dict(features=hd, kernel_size=15, stride=1, padding=7, groups=1),
            dict(features=hd, kernel_size=41, stride=2, padding=20, groups=4),
            dict(features=hd * 2, kernel_size=41, stride=2, padding=20, groups=16),
            dict(features=hd * 4, kernel_size=41, stride=4, padding=20, groups=16),
            dict(features=hd * 8, kernel_size=41, stride=4, padding=20, groups=16),
            dict(features=hd * 8, kernel_size=41, stride=1, padding=20, groups=16),
            dict(features=hd * 8, kernel_size=5, stride=1, padding=2, groups=1),
        ]
        fmap = []
        lens = [] if n_valid is not None else None
        ln = n_valid
        h = x
        for i, s in enumerate(specs):
            if self.use_spectral_norm:
                h = SNConv1d(**s, name=f"convs_{i}")(h, train)
            else:
                h = WNConv1d(**s, name=f"convs_{i}")(h)
            h = leaky_relu(h, LRELU_SLOPE)
            if n_valid is not None:
                ln = _conv_out_len(ln, s["kernel_size"], s["stride"],
                                   s["padding"])
                h = _mask_time(h, ln)
                lens.append(ln)
            fmap.append(h)
        if self.use_spectral_norm:
            h = SNConv1d(1, 3, 1, 1, name="conv_post")(h, train)
        else:
            h = WNConv1d(1, 3, 1, 1, name="conv_post")(h)
        if n_valid is not None:
            ln = _conv_out_len(ln, 3, 1, 1)
            h = _mask_time(h, ln)
            lens.append(ln)
        fmap.append(h)
        if n_valid is not None:
            return h.reshape(h.shape[0], -1), fmap, lens
        return h.reshape(h.shape[0], -1), fmap


class MultiScaleDiscriminator(nn.Module):
    """(src/models/discriminators.py:180-208)."""

    hidden: int = 64
    num_D: int = 3

    @nn.compact
    def __call__(self, y, y_hat, train: bool = False, n_valid=None):
        """``n_valid`` (traced scalar): bucketed-exact mode, see
        DiscriminatorS. Inputs are zero-masked past the running valid
        length; the between-scale AvgPool(4,2,pad=2) divides by 4
        including padding (torch count_include_pad default), and the
        masked region's zeros equal the exact run's implicit pad zeros,
        so pooled values in the valid extent are exact. Returns the
        usual 4-tuple plus ``mask_info = (logit_valid_counts,
        fmap_lens)``."""
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        counts, all_lens = [], []
        n = n_valid
        if n is not None:
            y = _mask_time(y, n)
            y_hat = _mask_time(y_hat, n)
        for i in range(self.num_D):
            if i != 0:
                y = avg_pool1d(y, 4, 2, 2)
                y_hat = avg_pool1d(y_hat, 4, 2, 2)
                if n is not None:
                    n = _conv_out_len(n, 4, 2, 2)
                    y = _mask_time(y, n)
                    y_hat = _mask_time(y_hat, n)
            d = DiscriminatorS(use_spectral_norm=(i == 0), hidden=self.hidden,
                               name=f"discriminators_{i}")
            if n_valid is None:
                y_d_r, fmap_r = d(y, train)
                y_d_g, fmap_g = d(y_hat, train)
            else:
                y_d_r, fmap_r, lens = d(y, train, n_valid=n)
                y_d_g, fmap_g, _ = d(y_hat, train, n_valid=n)
                counts.append(lens[-1])
                all_lens.append(lens)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        if n_valid is not None:
            return y_d_rs, y_d_gs, fmap_rs, fmap_gs, (counts, all_lens)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
