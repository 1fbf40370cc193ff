"""The AERO generator: a complex-spectrogram U-Net for bandwidth extension.

TPU-native re-design of the reference model (``/root/reference/src/models/aero.py``).
Key structural parity points (reference citations):

- asymmetric analysis/synthesis STFT performing the spectral-domain
  upsampling: analysis hop ``hop_length // scale`` and window
  ``nfft // scale``; synthesis hop ``hop_length`` and window ``nfft``
  (aero.py:324-328,423-428)
- complex-as-channels representation (aero.py:430-444)
- global mean/std normalization with unbiased std (aero.py:462-464)
- 4 frequency-axis encoder layers (strides 4,4,2,2) with FTB frequency
  attention, DConv residual branches, frequency embedding after layer 0
  (aero.py:469-482)
- zeroed bottleneck — the signal flows through U-Net skips (aero.py:484)
- decoder with 3x3 context rewrites and freq-axis transposed convs
  (aero.py:138-215,487-489)

Layout: spectra are channels-last ``[B, F, T, C]``; the time axis is
untouched by the U-Net (all strided convs act on frequency), exactly as
in the reference.
"""

from __future__ import annotations

import logging
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

from aero_tpu.models.modules import (
    BatchNorm, ConcatConv2d, Conv1d, Conv2d, ConvTranspose2dFreq,
    ConvTranspose2dTime, DConv, FTB, GroupNorm, LayerScale,
    ScaledEmbedding, compute_dtype, gelu, glu,
)
from aero_tpu.ops.spec import spectro, ispectro


class HEncLayer(nn.Module):
    """Encoder layer (reference aero.py:31-135)."""

    chout: int
    kernel_size: int = 8
    stride: int = 4
    norm_groups: int = 1
    empty: bool = False
    freq: bool = True
    dconv: bool = True
    is_first: bool = False
    freq_attn: bool = False
    freq_dim: tp.Optional[int] = None
    norm: bool = True
    context: int = 0
    dconv_kw: tp.Mapping[str, tp.Any] = None
    pad: bool = True
    rewrite: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, F, T, C]
        kernel_size = self.kernel_size
        if self.stride == 1 and kernel_size % 2 == 0 and kernel_size > 1:
            kernel_size -= 1
        pad = (kernel_size - self.stride) // 2 if self.pad else 0

        if not self.freq:
            le = x.shape[2]
            if le % self.stride != 0:
                x = jnp.pad(x, ((0, 0), (0, 0),
                                (0, self.stride - le % self.stride), (0, 0)))

        if self.is_first:
            x = Conv2d(self.chout, (1, 1), name="pre_conv")(x)

        if self.freq_attn:
            x = FTB(input_dim=self.freq_dim, in_channel=x.shape[-1],
                    name="freq_attn_block")(x, train)

        if self.freq:
            x = Conv2d(self.chout, (kernel_size, 1), (self.stride, 1),
                       (pad, 0), name="conv")(x)
        else:
            x = Conv2d(self.chout, (1, kernel_size), (1, self.stride),
                       (0, pad), name="conv")(x)
        if self.empty:
            return x

        if self.norm:
            x = GroupNorm(self.norm_groups, name="norm1")(x)
        x = gelu(x)

        if self.dconv:
            x = DConv(self.chout, reshape=True, **dict(self.dconv_kw or {}),
                      name="dconv")(x, train)

        if self.rewrite:
            k = 1 + 2 * self.context
            x = Conv2d(2 * self.chout, (k, k), (1, 1),
                       (self.context, self.context), name="rewrite")(x)
            if self.norm:
                x = GroupNorm(self.norm_groups, name="norm2")(x)
            x = glu(x, axis=-1)
        return x


class HDecLayer(nn.Module):
    """Decoder layer (reference aero.py:138-215)."""

    chin: int
    chout: int
    last: bool = False
    kernel_size: int = 8
    stride: int = 4
    norm_groups: int = 1
    empty: bool = False
    freq: bool = True
    dconv: bool = True
    norm: bool = True
    context: int = 1
    dconv_kw: tp.Mapping[str, tp.Any] = None
    pad: bool = True
    context_freq: bool = True
    rewrite: bool = True

    @nn.compact
    def __call__(self, x, skip, length, train: bool = False):
        kernel_size = self.kernel_size
        if self.stride == 1 and kernel_size % 2 == 0 and kernel_size > 1:
            kernel_size -= 1
        pad = (kernel_size - self.stride) // 2 if self.pad else 0

        if not self.empty:
            if self.rewrite:
                # conv over cat(x, skip) without materializing the concat
                k = 1 + 2 * self.context
                if self.context_freq:
                    y = ConcatConv2d(2 * self.chin, (k, k),
                                     (self.context, self.context),
                                     name="rewrite")(x, skip)
                else:
                    y = ConcatConv2d(2 * self.chin, (1, k),
                                     (0, self.context), name="rewrite")(x, skip)
                if self.norm:
                    y = GroupNorm(self.norm_groups, name="norm1")(y)
                y = glu(y, axis=-1)
            else:
                y = jnp.concatenate([x, skip], axis=-1)
            if self.dconv:
                y = DConv(self.chin, reshape=True, **dict(self.dconv_kw or {}),
                          name="dconv")(y, train)
        else:
            y = x
            assert skip is None

        if self.freq:
            z = ConvTranspose2dFreq(self.chout, kernel_size, self.stride,
                                    name="conv_tr")(y)
        else:
            z = ConvTranspose2dTime(self.chout, kernel_size, self.stride,
                                    name="conv_tr")(y)
        if self.norm:
            z = GroupNorm(self.norm_groups, name="norm2")(z)

        if self.freq:
            if pad:
                z = z[:, pad:-pad, :, :]
        else:
            z = z[:, :, pad:pad + length, :]
            assert z.shape[2] == length, (z.shape[2], length)
        if not self.last:
            z = gelu(z)
        return z


class Aero(nn.Module):
    """Audio super-resolution U-Net (reference aero.py:218-523)."""

    # Channels
    in_channels: int = 1
    out_channels: int = 1
    audio_channels: int = 2
    channels: int = 48
    growth: int = 2
    # STFT
    nfft: int = 512
    hop_length: int = 64
    end_iters: int = 0
    cac: bool = True
    # Main structure
    rewrite: bool = True
    hybrid: bool = False
    hybrid_old: bool = False
    # Frequency branch
    freq_emb: float = 0.2
    emb_scale: float = 10
    emb_smooth: bool = True
    # Convolutions
    kernel_size: int = 8
    strides: tp.Sequence[int] = (4, 4, 2, 2)
    context: int = 1
    context_enc: int = 0
    freq_ends: int = 4
    enc_freq_attn: int = 4
    # Normalization
    norm_starts: int = 2
    norm_groups: int = 4
    # DConv residual branch
    dconv_mode: int = 1
    dconv_depth: int = 2
    dconv_comp: int = 4
    dconv_time_attn: int = 2
    dconv_lstm: int = 2
    dconv_init: float = 1e-3
    # Weight init
    rescale: float = 0.1
    # Metadata
    lr_sr: int = 4000
    hr_sr: int = 16000
    spec_upsample: bool = True
    act_func: str = "snake"
    debug: bool = False

    @property
    def scale(self):
        return self.hr_sr / self.lr_sr if self.spec_upsample else 1

    @property
    def true_hop_length(self):
        return int(self.hop_length // self.scale)

    @property
    def win_length(self):
        return int(self.nfft // self.scale)

    def _layer_plan(self):
        """Reproduce the reference constructor loop (aero.py:344-404)."""
        plan = []
        chin_z = self.in_channels * (2 if self.cac else 1)
        chout_z = self.channels
        freqs = self.nfft // 2
        depth = len(self.strides)
        for index in range(depth):
            freq = index <= self.freq_ends
            stri = self.strides[index]
            ker = self.kernel_size
            if freq and freqs < self.kernel_size:
                ker = freqs
            kw = dict(
                kernel_size=ker,
                stride=stri,
                freq=freq,
                pad=True,
                norm=index >= self.norm_starts,
                rewrite=self.rewrite,
                norm_groups=self.norm_groups,
                dconv_kw=dict(
                    lstm=index >= self.dconv_lstm,
                    time_attn=index >= self.dconv_time_attn,
                    depth=self.dconv_depth,
                    compress=self.dconv_comp,
                    init_value=self.dconv_init,
                    act_func=self.act_func,
                    freq_dim=freqs // stri if freq else freqs,
                ),
            )
            enc_chin_z = chin_z
            dec_chin_z = chin_z
            if index == 0:
                dec_chin_z = self.out_channels * (2 if self.cac else 1)
            plan.append(dict(
                index=index,
                enc_chin=enc_chin_z,
                chout=chout_z,
                dec_chout=dec_chin_z,
                freqs_in=freqs,
                kw=kw,
                freq_attn=index >= self.enc_freq_attn,
            ))
            chin_z = chout_z
            chout_z = int(self.growth * chout_z)
            if freq:
                freqs //= stri
        return plan

    def _spec(self, x, scale=False):
        """Analysis STFT (reference aero.py:409-421). x: [..., T]."""
        hl = self.true_hop_length
        win_length = self.win_length
        if x.shape[-1] % hl:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, hl - x.shape[-1] % hl)])
        if scale:
            hl = int(hl * self.scale)
            win_length = int(win_length * self.scale)
        z = spectro(x, self.nfft, hl, win_length=win_length)[..., :-1, :]
        return z

    def _ispec(self, z):
        """Synthesis iSTFT with the larger hop/window (aero.py:423-428)."""
        hl = int(self.true_hop_length * self.scale)
        win_length = int(self.win_length * self.scale)
        z = jnp.pad(z, [(0, 0)] * (z.ndim - 2) + [(0, 1), (0, 0)])
        return ispectro(z, hl, win_length=win_length)

    @nn.compact
    def __call__(self, mix, train: bool = False, return_spec: bool = False,
                 return_lr_spec: bool = False):
        # mix: [B, C_in, T] (reference layout) or [B, T]
        if mix.ndim == 2:
            mix = mix[:, None, :]
        length = mix.shape[-1]

        # `debug` prints per-layer shapes at trace time (once per
        # compile) — the reference's main debugging affordance
        # (aero.py:450-516). Shapes are static under jit, so plain
        # logging reproduces it faithfully.
        if self.debug:
            logger.info(f"aero in shape: {mix.shape}")

        z = self._spec(mix)  # [B, C, F, T] complex
        # complex-as-channels, channels-last: [B, F, T, 2C] with
        # channel order (c0_re, c0_im, c1_re, ...) matching aero.py:430-434
        zc = jnp.moveaxis(z, 1, -1)  # [B, F, T, C]
        x = jnp.stack([jnp.real(zc), jnp.imag(zc)], axis=-1)
        b, f, t, c, _ = x.shape
        x = x.reshape(b, f, t, c * 2)
        if self.debug:
            logger.info(f"x spec shape: {x.shape}")

        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        std = jnp.std(x, axis=(1, 2, 3), keepdims=True, ddof=1)
        x = (x - mean) / (1e-5 + std)
        x = x.astype(compute_dtype())  # bf16 U-Net when configured

        plan = self._layer_plan()
        saved = []
        lengths = []
        for p in plan:
            lengths.append(x.shape[2])
            x = HEncLayer(
                chout=p["chout"],
                dconv=bool(self.dconv_mode & 1),
                context=self.context_enc,
                is_first=p["index"] == 0,
                freq_attn=p["freq_attn"],
                freq_dim=p["freqs_in"],
                **p["kw"],
                name=f"encoder_{p['index']}",
            )(x, train)
            if self.debug:
                logger.info(f"encoder {p['index']} out shape: {x.shape}")
            if p["index"] == 0 and self.freq_emb:
                frs = jnp.arange(x.shape[1])
                emb = ScaledEmbedding(x.shape[1], x.shape[-1],
                                      smooth=self.emb_smooth,
                                      scale=self.emb_scale,
                                      name="freq_emb")(frs)
                x = x + jnp.asarray(self.freq_emb, x.dtype) * \
                    emb[None, :, None, :].astype(x.dtype)
            saved.append(x)

        # zero bottleneck: the signal flows via skips (aero.py:484)
        x = jnp.zeros_like(x)

        for j, p in enumerate(reversed(plan)):
            skip = saved.pop(-1)
            x = HDecLayer(
                chin=2 * p["chout"],
                chout=p["dec_chout"],
                last=p["index"] == 0,
                dconv=bool(self.dconv_mode & 2),
                context=self.context,
                **p["kw"],
                name=f"decoder_{j}",
            )(x, skip, lengths.pop(-1), train)
            if self.debug:
                logger.info(f"decoder {j} out shape: {x.shape}")

        assert len(saved) == 0

        # [B, F, T, 2*out] -> f32 -> de-normalize -> complex [B, out, F, T]
        x = x.astype(jnp.float32) * std + mean
        x = x.reshape(b, f, t, self.out_channels, 2)
        x_spec = jax.lax.complex(x[..., 0], x[..., 1])  # [B, F, T, out]
        x_spec = jnp.moveaxis(x_spec, -1, 1)  # [B, out, F, T]

        if self.debug:
            logger.info(f"x_spec_complex shape: {x_spec.shape}")

        out = self._ispec(x_spec)
        if self.debug:
            logger.info(f"aero out shape: {out.shape}")
        out = out[..., :int(length * self.scale)]
        if self.debug:
            logger.info(f"aero out - trimmed shape: {out.shape}")

        if return_spec:
            if return_lr_spec:
                return out, x_spec, z
            return out, x_spec
        return out

    def valid_output_length(self, length: int) -> int:
        return int(length * self.scale)
