"""Seanet: the time-domain MelGAN-style U-Net baseline generator.

Parity with ``/root/reference/src/models/seanet.py:10-179``: encoder /
decoder stacks of weight-normalized convs with ResNet blocks, input
std-normalization, on-the-fly sinc upsampling inside ``forward``, valid
length padding, and residual skip connections between every encoder
input and the matching decoder output.

Layout: waveforms are channels-last [B, T, C].
"""

from __future__ import annotations

import math
import typing as tp

import flax.linen as nn
import jax.numpy as jnp

from aero_tpu.models.discriminators import WNConv1d, WNConvTranspose1d
from aero_tpu.models.modules import leaky_relu
from aero_tpu.ops.resample import resample


def _reflect_pad(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class ResnetBlock(nn.Module):
    """(src/models/seanet.py:10-23)."""

    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        h = leaky_relu(x, 0.2)
        h = _reflect_pad(h, self.dilation)
        h = WNConv1d(self.dim, 3, dilation=self.dilation, name="block_conv1")(h)
        h = leaky_relu(h, 0.2)
        h = WNConv1d(self.dim, 1, name="block_conv2")(h)
        s = WNConv1d(self.dim, 1, name="shortcut")(x)
        return s + h


class Seanet(nn.Module):
    """(src/models/seanet.py:26-179)."""

    latent_space_size: int = 128
    ngf: int = 32
    n_residual_layers: int = 3
    resample: int = 1
    normalize: bool = True
    floor: float = 1e-3
    ratios: tp.Sequence[int] = (8, 8, 2, 2)
    in_channels: int = 1
    out_channels: int = 1
    lr_sr: int = 16000
    hr_sr: int = 16000
    upsample: bool = True

    @property
    def scale_factor(self) -> int:
        return int(self.hr_sr / self.lr_sr)

    def estimate_output_length(self, length: int) -> int:
        """Nearest valid conv length (src/models/seanet.py:123-145)."""
        depth = len(self.ratios)
        for idx in range(depth - 1, -1, -1):
            stride = self.ratios[idx]
            kernel_size = 2 * stride
            padding = stride // 2 + stride % 2
            length = math.ceil((length - kernel_size + 2 * padding) / stride) + 1
            length = max(length, 1)
        for idx in range(depth):
            stride = self.ratios[idx]
            kernel_size = 2 * stride
            padding = stride // 2 + stride % 2
            output_padding = stride % 2
            length = (length - 1) * stride + kernel_size - 2 * padding + output_padding
        return int(length)

    @nn.compact
    def __call__(self, signal, train: bool = False):
        # signal: [B, C, T] (reference layout) or [B, T]
        if signal.ndim == 2:
            signal = signal[:, None, :]
        x = jnp.swapaxes(signal, 1, 2)  # [B, T, C]

        target_len = x.shape[1]
        if self.upsample:
            target_len *= self.scale_factor

        if self.normalize:
            mono = jnp.mean(x, axis=-1, keepdims=True)
            std = jnp.std(mono, axis=1, keepdims=True, ddof=1)
            x = x / (self.floor + std)
        else:
            std = 1.0

        if self.upsample:
            x = jnp.swapaxes(resample(jnp.swapaxes(x, 1, 2), self.lr_sr,
                                      self.hr_sr), 1, 2)

        valid_length = self.estimate_output_length(x.shape[1])
        x = jnp.pad(x, ((0, 0), (0, valid_length - x.shape[1]), (0, 0)))

        mult = int(2 ** len(self.ratios))

        # --- encoder stack, ordered input -> latent (reference builds the
        # same order via insert(0, ...), seanet.py:69-111)
        skips = []

        def enc_in(h):
            h = _reflect_pad(h, 3)
            h = WNConv1d(self.ngf, 7, name="enc_in_conv")(h)
            return jnp.tanh(h)

        def enc_block(h, i):
            # reversed ratios index: encoder block j corresponds to
            # ratios[len-1-j] (insert(0) ordering)
            r = self.ratios[len(self.ratios) - 1 - i]
            m = int(2 ** (i + 1))  # mult at creation time
            dim = m * self.ngf // 2
            # reference prepends Res(3^j) for j = n-1..0, so execution
            # order is dilation 3^0, 3^1, ... (seanet.py:95-96)
            for j in range(self.n_residual_layers):
                h = ResnetBlock(dim, dilation=3 ** j,
                                name=f"enc_{i}_res_{j}")(h)
            h = leaky_relu(h, 0.2)
            h = WNConv1d(m * self.ngf, r * 2, stride=r,
                         padding=r // 2 + r % 2, name=f"enc_{i}_conv")(h)
            return h

        def enc_out(h):
            h = leaky_relu(h, 0.2)
            h = _reflect_pad(h, 3)
            return WNConv1d(self.latent_space_size, 7, name="enc_out_conv")(h)

        stages = [enc_in] + [
            (lambda h, i=i: enc_block(h, i)) for i in range(len(self.ratios))
        ] + [enc_out]

        for stage in stages:
            skips.append(x)
            x = stage(x)

        # --- decoder stack, ordered latent -> output (seanet.py:57-119)
        def dec_in(h):
            h = leaky_relu(h, 0.2)
            h = _reflect_pad(h, 3)
            return WNConv1d(mult * self.ngf, 7, name="dec_in_conv")(h)

        def dec_block(h, i):
            r = self.ratios[i]
            m = int(2 ** (len(self.ratios) - i))
            h = leaky_relu(h, 0.2)
            h = WNConvTranspose1d(m * self.ngf // 2, r * 2, stride=r,
                                  padding=r // 2 + r % 2,
                                  output_padding=r % 2,
                                  name=f"dec_{i}_convtr")(h)
            for j in range(self.n_residual_layers):
                h = ResnetBlock(m * self.ngf // 2, dilation=3 ** j,
                                name=f"dec_{i}_res_{j}")(h)
            return h

        def dec_out(h):
            h = leaky_relu(h, 0.2)
            h = _reflect_pad(h, 3)
            h = WNConv1d(self.out_channels, 7, name="dec_out_conv")(h)
            return jnp.tanh(h)

        dstages = [dec_in] + [
            (lambda h, i=i: dec_block(h, i)) for i in range(len(self.ratios))
        ] + [dec_out]

        for stage in dstages:
            x = stage(x)
            x = x + skips.pop(-1)

        if target_len < x.shape[1]:
            x = x[:, :target_len]
        out = std * x if self.normalize else x
        return jnp.swapaxes(out, 1, 2)  # back to [B, C, T]
