"""Adversarial losses: MelGAN hinge + feature matching, HiFi LS-GAN.

Parity targets:
- MelGAN discriminator/generator losses: /root/reference/src/solver.py:490-520
- HiFi feature/discriminator/generator losses:
  /root/reference/src/models/discriminators.py:211-243
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def _scale_mean(x, n_valid=None):
    """Mean over a [B, T, C] feature map; with ``n_valid`` (traced), the
    masked mean over the first n_valid time steps (bucketed-exact eval).
    Masks AFTER the caller's pointwise transform: e.g. relu(1 + 0) = 1
    at padded positions even though the feature map itself is zeroed."""
    if n_valid is None:
        return jnp.mean(x)
    mask = (jnp.arange(x.shape[1])[None, :, None] < n_valid).astype(x.dtype)
    return jnp.sum(x * mask) / (x.shape[0] * n_valid * x.shape[-1])


def melgan_discriminator_loss(disc_fake, disc_real, valid_lengths=None):
    """Hinge loss over the last (logit) map of each scale
    (solver.py:490-497). ``disc_*``: list (scales) of feature lists.
    ``valid_lengths``: per-scale per-layer traced lengths from the
    masked discriminator (bucketed-exact eval)."""
    loss = 0.0
    for i, scale in enumerate(disc_fake):
        n = valid_lengths[i][-1] if valid_lengths is not None else None
        loss += _scale_mean(
            jax.nn.relu(1 + scale[-1].astype(jnp.float32)), n)
    for i, scale in enumerate(disc_real):
        n = valid_lengths[i][-1] if valid_lengths is not None else None
        loss += _scale_mean(
            jax.nn.relu(1 - scale[-1].astype(jnp.float32)), n)
    return loss


def melgan_generator_losses(disc_fake, disc_real, n_layers: int, num_d: int,
                            valid_lengths=None):
    """Returns (adversarial, unweighted feature loss) (solver.py:499-520).
    ``valid_lengths``: see melgan_discriminator_loss."""
    features_weights = 4.0 / (n_layers + 1)
    discriminator_weights = 1.0 / num_d
    weights = discriminator_weights * features_weights

    features_loss = 0.0
    for i in range(num_d):
        for j in range(len(disc_fake[i]) - 1):
            n = valid_lengths[i][j] if valid_lengths is not None else None
            features_loss += weights * _scale_mean(
                jnp.abs(disc_fake[i][j].astype(jnp.float32)
                        - jax.lax.stop_gradient(
                            disc_real[i][j]).astype(jnp.float32)), n)

    adversarial_loss = 0.0
    for i, scale in enumerate(disc_fake):
        n = valid_lengths[i][-1] if valid_lengths is not None else None
        adversarial_loss += _scale_mean(
            jax.nn.relu(1 - scale[-1].astype(jnp.float32)), n)
    return adversarial_loss, features_loss


def _fmap_mean(x, n=None):
    """Mean over a feature map ([B, T, C] or [B, R, p, C]); with ``n``
    (traced), the masked mean over the first n entries of axis 1."""
    if n is None:
        return jnp.mean(x)
    idx = jnp.arange(x.shape[1]).reshape((1, -1) + (1,) * (x.ndim - 2))
    denom = n * (x.size // x.shape[1])
    return jnp.sum(x * (idx < n).astype(x.dtype)) / denom


def _logit_mean(x, count=None):
    """Mean over flattened logits [B, N]; with ``count`` (traced), the
    masked mean over the first count columns (bucketed-exact mode —
    the masked discriminators flatten row-major so the valid elements
    are a prefix)."""
    if count is None:
        return jnp.mean(x)
    mask = (jnp.arange(x.shape[1])[None, :] < count).astype(x.dtype)
    return jnp.sum(x * mask) / (x.shape[0] * count)


def hifi_feature_loss(fmap_r, fmap_g, lens=None):
    """Mean L1 over all layers of all sub-discriminators, averaged by
    layer count (discriminators.py:211-219). ``lens``: per-disc
    per-layer traced valid lengths from the masked discriminators
    (bucketed-exact eval)."""
    loss = 0.0
    total = 0
    for i, (dr, dg) in enumerate(zip(fmap_r, fmap_g)):
        for j, (rl, gl) in enumerate(zip(dr, dg)):
            total += 1
            n = lens[i][j] if lens is not None else None
            loss += _fmap_mean(jnp.abs(rl.astype(jnp.float32)
                                       - gl.astype(jnp.float32)), n)
    return loss / total


def hifi_discriminator_loss(disc_real_outputs, disc_generated_outputs,
                            counts=None):
    """LS-GAN discriminator loss (discriminators.py:222-233).
    ``counts``: per-disc traced valid logit counts (bucketed-exact)."""
    loss = 0.0
    for i, (dr, dg) in enumerate(zip(disc_real_outputs,
                                     disc_generated_outputs)):
        dr, dg = dr.astype(jnp.float32), dg.astype(jnp.float32)
        c = counts[i] if counts is not None else None
        loss += _logit_mean((1 - dr) ** 2, c) + _logit_mean(dg ** 2, c)
    return loss


def hifi_generator_loss(disc_outputs, counts=None):
    """LS-GAN generator loss (discriminators.py:236-243).
    ``counts``: see hifi_discriminator_loss."""
    loss = 0.0
    for i, dg in enumerate(disc_outputs):
        dg = dg.astype(jnp.float32)
        c = counts[i] if counts is not None else None
        loss += _logit_mean((1 - dg) ** 2, c)
    return loss
