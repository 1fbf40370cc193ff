"""Torch-compatible parameter initializers.

The reference relies on PyTorch's default inits plus a weight-rescale
trick (``src/models/aero.py:17-28``); GAN training dynamics are
sensitive to these, so we reproduce the *distributions* exactly:

- Conv/Linear: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in))
  with matching bias init.
- ConvTranspose: torch computes fan_in from weight layout [in, out, k]
  as out_ch * prod(kernel).
- LSTM: U(-1/sqrt(hidden), +1/sqrt(hidden)) for every weight and bias.
- ``rescale_tree``: divides every *rank-3* conv kernel (== nn.Conv1d /
  ConvTranspose1d in the reference) and its bias by
  ``(std / reference) ** 0.5``, exactly like ``rescale_module``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """Flax conv kernel (*k, in, out): torch kaiming_uniform(a=sqrt(5))."""
    fan_in = int(np.prod(shape[:-1]))  # in_ch * prod(kernel)
    return _uniform(key, shape, 1.0 / math.sqrt(fan_in), dtype)


def conv_bias_init_for(kernel_shape):
    fan_in = int(np.prod(kernel_shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, bound, dtype)

    return init


def conv_transpose_kernel_init(key, shape, dtype=jnp.float32):
    """Flax conv-transpose kernel (*k, in, out): torch fan_in = out * prod(k)."""
    spatial = int(np.prod(shape[:-2]))
    fan_in = shape[-1] * spatial
    return _uniform(key, shape, 1.0 / math.sqrt(fan_in), dtype)


def conv_transpose_bias_init_for(kernel_shape):
    spatial = int(np.prod(kernel_shape[:-2]))
    fan_in = kernel_shape[-1] * spatial
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, bound, dtype)

    return init


def linear_kernel_init(key, shape, dtype=jnp.float32):
    """Flax dense kernel (in, out): torch kaiming_uniform(a=sqrt(5))."""
    return _uniform(key, shape, 1.0 / math.sqrt(shape[0]), dtype)


def linear_bias_init_for(fan_in):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, bound, dtype)

    return init


def lstm_init_for(hidden_size):
    bound = 1.0 / math.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, bound, dtype)

    return init


def normal_init(stddev=0.02, mean=0.0):
    """MelGAN/SEANet weights_init (src/models/utils.py:38-44)."""

    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)

    return init


def rescale_tree(params, reference: float = 0.1):
    """Reproduce ``rescale_module`` (src/models/aero.py:17-28).

    Torch applies it to every nn.Conv1d/ConvTranspose1d; in our tree those
    are exactly the parameter groups whose 'kernel' has rank 3 — EXCEPT
    the decoder's ``conv_tr``: ConvTranspose2dFreq stores its (k, in,
    out) kernel rank-3 but mirrors an nn.ConvTranspose2d, which the
    reference does NOT rescale (AERO has no ConvTranspose1d anywhere).
    The bias is divided by the same per-layer scale, computed from the
    realized kernel std — identical to the reference.
    """
    if not reference:
        return params

    def walk(node, path=()):
        if isinstance(node, dict):
            kernel = node.get("kernel")
            is_conv1d_like = (
                kernel is not None and hasattr(kernel, "ndim")
                and kernel.ndim == 3
                and (not path or path[-1] != "conv_tr"))
            if is_conv1d_like:
                std = jnp.std(kernel)
                scale = jnp.sqrt(std / reference)
                out = dict(node)
                out["kernel"] = kernel / scale
                if out.get("bias") is not None:
                    out["bias"] = out["bias"] / scale
                return out
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params)
