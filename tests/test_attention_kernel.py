"""Pallas fused local-attention kernel vs the JAX reference (interpret
mode on CPU) — values and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aero_tpu.ops import attention as attn


@pytest.fixture(autouse=True)
def interpret_mode():
    old = attn._INTERPRET
    attn._INTERPRET = True
    yield
    attn._INTERPRET = old


def _inputs(b=2, t=300, h=2, c=12, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, h, c)).astype(np.float32)) / np.sqrt(c)
    k = jnp.asarray(rng.standard_normal((b, t, h, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, c)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.random((b, t, h)).astype(np.float32))
    return q, k, v, w


def test_pallas_matches_reference():
    q, k, v, w = _inputs()
    want = np.asarray(attn.reference_attention(q, k, v, w))
    got = np.asarray(attn.pallas_attention(q, k, v, w, block_q=128,
                                           block_k=128))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_ragged_t():
    """T not a multiple of either block size (padding masks correct)."""
    q, k, v, w = _inputs(t=137)
    want = np.asarray(attn.reference_attention(q, k, v, w))
    got = np.asarray(attn.pallas_attention(q, k, v, w, block_q=64,
                                           block_k=64))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_gradients_match_reference():
    q, k, v, w = _inputs(t=130)

    def loss_fused(args):
        return jnp.sum(attn.fused_local_attention(*args) ** 2)

    def loss_ref(args):
        return jnp.sum(attn.reference_attention(*args) ** 2)

    g_fused = jax.grad(loss_fused)((q, k, v, w))
    g_ref = jax.grad(loss_ref)((q, k, v, w))
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_backward_kernel_exact():
    """The flash-style Pallas backward (O(T*C) memory) vs the dense vjp.

    Ragged T (pad-masking in the recomputed softmax), tiny head dim like
    the real model (C'=6), nonlinear downstream loss so every grad path
    (dq/dk/dv/dw incl. the zeroed self-mask diagonal) is exercised.
    Target tolerance from VERDICT item 4: <= 1e-5 relative.
    """
    q, k, v, w = _inputs(t=700, h=4, c=6, seed=3)

    def loss_fused(args):
        return jnp.sum(jnp.sin(attn.fused_local_attention(*args)))

    def loss_ref(args):
        return jnp.sum(jnp.sin(attn.reference_attention(*args)))

    g_fused = jax.grad(loss_fused)((q, k, v, w))
    g_ref = jax.grad(loss_ref)((q, k, v, w))
    for name, a, b in zip("qkvw", g_fused, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert err < 1e-5, f"d{name} rel err {err}"


def test_gridded_kernel_matches_reference():
    """Unequal q/k blocks force the GRIDDED online-softmax kernel
    (t_q != t_k routes past the resident gate) — the production path on
    TPU whenever round_up(t,128) != round_up(t,256), e.g. t=2400."""
    q, k, v, w = _inputs(t=300)
    want = np.asarray(attn.reference_attention(q, k, v, w))
    got = np.asarray(attn.pallas_attention(q, k, v, w, block_q=64,
                                           block_k=128))
    np.testing.assert_allclose(got, want, atol=2e-5)

    # default block choice at a t where t_q != t_k (the real-model case)
    q, k, v, w = _inputs(b=1, t=2400, h=1, seed=3)
    want = np.asarray(attn.reference_attention(q, k, v, w))
    got = np.asarray(attn.pallas_attention(q, k, v, w))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_blockwise_attention_matches_reference_values_and_grads():
    """The memory-bounded fallback (checkpointed query-block scan) used
    beyond the Pallas kernels' VMEM limits."""
    q, k, v, w = _inputs(t=137)

    want = np.asarray(attn.reference_attention(q, k, v, w))
    got = np.asarray(attn.blockwise_attention(q, k, v, w, block_q=64))
    np.testing.assert_allclose(got, want, atol=2e-5)

    def loss_blk(args):
        return jnp.sum(attn.blockwise_attention(*args, block_q=64) ** 2)

    def loss_ref(args):
        return jnp.sum(attn.reference_attention(*args) ** 2)

    g_blk = jax.grad(loss_blk)((q, k, v, w))
    g_ref = jax.grad(loss_ref)((q, k, v, w))
    for a, b in zip(g_blk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_long_t_routes_to_blockwise():
    """T > MAX_PALLAS_T: fused_local_attention must run the blockwise
    fallback forward AND backward (the Pallas kernels would blow VMEM;
    a dense T x T vjp would blow HBM at eval lengths)."""
    t = attn.MAX_PALLAS_T + 64
    q, k, v, w = _inputs(b=1, t=t, h=1, seed=5)

    want = np.asarray(attn.reference_attention(q, k, v, w))
    got = np.asarray(attn.fused_local_attention(q, k, v, w))
    np.testing.assert_allclose(got, want, atol=3e-5)

    def loss_fused(args):
        return jnp.sum(attn.fused_local_attention(*args) ** 2)

    def loss_ref(args):
        return jnp.sum(attn.reference_attention(*args) ** 2)

    g_fused = jax.grad(loss_fused)((q, k, v, w))
    g_ref = jax.grad(loss_ref)((q, k, v, w))
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_bwd_mid_t_uses_blockwise_fallback():
    """2048 < T <= MAX_PALLAS_T: Pallas forward, blockwise-checkpoint
    backward (the Pallas bwd VMEM gate) — gradients must still match."""
    q, k, v, w = _inputs(b=1, t=2100, h=1, seed=7)

    def loss_fused(args):
        return jnp.sum(attn.fused_local_attention(*args) ** 2)

    def loss_ref(args):
        return jnp.sum(attn.reference_attention(*args) ** 2)

    g_fused = jax.grad(loss_fused)((q, k, v, w))
    g_ref = jax.grad(loss_ref)((q, k, v, w))
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_banded_blockwise_matches_banded_reference():
    """Banded blockwise (dynamic_slice key windows) == dense banded
    reference — values and grads, ragged T, window clipped at both
    edges."""
    for t, band, bq in [(300, 64, 64), (137, 32, 64), (512, 100, 128)]:
        q, k, v, w = _inputs(t=t, seed=11)
        want = np.asarray(attn.banded_reference_attention(q, k, v, w, band))
        got = np.asarray(attn.banded_blockwise_attention(q, k, v, w, band,
                                                         block_q=bq))
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"t={t} band={band}")

    q, k, v, w = _inputs(t=300, seed=12)

    def loss_blk(args):
        return jnp.sum(jnp.sin(
            attn.banded_blockwise_attention(*args, 64, block_q=64)))

    def loss_ref(args):
        return jnp.sum(jnp.sin(
            attn.banded_reference_attention(*args, 64)))

    g_blk = jax.grad(loss_blk)((q, k, v, w))
    g_ref = jax.grad(loss_ref)((q, k, v, w))
    for name, a, b in zip("qkvw", g_blk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")


def test_banded_pallas_matches_banded_reference():
    """Banded Pallas kernel (static-trip key-block loop, clamp+mask) ==
    dense banded reference, incl. ragged T where the clamped duplicate
    last block must contribute nothing."""
    for t, band in [(300, 64), (137, 32), (1000, 128), (999, 128)]:
        q, k, v, w = _inputs(t=t, seed=13)
        want = np.asarray(attn.banded_reference_attention(q, k, v, w, band))
        got = np.asarray(attn.banded_pallas_attention(q, k, v, w, band,
                                                      block_q=64,
                                                      block_k=64))
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"t={t} band={band}")


def test_banded_local_attention_fwd_bwd():
    """The public custom_vjp entry: pallas fwd (interpret), blockwise-vjp
    bwd — grads must match autodiff of the dense banded reference."""
    q, k, v, w = _inputs(t=400, seed=14)
    band = 96

    want = np.asarray(attn.banded_reference_attention(q, k, v, w, band))
    got = np.asarray(attn.banded_local_attention(q, k, v, w, band))
    np.testing.assert_allclose(got, want, atol=2e-5)

    def loss_banded(args):
        return jnp.sum(jnp.sin(attn.banded_local_attention(*args, band)))

    def loss_ref(args):
        return jnp.sum(jnp.sin(attn.banded_reference_attention(*args, band)))

    g_b = jax.grad(loss_banded)((q, k, v, w))
    g_r = jax.grad(loss_ref)((q, k, v, w))
    for name, a, b in zip("qkvw", g_b, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")


def test_banded_wide_band_equals_exact():
    """band >= T-1 excludes nothing: banded == exact attention."""
    q, k, v, w = _inputs(t=200, seed=15)
    want = np.asarray(attn.reference_attention(q, k, v, w))
    got = np.asarray(attn.banded_local_attention(q, k, v, w, 199))
    np.testing.assert_allclose(got, want, atol=2e-5)
