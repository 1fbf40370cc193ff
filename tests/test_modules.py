"""Unit tests for building blocks: blockwise attention == dense attention,
BLSTM chunk stitching, unfold parity, conv-transpose output sizes."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aero_tpu.models.modules import (
    BLSTM, Conv1d, ConvTranspose1d, LocalState, unfold_time,
)


def test_local_state_blockwise_matches_dense():
    """T above the block threshold must give identical results to the
    dense path (same params, same math)."""
    c, heads, t = 8, 4, 600
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))

    dense = LocalState(c, heads=heads, block_q=1024)   # dense path (T <= 2*bq)
    blocked = LocalState(c, heads=heads, block_q=128)  # blockwise path

    v = dense.init(jax.random.PRNGKey(0), x)
    y_dense = dense.apply(v, x)
    y_block = blocked.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_block), np.asarray(y_dense),
                               atol=2e-5)


def test_local_state_smallt_pallas_dispatch_matches_dense(monkeypatch):
    """AERO_ATTN_SMALLT=pallas routes T <= 2*block_q through the fused
    Pallas custom-vjp kernel (interpret mode here) — values AND grads
    must match the default dense dispatch. Guards the r5 opt-in knob
    (PERF.md 'Small-T attention dispatch — settled wash')."""
    from aero_tpu.ops import attention as attn

    c, heads, t = 8, 4, 300
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))

    m = LocalState(c, heads=heads, block_q=256)  # t <= 2*block_q
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(vv, xx):
        return jnp.sum(jnp.sin(m.apply(vv, xx)))

    y_dense = m.apply(v, x)
    g_dense = jax.grad(loss)(v, x)

    monkeypatch.setattr(attn, "_INTERPRET", True)
    monkeypatch.setenv("AERO_ATTN_SMALLT", "pallas")
    y_pallas = m.apply(v, x)
    g_pallas = jax.grad(loss)(v, x)

    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_dense),
                               atol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4),
        g_pallas, g_dense)


def test_local_state_matches_torch():
    """Dense + analytic rank-1 decay vs the reference einsum formulation."""
    import sys

    sys.path.insert(0, "/root/reference")
    from src.models.modules import LocalState as TorchLocalState

    torch.manual_seed(0)
    c, t = 8, 100
    tm = TorchLocalState(c, heads=4, nfreqs=0, ndecay=4)
    tm.eval()
    jm = LocalState(c, heads=4, ndecay=4)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, c, t)).astype(np.float32)
    xj = jnp.asarray(np.swapaxes(x, 1, 2))

    v = jm.init(jax.random.PRNGKey(0), xj)
    params = jax.tree.map(np.asarray, dict(v))["params"]
    sd = {k: v_.detach().numpy() for k, v_ in tm.state_dict().items()}
    for name in ("content", "query", "key", "query_decay", "proj"):
        params[name]["conv"]["kernel"] = np.transpose(sd[f"{name}.weight"],
                                                      (2, 1, 0))
        params[name]["conv"]["bias"] = sd[f"{name}.bias"]

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.swapaxes(np.asarray(jm.apply({"params": params}, xj)), 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_unfold_matches_torch_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from src.utils import unfold as torch_unfold

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 501)).astype(np.float32)
    want = torch_unfold(torch.from_numpy(x), 200, 100).numpy()  # [B,C,F,K]
    got = np.asarray(unfold_time(
        jnp.asarray(np.transpose(x, (0, 2, 1))), 200, 100))  # [B,F,K,C]
    got = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=0)


def test_blstm_chunking_matches_torch():
    import sys

    sys.path.insert(0, "/root/reference")
    from src.models.modules import BLSTM as TorchBLSTM

    torch.manual_seed(0)
    dim, t = 4, 501  # > max_steps=200 -> chunked path
    tm = TorchBLSTM(dim, layers=2, max_steps=200, skip=True)
    tm.eval()
    jm = BLSTM(dim, layers=2, max_steps=200, skip=True)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, dim, t)).astype(np.float32)
    xj = jnp.asarray(np.swapaxes(x, 1, 2))
    v = jm.init(jax.random.PRNGKey(0), xj)
    params = jax.tree.map(np.asarray, dict(v))["params"]

    sd = {k: v_.detach().numpy() for k, v_ in tm.state_dict().items()}
    for layer in range(2):
        for d, suffix in ((0, ""), (1, "_reverse")):
            pref = f"l{layer}_d{d}"
            params["lstm"][f"{pref}_w_ih"] = sd[f"lstm.weight_ih_l{layer}{suffix}"].T
            params["lstm"][f"{pref}_w_hh"] = sd[f"lstm.weight_hh_l{layer}{suffix}"].T
            params["lstm"][f"{pref}_b_ih"] = sd[f"lstm.bias_ih_l{layer}{suffix}"]
            params["lstm"][f"{pref}_b_hh"] = sd[f"lstm.bias_hh_l{layer}{suffix}"]
    params["linear"]["kernel"] = sd["linear.weight"].T
    params["linear"]["bias"] = sd["linear.bias"]

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.swapaxes(np.asarray(jm.apply({"params": params}, xj)), 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_conv_transpose_output_size():
    x = jnp.zeros((1, 10, 3))
    m = ConvTranspose1d(4, kernel_size=8, stride=4, padding=2,
                        output_padding=0)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    # torch: (in-1)*stride + kernel - 2*pad = 9*4 + 8 - 4 = 40
    assert y.shape == (1, 40, 4)


def test_conv_transpose_subpixel_matches_xla_lowering():
    """The default polyphase lowering must be numerically identical to
    the lhs_dilation XLA form (AERO_CONVT=xla) for every stride/kernel/
    padding combination the models use — including k % s != 0, where
    the phase-padded kernel taps must contribute exactly nothing."""
    from aero_tpu.models.modules import _conv_transpose, _conv_transpose_subpixel

    rng = np.random.default_rng(3)
    for k, s, p in [(8, 4, 2), (8, 2, 3), (4, 2, 1), (16, 8, 4),
                    (7, 4, 0), (5, 2, 2), (8, 4, 0), (3, 2, 0)]:
        x = jnp.asarray(rng.standard_normal((2, 11, 3)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((k, 3, 5)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, jnp.flip(w, 0), window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p)], lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        for variant in ("matmul", "conv"):
            got = _conv_transpose_subpixel(x, w, s, p, variant=variant)
            assert got.shape == ref.shape, (k, s, p, variant)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=1e-5,
                err_msg=f"k={k} s={s} p={p} {variant}")
    # stride 1 short-circuits to the XLA form inside _conv_transpose
    x = jnp.asarray(rng.standard_normal((2, 11, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 3, 4)).astype(np.float32))
    y = _conv_transpose(x, w, 1, 2, axis=-2)
    assert y.shape == (2, 11 + 5 - 1 - 4, 4)


@pytest.mark.parametrize("mode", ["poly", "polyconv"])
def test_strided_conv_polygrad_matches_autodiff(monkeypatch, mode):
    """The custom-VJP strided conv (polyphase input-gradient, opt-in
    AERO_CONVGRAD=poly|polyconv) must match XLA autodiff exactly:
    forward, dx (incl. the rows past the torch-formula output length
    that the final strided window DOES touch), and dw — at the
    discriminators' real tap/stride geometry (k=41, s=4, p=20) and
    odd-remainder lengths. ``poly`` lowers dx as A slice+matmuls,
    ``polyconv`` as one dense stride-1 conv; both must agree with XLA."""
    from aero_tpu.models.modules import (_strided_conv1d_raw,
                                         strided_conv1d_polygrad)

    monkeypatch.setenv("AERO_CONVGRAD", mode)

    rng = np.random.default_rng(7)
    for k, s, p, L in [(41, 4, 20, 997), (41, 4, 20, 1024), (15, 2, 7, 64),
                       (8, 4, 2, 57), (5, 3, 1, 40)]:
        x = jnp.asarray(rng.standard_normal((2, L, 6)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((k, 6, 8)).astype(np.float32))
        y_ref = _strided_conv1d_raw(x, w, s, p)
        y_got = strided_conv1d_polygrad(x, w, s, p)
        np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                                   atol=1e-6)
        gx_ref, gw_ref = jax.grad(
            lambda a, b: jnp.sum(jnp.sin(_strided_conv1d_raw(a, b, s, p))),
            argnums=(0, 1))(x, w)
        gx_got, gw_got = jax.grad(
            lambda a, b: jnp.sum(jnp.sin(strided_conv1d_polygrad(a, b, s, p))),
            argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                                   atol=2e-5, err_msg=f"dx k={k} s={s} L={L}")
        np.testing.assert_allclose(np.asarray(gw_got), np.asarray(gw_ref),
                                   atol=2e-4, err_msg=f"dw k={k} s={s} L={L}")
    # stride 1 passes through to the raw conv (no custom_vjp)
    x = jnp.asarray(rng.standard_normal((1, 33, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 4, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(strided_conv1d_polygrad(x, w, 1, 2)),
        np.asarray(_strided_conv1d_raw(x, w, 1, 2)), atol=1e-6)


def test_local_state_nfreqs_matches_torch_fixed():
    """The reference's nfreqs periodic-bias branch is NameError-dead
    (modules.py:108 uses math.pi without importing math). Inject the
    missing import to obtain a runnable oracle and verify our fixed
    implementation against it."""
    import math
    import sys

    sys.path.insert(0, "/root/reference")
    import src.models.modules as ref_modules

    ref_modules.math = math  # fix reference defect 2 (SURVEY §2.5.2)
    torch.manual_seed(0)
    c, t, nf = 8, 100, 3
    tm = ref_modules.LocalState(c, heads=4, nfreqs=nf, ndecay=4)
    tm.eval()
    jm = LocalState(c, heads=4, ndecay=4, nfreqs=nf)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, c, t)).astype(np.float32)
    xj = jnp.asarray(np.swapaxes(x, 1, 2))

    v = jm.init(jax.random.PRNGKey(0), xj)
    params = jax.tree.map(np.asarray, dict(v))["params"]
    sd = {k: v_.detach().numpy() for k, v_ in tm.state_dict().items()}
    for name in ("content", "query", "key", "query_decay", "query_freqs",
                 "proj"):
        params[name]["conv"]["kernel"] = np.transpose(sd[f"{name}.weight"],
                                                      (2, 1, 0))
        params[name]["conv"]["bias"] = sd[f"{name}.bias"]

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.swapaxes(np.asarray(jm.apply({"params": params}, xj)), 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_local_state_nfreqs_blockwise_matches_dense():
    c, heads, t, nf = 8, 4, 600, 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    dense = LocalState(c, heads=heads, nfreqs=nf, block_q=1024)
    blocked = LocalState(c, heads=heads, nfreqs=nf, block_q=128)
    v = dense.init(jax.random.PRNGKey(0), x)
    y_dense = dense.apply(v, x)
    y_block = blocked.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_block), np.asarray(y_dense),
                               atol=2e-5)


def test_query_decay_init_parity():
    """Reference initializes query_decay with weight*0.01, bias=-2 so the
    sigmoid starts near zero -> maximum initial attention window
    (reference modules.py:85-88)."""
    c, t = 8, 32
    x = jnp.zeros((1, t, c))
    jm = LocalState(c, heads=4, ndecay=4)
    v = jm.init(jax.random.PRNGKey(0), x)
    qd = v["params"]["query_decay"]["conv"]
    np.testing.assert_allclose(np.asarray(qd["bias"]), -2.0)
    # plain conv init bound is 1/sqrt(8) ~ 0.35; after *0.01: <= 0.0036
    assert float(np.abs(np.asarray(qd["kernel"])).max()) < 0.004
    # regular convs keep the plain init
    qk = v["params"]["query"]["conv"]["kernel"]
    assert float(np.abs(np.asarray(qk)).max()) > 0.01


def test_freq_conv_blocked_negative_right_pad():
    """Shapes where (F + 2p - k) % s > p used to compute a negative
    right pad and crash jnp.pad (advisor finding r2). The blocked path
    must match lax.conv on them (the stride skips the tail rows)."""
    from aero_tpu.models.modules import _freq_conv_blocked

    rng = np.random.default_rng(0)
    for f, k, s, pad in [(259, 8, 4, 2), (16, 8, 4, 2), (257, 8, 4, 2),
                         (63, 4, 2, 1), (64, 4, 2, 1)]:
        x = jnp.asarray(rng.standard_normal((2, f, 5, 3)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((k, 3, 4)).astype(np.float32))
        got = _freq_conv_blocked(x, w, s, pad)
        want = jax.lax.conv_general_dilated(
            jnp.transpose(x, (0, 3, 1, 2)),
            jnp.transpose(w, (0, 1, 2))[:, None].transpose(3, 2, 0, 1),
            (s, 1), [(pad, pad), (0, 0)])
        want = jnp.transpose(want, (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_grouped_conv_dense_lowering_matches_grouped():
    """The dense block-diagonal lowering (AERO_DISC_CONV=auto/dense) must
    equal XLA's feature_group_count form, fwd and grad, at every MelGAN
    discriminator group count (groups = 4/16/64/256)."""
    from aero_tpu.models import discriminators as D

    rng = np.random.default_rng(3)
    for (t, cin, cout, k, s, g) in [
        (512, 16, 64, 41, 4, 4),
        (256, 64, 256, 41, 4, 16),
        (128, 256, 512, 41, 4, 64),
        (64, 512, 512, 41, 4, 256),
    ]:
        x = jnp.asarray(rng.standard_normal((2, t, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((k, cin // g, cout)).astype(np.float32))

        def run(x, w, dense):
            wd = D._dense_blockdiag(w, g) if dense else w
            return jax.lax.conv_general_dilated(
                x, wd, (s,), [(s * 5, s * 5)],
                feature_group_count=1 if dense else g,
                dimension_numbers=("NWC", "WIO", "NWC"))

        y_g = run(x, w, dense=False)
        y_d = run(x, w, dense=True)
        np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_g),
                                   rtol=1e-5, atol=1e-4)

        loss = lambda w, dense: jnp.sum(jnp.sin(run(x, w, dense)))
        g_g = jax.grad(loss)(w, False)
        g_d = jax.grad(loss)(w, True)
        np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_g),
                                   rtol=1e-4, atol=3e-4)


def test_rescale_tree_exempts_decoder_conv_tr():
    """rescale_module targets ONLY nn.Conv1d/ConvTranspose1d (reference
    aero.py:25-28); the decoder's conv_tr mirrors nn.ConvTranspose2d
    (exempt) even though its kernel is stored rank-3, while dconv-branch
    Conv1d kernels (and FTB's conv1d) must be rescaled."""
    from aero_tpu.models.init import rescale_tree

    rng = np.random.default_rng(0)
    k_tr = (5 * rng.standard_normal((8, 16, 4))).astype(np.float32)
    k_c1 = (5 * rng.standard_normal((3, 16, 16))).astype(np.float32)
    k_ftb = (5 * rng.standard_normal((9, 80, 16))).astype(np.float32)
    params = {
        "decoder_0": {
            "conv_tr": {"kernel": k_tr, "bias": np.ones(4, np.float32)},
            "dconv": {"layers_0_conv1": {"conv": {
                "kernel": k_c1, "bias": np.ones(16, np.float32)}}},
        },
        "encoder_0": {"freq_attn_block": {"conv1d": {"conv": {
            "kernel": k_ftb, "bias": np.ones(16, np.float32)}}}},
    }
    out = rescale_tree(params, 0.1)
    # ConvTranspose2d-equivalent: untouched
    np.testing.assert_array_equal(
        np.asarray(out["decoder_0"]["conv_tr"]["kernel"]), k_tr)
    np.testing.assert_array_equal(
        np.asarray(out["decoder_0"]["conv_tr"]["bias"]),
        np.ones(4, np.float32))
    # Conv1d-equivalents: kernel AND bias divided by sqrt(std/ref)
    for got, k in ((out["decoder_0"]["dconv"]["layers_0_conv1"]["conv"],
                    k_c1),
                   (out["encoder_0"]["freq_attn_block"]["conv1d"]["conv"],
                    k_ftb)):
        scale = np.sqrt(k.std() / 0.1)
        np.testing.assert_allclose(np.asarray(got["kernel"]), k / scale,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got["bias"]),
                                   np.ones_like(got["bias"]) / scale,
                                   rtol=1e-5)
