"""Loss-value golden tests vs the reference torch implementations."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")


from src.models import discriminators as tdisc  # noqa: E402

from aero_tpu.losses.stft_loss import multi_resolution_stft_loss  # noqa: E402
from aero_tpu.losses.adversarial import (  # noqa: E402
    hifi_discriminator_loss, hifi_feature_loss, hifi_generator_loss,
)
from aero_tpu.eval.metrics import get_lsd  # noqa: E402


def test_multi_resolution_stft_loss_matches_torch():
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal((2, 32000))).astype(np.float32)
    y = (0.3 * rng.standard_normal((2, 32000))).astype(np.float32)

    # The reference's stft() uses the pre-return_complex torch API
    # (src/models/stft_loss.py:22-24, pinned to torch 1.12 — SURVEY §2.5
    # defect 7); torch 2.13 removed it, so reproduce its exact math with
    # the modern API as the oracle.
    def torch_stft_mag(sig, fft_size, hop, win_len):
        z = torch.stft(sig, fft_size, hop, win_len,
                       torch.hann_window(win_len), return_complex=True)
        mag = torch.sqrt(torch.clamp(z.real ** 2 + z.imag ** 2, min=1e-7))
        return mag.transpose(2, 1)

    def torch_mrstft(xs, ys):
        sc_total, mag_total = 0.0, 0.0
        for fs, ss, wl in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
            xm = torch_stft_mag(xs, fs, ss, wl)
            ym = torch_stft_mag(ys, fs, ss, wl)
            sc_total += torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro")
            mag_total += torch.nn.functional.l1_loss(torch.log(ym),
                                                     torch.log(xm))
        return 0.5 * sc_total / 3, 0.5 * mag_total / 3

    with torch.no_grad():
        sc_ref, mag_ref = torch_mrstft(torch.from_numpy(x),
                                       torch.from_numpy(y))

    sc, mag = multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(y),
                                         factor_sc=0.5, factor_mag=0.5)
    np.testing.assert_allclose(float(sc), float(sc_ref), rtol=2e-4)
    np.testing.assert_allclose(float(mag), float(mag_ref), rtol=2e-4)


def test_hifi_losses_match_torch():
    rng = np.random.default_rng(1)
    real = [torch.from_numpy(rng.standard_normal((2, 50)).astype(np.float32))
            for _ in range(3)]
    fake = [torch.from_numpy(rng.standard_normal((2, 50)).astype(np.float32))
            for _ in range(3)]
    fmap_r = [[torch.from_numpy(rng.standard_normal((2, 8, 10)).astype(np.float32))
               for _ in range(4)] for _ in range(3)]
    fmap_g = [[torch.from_numpy(rng.standard_normal((2, 8, 10)).astype(np.float32))
               for _ in range(4)] for _ in range(3)]

    d_ref = tdisc.discriminator_loss(real, fake)
    g_ref = tdisc.generator_loss(fake)
    f_ref = tdisc.feature_loss(fmap_r, fmap_g)

    to_j = lambda ts: [jnp.asarray(t.numpy()) for t in ts]
    d = hifi_discriminator_loss(to_j(real), to_j(fake))
    g = hifi_generator_loss(to_j(fake))
    f = hifi_feature_loss([to_j(m) for m in fmap_r], [to_j(m) for m in fmap_g])

    np.testing.assert_allclose(float(d), float(d_ref), rtol=1e-5)
    np.testing.assert_allclose(float(g), float(g_ref), rtol=1e-5)
    np.testing.assert_allclose(float(f), float(f_ref), rtol=1e-5)


def test_lsd_matches_torch_reference():
    """LSD metric parity vs /root/reference/src/metrics.py:37-70.

    (The reference module imports sox and uses the removed pre-
    return_complex stft API, so its exact math — |STFT(2048,512,hann)|
    log10-power RMS-over-freq — is reproduced inline as the oracle.)"""
    rng = np.random.default_rng(2)
    ref_sig = (0.3 * rng.standard_normal((1, 20000))).astype(np.float32)
    out_sig = ref_sig + (0.05 * rng.standard_normal((1, 20000))).astype(np.float32)

    def torch_lsd(a, b):
        def mag(x):
            z = torch.stft(x, 2048, 512, window=torch.hann_window(2048),
                           return_complex=True)
            return torch.abs(z)

        sp = torch.log10(mag(a).square().clamp(1e-8))
        st = torch.log10(mag(b).square().clamp(1e-8))
        return float((sp - st).square().mean(dim=1).sqrt().mean())

    with torch.no_grad():
        want = torch_lsd(torch.from_numpy(ref_sig), torch.from_numpy(out_sig))
    got = get_lsd(ref_sig, out_sig)
    np.testing.assert_allclose(got, want, rtol=1e-3)
