"""On-TPU correctness harness for the Mosaic-compiled Pallas kernels.

All kernel unit tests run interpret-mode on CPU
(tests/test_attention_kernel.py etc.); this tool closes the gap VERDICT
r3 #3 called out: the Mosaic-COMPILED code path was exercised only by
perf benches that check no output values. Runs `fused_local_attention`
forward AND backward on the real chip at the model's train shape
(T~500), eval shape (T~2501, where the kernel engages — modules.py
use_pallas gate) and long-eval shapes (T=6891..12288 — 27..49 s files,
the blockwise fallback past MAX_PALLAS_T), plus the FTB tail kernel at
the enc1 shape, and
asserts against `reference_attention` / the composed XLA FTB math.

Shapes mirror the canonical model: rows = B*F after the per-freq-row
fold, heads=4, C'=12 (tools/profile_attn.py defaults); batch is shrunk
at long T so the DENSE reference fits HBM (B*H*T^2 f32 scores).

Usage: python tools/pallas_tpu_parity.py          # on the chip
       AERO_PLATFORM=cpu python tools/pallas_tpu_parity.py  # interpret smoke

Exit 0 = all parity cases pass; nonzero otherwise. Record green runs in
STATUS.md next to the kernel-perf claims.
"""

import sys

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aero_tpu.ops import attention as at  # noqa: E402
from aero_tpu.ops import ftb as ftb_ops  # noqa: E402

FAILURES = []


def _rel(err, ref):
    scale = float(np.abs(ref).max()) or 1.0
    return float(np.abs(err).max()) / scale


def check(name, got, want, tol):
    got = np.asarray(jax.device_get(got), np.float32)
    want = np.asarray(jax.device_get(want), np.float32)
    r = _rel(got - want, want)
    ok = np.isfinite(got).all() and r < tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max rel err {r:.3e} "
          f"(tol {tol:g})")
    if not ok:
        FAILURES.append(name)


def attn_inputs(b, t, heads=4, ch=12, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, t, heads, ch)).astype(np.float32) \
        / np.sqrt(ch)
    k = rng.standard_normal((b, t, heads, ch)).astype(np.float32)
    v = rng.standard_normal((b, t, heads, ch)).astype(np.float32)
    # decay_w in the model: sigmoid(..)/2 . [1..ndecay] / sqrt(ndecay),
    # small positive
    w = (0.05 + 0.5 * rng.random((b, t, heads))).astype(np.float32)
    cast = lambda x: jnp.asarray(x, dtype)  # noqa: E731
    return cast(q), cast(k), cast(v), cast(w)


def attn_forward_cases():
    # (label, B, T, dtype, tol); B shrinks with T so the dense reference
    # scores [B, H, T, T] f32 fit HBM.
    # Tolerances: on TPU BOTH the kernel and the dense reference run
    # their MXU dots at default precision (bf16 mantissa, f32
    # accumulate), so f32-input parity is bounded by rounding ORDER
    # (~2e-3 measured), not f32 eps. A miscompile (wrong indices,
    # garbage tiles, bad masks) produces O(1) errors — that is what
    # this harness is for.
    cases = [
        ("fwd train T=500 f32", 128, 500, jnp.float32, 1e-2),
        ("fwd train T=500 bf16", 128, 500, jnp.bfloat16, 3e-2),
        ("fwd eval T=2501 f32 (gridded path)", 16, 2501, jnp.float32, 1e-2),
        ("fwd eval T=2501 bf16 (resident path)", 16, 2501,
         jnp.bfloat16, 3e-2),
        ("fwd T=3000 bf16 (resident, near gate)", 8, 3000,
         jnp.bfloat16, 3e-2),
        ("fwd T=4000 f32 (gridded, near MAX_PALLAS_T)", 4, 4000,
         jnp.float32, 1e-2),
        ("fwd long T=6891 f32 (blockwise fallback)", 2, 6891,
         jnp.float32, 1e-2),
        # 30 s+ files (VERDICT r4 #7): ~36 s and ~49 s at the canonical
        # ~250 frames/s attention rate, deep in the blockwise fallback;
        # B=1 so the dense reference's [B,H,T,T] f32 scores fit HBM
        ("fwd long T=9000 f32 (blockwise, 36 s)", 1, 9000,
         jnp.float32, 1e-2),
        ("fwd long T=12288 bf16 (blockwise, 49 s)", 1, 12288,
         jnp.bfloat16, 3e-2),
    ]
    for label, b, t, dtype, tol in cases:
        try:
            q, k, v, w = attn_inputs(b, t, dtype=dtype, seed=t)
            got = jax.jit(at.fused_local_attention)(q, k, v, w)
            want = jax.jit(at.reference_attention)(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), w.astype(jnp.float32))
            check(label, got, want, tol)
        except Exception as e:  # noqa: BLE001 — report, keep going
            print(f"FAIL {label}: {str(e).splitlines()[0][:140]}")
            FAILURES.append(label)


def attn_backward_cases():
    # bwd Mosaic kernel engages for T <= 2048; T=2501 exercises the
    # checkpointed blockwise vjp fallback on-chip
    # f32 pallas bwd caps at T=1024 (VMEM; r4 fix), bf16 at 2048; longer
    # T takes the checkpointed blockwise vjp
    cases = [
        ("bwd train T=500 f32 (pallas)", 64, 500, jnp.float32, 2e-2),
        ("bwd T=1024 f32 (pallas, at the f32 VMEM gate)", 8, 1024,
         jnp.float32, 2e-2),
        ("bwd T=2048 bf16 (pallas, at the bf16 VMEM gate)", 8, 2048,
         jnp.bfloat16, 6e-2),
        ("bwd T=2048 f32 (blockwise vjp past the f32 gate)", 8, 2048,
         jnp.float32, 2e-2),
        ("bwd eval T=2501 f32 (blockwise vjp)", 8, 2501, jnp.float32, 2e-2),
        # 30 s+ file backward (f32 eval grads on long files, VERDICT r4
        # #7); B=1 bounds the dense-reference backward's T^2 live set
        ("bwd long T=6891 f32 (blockwise vjp, 27 s)", 1, 6891,
         jnp.float32, 2e-2),
    ]
    for label, b, t, dtype, tol in cases:
        try:
            q, k, v, w = attn_inputs(b, t, dtype=dtype, seed=10 * t + 1)
            g = jnp.asarray(np.random.default_rng(t).standard_normal(
                q.shape).astype(np.float32))

            def loss(fn, q, k, v, w):
                return jnp.sum(fn(q, k, v, w) * g)

            got = jax.jit(jax.grad(
                lambda *a: loss(at.fused_local_attention, *a),
                argnums=(0, 1, 2, 3)))(q, k, v, w)
            want = jax.jit(jax.grad(
                lambda *a: loss(at.reference_attention, *a),
                argnums=(0, 1, 2, 3)))(q, k, v, w)
            for name, gg, ww in zip(("dq", "dk", "dv", "dw"), got, want):
                check(f"{label} {name}", gg, ww, tol)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {label}: {str(e).splitlines()[0][:140]}")
            FAILURES.append(label)


def ftb_cases():
    # both encoder shapes compile since the r5 F-grid (the old whole-F
    # block at enc0 was the Mosaic reject); the kernel itself is a
    # SETTLED PERF NEGATIVE (composed XLA tail is at its traffic
    # roofline, PERF.md) — these cases keep the opt-in path honest.
    for label, f, c, t, expect_ok in (
            ("ftb enc1 F=64 C=96 T=2501", 64, 96, 2501, True),
            ("ftb enc0 F=256 C=48 T=2501", 256, 48, 2501, True)):
        rng = np.random.default_rng(f)
        b = 4
        x = jnp.asarray(rng.standard_normal((b, f, t, c)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
        ka = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
        kb = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
        wf = jnp.asarray(rng.standard_normal((f, f)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)

        def composed(x, h, ka, kb, wf, b2):
            att = h[:, None, :, :] * x
            m = jnp.einsum("bftc,cd->bftd", att, ka)
            m = jnp.einsum("gf,bftc->bgtc", wf, m)
            return jax.nn.relu(m + jnp.einsum("bftc,cd->bftd", x, kb)
                               + b2[None, None, None, :])

        want = jax.jit(composed)(x, h, ka, kb, wf, b2)
        try:
            got = jax.jit(lambda *a: ftb_ops.ftb_tail(*a))(
                x, h, ka, kb, wf, b2)
            # same MXU default-precision bound as the attention cases
            check(label, got, want, 1e-2)
        except Exception as e:  # Mosaic compile reject
            msg = str(e).splitlines()[0][:100]
            if expect_ok:
                print(f"FAIL {label}: kernel failed to compile: {msg}")
                FAILURES.append(label)
            else:
                print(f"INFO {label}: Mosaic reject as documented ({msg})")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    if dev.platform not in ("tpu", "axon"):
        print("WARNING: not a TPU — running interpret-mode smoke only")
        at._INTERPRET = True
        ftb_ops._INTERPRET = True
    attn_forward_cases()
    attn_backward_cases()
    ftb_cases()
    if FAILURES:
        print(f"\n{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    print("\nall Pallas parity cases PASS")


if __name__ == "__main__":
    main()
