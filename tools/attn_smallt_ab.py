"""Small-T attention dispatch A/B (round 5).

The train-side MFU table showed the LocalState attention blocks at the
2 s TRAIN geometry (T=501) running at 0.4-2% MFU: the resident Pallas
kernel's grid is one cell per (batch*F*heads) row — 1024 cells at enc2
— and at T=501 each cell's work is so small that per-cell dispatch
overhead dominates (the same kernel is emission-bound and optimal at
the 10 s EVAL geometry, T=2501; PERF.md "Attention").

Candidates per site (fwd and fwd+bwd, latency-compensated in-jit
loops, bf16):
  pallas    — current default (ops/attention.pallas_attention)
  dense     — reference_attention: XLA einsum, T x T scores materialize
              in HBM (fine at T~500: B*H*T*T*2B ~ 0.5 GB traffic)
  blockwise — checkpointed q-block scan (block_q=512 -> single block)

Usage: python tools/attn_smallt_ab.py [T=501] [reps=8]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.ops import attention as A  # noqa: E402


def timed(fn, args, reps=8, trials=5):
    """Latency-compensated ms/call: reps inside one jit minus a
    same-structure trivial loop (verify-skill methodology)."""

    def looped(*a):
        def body(i, acc):
            out = fn(a[0] * (1.0 + 1e-9 * acc), *a[1:])
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.sum(x.astype(jnp.float32)) * 1e-9
                             for x in leaves)

        return jax.lax.fori_loop(0, reps, body, 0.0)

    f = jax.jit(looped)
    _ = float(f(*args))
    ts = []
    for _i in range(trials):
        t0 = time.perf_counter()
        _ = float(f(*args))
        ts.append(time.perf_counter() - t0)
    t_loop = statistics.median(ts)

    g = jax.jit(lambda x: jax.lax.fori_loop(
        0, reps, lambda i, a: a + jnp.sum(x.astype(jnp.float32)) * 1e-9,
        0.0))
    _ = float(g(args[0]))
    t0 = time.perf_counter()
    _ = float(g(args[0]))
    overhead = time.perf_counter() - t0
    return max(0.0, (t_loop - overhead) / reps) * 1e3


def make_inputs(rows, t, heads, c, rng):
    def mk():
        return jnp.asarray(0.1 * rng.standard_normal((rows, t, heads, c)),
                           jnp.bfloat16)

    q, k, v = mk(), mk(), mk()
    # decay_w: [B, T, H], positive (sigmoid-of-logit in the module)
    w = jnp.asarray(0.05 * np.abs(rng.standard_normal((rows, t, heads))),
                    jnp.bfloat16)
    return q, k, v, w


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    t = int(kv.get("T", 501))
    reps = int(kv.get("reps", 8))
    rng = np.random.default_rng(0)

    sites = {  # train geometry: B=16, 2 s segments
        "enc2": (16 * 16, 4, 12),   # rows = B*F, heads, c_head
        "enc3": (16 * 8, 4, 24),
    }
    variants = {
        "pallas": A.pallas_attention,
        "dense": A.reference_attention,
        "blockwise": A.blockwise_attention,
    }

    for site, (rows, heads, c) in sites.items():
        q, k, v, w = make_inputs(rows, t, heads, c, rng)
        print(f"--- {site}: rows={rows} T={t} heads={heads} c={c} bf16")
        ref = None
        for name, fn in variants.items():
            out = jax.jit(fn)(q, k, v, w)
            out_np = np.asarray(out, np.float32)
            if ref is None:
                ref = out_np
            err = float(np.max(np.abs(out_np - ref))
                        / (np.max(np.abs(ref)) + 1e-9))
            ms_f = timed(fn, (q, k, v, w), reps=reps)

            if name == "pallas":
                # raw pallas_call has no VJP; its bwd is the custom-vjp
                # pallas_attention_bwd — measured via the SHIPPED row
                ms_b = float("nan")
            else:
                def fwd_bwd(qq, kk, vv, ww, f=fn):
                    def scalar(*a):
                        return jnp.sum(f(*a).astype(jnp.float32))

                    return jax.grad(scalar, argnums=(0, 1, 2, 3))(
                        qq, kk, vv, ww)

                ms_b = timed(fwd_bwd, (q, k, v, w), reps=reps)
            print(f"  {name:10s} fwd {ms_f:7.2f} ms   fwd+bwd {ms_b:7.2f} ms"
                  f"   max-rel-err {err:.2e}")

        # the shipped custom-vjp wrapper (whatever dispatch is live)
        ms_f = timed(A.fused_local_attention, (q, k, v, w), reps=reps)

        def wrapped_bwd(qq, kk, vv, ww):
            def scalar(*a):
                return jnp.sum(A.fused_local_attention(*a)
                               .astype(jnp.float32))

            return jax.grad(scalar, argnums=(0, 1, 2, 3))(qq, kk, vv, ww)

        ms_b = timed(wrapped_bwd, (q, k, v, w), reps=reps)
        print(f"  {'SHIPPED':10s} fwd {ms_f:7.2f} ms   fwd+bwd {ms_b:7.2f} ms")


if __name__ == "__main__":
    main()
