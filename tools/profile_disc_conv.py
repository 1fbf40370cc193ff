"""Lowering A/B for the MelGAN discriminator's grouped k=41 convs.

The disc step (pr-detached + hr loss+grad) costs ~70 ms of the 276 ms
B=16 train step while its MAC roofline is <1 ms — the grouped convs
(Cg=4 per group) are suspected lowering-bound on TPU (the MXU pads the
4-wide contraction to a full tile). Variants, per canonical layer shape
(reference src/models/discriminators.py:30-45; ours
aero_tpu/models/discriminators.py:283-291):

  grouped  lax.conv feature_group_count=G            (current)
  batchg   lax.conv batch_group_count=G (G folded into batch)
  unfold   einsum over unfolded windows  'btkgc,gkco->btgo'
  tap      sum over k of strided-slice einsums 'btgc,gco->btgo'
  dense    one dense conv, block-diagonal weights (FLOPs xG)

Methodology: N reps inside one jit via lax.fori_loop with a data
dependency, minus a same-structure trivial loop (tunnel-latency
compensation, see PERF.md). Forward and full VJP (cotangent=ones) are
timed separately.

Usage:  python tools/profile_disc_conv.py [reps=20] [batch=16]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# canonical MelGAN scale-0 grouped layers at 2 s / 16 kHz segments:
# (T_in, C_in, C_out, k, stride, groups)
LAYERS = [
    ("layer_1", 32000, 16, 64, 41, 4, 4),
    ("layer_2", 8000, 64, 256, 41, 4, 16),
    ("layer_3", 2000, 256, 1024, 41, 4, 64),
    ("layer_4", 500, 1024, 1024, 41, 4, 256),
    ("layer_5", 125, 1024, 1024, 5, 1, 1),
]


def pad_x(x, k, s):
    p = s * 5 if k == 41 else k // 2
    return jnp.pad(x, ((0, 0), (p, p), (0, 0)))


def v_grouped(x, w, k, s, g):
    # x [B,T,C] channels-last, w [k, Cg, Cout]
    return jax.lax.conv_general_dilated(
        pad_x(x, k, s), w, (s,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=g)


def v_batchg(x, w, k, s, g):
    # fold groups into the batch dim: [B,T,G,Cg] -> [G*B, T, Cg];
    # batch_group_count consumes the leading G factor, per-group filters
    b, t, c = x.shape
    cg = c // g
    xg = x.reshape(b, t, g, cg).transpose(2, 0, 1, 3).reshape(g * b, t, cg)
    y = jax.lax.conv_general_dilated(
        pad_x(xg, k, s), w, (s,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), batch_group_count=g)
    # y [B, T_out, G*Og] per batch_group semantics? -> normalize to [B,T,C]
    return y


def v_unfold(x, w, k, s, g):
    # w reshaped [G, k, Cg, Og]; unfold time into windows
    b, t, c = x.shape
    cg = c // g
    og = w.shape[-1] // g
    xp = pad_x(x, k, s)
    t_out = (xp.shape[1] - k) // s + 1
    idx = jnp.arange(t_out)[:, None] * s + jnp.arange(k)[None, :]
    xu = xp[:, idx, :]                       # [B, T_out, k, C]
    xu = xu.reshape(b, t_out, k, g, cg)
    # lax grouped conv partitions the filter's OUTPUT dim into G blocks
    wg = w.reshape(k, cg, g, og).transpose(2, 0, 1, 3)   # [G,k,Cg,Og]
    return jnp.einsum("btkgc,gkco->btgo", xu, wg,
                      preferred_element_type=jnp.float32
                      if x.dtype == jnp.float32 else None
                      ).reshape(b, t_out, g * og)


def v_tap(x, w, k, s, g):
    b, t, c = x.shape
    cg = c // g
    og = w.shape[-1] // g
    xp = pad_x(x, k, s)
    t_out = (xp.shape[1] - k) // s + 1
    wg = w.reshape(k, cg, g, og).transpose(0, 2, 1, 3)   # [k,G,Cg,Og]
    xr = xp.reshape(b, xp.shape[1], g, cg)
    out = jnp.zeros((b, t_out, g, og), x.dtype)
    for kk in range(k):
        sl = jax.lax.slice_in_dim(xr, kk, kk + (t_out - 1) * s + 1, 1, axis=1)
        sl = sl[:, ::s]
        out = out + jnp.einsum("btgc,gco->btgo", sl, wg[kk])
    return out.reshape(b, t_out, g * og)


def v_dense(x, w, k, s, g):
    # block-diagonal dense weights [k, C, Cout]
    cg = x.shape[-1] // g
    og = w.shape[-1] // g
    wg = w.reshape(k, cg, g, og)
    dense = jnp.zeros((k, x.shape[-1], w.shape[-1]), w.dtype)
    for gi in range(g):
        dense = dense.at[:, gi * cg:(gi + 1) * cg,
                         gi * og:(gi + 1) * og].set(wg[:, :, gi])
    return jax.lax.conv_general_dilated(
        pad_x(x, k, s), dense, (s,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))


VARIANTS = {"grouped": v_grouped, "batchg": v_batchg, "unfold": v_unfold,
            "tap": v_tap, "dense": v_dense}


def timed_loop(fn, x, w, reps, grad=False):
    """median of 5 of (reps x fn inside one jit) with latency baseline
    subtracted."""
    if grad:
        def one(x_, w_):
            def loss(w__):
                return jnp.sum(fn(x_, w__).astype(jnp.float32))
            return jax.grad(loss)(w_)

        def body(i, carry):
            xw = carry
            g_ = one(x, xw)
            return xw + 1e-20 * g_.astype(xw.dtype)

        init = w
    else:
        def body(i, carry):
            y = fn(x * (1 + carry * 0).astype(x.dtype), w)
            return carry + 1e-20 * jnp.sum(y.astype(jnp.float32))

        init = jnp.zeros((), jnp.float32)

    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, reps, body, c0)

    @jax.jit
    def run_null(c0):
        return jax.lax.fori_loop(0, reps, lambda i, c: c * 1.0000001, c0)

    # warm
    jax.block_until_ready(run(init))
    jax.block_until_ready(run_null(init))
    ts, tn = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        r = run(init)
        _ = float(jnp.sum(r).astype(jnp.float32)) if not grad else \
            float(jnp.sum(jax.tree_util.tree_leaves(r)[0][:1].astype(
                jnp.float32)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        r = run_null(init)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1]
                          .astype(jnp.float32)))
        tn.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - float(np.median(tn))) / reps * 1e3


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    reps = int(kv.get("reps", 20))
    batch = int(kv.get("batch", 16))
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"B={batch} bf16, {reps} reps in-jit, latency-compensated; "
          f"per-call ms")
    total = {v: [0.0, 0.0] for v in VARIANTS}
    for name, t, cin, cout, k, s, g in LAYERS:
        x = jnp.asarray(rng.standard_normal((batch, t, cin)) * 0.1, dtype)
        w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.05,
                        dtype)
        row = [f"{name:8s} T={t:<6d} {cin:>4d}->{cout:<4d} g={g:<3d}"]
        for vname, fn in VARIANTS.items():
            if vname == "dense" and g > 64:
                row.append(f"{vname}: skip")
                continue
            f = functools.partial(fn, k=k, s=s, g=g)
            # correctness vs grouped first
            try:
                ref = np.asarray(v_grouped(x, w, k, s, g), np.float32)
                got = np.asarray(f(x, w), np.float32)
                if got.shape != ref.shape or not np.allclose(
                        got, ref, rtol=0.1, atol=0.1):
                    row.append(f"{vname}: WRONG {got.shape}")
                    continue
                fwd = timed_loop(f, x, w, reps)
                bwd = timed_loop(f, x, w, max(reps // 2, 5), grad=True)
                total[vname][0] += fwd
                total[vname][1] += bwd
                row.append(f"{vname}: f{fwd:6.2f} g{bwd:6.2f}")
            except Exception as e:  # noqa: BLE001
                row.append(f"{vname}: ERR {str(e)[:40]}")
        print("  ".join(row), flush=True)
    print("totals (fwd/grad ms):",
          {v: (round(a, 2), round(b, 2)) for v, (a, b) in total.items()})


if __name__ == "__main__":
    main()
