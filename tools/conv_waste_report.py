"""Map the remaining lhs_dilation zero-MAC waste in the train step.

XLA lowers two things as ``lhs_dilation`` convolutions, where on average
(dil-1)/dil of the MACs hit inserted zeros and are pure hardware waste:

  1. transposed convs (forward) — already removed by the r4 subpixel
     lowering (``AERO_CONVT=subpixel`` default);
  2. the INPUT-GRADIENT of every strided conv that autodiff builds
     inside ``jax.grad`` — still present wherever a strided conv uses
     the plain XLA lowering.

This tool traces the full fused GAN train step (no execution — runs on
CPU in seconds) and prints every conv equation with ``lhs_dilation>1``:
its shapes, which model piece it plausibly belongs to (inferred from
kernel shape), dense/executed FLOPs, algorithmic FLOPs, and the delta.
The summed delta is the exact upper bound on what polyphase gradient
lowerings can still recover from the step — the targeting map for
``AERO_CONVGRAD``-style work (PERF.md "backward-side sibling").

CONCLUSION (r4, settled): the bound is nominal, not recoverable time.
B=16 shows 3.57 TF (26.6% of executed) all in the melgan k=41/s=4
input-grads, yet the isolated A/B (tools/convgrad_ab.py) has XLA's
lhs_dilation lowering BEATING both algorithmic-MAC rewrites (xla 15.20
< polyconv 16.04 < poly 19.18 ms/disc-bwd) — XLA:TPU already skips the
inserted zeros at this geometry. Keep this tool for future geometries;
don't re-litigate k=41/s=4.

Usage: python tools/conv_waste_report.py [batch=16] [precision=bfloat16]
                                         [experiment=...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

os.environ.setdefault("AERO_PLATFORM", "cpu")
from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aero_tpu.train import build  # noqa: E402
from aero_tpu.train.train_step import init_state, make_train_step  # noqa: E402
from aero_tpu.parallel import mesh as pmesh  # noqa: E402
from aero_tpu.utils.config import load_config  # noqa: E402
from aero_tpu.utils import flops as F  # noqa: E402


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _walk(jaxpr, mult, rows, totals):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            algo = F._conv_flops(eqn) * mult
            lhs_dil = _prod(eqn.params.get("lhs_dilation") or ())
            dense = algo * max(lhs_dil, 1)
            totals["conv_algo"] += algo
            totals["conv_dense"] += dense
            if lhs_dil > 1:
                dn = eqn.params["dimension_numbers"]
                rhs = eqn.invars[1].aval.shape
                k_spatial = tuple(rhs[d] for d in dn.rhs_spec[2:])
                rows.append({
                    "lhs": tuple(eqn.invars[0].aval.shape),
                    "k": k_spatial,
                    "rhs": tuple(rhs),
                    "dil": tuple(eqn.params["lhs_dilation"]),
                    "stride": tuple(eqn.params["window_strides"]),
                    "mult": mult,
                    "dense": dense,
                    "algo": algo,
                })
        elif name == "dot_general":
            totals["dot"] += F._dot_general_flops(eqn) * mult
        elif name == "scan":
            _walk(eqn.params["jaxpr"].jaxpr,
                  mult * int(eqn.params["length"]), rows, totals)
        elif name == "while":
            _walk(eqn.params["body_jaxpr"].jaxpr, mult, rows, totals)
        elif name == "cond":
            # max across branches, matching utils/flops.count_flops (the
            # MFU numerator) — summing would inflate 'executed' totals
            branch_totals = []
            for br in eqn.params["branches"]:
                bt = {"conv_algo": 0, "conv_dense": 0, "dot": 0}
                brows = []
                _walk(br.jaxpr, mult, brows, bt)
                branch_totals.append((bt, brows))
            bt, brows = max(branch_totals,
                            key=lambda p: sum(p[0].values()))
            for kk in totals:
                totals[kk] += bt[kk]
            rows.extend(brows)
        elif name == "pallas_call":
            grid = getattr(eqn.params.get("grid_mapping"), "grid", ())
            g = _prod(d for d in grid if isinstance(d, int))
            _walk(eqn.params["jaxpr"], mult * max(g, 1), rows, totals)
        else:
            for v in eqn.params.values():
                for sub in F._sub_jaxprs(v):
                    _walk(sub, mult, rows, totals)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.pop("batch", 16))
    overrides = [f"{k}={v}" for k, v in kv.items()]
    args = load_config("conf", "main_config",
                       ["experiment=aero_4-16_512_64", "dset=debug",
                        "precision=bfloat16"] + overrides)

    models = build.build_models(args)
    mesh = pmesh.make_mesh()
    lr_shape, hr_shape = build.segment_shapes(args)
    rng = jax.random.PRNGKey(0)
    init_rng, state_rng = jax.random.split(rng)
    variables = build.init_variables(args, models, init_rng, lr_shape,
                                     hr_shape)
    state = init_state(args, models, variables, state_rng)
    step = make_train_step(args, models, mesh, donate=False)

    exp = args.experiment
    seg = int(exp.segment * exp.lr_sr)
    nprng = np.random.default_rng(0)
    lr = jnp.asarray(0.1 * nprng.standard_normal((batch, 1, seg)),
                     jnp.float32)
    hr = jnp.asarray(0.1 * nprng.standard_normal((batch, 1, seg * 4)),
                     jnp.float32)

    closed = jax.make_jaxpr(step)(state, lr, hr)
    rows, totals = [], {"conv_algo": 0, "conv_dense": 0, "dot": 0}
    _walk(closed.jaxpr, 1, rows, totals)

    rows.sort(key=lambda r: -(r["dense"] - r["algo"]))
    print(f"train step B={batch}: lhs_dilation convs "
          f"(executed-dense vs algorithmic FLOPs)\n")
    print(f"{'lhs shape':28s} {'k':10s} {'dil':8s} {'x':>3s} "
          f"{'dense TF':>9s} {'algo TF':>9s} {'waste TF':>9s}")
    waste = 0
    for r in rows:
        w = r["dense"] - r["algo"]
        waste += w
        print(f"{str(r['lhs']):28s} {str(r['k']):10s} {str(r['dil']):8s} "
              f"{r['mult']:>3d} {r['dense'] / 1e12:9.3f} "
              f"{r['algo'] / 1e12:9.3f} {w / 1e12:9.3f}")

    algo_total = totals["dot"] + totals["conv_algo"]
    exec_total = totals["dot"] + totals["conv_dense"]
    print(f"\nstep algorithmic FLOPs: {algo_total / 1e12:7.3f} TF "
          f"(dot {totals['dot'] / 1e12:.3f} + conv "
          f"{totals['conv_algo'] / 1e12:.3f})")
    print(f"step executed FLOPs:    {exec_total / 1e12:7.3f} TF")
    print(f"lhs_dilation waste:     {waste / 1e12:7.3f} TF "
          f"({waste / exec_total * 100:.1f}% of executed — the upper "
          f"bound polyphase grads can recover)")
    ms_equiv = waste / 197e12 * 1e3
    print(f"at v5e bf16 peak that is {ms_equiv:.1f} ms of pure-MXU time "
          f"(real recovery is less: these convs don't run at peak)")


if __name__ == "__main__":
    main()
