"""Full-train-step A/B of the small-T attention dispatch (round 5).

Leg A: AERO_ATTN_SMALLT=dense  — the pre-r5 dispatch (T <= 2*block_q
       attends via the dense _attend_block autodiff path).
Leg B: default                  — every pallas-capable site routes to
       fused_local_attention (Pallas fwd + Pallas custom-vjp bwd).

Both legs run interleaved in ONE process (A B A B), chained-donated
full-step timing, so tunnel session variance cannot masquerade as a
win. The env var is read at TRACE time, so each leg builds its own
step function.

Usage: python tools/attn_dispatch_ab.py [batch=16] [rounds=2]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aero_tpu.utils.platform import select_platform_from_env  # noqa: E402

select_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import profile_train_step as PT  # noqa: E402

from aero_tpu.parallel import mesh as pmesh  # noqa: E402
from aero_tpu.train import build  # noqa: E402
from aero_tpu.train.train_step import init_state, make_train_step  # noqa: E402
from aero_tpu.utils.config import load_config  # noqa: E402


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(kv.get("batch", 16))
    rounds = int(kv.get("rounds", 2))
    args = load_config("conf", "main_config",
                       ["experiment=aero_4-16_512_64", "dset=debug",
                        "precision=bfloat16"])
    models = build.build_models(args)
    mesh = pmesh.make_mesh()
    lr_shape, hr_shape = build.segment_shapes(args)
    lr_shape = (batch,) + lr_shape[1:]
    hr_shape = (batch,) + hr_shape[1:]
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    base_state = pmesh.replicate(
        init_state(args, models, variables, jax.random.PRNGKey(1)), mesh)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(0.1 * rng.standard_normal(lr_shape), jnp.float32)
    hr = jnp.asarray(0.1 * rng.standard_normal(hr_shape), jnp.float32)

    steps = {}
    os.environ["AERO_ATTN_SMALLT"] = "dense"
    steps["dense (pre-r5)"] = make_train_step(args, models, mesh,
                                              donate=True)
    os.environ.pop("AERO_ATTN_SMALLT")
    steps["pallas (r5 default)"] = make_train_step(args, models, mesh,
                                                   donate=True)

    for r in range(rounds):
        for name, step in steps.items():
            state = jax.tree.map(jnp.copy, base_state)
            ms = PT.timeit_chained(step, state, lr, hr) * 1e3
            print(f"round {r}  {name:22s} {ms:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
