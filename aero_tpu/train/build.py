"""Model/variable construction helpers shared by the CLIs and tests."""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from aero_tpu.models import factory
from aero_tpu.models.init import rescale_tree


def segment_shapes(args) -> tp.Tuple[tp.Tuple[int, ...], tp.Tuple[int, ...]]:
    """(lr, hr) training segment shapes [B, 1, T] from the config."""
    exp = args.experiment
    batch = int(exp.batch_size)
    seg = float(exp.segment)
    # hr length derived from the lr window via the integer rate ratio —
    # matches LrHrSet's non-round-rate segment math (data/datasets.py).
    lr_t = int(seg * exp.lr_sr)
    if exp.hr_sr % exp.lr_sr == 0:
        hr_t = lr_t * (exp.hr_sr // exp.lr_sr)
    else:
        hr_t = int(seg * exp.hr_sr)
    if exp.get("upsample", False):
        lr_t = hr_t
    return (batch, 1, lr_t), (batch, 1, hr_t)


def init_variables(args, models, rng, lr_shape, hr_shape):
    """Initialize every model's variables; applies the Aero weight-rescale
    trick (reference aero.py:406-407) to the generator only."""
    exp = args.experiment
    variables = {}
    rngs = jax.random.split(rng, len(models))
    for r, (name, model) in zip(rngs, models.items()):
        if name == "generator":
            # jitted init: one compile instead of thousands of eager
            # op dispatches (which crawl on remote-tunneled devices)
            v = jax.jit(lambda key, x, m=model: m.init(key, x, train=False)
                        )(r, jnp.zeros(lr_shape))
            v = jax.tree_util.tree_map(lambda x: x, dict(v))
            if exp.model == "aero" and float(exp.aero.get("rescale", 0) or 0):
                v["params"] = rescale_tree(v["params"],
                                           float(exp.aero.rescale))
            variables[name] = v
        else:
            x = jnp.zeros((hr_shape[0], hr_shape[2], 1))  # [B, T, C]
            if name in ("msd_hifi", "mpd"):
                v = jax.jit(lambda key, y, m=model: m.init(key, y, y,
                                                           train=False))(r, x)
            else:
                v = jax.jit(lambda key, y, m=model: m.init(key, y))(r, x)
            variables[name] = dict(v)
    return variables


def build_models(args):
    from aero_tpu.models.modules import set_compute_dtype

    precision = str(args.get("precision", "float32") or "float32")
    set_compute_dtype(jnp.bfloat16 if precision == "bfloat16"
                      else jnp.float32)
    return factory.get_model(args)


def load_generator_state(args, models):
    """Serving TrainState: generator loaded from ``checkpoint_file``
    (ours .atpu or reference .th) — the test.py/predict.py contract
    (/root/reference/test.py:26-40).

    The generator template is built ABSTRACTLY (``jax.eval_shape``) and
    no optimizer/discriminator state is created: the checkpoint replaces
    every value, so the previous real init computed-and-discarded ~80 MB
    of random weights plus optax moment zeros for every model — through
    the remote device tunnel that is hundreds of per-leaf dispatches,
    measured 33 s + 42 s of predict.py's warm start (PERF.md
    'Cold-start predict', r4)."""
    import jax as _jax

    from aero_tpu.train import checkpoint as ckpt
    from aero_tpu.train.train_step import TrainState

    lr_shape, _hr_shape = segment_shapes(args)
    gen = models["generator"]
    abs_vars = _jax.eval_shape(
        lambda k: gen.init(k, jnp.zeros(lr_shape, jnp.float32), train=False),
        _jax.random.PRNGKey(0))
    abs_vars = dict(abs_vars)
    loaded = dict(ckpt.load_generator_variables(
        str(args.checkpoint_file), abs_vars,
        load_best=bool(args.get("continue_best", False)),
        model=str(args.experiment.model)))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=loaded.pop("params"),
        gen_state=loaded,
        gen_opt_state=(),
        disc_params={},
        disc_state={},
        disc_opt_state=(),
        rng=_jax.random.PRNGKey(int(args.seed)),
    )
