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
    """Init a TrainState and load the generator from ``checkpoint_file``
    (ours .atpu or reference .th) — the test.py/predict.py contract
    (/root/reference/test.py:26-40)."""
    import jax as _jax

    from aero_tpu.train import checkpoint as ckpt
    from aero_tpu.train.train_step import init_state

    lr_shape, hr_shape = segment_shapes(args)
    rng = _jax.random.PRNGKey(int(args.seed))
    variables = init_variables(args, models, rng, lr_shape, hr_shape)
    state = init_state(args, models, variables, rng)

    gen_template = {"params": state.gen_params, **state.gen_state}
    loaded = dict(ckpt.load_generator_variables(
        str(args.checkpoint_file), gen_template,
        load_best=bool(args.get("continue_best", False)),
        model=str(args.experiment.model)))
    return state.replace(gen_params=loaded.pop("params"), gen_state=loaded)
