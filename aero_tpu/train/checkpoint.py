"""Checkpointing: single-file msgpack packages with atomic writes.

Mirrors the reference serializer's package layout and cadence
(``/root/reference/src/model_serializer.py:39-63``) but as a safe pure
pytree + JSON metadata (no pickled classes — SURVEY.md §2.5 defect 8):

  { 'models':      {name: {'params': ..., extra collections...}},
    'optimizers':  {'optimizer': ..., 'disc_optimizer': ...},
    'history':     [...per-epoch metric dicts...],
    'best_states': {name: variables} or None,
    'args':        plain config dict,
    'step':        int }

Also supports importing reference ``checkpoint.th`` files via
``aero_tpu.train.torch_import``.
"""

from __future__ import annotations

import json
import os
import typing as tp

import jax
import numpy as np
from flax import serialization

SERIALIZE_KEY_MODELS = "models"
SERIALIZE_KEY_OPTIMIZERS = "optimizers"
SERIALIZE_KEY_HISTORY = "history"
SERIALIZE_KEY_BEST_STATES = "best_states"
SERIALIZE_KEY_ARGS = "args"
SERIALIZE_KEY_STATE = "state"


def _to_numpy(tree):
    def conv(x):
        if isinstance(x, (str, bytes, bool, int, float)) or x is None:
            return x
        return np.asarray(x)

    return jax.tree.map(conv, tree)


def save_package(path: str, package: tp.Mapping[str, tp.Any]) -> None:
    """Atomic tmp+rename write (parity: model_serializer.py:49-53)."""
    # to_state_dict turns tuple pytrees (optax states) into nested dicts
    # that msgpack can encode; from_state_dict restores them on load.
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_numpy(dict(package))))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_package(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def package_from_state(state, history, best_states, args_plain) -> dict:
    """Build the checkpoint package from a TrainState."""
    models = {"generator": {"params": state.gen_params, **state.gen_state}}
    for name in state.disc_params:
        models[name] = {"params": state.disc_params[name],
                        **state.disc_state.get(name, {})}
    optimizers = {"optimizer": state.gen_opt_state}
    if state.disc_params:
        optimizers["disc_optimizer"] = state.disc_opt_state
    return {
        SERIALIZE_KEY_MODELS: models,
        SERIALIZE_KEY_OPTIMIZERS: optimizers,
        SERIALIZE_KEY_HISTORY: json.dumps(history),
        SERIALIZE_KEY_BEST_STATES: best_states or {},
        SERIALIZE_KEY_ARGS: json.dumps(args_plain),
        "step": np.asarray(state.step),
    }


def state_from_package(package: dict, state):
    """Load package contents into an existing TrainState template
    (shape/type-checked by flax serialization)."""
    models = package[SERIALIZE_KEY_MODELS]
    gen = dict(models["generator"])
    gen_params = serialization.from_state_dict(state.gen_params, gen.pop("params"))
    gen_state = serialization.from_state_dict(state.gen_state, gen)

    disc_params = dict(state.disc_params)
    disc_state = jax.tree_util.tree_map(lambda x: x, dict(state.disc_state))
    for name in state.disc_params:
        if name in models:
            m = dict(models[name])
            disc_params[name] = serialization.from_state_dict(
                state.disc_params[name], m.pop("params"))
            if m:
                disc_state[name] = serialization.from_state_dict(
                    state.disc_state[name], m)

    opts = package.get(SERIALIZE_KEY_OPTIMIZERS, {})
    gen_opt = serialization.from_state_dict(
        state.gen_opt_state, opts["optimizer"]) if "optimizer" in opts \
        else state.gen_opt_state
    disc_opt = serialization.from_state_dict(
        state.disc_opt_state, opts["disc_optimizer"]) \
        if "disc_optimizer" in opts and state.disc_params \
        else state.disc_opt_state

    step = package.get("step", state.step)
    return state.replace(
        step=jax.numpy.asarray(step),
        gen_params=gen_params, gen_state=gen_state, gen_opt_state=gen_opt,
        disc_params=disc_params, disc_state=disc_state,
        disc_opt_state=disc_opt)


def history_from_package(package: dict) -> list:
    h = package.get(SERIALIZE_KEY_HISTORY, "[]")
    return json.loads(h) if isinstance(h, (str, bytes)) else list(h)


def best_states_from_package(package: dict):
    return package.get(SERIALIZE_KEY_BEST_STATES) or None


def load_generator_variables(path: str, template_variables, load_best=False,
                             model: str = "aero"):
    """Load just the generator (test.py/predict.py contract,
    /root/reference/test.py:26-40). Supports both our .atpu packages and
    reference .th checkpoints (any generator family, ``model`` selects
    the key map — reference serializes any generator,
    src/model_serializer.py:39-63)."""
    if path.endswith(".th"):
        from aero_tpu.train import torch_import

        pkg = torch_import.load_torch_checkpoint(path)
        sd = (pkg["best_states"] if load_best and pkg["best_states"]
              else pkg["models"])["generator"]

        def concrete(x):
            # abstract (eval_shape) serving templates: the importer
            # overwrites every leaf, it only needs shape/dtype/structure
            if isinstance(x, jax.ShapeDtypeStruct):
                return np.zeros(x.shape, x.dtype)
            return np.asarray(x)

        return torch_import.import_generator_state(
            model, sd, jax.tree.map(concrete, dict(template_variables)))

    package = load_package(path)
    if load_best and package.get(SERIALIZE_KEY_BEST_STATES):
        src = package[SERIALIZE_KEY_BEST_STATES]["generator"]
    else:
        src = package[SERIALIZE_KEY_MODELS]["generator"]
    return serialization.from_state_dict(dict(template_variables), dict(src))
