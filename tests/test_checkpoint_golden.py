"""Checkpoint-format stability golden (VERDICT r4 #6).

``tests/fixtures/golden_tiny.atpu`` was written by the round-5 serializer
(``tests/fixtures/make_golden.py``). Every round, this test must load it
into a freshly built TrainState template and resume one train step. If a
pytree-layout change breaks this test, that change breaks every user's
saved long-run checkpoint too — add an explicit migration shim (and only
then regenerate the fixture). Stable-format contract mirrors
/root/reference/src/model_serializer.py:39-63.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aero_tpu.parallel import mesh as pmesh
from aero_tpu.train import checkpoint as ckpt

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "fixtures", "golden_tiny.atpu")
SUMS = os.path.join(HERE, "fixtures", "golden_tiny_sums.json")


@pytest.fixture(scope="module")
def golden():
    import sys

    sys.path.insert(0, os.path.join(HERE, "fixtures"))
    try:
        from make_golden import build_state, golden_args
    finally:
        sys.path.pop(0)
    args = golden_args()
    models, mesh, template, lr_shape, hr_shape = build_state(args)
    package = ckpt.load_package(FIXTURE)
    with open(SUMS) as f:
        sums = json.load(f)
    return args, models, mesh, template, lr_shape, hr_shape, package, sums


def _tree_sum(tree):
    return float(sum(np.abs(np.asarray(x)).sum()
                     for x in jax.tree.leaves(tree)
                     if not isinstance(x, (str, bytes, type(None)))))


def test_golden_package_loads_into_current_layout(golden):
    args, models, mesh, template, _, _, package, sums = golden
    state = ckpt.state_from_package(package, template)

    # structural contract: every leaf restored (flax from_state_dict
    # raises on any key/shape mismatch — this line IS the layout gate)
    assert len(jax.tree.leaves(state.gen_params)) == sums["n_gen_leaves"]
    assert int(np.asarray(state.step)) == sums["step"]

    # value contract: the serializer round-trips content bit-stably
    np.testing.assert_allclose(_tree_sum(state.gen_params),
                               sums["gen_params_abssum"], rtol=1e-6)
    np.testing.assert_allclose(_tree_sum(state.disc_params),
                               sums["disc_params_abssum"], rtol=1e-6)
    np.testing.assert_allclose(_tree_sum(state.gen_opt_state),
                               sums["gen_opt_abssum"], rtol=1e-6)
    np.testing.assert_allclose(_tree_sum(state.disc_opt_state),
                               sums["disc_opt_abssum"], rtol=1e-6)

    # metadata contract
    history = ckpt.history_from_package(package)
    assert history and history[0]["valid"] == 2.345
    best = ckpt.best_states_from_package(package)
    assert best and "generator" in best
    args_plain = json.loads(package[ckpt.SERIALIZE_KEY_ARGS])
    assert args_plain["experiment"]["model"] == "aero"


def test_golden_checkpoint_resumes_one_step(golden):
    from aero_tpu.train.train_step import make_train_step

    args, models, mesh, template, lr_shape, hr_shape, package, sums = golden
    state = pmesh.replicate(ckpt.state_from_package(package, template), mesh)

    step_fn = make_train_step(args, models, mesh, donate=False)
    rng = np.random.default_rng(11)
    lr = pmesh.shard_batch(jnp.asarray(
        (0.1 * rng.standard_normal(lr_shape)).astype(np.float32)), mesh)
    hr = pmesh.shard_batch(jnp.asarray(
        (0.1 * rng.standard_normal(hr_shape)).astype(np.float32)), mesh)
    new_state, metrics = step_fn(state, lr, hr)
    metrics = jax.tree.map(float, metrics)
    assert np.isfinite(metrics["total"]), metrics
    assert int(np.asarray(new_state.step)) == sums["step"] + 1


def test_golden_generator_loads_for_serving(golden):
    """The test.py/predict.py path (load_generator_variables) must also
    accept the golden package, including the abstract eval_shape template."""
    args, models, mesh, template, _, _, package, sums = golden
    abs_vars = {"params": jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        template.gen_params), **jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        dict(template.gen_state))}
    loaded = ckpt.load_generator_variables(FIXTURE, abs_vars)
    np.testing.assert_allclose(_tree_sum(loaded["params"]),
                               sums["gen_params_abssum"], rtol=1e-6)
    # load_best picks best_states.generator (same values in the fixture)
    best = ckpt.load_generator_variables(FIXTURE, {"params": abs_vars["params"]},
                                         load_best=True)
    np.testing.assert_allclose(_tree_sum(best["params"]),
                               sums["gen_params_abssum"], rtol=1e-6)
