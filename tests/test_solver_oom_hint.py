"""A first-step HBM OOM must tell the user about ``accum_steps``.

The raw XLA allocation dump (30 GB of HLO temps) buries the fix; the
solver wraps the FIRST train-step call (where compile happens) and
re-raises with the config-level lever (solver.py `_run_one_epoch`).
Triggered for real by the 11->44 music config at B=16 on a 16 GB chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aero_tpu.train import build
from aero_tpu.train.solver import Solver
from aero_tpu.train.train_step import init_state
from aero_tpu.utils.config import Config

SEANET_KW = dict(latent_space_size=16, ngf=4, n_residual_layers=1,
                 resample=1, normalize=True, floor=1e-3,
                 ratios=[8, 8, 2, 2], lr_sr=4000, hr_sr=16000,
                 upsample=True)


def _args():
    return Config._wrap(dict(
        lr=3e-4, beta2=0.999, losses=["l1"],
        stft_sc_factor=0.5, stft_mag_factor=0.5,
        epochs=1, eval_every=100, cross_valid=False, cross_valid_every=100,
        checkpoint=False, checkpoint_every=1,
        checkpoint_file="checkpoint.atpu", continue_from="",
        continue_best=False, keep_history=True, restart=False,
        history_file="history.json", samples_dir="samples", num_prints=1,
        experiment=dict(
            model="seanet", seanet=SEANET_KW,
            name="oom-hint-test", lr_sr=4000, hr_sr=16000, segment=0.25,
            batch_size=8, upsample=False, adversarial=False,
            discriminator_models=[],
        ),
    ))


class OneBatchLoader:
    def __init__(self, lr, hr):
        self.batch = (lr, hr)

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return 1

    def __iter__(self):
        yield self.batch


def test_first_step_oom_raises_accum_steps_hint(tmp_path, monkeypatch):
    args = _args()
    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    state = init_state(args, models, variables, jax.random.PRNGKey(1))

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    loader = OneBatchLoader(
        jnp.asarray(rng.standard_normal(lr_shape), jnp.float32),
        jnp.asarray(rng.standard_normal(hr_shape), jnp.float32))
    solver = Solver({"tr_loader": loader, "cv_loader": None,
                     "tt_loader": None}, models, state, args)

    def oom_step(state, lr, hr):
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: XLA:TPU compile permanent error. "
            "Ran out of memory in memory space hbm. Used 30.01G of "
            "15.75G hbm.")

    monkeypatch.setattr(solver, "train_step", oom_step)
    with pytest.raises(RuntimeError, match="accum_steps") as ei:
        solver._run_one_epoch(0)
    # the original XLA error stays chained for debugging
    assert "Ran out of memory" in str(ei.value.__cause__)

    # non-OOM errors pass through untouched
    def other_err(state, lr, hr):
        raise ValueError("unrelated failure")

    monkeypatch.setattr(solver, "train_step", other_err)
    with pytest.raises(ValueError, match="unrelated failure"):
        solver._run_one_epoch(0)
