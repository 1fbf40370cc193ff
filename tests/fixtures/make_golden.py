"""Regenerate the golden checkpoint fixture (tests/fixtures/golden_tiny.atpu).

Run ONLY when the checkpoint pytree layout changes ON PURPOSE — the
fixture exists so that a layout change breaks tests/test_checkpoint_golden.py
and forces an explicit migration decision (VERDICT r4 #6; the stable-format
contract mirrors /root/reference/src/model_serializer.py:39-63). If you run
this, also bump GOLDEN_FORMAT_NOTE below and document the migration path
for existing user checkpoints in MIGRATION.md.

Usage:  python tests/fixtures/make_golden.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np  # noqa: E402

GOLDEN_FORMAT_NOTE = "v1 (round 5): models/optimizers/history/best_states/args/step"

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "golden_tiny.atpu")
SUMS = os.path.join(HERE, "golden_tiny_sums.json")


def golden_args():
    """The exact config the golden test rebuilds its template from.

    Deliberately a frozen copy (NOT imported from test scaffolding):
    the fixture must not silently change meaning when test helpers do.
    """
    from aero_tpu.utils.config import Config

    aero = dict(
        in_channels=1, out_channels=1, channels=4, growth=2,
        nfft=512, hop_length=64, strides=[4, 2, 2, 2],
        enc_freq_attn=0, norm_starts=2, norm_groups=2,
        dconv_mode=1, dconv_depth=1, dconv_comp=4, dconv_time_attn=2,
        dconv_lstm=2, dconv_init=1e-3, rescale=0.1,
        lr_sr=4000, hr_sr=16000, spec_upsample=True, act_func="snake",
    )
    return Config._wrap(dict(
        lr=3e-4, beta2=0.999, losses=["l1", "stft"],
        stft_sc_factor=0.5, stft_mag_factor=0.5, seed=2036,
        experiment=dict(
            model="aero", aero=aero,
            lr_sr=4000, hr_sr=16000, segment=0.25, batch_size=8,
            upsample=False, adversarial=True,
            discriminator_models=["msd_melgan"],
            features_loss_lambda=100,
            only_features_loss=False, only_adversarial_loss=False,
            melgan_discriminator=dict(n_layers=2, num_D=2,
                                      downsampling_factor=4, ndf=4),
        ),
    ))


def build_state(args):
    from aero_tpu.parallel import mesh as pmesh
    from aero_tpu.train import build
    from aero_tpu.train.train_step import init_state

    models = build.build_models(args)
    lr_shape, hr_shape = build.segment_shapes(args)
    variables = build.init_variables(args, models, jax.random.PRNGKey(0),
                                     lr_shape, hr_shape)
    mesh = pmesh.make_mesh()
    state = init_state(args, models, variables, jax.random.PRNGKey(1))
    state = pmesh.replicate(state, mesh)
    return models, mesh, state, lr_shape, hr_shape


def main():
    import jax.numpy as jnp

    from aero_tpu.parallel import mesh as pmesh
    from aero_tpu.train import checkpoint as ckpt
    from aero_tpu.train.train_step import make_train_step

    args = golden_args()
    models, mesh, state, lr_shape, hr_shape = build_state(args)

    # one real optimizer step so the Adam moments in the fixture are
    # non-trivial (layout drift in optax state must also be caught)
    step_fn = make_train_step(args, models, mesh, donate=False)
    rng = np.random.default_rng(7)
    lr = pmesh.shard_batch(jnp.asarray(
        (0.1 * rng.standard_normal(lr_shape)).astype(np.float32)), mesh)
    hr = pmesh.shard_batch(jnp.asarray(
        (0.1 * rng.standard_normal(hr_shape)).astype(np.float32)), mesh)
    state, metrics = step_fn(state, lr, hr)

    history = [{"train": 1.234, "valid": 2.345, "best": 2.345,
                "lsd": 3.456, "visqol": 1.0}]
    best_states = {"generator": {"params": jax.tree.map(np.asarray,
                                                        state.gen_params)}}
    pkg = ckpt.package_from_state(
        state, history, best_states,
        json.loads(json.dumps({"experiment": {"model": "aero"},
                               "golden_format": GOLDEN_FORMAT_NOTE})))
    ckpt.save_package(FIXTURE, pkg)

    # content checksums so the golden test detects silent VALUE drift in
    # save/load round-trips, not just structural drift
    def tree_sum(tree):
        return float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree.leaves(tree)
                         if not isinstance(x, (str, bytes, type(None)))))

    sums = {
        "gen_params_abssum": tree_sum(state.gen_params),
        "disc_params_abssum": tree_sum(state.disc_params),
        "gen_opt_abssum": tree_sum(state.gen_opt_state),
        "disc_opt_abssum": tree_sum(state.disc_opt_state),
        "step": int(np.asarray(state.step)),
        "n_gen_leaves": len(jax.tree.leaves(state.gen_params)),
        "format": GOLDEN_FORMAT_NOTE,
    }
    with open(SUMS, "w") as f:
        json.dump(sums, f, indent=1)
    size = os.path.getsize(FIXTURE)
    print(f"wrote {FIXTURE} ({size / 1e6:.2f} MB)")
    print(json.dumps(sums, indent=1))


if __name__ == "__main__":
    main()
