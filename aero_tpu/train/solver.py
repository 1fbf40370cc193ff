"""Training engine: the epoch loop (Solver).

Mirrors the reference Solver's contract (``/root/reference/src/solver.py:42-274``):
per-epoch train pass, optional cross-validation, best-state tracking on
valid loss, scheduled test-set evaluate+enhance, per-epoch checkpoint +
``history.json``, resume with history replay. The per-batch math lives
in the jitted ``train_step`` (gen + disc updates fused); this class is
pure host-side orchestration.
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from aero_tpu.data.datasets import PrHrSet, match_signal
from aero_tpu.eval import metrics as eval_metrics
from aero_tpu.eval.enhance import save_specs, save_wavs
from aero_tpu.eval.evaluate import evaluate, evaluate_on_saved_data
from aero_tpu.eval.forward import EvalForward
from aero_tpu.parallel import mesh as pmesh
from aero_tpu.train import checkpoint as ckpt
from aero_tpu.train.train_step import LossComputer, make_train_step
from aero_tpu.utils.config import to_plain
from aero_tpu.utils.log import LogProgress, bold, pull_metric
from aero_tpu.utils import wandb_logger

logger = logging.getLogger(__name__)

GENERATOR_KEY = "generator"
METRICS_KEY_EVALUATION_LOSS = "evaluation_loss"
METRICS_KEY_BEST_LOSS = "best_loss"


def _has_data(loader) -> bool:
    """Whether a valid/eval phase should run — decided on the GLOBAL
    dataset size, never the local shard: with more processes than eval
    files a rank's strided shard is empty (len(loader) == 0), and a
    per-rank truthiness gate would make ranks disagree on entering the
    phase's cross-rank reductions, deadlocking the collective. Empty-
    shard ranks instead run the phase with zero files and contribute
    weight 0 (see _valid_metric_keys / evaluate's zero-exclusion)."""
    return loader is not None and len(loader.dataset) > 0
METRICS_KEY_LSD = "Average lsd"
METRICS_KEY_VISQOL = "Average visqol"
# ViSQOL MOS values are only comparable within one scorer calibration;
# every history entry carrying a visqol value records the scorer stamp
# (parsed from the CLI's VISQOL-COMPAT line, eval/metrics.py).
METRICS_KEY_VISQOL_SCORER = "visqol_scorer"


class Solver:
    def __init__(self, data, models, state, args, mesh=None):
        self.tr_loader = data["tr_loader"]
        self.cv_loader = data["cv_loader"]
        self.tt_loader = data["tt_loader"]
        self.args = args
        self.models = models
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        self.state = pmesh.replicate(state, self.mesh)

        exp = args.experiment
        self.adversarial_mode = bool(exp.get("adversarial", False))

        self.train_step = make_train_step(args, models, self.mesh)
        self.valid_loss_fn = self._make_loss_only()
        self.fused_valid_fn = self._make_fused_valid()
        self._valid_keys = None
        self._spec_fns_cache = None

        scale = (float(exp.hr_sr) / float(exp.lr_sr)
                 if not exp.get("upsample", False) else 1.0)
        lr_sr = int(exp.hr_sr if exp.get("upsample", False) else exp.lr_sr)
        return_spec = exp.model == "aero"
        self.eval_forward = EvalForward(
            models["generator"], pmesh.local_state(self.state), scale=scale,
            lr_sr=lr_sr,
            bucket_s=float(args.get("eval_bucket_s", 1.0)),
            return_spec=return_spec)

        self.epochs = int(args.epochs)
        self.eval_every = int(args.eval_every)
        self.cross_valid = bool(args.cross_valid)
        self.cross_valid_every = int(args.cross_valid_every)
        self.checkpoint = bool(args.checkpoint)
        self.checkpoint_every = int(args.get("checkpoint_every", 1))
        self.checkpoint_file = str(args.checkpoint_file)
        self.continue_from = args.get("continue_from") or ""
        self.restart = bool(args.get("restart", False))
        self.history_file = str(args.history_file)
        self.samples_dir = str(args.samples_dir)
        self.num_prints = int(args.num_prints)

        self.history: list = []
        self.best_states = None
        self._step_warmed = False
        self._reset()

    # ------------------------------------------------------------------
    def _make_loss_only(self):
        """Jitted loss-only computation for full-length validation
        (reference runs valid losses on full files, solver.py:353-425).
        jax.jit caches one executable per input length (bucket)."""
        lc = LossComputer(self.args, self.models)

        @jax.jit
        def loss_fn(state, pr, hr, n_valid):
            gen_losses = lc.generator_losses(pr, hr, state.disc_params,
                                             state.disc_state, train=False,
                                             n_valid=n_valid)
            metrics = {f"generator_{k}": v for k, v in gen_losses.items()}
            if lc.adversarial and state.disc_params:
                disc_losses, _ = lc.discriminator_losses(
                    pr, hr, state.disc_params, state.disc_state, train=False,
                    n_valid=n_valid)
                metrics.update({f"discriminator_{k}": v
                                for k, v in disc_losses.items()})
            metrics["total"] = sum(gen_losses.values())
            return metrics

        return loss_fn

    def _make_fused_valid(self):
        """One jit for the whole per-file valid computation: generator
        forward + length match + reflected-tail reconstruction + masked
        losses, metrics returned as DEVICE scalars. The split path
        (``EvalForward`` then ``_valid_losses``) costs two dispatches
        plus a full-waveform device->host->device bounce and a blocking
        ``float()`` per file — through a remote device transport that
        latency dominated the valid epoch (measured ~1.6 s/file for
        ~0.2 s of compute). Fused + lazily accumulated, files pipeline
        asynchronously like train steps do.

        Exactness: identical math to the split path — the forward is the
        same bucketed-input apply, and the on-device
        ``dynamic_update_slice`` writes pr[n-2-i] at positions n+i
        (i < margin), exactly the reflected tail ``_pad_reflect_tail``
        builds on host (tests/test_fused_valid.py)."""
        from aero_tpu.losses.stft_loss import STFT_LOSS_PAD_MARGIN

        lc = LossComputer(self.args, self.models)
        gen = self.models["generator"]
        margin = STFT_LOSS_PAD_MARGIN

        @jax.jit
        def fused(state, lr_padded, hr_padded, n_valid, n_pr):
            variables = {"params": state.gen_params, **state.gen_state}
            pr = gen.apply(variables, lr_padded, train=False)
            L = hr_padded.shape[-1]
            if pr.shape[-1] < L:
                pr = jnp.pad(pr, [(0, 0)] * (pr.ndim - 1)
                             + [(0, L - pr.shape[-1])])
            elif pr.shape[-1] > L:
                pr = pr[..., :L]
            # reference semantics: model output only covers
            # int(n_lr*scale) samples (EvalForward's target trim);
            # match_signal zero-pads any shortfall vs n_hr
            # (datasets.match_signal). Zero [n_pr, L) so the masked
            # losses and the reflection below see exactly what the
            # split path's zero-padded pr contains.
            pr = pr * (jnp.arange(L) < n_pr).astype(pr.dtype)
            tail = jax.lax.dynamic_slice_in_dim(
                pr, n_valid - margin - 1, margin, axis=-1)
            pr = jax.lax.dynamic_update_slice_in_dim(
                pr, jnp.flip(tail, -1), n_valid, axis=-1)
            gen_losses = lc.generator_losses(pr, hr_padded,
                                             state.disc_params,
                                             state.disc_state, train=False,
                                             n_valid=n_valid)
            metrics = {f"generator_{k}": v for k, v in gen_losses.items()}
            if lc.adversarial and state.disc_params:
                disc_losses, _ = lc.discriminator_losses(
                    pr, hr_padded, state.disc_params, state.disc_state,
                    train=False, n_valid=n_valid)
                metrics.update({f"discriminator_{k}": v
                                for k, v in disc_losses.items()})
            metrics["total"] = sum(gen_losses.values())
            return metrics

        return fused

    def _fused_valid_shapes(self, n_lr: int, n_hr: int):
        """(padded lr len, padded hr len, ok) for the fused valid path;
        ok=False falls back to the split path (exact-length mode, or a
        file too short for the on-device tail reconstruction). All
        discriminator families compute padding-invariant MASKED losses
        under bucketing (melgan per-layer masks; hifi period/scale
        stacks per-layer masked since r4 — tests/test_valid_masking.py),
        so fused (t_lr*scale+margin) and split (hr-bucket multiple)
        padded lengths give identical values and both paths may mix
        freely within an epoch."""
        from aero_tpu.eval.forward import bucket_target
        from aero_tpu.losses.stft_loss import STFT_LOSS_PAD_MARGIN

        exp = self.args.experiment
        lr_sr = int(exp.hr_sr if exp.get("upsample", False) else exp.lr_sr)
        bucket_lr = int(float(self.args.get("eval_bucket_s", 1.0)) * lr_sr)
        if bucket_lr <= 0 or n_hr < STFT_LOSS_PAD_MARGIN + 2:
            return 0, 0, False
        t_lr = bucket_target(n_lr, bucket_lr)
        t_hr = int(t_lr * self.eval_forward.scale) + STFT_LOSS_PAD_MARGIN
        if t_lr * self.eval_forward.scale < n_hr:
            return 0, 0, False
        return t_lr, t_hr, True

    def _valid_losses(self, lstate, pr, hr):
        """Valid losses with length bucketing: pad BOTH signals (tail
        reflection, same scheme as EvalForward) to a multiple of
        ``eval_bucket_s`` so the loss jit compiles once per bucket
        instead of once per distinct file length — on VCTK-scale eval
        sets the per-length compiles otherwise dominate wall-clock.
        The losses themselves are computed with valid-length masks (and
        a reflect-pad margin >= the largest STFT center pad), so they
        EQUAL the reference's exact-length computation (solver.py:
        353-425) — see tests/test_valid_masking.py. ``eval_bucket_s: 0``
        restores literal exact-length shapes (one compile per length)."""
        from aero_tpu.eval.forward import _pad_reflect_tail, bucket_target
        from aero_tpu.losses.stft_loss import STFT_LOSS_PAD_MARGIN

        n = int(hr.shape[-1])
        bucket = int(float(self.args.get("eval_bucket_s", 1.0))
                     * int(self.args.experiment.hr_sr))
        n_valid = None
        if bucket > 0:
            # margin past n so masked STFT frames and the melgan reflect
            # tail are computed from real reflected samples, not the
            # next file's bucket boundary
            tgt = bucket_target(n + STFT_LOSS_PAD_MARGIN, bucket)
            pr = _pad_reflect_tail(np.asarray(pr, np.float32), tgt)
            hr = _pad_reflect_tail(np.asarray(hr, np.float32), tgt)
            n_valid = jnp.asarray(n, jnp.int32)
        return jax.device_get(self.valid_loss_fn(
            lstate, jnp.asarray(pr), jnp.asarray(hr), n_valid))

    def _copy_models_states(self):
        # fetch ONLY model params/state — not the optimizer moments,
        # which double the transfer and aren't part of best_states
        # (reference copy_state, src/utils.py:175-176). Through a remote
        # device tunnel the full-state fetch measured minutes per new
        # best; this is the hot path of early training.
        gen_params, gen_state, disc_params, disc_state = jax.device_get(
            (self.state.gen_params, self.state.gen_state,
             self.state.disc_params, self.state.disc_state))
        states = {GENERATOR_KEY: {"params": gen_params, **gen_state}}
        for name in disc_params:
            states[name] = {"params": disc_params[name],
                            **disc_state.get(name, {})}
        return states

    def _reset(self):
        load_from = None
        load_best = False
        keep_history = True
        if self.checkpoint and os.path.exists(self.checkpoint_file) \
                and not self.restart:
            load_from = self.checkpoint_file
        elif self.continue_from:
            load_from = self.continue_from
            load_best = bool(self.args.get("continue_best", False))
            keep_history = bool(self.args.get("keep_history", True))

        if load_from:
            logger.info(f"Loading checkpoint model: {load_from}")
            if str(load_from).endswith(".th"):
                self._load_torch(load_from, load_best, keep_history)
            else:
                package = ckpt.load_package(load_from)
                host = jax.device_get(self.state)
                host = ckpt.state_from_package(package, host)
                self.state = pmesh.replicate(host, self.mesh)
                if keep_history:
                    self.history = ckpt.history_from_package(package)
                self.best_states = ckpt.best_states_from_package(package)
            self.eval_forward.update_state(pmesh.local_state(self.state))

    def _load_torch(self, path, load_best, keep_history=True):
        """Resume from a reference ``checkpoint.th``: restore every model
        whose importer exists (generator + msd_melgan), history,
        best_states, AND the Adam moments (exp_avg/exp_avg_sq/step) —
        the full reference package contract (solver.py:103-133,
        model_serializer.py:39-53). torch Adam state is keyed by param
        position in the param_groups, i.e. ``parameters()`` order, which
        is reconstructed from the state_dict key order
        (torch_import.torch_param_order); the moment tensors go through
        the same linear layout transforms as the weights. Not restored
        (logged loudly): hifi-family discriminator states/moments (no
        importer) and moments under AERO_FLAT_OPT=1 (raveled state has a
        different structure)."""
        import os as _os

        from aero_tpu.train import torch_import

        pkg = torch_import.load_torch_checkpoint(path)
        src = pkg["best_states"] if load_best and pkg["best_states"] \
            else pkg["models"]
        host = jax.device_get(self.state)

        def imported_models(src_states, template):
            gen_vars = dict(torch_import.import_generator_state(
                str(self.args.experiment.model), src_states["generator"],
                {"params": template.gen_params, **template.gen_state}))
            disc_params = dict(template.disc_params)
            for name in template.disc_params:
                if name not in src_states:
                    logger.warning(
                        f"torch checkpoint has no '{name}' state; the "
                        f"discriminator keeps its fresh initialization")
                elif name == "msd_melgan":
                    disc_params[name] = torch_import.import_melgan_state(
                        src_states[name], template.disc_params[name],
                        int(self.args.experiment
                            .melgan_discriminator.n_layers))
                else:
                    logger.warning(
                        f"no torch importer for discriminator '{name}'; "
                        f"it keeps its fresh initialization")
            return gen_vars, disc_params

        gen_vars, disc_params = imported_models(src, host)
        host = host.replace(gen_params=gen_vars.pop("params"),
                            gen_state=gen_vars, disc_params=disc_params)
        # Optimizer moments (reference _load restores optimizer
        # state_dicts only on a non-best load, solver.py:104-112)
        if load_best:
            pass  # reference semantics: best-state load keeps fresh opt
        elif _os.environ.get("AERO_FLAT_OPT", "0") == "1":
            logger.warning("AERO_FLAT_OPT=1: raveled opt state cannot "
                           "take torch moments; Adam restarts fresh")
        else:
            host = self._import_torch_moments(torch_import, pkg, host)
        self.state = pmesh.replicate(host, self.mesh)
        if keep_history and pkg.get("history"):
            self.history = list(pkg["history"])
        if pkg["best_states"]:
            b_gen, b_disc = imported_models(pkg["best_states"],
                                            jax.device_get(self.state))
            best = {GENERATOR_KEY: b_gen}
            host_dstate = jax.device_get(self.state.disc_state)
            for name, p in b_disc.items():
                best[name] = {"params": p, **host_dstate.get(name, {})}
            self.best_states = best

    def _import_torch_moments(self, torch_import, pkg, host):
        """Restore Adam exp_avg/exp_avg_sq/step from the reference
        checkpoint's optimizer state_dicts ('optimizer' = generator,
        'disc_optimizer' = discriminators chained in
        discriminator_models order; reference train.py:83,91-96,
        solver.py:126-129)."""
        from aero_tpu.train.train_step import with_adam_moments

        opts = pkg.get("optimizers") or {}
        exp = self.args.experiment
        if not opts:
            logger.warning("torch checkpoint carries no optimizer state; "
                           "Adam resumes with fresh moments")
            return host
        if opts.get("optimizer", {}).get("state") \
                and str(exp.model) == "aero":
            try:
                mu, nu, step = torch_import.import_aero_adam_moments(
                    opts["optimizer"], pkg["param_keys"]["generator"],
                    host.gen_params)
                host = host.replace(gen_opt_state=with_adam_moments(
                    host.gen_opt_state, mu, nu, step))
                logger.info(f"torch checkpoint: generator Adam moments "
                            f"imported (step {step})")
            except Exception as e:  # noqa: BLE001 — degrade to fresh
                logger.warning(f"generator Adam moment import failed "
                               f"({e!r}); fresh moments")
        elif opts:
            logger.warning("torch checkpoint: no generator Adam moment "
                           "importer for this config; fresh moments")
        disc_names = list(exp.get("discriminator_models", []))
        if opts.get("disc_optimizer", {}).get("state") and host.disc_params:
            if disc_names == ["msd_melgan"]:
                try:
                    mu, nu, step = torch_import.import_melgan_adam_moments(
                        opts["disc_optimizer"],
                        pkg["param_keys"]["msd_melgan"],
                        host.disc_params["msd_melgan"],
                        int(exp.melgan_discriminator.n_layers))
                    host = host.replace(disc_opt_state=with_adam_moments(
                        host.disc_opt_state,
                        {"msd_melgan": mu}, {"msd_melgan": nu}, step))
                    logger.info(f"torch checkpoint: melgan Adam moments "
                                f"imported (step {step})")
                except Exception as e:  # noqa: BLE001
                    logger.warning(f"discriminator Adam moment import "
                                   f"failed ({e!r}); fresh moments")
            else:
                logger.warning(
                    f"torch checkpoint: no Adam moment importer for the "
                    f"discriminator chain {disc_names}; fresh moments")
        return host

    # ------------------------------------------------------------------
    def train(self):
        if self.history:
            logger.info("Replaying metrics from previous run")
        for epoch, metrics in enumerate(self.history):
            info = " ".join(
                f"{k.capitalize()}={v:.5f}" if isinstance(v, (int, float))
                else f"{k.capitalize()}={v}" for k, v in metrics.items())
            logger.info(f"Epoch {epoch + 1}: {info}")

        logger.info("-" * 70)
        logger.info("Trainable Params:")
        host = jax.device_get(self.state)
        n_gen = sum(int(np.prod(p.shape))
                    for p in jax.tree.leaves(host.gen_params))
        logger.info(f"generator: parameters: {n_gen}, "
                    f"size: {n_gen * 4 / 2 ** 20:.2f} MB")
        for name, p in host.disc_params.items():
            n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))
            logger.info(f"{name}: parameters: {n}, "
                        f"size: {n * 4 / 2 ** 20:.2f} MB")

        best_loss = None
        if self.best_states is None:
            self.best_states = {}

        for epoch in range(len(self.history), self.epochs):
            start = time.time()
            logger.info("-" * 70)
            logger.info("Training...")
            losses = self._run_one_epoch(epoch)
            logger.info(bold(
                f"Train Summary | End of Epoch {epoch + 1} | "
                f"Time {time.time() - start:.2f}s | "
                + " | ".join(f"{k} Loss {v:.5f}" for k, v in losses.items())))
            losses = {k + "_loss": v for k, v in losses.items()}
            valid_losses = {}
            evaluation_loss = None
            evaluated_on_test = False
            enhanced_filenames = None

            if self.cross_valid and (
                    (epoch + 1) % self.cross_valid_every == 0
                    or epoch == self.epochs - 1) and _has_data(self.cv_loader):
                cv_start = time.time()
                logger.info("-" * 70)
                logger.info("Cross validation...")
                if self.args.get("valid_equals_test") \
                        and _has_data(self.tt_loader):
                    enhance_now = ((epoch + 1) % self.eval_every == 0
                                   or epoch == self.epochs - 1)
                    valid_losses, enhanced_filenames = \
                        self._valid_on_test_data(epoch, enhance=enhance_now)
                    evaluated_on_test = enhance_now
                else:
                    valid_losses = self._valid_epoch(self.cv_loader, epoch)
                evaluation_loss = valid_losses["evaluation"]
                logger.info(bold(
                    f"Validation Summary | End of Epoch {epoch + 1} | "
                    f"Time {time.time() - cv_start:.2f}s | "
                    + " | ".join(f"{k} Valid Loss {v:.5f}"
                                 for k, v in valid_losses.items())))
                valid_losses = {"valid_" + k + "_loss": v
                                for k, v in valid_losses.items()}

                best_loss = min(pull_metric(self.history,
                                            "valid_evaluation_loss")
                                + [evaluation_loss])
                if evaluation_loss == best_loss:
                    logger.info(bold(
                        f"New best valid loss {evaluation_loss:.4f}"))
                    self.best_states = self._copy_models_states()

            metrics = {**losses, **valid_losses}
            # `is not None`, not truthiness: a legitimate 0.0 loss must
            # still be recorded in history.
            if evaluation_loss is not None:
                metrics[METRICS_KEY_EVALUATION_LOSS] = evaluation_loss
            if best_loss is not None:
                metrics[METRICS_KEY_BEST_LOSS] = best_loss

            if ((epoch + 1) % self.eval_every == 0
                    or epoch == self.epochs - 1) and _has_data(self.tt_loader):
                logger.info("-" * 70)
                logger.info("Evaluating on the test set...")
                eval_start = time.time()
                swapped = False

                # `is not None`: an empty-shard rank enhanced zero files
                # ([]) but must still take the same branch as its peers
                # (both branches end in cross-rank reductions).
                if evaluated_on_test and enhanced_filenames is not None:
                    # scores artifacts already enhanced (with the last
                    # state) during cross-valid — no model forward, so no
                    # best-state swap / state fetch here
                    logger.info("Scoring saved enhanced artifacts.")
                    enhanced = PrHrSet(self.samples_dir, enhanced_filenames)
                    lsd, visqol = evaluate_on_saved_data(self.args, enhanced,
                                                         epoch)
                else:
                    eval_state = self.state
                    if self.args.get("evaluate_on_best") and self.best_states:
                        logger.info("Loading best state.")
                        eval_state = self._state_with(self.best_states)
                        swapped = True
                    else:
                        logger.info("Using last state.")
                    self.eval_forward.update_state(pmesh.local_state(eval_state))
                    lsd, visqol, enhanced_filenames = evaluate(
                        self.args, self.tt_loader, epoch, self.eval_forward,
                        spec_fns=self._spec_fns())
                if epoch == self.epochs - 1 and \
                        bool(self.args.get("log_results")) and \
                        enhanced_filenames:
                    # final results table (reference solver.py:254)
                    logger.info("logging results to wandb...")
                    wandb_logger.create_wandb_table(
                        self.args,
                        PrHrSet(self.samples_dir, enhanced_filenames), epoch)
                logger.info(bold(
                    f"Evaluation Time {time.time() - eval_start:.2f}s"))
                metrics[METRICS_KEY_LSD] = lsd
                metrics[METRICS_KEY_VISQOL] = visqol
                if visqol:
                    # MOS values are only comparable within one scorer
                    # calibration — stamp every history entry that
                    # carries one (VERDICT r3 §weak-4).
                    metrics[METRICS_KEY_VISQOL_SCORER] = (
                        eval_metrics.visqol_scorer_version(
                            self.args.get("visqol_path")
                            or eval_metrics.default_visqol_path())
                        or "unknown")
                if swapped:
                    self.eval_forward.update_state(
                        pmesh.local_state(self.state))

            wandb_logger.log_metrics(metrics, step=epoch)
            self.history.append(metrics)
            info = " | ".join(
                f"{k.capitalize()} {v:.5f}" if isinstance(v, (int, float))
                else f"{k.capitalize()} {v}" for k, v in metrics.items())
            logger.info("-" * 70)
            logger.info(bold(f"Overall Summary | Epoch {epoch + 1} | {info}"))

            if jax.process_index() == 0:
                with open(self.history_file, "w") as f:
                    json.dump(self.history, f, indent=2)
                if self._should_checkpoint(epoch):
                    self._serialize()
        return self.history

    # ------------------------------------------------------------------
    def _state_with(self, model_states):
        host = jax.device_get(self.state)
        gen = dict(model_states[GENERATOR_KEY])
        host = host.replace(gen_params=gen.pop("params"), gen_state=gen)
        return pmesh.replicate(host, self.mesh)

    def _spec_fns(self):
        # memoized: each make_spec_fns call creates a fresh @jax.jit
        # closure, which would retrace per call site invocation (the
        # enhance loop calls this per file)
        if self._spec_fns_cache is None:
            from aero_tpu.eval.forward import make_spec_fns

            self._spec_fns_cache = make_spec_fns(self.args,
                                                 self.models["generator"])
        return self._spec_fns_cache

    def _run_one_epoch(self, epoch):
        self.tr_loader.set_epoch(epoch)
        name = f"Train | Epoch {epoch + 1}"
        logprog = LogProgress(logger, self.tr_loader, updates=self.num_prints,
                              name=name)

        profile_step = (int(self.args.get("profile", 0)) and epoch == 0)
        # Metrics stay ON DEVICE between log points: a per-step
        # device_get would force a host round-trip per step (60-90 ms
        # through the TPU tunnel) and defeat async dispatch. We
        # accumulate with lazy jnp adds and fetch only when LogProgress
        # is about to print (same cadence it uses internally).
        n_batches = len(self.tr_loader)
        log_every = max(1, n_batches // max(1, self.num_prints))
        acc = None
        i = -1
        for i, (lr, hr) in enumerate(logprog):
            lr = pmesh.shard_batch(jnp.asarray(lr), self.mesh)
            hr = pmesh.shard_batch(jnp.asarray(hr), self.mesh)
            if i == 0 and not self._step_warmed and jax.process_count() > 1:
                # Compile the step BEFORE its first (collective) execution
                # and line ranks up over the coordination service: the
                # first gloo/ICI context rendezvous has a ~30 s deadline,
                # far less than cross-rank compile skew.
                self.train_step.lower(self.state, lr, hr).compile()
                pmesh.coordination_barrier("first_train_step")
                self._step_warmed = True
            if profile_step and i == 1:  # step 0 compiles; trace step 1
                from aero_tpu.utils.profiling import trace

                with trace(str(self.args.get("profile_dir", "profile"))):
                    self.state, metrics = self.train_step(self.state, lr, hr)
                    jax.block_until_ready(metrics)
            elif i == 0:
                # First call compiles; an HBM OOM here has a config-level
                # fix (accum_steps) users should hear about, not just the
                # raw XLA allocation dump.
                try:
                    self.state, metrics = self.train_step(self.state, lr, hr)
                except Exception as e:
                    if "Ran out of memory" in str(e) or \
                            "RESOURCE_EXHAUSTED" in str(e):
                        accum = int(self.args.get("accum_steps", 1) or 1)
                        raise RuntimeError(
                            f"train step does not fit device memory at "
                            f"batch_size={self.args.experiment.batch_size}, "
                            f"accum_steps={accum}. Raise accum_steps (root "
                            f"config): it microbatches the fused step at "
                            f"the SAME effective batch with ~K x less live "
                            f"activation HBM (e.g. 11->44 music needs "
                            f"accum_steps=4 on a 16 GB chip) — prefer it "
                            f"over lowering batch_size, which changes "
                            f"optimization dynamics.") from e
                    raise
            else:
                self.state, metrics = self.train_step(self.state, lr, hr)
            acc = metrics if acc is None else jax.tree.map(
                jnp.add, acc, metrics)
            # LogProgress prints inside the NEXT __next__ when the new
            # index hits a log_every multiple; refresh infos just before.
            if (i + 1) % log_every == 0:
                running = float(jax.device_get(acc["total"])) / (i + 1)
                logprog.update(total_loss=format(running, ".5f"))

        n = i + 1 if i >= 0 else 1
        host = jax.device_get(acc) if acc is not None else {"total": 0.0}
        total_loss = float(host.pop("total"))
        total_losses = {k: float(v) for k, v in host.items()}
        avg = {"total": total_loss / n, "evaluation": total_loss / n}
        avg.update({k: v / n for k, v in total_losses.items()})
        # eval_forward is NOT refreshed here: pmesh.local_state fetches
        # the full tree to host on multi-process runs (minutes through a
        # remote tunnel), and most epochs never use eval_forward. The
        # valid/eval phases refresh it themselves (reusing their own
        # local_state fetch) right before use.
        return avg

    def _file_valid_metrics(self, lstate, lr, hr):
        """Per-file valid metrics: fused single-dispatch path when the
        bucket shapes allow it (device scalars, lazily fetchable), else
        the split forward+loss path (host floats)."""
        from aero_tpu.eval.forward import _pad_reflect_tail

        n_hr = int(hr.shape[-1])
        t_lr, t_hr, ok = self._fused_valid_shapes(int(lr.shape[-1]), n_hr)
        if ok:
            lr_b = _pad_reflect_tail(np.asarray(lr, np.float32), t_lr)
            hr_b = _pad_reflect_tail(np.asarray(hr, np.float32), t_hr)
            n_pr = int(int(lr.shape[-1]) * self.eval_forward.scale)
            return self.fused_valid_fn(lstate, jnp.asarray(lr_b),
                                       jnp.asarray(hr_b),
                                       jnp.asarray(n_hr, jnp.int32),
                                       jnp.asarray(n_pr, jnp.int32))
        out = self.eval_forward(lr)
        pr = out[0] if isinstance(out, tuple) else out
        pr = match_signal(pr, n_hr)
        return self._valid_losses(lstate, pr, hr)

    def _valid_epoch(self, loader, epoch):
        """Full-file validation losses, one async dispatch per file.

        Metrics stay on device between log points (same rationale as the
        train loop): a per-file fetch costs a tunnel round trip and
        serializes the pipeline."""
        logprog = LogProgress(logger, loader, updates=self.num_prints,
                              name=f"Valid | Epoch {epoch + 1}")
        lstate = pmesh.local_state(self.state)
        self.eval_forward.update_state(lstate)  # split-path fallback files
        n_files = len(loader)
        log_every = max(1, n_files // max(1, self.num_prints))
        acc = None
        i = -1
        for i, (lr, hr) in enumerate(logprog):
            metrics = self._file_valid_metrics(lstate, lr, hr)
            acc = metrics if acc is None else jax.tree.map(
                jnp.add, acc, metrics)
            if (i + 1) % log_every == 0:
                running = float(jax.device_get(acc["total"])) / (i + 1)
                logprog.update(total_loss=format(running, ".5f"))
        n = i + 1 if i >= 0 else 1
        host = jax.device_get(acc) if acc is not None else {"total": 0.0}
        total_loss = float(host.pop("total"))
        avg = {"total": total_loss / n, "evaluation": total_loss / n}
        avg.update({k: float(v) / n for k, v in host.items()})
        return self._reduce_valid(avg, i + 1)

    def _valid_metric_keys(self):
        """Rank-independent valid metric key set, via ``jax.eval_shape``
        on the loss jit (config-derived, no compute). A rank whose eval
        shard is empty (more processes than eval files) must contribute
        the SAME sorted key vector to the cross-rank reduction as ranks
        that saw files, or the allgather mismatches shapes."""
        if self._valid_keys is None:
            sr = int(self.args.experiment.hr_sr)
            dummy = jax.ShapeDtypeStruct((1, 1, sr), jnp.float32)
            out = jax.eval_shape(self.valid_loss_fn,
                                 pmesh.local_state(self.state), dummy, dummy,
                                 jax.ShapeDtypeStruct((), jnp.int32))
            self._valid_keys = sorted(out)
        return self._valid_keys

    def _reduce_valid(self, avg, n):
        """Cross-rank weighted average of per-rank valid losses so every
        process agrees on evaluation_loss and best-state epochs. The
        reference leaves valid losses rank-local (its distrib.average is
        only applied to eval metrics, src/evaluate.py:173-177) — a
        divergence wart we fix rather than replicate (SURVEY §2.5).
        Single-process: identity."""
        for k in self._valid_metric_keys():
            avg.setdefault(k, 0.0)  # weight n=0 on empty shards
        keys = sorted(avg)
        vals, _ = pmesh.global_weighted_average([avg[k] for k in keys], n)
        return dict(zip(keys, vals))

    def _valid_on_test_data(self, epoch, enhance):
        """Valid losses on the test loader, optionally saving enhanced
        artifacts along the way (reference solver.py:353-425)."""
        total_losses = {}
        total_loss = 0.0
        total_filenames = []
        logprog = LogProgress(logger, self.tt_loader,
                              updates=self.num_prints,
                              name=f"Valid | Epoch {epoch + 1}")
        exp = self.args.experiment
        lstate = pmesh.local_state(self.state)
        self.eval_forward.update_state(lstate)
        i = -1
        n_files = len(self.tt_loader)
        log_every = max(1, n_files // max(1, self.num_prints))
        acc = None
        for i, data in enumerate(logprog):
            (lr, lr_paths), (hr, hr_paths) = data
            filename = os.path.splitext(os.path.basename(hr_paths[0]))[0]
            total_filenames.append(filename)

            if not enhance:
                # no artifacts to save: fused async path (see _valid_epoch)
                metrics = self._file_valid_metrics(lstate, lr, hr)
                acc = metrics if acc is None else jax.tree.map(
                    jnp.add, acc, metrics)
                if (i + 1) % log_every == 0:
                    running = float(jax.device_get(acc["total"])) / (i + 1)
                    logprog.update(total_loss=format(running, ".5f"))
                continue

            # enhance-and-save path (the `not enhance` branch continued
            # above). Spec artifacts match evaluate(): AERO returns its
            # own spectra; other models get plain spectro heatmaps
            # (reference evaluate.py:69-73 via solver.py:378-395).
            if self.eval_forward.return_spec:
                pr, pr_spec, lr_spec = self.eval_forward(lr)
                hr_spec = self._spec_fns()["hr_spec"](hr)
            else:
                pr = self.eval_forward(lr)
                spec = self._spec_fns().get("spec")
                pr_spec = spec(pr) if spec else None
                lr_spec = spec(lr) if spec else None
                hr_spec = spec(hr) if spec else None
            pr = match_signal(pr, hr.shape[-1])

            os.makedirs(self.samples_dir, exist_ok=True)
            lr_sr = exp.hr_sr if exp.get("upsample") else exp.lr_sr
            save_wavs(pr, lr, hr,
                      [os.path.join(self.samples_dir, filename)],
                      lr_sr, exp.hr_sr)
            if pr_spec is not None:
                save_specs(lr_spec[0], pr_spec[0], hr_spec[0],
                           os.path.join(self.samples_dir, filename))

            metrics = self._valid_losses(lstate, pr, hr)
            total_loss += float(metrics["total"])
            for k, v in metrics.items():
                if k != "total":
                    total_losses[k] = total_losses.get(k, 0.0) + float(v)
            logprog.update(total_loss=format(total_loss / (i + 1), ".5f"))

        n = i + 1 if i >= 0 else 1
        if acc is not None:
            host = jax.device_get(acc)
            total_loss = float(host.pop("total"))
            total_losses = {k: float(v) for k, v in host.items()}
        avg = {"total": total_loss / n, "evaluation": total_loss / n}
        avg.update({k: v / n for k, v in total_losses.items()})
        return self._reduce_valid(avg, i + 1), \
            (total_filenames if enhance else None)

    def _should_checkpoint(self, epoch: int) -> bool:
        """Serialize cadence: every epoch by default (reference
        solver.py:269-274); ``checkpoint_every: N`` amortizes the full
        state fetch for large runs — through a remote device tunnel the
        ~420 MB state transfer measured minutes per save. The last
        epoch always saves so the run always ends resumable."""
        if not self.checkpoint:
            return False
        return ((epoch + 1) % self.checkpoint_every == 0
                or epoch == self.epochs - 1)

    def _serialize(self):
        host = jax.device_get(self.state)
        pkg = ckpt.package_from_state(host, self.history, self.best_states,
                                      to_plain(self.args))
        ckpt.save_package(self.checkpoint_file, pkg)
        # per-model best file (model_serializer.py:56-63)
        if self.best_states:
            best_file = str(self.args.get("best_file", "best.atpu"))
            ckpt.save_package(best_file, {
                "models": self.best_states,
                "args": json.dumps(to_plain(self.args))})
        logger.debug(f"Checkpoint saved to {self.checkpoint_file}")
