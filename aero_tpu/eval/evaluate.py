"""Joint evaluate + enhance over a test loader.

Parity: /root/reference/src/evaluate.py —
- per-file forward with spectra, metrics, artifact save (:54-97)
- saved-data variant over PrHrSet (:18-47, :100-140)
- zero-metric exclusion from averages (:121-122, :167-168)
- cross-process metric averaging (:173-179) via jax collectives when
  running multi-process (single-process: plain averages).
"""

from __future__ import annotations

import logging
import os

import numpy as np

from aero_tpu.data.datasets import match_signal
from aero_tpu.eval.enhance import save_specs, save_wavs
from aero_tpu.eval.metrics import run_metrics
from aero_tpu.utils.log import LogProgress, bold
from aero_tpu.utils import wandb_logger

logger = logging.getLogger(__name__)


def _averages(total_lsd, lsd_count, total_visqol, visqol_count):
    """Zero-excluded averages, reduced across processes when distributed
    (reference evaluate.py:173-179 / distrib.average)."""
    from aero_tpu.parallel.mesh import global_weighted_average

    avg_lsd = total_lsd / lsd_count if lsd_count else 0.0
    avg_visqol = total_visqol / visqol_count if visqol_count else 0.0
    (avg_lsd,), _ = global_weighted_average([avg_lsd], lsd_count)
    (avg_visqol,), _ = global_weighted_average([avg_visqol], visqol_count)
    return avg_lsd, avg_visqol


def evaluate(args, data_loader, epoch, eval_forward, spec_fns=None):
    """Returns (avg_lsd, avg_visqol, filenames).

    ``eval_forward``: EvalForward configured with return_spec when the
    generator is AERO (so pr/lr spectra come straight from the model,
    reference evaluate.py:63-67).
    """
    total_lsd = total_visqol = 0.0
    lsd_count = visqol_count = total_cnt = 0
    total_filenames = []
    n_log = int(args.wandb.get("n_files_to_log", 10)) if "wandb" in args else -1
    lr_sr = args.experiment.hr_sr if args.experiment.get("upsample") \
        else args.experiment.lr_sr
    os.makedirs(args.samples_dir, exist_ok=True)

    def host_work(pr, hr, lr, pr_spec, lr_spec, hr_spec, filename,
                  log_media):
        """Everything downstream of the device fetch: metrics (numpy LSD
        + ViSQOL subprocess; temp wavs are per-filename so concurrent
        scoring can't collide), wandb media, wav/PNG artifacts. Runs on
        a worker thread so it overlaps the NEXT file's forward — the
        eval loop was serial device-then-host before and paid both."""
        lsd_i, visqol_i = run_metrics(hr, pr, args, filename)
        if log_media:
            wandb_logger.log_data_to_wandb(
                pr, hr, lr, lsd_i, visqol_i, filename, epoch,
                lr_sr, args.experiment.hr_sr,
                lr_spec=lr_spec, pr_spec=pr_spec, hr_spec=hr_spec)
        save_wavs(pr, lr, hr, [os.path.join(args.samples_dir, filename)],
                  lr_sr, args.experiment.hr_sr)
        if pr_spec is not None:
            save_specs(lr_spec[0] if lr_spec is not None else None,
                       pr_spec[0],
                       hr_spec[0] if hr_spec is not None else None,
                       os.path.join(args.samples_dir, filename))
        return lsd_i, visqol_i

    from concurrent.futures import ThreadPoolExecutor

    futures = []
    iterator = LogProgress(logger, data_loader, name="Eval estimates")
    with ThreadPoolExecutor(max_workers=2) as pool:
        for data in iterator:
            (lr, lr_paths), (hr, hr_paths) = data
            filename = os.path.splitext(os.path.basename(hr_paths[0]))[0]
            total_filenames.append(filename)

            if eval_forward.return_spec:
                pr, pr_spec, lr_spec = eval_forward(lr)
                hr_spec = spec_fns["hr_spec"](hr) if spec_fns else None
            else:
                pr = eval_forward(lr)
                pr_spec = spec_fns["spec"](pr) if spec_fns else None
                lr_spec = spec_fns["spec"](lr) if spec_fns else None
                hr_spec = spec_fns["spec"](hr) if spec_fns else None
            pr = match_signal(pr, hr.shape[-1])

            log_media = n_log == -1 or len(futures) < n_log
            if len(futures) >= 4:
                # bound in-flight files so per-file buffers are released
                futures[-4].result()
            futures.append(pool.submit(
                host_work, pr, hr, lr, pr_spec, lr_spec, hr_spec,
                filename, log_media))

        for fut in futures:
            lsd_i, visqol_i = fut.result()
            total_lsd += lsd_i
            total_visqol += visqol_i
            lsd_count += 1 if lsd_i != 0 else 0
            visqol_count += 1 if visqol_i != 0 else 0
            total_cnt += 1

    avg_lsd, avg_visqol = _averages(total_lsd, lsd_count,
                                    total_visqol, visqol_count)
    logger.info(bold(
        f"{args.experiment.name}, {args.experiment.lr_sr}->"
        f"{args.experiment.hr_sr}. Test set performance:"
        f"LSD={avg_lsd} ({lsd_count}/{total_cnt}), "
        f"VISQOL={avg_visqol} ({visqol_count}/{total_cnt})."))
    return avg_lsd, avg_visqol, total_filenames


def evaluate_on_saved_data(args, data_loader, epoch):
    """Metrics over saved _lr/_hr/_pr triples (reference :100-140),
    with per-file wandb media for the first ``n_files_to_log`` files —
    audio plus the saved ``_spec.png`` heatmaps re-read from the samples
    dir (reference evaluate_lr_hr_pr_data, :18-47)."""
    total_lsd = total_visqol = 0.0
    lsd_count = visqol_count = total_cnt = 0
    n_log = int(args.wandb.get("n_files_to_log", 10)) if "wandb" in args \
        else -1
    lr_sr = args.experiment.hr_sr if args.experiment.get("upsample") \
        else args.experiment.lr_sr
    n_submitted = 0

    def _saved_spec(filename, kind):
        path = os.path.join(args.samples_dir,
                            f"{filename}_{kind}_spec.png")
        if not os.path.exists(path):
            return None
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"))

    def one(data, log_media):
        lr_i, hr_i, pr_i, filename = data
        if isinstance(filename, (list, tuple)):
            filename = filename[0]
            lr_i, hr_i, pr_i = lr_i[0], hr_i[0], pr_i[0]
        lsd_i, visqol_i = run_metrics(hr_i[None], pr_i[None], args, filename)
        if log_media:
            wandb_logger.log_data_to_wandb(
                pr_i[None], hr_i[None], lr_i[None], lsd_i, visqol_i,
                filename, epoch, lr_sr, args.experiment.hr_sr,
                lr_spec=_saved_spec(filename, "lr"),
                pr_spec=_saved_spec(filename, "pr"),
                hr_spec=_saved_spec(filename, "hr"),
                specs_rendered=True)
        return lsd_i, visqol_i

    from concurrent.futures import ThreadPoolExecutor

    # pure host work (numpy LSD + ViSQOL subprocess, per-filename temp
    # wavs): a small pool overlaps scoring across files. Submission is
    # windowed so only a few files' wavs are resident at a time.
    iterator = LogProgress(logger, data_loader, name="Eval estimates")
    futures = []
    with ThreadPoolExecutor(max_workers=4) as pool:
        for data in iterator:
            if len(futures) >= 8:
                futures[-8].result()
            log_media = n_log == -1 or n_submitted < n_log
            n_submitted += 1
            futures.append(pool.submit(one, data, log_media))
        for fut in futures:
            lsd_i, visqol_i = fut.result()
            total_lsd += lsd_i
            total_visqol += visqol_i
            lsd_count += 1 if lsd_i != 0 else 0
            visqol_count += 1 if visqol_i != 0 else 0
            total_cnt += 1

    avg_lsd, avg_visqol = _averages(total_lsd, lsd_count,
                                    total_visqol, visqol_count)
    logger.info(bold(
        f"{args.experiment.name}. Saved-data performance: "
        f"LSD={avg_lsd} ({lsd_count}/{total_cnt}), "
        f"VISQOL={avg_visqol} ({visqol_count}/{total_cnt})."))
    return avg_lsd, avg_visqol
