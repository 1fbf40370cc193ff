"""Offline-safe wandb logging shim.

Mirrors the reference logger surface (/root/reference/src/wandb_logger.py:
``_init_wandb_run``, ``log_data_to_wandb``, ``create_wandb_table``,
per-rank runs grouped by a persisted group id) but degrades to a no-op
when wandb is not installed or ``wandb.mode == disabled`` — this
environment has no wandb and zero egress.
"""

from __future__ import annotations

import logging
import os
import uuid

logger = logging.getLogger(__name__)

try:
    import wandb as _wandb
except Exception:  # pragma: no cover - wandb absent in this image
    _wandb = None

_active = False


def _enabled(args) -> bool:
    mode = str(args.get("wandb", {}).get("mode", "disabled"))
    return _wandb is not None and mode != "disabled"


def _get_group_id(path="group_id.dat") -> str:
    """Persist a shared group id so per-process runs group together
    (reference wandb_logger.py:34-43)."""
    if os.path.exists(path):
        with open(path) as f:
            return f.read().strip()
    gid = uuid.uuid4().hex
    with open(path, "w") as f:
        f.write(gid)
    return gid


def init_wandb_run(args, rank: int = 0, world_size: int = 1):
    global _active
    if not _enabled(args):
        return None
    kw = dict(
        project=args.wandb.project_name,
        entity=args.wandb.get("entity"),
        mode=args.wandb.mode,
        tags=list(args.wandb.get("tags", [])),
        resume=args.wandb.get("resume", False),
        name=str(args.experiment.name),
    )
    if world_size > 1:
        kw["group"] = _get_group_id()
        kw["name"] = f"{kw['name']}-rank{rank}"
    run = _wandb.init(**kw)
    _active = True
    return run


# Back-compat alias matching the reference's name.
_init_wandb_run = init_wandb_run


def log_metrics(metrics: dict, step: int):
    if _active:
        _wandb.log(metrics, step=step)


def log_data_to_wandb(pr, hr, lr, lsd, visqol, filename, epoch,
                      lr_sr, hr_sr, lr_spec=None, pr_spec=None, hr_spec=None):
    if not _active:
        return
    data = {
        f"test samples/{filename}/lsd": lsd,
        f"test samples/{filename}/visqol": visqol,
        f"test samples/{filename}/pr": _wandb.Audio(
            pr.squeeze(), sample_rate=hr_sr),
        f"test samples/{filename}/hr": _wandb.Audio(
            hr.squeeze(), sample_rate=hr_sr),
        f"test samples/{filename}/lr": _wandb.Audio(
            lr.squeeze(), sample_rate=lr_sr),
    }
    for name, spec in (("lr", lr_spec), ("pr", pr_spec), ("hr", hr_spec)):
        if spec is not None:
            data[f"test samples/{filename}/{name}_spec"] = _wandb.Image(spec)
    _wandb.log(data, step=epoch)


def create_wandb_table(args, dataloader, epoch):
    if not _active:
        return
    columns = ["filename", "lsd", "visqol"]
    table = _wandb.Table(columns=columns)
    from aero_tpu.eval.metrics import run_metrics

    for i, (lr_i, hr_i, pr_i, fname) in enumerate(dataloader):
        lsd, visqol = run_metrics(hr_i, pr_i, args, fname)
        table.add_data(fname, lsd, visqol)
        if i + 1 == int(args.wandb.get("n_files_to_log_to_table", 10)):
            break
    _wandb.log({"results table": table}, step=epoch)


def finish():
    global _active
    if _active:
        _wandb.finish()
        _active = False
