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


def _wave_heatmap(signal):
    """Waveform -> inferno heatmap of its log2 power spectrogram
    (reference wandb_logger.py:56-57: torchaudio Spectrogram().log2())."""
    import numpy as np

    from aero_tpu.utils.viz import (convert_spectrogram_to_heatmap,
                                    power_spectrogram_np)

    with np.errstate(divide="ignore"):
        return convert_spectrogram_to_heatmap(
            np.log2(power_spectrogram_np(signal)))


def _spec_heatmap(spec):
    """Complex spectrogram [C, F, T] -> heatmap of |.|^2 log2
    (reference wandb_logger.py:68-84)."""
    import numpy as np

    from aero_tpu.utils.viz import convert_spectrogram_to_heatmap

    spec = np.asarray(spec)
    while spec.ndim > 2:
        spec = spec[0]
    with np.errstate(divide="ignore"):
        return convert_spectrogram_to_heatmap(np.log2(np.abs(spec) ** 2))


def log_data_to_wandb(pr, hr, lr, lsd, visqol, filename, epoch,
                      lr_sr, hr_sr, lr_spec=None, pr_spec=None, hr_spec=None,
                      specs_rendered=False):
    """Per-file media logs mirroring reference wandb_logger.py:55-105:
    PR spectrogram+audio always; model spectra (pr always, hr/lr while
    epoch <= 10) and hr/lr spectrogram+audio while epoch <= 10.

    ``specs_rendered``: the *_spec args are already-rendered RGB images
    (the saved-data path re-reads its ``_spec.png`` artifacts, reference
    evaluate.py:38-41) rather than complex spectrograms."""
    if not _active:
        return
    import numpy as np

    pr, hr, lr = (np.asarray(x) for x in (pr, hr, lr))
    heat = (lambda s: s) if specs_rendered else _spec_heatmap
    data = {
        f"test samples/{filename}/lsd": lsd,
        f"test samples/{filename}/visqol": visqol,
        f"test samples/{filename}/spectrogram": _wandb.Image(
            _wave_heatmap(pr), caption="PR"),
        f"test samples/{filename}/audio": _wandb.Audio(
            pr.squeeze(), sample_rate=hr_sr, caption="PR"),
    }
    if pr_spec is not None and hr_spec is not None and lr_spec is not None:
        data[f"test samples/{filename}/pr_spec"] = _wandb.Image(
            heat(pr_spec), caption="PR spec")
        if epoch <= 10:
            data[f"test samples/{filename}/hr_spec"] = _wandb.Image(
                heat(hr_spec), caption="HR spec")
            data[f"test samples/{filename}/lr_spec"] = _wandb.Image(
                heat(lr_spec), caption="LR spec")
    if epoch <= 10:
        data[f"test samples/{filename}/{filename}_hr_spectrogram"] = \
            _wandb.Image(_wave_heatmap(hr), caption="HR")
        data[f"test samples/{filename}/{filename}_hr_audio"] = _wandb.Audio(
            hr.squeeze(), sample_rate=hr_sr, caption="HR")
        data[f"test samples/{filename}/{filename}_lr_spectrogram"] = \
            _wandb.Image(_wave_heatmap(lr), caption="LR")
        data[f"test samples/{filename}/{filename}_lr_audio"] = _wandb.Audio(
            lr.squeeze(), sample_rate=lr_sr, caption="LR")
    _wandb.log(data, step=epoch)


def create_wandb_table(args, dataloader, epoch):
    """Final results table over saved _lr/_hr/_pr triples (reference
    wandb_logger.py:108-153; called from the solver at the last epoch
    when ``log_results``, reference solver.py:254)."""
    if not _active:
        return
    import numpy as np

    from aero_tpu.eval.metrics import run_metrics
    from aero_tpu.ops.resample import resample_np

    columns = ["filename", "hr audio", "hr spectogram", "lr audio",
               "lr spectogram", "pr audio", "pr spectogram", "lsd", "visqol"]
    table = _wandb.Table(columns=columns)
    hr_sr = int(args.experiment.hr_sr)
    lr_sr = int(args.experiment.lr_sr)
    n_limit = int(args.wandb.get("n_files_to_log_to_table", 10) or 0)

    for i, data in enumerate(dataloader):
        if n_limit and i >= n_limit:
            break
        lr_i, hr_i, pr_i, fname = data
        if isinstance(fname, (list, tuple)):
            fname = fname[0]
            lr_i, hr_i, pr_i = lr_i[0], hr_i[0], pr_i[0]
        lr_i, hr_i, pr_i = (np.asarray(x) for x in (lr_i, hr_i, pr_i))
        lsd, visqol = run_metrics(hr_i[None], pr_i[None], args, fname)
        lr_up = resample_np(np.atleast_2d(lr_i), lr_sr, hr_sr)
        table.add_data(
            fname,
            _wandb.Audio(hr_i.squeeze(), sample_rate=hr_sr,
                         caption=f"{fname}_hr"),
            _wandb.Image(_wave_heatmap(hr_i)),
            _wandb.Audio(lr_i.squeeze(), sample_rate=lr_sr,
                         caption=f"{fname}_lr"),
            _wandb.Image(_wave_heatmap(lr_up)),
            _wandb.Audio(pr_i.squeeze(), sample_rate=hr_sr,
                         caption=f"{fname}_pr"),
            _wandb.Image(_wave_heatmap(pr_i)),
            lsd, visqol)
    _wandb.log({"Results": table}, step=epoch)


def finish():
    global _active
    if _active:
        _wandb.finish()
        _active = False
