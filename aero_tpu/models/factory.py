"""Model factory: build generator + discriminators from the config tree.

Parity with ``/root/reference/src/models/modelFactory.py:6-28`` — same
registry keys — with one deliberate fix: the reference registers the
HiFi MSD under ``'msd'`` while its solver looks up ``'msd_hifi'``
(KeyError when enabled; SURVEY.md §2.5 defect 1). Here the key is
consistently ``'msd_hifi'``.
"""

from __future__ import annotations

import typing as tp

from aero_tpu.models.aero import Aero
from aero_tpu.models.seanet import Seanet
from aero_tpu.models.discriminators import (
    MelganDiscriminator, MultiPeriodDiscriminator, MultiScaleDiscriminator,
)


def get_model(args) -> tp.Dict[str, tp.Any]:
    """Returns {name: flax Module}. ``args`` is the config tree."""
    exp = args.experiment
    if exp.model == "aero":
        kw = dict(exp.aero)
        kw.pop("debug", None)
        kw["strides"] = tuple(kw.get("strides", (4, 4, 2, 2)))
        generator = Aero(**kw)
    elif exp.model == "seanet":
        kw = dict(exp.seanet)
        kw["ratios"] = tuple(kw.get("ratios", (8, 8, 2, 2)))
        generator = Seanet(**kw)
    else:
        raise ValueError(f"unknown generator model: {exp.model!r}")

    models = {"generator": generator}

    if exp.get("adversarial", False):
        disc_names = exp.get("discriminator_models", [])
        if "msd_melgan" in disc_names:
            models["msd_melgan"] = MelganDiscriminator(**dict(exp.melgan_discriminator))
        # 'hifi' needs BOTH hifi discs (reference modelFactory.py:21-27)
        if "msd_hifi" in disc_names or "hifi" in disc_names:
            models["msd_hifi"] = MultiScaleDiscriminator(**dict(exp.msd))
        if "mpd" in disc_names or "hifi" in disc_names:
            mpd_kw = dict(exp.mpd)
            if "periods" in mpd_kw:
                mpd_kw["periods"] = tuple(mpd_kw["periods"])
            models["mpd"] = MultiPeriodDiscriminator(**mpd_kw)

    return models
