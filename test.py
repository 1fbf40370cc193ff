"""Full-dataset evaluation CLI (reference /root/reference/test.py).

Usage: python test.py dset=4-16 experiment=aero_4-16_512_64
Loads the generator from ``checkpoint_file`` (ours or a reference .th)
and reports LSD / ViSQOL over the test set.
"""

from __future__ import annotations

from aero_tpu.utils.platform import select_platform_from_env

select_platform_from_env()

import logging
import os
import sys

import jax

from aero_tpu.data.datasets import LrHrSet
from aero_tpu.data.loader import Loader
from aero_tpu.eval.evaluate import evaluate
from aero_tpu.eval.forward import EvalForward
from aero_tpu.train import build
from aero_tpu.utils.config import load_config, run_dir_for
from aero_tpu.utils.log import bold, setup_logging

logger = logging.getLogger(__name__)

CONF_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "conf")




def run(args):
    exp = args.experiment
    tt_dataset = LrHrSet(args.dset.test, exp.lr_sr, exp.hr_sr,
                         stride=None, segment=None, with_path=True,
                         upsample=exp.get("upsample", False))
    tt_loader = Loader(tt_dataset, batch_size=1, shuffle=False,
                       rank=jax.process_index(),
                       world_size=jax.process_count(), num_workers=1,
                       pad_shards=False)

    models = build.build_models(args)
    state = build.load_generator_state(args, models)

    scale = (float(exp.hr_sr) / float(exp.lr_sr)
             if not exp.get("upsample", False) else 1.0)
    lr_sr = int(exp.hr_sr if exp.get("upsample", False) else exp.lr_sr)
    # AOT-serialized eval executables (+aot=0 disables): repeat test.py
    # invocations skip trace+compile per bucket shape (eval/aot.py)
    aot_dir = None
    if bool(args.get("aot", True)):
        from aero_tpu.eval.aot import default_aot_dir

        aot_dir = default_aot_dir()
    fwd = EvalForward(models["generator"], state, scale=scale, lr_sr=lr_sr,
                      bucket_s=float(args.get("eval_bucket_s", 1.0)),
                      return_spec=exp.model == "aero",
                      aot_dir=aot_dir,
                      aot_tag=(f"{exp.name}|{args.get('precision', 'f32')}|"
                               f"bucket={args.get('eval_bucket_s', 1.0)}"))

    from aero_tpu.eval.forward import make_spec_fns

    lsd, visqol, _files = evaluate(args, tt_loader, 0, fwd,
                                   spec_fns=make_spec_fns(args, models["generator"]))
    logger.info("Done evaluation.")
    logger.info(bold(f"LSD={lsd} , VISQOL={visqol}"))
    if visqol:
        from aero_tpu.eval.metrics import (default_visqol_path,
                                           visqol_scorer_version)
        ver = visqol_scorer_version(args.get("visqol_path")
                                    or default_visqol_path())
        logger.info(f"ViSQOL scorer: {ver or 'unknown'}"
                    " (MOS comparable only within one scorer stamp)")
    return lsd, visqol


def main():
    args = load_config(CONF_DIR, "main_config", sys.argv[1:])
    # absolutize dset paths before the hydra-style chdir
    # (reference train.py:111-113)
    for key, value in list(args.dset.items()):
        if isinstance(value, str) and key != "name":
            args.dset[key] = os.path.abspath(value)
    run_dir = run_dir_for(args)
    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)
    setup_logging(bool(args.verbose))
    try:
        run(args)
    except Exception:
        logger.exception("Some error happened")
        os._exit(1)


if __name__ == "__main__":
    main()
