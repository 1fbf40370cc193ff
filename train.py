"""Train CLI — same surface as the reference (``python train.py dset=4-16
experiment=aero_4-16_512_64 ...``), reference /root/reference/train.py.

Process model: JAX runtime (one process per host as provided by the TPU
runtime) instead of the reference's subprocess-per-GPU DDP launcher;
the batch is split across processes exactly like train.py:50-51.
"""

from __future__ import annotations

from aero_tpu.utils.platform import select_platform_from_env

select_platform_from_env()

import logging
import os
import shutil
import sys

import jax
import numpy as np

from aero_tpu.data.datasets import LrHrSet
from aero_tpu.data.loader import Loader
from aero_tpu.parallel import mesh as pmesh
from aero_tpu.train import build
from aero_tpu.train.solver import Solver
from aero_tpu.train.train_step import init_state
from aero_tpu.utils.config import load_config, run_dir_for
from aero_tpu.utils.log import setup_logging
from aero_tpu.utils import wandb_logger

logger = logging.getLogger(__name__)

CONF_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "conf")


def start_ddp_workers(args, argv) -> int:
    """Single-host multi-process auto-spawn — the reference's
    ``start_ddp_workers``/``ChildrenManager`` (src/ddp/executor.py:13-75):
    fork one worker per requested rank, wire the rendezvous env, babysit
    the children, and kill the whole job the moment one dies.

    On TPU one process drives every local chip, so this path only makes
    sense for CPU/GPU process pools: request it with ``ddp=true
    +ddp_workers=N`` (or env AERO_DDP_WORKERS). Rank 0 streams to the
    console; rank>0 workers log to ``trainer.log.<rank>`` in the run dir
    with stdout suppressed, like the reference.
    """
    import socket
    import subprocess

    world_size = int(args.get("ddp_workers") or
                     os.environ.get("AERO_DDP_WORKERS") or 0)
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    logger.info(f"Starting {world_size} worker processes for DDP.")
    children = []
    failed = False
    try:
        for rank in range(world_size):
            env = dict(os.environ)
            env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
            env["JAX_NUM_PROCESSES"] = str(world_size)
            env["JAX_PROCESS_ID"] = str(rank)
            # each CPU worker owns one device (the TPU runtime hands
            # every process its own local chips without this)
            env.setdefault("AERO_NUM_CPU_DEVICES", "1")
            kwargs = {}
            if rank > 0:
                kwargs["stdin"] = subprocess.DEVNULL
                kwargs["stdout"] = subprocess.DEVNULL
                kwargs["stderr"] = subprocess.DEVNULL
            children.append(subprocess.Popen(
                [sys.executable] + argv, env=env, **kwargs))
        while children and not failed:
            for child in list(children):
                try:
                    exitcode = child.wait(0.1)
                except subprocess.TimeoutExpired:
                    continue
                children.remove(child)
                if exitcode:
                    logger.error(f"Worker died (rc={exitcode}), "
                                 "killing all workers")
                    failed = True
    except KeyboardInterrupt:
        logger.error("Received keyboard interrupt, killing all workers.")
        failed = True
    finally:
        for child in children:
            child.terminate()
    if not failed:
        logger.info("All workers completed successfully")
    return int(failed)


def maybe_init_distributed(args):
    """Multi-host initialization — the TPU-native replacement for the
    reference's subprocess DDP launcher (src/ddp/executor.py:50-75).

    The JAX runtime provides one process per host; on Cloud TPU
    ``jax.distributed.initialize()`` discovers the coordinator from the
    environment. ``ddp=true`` (reference CLI flag) or standard JAX
    coordinator env vars trigger it; single-process runs skip it.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or \
        os.environ.get("COORDINATOR_ADDRESS")
    if bool(args.get("ddp")) or coord:
        kw = {}
        # Explicit rendezvous (no cluster auto-detect plugin exists for
        # plain multi-process CPU/GPU pools): JAX_COORDINATOR_ADDRESS +
        # JAX_NUM_PROCESSES + JAX_PROCESS_ID mirror initialize()'s kwargs.
        rendezvous = {v: os.environ.get(v) for v in
                      ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")}
        if coord and any(rendezvous.values()):
            missing = [v for v, val in rendezvous.items() if not val]
            if missing:  # misconfigured launch: fail with the fix, not KeyError
                raise RuntimeError(
                    "explicit rendezvous needs JAX_COORDINATOR_ADDRESS, "
                    "JAX_NUM_PROCESSES and JAX_PROCESS_ID; missing: "
                    + ", ".join(missing))
            kw = dict(coordinator_address=coord,
                      num_processes=int(rendezvous["JAX_NUM_PROCESSES"]),
                      process_id=int(rendezvous["JAX_PROCESS_ID"]))
        # Fail-fast contract (reference ChildrenManager,
        # src/ddp/executor.py:25-47: one dead worker kills the job): the
        # coordination service declares a silent process dead after this
        # many seconds of missed heartbeats and aborts the survivors.
        # Lower it for tests / tight supervision loops.
        hb = os.environ.get("AERO_HEARTBEAT_TIMEOUT_S")
        if hb:
            kw["heartbeat_timeout_seconds"] = int(hb)
        try:
            jax.distributed.initialize(**kw)
            logger.info(
                f"jax.distributed initialized: process "
                f"{jax.process_index()}/{jax.process_count()}")
        except Exception as e:  # single-host fallback
            logger.warning(f"jax.distributed.initialize failed ({e}); "
                           f"continuing single-process")


def run(args):
    if args.get("debug_nans"):
        from aero_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging()
    maybe_init_distributed(args)
    rank = jax.process_index()
    world_size = jax.process_count()

    wandb_logger.init_wandb_run(args, rank, world_size)

    if rank == 0:
        if os.path.exists(args.samples_dir):
            shutil.rmtree(args.samples_dir)
        os.makedirs(args.samples_dir)

    models = build.build_models(args)

    if args.show:
        for name, model in models.items():
            logger.info(f"{name}: {model}")
        return

    assert args.experiment.batch_size % world_size == 0
    args.experiment.batch_size //= world_size

    exp = args.experiment
    tr_dataset = LrHrSet(args.dset.train, exp.lr_sr, exp.hr_sr,
                         exp.stride, exp.segment,
                         upsample=exp.get("upsample", False))
    tr_loader = Loader(tr_dataset, batch_size=exp.batch_size, shuffle=True,
                       seed=int(args.seed), drop_last=bool(args.drop_last),
                       rank=rank, world_size=world_size,
                       num_workers=int(args.num_workers))

    if args.dset.get("valid"):
        args.valid_equals_test = args.dset.valid == args.dset.test
        cv_dataset = LrHrSet(args.dset.valid, exp.lr_sr, exp.hr_sr,
                             stride=None, segment=None,
                             upsample=exp.get("upsample", False))
        cv_loader = Loader(cv_dataset, batch_size=1, shuffle=False,
                           rank=rank, world_size=world_size, num_workers=1,
                           pad_shards=False)
    else:
        cv_loader = None

    if args.dset.get("test"):
        tt_dataset = LrHrSet(args.dset.test, exp.lr_sr, exp.hr_sr,
                             stride=None, segment=None, with_path=True,
                             upsample=exp.get("upsample", False))
        tt_loader = Loader(tt_dataset, batch_size=1, shuffle=False,
                           rank=rank, world_size=world_size, num_workers=1,
                           pad_shards=False)
    else:
        tt_loader = None

    data = {"tr_loader": tr_loader, "cv_loader": cv_loader,
            "tt_loader": tt_loader}

    lr_shape, hr_shape = build.segment_shapes(args)
    rng = jax.random.PRNGKey(int(args.seed))
    init_rng, state_rng = jax.random.split(rng)
    variables = build.init_variables(args, models, init_rng, lr_shape,
                                     hr_shape)
    state = init_state(args, models, variables, state_rng)

    mesh = pmesh.make_mesh()
    solver = Solver(data, models, state, args, mesh)
    solver.train()
    wandb_logger.finish()


def main():
    args = load_config(CONF_DIR, "main_config", sys.argv[1:])
    # absolutize dset paths before the hydra-style chdir
    # (reference train.py:111-113)
    for key, value in list(args.dset.items()):
        if isinstance(value, str) and key != "name":
            args.dset[key] = os.path.abspath(value)

    # ``ddp=true +ddp_workers=N`` auto-spawns a single-host process pool
    # (reference train.py:124-125 start_ddp_workers); workers re-enter
    # main() with the rendezvous env set and skip this branch.
    n_workers = int(args.get("ddp_workers") or
                    os.environ.get("AERO_DDP_WORKERS") or 0)
    if (bool(args.get("ddp")) and n_workers > 1
            and "JAX_PROCESS_ID" not in os.environ):
        setup_logging(bool(args.verbose))
        sys.exit(start_ddp_workers(args, sys.argv))

    run_dir = run_dir_for(args)
    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)  # hydra-chdir semantics: checkpoints land here
    rank_suffix = os.environ.get("JAX_PROCESS_ID")
    log_file = "trainer.log" if rank_suffix in (None, "0") else \
        f"trainer.log.{rank_suffix}"
    setup_logging(bool(args.verbose), log_file=log_file)
    logger.info(f"For logs, checkpoints and samples check {os.getcwd()}")
    try:
        run(args)
    except Exception:
        logger.exception("Some error happened")
        os._exit(1)


if __name__ == "__main__":
    main()
