"""End-to-end pipeline test through the real CLIs:
dummy egs -> train (2 epochs, GAN) -> checkpoint -> resume (1 more epoch)
-> test.py eval -> predict.py single file.

This is the integration test the reference never had (SURVEY.md §4).
Runs the CLIs as subprocesses on CPU with the tiny experiment config.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, overrides, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["AERO_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    from aero_tpu.utils.platform import cache_dir_for

    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir_for(
        os.path.join(REPO, ".jax_cache"))
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    cmd = [sys.executable, os.path.join(REPO, script)] + overrides
    proc = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=1500)
    if proc.returncode != 0:
        raise AssertionError(
            f"{script} failed\nSTDOUT:\n{proc.stdout[-4000:]}\n"
            f"STDERR:\n{proc.stderr[-4000:]}")
    return proc


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from aero_tpu.data.prep import make_dummy_dataset

    wd = tmp_path_factory.mktemp("e2e")
    make_dummy_dataset(str(wd / "egs"), n_files=4, duration=1.2)
    return wd


BASE = [
    "experiment=tiny",
    "dset=debug",
    "epochs=2",
    "eval_every=2",
    "cross_valid=true",
    "cross_valid_every=1",
    "visqol=false",
    "num_workers=0",
    "eval_bucket_s=0.5",
]


def overrides(wd, extra=()):
    return BASE + [
        f"dset.train={wd}/egs/tr",
        f"dset.valid={wd}/egs/val",
        f"dset.test={wd}/egs/val",
    ] + list(extra)


@pytest.mark.slow
def test_full_pipeline(workdir):
    wd = str(workdir)
    run_dir = os.path.join(wd, "outputs", "debug", "tiny-nfft=512-hl=64")

    # --- train 2 epochs
    run_cli("train.py", overrides(workdir), cwd=wd)
    assert os.path.exists(os.path.join(run_dir, "checkpoint.atpu"))
    with open(os.path.join(run_dir, "history.json")) as f:
        history = json.load(f)
    assert len(history) == 2
    assert "total_loss" in history[0]
    assert np.isfinite(history[0]["total_loss"])
    # GAN losses present
    assert any(k.startswith("generator_adversarial") for k in history[0])
    # epoch-2 eval produced metrics + artifacts
    assert "Average lsd" in history[1]
    samples = os.listdir(os.path.join(run_dir, "samples"))
    assert any(f.endswith("_pr.wav") for f in samples)
    assert any(f.endswith("_pr_spec.png") for f in samples)

    # --- resume for 1 more epoch (auto-load of checkpoint, solver resume
    # at epoch=len(history), reference solver.py:114-133,156)
    run_cli("train.py", overrides(workdir, ["epochs=3"]), cwd=wd)
    with open(os.path.join(run_dir, "history.json")) as f:
        history = json.load(f)
    assert len(history) == 3

    # --- test.py full eval
    proc = run_cli("test.py", overrides(workdir, ["epochs=3"]), cwd=wd)
    out = proc.stdout + proc.stderr
    assert "LSD=" in out

    # --- predict.py single file
    wav = None
    for root, _d, files in os.walk(os.path.join(wd, "egs", "wav", "lr")):
        for f in files:
            wav = os.path.join(root, f)
            break
    pred_out = os.path.join(wd, "pred")
    run_cli("predict.py", overrides(workdir, [
        f"+filename={wav}", f"+output={pred_out}"]), cwd=wd)
    stem = os.path.splitext(os.path.basename(wav))[0]
    out_wav = os.path.join(pred_out, stem + "_pr.wav")
    assert os.path.exists(out_wav)
    from aero_tpu.data import audio_io

    pr, sr = audio_io.load(out_wav)
    lr, lr_sr = audio_io.load(wav)
    assert sr == 16000
    assert pr.shape[-1] == lr.shape[-1] * 4
