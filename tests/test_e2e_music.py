"""Music-path e2e: 11.025 -> 44.1 kHz (the MUSDB18-HQ setting,
reference README.md:50-54) through the real CLIs with
``speech_mode: false`` — exercising the scale-4 non-round sample rates,
audio-mode (48 kHz) ViSQOL end-to-end, and 4x predict output."""

import json
import os

import numpy as np
import pytest

from tests.test_e2e_pipeline import run_cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from aero_tpu.data.prep import make_dummy_dataset

    wd = tmp_path_factory.mktemp("e2e_music")
    make_dummy_dataset(str(wd / "egs"), lr_sr=11025, hr_sr=44100,
                       n_files=3, duration=1.0)
    return wd


MUSIC = [
    "experiment=tiny",
    "dset=debug",
    "experiment.lr_sr=11025",
    "experiment.hr_sr=44100",
    "+experiment.speech_mode=false",
    "epochs=1",
    "eval_every=1",
    "cross_valid=false",
    "visqol=true",
    "num_workers=0",
    "eval_bucket_s=0.5",
    # the real 11->44 config trains with gradient accumulation (B=16
    # needs 30 GB HBM on a 16 GB chip); keep the accum CLI path covered
    # on the music configuration it exists for
    "accum_steps=2",
]


def overrides(wd, extra=()):
    return MUSIC + [
        f"dset.train={wd}/egs/tr",
        f"dset.valid={wd}/egs/val",
        f"dset.test={wd}/egs/val",
    ] + list(extra)


@pytest.mark.slow
def test_music_pipeline(workdir):
    wd = str(workdir)
    run_dir = os.path.join(wd, "outputs", "debug", "tiny-nfft=512-hl=64")

    proc = run_cli("train.py", overrides(workdir), cwd=wd)
    with open(os.path.join(run_dir, "history.json")) as f:
        history = json.load(f)
    assert len(history) == 1
    assert np.isfinite(history[0]["total_loss"])
    # audio-mode ViSQOL ran end-to-end (native scorer, 48 k resample):
    # nonzero means the subprocess contract + 44.1->48 k path worked
    assert history[0]["Average visqol"] > 0, (history, proc.stdout[-2000:])
    assert history[0]["Average lsd"] > 0

    wav = None
    for root, _d, files in os.walk(os.path.join(wd, "egs", "wav", "lr")):
        for f in sorted(files):
            wav = os.path.join(root, f)
            break
    pred_out = os.path.join(wd, "pred")
    run_cli("predict.py", overrides(workdir, [
        f"+filename={wav}", f"+output={pred_out}"]), cwd=wd)
    stem = os.path.splitext(os.path.basename(wav))[0]
    from aero_tpu.data import audio_io

    pr, sr = audio_io.load(os.path.join(pred_out, stem + "_pr.wav"))
    lr, lr_sr = audio_io.load(wav)
    assert (sr, lr_sr) == (44100, 11025)
    assert pr.shape[-1] == lr.shape[-1] * 4
