"""Trained trajectories for the non-4->16 ratios (VERDICT r4 #4).

Runs the canonical synthetic quality protocol (r3/r4 recipe: 48-file
dummy set, seed 2036, bf16, B=16) at:

- ``8-24``  — scale 3, the SURVEY §7 fractional-analysis-hop hard case
  (lr STFT hop 64//3, win 512//3);
- ``11-44`` — music mode (11.025 -> 44.1 kHz, speech_mode=false,
  audio-mode ViSQOL), with the HiFi MPD+MSD discriminator pair so a
  trained trajectory also covers the hifi masked-valid loss family.

Usage: python tools/train_variants.py [which=8-24,11-44] [epochs=125]
       [out=/tmp/variants]
Serial (single-tenant TPU). Results land in each run's history.json;
summarize with the trailing table this prints.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "8-24": dict(
        experiment="aero_8-24_512_64", lr_sr=8000, hr_sr=24000, extra=[]),
    "11-44": dict(
        experiment="aero_11-44_512_64", lr_sr=11025, hr_sr=44100,
        # B=16 at 44.1 kHz output with MPD+MSD needs 30.0 GB HBM on a
        # 15.75 GB chip (measured r5 OOM); accum_steps=4 runs the same
        # effective batch as 4 microbatches of 4 (~1/4 the live
        # activations) — see train_step.make_train_step.
        extra=["experiment.discriminator_models=[mpd,msd_hifi]",
               "accum_steps=4"]),
}


def run_variant(name: str, epochs: int, out: str) -> dict:
    spec = VARIANTS[name]
    egs = os.path.join(out, name, "egs")
    if not os.path.exists(os.path.join(egs, "tr")):
        sys.path.insert(0, REPO)
        from aero_tpu.data.prep import make_dummy_dataset

        env_prev = os.environ.get("AERO_PLATFORM")
        os.environ["AERO_PLATFORM"] = "cpu"
        make_dummy_dataset(egs, lr_sr=spec["lr_sr"], hr_sr=spec["hr_sr"],
                           n_files=48, duration=3.0, seed=7)
        if env_prev is None:
            os.environ.pop("AERO_PLATFORM")
        else:
            os.environ["AERO_PLATFORM"] = env_prev

    run_dir = os.path.join(out, name, "run")
    os.makedirs(run_dir, exist_ok=True)
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        f"experiment={spec['experiment']}", "dset=debug",
        f"dset.train={egs}/tr", f"dset.valid={egs}/val",
        f"dset.test={egs}/val",
        f"epochs={epochs}", "eval_every=25", "cross_valid=true",
        "cross_valid_every=5", "experiment.batch_size=16",
        "precision=bfloat16", "seed=2036", "visqol=true",
    ] + spec["extra"]
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    # The tunnel flakes transiently (remote_compile RPC drops); train.py
    # auto-resumes from checkpoint.atpu in the run dir, so a retry loses
    # at most the in-flight epoch.
    for attempt in range(3):
        r = subprocess.run(cmd, cwd=run_dir, text=True)
        if r.returncode == 0:
            break
        print(f"{name} attempt {attempt + 1} FAILED rc={r.returncode}"
              + (", retrying (resumes from checkpoint)" if attempt < 2
                 else ""), flush=True)
    else:
        return {}
    hist_path = None
    for root, _dirs, files in os.walk(run_dir):
        if "history.json" in files:
            hist_path = os.path.join(root, "history.json")
    with open(hist_path) as f:
        return {"history": json.load(f), "path": hist_path}


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    which = kv.get("which", "8-24,11-44").split(",")
    epochs = int(kv.get("epochs", 125))
    out = kv.get("out", "/tmp/variants")

    results = {}
    for name in which:
        results[name] = run_variant(name, epochs, out)

    print("\n=== trajectories (epoch: valid | LSD | ViSQOL) ===")
    for name, res in results.items():
        if not res:
            continue
        print(f"--- {name} ({res['path']})")
        for ep, h in enumerate(res["history"]):
            lsd = h.get("Average lsd")
            if lsd is None and "evaluation_loss" not in h and ep % 5:
                continue
            print(f"  ep{ep + 1:3d}: "
                  f"v={h.get('evaluation_loss', float('nan')):.4f} "
                  f"lsd={h.get('Average lsd', float('nan')):.3f} "
                  f"vq={h.get('Average visqol', float('nan')):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
