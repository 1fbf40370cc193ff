"""bf16-vs-f32 convergence A/B on the canonical config (VERDICT #7).

Trains the canonical aero_4-16_512_64 twice from the same seed on the
same synthetic dataset — once precision=float32, once bfloat16 — and
compares the LSD/ViSQOL trajectories from history.json. bench.py
defaults to bf16; this run is the evidence that bf16 training quality
matches f32 (reference trains f32 throughout, src/solver.py).

Usage: python tools/ab_precision.py [epochs=40] [n_files=48] [out=/tmp/ab]
Runs serially (single-tenant TPU). ~1-2 h on v5e for 40+40 epochs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    epochs = int(kv.get("epochs", 40))
    n_files = int(kv.get("n_files", 48))
    out = kv.get("out", "/tmp/ab_precision")

    egs = os.path.join(out, "egs")
    if not os.path.exists(os.path.join(egs, "tr")):
        sys.path.insert(0, REPO)
        from aero_tpu.data.prep import make_dummy_dataset

        os.environ.setdefault("AERO_PLATFORM", "cpu")
        make_dummy_dataset(egs, n_files=n_files, duration=3.0, seed=7)
        os.environ.pop("AERO_PLATFORM")

    results = {}
    for precision in ("float32", "bfloat16"):
        run_dir = os.path.join(out, precision)
        os.makedirs(run_dir, exist_ok=True)
        cmd = [
            sys.executable, os.path.join(REPO, "train.py"),
            "experiment=aero_4-16_512_64", "dset=debug",
            f"dset.train={egs}/tr", f"dset.valid={egs}/val",
            f"dset.test={egs}/val",
            f"epochs={epochs}", "eval_every=10", "cross_valid=true",
            "cross_valid_every=2", "experiment.batch_size=8",
            f"precision={precision}", "seed=2036",
        ]
        print(f"=== {precision}: {' '.join(cmd)}", flush=True)
        env = dict(os.environ)
        r = subprocess.run(cmd, cwd=run_dir, env=env,
                           capture_output=True, text=True)
        sys.stdout.write(r.stdout[-3000:])
        sys.stderr.write(r.stderr[-3000:])
        if r.returncode != 0:
            print(f"{precision} FAILED rc={r.returncode}")
            return 1
        hist_path = None
        for root, _dirs, files in os.walk(run_dir):
            if "history.json" in files:
                hist_path = os.path.join(root, "history.json")
        with open(hist_path) as f:
            results[precision] = json.load(f)

    print("\n=== A/B summary (valid loss | test LSD | test ViSQOL) ===")
    for ep in range(epochs):
        row = [f"epoch {ep:3d}"]
        for precision in ("float32", "bfloat16"):
            h = results[precision][ep]
            row.append(
                f"{precision[:5]}:"
                f" v={h.get('evaluation_loss', float('nan')):.4f}"
                f" lsd={h.get('Average lsd', float('nan')):.3f}"
                f" vq={h.get('Average visqol', float('nan')):.3f}")
        print("  ".join(row), flush=True)

    with open(os.path.join(out, "ab_summary.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwritten: {out}/ab_summary.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
