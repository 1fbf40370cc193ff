#!/usr/bin/env bash
# One-command reproduction of the paper protocol on VCTK (VERDICT r3 #6).
#
# Usage:
#   tools/repro_vctk.sh /path/to/VCTK/wav48 [OUT_DIR]     # real run
#   tools/repro_vctk.sh --dry-run [OUT_DIR]               # CI-testable
#
# Real run: resample wav48 -> 16 kHz (HR) and 4 kHz (LR); build egs
# jsons with the reference's 100-train/8-test speaker split
# (/root/reference/data_prep/create_meta_files.py:12-15,57-71); train
# the canonical aero_4-16_512_64 for 125 epochs (reference
# conf/experiment/aero_4-16_512_64.yaml + README.md:92-100); run
# test.py for the final LSD/ViSQOL.
#
# Dry run: synthesizes a VCTK-shaped tree (108 speakers, *_mic1.wav at
# 48 kHz), executes the resample + egs stages FOR REAL, asserts the
# 100/8 speaker split counts, then prints the train/test commands
# instead of running them. Covered by tests/test_repro_script.py.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

DRY=0
if [[ "${1:-}" == "--dry-run" ]]; then
    DRY=1
    shift
    OUT="${1:-$(mktemp -d /tmp/repro_vctk.XXXXXX)}"
    VCTK="$OUT/wav48_synth"
    echo "[repro] dry-run: synthesizing a VCTK-shaped tree at $VCTK"
    python - "$VCTK" <<'EOF'
import os
import sys

import numpy as np

from aero_tpu.data import audio_io

root = sys.argv[1]
rng = np.random.default_rng(0)
sr = 48000
for s in range(108):
    d = os.path.join(root, f"p{225 + s}")
    os.makedirs(d, exist_ok=True)
    for u in range(2):
        n = int(0.25 * sr)
        sig = 0.1 * np.sin(2 * np.pi * rng.uniform(100, 300)
                           * np.arange(n) / sr).astype(np.float32)
        audio_io.save(os.path.join(d, f"p{225 + s}_{u:03d}_mic1.wav"),
                      sig[None, :], sr)
print("synthesized 108 speakers x 2 utterances")
EOF
else
    VCTK="${1:?usage: tools/repro_vctk.sh /path/to/VCTK/wav48 [OUT_DIR]}"
    OUT="${2:-outputs/repro_vctk}"
fi

HR_DIR="$OUT/wav/16000"
LR_DIR="$OUT/wav/4000"
EGS="$OUT/egs/vctk/4-16"

echo "[repro] 1/4 resample -> 16 kHz (HR) and 4 kHz (LR)"
python data_prep/resample_data.py "$VCTK" "$HR_DIR" 16000
python data_prep/resample_data.py "$VCTK" "$LR_DIR" 4000

echo "[repro] 2/4 egs metadata (100/8 speaker split)"
python data_prep/create_meta_files.py "$LR_DIR" "$EGS" lr
python data_prep/create_meta_files.py "$HR_DIR" "$EGS" hr

echo "[repro] 3/4 verify the reference split semantics"
python - "$EGS" <<'EOF'
import json
import os
import sys

egs = sys.argv[1]


def speakers(path):
    with open(path) as f:
        files = json.load(f)
    return {os.path.basename(os.path.dirname(p)) for p, _n in files}


tr = speakers(os.path.join(egs, "tr", "lr.json"))
val = speakers(os.path.join(egs, "val", "lr.json"))
assert len(tr) == 100, f"train speakers {len(tr)} != 100"
assert len(val) == 8, f"test speakers {len(val)} != 8"
assert not tr & val, "speaker leakage between splits"
for name in ("lr", "hr"):
    a = json.load(open(os.path.join(egs, "tr", f"{name}.json")))
    b = json.load(open(os.path.join(egs, "val", f"{name}.json")))
    assert a == sorted(a) and b == sorted(b), "egs jsons must be sorted"
hr_tr = speakers(os.path.join(egs, "tr", "hr.json"))
assert hr_tr == tr, "lr/hr split mismatch"
print(f"split OK: {len(tr)} train / {len(val)} test speakers")
EOF

TRAIN_CMD=(python train.py dset=4-16 experiment=aero_4-16_512_64
           "dset.train=$EGS/tr" "dset.test=$EGS/val"
           epochs=125 precision=bfloat16)
TEST_CMD=(python test.py dset=4-16 experiment=aero_4-16_512_64
          "dset.train=$EGS/tr" "dset.test=$EGS/val")

echo "[repro] 4/4 canonical 125-epoch train + test"
if [[ "$DRY" == 1 ]]; then
    echo "[repro] dry-run: would execute:"
    echo "  ${TRAIN_CMD[*]}"
    echo "  ${TEST_CMD[*]}"
    echo "[repro] dry-run PASSED"
else
    "${TRAIN_CMD[@]}"
    "${TEST_CMD[@]}"
fi
