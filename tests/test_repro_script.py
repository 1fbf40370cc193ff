"""tools/repro_vctk.sh dry-run must pass end-to-end (VERDICT r3 #6):
resample + egs build run for real on a synthetic VCTK-shaped tree and
the reference's 100/8 speaker split is asserted
(/root/reference/data_prep/create_meta_files.py:57-71)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_repro_vctk_dry_run(tmp_path):
    env = dict(os.environ, AERO_PLATFORM="cpu")
    res = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "repro_vctk.sh"),
         "--dry-run", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    sys.stdout.write(res.stdout[-2000:])
    sys.stderr.write(res.stderr[-2000:])
    assert res.returncode == 0
    assert "split OK: 100 train / 8 test speakers" in res.stdout
    assert "dry-run PASSED" in res.stdout
    # egs artifacts actually exist
    egs = tmp_path / "out" / "egs" / "vctk" / "4-16"
    for split in ("tr", "val"):
        for name in ("lr.json", "hr.json"):
            assert (egs / split / name).is_file()
