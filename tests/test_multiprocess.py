"""REAL multi-process training (SURVEY §5.8) — no emulation.

Round 3 tested the multi-host feed only via single-process emulation;
this spawns an actual 2-process `jax.distributed` run (gloo CPU
collectives, 4 virtual devices per process, 8 global) through
`tools/multiprocess_train_probe.py` and asserts:

* both processes complete `run_training` on the shared global mesh;
* per-epoch train/val metrics equal the single-process 8-device run
  (epoch 1 to 1e-5 — identical weights, so only cross-process psum
  reduction order differs; later epochs to 1e-3 as that noise compounds
  through Adam);
* cross-process val metrics are identical (global metric aggregation);
* only process 0 wrote checkpoints/TB events (lead-host guards).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiprocess_train_probe.py"),
         "--work", str(tmp_path / "mp")],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["ok"], report
    assert report["losses_equal"], report
    assert report["epochs_compared"] == 2
    assert report["proc_results"][0]["val_loss"] == report["proc_results"][1]["val_loss"]
    assert len(report["tb_files"]) == 1
