"""ACTUALLY run the multi-host feed with process_count > 1 (SURVEY §5.8).

Round 3 tested `ProcessShardedBatchSampler` + `make_process_local_batch`
only by single-process emulation; this drives a REAL 2-process
`jax.distributed` run on CPU (4 virtual devices per process, 8 global —
the same global mesh the single-process suite uses) and checks:

* both processes complete `run_training` over the same global mesh;
* per-epoch train/val metrics equal the single-process run on the same
  config + seed (the global computation is identical — only the feed is
  process-sharded);
* only process 0 wrote checkpoints, logs, and TB events.

Usage (parent orchestrates everything):

    JAX_PLATFORMS=cpu python tools/multiprocess_train_probe.py --work /tmp/mp

Exit 0 + one JSON line on success.  Used by
`tests/test_multiprocess.py` (slow) and recorded in PERF.md.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ALPHABET = "abcdefghij"
CHARSET = ["<PAD>", "<SOS>", "<EOS>", " "] + list(ALPHABET)
N_PROCS = 2
DEV_PER_PROC = 4


def build_config(work: str, exp_dir: str) -> dict:
    return {
        "exp_dir": exp_dir,
        "train_csvs": [os.path.join(work, "data", "labels.csv")],
        "train_roots": [os.path.join(work, "data")],
        "charset_path": os.path.join(work, "charset.txt"),
        "img_h": 32,
        "img_w": 64,
        "max_len": 6,
        "hidden_size": 16,
        "width_mult": 0.125,
        "lstm_layers": 1,
        "batch_size": 8,
        "epochs": 2,
        "val_size": 8,
        "eval_every": 1,
        "seed": 0,
        "compute_dtype": "float32",
        "use_pallas": False,
        "num_workers": 0,
        "progress": False,
        # host augmentation draws from PER-PROCESS numpy rng streams, so a
        # 2-process run legitimately sees different augment noise than the
        # single-process run; device augmentation is position-keyed jax
        # rng — identical regardless of the process layout — which is what
        # makes bitwise mp-vs-sp loss equality possible at all
        "device_augment": True,
    }


def read_epoch_metrics(exp_dir: str) -> list:
    rows = []
    with open(os.path.join(exp_dir, "metrics_epoch.csv"), encoding="utf-8") as f:
        for row in csv.DictReader(f):
            rows.append(
                {
                    k: row[k]
                    for k in ("epoch", "train_loss", "val_loss", "val_acc")
                    if k in row
                }
            )
    return rows


def child_main(args) -> int:
    # one process of the distributed run
    import rcnn_ocr_tpu  # noqa: F401  (re-applies JAX_PLATFORMS=cpu)
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=N_PROCS,
        process_id=args.proc,
    )
    assert jax.process_count() == N_PROCS, jax.process_count()
    assert len(jax.local_devices()) == DEV_PER_PROC
    assert len(jax.devices()) == N_PROCS * DEV_PER_PROC

    from rcnn_ocr_tpu.training.config import Config
    from rcnn_ocr_tpu.training.train import run_training

    cfg = build_config(args.work, os.path.join(args.work, "exp_mp"))
    result = run_training(Config(cfg))
    with open(
        os.path.join(args.work, f"proc{args.proc}_result.json"), "w"
    ) as f:
        json.dump(
            {
                "val_acc": float(result["val_acc"]),
                "val_loss": float(result["val_loss"]),
                "process_index": int(jax.process_index()),
            },
            f,
        )
    return 0


def single_main(args) -> int:
    # the single-process reference run over the SAME 8-device global mesh
    import rcnn_ocr_tpu  # noqa: F401
    from rcnn_ocr_tpu.training.config import Config
    from rcnn_ocr_tpu.training.train import run_training

    cfg = build_config(args.work, os.path.join(args.work, "exp_sp"))
    run_training(Config(cfg))
    return 0


def parent_main(args) -> int:
    import socket

    import numpy as np

    from helpers import make_synthetic_dataset, tiny_labels

    os.makedirs(args.work, exist_ok=True)
    with open(os.path.join(args.work, "charset.txt"), "w") as f:
        f.write("\n".join(CHARSET) + "\n")
    make_synthetic_dataset(os.path.join(args.work, "data"), tiny_labels(24))

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def env_for(n_dev: int) -> dict:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        return env

    # --- 2-process distributed run ---
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--work", args.work,
             "--proc", str(i), "--port", str(port)],
            env=env_for(DEV_PER_PROC),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(N_PROCS)
    ]
    # drain BOTH pipes concurrently: a child flooding its ~64 KB stdout
    # buffer while the parent is blocked reading the other child would
    # stall the distributed barrier and time the whole probe out
    import threading
    import time as time_mod

    outs = [""] * N_PROCS

    def _drain(i: int, p) -> None:
        outs[i] = p.stdout.read().decode()

    readers = [
        threading.Thread(target=_drain, args=(i, p), daemon=True)
        for i, p in enumerate(procs)
    ]
    for t in readers:
        t.start()
    deadline = time_mod.monotonic() + args.timeout
    timed_out = False
    for p in procs:
        try:
            p.wait(timeout=max(1.0, deadline - time_mod.monotonic()))
        except subprocess.TimeoutExpired:
            timed_out = True
    if timed_out:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for t in readers:
        t.join(timeout=10)
    if timed_out:
        for i, out in enumerate(outs):
            print(f"--- proc {i} output ---\n{out}", file=sys.stderr)
        print(json.dumps({"ok": False, "failed_proc": "timeout"}))
        return 1
    for i, p in enumerate(procs):
        if p.returncode != 0:
            print(f"--- proc {i} output ---\n{outs[i]}", file=sys.stderr)
            print(json.dumps({"ok": False, "failed_proc": i}))
            return 1

    # --- single-process reference ---
    ref = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--work", args.work,
         "--single"],
        env=env_for(N_PROCS * DEV_PER_PROC),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=args.timeout,
    )
    if ref.returncode != 0:
        print(ref.stdout.decode(), file=sys.stderr)
        print(json.dumps({"ok": False, "failed_proc": "single"}))
        return 1

    # --- assertions ---
    mp_dir = os.path.join(args.work, "exp_mp")
    sp_dir = os.path.join(args.work, "exp_sp")
    mp_rows, sp_rows = read_epoch_metrics(mp_dir), read_epoch_metrics(sp_dir)
    # epoch 1 starts from identical weights: any feed/augment mismatch
    # shows up at ~1e-3; the only legitimate difference is fp32
    # reduction-order noise (gloo cross-process psum vs in-process), ~1e-6.
    # Later epochs compound that noise through Adam — allow 1e-3.
    def tol(epoch_idx):
        return 1e-5 if epoch_idx == 0 else 1e-3

    losses_equal = all(
        abs(float(a["train_loss"]) - float(b["train_loss"])) < tol(i)
        and abs(float(a["val_loss"]) - float(b["val_loss"])) < tol(i)
        and a["val_acc"] == b["val_acc"]
        for i, (a, b) in enumerate(zip(mp_rows, sp_rows))
    ) and len(mp_rows) == len(sp_rows) > 0

    # lead-host-only writes: the processes share exp_mp (the real shared-FS
    # deployment shape).  A non-lead process writing would leave a SECOND
    # tfevents file (one per SummaryWriter instance) and racing .tmp
    # checkpoint leftovers — assert exactly one writer's artifacts exist.
    results = []
    for i in range(N_PROCS):
        with open(os.path.join(args.work, f"proc{i}_result.json")) as f:
            results.append(json.load(f))
    ckpt_ok = os.path.exists(os.path.join(mp_dir, "last_ckpt.msgpack"))
    tmp_leftovers = [p for p in os.listdir(mp_dir) if p.endswith(".tmp")]
    logs_dir = os.path.join(mp_dir, "logs")
    tb_files = [
        p for p in (os.listdir(logs_dir) if os.path.isdir(logs_dir) else [])
        if "tfevents" in p
    ]

    ok = losses_equal and ckpt_ok and not tmp_leftovers and (
        len(tb_files) == 1
    ) and (
        results[0]["val_acc"] == results[1]["val_acc"]
    )
    print(json.dumps({
        "ok": bool(ok),
        "losses_equal": bool(losses_equal),
        "epochs_compared": len(mp_rows),
        "mp_metrics": mp_rows,
        "sp_metrics": sp_rows,
        "proc_results": results,
        "ckpt_written": ckpt_ok,
        "tmp_leftovers": tmp_leftovers,
        "tb_files": tb_files,
    }))
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", default="/tmp/mp_train_probe")
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    if args.proc is not None:
        return child_main(args)
    if args.single:
        return single_main(args)
    return parent_main(args)


if __name__ == "__main__":
    raise SystemExit(main())
