"""Three-slot checkpointing with embedded charset and config snapshot.

Reference parity (`/root/reference/training/utils.py:9-58`,
`training/train.py:664-771`):

* full checkpoint = epoch, global_step, model params + batch stats,
  optimizer state, scheduler state, best metrics, **itos/stoi embedded**,
  config subset, log_dir;
* bare weights = just the model variables;
* three slots, written on eval epochs: ``last`` always, ``best_loss`` on a
  new lowest val loss, ``best_acc`` on val acc >= best (ties refresh).

Format: flax msgpack (`flax.serialization`) — a single self-contained file
per slot (``*_ckpt.msgpack`` / ``*_weights.msgpack``), host-independent
and safe to write from a pjit-sharded state (arrays are gathered with
`jax.device_get`).  Reference ``.pth`` checkpoints are *importable* through
`rcnn_ocr_tpu.interop` but never written.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

CKPT_SUFFIX = "_ckpt.msgpack"
WEIGHTS_SUFFIX = "_weights.msgpack"

# Stamped into every written blob (full checkpoints AND bare weights) so a
# future layout change can be refused loudly instead of mis-read silently;
# version-less files predate the stamp and load as format 1.  The serving
# artifact manifest has its own independent version (export.MANIFEST_VERSION).
CHECKPOINT_FORMAT_VERSION = 1


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _ckpt_blob(
    state,
    scheduler_state,
    epoch,
    global_step,
    best_val_loss,
    best_val_acc,
    itos,
    stoi,
    config,
    log_dir,
) -> Dict[str, Any]:
    blob = {
        "format_version": CHECKPOINT_FORMAT_VERSION,
        "epoch": int(epoch),
        "global_step": int(global_step),
        "params": serialization.to_state_dict(_to_host(state.params)),
        "batch_stats": serialization.to_state_dict(_to_host(state.batch_stats)),
        "opt_state": serialization.to_state_dict(_to_host(state.opt_state)),
        "scheduler_state": scheduler_state or {},
        "best_val_loss": float(best_val_loss),
        "best_val_acc": float(best_val_acc),
        "itos": list(itos),
        "stoi": {str(k): int(v) for k, v in stoi.items()},
        "config": config,
        "log_dir": log_dir,
    }
    if getattr(state, "ema_params", None) is not None:
        blob["ema_params"] = serialization.to_state_dict(_to_host(state.ema_params))
    return blob


def save_checkpoint(
    path: str,
    state,  # TrainState
    scheduler_state: Optional[Dict[str, Any]],
    epoch: int,
    global_step: int,
    best_val_loss: float,
    best_val_acc: float,
    itos: List[str],
    stoi: Dict[str, int],
    config: Dict[str, Any],
    log_dir: str,
) -> None:
    blob = _ckpt_blob(
        state, scheduler_state, epoch, global_step, best_val_loss,
        best_val_acc, itos, stoi, config, log_dir,
    )
    _atomic_write(path, serialization.msgpack_serialize(blob))


def _atomic_write(path: str, data: bytes) -> None:
    """tmp-write + os.replace: a preemption never corrupts a slot.

    THE one write path for every checkpoint byte (sync, weights, async
    worker) so write-path hardening never has to land three times."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _weights_blob(state) -> Dict[str, Any]:
    # EMA runs deploy the EMA weights: they are what validation measured
    # (make_eval_step(use_ema=True)), so the weights slots must hold them —
    # the raw params stay in the full checkpoint for resume
    params = getattr(state, "ema_params", None)
    if params is None:
        params = state.params
    return {
        "format_version": CHECKPOINT_FORMAT_VERSION,
        "params": serialization.to_state_dict(_to_host(params)),
        "batch_stats": serialization.to_state_dict(_to_host(state.batch_stats)),
    }


def save_weights(path: str, state) -> None:
    _atomic_write(path, serialization.msgpack_serialize(_weights_blob(state)))


class AsyncCheckpointer:
    """Background checkpoint writer.

    The device->host gather happens synchronously (the training step donates
    its buffers, so the state must be captured before the next step), but
    msgpack serialization and the file write — the slow host-side part for a
    ~190MB model — run on a worker thread so the TPU never idles on disk.
    A bounded queue of 1 gives natural backpressure; `wait()` drains before
    exit.  This is the preemption-tolerance story (SURVEY.md §5.3/§5.4):
    frequent cheap checkpoints + atomic slot replacement.
    """

    def __init__(self):
        self._q: "queue.Queue" = queue.Queue(maxsize=1)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self._errors: list = []

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                path, blob = item
                _atomic_write(path, serialization.msgpack_serialize(blob))
            except Exception as e:  # surfaced on wait()
                self._errors.append((item[0] if item else "?", e))
            finally:
                self._q.task_done()

    def save_checkpoint(self, path: str, state, scheduler_state, epoch, global_step,
                        best_val_loss, best_val_acc, itos, stoi, config, log_dir):
        blob = _ckpt_blob(
            state, scheduler_state, epoch, global_step, best_val_loss,
            best_val_acc, itos, stoi, config, log_dir,
        )
        self._q.put((path, blob))

    def save_weights(self, path: str, state):
        self._q.put((path, _weights_blob(state)))

    def wait(self):
        """Block until all queued writes hit disk; raise the first error."""
        self._q.join()
        if self._errors:
            path, err = self._errors[0]
            self._errors.clear()
            raise RuntimeError(f"async checkpoint write failed for {path}: {err}")

    def close(self):
        # the shutdown sentinel goes in a finally: if wait() raises a
        # stashed write error, the worker must still be released or it
        # blocks on q.get() forever (one leaked thread per failed trial
        # in a long-lived multi-trial HPO process)
        try:
            self.wait()
        finally:
            self._q.put(None)
            self._worker.join(timeout=5.0)


def load_checkpoint_blob(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    # every loader (load_variables / restore / averaging / inference) comes
    # through here: refuse a NEWER layout loudly — a silent mis-read of a
    # future format would decode garbage weights
    version = int(blob.get("format_version", 1)) if isinstance(blob, dict) else 1
    if version > CHECKPOINT_FORMAT_VERSION:
        raise ValueError(
            f"{path} is checkpoint format {version}, newer than this loader "
            f"({CHECKPOINT_FORMAT_VERSION}); upgrade rcnn_ocr_tpu to read it"
        )
    return blob


def restore_train_state(blob: Dict[str, Any], template_state):
    """Restore a TrainState from a checkpoint blob using a template's treedef.

    EMA: restored when both the blob and the template carry it; a template
    with EMA restoring a pre-EMA blob warm-starts the average from the
    restored params (resuming with ``ema_decay`` newly enabled)."""
    params = serialization.from_state_dict(template_state.params, blob["params"])
    batch_stats = serialization.from_state_dict(
        template_state.batch_stats, blob["batch_stats"]
    )
    opt_state = serialization.from_state_dict(template_state.opt_state, blob["opt_state"])
    ema = template_state.ema_params
    if ema is not None:
        ema = (
            serialization.from_state_dict(ema, blob["ema_params"])
            if blob.get("ema_params")
            else params
        )
    return template_state.replace(
        step=np.asarray(blob.get("global_step", 0), np.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        ema_params=ema,
    )


def load_variables(path: str, template_variables: Optional[Dict[str, Any]] = None):
    """Load model variables from a weights or full-checkpoint msgpack file."""
    blob = load_checkpoint_blob(path)
    if "params" not in blob:
        raise ValueError(f"{path} holds no model parameters")
    variables = {"params": blob["params"], "batch_stats": blob.get("batch_stats", {})}
    if blob.get("quant_stats"):
        # calibrated static-int8 activation scales (OCRInference.calibrate)
        variables["quant_stats"] = blob["quant_stats"]
    if template_variables is not None:
        had_quant = "quant_stats" in variables
        variables = serialization.from_state_dict(template_variables, variables)
        if had_quant and "quant_stats" not in variables:
            # flax drops collections absent from the template; keep the
            # calibrated static-int8 scales so a resumed run re-saves them
            variables = dict(variables)
            variables["quant_stats"] = blob["quant_stats"]
    return variables, blob
