"""JSON config system with resume-overlay semantics.

Reference parity: `/root/reference/training/train.py:59-137`.

* A config is a JSON dict exposed as attributes; ``cfg["key"]`` aliases
  ``getattr``.
* When ``exp_dir`` is unset, the first free ``expN`` directory name is
  auto-assigned.
* ``save()`` re-dumps the dict to ``exp_dir/config.json``.
* Resume overlay: when ``resume_path`` is set (a checkpoint file or an
  experiment directory), the checkpoint is located (preferring
  last > best_loss > best_acc), that experiment's ``config.json`` is loaded
  as the base, and the user's non-``None`` keys are overlaid on top;
  ``exp_dir`` becomes the resume directory.

Every consumer reads hyperparameters through :meth:`Config.get` so partial
configs work; defaults match the reference's ``getattr`` defaults
(`/root/reference/training/train.py:210-235`).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

# Checkpoint slot filenames (our native format; see training/checkpoint.py).
RESUME_CKPT_CANDIDATES = [
    "last_ckpt.msgpack",
    "best_loss_ckpt.msgpack",
    "best_acc_ckpt.msgpack",
    # reference-format torch checkpoints are also importable
    "last_ckpt.pth",
    "best_loss_ckpt.pth",
    "best_acc_ckpt.pth",
]

# Reference-default hyperparameters (train.py:210-235 of the reference).
DEFAULTS: Dict[str, Any] = {
    "encoding": "utf-8",
    "img_h": 64,
    "img_w": 256,
    "max_len": 25,
    "hidden_size": 256,
    "batch_size": 32,
    "epochs": 20,
    "lr": 1e-3,
    "optimizer": "Adam",
    "scheduler": "ReduceLROnPlateau",
    "weight_decay": 0.0,
    "momentum": 0.9,
    "seed": 42,
    "eval_every": 1,
    "val_size": 3000,
    "num_workers": 0,
    "train_proportions": None,
    "resume_path": None,
    "val_csvs": None,
    "val_roots": None,
    # --- TPU-native knobs (no reference counterpart) ---
    "head": "attention",  # "attention" | "ctc" | "both"
    "ctc_loss_weight": 1.0,
    "compute_dtype": "bfloat16",  # MXU-native compute precision
    "mesh_shape": None,  # e.g. [8] or [4, 2]; None = all devices, data-parallel
    "mesh_axes": ["data"],
    # e.g. [64, 128, 192, 256]; an int K derives the K waste-minimizing
    # widths from the training data (multiples of 8); None = single img_w
    "width_buckets": None,
    # width_buckets x train_proportions quota mode: "expected" keeps every
    # sample in its native bucket (proportions hold in expectation across
    # the epoch — measured the better trainer, PERF.md round 3); "batch"
    # enforces the reference's exact per-batch quotas (borrowed rows are
    # resized to the batch bucket)
    "proportional_quotas": "expected",
    # >1: accumulate gradients over N sequential microbatches inside ONE
    # jitted step (lax.scan; peak activation memory = one microbatch) —
    # scales the effective batch past activation-memory limits
    "grad_accum": 1,
    # >0: clip gradients to this global norm before the optimizer update
    "grad_clip": 0.0,
    # directory for the disk transform cache: deterministic uint8
    # transforms (ResizeAndPad — the device_augment/val feeds) decode +
    # resize each sample once and serve memmap rows on later epochs
    "cache_dir": None,
    # directory for JAX's persistent XLA compile cache: restarts/resumes
    # skip the remote train-step compile (measured 3 s warm vs 199-335 s
    # cold through this platform's tunnel — tools/compile_cache_probe.py)
    "compile_cache_dir": None,
    # blend the one-hot CE target with the uniform distribution (the
    # attention head's training loss only; val loss stays unsmoothed)
    "label_smoothing": 0.0,
    # >0 (e.g. 0.999): keep an exponential moving average of the params,
    # evaluate with it, and deploy it in the *_weights checkpoint slots
    # (raw params stay in the full checkpoints for resume)
    "ema_decay": 0.0,
    # train-to-deploy handoff: export a serving artifact (export.py) from
    # the best checkpoint when training finishes — true for defaults
    # (method picked from `head`), or a dict of export knobs (`method`,
    # `slot` best_acc|best_loss|last, `out_dir` default exp_dir/artifact,
    # `canvas`, `batch_size`, `max_length`, `beam_width`, `quantize`, the
    # *_long tiling knobs, ...; see export.EXPORT_REQUEST_KEYS).  The
    # block is validated at training START so a typo fails in seconds,
    # not after the last epoch.  Preempted and pruned runs skip export.
    "export_artifact": None,
    "use_pallas": False,  # XLA fusion currently beats the pallas kernels at these shapes
    "device_augment": False,  # run train augmentation on-device (ops/augment.py)
    "log_every": 50,  # per-step TB scalars every N steps (device fetch cadence)
    "progress": True,  # tqdm bars on the lead host (auto-off when not a tty)
    "profile_steps": 0,  # >0: capture an XLA trace of N steps in the first epoch
    "profile_dir": None,  # default: exp_dir/profile
    "sampling_prob": 0.0,
    "lstm_layers": 2,
    "width_mult": 1.0,
    "enc_dropout_p": 0.1,
    "dropblock_p": 0.0,
    "dropblock_block_size": 5,
    "shift_limit": 0.03,
    "scale_limit": 0.08,
    "rotate_limit": 3,
    "p_ShiftScaleRotate": 0.3,
    "brightness_limit": 0.2,
    "contrast_limit": 0.2,
    "p_BrightnessContrast": 0.3,
    "invert_p": 0.0,
}


# Keys that are legitimate but have no entry in DEFAULTS (required inputs,
# paths, and toggles whose absence means "feature off").
EXTRA_KNOWN_KEYS = frozenset({
    "exp_dir", "charset_path", "train_csvs", "train_roots",
    "save_every", "async_checkpoint", "graceful_shutdown",
})


def _warn_unknown_keys(keys) -> None:
    """A typo'd hyperparameter ("epochz": 100) must not silently train with
    the default — warn loudly with a did-you-mean against the known set."""
    import difflib
    import warnings

    known = sorted(set(DEFAULTS) | EXTRA_KNOWN_KEYS)
    unknown = [k for k in keys if k not in known]
    if not unknown:
        return
    parts = []
    for k in unknown:
        close = difflib.get_close_matches(k, known, n=1)
        parts.append(f"{k!r}" + (f" (did you mean {close[0]!r}?)" if close else ""))
    warnings.warn(
        "Unknown config key(s) ignored by every consumer: "
        + ", ".join(parts),
        stacklevel=3,
    )


class Config:
    """Attribute-bag config loaded from JSON (or a dict) with resume overlay."""

    def __init__(self, path_or_dict: "str | Dict[str, Any]"):
        if isinstance(path_or_dict, str):
            with open(path_or_dict, "r", encoding="utf-8") as f:
                user_data = json.load(f)
        else:
            user_data = dict(path_or_dict)

        # validate the USER's keys (not the resume overlay's — an older
        # binary must still open a newer experiment's saved config)
        _warn_unknown_keys(user_data.keys())
        merged = self._maybe_apply_resume(user_data)
        for k, v in merged.items():
            setattr(self, k, v)

        if not getattr(self, "exp_dir", None):
            exp_idx = 1
            while os.path.exists(f"exp{exp_idx}"):
                exp_idx += 1
            self.exp_dir = f"exp{exp_idx}"

    # -- dict-ish access ---------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def get(self, key: str, default: Any = None) -> Any:
        """Read a hyperparameter, falling back to reference defaults."""
        if hasattr(self, key):
            return getattr(self, key)
        if key in DEFAULTS:
            return DEFAULTS[key]
        return default

    def to_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)

    def save(self, out_path: Optional[str] = None) -> None:
        if out_path is None:
            out_path = os.path.join(self.exp_dir, "config.json")
        parent = os.path.dirname(out_path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(self.__dict__, f, indent=4, ensure_ascii=False)

    # -- resume overlay ----------------------------------------------------
    def _maybe_apply_resume(self, user_data: Dict[str, Any]) -> Dict[str, Any]:
        resume_path = user_data.get("resume_path")
        if not resume_path:
            return dict(user_data)

        resume = Path(resume_path).expanduser().resolve()
        if not resume.exists():
            raise FileNotFoundError(f"Resume path not found: {resume}")

        if resume.is_dir():
            resume_dir = resume
            resume_ckpt = None
            for name in RESUME_CKPT_CANDIDATES:
                candidate = resume_dir / name
                if candidate.is_file():
                    resume_ckpt = candidate
                    break
            if resume_ckpt is None:
                raise FileNotFoundError(
                    f"No checkpoint among {RESUME_CKPT_CANDIDATES} in {resume_dir}"
                )
        else:
            resume_ckpt = resume
            resume_dir = resume_ckpt.parent

        resume_config: Dict[str, Any] = {}
        resume_config_path = resume_dir / "config.json"
        if resume_config_path.is_file():
            try:
                with open(resume_config_path, "r", encoding="utf-8") as f:
                    resume_config = json.load(f)
            except Exception as e:  # match the reference's tolerant read
                print(f"[Config] Could not read resume config {resume_config_path}: {e}")
        else:
            print("[Config] Resume dir has no config.json; using current config")

        merged = dict(resume_config)
        for key, value in user_data.items():
            if value is not None:
                merged[key] = value

        merged["resume_path"] = str(resume_ckpt)
        merged["exp_dir"] = str(resume_dir)
        return merged
