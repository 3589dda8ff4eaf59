"""The training loop: `run_training(cfg)`.

Orchestration parity with `/root/reference/training/train.py:179-782`
(dataset assembly with explicit-val or random-split, proportional batch
mixing, eval throttling via ``eval_every``, two-pass validation
(teacher-forced loss + greedy decode metrics) per val set, TB + CSV + log
channels, three checkpoint slots, plateau/cosine scheduling, resume) —
rebuilt on the TPU-native substrate:

* one jitted train step (bf16 compute, donated state) over a device mesh —
  batch sharded on the ``data`` axis, parameters replicated, gradient
  all-reduce over ICI inserted by XLA;
* host-side threaded data loading with background prefetch and static
  batch shapes (short batches padded + masked, so XLA compiles once);
* msgpack checkpoints with the charset embedded; resume restores model,
  optimizer, scheduler and counters.
"""

from __future__ import annotations

import contextlib
import os
import random
import signal
import threading
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from rcnn_ocr_tpu.data.dataset import (
    ConcatDataset,
    MultiDataset,
    OCRDataset,
    ProportionalBatchSampler,
    ShuffleBatchSampler,
    random_split,
)
from rcnn_ocr_tpu.data.loader import (
    BucketedBatchSampler,
    DataLoader,
    ProcessShardedBatchSampler,
    probe_dataset_buckets,
)
from rcnn_ocr_tpu.data.transforms import ResizeAndPad, get_train_transform
from rcnn_ocr_tpu.models import RCNN
from rcnn_ocr_tpu.parallel.mesh import (
    make_mesh,
    make_process_local_batch,
    param_shardings,
    replicated_sharding,
)
from rcnn_ocr_tpu.training import checkpoint as ckpt_io
from rcnn_ocr_tpu.training.config import Config
from rcnn_ocr_tpu.training.loggers import MetricsCSV, SummaryWriter, setup_logger
from rcnn_ocr_tpu.training.metrics import (
    character_error_rate,
    compute_accuracy,
    word_error_rate,
)
from rcnn_ocr_tpu.training.optim import build_optimizer, build_scheduler, get_lr, set_lr
from rcnn_ocr_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from rcnn_ocr_tpu.utils.profiling import StepTimer, trace
from rcnn_ocr_tpu.vocab.charset import Charset, decode_tokens


class _NullWriter:
    """No-op SummaryWriter for non-lead hosts."""

    def add_scalar(self, *a, **k):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def set_seed(seed: int = 42) -> None:
    """Seed host-side RNGs (JAX randomness is explicit via keys)."""
    random.seed(seed)
    np.random.seed(seed)


def _dtype_from_name(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
        name
    ]


def run_training(cfg: Config, device: str = "tpu", eval_callback=None) -> Dict:
    """Train per ``cfg``; returns {"val_acc", "val_loss", "exp_dir", ...}.

    ``eval_callback(epoch, metrics) -> bool`` (optional) fires after every
    evaluated epoch with ``{"val_acc", "val_loss", "val_cer", "val_wer"}``;
    returning True stops the run cleanly (checkpoints drained, handlers
    restored) with ``result["pruned"] = True`` — the hook HPO trial
    pruning rides (`rcnn_ocr_tpu.hpo`).
    """
    seed = cfg.get("seed", 42)
    set_seed(seed)

    if (
        bool(cfg.get("device_augment", False))
        and float(cfg.get("p_EdgeCrop", 0.0) or 0.0) > 0
    ):
        # the edge crop must run on the RAW image before the resize; the
        # device pipeline only sees resize-padded tensors — refuse up
        # front instead of silently dropping the knob
        raise ValueError(
            "p_EdgeCrop requires host augmentation (device_augment=false): "
            "the crop applies to the raw image before ResizeAndPad"
        )

    if cfg.get("compile_cache_dir"):
        from rcnn_ocr_tpu.utils import enable_compile_cache

        enable_compile_cache(cfg.get("compile_cache_dir"))

    exp_dir = cfg.get("exp_dir")
    os.makedirs(exp_dir, exist_ok=True)
    logger = setup_logger(exp_dir)
    logger.info("Start training")
    logger.info(f"Experiment dir: {exp_dir}")
    logger.info(f"Seed: {seed}")
    try:
        cfg.save()
        logger.info("Saved config to exp_dir/config.json")
    except Exception as e:
        logger.info(f"Config save skipped: {e}")

    # --- hyperparameters (reference defaults) ---
    train_csvs = cfg.get("train_csvs")
    train_roots = cfg.get("train_roots")
    val_csvs = cfg.get("val_csvs")
    val_roots = cfg.get("val_roots")
    charset_path = cfg.get("charset_path")
    encoding = cfg.get("encoding", "utf-8")
    img_h = cfg.get("img_h", 64)
    img_w = cfg.get("img_w", 256)
    max_len = cfg.get("max_len", 25)
    hidden_size = cfg.get("hidden_size", 256)
    batch_size = cfg.get("batch_size", 32)
    epochs = cfg.get("epochs", 20)
    lr = cfg.get("lr", 1e-3)
    optimizer_name = cfg.get("optimizer", "Adam")
    scheduler_name = cfg.get("scheduler", "ReduceLROnPlateau")
    weight_decay = cfg.get("weight_decay", 0.0)
    momentum = cfg.get("momentum", 0.9)
    resume_path = cfg.get("resume_path")
    eval_every = int(cfg.get("eval_every", cfg.get("save_every", 1)))
    if eval_every < 1:
        raise ValueError("eval_every must be >= 1")
    train_proportions = cfg.get("train_proportions")
    val_size = cfg.get("val_size", 3000)
    if val_size is not None and int(val_size) < 1:
        # a falsy 0 used to silently become the 3000 default — the
        # random-split validator needs at least one row; zero-validation
        # runs should supply explicit val_csvs/val_roots instead
        raise ValueError(
            f"val_size must be >= 1 (got {val_size}); for no random-split "
            "holdout provide explicit val_csvs/val_roots"
        )
    num_workers = cfg.get("num_workers", 0)
    head = cfg.get("head", "attention")
    compute_dtype = _dtype_from_name(cfg.get("compute_dtype", "bfloat16"))
    log_every = max(1, int(cfg.get("log_every", 50)))
    grad_accum = max(1, int(cfg.get("grad_accum", 1)))
    ema_decay = float(cfg.get("ema_decay", 0.0))
    if not 0.0 <= ema_decay < 1.0:
        raise ValueError("ema_decay must be in [0, 1)")
    profile_steps = int(cfg.get("profile_steps", 0))
    profile_dir = cfg.get("profile_dir") or os.path.join(exp_dir, "profile")
    profile_warmup = 5  # skip compile + cold-cache steps before tracing

    # --- train-to-deploy handoff (validated NOW: a typo'd export block
    # must fail in seconds, not after the last epoch) ---
    export_req = cfg.get("export_artifact")
    if export_req:
        from rcnn_ocr_tpu.export import validate_export_request

        export_req = validate_export_request(export_req, head=head)

    # --- mesh / devices ---
    mesh_shape = cfg.get("mesh_shape")
    mesh_axes = tuple(cfg.get("mesh_axes") or ("data",))
    mesh = make_mesh(mesh_shape, mesh_axes)
    n_data = mesh.shape.get("data", 1)
    # static per-step batch: pad up to a multiple of the data-axis size —
    # and of grad_accum, so every microbatch of the accumulation scan
    # shards evenly over the data axis too
    bs_mult = n_data * grad_accum
    static_bs = ((batch_size + bs_mult - 1) // bs_mult) * bs_mult
    logger.info(
        f"Devices: {len(jax.devices())} ({jax.devices()[0].platform}); "
        f"mesh={dict(mesh.shape)}; static_batch={static_bs}"
    )

    # --- observability (host-side IO on process 0 only — multi-host safe) ---
    is_lead_host = jax.process_index() == 0
    log_dir = os.path.join(exp_dir, "logs")
    writer = SummaryWriter(log_dir) if is_lead_host else _NullWriter()
    metrics_csv = (
        MetricsCSV(os.path.join(exp_dir, "metrics_epoch.csv"))
        if is_lead_host
        else None
    )

    ckpt_paths = {
        slot: os.path.join(exp_dir, f"{slot}{ckpt_io.CKPT_SUFFIX}")
        for slot in ("last", "best_loss", "best_acc")
    }
    weight_paths = {
        slot: os.path.join(exp_dir, f"{slot}{ckpt_io.WEIGHTS_SUFFIX}")
        for slot in ("last", "best_loss", "best_acc")
    }

    # --- charset / model ---
    charset = Charset.from_file(charset_path)
    num_classes = charset.num_classes
    logger.info(f"Charset loaded: {num_classes} tokens")
    with_ctc = head in ("ctc", "both")
    model = RCNN(
        num_classes=num_classes,
        hidden_size=hidden_size,
        sos_id=charset.sos_id,
        eos_id=charset.eos_id,
        pad_id=charset.pad_id,
        blank_id=charset.blank_id,
        enc_dropout_p=cfg.get("enc_dropout_p", 0.1),
        dropblock_p=cfg.get("dropblock_p", 0.0),
        dropblock_block_size=cfg.get("dropblock_block_size", 5),
        sampling_prob=cfg.get("sampling_prob", 0.0),
        with_attention_head=head in ("attention", "both"),
        with_ctc_head=with_ctc,
        ctc_blank_id=charset.ctc_blank_id,
        lstm_layers=cfg.get("lstm_layers", 2),
        width_mult=cfg.get("width_mult", 1.0),
        dtype=compute_dtype,
        # fallback literal matches the measured DEFAULTS entry (XLA fusion
        # beats the pallas kernels at these shapes — CLAUDE.md)
        use_pallas=cfg.get("use_pallas", False) and jax.devices()[0].platform == "tpu",
    )

    rng = jax.random.PRNGKey(seed)
    init_rng, train_rng = jax.random.split(rng)
    dummy_x = jnp.zeros((2, img_h, img_w, 3), jnp.float32)
    dummy_text = jnp.zeros((2, max_len + 1), jnp.int32)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng},
        dummy_x,
        text=dummy_text,
        batch_max_length=max_len,
        method=model.init_all,
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"Model parameters: {n_params:,}")

    # --- optimizer / scheduler ---
    tx = build_optimizer(
        optimizer_name, lr, weight_decay, momentum,
        grad_clip=float(cfg.get("grad_clip", 0.0)),
    )
    scheduler = build_scheduler(scheduler_name, lr, epochs)
    state = create_train_state(model, variables, tx, ema=ema_decay > 0)
    # replicate (or TP-shard) the state over the mesh — INCLUDING the step
    # counter: leaving any leaf on the default device makes the first jit
    # call's input sharding differ from its output's, silently doubling
    # every compilation (measured: cache_size 2 per shape instead of 1)
    p_shard = param_shardings(state.params, mesh)
    state = state.replace(
        step=jax.device_put(state.step, replicated_sharding(mesh)),
        params=jax.tree_util.tree_map(jax.device_put, state.params, p_shard),
        batch_stats=jax.device_put(state.batch_stats, replicated_sharding(mesh)),
        opt_state=jax.device_put(state.opt_state, replicated_sharding(mesh)),
        ema_params=(
            jax.tree_util.tree_map(jax.device_put, state.ema_params, p_shard)
            if state.ema_params is not None
            else None
        ),
    )

    train_step = make_train_step(
        model,
        tx,
        max_len,
        charset.pad_id,
        head=head,
        ctc_blank_id=charset.ctc_blank_id,
        ctc_loss_weight=cfg.get("ctc_loss_weight", 1.0),
        grad_accum=grad_accum,
        ema_decay=ema_decay,
        label_smoothing=float(cfg.get("label_smoothing", 0.0)),
        augment=(
            {
                k: cfg.get(k)
                for k in (
                    "p_ShiftScaleRotate", "shift_limit", "scale_limit",
                    "rotate_limit", "p_BrightnessContrast",
                    "brightness_limit", "contrast_limit", "invert_p",
                )
            }
            if cfg.get("device_augment", False)
            else None
        ),
    )
    eval_step = make_eval_step(
        model, max_len, charset.pad_id, head=head,
        ctc_blank_id=charset.ctc_blank_id, use_ema=ema_decay > 0,
    )

    # --- transforms / datasets ---
    # Width bucketing (SURVEY.md §5.7): a handful of static widths instead
    # of one global img_w.  Transforms are then chosen per batch by the
    # loader, so datasets carry no baked-in resize width.
    width_buckets = cfg.get("width_buckets")
    auto_bucket_k = None
    if isinstance(width_buckets, int):
        # "width_buckets": K — derive the K optimal static widths from the
        # training data itself (waste-minimizing DP, resolved after the
        # datasets are built)
        auto_bucket_k = max(1, int(width_buckets))
    elif width_buckets:
        width_buckets = sorted({int(b) for b in width_buckets})
    cfg_dict = cfg.to_dict()
    device_augment = bool(cfg.get("device_augment", False))

    def train_transform_for(w: int):
        if device_augment:
            # host only resize-pads to uint8; affine/brightness/invert/
            # normalize run fused on-device inside the train step
            return ResizeAndPad(img_h=img_h, img_w=w)
        return get_train_transform(cfg_dict, img_h=img_h, img_w=w)

    train_transform = train_transform_for(img_w)
    # validation ships resize-padded uint8; eval_step normalizes on device
    # (same 4x host->device byte saving as device_augment on the train side)
    val_transform = ResizeAndPad(img_h=img_h, img_w=img_w)
    if device_augment:
        logger.info("Augmentation: on-device (batched affine/B-C/invert under jit)")

    def make_ds(csv_path, root, transform):
        return OCRDataset(
            csv_path,
            root,
            charset.stoi,
            img_height=img_h,
            img_max_width=img_w,
            transform=transform,
            encoding=encoding,
            max_len=max_len,
            strict_max_len=True,
            num_workers=num_workers if num_workers else 4,
        )

    train_sets: List = []
    val_sets: List = []
    for i, (train_csv, train_root) in enumerate(zip(train_csvs, train_roots)):
        has_separate_val = bool(
            val_csvs
            and val_roots
            and i < len(val_csvs)
            and i < len(val_roots)
            and val_csvs[i] is not None
            and val_roots[i] is not None
        )
        # in bucketed mode the loader picks a per-bucket transform at fetch
        # time, so datasets carry none
        ds_train_tf = None if width_buckets else train_transform
        ds_val_tf = None if width_buckets else val_transform
        if has_separate_val:
            train_sets.append(make_ds(train_csv, train_root, ds_train_tf))
            val_sets.append(make_ds(val_csvs[i], val_roots[i], ds_val_tf))
            logger.info(f"  Dataset {i}: separate validation set from {val_roots[i]}")
        else:
            full = make_ds(train_csv, train_root, None)
            n_val = min(val_size if val_size is not None else 3000, len(full))
            n_train = len(full) - n_val
            if n_train <= 0:
                raise ValueError(
                    f"Dataset {train_csv} has only {len(full)} samples, fewer than {n_val}"
                )
            tr, va = random_split(full, n_train, n_val, seed=seed)
            # unlike the reference's shared-transform wart, each split gets
            # its own transform (SURVEY.md §5.2)
            tr.transform = ds_train_tf
            va.transform = ds_val_tf
            train_sets.append(tr)
            val_sets.append(va)
            logger.info(f"  Dataset {i}: random split (val_size={n_val})")

    loader_workers = num_workers if num_workers and num_workers > 0 else 2
    if train_proportions is not None:
        total = sum(train_proportions)
        proportions = [p / total for p in train_proportions]
        assert len(proportions) == len(train_sets), "train_proportions != num train_sets"
        train_dataset = MultiDataset(train_sets)
        train_sampler = ProportionalBatchSampler(
            train_sets, batch_size, proportions, seed=seed
        )
    else:
        train_dataset = ConcatDataset(train_sets)
        train_sampler = ShuffleBatchSampler(train_dataset, batch_size, seed=seed)

    train_bucket_of = None
    val_bucket_ofs = [None] * len(val_sets)
    if auto_bucket_k or width_buckets:
        from rcnn_ocr_tpu.data.loader import (
            BucketedProportionalBatchSampler,
            bucket_for_width,
            lift_buckets_for_ctc,
            optimal_width_buckets,
            probe_scaled_widths,
        )
        from rcnn_ocr_tpu.models.rcnn import TIME_DOWNSAMPLE

        # one-time header probe of every sample, per source dataset (works
        # for both the flat-index and the (ds, idx)-tuple sampler cases)
        per_ds_scaled = [
            probe_scaled_widths(ds, img_h, num_workers=loader_workers * 4)
            for ds in train_sets
        ]
        all_scaled = [w for ws in per_ds_scaled for w in ws]
        if auto_bucket_k:
            width_buckets = optimal_width_buckets(
                all_scaled, auto_bucket_k, multiple=8, max_width=img_w
            )
            waste = sum(
                max(0, bucket_for_width(min(w, img_w), width_buckets) - min(w, img_w))
                for w in all_scaled
            )
            logger.info(
                f"width_buckets=auto(k={auto_bucket_k}) -> {width_buckets} "
                f"(right-pad waste {waste / max(sum(all_scaled), 1):.1%} of "
                f"content pixels over {len(all_scaled)} samples)"
            )
        # XLA compiles one train step per bucket (shape-keyed jit cache)
        per_ds_bucket_of = [
            [bucket_for_width(w, width_buckets) for w in ws]
            for ws in per_ds_scaled
        ]
        if with_ctc:
            # CTC feasibility: lift dense lines into buckets whose time
            # axis (T = W/8) fits their label alignment
            lifted = [
                lift_buckets_for_ctc(
                    ds, bo, charset, max_len, width_buckets,
                    time_downsample=TIME_DOWNSAMPLE,
                )
                for ds, bo in zip(train_sets, per_ds_bucket_of)
            ]
            n_lifted = sum(
                a != b
                for la, lb in zip(lifted, per_ds_bucket_of)
                for a, b in zip(la, lb)
            )
            if n_lifted:
                logger.info(
                    f"CTC-aware bucketing: {n_lifted} samples lifted to a "
                    "wider bucket (label needs more time steps)"
                )
            per_ds_bucket_of = lifted
        if train_proportions is not None:
            # bucket-aware quota sampler: dataset proportions hold (per
            # batch or in expectation per `proportional_quotas`) while
            # every batch stays single-bucket (SURVEY.md §5.7 + the
            # reference's proportional mixing, composed)
            quota_mode = str(cfg.get("proportional_quotas", "expected"))
            train_sampler = BucketedProportionalBatchSampler(
                train_sets, batch_size, proportions, per_ds_bucket_of,
                seed=seed, quota_mode=quota_mode,
            )
            logger.info(f"Proportional bucketing quota mode: {quota_mode}")
            train_bucket_of = train_sampler.bucket_of
            flat_buckets = [b for bo in per_ds_bucket_of for b in bo]
        else:
            train_bucket_of = per_ds_bucket_of[0] if len(train_sets) == 1 else [
                b for bo in per_ds_bucket_of for b in bo
            ]
            train_sampler = BucketedBatchSampler(
                train_bucket_of, batch_size, shuffle=True, seed=seed
            )
            flat_buckets = list(train_bucket_of)
        val_bucket_ofs = [
            probe_dataset_buckets(vs, img_h, width_buckets, num_workers=loader_workers * 4)
            for vs in val_sets
        ]
        if with_ctc:
            val_bucket_ofs = [
                lift_buckets_for_ctc(
                    vs, vb, charset, max_len, width_buckets,
                    time_downsample=TIME_DOWNSAMPLE,
                )
                for vs, vb in zip(val_sets, val_bucket_ofs)
            ]
        hist = {w: flat_buckets.count(w) for w in sorted(set(flat_buckets))}
        logger.info(f"Width buckets {width_buckets}: train histogram {hist}")

    # --- multi-host input sharding (SURVEY §5.8) ---
    # every process builds identical samplers (same seed), keeps only its
    # contiguous block of each global batch, and make_process_local_batch
    # assembles the global sharded array in to_device
    pcount = jax.process_count()
    local_static_bs = static_bs
    if pcount > 1:
        # width_buckets compose: bucketed samplers are seed-replicated so
        # every process draws the same batch sequence, and each batch is a
        # BucketBatch whose width tag survives the per-process row slice
        if static_bs % pcount:
            raise ValueError(
                f"batch_size (static {static_bs}) must divide evenly across "
                f"{pcount} processes"
            )
        local_static_bs = static_bs // pcount
        train_sampler = ProcessShardedBatchSampler(
            train_sampler, jax.process_index(), pcount
        )
        logger.info(
            f"Multi-host feed: {pcount} processes x {local_static_bs} "
            f"local rows -> global batch {static_bs}"
        )

    def _val_sampler(vs, vb):
        sampler = (
            BucketedBatchSampler(vb, batch_size, shuffle=False)
            if vb is not None
            else ShuffleBatchSampler(vs, batch_size, shuffle=False)
        )
        if pcount > 1:
            sampler = ProcessShardedBatchSampler(sampler, jax.process_index(), pcount)
        return sampler

    # disk transform cache: decode+resize once, memmap on later epochs.
    # Only deterministic transforms cache (ResizeAndPad — i.e. the uint8
    # feeds: device_augment train batches and every val batch); random
    # host augmentations never do.
    cache_dir = cfg.get("cache_dir")
    train_loader = DataLoader(
        train_dataset,
        train_sampler,
        charset,
        max_len,
        num_workers=loader_workers,
        static_batch_size=local_static_bs,
        with_ctc=with_ctc,
        bucket_of=train_bucket_of,
        transform_for_width=train_transform_for if width_buckets else None,
        cache_dir=cache_dir,
    )
    val_loaders = [
        DataLoader(
            vs,
            _val_sampler(vs, vb),
            charset,
            max_len,
            num_workers=loader_workers,
            static_batch_size=local_static_bs,
            with_ctc=with_ctc,
            bucket_of=vb,
            transform_for_width=(
                (lambda w: ResizeAndPad(img_h=img_h, img_w=w))
                if vb is not None
                else None
            ),
            cache_dir=cache_dir,
        )
        for vs, vb in zip(val_sets, val_bucket_ofs)
    ]

    n_train_samples = sum(len(ds) for ds in train_sets)
    n_val_samples = sum(len(ds) for ds in val_sets)
    logger.info(
        f"Datasets: train={n_train_samples} samples across {len(train_sets)} set(s); "
        f"val={n_val_samples} samples across {len(val_sets)} set(s)"
    )
    logger.info(
        f"Loaders: train_batches/epoch={len(train_loader)}; "
        f"val_batches={sum(len(v) for v in val_loaders)}; batch_size={batch_size}"
    )

    config_snapshot = {
        "batch_size": batch_size,
        "epochs": epochs,
        "lr": lr,
        "optimizer": optimizer_name,
        "scheduler": scheduler_name,
        "weight_decay": weight_decay,
        "momentum": momentum,
        "img_h": img_h,
        "img_w": img_w,
        "encoding": encoding,
        "max_len": max_len,
        "hidden_size": hidden_size,
        "lstm_layers": cfg.get("lstm_layers", 2),
        "width_mult": cfg.get("width_mult", 1.0),
        "head": head,
        "charset_path": charset_path,
        "train_csvs": train_csvs,
        "train_roots": train_roots,
        "val_csvs": val_csvs,
        "val_roots": val_roots,
    }

    # --- resume ---
    start_epoch = 1
    global_step = 0
    best_val_loss, best_val_acc = float("inf"), -1.0
    if resume_path and os.path.isfile(resume_path) and resume_path.endswith(
        (".pth", ".pt")
    ):
        # a reference checkpoint carries weights only (no optimizer /
        # scheduler / counters) — warm-start from it rather than silently
        # training from scratch inside the resumed experiment dir
        from rcnn_ocr_tpu.utils.common import load_model

        _, imported, _ = load_model(
            resume_path,
            itos=list(charset.itos),
            hidden_size=hidden_size,
        )
        state = state.replace(
            params=jax.tree_util.tree_map(
                jax.device_put, imported["params"], p_shard
            ),
            batch_stats=jax.device_put(
                imported.get("batch_stats", state.batch_stats),
                replicated_sharding(mesh),
            ),
        )
        logger.info(
            f"Warm start from torch checkpoint: {resume_path} "
            "(weights only — optimizer/scheduler/epoch counters start fresh)"
        )
    elif resume_path and os.path.isfile(resume_path) and not resume_path.endswith(
        ".msgpack"
    ):
        raise ValueError(
            f"resume_path points at an unsupported checkpoint format: "
            f"{resume_path} (expected .msgpack, or .pth/.pt for a "
            "weights-only warm start)"
        )
    if resume_path and os.path.isfile(resume_path) and resume_path.endswith(".msgpack"):
        blob = ckpt_io.load_checkpoint_blob(resume_path)
        state = ckpt_io.restore_train_state(blob, state)
        # restored leaves are host arrays — re-shard onto the mesh so the
        # first step's input shardings match its output's (no recompile);
        # the EMA tree rides the SAME param shardings or the first
        # post-resume step of an EMA run recompiles (and under TP the EMA
        # tree would never be placed with p_shard at all)
        state = state.replace(
            step=jax.device_put(state.step, replicated_sharding(mesh)),
            params=jax.tree_util.tree_map(jax.device_put, state.params, p_shard),
            batch_stats=jax.device_put(state.batch_stats, replicated_sharding(mesh)),
            opt_state=jax.device_put(state.opt_state, replicated_sharding(mesh)),
            ema_params=(
                jax.tree_util.tree_map(jax.device_put, state.ema_params, p_shard)
                if state.ema_params is not None
                else None
            ),
        )
        if scheduler is not None and blob.get("scheduler_state"):
            scheduler.load_state_dict(blob["scheduler_state"])
            state = state.replace(opt_state=set_lr(state.opt_state, scheduler.lr))
        start_epoch = int(blob.get("epoch", 0)) + 1
        global_step = int(blob.get("global_step", 0))
        best_val_loss = float(blob.get("best_val_loss", best_val_loss))
        best_val_acc = float(blob.get("best_val_acc", best_val_acc))
        logger.info(
            f"Resumed from: {resume_path} (epoch={start_epoch - 1}, step={global_step})"
        )

    def to_device(batch, accum: bool = False):
        arrays = {
            k: v
            for k, v in batch.items()
            if isinstance(v, np.ndarray) and k != "lengths"
        }
        # multi-host-ready feed: this process's rows -> the global sharded
        # array (single-process: identical to device_put on the data axis);
        # the train step's grad-accum scan wants [A, B/A, ...] stacking
        return make_process_local_batch(
            arrays, mesh, microbatch=grad_accum if accum else None
        )

    # async: device->host gather is synchronous (the train step donates its
    # buffers) but serialization + disk writes run off the training path
    saver = (
        ckpt_io.AsyncCheckpointer()
        if cfg.get("async_checkpoint", True) and is_lead_host
        else None
    )

    def save_slot(slot: str, epoch: int, val_loss, val_acc):
        if not is_lead_host:
            return
        args = (
            state,
            scheduler.state_dict() if scheduler is not None else None,
            epoch,
            global_step,
            val_loss,
            val_acc,
            list(charset.itos),
            charset.stoi,
            config_snapshot,
            log_dir,
        )
        if saver is not None:
            saver.save_checkpoint(ckpt_paths[slot], *args)
            saver.save_weights(weight_paths[slot], state)
        else:
            ckpt_io.save_checkpoint(ckpt_paths[slot], *args)
            ckpt_io.save_weights(weight_paths[slot], state)

    # --- preemption tolerance (SURVEY §5.3) ---
    # TPU-pod preemptions and batch schedulers deliver SIGTERM.  Catch it,
    # finish the in-flight step, write the "last" checkpoint slot, and leave
    # the loop cleanly — a follow-up run with `resume_path` pointed at the
    # experiment dir restarts losslessly at epoch granularity (the
    # interrupted epoch re-runs; `global_step` keeps counting).  The
    # reference has no equivalent (a killed torch run loses everything since
    # its last eval-epoch checkpoint).
    preempt: Dict[str, Optional[int]] = {"signum": None}
    prev_sigterm = None
    if cfg.get("graceful_shutdown", True) and threading.current_thread() is threading.main_thread():

        def _on_term(signum, frame):  # noqa: ARG001 — signal handler ABI
            preempt["signum"] = signum

        prev_sigterm = signal.signal(signal.SIGTERM, _on_term)

    # --- epoch loop ---
    # The hot loop never fetches device values per step: the loss is
    # accumulated ON DEVICE and pulled to host once per epoch (plus a cheap
    # fetch every `log_every` steps for TB/progress), so dispatch stays
    # async and the prefetch queue actually overlaps host IO with compute.
    result = {"val_acc": best_val_acc, "val_loss": best_val_loss, "exp_dir": exp_dir}
    show_progress = is_lead_host and bool(cfg.get("progress", True))
    step_timer = StepTimer()
    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        loss_accum = None  # device scalar — summed without host syncs
        n_batches = 0
        imgs_seen = 0
        profiling_epoch = profile_steps > 0 and epoch == start_epoch
        # leave warmup room for compiles, but fit inside short epochs
        epoch_warmup = min(profile_warmup, max(0, len(train_loader) - profile_steps))
        profile_scope = contextlib.ExitStack()
        bar = tqdm(
            total=len(train_loader), desc=f"epoch {epoch:03d}", unit="batch",
            leave=False, disable=None if show_progress else True,
        )
        with mesh, profile_scope, bar:
            for batch in train_loader:
                if profiling_epoch and n_batches == epoch_warmup:
                    profile_scope.enter_context(trace(profile_dir))
                step_timer.start()
                step_rng = jax.random.fold_in(train_rng, global_step)
                state, metrics = train_step(
                    state, to_device(batch, accum=grad_accum > 1), step_rng
                )
                loss_accum = (
                    metrics["loss"]
                    if loss_accum is None
                    else loss_accum + metrics["loss"]
                )
                global_step += 1
                n_batches += 1
                imgs_seen += int(batch["valid"].sum())
                step_timer.stop(int(batch["valid"].sum()))
                if profiling_epoch and n_batches == epoch_warmup + profile_steps:
                    profile_scope.close()
                    logger.info(f"XLA trace ({profile_steps} steps) -> {profile_dir}")
                if n_batches % log_every == 0:
                    loss_val = float(metrics["loss"])  # one sync per log window
                    writer.add_scalar("Loss/train_step", loss_val, global_step)
                    writer.add_scalar("LR", get_lr(state.opt_state), global_step)
                    bar.set_postfix(loss=f"{loss_val:.4f}", refresh=False)
                bar.update(1)
                if preempt["signum"] is not None:
                    break

        # this fetch forces completion of every dispatched step, so the
        # epoch wall time below includes all device work
        avg_train_loss = (
            float(loss_accum) / n_batches if loss_accum is not None else 0.0
        )
        train_time = time.time() - t0
        writer.add_scalar("Loss/train_epoch", avg_train_loss, epoch)
        writer.add_scalar("Throughput/images_per_sec", imgs_seen / max(train_time, 1e-9), epoch)
        timing = step_timer.summary()
        if timing.get("steps"):
            writer.add_scalar("Throughput/step_ms_p95", timing["p95_ms"], epoch)
        if width_buckets and epoch == start_epoch:
            try:  # jit cache size == number of compiled shapes
                logger.info(
                    f"train_step compilations: {train_step._cache_size()} "
                    f"(width buckets: {len(width_buckets)})"
                )
            except Exception:  # noqa: BLE001 — introspection only
                pass

        if preempt["signum"] is not None:
            logger.warning(
                f"Signal {preempt['signum']} caught mid-epoch {epoch} "
                f"({n_batches} steps in): writing the 'last' slot and "
                f"stopping — resume with resume_path='{exp_dir}' "
                f"(the interrupted epoch re-runs)"
            )
            save_slot("last", epoch - 1, best_val_loss, best_val_acc)
            result["preempted"] = True
            break

        should_eval = ((epoch - start_epoch) % eval_every == 0) or (epoch == epochs)
        avg_val_loss = val_acc = val_cer = val_wer = None

        if should_eval:
            total_val_loss = 0.0
            total_batches = 0
            total_correct = 0
            total_predictions = 0
            total_cer_sum = 0.0
            total_wer_sum = 0.0
            with mesh:
                for i, val_loader in enumerate(val_loaders):
                    set_loss = 0.0
                    refs: List[str] = []
                    hyps: List[str] = []
                    set_batches = 0
                    for batch in tqdm(
                        val_loader, total=len(val_loader), desc=f"val[{i}]",
                        unit="batch", leave=False,
                        disable=None if show_progress else True,
                    ):
                        dev_batch = to_device(batch)
                        out = eval_step(state, dev_batch)
                        set_loss += float(out["val_loss"])
                        set_batches += 1
                        raw = out["pred_ids"] if "pred_ids" in out else out["ctc_frame_ids"]
                        if jax.process_count() > 1:
                            # a batch-sharded output spans non-addressable
                            # devices: fetch only THIS process's rows, and
                            # take targets/valid from the device batch by
                            # the same shard order so rows stay aligned
                            from rcnn_ocr_tpu.parallel.mesh import local_batch_rows

                            raw_rows, tgt_ids, valid_rows = local_batch_rows(
                                raw, dev_batch["target_y"], dev_batch["valid"]
                            )
                            mask = np.asarray(valid_rows).astype(bool)
                            raw_rows, tgt_ids = raw_rows[mask], tgt_ids[mask]
                        else:
                            n_real = int(batch["valid"].sum())
                            raw_rows = np.asarray(raw)[:n_real]
                            tgt_ids = np.asarray(batch["target_y"])[:n_real]
                        if "pred_ids" in out:
                            pred_ids = raw_rows
                        else:  # pure CTC: greedy-collapse the frame argmaxes
                            from rcnn_ocr_tpu.ops.ctc import ctc_greedy_collapse_np

                            rows = ctc_greedy_collapse_np(
                                raw_rows, charset.ctc_blank_id
                            )
                            width = max_len + 1
                            pred_ids = np.full((len(rows), width), charset.pad_id)
                            for r, row in enumerate(rows):
                                row = [
                                    t
                                    for t in row
                                    if t
                                    not in (charset.sos_id, charset.eos_id, charset.pad_id)
                                ][:width]
                                pred_ids[r, : len(row)] = row
                        itos = list(charset.itos)  # ONE copy, not 2/sample
                        for p_row, t_row in zip(pred_ids, tgt_ids):
                            hyps.append(
                                decode_tokens(
                                    p_row,
                                    itos,
                                    charset.pad_id,
                                    charset.eos_id,
                                    charset.blank_id,
                                )
                            )
                            refs.append(
                                decode_tokens(
                                    t_row,
                                    itos,
                                    charset.pad_id,
                                    charset.eos_id,
                                    charset.blank_id,
                                )
                            )

                    set_avg_loss = set_loss / max(1, set_batches)
                    # decoded-text metrics were computed on THIS process's
                    # rows only — sum the counts globally so every process
                    # sees identical metrics (and makes identical best-slot
                    # / scheduler / pruning decisions); val_loss is already
                    # global (computed in-program on the sharded batch)
                    from rcnn_ocr_tpu.parallel.mesh import global_metric_sum

                    n_set, n_set_correct, set_cer_sum, set_wer_sum = global_metric_sum(
                        [
                            len(refs),
                            sum(1 for r, h in zip(refs, hyps) if r == h),
                            sum(character_error_rate(r, h) for r, h in zip(refs, hyps)),
                            sum(word_error_rate(r, h) for r, h in zip(refs, hyps)),
                        ]
                    )
                    set_acc = n_set_correct / max(1, n_set)
                    writer.add_scalar(f"Loss/val_set_{i}", set_avg_loss, epoch)
                    writer.add_scalar(f"Accuracy/val_set_{i}", set_acc, epoch)
                    writer.add_scalar(
                        f"CER/val_set_{i}", set_cer_sum / max(1, n_set), epoch
                    )
                    writer.add_scalar(
                        f"WER/val_set_{i}", set_wer_sum / max(1, n_set), epoch
                    )
                    total_val_loss += set_loss
                    total_batches += set_batches
                    total_correct += n_set_correct
                    total_predictions += n_set
                    total_cer_sum += set_cer_sum
                    total_wer_sum += set_wer_sum

            avg_val_loss = total_val_loss / max(1, total_batches)
            val_acc = total_correct / max(1, total_predictions)
            val_cer = total_cer_sum / max(1, total_predictions)
            val_wer = total_wer_sum / max(1, total_predictions)
            writer.add_scalar("Loss/val_epoch", avg_val_loss, epoch)
            writer.add_scalar("Accuracy/val", val_acc, epoch)
            writer.add_scalar("CER/val", val_cer, epoch)
            writer.add_scalar("WER/val", val_wer, epoch)
        else:
            logger.info(f"Epoch {epoch:03d}: skipping validation (eval_every={eval_every})")

        current_lr = get_lr(state.opt_state)
        if metrics_csv is not None:
            metrics_csv.write_row(
                epoch, avg_train_loss, current_lr, avg_val_loss, val_acc, val_cer, val_wer
            )

        msg_parts = [f"Epoch {epoch:03d}/{epochs}", f"train_loss={avg_train_loss:.4f}"]
        if should_eval:
            msg_parts += [
                f"val_loss={avg_val_loss:.4f}",
                f"acc={val_acc:.4f}",
                f"CER={val_cer:.4f}",
                f"WER={val_wer:.4f}",
            ]
        else:
            msg_parts.append(f"val=skipped (eval_every={eval_every})")
        msg_parts.append(f"lr={current_lr:.2e}")
        msg_parts.append(f"imgs/s={imgs_seen / max(train_time, 1e-9):.0f}")
        logger.info(" | ".join(msg_parts))

        if should_eval:
            save_slot("last", epoch, avg_val_loss, val_acc)
            if avg_val_loss < best_val_loss:
                best_val_loss = avg_val_loss
                save_slot("best_loss", epoch, best_val_loss, val_acc)
                logger.info(f"New best val_loss: {best_val_loss:.4f} (epoch {epoch})")
            if val_acc >= best_val_acc:
                best_val_acc = val_acc
                save_slot("best_acc", epoch, best_val_loss, best_val_acc)
                logger.info(f"New best acc: {best_val_acc:.4f} (epoch {epoch})")
            if eval_callback is not None and bool(
                eval_callback(
                    epoch,
                    {
                        "val_acc": val_acc,
                        "val_loss": avg_val_loss,
                        "val_cer": val_cer,
                        "val_wer": val_wer,
                    },
                )
            ):
                logger.info(f"Eval callback requested stop at epoch {epoch} (pruned)")
                result["pruned"] = True
                result["epochs_run"] = epoch
                break

        if scheduler is not None:
            from rcnn_ocr_tpu.training.optim import ReduceLROnPlateau

            if isinstance(scheduler, ReduceLROnPlateau):
                if should_eval and avg_val_loss is not None:
                    new_lr = scheduler.step(avg_val_loss)
                    state = state.replace(opt_state=set_lr(state.opt_state, new_lr))
            else:
                new_lr = scheduler.step()
                state = state.replace(opt_state=set_lr(state.opt_state, new_lr))

    if prev_sigterm is not None:
        signal.signal(signal.SIGTERM, prev_sigterm)
    if saver is not None:
        saver.close()  # drain pending checkpoint writes
    writer.close()
    logger.info("Training finished.")
    result.update(
        {"val_acc": best_val_acc, "val_loss": best_val_loss, "exp_dir": exp_dir}
    )

    # --- train-to-deploy handoff: export the serving artifact from the
    # requested checkpoint slot (validated at training start above).
    # Preempted runs will resume (export then), pruned HPO trials are
    # throwaway, and only the lead host owns the deployment unit.
    if (
        export_req
        and is_lead_host
        and not result.get("preempted")
        and not result.get("pruned")
    ):
        # the WEIGHTS slot, not the full checkpoint: EMA runs deploy the
        # EMA tree (what validation measured and what chose this slot —
        # checkpoint._weights_blob), while the full blob's raw params
        # exist for resume.  Weights blobs carry no config/charset, so
        # geometry and charset come from the training config in scope.
        slot_path = weight_paths[export_req["slot"]]
        if not os.path.exists(slot_path):
            # eval_every > epochs run: no slot was ever written — say so
            # instead of crashing after a finished (if eval-less) run
            logger.info(
                f"Artifact export skipped: checkpoint slot not found "
                f"({slot_path}); no eval epoch wrote it"
            )
        else:
            from rcnn_ocr_tpu.export import export_serving_artifact
            from rcnn_ocr_tpu.inference import OCRInference

            knobs = {
                k: v
                for k, v in export_req.items()
                if k not in (
                    "slot", "out_dir", "quantize", "lm", "calibrate",
                    "confidence",
                )
            }
            if export_req.get("confidence"):
                knobs["with_confidence"] = True
            out_dir = export_req.get("out_dir") or os.path.join(
                exp_dir, "artifact"
            )
            ocr = OCRInference(
                slot_path,
                charset_path,
                img_h=img_h,
                img_w=img_w,
                hidden_size=hidden_size,
                quantize=bool(export_req.get("quantize", False)),
                lm=export_req.get("lm"),
                verbose=False,
            )
            # a bucketed training run hands its (possibly auto-derived)
            # bucket set to the deployment unit: fixed-width methods get
            # one exported kernel per training width unless the request
            # names its own set (long methods tile at tile_w instead)
            from rcnn_ocr_tpu.export import LONG_METHODS

            if (
                width_buckets
                and "width_buckets" not in export_req
                and export_req["method"] not in LONG_METHODS
            ):
                knobs["width_buckets"] = list(width_buckets)
            calibrate = export_req.get("calibrate")
            if calibrate:
                # static int8 (the bench headline path) straight out of
                # the training run: record activation scales on the val
                # sets' own images, then the scales ride in the artifact
                n_cal = 256 if calibrate is True else int(calibrate)
                cal_paths: List[str] = []
                for ds in val_sets:
                    for i in range(len(ds)):
                        if len(cal_paths) >= n_cal:
                            break
                        cal_paths.append(ds.sample_path(i))
                    if len(cal_paths) >= n_cal:
                        break
                ocr.calibrate(cal_paths, batch_size=batch_size)
                logger.info(
                    f"Calibrated static int8 scales on {len(cal_paths)} "
                    "validation images"
                )
            result["artifact_dir"] = export_serving_artifact(
                ocr, out_dir, **knobs
            )
            logger.info(
                f"Exported serving artifact: {out_dir} "
                f"(method={export_req['method']}, slot={export_req['slot']})"
            )
    return result
