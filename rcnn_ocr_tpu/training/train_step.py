"""Jitted, mesh-sharded train / eval steps.

One compiled function per (bucket-shape, mode): parameters and optimizer
state live replicated on the mesh, the batch is sharded over the ``data``
axis, gradients all-reduce over ICI automatically (GSPMD).  bf16 compute /
fp32 params with donated state — the XLA-native replacement for the
reference's AMP autocast + GradScaler (`/root/reference/training/train.py:
315,499-508`); bf16 needs no loss scaling.

The loss is token-mean cross-entropy with PAD ignored
(``CrossEntropyLoss(ignore_index=PAD)``, `train.py:289`), with an extra
``valid`` row mask so statically padded batches contribute nothing.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rcnn_ocr_tpu.ops.ctc import ctc_loss as ctc_loss_fn


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # exponential moving average of params (None unless ema_decay > 0);
    # the evaluated/deployed weights of an EMA run
    ema_params: Any = None


def create_train_state(model, variables, tx, ema: bool = False) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params) if ema else None,
    )


def masked_token_ce(
    logits: jnp.ndarray,  # [B, T, V]
    targets: jnp.ndarray,  # [B, T]
    pad_id: int,
    valid_rows: Optional[jnp.ndarray] = None,  # [B] bool
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Mean CE over non-PAD tokens (of valid rows).

    ``label_smoothing=eps`` blends the one-hot target with the uniform
    distribution: ``(1-eps)*CE(target) + eps*mean_v(-log p_v)`` per token.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if label_smoothing > 0.0:
        eps = jnp.float32(label_smoothing)
        nll = (1.0 - eps) * nll + eps * (-jnp.mean(logp, axis=-1))
    mask = (targets != pad_id).astype(jnp.float32)
    if valid_rows is not None:
        mask = mask * valid_rows.astype(jnp.float32)[:, None]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    max_len: int,
    pad_id: int,
    head: str = "attention",
    ctc_blank_id: int = 0,
    ctc_loss_weight: float = 1.0,
    donate: bool = True,
    augment: Optional[Dict] = None,
    grad_accum: int = 1,
    ema_decay: float = 0.0,
    label_smoothing: float = 0.0,
) -> Callable:
    """Build the jitted train step ``(state, batch, rng) -> (state, metrics)``.

    ``head``: "attention" | "ctc" | "both" — which loss(es) to optimize.
    ``augment``: when given, ``batch["image"]`` arrives as resize-padded
    uint8 and the full augmentation pipeline (affine, brightness/contrast,
    invert, normalize) runs ON DEVICE inside the step
    (:mod:`rcnn_ocr_tpu.ops.augment`) — fused by XLA, and host->device
    image traffic drops 4x (uint8 vs float32).

    ``grad_accum=A > 1``: gradient accumulation as ONE jitted step — batch
    arrays arrive stacked ``[A, B/A, ...]`` (see
    :func:`rcnn_ocr_tpu.parallel.mesh.make_process_local_batch`) and a
    ``lax.scan`` runs the A microbatches sequentially, summing fp32
    gradients in a carry before a single optimizer update.  Peak activation
    memory is that of ONE microbatch, so the effective batch (and the
    per-update MXU work) scales past what activations allow — the
    TPU-idiomatic equivalent of the torch ``loss.backward()``-N-times
    idiom, with no per-microbatch dispatch or host sync.  Semantics:
    microbatch losses are equally weighted (mean of token-mean CEs), and
    BatchNorm running stats update sequentially through the scan at fixed
    params — exactly what N sequential small batches would do.

    ``ema_decay=d > 0``: after each optimizer update the step also advances
    ``state.ema_params <- d * ema + (1-d) * params`` (one fused elementwise
    pass; requires a state built with ``create_train_state(..., ema=True)``).
    """

    def _advance_ema(ema, new_params):
        if ema_decay > 0.0 and ema is None:
            # trace-time check: ema_decay>0 against a state built without
            # an EMA tree would otherwise silently train with no EMA and
            # die much later (or deploy raw weights without warning)
            raise ValueError(
                "ema_decay > 0 requires a state built with "
                "create_train_state(..., ema=True)"
            )
        if ema_decay <= 0.0 or ema is None:
            return ema
        d = jnp.float32(ema_decay)
        return jax.tree_util.tree_map(
            lambda e, p: (e * d + p.astype(jnp.float32) * (1.0 - d)).astype(e.dtype),
            ema,
            new_params,
        )

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if augment is not None:
            from rcnn_ocr_tpu.ops.augment import device_train_augment

            rng, aug_rng = jax.random.split(rng)
            batch = dict(batch)
            batch["image"] = device_train_augment(batch["image"], aug_rng, augment)
        rngs = {"dropout": rng}
        losses = {}
        if head == "attention":
            logits, mutated = model.apply(
                variables,
                batch["image"],
                text=batch["text_in"],
                train=True,
                batch_max_length=max_len,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            losses["attn_loss"] = masked_token_ce(
                logits, batch["target_y"], pad_id, batch.get("valid"),
                label_smoothing=label_smoothing,
            )
            total = losses["attn_loss"]
        elif head == "ctc":
            logits, mutated = model.apply(
                variables,
                batch["image"],
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
                method=model.ctc_logits,
            )
            lp = jnp.zeros(logits.shape[:2], jnp.float32)
            losses["ctc_loss"] = ctc_loss_fn(
                logits, lp, batch["ctc_labels"], batch["ctc_paddings"], ctc_blank_id,
                valid=batch.get("valid"),
            )
            total = losses["ctc_loss"]
        elif head == "both":
            (attn_logits, ctc_logits), mutated = model.apply(
                variables,
                batch["image"],
                text=batch["text_in"],
                train=True,
                batch_max_length=max_len,
                rngs=rngs,
                mutable=["batch_stats"],
                method=model.forward_both,
            )
            losses["attn_loss"] = masked_token_ce(
                attn_logits, batch["target_y"], pad_id, batch.get("valid"),
                label_smoothing=label_smoothing,
            )
            lp = jnp.zeros(ctc_logits.shape[:2], jnp.float32)
            losses["ctc_loss"] = ctc_loss_fn(
                ctc_logits, lp, batch["ctc_labels"], batch["ctc_paddings"], ctc_blank_id,
                valid=batch.get("valid"),
            )
            total = losses["attn_loss"] + ctc_loss_weight * losses["ctc_loss"]
        else:
            raise ValueError(f"unknown head: {head}")
        return total, (losses, mutated["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, Dict]:
        (total, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=_advance_ema(state.ema_params, new_params),
        )
        metrics = {"loss": total, **losses}
        return new_state, metrics

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step_accum(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng
    ) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def micro(carry, xs):
            stats, grad_sum = carry
            mb, r = xs
            (total, (losses, new_stats)), grads = grad_fn(
                state.params, stats, mb, r
            )
            grad_sum = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), grad_sum, grads
            )
            return (new_stats, grad_sum), {"loss": total, **losses}

        rngs = jax.random.split(rng, grad_accum)
        grad_zero = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        (new_stats, grad_sum), stacked = jax.lax.scan(
            micro, (state.batch_stats, grad_zero), (batch, rngs)
        )
        grads = jax.tree_util.tree_map(
            lambda g, p: (g / grad_accum).astype(p.dtype),
            grad_sum,
            state.params,
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=_advance_ema(state.ema_params, new_params),
        )
        metrics = {k: jnp.mean(v) for k, v in stacked.items()}
        return new_state, metrics

    return train_step_accum if grad_accum > 1 else train_step


def make_eval_step(
    model, max_len: int, pad_id: int, head: str = "attention", ctc_blank_id: int = 0,
    use_ema: bool = False,
) -> Callable:
    """Jitted eval: teacher-forced loss + greedy prediction ids.

    Preserves the reference's two-forward-pass validation CONTRACT
    (`/root/reference/training/train.py:554-576`: one teacher-forced pass
    for the val loss, one greedy pass for the decoded metrics) while
    running the encoder ONCE (`RCNN.eval_outputs`): eval is deterministic
    (no dropout, BN running stats), so the teacher-forced, greedy, and CTC
    passes all see the identical encoder output — sharing it changes no
    metric, and the 42M-param CNN+BiLSTM stops being recomputed 2-3x per
    val batch (throughput measured in tools/val_feed_bench.py / PERF.md).

    ``use_ema=True`` evaluates ``state.ema_params`` (the weights the
    checkpoint slots deploy for an EMA run) instead of the raw params.
    """

    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        from rcnn_ocr_tpu.ops.augment import device_normalize

        eval_params = state.ema_params if use_ema else state.params
        variables = {"params": eval_params, "batch_stats": state.batch_stats}
        # val batches arrive as resize-padded uint8 (4x less host->device
        # traffic); normalize fuses into the stem here
        with_attention = head in ("attention", "both")
        outs = model.apply(
            variables,
            device_normalize(batch["image"]),
            text=batch["text_in"] if with_attention else None,
            batch_max_length=max_len,
            with_attention=with_attention,
            with_ctc=head in ("ctc", "both"),
            method=model.eval_outputs,
        )
        out = {}
        if with_attention:
            out["val_loss"] = masked_token_ce(
                outs["tf_logits"], batch["target_y"], pad_id, batch.get("valid")
            )
            out["pred_ids"] = jnp.argmax(outs["greedy_logits"], axis=-1)
        if head in ("ctc", "both"):
            ctc_logits = outs["ctc_logits"]
            lp = jnp.zeros(ctc_logits.shape[:2], jnp.float32)
            loss = ctc_loss_fn(
                ctc_logits, lp, batch["ctc_labels"], batch["ctc_paddings"], ctc_blank_id,
                valid=batch.get("valid"),
            ) if "ctc_labels" in batch else jnp.zeros(())
            out["ctc_val_loss"] = loss
            out["ctc_frame_ids"] = jnp.argmax(ctc_logits, axis=-1)
            if head == "ctc":
                out["val_loss"] = loss
        return out

    return eval_step
