"""Additive-attention LSTM decoder as a single `lax.scan`.

The reference decoder (`/root/reference/model/model.py:23-148`) runs a
Python loop of ``max_len + 1`` steps, each doing Bahdanau attention over the
encoder states and an LSTMCell update — its biggest accelerator-efficiency
sin.  Here both the teacher-forced and the greedy path are one `lax.scan`
with a static step count (the reference always runs all steps, so there is
no early-exit semantics to emulate).

TPU-first details:

* the attention key projection ``i2h(batch_H)`` is hoisted out of the scan
  (it does not depend on the step);
* the reference feeds a one-hot of the previous character into the
  LSTMCell input; a one-hot times a weight matrix is a row gather, so the
  cell's input weight is split into ``w_ctx`` (context part) and ``w_emb``
  (an embedding table) — no [B, V] one-hot is ever materialized;
* teacher forcing consumes the target tokens as scan inputs (no carry
  dependence), greedy decoding carries the argmax feedback;
* train-mode logits are one big ``[B*(max_len+1), H] x [H, V]`` matmul over
  the stacked hidden states, exactly like the reference's single
  ``generator`` application (`model/model.py:146`).

Parity quirks preserved: attention weights get dropout (p=0.1) in training
(`model/model.py:40`); train logits are computed from the *raw* hidden
states (no dropout before the generator); blank logits are masked to -1e4
when a blank id exists (`model/model.py:83-89`); scheduled sampling flips
one coin per step for the whole batch (`model/model.py:140-144`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rcnn_ocr_tpu.models.lstm import lstm_cell_gates

Dtype = Any


class AttentionDecoder(nn.Module):
    num_classes: int
    hidden_size: int = 256
    sos_id: int = 1
    eos_id: int = 2
    pad_id: int = 0
    blank_id: Optional[int] = None
    dropout_p: float = 0.1
    sampling_prob: float = 0.0
    dtype: Dtype = jnp.float32

    def _mask_blank(self, logits: jnp.ndarray) -> jnp.ndarray:
        if self.blank_id is None:
            return logits
        return logits.at[..., self.blank_id].set(-1e4)

    @nn.compact
    def __call__(
        self,
        batch_H: jnp.ndarray,  # [B, T, C] encoder states
        text: Optional[jnp.ndarray] = None,  # [B, >= steps] with SOS at [:, 0]
        train: bool = True,
        batch_max_length: int = 25,
    ) -> jnp.ndarray:
        batch, enc_t, enc_c = batch_H.shape
        hidden = self.hidden_size
        vocab = self.num_classes
        steps = batch_max_length + 1
        dt = self.dtype
        k_init = nn.initializers.lecun_normal()

        # attention params
        w_i2h = self.param("w_i2h", k_init, (enc_c, hidden), jnp.float32)
        w_h2h = self.param("w_h2h", k_init, (hidden, hidden), jnp.float32)
        b_h2h = self.param("b_h2h", nn.initializers.zeros, (hidden,), jnp.float32)
        v_score = self.param("v_score", k_init, (hidden, 1), jnp.float32)
        # LSTMCell over [context; onehot(prev)] with the input weight split
        w_ctx = self.param("w_ctx", k_init, (enc_c, 4 * hidden), jnp.float32)
        w_emb = self.param("w_emb", k_init, (vocab, 4 * hidden), jnp.float32)
        w_hh = self.param("w_hh", k_init, (hidden, 4 * hidden), jnp.float32)
        b_cell = self.param("b_cell", nn.initializers.zeros, (4 * hidden,), jnp.float32)
        # generator
        w_gen = self.param("w_gen", k_init, (hidden, vocab), jnp.float32)
        b_gen = self.param("b_gen", nn.initializers.zeros, (vocab,), jnp.float32)

        bh = batch_H.astype(dt)
        proj_H = jnp.einsum(
            "btc,ch->bth", bh, w_i2h.astype(dt), preferred_element_type=jnp.float32
        )  # hoisted attention keys

        use_attn_dropout = train and self.dropout_p > 0.0
        use_sampling = train and self.sampling_prob > 0.0
        greedy = not train and text is None
        needs_step_logits = greedy or use_sampling

        if train and text is None:
            raise ValueError("teacher-forced decoding requires `text` with SOS at [:, 0]")

        if use_attn_dropout or use_sampling:
            base_rng = self.make_rng("dropout")
        else:
            base_rng = None

        w_h2h_c = w_h2h.astype(dt)
        v_c = v_score.astype(dt)
        w_ctx_c = w_ctx.astype(dt)
        w_hh_c = w_hh.astype(dt)
        w_gen_c = w_gen.astype(dt)
        # jnp-materialize the embedding table: params may arrive as plain
        # numpy (e.g. torch-imported), which cannot be row-gathered with a
        # traced index inside the scan
        w_emb_c = jnp.asarray(w_emb)

        def attend_and_update(h, c, targets, t):
            """One decoder step: attention context + LSTM cell update."""
            proj_h = h.astype(dt) @ w_h2h_c + b_h2h
            e = jnp.squeeze(
                jnp.tanh(proj_H + proj_h[:, None, :].astype(jnp.float32)).astype(dt) @ v_c,
                -1,
            )  # [B, T]
            alpha = jax.nn.softmax(e.astype(jnp.float32), axis=1)
            if use_attn_dropout:
                key = jax.random.fold_in(base_rng, t)
                keep = jax.random.bernoulli(key, 1.0 - self.dropout_p, alpha.shape)
                alpha = jnp.where(keep, alpha / (1.0 - self.dropout_p), 0.0)
            context = jnp.einsum(
                "bt,btc->bc", alpha.astype(dt), bh, preferred_element_type=jnp.float32
            )
            gates = (
                context.astype(dt) @ w_ctx_c
                + w_emb_c[targets]  # one-hot matmul == row gather
                + h.astype(dt) @ w_hh_c
                + b_cell
            )
            return lstm_cell_gates(gates.astype(jnp.float32), c, hidden)

        h0 = jnp.zeros((batch, hidden), jnp.float32)
        c0 = jnp.zeros((batch, hidden), jnp.float32)

        if not needs_step_logits:
            # pure teacher forcing: targets come from `text`, no carry feedback
            xs = (
                jnp.transpose(text[:, :steps]).astype(jnp.int32),
                jnp.arange(steps, dtype=jnp.int32),
            )

            def step_tf(carry, x_t):
                h, c = carry
                tgt_t, t = x_t
                h_new, c_new = attend_and_update(h, c, tgt_t, t)
                return (h_new, c_new), h_new

            _, hs = jax.lax.scan(step_tf, (h0, c0), xs)  # [steps, B, H]
            out_hid = jnp.transpose(hs, (1, 0, 2))  # [B, steps, H]
            logits = (
                out_hid.astype(dt) @ w_gen_c + b_gen
            )  # single big generator matmul
            return self._mask_blank(logits.astype(jnp.float32))

        # greedy decode / scheduled sampling: carry the fed-back tokens
        if text is not None:
            teacher = jnp.transpose(text[:, :steps]).astype(jnp.int32)  # [steps, B]
        else:
            teacher = jnp.zeros((steps, batch), jnp.int32)

        def step_fb(carry, x_t):
            h, c, targets = carry
            teacher_t, t = x_t
            h_new, c_new = attend_and_update(h, c, targets, t)
            logits_t = h_new.astype(dt) @ w_gen_c + b_gen
            logits_t = self._mask_blank(logits_t.astype(jnp.float32))
            pred = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
            if use_sampling:
                # one coin per step for the whole batch, like the reference
                coin = jax.random.uniform(jax.random.fold_in(base_rng, 100_000 + t))
                next_targets = jnp.where(coin < self.sampling_prob, pred, teacher_t)
                out = h_new
            else:
                next_targets = pred
                out = logits_t
            return (h_new, c_new, next_targets), out

        targets0 = jnp.full((batch,), self.sos_id, jnp.int32)
        if text is not None:
            targets0 = text[:, 0].astype(jnp.int32)
        # teacher stream shifted: at step t the *next* targets (used at t+1)
        # come from text[:, t+1]; feed teacher[t+1] (last step's value unused)
        teacher_next = jnp.concatenate([teacher[1:], teacher[-1:]], axis=0)
        xs = (teacher_next, jnp.arange(steps, dtype=jnp.int32))
        _, outs = jax.lax.scan(step_fb, (h0, c0, targets0), xs)

        if use_sampling:
            out_hid = jnp.transpose(outs, (1, 0, 2))
            logits = out_hid.astype(dt) @ w_gen_c + b_gen
            return self._mask_blank(logits.astype(jnp.float32))
        return jnp.transpose(outs, (1, 0, 2))  # [B, steps, V] greedy logits
