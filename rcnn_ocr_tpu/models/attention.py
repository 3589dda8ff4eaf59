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
        beam_width: Optional[int] = None,  # beam search (eval only) — see below
        length_penalty: float = 0.0,
        lm_logp: Optional[jnp.ndarray] = None,  # [V, V] bigram log P(next|prev)
        lm_weight: float = 0.0,  # shallow-fusion mixing weight (beam only)
        return_alignment: bool = False,  # also return per-step attention argmax
    ):
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

        def attend_and_update(h, c, targets, t, keys=None, values=None):
            """One decoder step: attention context + LSTM cell update.

            Also returns the attention argmax (the encoder frame this step
            looked at hardest) — the per-character x-alignment long-line
            stitching consumes; XLA dead-code-eliminates it everywhere it
            goes unused.
            """
            keys = proj_H if keys is None else keys
            values = bh if values is None else values
            proj_h = h.astype(dt) @ w_h2h_c + b_h2h
            e = jnp.squeeze(
                jnp.tanh(keys + proj_h[:, None, :].astype(jnp.float32)).astype(dt) @ v_c,
                -1,
            )  # [B, T]
            alpha = jax.nn.softmax(e.astype(jnp.float32), axis=1)
            align = jnp.argmax(alpha, axis=1).astype(jnp.int32)  # [B]
            if use_attn_dropout:
                key = jax.random.fold_in(base_rng, t)
                keep = jax.random.bernoulli(key, 1.0 - self.dropout_p, alpha.shape)
                alpha = jnp.where(keep, alpha / (1.0 - self.dropout_p), 0.0)
            context = jnp.einsum(
                "bt,btc->bc", alpha.astype(dt), values, preferred_element_type=jnp.float32
            )
            gates = (
                context.astype(dt) @ w_ctx_c
                + w_emb_c[targets]  # one-hot matmul == row gather
                + h.astype(dt) @ w_hh_c
                + b_cell
            )
            h_new, c_new = lstm_cell_gates(gates.astype(jnp.float32), c, hidden)
            return h_new, c_new, align

        h0 = jnp.zeros((batch, hidden), jnp.float32)
        c0 = jnp.zeros((batch, hidden), jnp.float32)

        if beam_width is not None:
            if train or text is not None:
                raise ValueError("beam search is an eval-only decode (text=None)")
            return self._beam_search(
                attend_and_update,
                proj_H,
                bh,
                w_gen_c,
                b_gen,
                beam_width=int(beam_width),
                steps=steps,
                length_penalty=length_penalty,
                lm_logp=lm_logp,
                lm_weight=lm_weight,
                return_alignment=return_alignment,
            )

        if return_alignment and not greedy:
            raise ValueError(
                "return_alignment is an eval-only decode feature "
                "(greedy or beam; text=None)"
            )

        if not needs_step_logits:
            # pure teacher forcing: targets come from `text`, no carry feedback
            xs = (
                jnp.transpose(text[:, :steps]).astype(jnp.int32),
                jnp.arange(steps, dtype=jnp.int32),
            )

            def step_tf(carry, x_t):
                h, c = carry
                tgt_t, t = x_t
                h_new, c_new, _ = attend_and_update(h, c, tgt_t, t)
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
            h_new, c_new, align_t = attend_and_update(h, c, targets, t)
            logits_t = h_new.astype(dt) @ w_gen_c + b_gen
            logits_t = self._mask_blank(logits_t.astype(jnp.float32))
            pred = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
            if use_sampling:
                # DELIBERATE divergence from the reference's scheduled
                # sampling (model.py:138-144): the reference argmaxes the
                # UNMASKED logits of a dropout-perturbed hidden state, so
                # it can feed <BLANK> back into the decoder early in joint
                # training; this feedback uses the blank-MASKED,
                # deterministic argmax — the token stream the model will
                # actually see at inference.  Trajectories under
                # sampling_prob > 0 therefore differ from the reference's
                # (documented in PARITY.md).
                # one coin per step for the whole batch, like the reference
                coin = jax.random.uniform(jax.random.fold_in(base_rng, 100_000 + t))
                next_targets = jnp.where(coin < self.sampling_prob, pred, teacher_t)
                out = h_new
            else:
                next_targets = pred
                out = (logits_t, align_t)
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
        logits_s, align_s = outs
        logits = jnp.transpose(logits_s, (1, 0, 2))  # [B, steps, V] greedy logits
        if return_alignment:
            return logits, jnp.transpose(align_s)  # + [B, steps] frame argmax
        return logits

    def _beam_search(
        self,
        attend_and_update,
        proj_H: jnp.ndarray,  # [B, T, H] hoisted attention keys
        bh: jnp.ndarray,  # [B, T, C] encoder states (attention values)
        w_gen_c: jnp.ndarray,  # [H, V]
        b_gen: jnp.ndarray,
        beam_width: int,
        steps: int,
        length_penalty: float,
        lm_logp: Optional[jnp.ndarray] = None,
        lm_weight: float = 0.0,
        return_alignment: bool = False,
    ):
        """Device-side beam search over the autoregressive decoder.

        The reference decodes greedily only (`/root/reference/model/model.py:91-112`);
        this is the framework's seq2seq counterpart of the CTC beam: one
        `lax.scan` carrying ``[B, K]`` hypotheses (cell state, cumulative
        log-prob, token history), expanding all ``K*V`` continuations per step
        and keeping the global top-K.  EOS-finished hypotheses are frozen:
        their only continuation is PAD at log-prob 0, so their score stops
        accumulating (matching `decode_tokens`' stop-at-EOS semantics).

        Returns ``(tokens [B, steps] int32, scores [B] float32)`` — the best
        hypothesis per row.  ``length_penalty`` rank-normalizes the FINAL
        winner selection by ``len**length_penalty`` (0 = pure sum, the
        greedy-comparable default), but ``scores`` is always the winner's
        RAW cumulative log-prob — `postprocess.decode_beam_row`'s
        per-character geometric-mean confidence depends on that.
        ``beam_width=1`` reproduces greedy decoding.

        ``lm_logp`` ([V, V] bigram ``log P(next | prev)``) enables shallow
        fusion: each step adds ``lm_weight * lm_logp[prev_token]`` to the
        model's log-probs before the top-K, steering near-tie hypotheses
        toward in-domain character sequences.  With fusion on, ``scores``
        is the fused objective (no longer a pure model log-prob).
        """
        batch, _, hidden = proj_H.shape
        lm_c = None
        if lm_logp is not None:
            lm_c = jnp.asarray(lm_logp, jnp.float32)
            if lm_c.shape != (w_gen_c.shape[1], w_gen_c.shape[1]):
                raise ValueError(
                    f"lm_logp must be [V, V] = {(w_gen_c.shape[1],) * 2}, "
                    f"got {lm_c.shape}"
                )
        vocab = w_gen_c.shape[1]
        K = beam_width
        dt = self.dtype
        neg_inf = jnp.float32(-1e30)

        # beam-major expansion: row b's hypotheses live at [b*K : (b+1)*K]
        keys_k = jnp.repeat(proj_H, K, axis=0)
        values_k = jnp.repeat(bh, K, axis=0)

        # finished beams may only emit PAD, at log-prob 0 (score frozen)
        pad_only = jnp.full((vocab,), neg_inf).at[self.pad_id].set(0.0)

        def step(carry, t):
            # the alignment history rides the carry only when requested —
            # loop carries are not reliably dead-code-eliminated, and the
            # plain beam is the serving hot path
            h, c, prev, cum, finished, hist = carry[:6]
            ahist = carry[6] if return_alignment else None
            h_new, c_new, align_t = attend_and_update(
                h, c, prev.reshape(batch * K), t, keys=keys_k, values=values_k
            )
            logits_t = h_new.astype(dt) @ w_gen_c + b_gen
            logits_t = self._mask_blank(logits_t.astype(jnp.float32))
            logp = jax.nn.log_softmax(logits_t, axis=-1).reshape(batch, K, vocab)
            if lm_c is not None:
                # shallow fusion: one [B, K] row-gather from the bigram
                # table per step rides the beam's existing top-k machinery
                logp = logp + jnp.float32(lm_weight) * lm_c[prev]
            logp = jnp.where(finished[:, :, None], pad_only, logp)
            total = cum[:, :, None] + logp  # [B, K, V]
            scores, idx = jax.lax.top_k(total.reshape(batch, K * vocab), K)
            parent = idx // vocab  # [B, K]
            tok = (idx % vocab).astype(jnp.int32)

            hk = h_new.reshape(batch, K, hidden)
            ck = c_new.reshape(batch, K, hidden)
            h_sel = jnp.take_along_axis(hk, parent[:, :, None], axis=1)
            c_sel = jnp.take_along_axis(ck, parent[:, :, None], axis=1)
            fin_sel = jnp.take_along_axis(finished, parent, axis=1)
            hist_sel = jnp.take_along_axis(hist, parent[:, :, None], axis=1)
            hist_new = hist_sel.at[:, :, t].set(tok)
            new_finished = fin_sel | (tok == self.eos_id)
            out = (
                h_sel.reshape(batch * K, hidden),
                c_sel.reshape(batch * K, hidden),
                tok,
                scores,
                new_finished,
                hist_new,
            )
            if return_alignment:
                # the alignment of a child hypothesis' step-t token is its
                # PARENT beam's attention argmax this step
                align_k = align_t.reshape(batch, K)
                al_sel = jnp.take_along_axis(align_k, parent, axis=1)
                ahist_sel = jnp.take_along_axis(ahist, parent[:, :, None], axis=1)
                out = out + (ahist_sel.at[:, :, t].set(al_sel),)
            return out, None

        init = (
            jnp.zeros((batch * K, hidden), jnp.float32),
            jnp.zeros((batch * K, hidden), jnp.float32),
            jnp.full((batch, K), self.sos_id, jnp.int32),
            # only beam 0 is live at t=0 (all K start identical otherwise)
            jnp.full((batch, K), neg_inf).at[:, 0].set(0.0),
            jnp.zeros((batch, K), bool),
            jnp.zeros((batch, K, steps), jnp.int32),
        )
        if return_alignment:
            init = init + (jnp.zeros((batch, K, steps), jnp.int32),)
        carry, _ = jax.lax.scan(step, init, jnp.arange(steps, dtype=jnp.int32))
        cum, hist = carry[3], carry[5]
        ahist = carry[6] if return_alignment else None

        rank = cum
        if length_penalty > 0.0:
            has_eos = (hist == self.eos_id).any(axis=-1)
            first_eos = jnp.argmax(hist == self.eos_id, axis=-1)
            lengths = jnp.where(has_eos, first_eos + 1, steps).astype(jnp.float32)
            rank = cum / (lengths**length_penalty)
        best = jnp.argmax(rank, axis=1)
        tokens = jnp.take_along_axis(hist, best[:, None, None], axis=1)[:, 0]
        score = jnp.take_along_axis(cum, best[:, None], axis=1)[:, 0]
        if return_alignment:
            align = jnp.take_along_axis(ahist, best[:, None, None], axis=1)[:, 0]
            return tokens, score, align
        return tokens, score
