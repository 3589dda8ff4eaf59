"""The full text-line recognition model: SE-ResNet31 -> BiLSTM -> heads.

Reference contract (`/root/reference/model/model.py:166-227`):

* ``encode``: CNN -> average over the height axis (AdaptiveAvgPool2d((1,None)))
  -> [B, T=W/8, 512] -> 2x BiLSTM(512->256->256) -> dropout(0.1).
* ``__call__``: encode + attention decode (teacher-forced when ``text`` is
  given and ``train``, greedy otherwise).

Additions over the reference: a first-class CTC head (Linear on the encoder
states) sharing the same encoder — the reference shipped only dead CTC
utilities (`/root/reference/training/utils.py:122-162`) that this framework
resurrects as a live capability.

Inputs are NHWC float images normalized to [-1, 1].
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from rcnn_ocr_tpu.models.attention import AttentionDecoder
from rcnn_ocr_tpu.models.lstm import BiLSTM
from rcnn_ocr_tpu.models.seresnet31 import SEResNet31

Dtype = Any

# encoder time steps per input width: T = W / TIME_DOWNSAMPLE (three
# stride-2 width reductions through the backbone; the out-head convs are
# width-preserving at these paddings) — consumed by CTC-aware width
# bucketing (data/loader.py:lift_buckets_for_ctc)
TIME_DOWNSAMPLE = 8


class RCNN(nn.Module):
    """SE-ResNet31 + BiLSTM encoder with attention and/or CTC heads.

    The class name follows the reference's (confusing) naming for
    discoverability; the architecture is CNN + BiLSTM + seq2seq attention.
    """

    num_classes: int
    hidden_size: int = 256
    sos_id: int = 1
    eos_id: int = 2
    pad_id: int = 0
    blank_id: Optional[int] = None
    enc_dropout_p: float = 0.1
    dropblock_p: float = 0.0
    dropblock_block_size: int = 5
    sampling_prob: float = 0.0
    with_attention_head: bool = True
    with_ctc_head: bool = False
    # NOT read by the model (the CTC head is a plain projection — blank
    # semantics live in the loss/decode utilities, which take the id as
    # an explicit argument).  Accepted so call sites can configure the
    # whole decode contract in one place; do not expect changing it to
    # alter the forward pass.
    ctc_blank_id: int = 0
    lstm_layers: int = 2  # encoder BiLSTM depth (HPO: "LSTM 2 512" variants)
    width_mult: float = 1.0  # CNN width multiplier (HPO / tiny-test knob)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    quantize: bool = False  # int8 inference for the wide conv stages
    act_quant: str = "dynamic"  # "static" after calibration (quant_stats)
    quantize_stem: bool = False  # int8 stem too (viable with act_quant static)
    stem_s2d: bool = False  # s2d stem conv rewrite (measured slower on v5e)

    def setup(self):
        self.cnn = SEResNet31(
            out_channels=512,
            width_mult=self.width_mult,
            dropblock_p=self.dropblock_p,
            dropblock_block_size=self.dropblock_block_size,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            quantize=self.quantize,
            act_quant=self.act_quant,
            quantize_stem=self.quantize_stem,
            stem_s2d=self.stem_s2d,
            name="cnn",
        )
        self.enc_rnns = tuple(
            BiLSTM(
                self.hidden_size,
                self.hidden_size,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name=f"enc_rnn{i}",
            )
            for i in range(self.lstm_layers)
        )
        self.enc_dropout = nn.Dropout(rate=self.enc_dropout_p)
        if self.with_attention_head:
            self.attn = AttentionDecoder(
                num_classes=self.num_classes,
                hidden_size=self.hidden_size,
                sos_id=self.sos_id,
                eos_id=self.eos_id,
                pad_id=self.pad_id,
                blank_id=self.blank_id,
                dropout_p=0.1,
                sampling_prob=self.sampling_prob,
                dtype=self.dtype,
                name="attn",
            )
        if self.with_ctc_head:
            self.ctc_proj = nn.Dense(
                self.num_classes,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="ctc_proj",
            )

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """NHWC image batch -> [B, T=W/8, hidden] encoder states."""
        f = self.cnn(x, train=train)  # [B, H', W', 512]
        f = jnp.mean(f.astype(jnp.float32), axis=1)  # height collapse -> [B, W', 512]
        f = f.astype(self.dtype)
        for rnn in self.enc_rnns:
            f = rnn(f)
        if train and self.enc_dropout_p > 0.0:
            f = self.enc_dropout(f, deterministic=False)
        return f

    def ctc_logits(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """CTC head: per-frame class logits [B, T, V] over the encoder states."""
        enc = self.encode(x, train=train)
        return self.ctc_proj(enc).astype(jnp.float32)

    def __call__(
        self,
        x: jnp.ndarray,
        text: Optional[jnp.ndarray] = None,
        train: bool = True,
        batch_max_length: int = 25,
    ) -> jnp.ndarray:
        enc = self.encode(x, train=train)
        return self.attn(enc, text=text, train=train, batch_max_length=batch_max_length)

    def greedy_decode_aligned(
        self, x: jnp.ndarray, batch_max_length: int = 25
    ):
        """Greedy decode that also returns the attention alignment.

        Returns ``(logits [B, steps, V], align [B, steps] int32)`` where
        ``align[b, t]`` is the encoder frame the decoder attended to
        hardest when emitting step ``t`` — the per-character x-position
        long-line stitching consumes (`long_lines.py`).  The logits are
        bit-identical to ``__call__(train=False)``.
        """
        enc = self.encode(x, train=False)
        return self.attn(
            enc, train=False, batch_max_length=batch_max_length,
            return_alignment=True,
        )

    def beam_decode(
        self,
        x: jnp.ndarray,
        beam_width: int = 5,
        batch_max_length: int = 25,
        length_penalty: float = 0.0,
        lm_logp=None,
        lm_weight: float = 0.0,
        return_alignment: bool = False,
    ):
        """Beam-search decode for the attention head (framework-plus).

        The reference's seq2seq decode is greedy-only
        (`/root/reference/model/model.py:91-112`); this explores
        ``beam_width`` hypotheses fully on device and returns
        ``(tokens [B, steps], scores [B])`` — see
        ``AttentionDecoder._beam_search``.
        """
        enc = self.encode(x, train=False)
        return self.attn(
            enc,
            train=False,
            batch_max_length=batch_max_length,
            beam_width=beam_width,
            length_penalty=length_penalty,
            lm_logp=lm_logp,
            lm_weight=lm_weight,
            return_alignment=return_alignment,
        )

    def init_all(
        self,
        x: jnp.ndarray,
        text: Optional[jnp.ndarray] = None,
        batch_max_length: int = 25,
    ):
        """Initialization entry point touching every configured head.

        Flax creates parameters lazily on first use, so ``model.init`` must
        trace a path through *all* heads or the untouched head's params
        would be missing from the variables tree.
        """
        enc = self.encode(x, train=False)
        outs = []
        if self.with_attention_head:
            outs.append(
                self.attn(enc, text=text, train=False, batch_max_length=batch_max_length)
            )
        if self.with_ctc_head:
            outs.append(self.ctc_proj(enc))
        return tuple(outs)

    def eval_outputs(
        self,
        x: jnp.ndarray,
        text: Optional[jnp.ndarray] = None,
        batch_max_length: int = 25,
        with_attention: bool = True,
        with_ctc: bool = False,
    ):
        """Single-encode validation forward: every eval output from ONE
        encoder pass.

        The reference validates with two full forward passes — one
        teacher-forced for the loss, one greedy for the decoded metrics
        (`/root/reference/training/train.py:554-576`).  At eval time the
        model is deterministic (no dropout, BN running stats), so the
        encoder output is IDENTICAL across those passes; running the 42M-
        param CNN+BiLSTM once and feeding the cached states to the
        teacher-forced decoder, the greedy decoder, and the CTC projection
        preserves the two-pass contract bit-for-bit at a third to half the
        FLOPs (head="both" previously encoded three times per val batch).

        Returns a dict with (per configured head): ``tf_logits`` (teacher-
        forced, needs ``text``), ``greedy_logits``, ``ctc_logits``.
        """
        enc = self.encode(x, train=False)
        out = {}
        if with_attention:
            if text is not None:
                out["tf_logits"] = self.attn(
                    enc, text=text, train=False, batch_max_length=batch_max_length
                )
            out["greedy_logits"] = self.attn(
                enc, train=False, batch_max_length=batch_max_length
            )
        if with_ctc:
            out["ctc_logits"] = self.ctc_proj(enc).astype(jnp.float32)
        return out

    def forward_both(
        self,
        x: jnp.ndarray,
        text: Optional[jnp.ndarray] = None,
        train: bool = True,
        batch_max_length: int = 25,
    ):
        """Shared-encoder forward returning (attention_logits, ctc_logits)."""
        enc = self.encode(x, train=train)
        attn_logits = self.attn(
            enc, text=text, train=train, batch_max_length=batch_max_length
        )
        ctc = self.ctc_proj(enc).astype(jnp.float32)
        return attn_logits, ctc
