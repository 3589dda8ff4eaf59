"""Batched OCR inference API.

API parity with the reference engine (`/root/reference/inference.py:12-195`):
``OCRInference(model_path, charset_path, device, img_h, img_w)`` with
``predict(images, max_length, batch_size, return_confidence)`` accepting a
path / ndarray / PIL image or a list thereof and returning decoded strings
(optionally with a confidence = mean max-softmax over non-PAD/EOS steps).

TPU-native differences:

* checkpoints load from this framework's msgpack slots *or* directly from
  any of the reference's three ``.pth`` layouts (via
  `rcnn_ocr_tpu.interop`) — a reference user can point this class at their
  existing checkpoint;
* batches are padded to a static batch size and decoded under `jax.jit`
  (one compilation per (batch, height, width, steps) signature, cached);
* optional width bucketing: instead of one fixed ``img_w``, images can be
  grouped into a few static widths so the pad waste shrinks while XLA
  still never recompiles on the hot path;
* a CTC decode path (greedy on device, beam search via the native C++
  kernel) when the checkpoint carries a CTC head;
* multi-chip serving: ``OCRInference(..., mesh=True)`` (or an explicit
  ``jax.sharding.Mesh``) replicates the params across the mesh and shards
  every batch over the data axis — pure data-parallel decode with no
  forward-path collectives, scaling throughput ~linearly with chips.
  Batch sizes round up to tile the mesh evenly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from rcnn_ocr_tpu.data.transforms import ResizeAndPad, load_rgb_uint8
from rcnn_ocr_tpu.models import RCNN
from rcnn_ocr_tpu.ops.augment import device_normalize
from rcnn_ocr_tpu.ops.ctc import ctc_beam_search, ctc_greedy_decode_jnp, ids_to_text


def long_line_spans(
    starts: Sequence[int],
    tile_w: int,
    frames_t: int,
    blank_scores: Optional[np.ndarray] = None,  # [n_tiles, frames_t]
) -> List[Tuple[int, int, int]]:
    """Per-tile kept frame ranges for long-line CTC stitching.

    ``starts`` are tile x-offsets in the height-normalized image (strictly
    increasing, consecutive tiles overlapping).  Each junction's overlap
    is split so every encoder frame of the full line is represented
    exactly once (up to frame-stride rounding): at the overlap MIDPOINT
    by default, or — when ``blank_scores`` (per-tile per-frame blank
    log-probs) is given — at the most blank-dominant shared frame, so the
    cut lands between characters instead of through one (a character
    straddling a midpoint cut loses frames on both sides and drops from
    the decode; measured on the synthetic long-line demo, PERF.md).
    Returns ``(tile_index, frame_from, frame_to)`` per tile — the
    contract `tests/test_long_lines.py` pins down.
    """
    stride = tile_w / frames_t
    cuts = []  # per junction: global CUT frame (left keeps < cut)
    for j in range(1, len(starts)):
        g_right = starts[j] / stride  # right tile's first global frame
        g_left_end = starts[j - 1] / stride + frames_t
        lo = int(np.ceil(g_right)) + 1  # keep >= 1 frame in the right tile
        hi = int(np.floor(g_left_end)) - 1  # and >= 1 in the left
        mid = int(round((g_right + g_left_end) / 2))
        cut = min(max(mid, lo), hi)
        if blank_scores is not None and hi > lo:
            g0 = int(round(starts[j - 1] / stride))
            g1 = int(round(g_right))
            best, best_score = cut, -np.inf
            for g in range(lo, hi + 1):
                fl, fr = g - g0, g - g1  # frame index in left/right tile
                score = 0.0
                if 0 <= fl < frames_t:
                    score += float(blank_scores[j - 1, fl])
                if 0 <= fr < frames_t:
                    score += float(blank_scores[j, fr])
                if score > best_score:
                    best, best_score = g, score
            cut = best
        cuts.append(cut)

    spans = []
    for j, s in enumerate(starts):
        g0 = int(round(s / stride))
        f_from = 0 if j == 0 else min(max(cuts[j - 1] - g0, 0), frames_t - 1)
        f_to = frames_t if j + 1 == len(starts) else min(
            max(cuts[j] - g0, f_from + 1), frames_t
        )
        spans.append((j, f_from, f_to))
    return spans
from rcnn_ocr_tpu.vocab.charset import Charset

ImageLike = Union[np.ndarray, str, "Any"]


def infer_architecture(params: Dict[str, Any]) -> Dict[str, Any]:
    """Derive model hyperparameters from a parameter tree.

    Works for any checkpoint layout (incl. bare weights with no config):
    hidden size from the encoder BiLSTM, LSTM depth from the enc_rnn*
    count, CNN width multiplier from the stem width.
    """
    arch: Dict[str, Any] = {}
    rnn_names = sorted(k for k in params if k.startswith("enc_rnn"))
    if rnn_names:
        arch["lstm_layers"] = len(rnn_names)
        w_hh = params[rnn_names[0]]["w_hh"]
        arch["hidden_size"] = int(np.asarray(w_hh).shape[1])
    if "cnn" in params:
        # derive the width multiplier from the widest stage (nominal 512):
        # narrow stages hit the min-width floor and are not invertible
        l3 = params["cnn"]["layer3_block0"]["conv1"]["conv"]["kernel"]
        arch["width_mult"] = float(np.asarray(l3).shape[-1]) / 512.0
    if "attn" in params:
        arch["num_classes"] = int(np.asarray(params["attn"]["b_gen"]).shape[0])
    elif "ctc_proj" in params:
        arch["num_classes"] = int(np.asarray(params["ctc_proj"]["bias"]).shape[0])
    arch["with_attention_head"] = "attn" in params
    arch["with_ctc_head"] = "ctc_proj" in params
    return arch


class OCRInference:
    """Load a checkpoint and recognize text lines."""

    def __init__(
        self,
        model_path: str,
        charset_path: Optional[str] = None,
        device: str = "auto",  # accepted for API parity; JAX picks the backend
        img_h: Optional[int] = None,  # None: checkpoint's training size, else 64
        img_w: Optional[int] = None,  # None: checkpoint's training size, else 256
        hidden_size: Optional[int] = None,
        dtype: Any = jnp.bfloat16,
        width_buckets: Optional[Union[Sequence[int], str]] = None,
        with_ctc_head: Optional[bool] = None,
        quantize: bool = False,  # int8 inference for the wide conv stages
        mesh: Any = None,  # True: all devices data-parallel; or a jax Mesh
        verbose: bool = True,
        lm: Any = None,  # [V,V] bigram log-prob table or .npz path (tools/train_lm.py)
    ):
        self.model_path = model_path
        self._lm_src = lm  # resolved after the charset loads
        self._lm: Optional[np.ndarray] = None
        # width_buckets="auto" / "auto:K": defer to the first predict* call
        # with a list — the K waste-minimizing widths are derived from that
        # batch's aspect ratios (the same DP the training loop and eval CLI
        # use) and fixed for the instance lifetime
        self._auto_bucket_k = 0
        if isinstance(width_buckets, str):
            if not width_buckets.startswith("auto"):
                raise ValueError(f"width_buckets: unknown spec {width_buckets!r}")
            self._auto_bucket_k = (
                int(width_buckets.split(":")[1]) if ":" in width_buckets else 4
            )
            width_buckets = None
        self.width_buckets = sorted(width_buckets) if width_buckets else None
        self._dtype = dtype
        # multi-chip serving: params replicated, batches sharded over the
        # mesh's data axis — XLA runs each shard on its own chip with no
        # collectives on the forward path (pure DP; ICI only for the
        # replicated-param broadcast at load time)
        self._mesh = None
        if mesh is not None and mesh is not False:
            from jax.sharding import Mesh

            from rcnn_ocr_tpu.parallel.mesh import (
                batch_sharding,
                make_mesh,
                replicated_sharding,
            )

            self._mesh = mesh if isinstance(mesh, Mesh) else make_mesh()
            self._rep = replicated_sharding(self._mesh)
            self._data_sh = batch_sharding(self._mesh)
        # per-instance jit cache (an lru_cache on bound methods would pin
        # the instance + its device arrays for the process lifetime — a
        # leak in long-lived servers)
        self._jit_cache: Dict[Tuple, Any] = {}
        self._verbose = verbose

        variables, meta = self._load_variables(model_path)
        # default to the size the checkpoint was trained at (a full ckpt
        # records it) — the reference silently used 64x256 and misread
        # models trained at other sizes
        ckpt_cfg = meta.get("config") or {}
        self.img_h = int(img_h if img_h is not None else ckpt_cfg.get("img_h", 64))
        self.img_w = int(img_w if img_w is not None else ckpt_cfg.get("img_w", 256))
        img_h, img_w = self.img_h, self.img_w

        if charset_path is not None:
            self.charset = Charset.from_file(charset_path)
        elif meta.get("itos"):
            self.charset = Charset.from_tokens(meta["itos"])
        else:
            raise ValueError("charset_path required (checkpoint has no embedded charset)")

        arch = infer_architecture(variables.get("params", {}))
        if hidden_size is None:
            hidden_size = meta.get("hidden_size") or arch.get("hidden_size") or 256
        if with_ctc_head is None:
            with_ctc_head = arch.get("with_ctc_head", False)

        self._model_kwargs = dict(
            # a checkpoint carrying calibrated scales resumes the static
            # int8 path directly — no re-calibration on process start
            act_quant=(
                "static" if (quantize and "quant_stats" in variables) else "dynamic"
            ),
            num_classes=self.charset.num_classes,
            hidden_size=int(hidden_size),
            sos_id=self.charset.sos_id,
            eos_id=self.charset.eos_id,
            pad_id=self.charset.pad_id,
            blank_id=self.charset.blank_id,
            with_attention_head=arch.get("with_attention_head", True),
            with_ctc_head=with_ctc_head,
            ctc_blank_id=self.charset.ctc_blank_id,
            lstm_layers=arch.get("lstm_layers", 2),
            width_mult=arch.get("width_mult", 1.0),
            quantize=quantize,
            dtype=dtype,
        )
        self.model = RCNN(**self._model_kwargs)
        self.variables = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, variables),
            self._rep if self._mesh is not None else None,
        )
        self._itos = list(self.charset.itos)  # decode loops reuse one copy
        if self._lm_src is not None:
            # bigram LM for beam shallow fusion (rcnn_ocr_tpu/lm.py): a
            # path validates its token order against the engine charset
            from rcnn_ocr_tpu.lm import load_lm

            self._lm = (
                load_lm(self._lm_src, self.charset)
                if isinstance(self._lm_src, str)
                else np.asarray(self._lm_src, np.float32)
            )
            V = self.charset.num_classes
            if self._lm.shape != (V, V):
                raise ValueError(
                    f"lm must be [{V}, {V}] for this charset, got {self._lm.shape}"
                )
        # host side only resize-pads to uint8; every decode kernel starts
        # with device_normalize, so the host->device link carries 4x fewer
        # bytes with bit-identical numerics (fp32 normalize either side)
        self.transform = ResizeAndPad(img_h=img_h, img_w=img_w)
        self._bucket_transforms = (
            {w: ResizeAndPad(img_h=img_h, img_w=w) for w in self.width_buckets}
            if self.width_buckets
            else None
        )

        if verbose:
            print(f"OCR model loaded on {jax.devices()[0].platform}")
            print(f"Charset size: {self.charset.num_classes} symbols")
            print(f"Input image size: {img_h}x{img_w}")

    # -- checkpoint loading ------------------------------------------------
    @staticmethod
    def _load_variables(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        if path.endswith((".pth", ".pt")):
            from rcnn_ocr_tpu.interop import import_torch_checkpoint

            out = import_torch_checkpoint(path)
            return out["variables"], out
        from rcnn_ocr_tpu.training.checkpoint import load_variables

        variables, blob = load_variables(path)
        meta = {
            "itos": blob.get("itos"),
            "hidden_size": (blob.get("config") or {}).get("hidden_size"),
            "config": blob.get("config"),
        }
        return variables, meta

    # -- preprocessing -----------------------------------------------------
    def _to_rgb(self, image: ImageLike) -> np.ndarray:
        # shared canonicalization (incl. the 0..255-scaled-float contract
        # for non-uint8 ndarrays) — see data.transforms.load_rgb_uint8
        return load_rgb_uint8(image)

    def _preprocess(self, image: ImageLike, width: Optional[int] = None) -> np.ndarray:
        rgb = self._to_rgb(image)
        if width is not None and self._bucket_transforms:
            return self._bucket_transforms[width](rgb)
        return self.transform(rgb)

    # -- jitted decode kernels (cached per static signature) ---------------
    def _cached(self, key: Tuple, build) -> Any:
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = build()
        return fn

    def _jit(self, fn, n_batch_args: int = 1):
        """jit a (variables, *batch_arrays) kernel; on a mesh, pin params
        replicated and every batch arg + output sharded on the data axis."""
        if self._mesh is None:
            return jax.jit(fn)
        return jax.jit(
            fn,
            in_shardings=(self._rep,) + (self._data_sh,) * n_batch_args,
            out_shardings=self._data_sh,
        )

    def _round_batch(self, batch_size: int) -> int:
        """Sharded batch dims must tile the data axis evenly."""
        if self._mesh is None:
            return batch_size
        from rcnn_ocr_tpu.parallel.mesh import data_axis

        n = int(self._mesh.shape[data_axis(self._mesh)])
        return max(n, -(-batch_size // n) * n)

    def _device_batch(self, arr: np.ndarray):
        if self._mesh is not None:
            return jax.device_put(arr, self._data_sh)
        return jnp.asarray(arr)

    def _greedy_fn(self, steps: int):
        def build():
            def run(variables, images):
                logits = self.model.apply(
                    variables, device_normalize(images), train=False,
                    batch_max_length=steps - 1,
                )
                probs = jax.nn.softmax(logits, axis=-1)
                pred = jnp.argmax(logits, axis=-1)
                maxp = jnp.max(probs, axis=-1)
                return pred, maxp

            return self._jit(run)

        return self._cached(("greedy", steps), build)

    def _attn_beam_fn(
        self,
        steps: int,
        beam_width: int,
        length_penalty: float,
        lm_weight: float = 0.0,
    ):
        """Attention-head beam search kernel (fully on device).

        The reference decodes its seq2seq head greedily only
        (`/root/reference/model/model.py:91-112`); this kernel explores
        ``beam_width`` hypotheses per row in one fused program
        (`models/attention.py:_beam_search`) and ships back the best token
        sequence + its cumulative log-prob.  ``lm_weight`` > 0 bakes the
        engine's bigram table into the kernel for shallow fusion."""
        lm = self._fusion_lm(lm_weight)

        def build():
            def run(variables, images):
                return self.model.apply(
                    variables, device_normalize(images),
                    beam_width=beam_width,
                    batch_max_length=steps - 1,
                    length_penalty=length_penalty,
                    lm_logp=lm,
                    lm_weight=lm_weight,
                    method=self.model.beam_decode,
                )

            return self._jit(run)

        return self._cached(
            ("attn_beam", steps, beam_width, length_penalty, lm_weight), build
        )

    def _fusion_lm(self, lm_weight: float):
        """The bigram table to fuse at this weight (None = fusion off)."""
        if not lm_weight:
            return None
        if self._lm is None:
            raise ValueError(
                "lm_weight > 0 needs a bigram table: pass lm= to OCRInference "
                "(build one with tools/train_lm.py)"
            )
        return self._lm

    def _ctc_fn(self, greedy: bool, prune_k: int = 0):
        """CTC head kernel.  ``greedy``: on-device collapse -> tokens.
        Beam mode ships frame log-probs to the host beam search; with
        ``prune_k`` > 0 only the top-k candidates per frame cross the
        device->host link (k=16 at vocab 194 is ~12x less traffic, and
        candidate pruning at k >= beam width leaves prefix beam search
        results unchanged in practice — the dropped tail is ~e^-10)."""

        def build():
            def run(variables, images):
                logits = self.model.apply(
                    variables, device_normalize(images), train=False,
                    method=self.model.ctc_logits,
                )
                if greedy:
                    tokens, valid = ctc_greedy_decode_jnp(
                        logits, self.charset.ctc_blank_id
                    )
                    return tokens, valid
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                if prune_k:
                    vals, idx = jax.lax.top_k(log_probs, prune_k)
                    return vals, idx.astype(jnp.int32)
                return log_probs

            return self._jit(run)

        return self._cached(("ctc", greedy, prune_k), build)

    def _ctc_beam_device_fn(
        self, beam_width: int, prune_k: int, lm_weight: float = 0.0
    ):
        """Whole-beam-on-device kernel: encoder -> CTC log-probs -> top-k
        frame pruning -> vectorized prefix beam search, one jit.  Only the
        final [B, T] labels + lengths cross the device->host link (the host
        path ships [B, T, k] frames and loops the search on one core).
        ``lm_weight`` > 0 fuses the engine's bigram LM on label extensions
        (`ops/ctc.py:ctc_beam_search_jax`)."""
        lm = self._fusion_lm(lm_weight)

        def build():
            from rcnn_ocr_tpu.ops.ctc import ctc_beam_search_jax

            def run(variables, images):
                logits = self.model.apply(
                    variables, device_normalize(images), train=False,
                    method=self.model.ctc_logits,
                )
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                vals, idx = jax.lax.top_k(log_probs, prune_k)
                labels, lens, _ = ctc_beam_search_jax(
                    vals, idx.astype(jnp.int32),
                    blank_id=self.charset.ctc_blank_id,
                    beam_width=beam_width,
                    lm_logp=lm,
                    lm_weight=lm_weight,
                    sos_id=self.charset.sos_id,
                )
                return labels, lens

            return self._jit(run)

        return self._cached(
            ("ctc_beam_dev", beam_width, prune_k, lm_weight), build
        )

    # -- static activation calibration --------------------------------------
    def calibrate(self, images: Union[ImageLike, List[ImageLike]], batch_size: int = 32) -> None:
        """Post-training calibration: switch the int8 path to STATIC
        activation scales recorded from sample data.

        The dynamic int8 path (the ``quantize=True`` default) computes a
        per-call abs-max over every quantized conv input — a full-tensor
        reduction barrier that forces the activation through HBM in float.
        With calibrated static scales the quantize-to-int8 step is purely
        elementwise and fuses into the previous conv's epilogue, so hot
        activations cross HBM once, as int8.

        Call once with a representative sample (>= a few dozen images);
        subsequent ``predict*`` calls use the static path.  Inputs outside
        the calibrated range clip at ±127 · scale.
        """
        if not self.model.quantize:
            raise ValueError("calibrate() requires OCRInference(quantize=True)")
        images_list: List[ImageLike] = (
            [images] if not isinstance(images, list) else list(images)
        )
        if not images_list:
            raise ValueError("calibration needs at least one image")
        calib_model = RCNN(**{**self._model_kwargs, "act_quant": "static"})
        batch_size = self._round_batch(batch_size)

        def record(variables, batch):
            _, mutated = calib_model.apply(
                variables,
                device_normalize(batch),
                train=False,
                method=calib_model.encode,
                mutable=["quant_stats"],
            )
            return mutated["quant_stats"]

        # seed a zero quant_stats collection up front (via eval_shape — no
        # compile) so every loop iteration passes the SAME pytree structure
        # to the jitted recorder; without it the second chunk retraces
        # (remote compiles here are minutes each)
        batch_spec = jax.ShapeDtypeStruct(
            (batch_size, self.img_h, self.img_w, 3), jnp.uint8
        )
        stats_shapes = jax.eval_shape(record, dict(self.variables), batch_spec)
        zero_stats = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), stats_shapes
        )

        if self._mesh is None:
            record = jax.jit(record)
        else:
            # abs-max stats are scalars: replicated out, batch sharded in
            record = jax.jit(
                record,
                in_shardings=(self._rep, self._data_sh),
                out_shardings=self._rep,
            )

        variables = {**self.variables, "quant_stats": zero_stats}
        for i in range(0, len(images_list), batch_size):
            chunk = images_list[i : i + batch_size]
            arrays, _ = self._pad_rows(
                [self._preprocess(img) for img in chunk], batch_size
            )
            stats = record(variables, self._device_batch(np.stack(arrays)))
            variables = {**variables, "quant_stats": stats}

        self.variables = variables
        self.model = calib_model
        self._jit_cache.clear()  # decode kernels must re-trace the static path

    def save_calibration(self, path: str) -> None:
        """Persist the calibrated static-int8 scales: writes a copy of the
        source checkpoint with ``quant_stats`` embedded.  Re-opening that
        file with ``OCRInference(..., quantize=True)`` activates the static
        path directly — no re-calibration on process start."""
        if "quant_stats" not in self.variables:
            raise ValueError("no calibration recorded; call calibrate() first")
        from flax import serialization

        from rcnn_ocr_tpu.training.checkpoint import load_checkpoint_blob

        host = jax.tree_util.tree_map(np.asarray, self.variables)
        if self.model_path.endswith((".pth", ".pt")):
            # torch sources have no msgpack blob to copy — embed what this
            # engine already knows so the file re-opens standalone
            from rcnn_ocr_tpu.training.checkpoint import CHECKPOINT_FORMAT_VERSION

            blob: Dict[str, Any] = {
                "format_version": CHECKPOINT_FORMAT_VERSION,
                "itos": list(self.charset.itos),
                "stoi": {str(k): int(v) for k, v in self.charset.stoi.items()},
                "config": {
                    "img_h": self.img_h,
                    "img_w": self.img_w,
                    "hidden_size": self._model_kwargs["hidden_size"],
                },
            }
        else:
            blob = dict(load_checkpoint_blob(self.model_path))
        blob["params"] = serialization.to_state_dict(host["params"])
        blob["batch_stats"] = serialization.to_state_dict(
            host.get("batch_stats", {})
        )
        blob["quant_stats"] = serialization.to_state_dict(host["quant_stats"])
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(blob))
        os.replace(tmp, path)

    # -- public API --------------------------------------------------------
    def _decode_attention_row(
        self, pred_row: np.ndarray, maxp_row, return_confidence: bool
    ):
        """One attention-decoded row -> text (or (text, confidence)).

        Thin binding over :func:`rcnn_ocr_tpu.postprocess.decode_attention_row`
        — the ONE definition shared by ``predict``, ``predict_serving`` and
        exported artifacts, so the confidence contract (mean max-softmax
        over non-PAD/EOS steps) cannot diverge."""
        from rcnn_ocr_tpu.postprocess import decode_attention_row

        return decode_attention_row(
            pred_row,
            maxp_row,
            self._itos,
            pad_id=self.charset.pad_id,
            eos_id=self.charset.eos_id,
            blank_id=self.charset.blank_id,
            return_confidence=return_confidence,
        )

    def _decode_beam_row(self, pred_row: np.ndarray, score, return_confidence: bool):
        """Thin binding over :func:`rcnn_ocr_tpu.postprocess.decode_beam_row`
        — the ONE beam-confidence definition shared by ``predict``,
        ``predict_serving`` and exported artifacts."""
        from rcnn_ocr_tpu.postprocess import decode_beam_row

        return decode_beam_row(
            pred_row,
            score,
            self._itos,
            pad_id=self.charset.pad_id,
            eos_id=self.charset.eos_id,
            blank_id=self.charset.blank_id,
            return_confidence=return_confidence,
        )

    def _bucketize(self, images_list: List[ImageLike]) -> List[Tuple[int, Optional[int]]]:
        """Assign each image its width bucket (None = single fixed width).

        Width bucketing (SURVEY.md §5.7): decode each image at the smallest
        static width its aspect ratio needs, so XLA compiles once per
        bucket and right-pad waste shrinks versus one global ``img_w``.
        """
        self._resolve_auto_buckets(images_list)
        if not self.width_buckets:
            return [(i, None) for i in range(len(images_list))]
        from rcnn_ocr_tpu.data.loader import bucket_for_width, scaled_width

        out = []
        for i, img in enumerate(images_list):
            h, w = self._probe_hw(img)
            out.append(
                (i, bucket_for_width(scaled_width(h, w, self.img_h), self.width_buckets))
            )
        return out

    def _bucket_chunks(
        self, images_list: List[ImageLike], batch_size: int
    ) -> List[Tuple[Optional[int], List[int]]]:
        """Bucketize, then split each bucket's image indices into chunks.

        The one grouping/chunking policy shared by ``predict``,
        ``predict_ctc``, ``predict_serving`` and exported artifacts
        (`rcnn_ocr_tpu.postprocess.chunk_indices`) — each chunk decodes at
        its bucket's static width, so the jit cache holds at most
        ``len(width_buckets)`` shapes per kernel."""
        from rcnn_ocr_tpu.postprocess import chunk_indices

        groups: Dict[Optional[int], List[int]] = {}
        for idx, bucket in self._bucketize(images_list):
            groups.setdefault(bucket, []).append(idx)
        return chunk_indices(groups, batch_size)

    @staticmethod
    def _pad_rows(rows: List[Any], batch_size: int) -> Tuple[List[Any], int]:
        """Pad a short chunk to the static batch by repeating the last row
        (shared contract: `rcnn_ocr_tpu.postprocess.pad_rows`)."""
        from rcnn_ocr_tpu.postprocess import pad_rows

        return pad_rows(rows, batch_size)

    def _probe_hw(self, img: ImageLike) -> Tuple[int, int]:
        """(h, w) of an input without decoding it — header-probe for paths
        (the one full decode happens downstream in _preprocess /
        letterbox_chunk), in-place shape reads for decoded inputs."""
        from rcnn_ocr_tpu.data.transforms import image_size

        if isinstance(img, str):
            if not os.path.exists(img):
                raise FileNotFoundError(f"Image file not found: {img}")
            return image_size(img)
        if isinstance(img, np.ndarray):
            return int(img.shape[0]), int(img.shape[1])
        if hasattr(img, "size") and hasattr(img, "convert"):  # PIL
            w, h = img.size
            return int(h), int(w)
        shp = self._to_rgb(img).shape
        return int(shp[0]), int(shp[1])

    def _resolve_auto_buckets(self, images_list: List[ImageLike]) -> None:
        """First call with data resolves ``width_buckets="auto:K"`` (the
        training loop's waste-minimizing DP over this batch's widths)."""
        if not self._auto_bucket_k or self.width_buckets or not images_list:
            return
        from rcnn_ocr_tpu.data.loader import optimal_width_buckets, scaled_width

        scaled = []
        for img in images_list:
            h, w = self._probe_hw(img)
            scaled.append(scaled_width(h, w, self.img_h))
        self.width_buckets = optimal_width_buckets(
            scaled, self._auto_bucket_k, multiple=8, max_width=self.img_w
        )
        self._bucket_transforms = {
            w: ResizeAndPad(img_h=self.img_h, img_w=w) for w in self.width_buckets
        }
        if self._verbose:
            print(
                f"Auto width buckets (k={self._auto_bucket_k}): "
                f"{self.width_buckets} (from {len(scaled)} images)"
            )

    def predict(
        self,
        images: Union[ImageLike, List[ImageLike]],
        max_length: int = 25,
        batch_size: int = 32,
        return_confidence: bool = False,
        beam_width: Optional[int] = None,
        length_penalty: float = 0.0,
        lm_weight: float = 0.0,
    ):
        """Attention decode: greedy, or beam search when ``beam_width`` > 1.

        Beam mode (framework-plus; the reference is greedy-only) runs the
        whole search on device and returns the best hypothesis per image.
        With ``return_confidence`` the beam's confidence is the geometric
        mean of the emitted tokens' probabilities (``exp(logprob / len)``)
        — the beam's analogue of the greedy path's mean max-softmax.
        ``lm_weight`` > 0 shallow-fuses the engine's bigram LM
        (``OCRInference(lm=...)``) into the beam's step scores.
        """
        if not self.model.with_attention_head:
            raise ValueError(
                "this checkpoint has no attention head; use predict_ctc()"
            )
        is_single = not isinstance(images, list)
        images_list: List[ImageLike] = [images] if is_single else list(images)
        if not images_list:
            return []
        steps = max_length + 1
        batch_size = self._round_batch(batch_size)
        beam = beam_width is not None and beam_width > 1
        if lm_weight and not beam:
            raise ValueError("lm_weight requires beam_width > 1 (fusion is beam-only)")
        if length_penalty and not beam:
            raise ValueError(
                "length_penalty requires beam_width > 1 (rank normalization "
                "is beam-only)"
            )
        run = (
            self._attn_beam_fn(steps, int(beam_width), length_penalty, lm_weight)
            if beam
            else self._greedy_fn(steps)
        )

        results: List[Any] = [None] * len(images_list)
        for bucket, chunk_idx in self._bucket_chunks(images_list, batch_size):
            arrays = [
                self._preprocess(images_list[j], width=bucket) for j in chunk_idx
            ]
            arrays, n_real = self._pad_rows(arrays, batch_size)  # static shape
            batch = self._device_batch(np.stack(arrays))
            pred, aux = run(self.variables, batch)
            pred = np.asarray(pred)[:n_real]
            aux = np.asarray(aux)[:n_real]

            for j, out_idx in enumerate(chunk_idx):
                if beam:
                    results[out_idx] = self._decode_beam_row(
                        pred[j], aux[j], return_confidence
                    )
                else:
                    results[out_idx] = self._decode_attention_row(
                        pred[j], aux[j], return_confidence
                    )

        return results[0] if is_single else results

    def _serving_fn(
        self,
        steps: int,
        target_w: int,
        ctc: bool = False,
        beam_width: int = 0,
        prune_k: int = 16,
        attn_beam: int = 0,  # attention-head beam width (0 = greedy)
        length_penalty: float = 0.0,
        lm_weight: float = 0.0,  # attn_beam / ctc beam shallow fusion (engine lm=)
    ):
        lm = self._fusion_lm(lm_weight) if (attn_beam or beam_width) else None

        def build():
            from rcnn_ocr_tpu.ops.preprocess import resize_pad_normalize

            def run(variables, raw, sizes):
                x = resize_pad_normalize(raw, sizes, self.img_h, target_w)
                if not ctc and attn_beam:
                    return self.model.apply(
                        variables,
                        x,
                        beam_width=attn_beam,
                        batch_max_length=steps - 1,
                        length_penalty=length_penalty,
                        lm_logp=lm,
                        lm_weight=lm_weight,
                        method=self.model.beam_decode,
                    )
                if ctc:
                    logits = self.model.apply(
                        variables, x, train=False, method=self.model.ctc_logits
                    )
                    if beam_width:
                        from rcnn_ocr_tpu.ops.ctc import ctc_beam_search_jax

                        log_probs = jax.nn.log_softmax(logits, axis=-1)
                        vals, idx = jax.lax.top_k(
                            log_probs, min(prune_k, self.charset.num_classes)
                        )
                        labels, lens, _ = ctc_beam_search_jax(
                            vals, idx.astype(jnp.int32),
                            blank_id=self.charset.ctc_blank_id,
                            beam_width=beam_width,
                            lm_logp=lm,
                            lm_weight=lm_weight,
                            sos_id=self.charset.sos_id,
                        )
                        return labels, lens
                    return ctc_greedy_decode_jnp(logits, self.charset.ctc_blank_id)
                logits = self.model.apply(
                    variables, x, train=False, batch_max_length=steps - 1
                )
                probs = jax.nn.softmax(logits, axis=-1)
                return jnp.argmax(logits, axis=-1), jnp.max(probs, axis=-1)

            return self._jit(run, n_batch_args=2)

        # the CTC kernels are steps-independent — key them once per width so
        # different max_length calls reuse the same compilation
        key_steps = 0 if ctc else steps
        return self._cached(
            ("serving", key_steps, target_w, ctc, beam_width, prune_k,
             attn_beam, length_penalty, lm_weight),
            build
        )

    def serving_kernel(
        self,
        method: str = "attention",
        max_length: int = 25,
        target_w: Optional[int] = None,
        beam_width: int = 16,
        prune_k: int = 16,
        length_penalty: float = 0.0,  # attention_beam: score / len**p
        lm_weight: float = 0.0,  # attention_beam shallow fusion (engine lm=)
    ):
        """The jitted serving decode kernel for one static configuration.

        Public accessor for ahead-of-time export (`rcnn_ocr_tpu.export`):
        ``kernel(variables, raw_uint8 [B, Hc, Wc, 3], sizes [B, 5])`` —
        exactly the function ``predict_serving`` dispatches per chunk.
        """
        ctc = method in ("ctc", "ctc_greedy", "ctc_beam")
        if not ctc and method not in ("attention", "attention_beam"):
            raise ValueError(f"Unsupported serving decode method: {method}")
        if ctc and not self.model.with_ctc_head:
            raise ValueError("this checkpoint has no CTC head")
        if not ctc and not self.model.with_attention_head:
            raise ValueError("this checkpoint has no attention head")
        return self._serving_fn(
            max_length + 1,
            target_w or self.img_w,
            ctc=ctc,
            beam_width=beam_width if method == "ctc_beam" else 0,
            prune_k=prune_k,
            attn_beam=beam_width if method == "attention_beam" else 0,
            length_penalty=(
                length_penalty if method == "attention_beam" else 0.0
            ),
            lm_weight=(
                lm_weight if method in ("attention_beam", "ctc_beam") else 0.0
            ),
        )

    def predict_serving(
        self,
        images: Union[ImageLike, List[ImageLike]],
        max_length: int = 25,
        batch_size: int = 256,
        canvas: Union[Tuple[int, int], str] = (64, 512),
        method: str = "attention",  # or "attention_beam" / "ctc_greedy" / "ctc_beam"
        return_confidence: bool = False,  # attention heads only (predict() parity)
        beam_width: int = 16,  # ctc_beam / attention_beam
        prune_k: int = 16,  # ctc_beam: top-k frame candidates considered
        length_penalty: float = 0.0,  # attention_beam: score / len**p
        lm_weight: float = 0.0,  # attention_beam shallow fusion (engine lm=)
    ):
        """High-throughput serving decode with on-device preprocessing.

        The host only letterboxes raw uint8 pixels into a fixed canvas (a
        memcpy); resize-pad-normalize runs fused on the TPU
        (`ops/preprocess.py`).  Host->device traffic drops ~4x vs shipping
        normalized float32, measured 4.2x faster end-to-end through a
        bandwidth-constrained link.  Images larger than ``canvas`` are
        cropped to it — size the canvas to your data.

        Double-buffered: the next chunk's host letterbox runs in a worker
        thread while the device decodes the current one.  Honors
        ``width_buckets`` (each bucket decodes at its own static width).
        ``method="ctc_greedy"`` decodes through the CTC head instead (the
        fastest end-to-end configuration together with int8-static);
        ``method="ctc_beam"`` swaps the greedy collapse for the fully
        on-device prefix beam search (``ctc_beam_search_jax``) — same
        pipeline, one fused kernel, beam-quality decodes at serving rates.
        ``method="attention_beam"`` runs the seq2seq beam search
        (`models/attention.py:_beam_search`) behind the same on-device
        preprocess — ``beam_width`` hypotheses, best per row.
        Like ``predict_ctc``, the CTC decodes have no ``max_length``
        notion — output length is bounded by the collapsed frame count, and
        the ``max_length`` arg only shapes the attention kernel.

        The on-device resize reproduces the host cv2 pipeline exactly
        (INTER_AREA coverage / clamped INTER_LINEAR as MXU matmuls with
        uint8 quantization — every pixel within one uint8 step,
        `ops/preprocess.py`): measured accuracy equals the host-preprocess
        path (99.05% == 99.05% on the PERF.md full-scale demo).
        """
        ctc = method in ("ctc", "ctc_greedy", "ctc_beam")
        ctc_beam_w = beam_width if method == "ctc_beam" else 0
        attn_beam = method == "attention_beam"
        if ctc and return_confidence:
            raise ValueError("return_confidence requires an attention method")
        if ctc and not self.model.with_ctc_head:
            raise ValueError("this checkpoint has no CTC head")
        if not ctc and method not in ("attention", "attention_beam"):
            raise ValueError(f"Unsupported serving decode method: {method}")
        if lm_weight and not (attn_beam or ctc_beam_w):
            raise ValueError(
                "lm_weight requires method='attention_beam' or 'ctc_beam'"
            )
        if length_penalty and not attn_beam:
            raise ValueError("length_penalty requires method='attention_beam'")
        if not ctc and not self.model.with_attention_head:
            raise ValueError("this checkpoint has no attention head; use predict_ctc()")
        from concurrent.futures import ThreadPoolExecutor

        from rcnn_ocr_tpu.ops.preprocess import host_letterbox

        is_single = not isinstance(images, list)
        images_list: List[ImageLike] = [images] if is_single else list(images)
        if not images_list:
            return []
        steps = max_length + 1
        batch_size = self._round_batch(batch_size)
        if isinstance(canvas, str):
            if canvas != "auto":
                raise ValueError(f"canvas: unknown spec {canvas!r}")
            # size the letterbox canvas to the data (header probes, no
            # decode) so nothing is cropped; one static shape per call set
            sizes = [self._probe_hw(img) for img in images_list]
            canvas = (max(h for h, _ in sizes), max(w for _, w in sizes))
            if self._verbose:
                print(f"Auto serving canvas: {canvas[0]}x{canvas[1]}")
        canvas_h, canvas_w = canvas

        chunks = self._bucket_chunks(images_list, batch_size)

        from rcnn_ocr_tpu.ops.preprocess import host_resize_geometry

        def letterbox_chunk(chunk):
            bucket, idxs = chunk
            rgb = [self._to_rgb(images_list[j]) for j in idxs]
            rgb, n_real = self._pad_rows(rgb, batch_size)
            raw, sizes = host_letterbox(rgb, canvas_h, canvas_w)
            # host-float64 placed-rect geometry rides along with the sizes
            # so the device resize is bit-identical to the host transform
            geom = host_resize_geometry(sizes, self.img_h, bucket or self.img_w)
            sizes = np.concatenate([sizes, geom], axis=1)
            return bucket, idxs, n_real, raw, sizes

        results: List[Any] = [None] * len(images_list)
        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = pool.submit(letterbox_chunk, chunks[0]) if chunks else None
            for k in range(len(chunks)):
                bucket, idxs, n_real, raw, sizes = pending.result()
                if k + 1 < len(chunks):
                    pending = pool.submit(letterbox_chunk, chunks[k + 1])
                run = self._serving_fn(
                    steps, bucket or self.img_w, ctc=ctc,
                    beam_width=ctc_beam_w, prune_k=prune_k,
                    attn_beam=beam_width if attn_beam else 0,
                    length_penalty=length_penalty if attn_beam else 0.0,
                    lm_weight=lm_weight if (attn_beam or ctc_beam_w) else 0.0,
                )
                pred, aux = run(
                    self.variables,
                    self._device_batch(raw),
                    self._device_batch(sizes),
                )
                # np.asarray blocks on device compute while the NEXT chunk
                # letterboxes in the worker thread (overlap)
                pred_rows = np.asarray(pred)
                if ctc:
                    from rcnn_ocr_tpu.postprocess import (
                        ctc_skip_ids,
                        decode_ctc_batch,
                    )

                    texts = decode_ctc_batch(
                        pred_rows,
                        aux,
                        len(idxs),
                        self._itos,
                        ctc_skip_ids(
                            self.charset.pad_id,
                            self.charset.sos_id,
                            self.charset.eos_id,
                            self.charset.ctc_blank_id,
                        ),
                    )
                    for j, out_idx in enumerate(idxs):
                        results[out_idx] = texts[j]
                    continue
                if attn_beam:
                    scores = np.asarray(aux) if return_confidence else None
                    for j, out_idx in enumerate(idxs):
                        results[out_idx] = self._decode_beam_row(
                            pred_rows[j],
                            scores[j] if return_confidence else 0.0,
                            return_confidence,
                        )
                    continue
                maxp_rows = np.asarray(aux) if return_confidence else None
                for j, out_idx in enumerate(idxs):
                    results[out_idx] = self._decode_attention_row(
                        pred_rows[j],
                        maxp_rows[j] if return_confidence else None,
                        return_confidence,
                    )
        return results[0] if is_single else results

    def predict_ctc(
        self,
        images: Union[ImageLike, List[ImageLike]],
        batch_size: int = 32,
        method: str = "greedy",
        beam_width: int = 16,
        prune_k: int = 16,  # beam: top-k frame candidates considered (0 = full V)
        device_beam: bool = True,
        lm_weight: float = 0.0,  # device-beam shallow fusion (engine lm=)
    ):
        """CTC decode via the shared-encoder CTC head.

        ``method="beam"`` runs the prefix beam search ON DEVICE by default
        (``ctc_beam_search_jax`` fused behind the encoder — batch-parallel,
        only [B, T] labels cross the link).  ``device_beam=False`` restores
        the host search (C++ trie beam over shipped top-k frames), which is
        also the fallback when ``prune_k`` is 0 (the device kernel needs a
        static candidate count).  ``lm_weight`` > 0 shallow-fuses the
        engine's bigram LM on the device beam's label extensions.
        """
        if not self.model.with_ctc_head:
            raise ValueError("this checkpoint has no CTC head")
        if lm_weight and (method != "beam" or not device_beam):
            raise ValueError(
                "lm_weight requires method='beam' with device_beam=True"
            )
        is_single = not isinstance(images, list)
        images_list: List[ImageLike] = [images] if is_single else list(images)
        if not images_list:
            return []
        batch_size = self._round_batch(batch_size)

        from rcnn_ocr_tpu.postprocess import ctc_skip_ids

        skip = ctc_skip_ids(
            self.charset.pad_id,
            self.charset.sos_id,
            self.charset.eos_id,
            self.charset.ctc_blank_id,
        )
        results: List[Optional[str]] = [None] * len(images_list)
        for bucket, chunk_idx in self._bucket_chunks(images_list, batch_size):
            arrays = [
                self._preprocess(images_list[j], width=bucket) for j in chunk_idx
            ]
            arrays, n_real = self._pad_rows(arrays, batch_size)
            batch = self._device_batch(np.stack(arrays))
            if method == "greedy":
                tokens, valid = self._ctc_fn(True)(self.variables, batch)
                tokens, valid = np.asarray(tokens), np.asarray(valid)
                rows = [tokens[b, : valid[b]].tolist() for b in range(n_real)]
            elif method == "beam":
                k = min(prune_k, self.charset.num_classes) if prune_k else 0
                if k and device_beam:
                    tokens, valid = self._ctc_beam_device_fn(
                        beam_width, k, lm_weight
                    )(self.variables, batch)
                    tokens, valid = np.asarray(tokens), np.asarray(valid)
                    rows = [tokens[b, : valid[b]].tolist() for b in range(n_real)]
                else:
                    if k:
                        vals, idx = self._ctc_fn(False, k)(self.variables, batch)
                        vals, idx = np.asarray(vals), np.asarray(idx)
                        # rebuild a (pruned) dense frame matrix on the host:
                        # the dropped tail is ~e^-10 likelihood, far below
                        # anything a width-`beam_width` search would keep
                        log_probs = np.full(
                            (n_real, vals.shape[1], self.charset.num_classes),
                            -1e30,
                            np.float32,
                        )
                        np.put_along_axis(
                            log_probs, idx[:n_real], vals[:n_real], -1
                        )
                    else:
                        log_probs = np.asarray(
                            self._ctc_fn(False)(self.variables, batch)
                        )[:n_real]
                    rows, _ = ctc_beam_search(
                        log_probs,
                        blank_id=self.charset.ctc_blank_id,
                        beam_width=beam_width,
                        already_log_probs=True,
                    )
            else:
                raise ValueError(f"Unsupported decode method: {method}")
            texts = ids_to_text(rows, self._itos, skip_ids=skip)
            for j, out_idx in enumerate(chunk_idx):
                results[out_idx] = texts[j]

        return results[0] if is_single else results

    def predict_ctc_long(
        self,
        images: Union[ImageLike, List[ImageLike]],
        tile_w: Optional[int] = None,
        overlap: Optional[int] = None,
        batch_size: int = 32,
        method: str = "greedy",
        beam_width: int = 16,
        prune_k: int = 16,
    ):
        """Unbounded-width decode: tile, trim, and concatenate CTC frames.

        Every fixed-width path (here and in the reference,
        `/root/reference/data/transforms.py:62-120`) squashes the line
        into one canvas — a 4000 px line at ``img_w=512`` loses ~8x of
        its horizontal resolution and the accuracy with it.  CTC frames
        are time-aligned with image x-position, so long lines can decode
        at FULL resolution: height-normalize preserving aspect, cut
        ``tile_w``-wide tiles overlapping by ``overlap`` px, run the
        encoder per tile (tiles batch together — one static shape, one
        compile), drop half of each junction's overlap frames per side,
        concatenate the frame sequence, and collapse (``greedy``) or
        prefix-beam (``beam``) the stitched whole on the host.  Images
        that fit one tile take the ordinary resize-pad path, so short
        lines decode identically to ``predict_ctc``.

        The attention head has no frame/position alignment to stitch —
        this is a CTC-head capability (the head the serving paths use).
        """
        if not self.model.with_ctc_head:
            raise ValueError("this checkpoint has no CTC head")
        if method not in ("greedy", "beam"):
            raise ValueError(f"Unsupported decode method: {method}")
        import cv2

        from rcnn_ocr_tpu.data.loader import scaled_width
        from rcnn_ocr_tpu.data.transforms import ResizeAndPad
        from rcnn_ocr_tpu.ops.ctc import ctc_greedy_collapse_np
        from rcnn_ocr_tpu.postprocess import ctc_skip_ids

        is_single = not isinstance(images, list)
        images_list: List[ImageLike] = [images] if is_single else list(images)
        if not images_list:
            return []
        tile_w = int(tile_w or self.img_w)
        # default: 64 px of shared context per junction, clamped so tiny
        # tile widths (e.g. a 64 px canvas) still leave unique frames
        overlap = int(overlap) if overlap is not None else min(64, tile_w // 2)
        if not 0 < overlap < tile_w:
            raise ValueError(f"overlap must be in (0, {tile_w}), got {overlap}")
        batch_size = self._round_batch(batch_size)
        pad_one = ResizeAndPad(img_h=self.img_h, img_w=tile_w)

        # --- plan: height-normalized tiles + per-image start offsets ---
        tiles: List[np.ndarray] = []
        plans: List[Tuple[int, List[int]]] = []  # (first tile idx, starts)
        for img in images_list:
            rgb = self._to_rgb(img)
            h, w = rgb.shape[:2]
            new_w = scaled_width(h, w, self.img_h)
            if new_w <= tile_w:
                plans.append((len(tiles), [0]))
                tiles.append(pad_one(rgb))
                continue
            shrinking = self.img_h < h or new_w < w
            resized = cv2.resize(
                rgb, (new_w, self.img_h),
                interpolation=cv2.INTER_AREA if shrinking else cv2.INTER_LINEAR,
            )
            step = tile_w - overlap
            starts = list(range(0, new_w - tile_w, step))
            if starts[-1] != new_w - tile_w:
                starts.append(new_w - tile_w)  # right-aligned final tile
            plans.append((len(tiles), starts))
            tiles.extend(resized[:, s : s + tile_w] for s in starts)

        # --- batched frame extraction (pruned top-k; slot 0 == argmax) ---
        k = max(1, min(prune_k, self.charset.num_classes))
        run = self._ctc_fn(False, k)
        all_vals: List[np.ndarray] = []
        all_idx: List[np.ndarray] = []
        for i in range(0, len(tiles), batch_size):
            chunk, n_real = self._pad_rows(tiles[i : i + batch_size], batch_size)
            vals, idx = run(self.variables, self._device_batch(np.stack(chunk)))
            all_vals.append(np.asarray(vals)[:n_real])
            all_idx.append(np.asarray(idx)[:n_real])
        vals = np.concatenate(all_vals)  # [n_tiles, T, k]
        idx = np.concatenate(all_idx)
        frames_t = vals.shape[1]
        # per-tile per-frame blank log-prob (-inf when blank left the
        # top-k): junction cuts snap to the most blank-dominant frame
        blank_lp = np.where(
            idx == self.charset.ctc_blank_id, vals, -np.inf
        ).max(-1)

        # --- stitch + decode per image ---
        skip = ctc_skip_ids(
            self.charset.pad_id, self.charset.sos_id, self.charset.eos_id,
            self.charset.ctc_blank_id,
        )
        results: List[str] = []
        for first, starts in plans:
            spans = [
                (first + j, a, b)
                for j, a, b in long_line_spans(
                    starts, tile_w, frames_t,
                    blank_scores=blank_lp[first : first + len(starts)],
                )
            ]
            v_cat = np.concatenate([vals[t, a:b] for t, a, b in spans])
            i_cat = np.concatenate([idx[t, a:b] for t, a, b in spans])
            if method == "greedy":
                row = ctc_greedy_collapse_np(
                    i_cat[None, :, 0], self.charset.ctc_blank_id
                )[0]
            else:
                dense = np.full(
                    (1, v_cat.shape[0], self.charset.num_classes), -1e30,
                    np.float32,
                )
                np.put_along_axis(dense, i_cat[None], v_cat[None], -1)
                rows, _ = ctc_beam_search(
                    dense, blank_id=self.charset.ctc_blank_id,
                    beam_width=beam_width, already_log_probs=True,
                )
                row = rows[0]
            results.append(ids_to_text([row], self._itos, skip_ids=skip)[0])

        return results[0] if is_single else results
