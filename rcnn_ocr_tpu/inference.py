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

from rcnn_ocr_tpu.calibration import CalibrationMixin
from rcnn_ocr_tpu.data.transforms import ResizeAndPad, load_rgb_uint8
from rcnn_ocr_tpu.long_lines import LongLineMixin, long_line_spans  # noqa: F401 (re-export)
from rcnn_ocr_tpu.models import RCNN
from rcnn_ocr_tpu.ops.augment import device_normalize
from rcnn_ocr_tpu.ops.ctc import ctc_beam_search, ctc_greedy_decode_jnp, ids_to_text
from rcnn_ocr_tpu.serving_engine import ServingEngineMixin
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


class OCRInference(CalibrationMixin, ServingEngineMixin, LongLineMixin):
    """Load a checkpoint and recognize text lines.

    The engine's capability families live in focused modules mixed in
    here (API unchanged): int8 calibration (`rcnn_ocr_tpu.calibration`),
    the on-device-preprocess serving path (`rcnn_ocr_tpu.serving_engine`),
    and unbounded-width long-line decoding (`rcnn_ocr_tpu.long_lines`).
    """

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

    def _greedy_align_fn(self, steps: int):
        """Greedy decode kernel that also ships the attention alignment
        (per-step encoder-frame argmax) — the long-line aligned merge's
        input (`long_lines.py:stitch_aligned_rows`)."""

        def build():
            def run(variables, images):
                logits, align = self.model.apply(
                    variables, device_normalize(images),
                    batch_max_length=steps - 1,
                    method=self.model.greedy_decode_aligned,
                )
                pred = jnp.argmax(logits, axis=-1)
                return pred, align

            return self._jit(run)

        return self._cached(("greedy_align", steps), build)

    def _attn_beam_align_fn(
        self,
        steps: int,
        beam_width: int,
        length_penalty: float,
        lm_weight: float = 0.0,
    ):
        """Beam kernel returning (tokens, scores, alignment) — the winning
        hypothesis' per-step attention argmax rides the beam's parent
        selection (`models/attention.py:_beam_search`)."""
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
                    return_alignment=True,
                    method=self.model.beam_decode,
                )

            return self._jit(run)

        return self._cached(
            ("attn_beam_align", steps, beam_width, length_penalty, lm_weight),
            build,
        )

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

    def _ctc_frame_ids_fn(self, with_maxp: bool = False):
        """Per-frame argmax class ids ``[B, T] int32`` — everything the
        greedy/midpoint long-line stitcher and the hybrid segmenter
        consume.  Fetching ids instead of the top-k ``(vals, idx)`` pair
        cuts device->host traffic 32x at k=16 (measured end-to-end:
        ``predict_ctc_long`` 255 -> 347 img/s on 256 long lines, now
        within ~12% of the per-tile device compute floor — PERF.md
        round 4; the bytes saved are HBM->host on any platform, not
        just this tunnel).  ``with_maxp`` adds the per-frame max-softmax
        probability ``[B, T] float32`` (the stitched-confidence input —
        2x the ids bytes, still 16x under the top-k pair)."""

        def build():
            def run(variables, images):
                logits = self.model.apply(
                    variables, device_normalize(images), train=False,
                    method=self.model.ctc_logits,
                )
                ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if not with_maxp:
                    return ids
                lg = logits.astype(jnp.float32)
                maxp = jnp.exp(
                    jnp.max(lg, axis=-1) - jax.nn.logsumexp(lg, axis=-1)
                )
                return ids, maxp

            return self._jit(run)

        return self._cached(("ctc_frame_ids", with_maxp), build)

    def _ctc_fn(self, greedy: bool, prune_k: int = 0, with_conf: bool = False):
        """CTC head kernel.  ``greedy``: on-device collapse -> tokens
        (``with_conf`` adds the mean emitted-frame max-softmax [B] row).
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
                    return ctc_greedy_decode_jnp(
                        logits, self.charset.ctc_blank_id,
                        return_confidence=with_conf,
                    )
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                if prune_k:
                    vals, idx = jax.lax.top_k(log_probs, prune_k)
                    return vals, idx.astype(jnp.int32)
                return log_probs

            return self._jit(run)

        return self._cached(("ctc", greedy, prune_k, with_conf), build)

    def _ctc_beam_device_fn(
        self, beam_width: int, prune_k: int, lm_weight: float = 0.0,
        with_conf: bool = False,
    ):
        """Whole-beam-on-device kernel: encoder -> CTC log-probs -> top-k
        frame pruning -> vectorized prefix beam search, one jit.  Only the
        final [B, T] labels + lengths cross the device->host link (the host
        path ships [B, T, k] frames and loops the search on one core).
        ``lm_weight`` > 0 fuses the engine's bigram LM on label extensions
        (`ops/ctc.py:ctc_beam_search_jax`)."""
        lm = self._fusion_lm(lm_weight)

        def build():
            from rcnn_ocr_tpu.ops.ctc import ctc_beam_from_logits

            def run(variables, images):
                logits = self.model.apply(
                    variables, device_normalize(images), train=False,
                    method=self.model.ctc_logits,
                )
                return ctc_beam_from_logits(
                    logits,
                    blank_id=self.charset.ctc_blank_id,
                    beam_width=beam_width,
                    prune_k=prune_k,
                    lm_logp=lm,
                    lm_weight=lm_weight,
                    sos_id=self.charset.sos_id,
                    return_confidence=with_conf,
                )

            return self._jit(run)

        return self._cached(
            ("ctc_beam_dev", beam_width, prune_k, lm_weight, with_conf), build
        )

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
        """First MULTI-image call resolves ``width_buckets="auto:K"`` (the
        training loop's waste-minimizing DP over this batch's widths).

        A single-image call (e.g. the documented daemon warm-up request)
        must NOT lock the bucket set: one narrow line would pin a single
        narrow bucket for the instance lifetime and every later wide
        image would be silently squeezed into it.  Until a real batch
        arrives, calls decode at the fixed ``img_w`` — padding waste, not
        an accuracy hazard.  The widest bucket is always lifted to
        ``img_w`` for the same reason: images wider than the sample batch
        map to the largest bucket, which must be the full engine width.
        """
        if not self._auto_bucket_k or self.width_buckets or len(images_list) < 2:
            return
        from rcnn_ocr_tpu.data.loader import optimal_width_buckets, scaled_width

        scaled = []
        for img in images_list:
            h, w = self._probe_hw(img)
            scaled.append(scaled_width(h, w, self.img_h))
        buckets = optimal_width_buckets(
            scaled, self._auto_bucket_k, multiple=8, max_width=self.img_w
        )
        self.width_buckets = sorted(set(buckets[:-1]) | {self.img_w})
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

    def predict_ctc(
        self,
        images: Union[ImageLike, List[ImageLike]],
        batch_size: int = 32,
        method: str = "greedy",
        beam_width: int = 16,
        prune_k: int = 16,  # beam: top-k frame candidates considered (0 = full V)
        device_beam: bool = True,
        lm_weight: float = 0.0,  # device-beam shallow fusion (engine lm=)
        return_confidence: bool = False,
    ):
        """CTC decode via the shared-encoder CTC head.

        ``method="beam"`` runs the prefix beam search ON DEVICE by default
        (``ctc_beam_search_jax`` fused behind the encoder — batch-parallel,
        only [B, T] labels cross the link).  ``device_beam=False`` restores
        the host search (C++ trie beam over shipped top-k frames), which is
        also the fallback when ``prune_k`` is 0 (the device kernel needs a
        static candidate count).  ``lm_weight`` > 0 shallow-fuses the
        engine's bigram LM on the device beam's label extensions.

        ``return_confidence`` yields ``(text, confidence)`` per image (the
        ``predict()`` contract, `/root/reference/inference.py:169-188`):
        greedy — mean max-softmax over the emitted frames, computed on
        device as one extra fp32 [B] row (the fetch shape is otherwise
        unchanged); beam — the winner's normalized posterior among the
        final beams, identical on the device and host searches.
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
        results: List[Any] = [None] * len(images_list)
        for bucket, chunk_idx in self._bucket_chunks(images_list, batch_size):
            arrays = [
                self._preprocess(images_list[j], width=bucket) for j in chunk_idx
            ]
            arrays, n_real = self._pad_rows(arrays, batch_size)
            batch = self._device_batch(np.stack(arrays))
            confs: Optional[np.ndarray] = None
            if method == "greedy":
                out = self._ctc_fn(True, with_conf=return_confidence)(
                    self.variables, batch
                )
                if return_confidence:
                    tokens, valid, conf = out
                    confs = np.asarray(conf)[:n_real]
                else:
                    tokens, valid = out
                tokens, valid = np.asarray(tokens), np.asarray(valid)
                rows = [tokens[b, : valid[b]].tolist() for b in range(n_real)]
            elif method == "beam":
                k = min(prune_k, self.charset.num_classes) if prune_k else 0
                if k and device_beam:
                    out = self._ctc_beam_device_fn(
                        beam_width, k, lm_weight, with_conf=return_confidence
                    )(self.variables, batch)
                    if return_confidence:
                        tokens, valid, conf = out
                        confs = np.asarray(conf)[:n_real]
                    else:
                        tokens, valid = out
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
                    got = ctc_beam_search(
                        log_probs,
                        blank_id=self.charset.ctc_blank_id,
                        beam_width=beam_width,
                        already_log_probs=True,
                        return_totals=return_confidence,
                    )
                    if return_confidence:
                        rows, lps, totals = got
                        confs = np.exp(lps - totals)
                    else:
                        rows, _ = got
            else:
                raise ValueError(f"Unsupported decode method: {method}")
            texts = ids_to_text(rows, self._itos, skip_ids=skip)
            for j, out_idx in enumerate(chunk_idx):
                results[out_idx] = (
                    (texts[j], float(confs[j])) if return_confidence
                    else texts[j]
                )

        return results[0] if is_single else results
