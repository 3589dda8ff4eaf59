"""Ahead-of-time serving artifacts via `jax.export` (StableHLO).

A TPU-native deployment path with no reference counterpart (the reference
serves from a live torch process rebuilding the model from Python classes,
`/root/reference/inference.py:12-91`): the full serving kernel — on-device
resize-pad-normalize, encoder, decode — is lowered ONCE to versioned
StableHLO and written to disk next to the weights and the charset.  A
serving host then *deserializes and runs* the artifact:

* no model code at serve time — the artifact directory is the complete
  deployment unit (kernel bytes + params + manifest), immune to framework
  code drift between the training and the serving fleet;
* cold start is deserialize + XLA compile — no Python re-trace of the
  network;
* `platforms=("tpu", "cpu")` lowers one artifact for both backends, so the
  same directory serves on a TPU pod and on a CPU canary.

Artifact directory layout::

    manifest.json           shapes, decode method, charset, token ids
    params.msgpack          flax-serialized inference variables
    serving_w<W>.stablehlo  exported kernel bytes, one per decode width

Width bucketing is preserved: one exported kernel per static width, and
:class:`ServingArtifact.predict` routes each image to its bucket exactly
like ``OCRInference.predict_serving`` (SURVEY.md §5.7).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

# Format ladder (each artifact stamps the MINIMUM version whose loader
# reads it correctly, so older loaders refuse loudly — see the stamping
# site in export_serving_artifact):
# v2: explicit per-method decode dispatch (v1 loaders routed any unknown
#     method through the CTC branch — a v1 loader reading an
#     attention_beam artifact would garble decodes instead of refusing;
#     ADVICE r3).  Fixed-width methods, text-merge attention_long, and
#     top-k tile kernels (ctc_long_beam / blank-snap) still stamp v2.
# v3: frame-aligned attention_long merge — the exported per-tile kernel
#     carries an EXTRA alignment output; stamped on merge="align"
#     artifacts so a v2 loader refuses instead of mis-unpacking
# v4: argmax tile kernels (hybrid_long* and greedy/midpoint ctc_long) —
#     a single [B,T] ids output that a v3 loader would mis-unpack as the
#     top-k (vals, idx) pair; manifest carries tile_kernel="argmax"
# v5: CTC confidence (OPT-IN, `with_confidence=True`) — fixed-width
#     ctc_greedy/ctc_beam kernels carry a THIRD [B] fp32 confidence row
#     (a v4 loader would fail to unpack), and greedy/midpoint ctc_long
#     ships the (ids, maxp) tile kernel (manifest
#     tile_kernel="argmax_maxp").  Opt-in because the extra output is one
#     more device->host fetch per batch: measured -4.5% on the headline
#     serving rate through this tunnel (PERF.md r5).  Confidence-free
#     exports and every other method keep their older stamps.
MANIFEST_VERSION = 5


CTC_LONG_METHODS = ("ctc_long", "ctc_long_beam")
ATTN_LONG_METHODS = ("attention_long", "attention_long_beam")
HYBRID_LONG_METHODS = ("hybrid_long", "hybrid_long_beam")
LONG_METHODS = CTC_LONG_METHODS + ATTN_LONG_METHODS + HYBRID_LONG_METHODS
FIXED_METHODS = ("attention", "attention_beam", "ctc_greedy", "ctc_beam")
ALL_METHODS = FIXED_METHODS + LONG_METHODS


# Knobs a config's ``export_artifact`` block may carry, mapped onto
# `export_serving_artifact` (plus `slot`/`out_dir`/`quantize`/`lm`/
# `calibrate`, which steer the checkpoint choice and engine construction
# in the training loop — `lm` is an LM.npz path baked into fusion-capable
# beam kernels; `calibrate` records static int8 activation scales on that
# many validation images before exporting, i.e. the headline
# int8-static serving path straight out of a training config).
EXPORT_REQUEST_KEYS = frozenset({
    "method", "slot", "out_dir", "quantize", "lm", "calibrate",
    "batch_size", "canvas",
    "max_length", "beam_width", "prune_k", "length_penalty", "lm_weight",
    "width_buckets", "platforms", "tile_w", "overlap", "snap", "merge",
    "min_gap", "margin", "confidence",
})


def validate_export_request(req: Any, head: str = "both") -> Dict[str, Any]:
    """Normalize and validate a config ``export_artifact`` block.

    Called at training START so a typo'd method fails in seconds, not
    after the last epoch.  ``req`` is ``True`` (all defaults) or a dict of
    :data:`EXPORT_REQUEST_KEYS`; ``head`` is the training head — a method
    whose decode head was never trained is refused here.  Returns the
    normalized dict (method/slot filled in).
    """
    if req is True:
        out: Dict[str, Any] = {}
    elif isinstance(req, dict):
        out = dict(req)
    else:
        raise ValueError(
            f"export_artifact must be true or a dict of export knobs, got {req!r}"
        )
    unknown = sorted(set(out) - EXPORT_REQUEST_KEYS)
    if unknown:
        raise ValueError(
            f"export_artifact: unknown key(s) {unknown}; "
            f"known: {sorted(EXPORT_REQUEST_KEYS)}"
        )
    has_attn = head in ("attention", "both")
    has_ctc = head in ("ctc", "both")
    method = out.setdefault(
        "method", "ctc_greedy" if head == "ctc" else "attention"
    )
    if method not in ALL_METHODS:
        raise ValueError(
            f"export_artifact: unknown method {method!r}; known: {ALL_METHODS}"
        )
    needs_attn = method.startswith(("attention", "hybrid"))
    needs_ctc = method.startswith(("ctc", "hybrid"))
    if needs_attn and not has_attn:
        raise ValueError(
            f"export_artifact: method {method!r} decodes with the attention "
            f"head, but head={head!r} does not train one"
        )
    if needs_ctc and not has_ctc:
        raise ValueError(
            f"export_artifact: method {method!r} decodes with the CTC head, "
            f"but head={head!r} does not train one"
        )
    slot = out.setdefault("slot", "best_acc")
    if slot not in ("best_acc", "best_loss", "last"):
        raise ValueError(
            f"export_artifact: slot must be best_acc|best_loss|last, got {slot!r}"
        )
    if out.get("snap", "midpoint") not in ("midpoint", "blank"):
        raise ValueError(f"export_artifact: bad snap {out['snap']!r}")
    if out.get("merge", "align") not in ("align", "text"):
        raise ValueError(f"export_artifact: bad merge {out['merge']!r}")
    # knob PRESENCE must match the method: a policy knob the exporter
    # would never read (even at its default value) signals a
    # misconfigured block — refuse rather than silently drop it
    for knob, methods, what in (
        ("snap", CTC_LONG_METHODS, "the ctc_long junction stitcher"),
        ("merge", ATTN_LONG_METHODS, "the attention_long junction merge"),
        ("min_gap", HYBRID_LONG_METHODS, "the hybrid_long segmenter"),
        ("margin", HYBRID_LONG_METHODS, "the hybrid_long segmenter"),
    ):
        if knob in out and method not in methods:
            raise ValueError(
                f"export_artifact: {knob} only steers {what} "
                f"(method={method!r} never reads it)"
            )
    if (
        out.get("tile_w") is not None or out.get("overlap") is not None
    ) and method not in LONG_METHODS:
        raise ValueError(
            f"export_artifact: tile_w/overlap require a *_long method, got {method!r}"
        )
    # the remaining rules mirror export_serving_artifact's own refusals —
    # validating them HERE is the whole point (fail before the first
    # epoch, not after the last one)
    if out.get("width_buckets") and method in LONG_METHODS:
        raise ValueError(
            "export_artifact: width_buckets does not apply to *_long "
            "methods (they tile at a single tile_w)"
        )
    no_fusion = CTC_LONG_METHODS + (
        "hybrid_long", "attention_long", "attention", "ctc_greedy",
    )
    if out.get("lm_weight") and method in no_fusion:
        raise ValueError(
            f"export_artifact: lm_weight is not supported with method="
            f"{method!r} (the greedy/stitched decode has no fusion hook)"
        )
    if out.get("lm_weight") and not out.get("lm"):
        raise ValueError(
            "export_artifact: lm_weight requires lm (path to a bigram "
            "LM.npz from tools/train_lm.py)"
        )
    if out.get("lm") and not out.get("lm_weight"):
        raise ValueError(
            "export_artifact: lm without lm_weight never fuses — set "
            "lm_weight > 0 (the beam kernel bakes the table in only when "
            "the fusion weight is nonzero)"
        )
    if out.get("length_penalty") and method not in (
        "attention_beam", "attention_long_beam", "hybrid_long_beam"
    ):
        raise ValueError(
            f"export_artifact: length_penalty is not supported with "
            f"method={method!r}"
        )
    cal = out.get("calibrate")
    # identity, not equality: 0 == False would slip past an `in` check
    # and become a silent no-op in the training loop
    if cal is not None and cal is not False:
        if cal is not True and (not isinstance(cal, int) or cal < 1):
            raise ValueError(
                f"export_artifact: calibrate must be true or a positive "
                f"image count, got {cal!r}"
            )
        if not out.get("quantize"):
            raise ValueError(
                "export_artifact: calibrate records static int8 activation "
                "scales — it requires quantize: true"
            )
    if out.get("canvas") is not None:
        canvas = tuple(int(v) for v in out["canvas"])
        if len(canvas) != 2 or min(canvas) <= 0:
            raise ValueError(f"export_artifact: canvas must be [H, W], got {out['canvas']!r}")
        out["canvas"] = canvas
    return out


def export_serving_artifact(
    ocr,  # OCRInference
    out_dir: str,
    method: str = "ctc_greedy",
    batch_size: int = 256,
    canvas: Tuple[int, int] = (64, 512),
    max_length: int = 25,
    beam_width: int = 16,
    prune_k: int = 16,
    length_penalty: float = 0.0,  # attention_beam: score / len**p
    lm_weight: float = 0.0,  # attention_beam shallow fusion (engine lm=)
    width_buckets: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
    tile_w: Optional[int] = None,  # ctc_long*: tile width (default img_w)
    overlap: Optional[int] = None,  # ctc_long*: junction overlap px
    snap: str = "midpoint",  # ctc_long*: junction cuts ("midpoint"|"blank")
    merge: str = "align",  # attention_long*: junction merge ("align"|"text")
    min_gap: int = 3,  # hybrid_long*: blank frames that split segments
    margin: int = 1,  # hybrid_long*: context frames around each segment
    with_confidence: bool = False,  # ctc methods: bake confidence outputs
) -> str:
    """Export an :class:`OCRInference` serving configuration to disk.

    ``width_buckets`` defaults to the engine's own buckets (or its single
    ``img_w``); every width becomes one exported kernel.  ``platforms``
    (e.g. ``("tpu", "cpu")``) requests multi-platform lowering — default is
    the exporting process's backend.  Returns ``out_dir``.

    ``method="ctc_long"`` / ``"ctc_long_beam"`` exports the unbounded-width
    stitched decode (`rcnn_ocr_tpu.long_lines`): the artifact carries the
    per-tile frame-extraction kernel (one static ``tile_w``) plus the
    tiling/stitch policy in the manifest; the host side of
    :class:`ServingArtifact` then runs the SAME tiling + stitch driver as
    the live engine.  ``method="attention_long"`` / ``"attention_long_beam"``
    do the same for the seq2seq head; ``merge`` picks ``predict_long``'s
    junction policy — ``"align"`` (default) ships the alignment-returning
    kernel and stitches by the decoder's own attention positions
    (`long_lines.stitch_aligned_rows`), ``"text"`` ships the plain kernel
    and merges in text space (`long_lines.merge_tile_texts`).
    ``method="hybrid_long"`` / ``"hybrid_long_beam"`` ships BOTH the CTC
    tile kernel and the attention decode kernel: the loader segments by
    CTC blanks and reads each full-resolution segment with the seq2seq
    head, mirroring ``predict_hybrid_long``.
    """
    import jax
    from flax import serialization

    if getattr(ocr, "_mesh", None) is not None:
        raise ValueError(
            "export requires a single-device OCRInference (mesh=None); "
            "shard the exported artifact at load time instead: "
            "ServingArtifact.load(dir, mesh=True)"
        )
    long_mode = method in LONG_METHODS
    # validate policy knobs BEFORE touching the output directory — a bad
    # knob must not leave a half-rewritten artifact (old kernels deleted,
    # new manifest never written)
    if method in CTC_LONG_METHODS and snap not in ("midpoint", "blank"):
        raise ValueError(f"snap must be 'midpoint' or 'blank', got {snap!r}")
    if method in ATTN_LONG_METHODS and merge not in ("align", "text"):
        raise ValueError(f"merge must be 'align' or 'text', got {merge!r}")
    if long_mode and width_buckets:
        raise ValueError(
            "width_buckets does not apply to long-line methods — they tile "
            "at a single tile_w; pass tile_w/overlap instead"
        )
    # fusion/rank knobs only reach kernels that implement them — refuse
    # combos the kernel would DROP, mirroring serving_predict_fn: the
    # manifest must never record an lm_weight/length_penalty the artifact
    # does not actually apply (the silently-dropped-knob rule)
    no_fusion_methods = CTC_LONG_METHODS + (
        "hybrid_long", "attention_long", "attention", "ctc_greedy",
    )
    if lm_weight and method in no_fusion_methods:
        raise ValueError(
            f"lm_weight is not supported with method={method!r} "
            "(the greedy/stitched decode has no fusion hook)"
        )
    # length_penalty rank-normalizes the ATTENTION beam only
    if length_penalty and method not in (
        "attention_beam", "attention_long_beam", "hybrid_long_beam"
    ):
        raise ValueError(
            f"length_penalty is not supported with method={method!r}"
        )
    if long_mode:
        from rcnn_ocr_tpu.long_lines import resolve_tiling

        tile_w, overlap = resolve_tiling(
            ocr.img_w, tile_w, overlap,
            # only the aligned attention merge computes frames statically
            # (manifest frames_t = tile_w // TIME_DOWNSAMPLE); every other
            # long driver derives frames from the kernel output
            require_frame_aligned=(
                method in ATTN_LONG_METHODS and merge == "align"
            ),
        )
        widths = [int(tile_w)]
    else:
        widths = [int(w) for w in (width_buckets or ocr.width_buckets or [ocr.img_w])]
    canvas_h, canvas_w = int(canvas[0]), int(canvas[1])
    os.makedirs(out_dir, exist_ok=True)

    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), ocr.variables
    )
    raw_spec = jax.ShapeDtypeStruct(
        (batch_size, canvas_h, canvas_w, 3), np.uint8
    )
    # [h, w] + host float64 placed-rect geometry [dst_h, dst_w, y0]
    sizes_spec = jax.ShapeDtypeStruct((batch_size, 5), np.int32)

    files: Dict[str, str] = {}
    decode_files: Dict[str, str] = {}
    # every kernel is traced and serialized IN MEMORY before any existing
    # file is touched: tracing is where head-mismatch / unknown-method /
    # missing-LM errors surface, and a failed re-export must leave a
    # previously good artifact directory fully intact (same rule as the
    # knob validation above)
    pending_kernels: List[Tuple[str, bytes]] = []
    for w in widths:
        if method in HYBRID_LONG_METHODS:
            # hybrid ships TWO kernels per width: the CTC tile kernel
            # (segmentation) and the attention decode kernel (reads each
            # cropped segment) — the host driver mirrors
            # predict_hybrid_long exactly
            tiles_spec = jax.ShapeDtypeStruct(
                (batch_size, ocr.img_h, w, 3), np.uint8
            )
            # the segmenter reads per-frame argmax ids — ship the argmax
            # kernel (1/32nd the host transfer of the top-k pair)
            tile_kernel = ocr.tile_ids_kernel()
            exp_tiles = jax.export.export(
                tile_kernel, platforms=list(platforms) if platforms else None
            )(var_specs, tiles_spec)
            fname = f"tiles_w{w}.stablehlo"
            pending_kernels.append((fname, bytes(exp_tiles.serialize())))
            files[str(w)] = fname
            dec_kernel = ocr.decode_kernel(
                max_length=max_length,
                beam_width=(
                    beam_width if method == "hybrid_long_beam" else 0
                ),
                length_penalty=length_penalty,
                lm_weight=lm_weight,
            )
            exp_dec = jax.export.export(
                dec_kernel, platforms=list(platforms) if platforms else None
            )(var_specs, tiles_spec)
            dname = f"decode_w{w}.stablehlo"
            pending_kernels.append((dname, bytes(exp_dec.serialize())))
            decode_files[str(w)] = dname
            continue
        if long_mode:
            # per-tile kernel: resize-padded uint8 tiles in; out = top-k
            # frame candidates (ctc_long*) or decoded token rows
            # (attention_long*); the stitch/merge runs on the serving host
            if method in ATTN_LONG_METHODS:
                kernel = ocr.decode_kernel(
                    max_length=max_length,
                    beam_width=(
                        beam_width if method == "attention_long_beam" else 0
                    ),
                    length_penalty=length_penalty,
                    lm_weight=lm_weight,
                    with_alignment=(merge == "align"),
                )
            elif method == "ctc_long" and snap == "midpoint":
                # greedy/midpoint consumes only the per-frame argmax —
                # bake the ids kernel; `with_confidence` swaps in the
                # (ids, maxp) flavor (still 16x under the top-k transfer;
                # maxp is the stitched-confidence input); beam and
                # blank-snap need the top-k candidates
                kernel = ocr.tile_ids_kernel(with_maxp=with_confidence)
            else:
                kernel = ocr.tile_kernel(prune_k=prune_k)
            tiles_spec = jax.ShapeDtypeStruct(
                (batch_size, ocr.img_h, w, 3), np.uint8
            )
            exported = jax.export.export(
                kernel, platforms=list(platforms) if platforms else None
            )(var_specs, tiles_spec)
            fname = f"tiles_w{w}.stablehlo"
        else:
            kernel = ocr.serving_kernel(
                method=method,
                max_length=max_length,
                target_w=w,
                beam_width=beam_width,
                prune_k=prune_k,
                length_penalty=length_penalty,
                lm_weight=lm_weight,  # the LM table bakes into the kernel bytes
                # OPT-IN (`with_confidence`): the extra [B] fp32 output is
                # one more device->host fetch per batch — measured −4.5%
                # on the headline serving rate through this tunnel
                # (29.2k -> 27.9k img/s, PERF.md r5) — so the default
                # artifact keeps the 2-output kernels
                with_confidence=with_confidence and method in (
                    "ctc", "ctc_greedy", "ctc_beam"
                ),
            )
            exported = jax.export.export(
                kernel, platforms=list(platforms) if platforms else None
            )(var_specs, raw_spec, sizes_spec)
            fname = f"serving_w{w}.stablehlo"
        pending_kernels.append((fname, bytes(exported.serialize())))
        files[str(w)] = fname

    # all kernels traced successfully — NOW touch the directory: purge
    # dead kernels from a previous width set (the directory IS the
    # deployment unit), then write the new set
    for fname in os.listdir(out_dir):
        if fname.startswith(
            ("serving_w", "tiles_w", "decode_w")
        ) and fname.endswith(".stablehlo"):
            os.remove(os.path.join(out_dir, fname))
    for fname, blob in pending_kernels:
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(blob)

    host_vars = jax.tree_util.tree_map(np.asarray, ocr.variables)
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(
            serialization.msgpack_serialize(
                serialization.to_state_dict(host_vars)
            )
        )

    cs = ocr.charset
    # stamp the MINIMUM loader version that reads this artifact correctly,
    # so older loaders refuse loudly instead of mis-unpacking:
    #   4 — argmax tile kernels: hybrid_long* (two-kernel set) and
    #       greedy/midpoint ctc_long (single [B,T] output; a v3 loader
    #       would unpack them as the (vals, idx) pair)
    #   3 — align attention_long kernels (extra alignment output)
    #   2 — everything else
    #   5 — CTC confidence outputs (OPT-IN, `with_confidence`): fixed ctc
    #       kernels (3 outputs) and the (ids, maxp) ctc_long/midpoint
    #       tile kernel; confidence-free artifacts keep the older stamps
    ctc_conf = bool(with_confidence) and (
        method in ("ctc_greedy", "ctc_beam")
        or (method == "ctc_long" and snap == "midpoint")
    )
    if ctc_conf:
        fmt = 5
    elif method in HYBRID_LONG_METHODS or (
        method == "ctc_long" and snap == "midpoint"
    ):
        fmt = 4
    elif method in ATTN_LONG_METHODS and merge == "align":
        fmt = 3
    else:
        fmt = 2
    manifest = {
        "format_version": fmt,
        "method": method,
        "max_length": max_length,
        "batch_size": batch_size,
        "canvas": [canvas_h, canvas_w],
        "img_h": ocr.img_h,
        "widths": widths,
        "beam_width": beam_width,
        "prune_k": prune_k,
        "length_penalty": length_penalty,
        "lm_weight": lm_weight,
        "itos": list(cs.itos),
        "ids": {
            "pad": cs.pad_id,
            "sos": cs.sos_id,
            "eos": cs.eos_id,
            "blank": cs.blank_id,
            "ctc_blank": cs.ctc_blank_id,
        },
        # provenance: the int8 story rides along transparently (the kernels
        # are traced from the engine's model, quant_stats ship in params)
        "quantize": bool(getattr(ocr.model, "quantize", False)),
        "act_quant": getattr(ocr.model, "act_quant", None),
        # whether the CTC kernels carry confidence outputs (v5 opt-in;
        # attention/hybrid confidence needs no extra outputs)
        "ctc_confidence": ctc_conf,
        "platforms": list(platforms) if platforms else None,
        "jax_version": jax.__version__,
        "files": files,
    }
    if long_mode:
        # tiling/stitch policy: the host driver reconstructs the live
        # engine's predict_ctc_long / predict_long exactly from these
        manifest["tile_w"] = int(tile_w)
        manifest["overlap"] = int(overlap)
        if method in CTC_LONG_METHODS:
            manifest["snap"] = snap
            # which tile kernel the artifact carries: "argmax" (per-frame
            # ids, the greedy/midpoint fast path), "argmax_maxp" (+ the
            # max-softmax row for stitched confidence, v5 opt-in) or
            # "topk" (candidates, for beam / blank-snap)
            if method == "ctc_long" and snap == "midpoint":
                manifest["tile_kernel"] = (
                    "argmax_maxp" if ctc_conf else "argmax"
                )
            else:
                manifest["tile_kernel"] = "topk"
        elif method in HYBRID_LONG_METHODS:
            manifest["decode_files"] = decode_files
            manifest["min_gap"] = int(min_gap)
            manifest["margin"] = int(margin)
            manifest["tile_kernel"] = "argmax"
        else:
            manifest["merge"] = merge
            if merge == "align":
                # the aligned merge needs the per-tile encoder frame count;
                # recorded so the loader needs no model code at serve time
                from rcnn_ocr_tpu.models.rcnn import TIME_DOWNSAMPLE

                manifest["frames_t"] = int(tile_w) // TIME_DOWNSAMPLE
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, ensure_ascii=False, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return out_dir


class ServingArtifact:
    """Serve from an exported artifact directory — no model code needed.

    Mirrors ``OCRInference.predict_serving`` host-side semantics (letterbox
    canvas, bucket routing, pad-to-static-batch, decode rules) while the
    device side runs the deserialized StableHLO kernel.
    """

    def __init__(self, base_dir: str, mesh: Any = None):
        import jax
        from flax import serialization

        self.base_dir = base_dir
        with open(os.path.join(base_dir, "manifest.json"), encoding="utf-8") as f:
            m = self.manifest = json.load(f)
        if m["format_version"] > MANIFEST_VERSION:
            raise ValueError(
                f"artifact format {m['format_version']} is newer than this "
                f"loader ({MANIFEST_VERSION})"
            )
        self.method: str = m["method"]
        self.batch_size: int = int(m["batch_size"])
        # multi-chip serving from the deployment unit (mirror of
        # OCRInference(mesh=True)): params replicated, every batch sharded
        # over the data axis — GSPMD partitions the deserialized StableHLO
        # module exactly like a live-traced kernel (the module is inlined
        # into the jitted caller, so sharding propagation sees plain ops)
        self._mesh = None
        rep = data_sh = None
        if mesh is not None and mesh is not False:
            from jax.sharding import Mesh

            from rcnn_ocr_tpu.parallel.mesh import (
                batch_sharding,
                data_axis,
                make_mesh,
                replicated_sharding,
            )

            self._mesh = mesh if isinstance(mesh, Mesh) else make_mesh()
            rep = replicated_sharding(self._mesh)
            data_sh = batch_sharding(self._mesh)
            n = int(self._mesh.shape[data_axis(self._mesh)])
            if self.batch_size % n:
                raise ValueError(
                    f"artifact batch_size {self.batch_size} does not tile "
                    f"the mesh data axis ({n} devices); re-export with a "
                    "divisible batch size"
                )
        self._rep, self._data_sh = rep, data_sh
        with open(os.path.join(base_dir, "params.msgpack"), "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        # commit params to the device ONCE — msgpack_restore yields host
        # numpy arrays, and passing those into a jitted call re-transfers
        # every weight on every batch (measured 15x end-to-end on the TPU
        # tunnel: 190 -> 2900+ img/s at production shape)
        self.variables = jax.device_put(restored, rep)
        self._itos: List[str] = list(m["itos"])
        self._ids = m["ids"]
        self.canvas: Tuple[int, int] = (int(m["canvas"][0]), int(m["canvas"][1]))
        self.img_h: int = int(m["img_h"])
        self.widths: List[int] = [int(w) for w in m["widths"]]
        self.tile_w: Optional[int] = (
            int(m["tile_w"]) if "tile_w" in m else None
        )
        self.overlap: Optional[int] = (
            int(m["overlap"]) if "overlap" in m else None
        )
        n_batch_args = 1 if self.method in LONG_METHODS else 2

        def load_kernel(fname: str):
            with open(os.path.join(base_dir, fname), "rb") as f:
                exported = jax.export.deserialize(bytearray(f.read()))
            if self._mesh is None:
                return jax.jit(exported.call)
            return jax.jit(
                exported.call,
                in_shardings=(rep,) + (data_sh,) * n_batch_args,
                out_shardings=data_sh,
            )

        self._calls: Dict[int, Any] = {
            int(w_str): load_kernel(fname)
            for w_str, fname in m["files"].items()
        }
        # hybrid artifacts carry a second kernel set: the attention
        # decode kernel that reads each cropped segment
        self._decode_calls: Dict[int, Any] = {
            int(w_str): load_kernel(fname)
            for w_str, fname in m.get("decode_files", {}).items()
        }

    @classmethod
    def load(cls, base_dir: str, mesh: Any = None) -> "ServingArtifact":
        """Open an artifact directory.  ``mesh=True`` (or an explicit
        ``jax.sharding.Mesh``) serves it data-parallel across the mesh —
        the multi-chip deployment story promised by the export-time
        mesh-engine rejection."""
        return cls(base_dir, mesh=mesh)

    # -- host pipeline (predict_serving parity) -----------------------------
    def _decode_rows(
        self, pred, aux, n_real: int, return_confidence: bool, conf=None
    ):
        """Token rows -> texts via the SHARED contracts in
        `rcnn_ocr_tpu.postprocess` — the same functions the live engine's
        `predict_serving` runs, so artifact and live decodes cannot
        diverge.  ``conf`` is the v5 CTC kernels' [B] confidence row."""
        from rcnn_ocr_tpu.postprocess import (
            ctc_skip_ids,
            decode_attention_row,
            decode_ctc_batch,
        )

        ids = self._ids
        pred = np.asarray(pred)
        if self.method == "attention_beam":
            from rcnn_ocr_tpu.postprocess import decode_beam_row

            scores = np.asarray(aux)
            return [
                decode_beam_row(
                    pred[j],
                    scores[j],
                    self._itos,
                    pad_id=ids["pad"],
                    eos_id=ids["eos"],
                    blank_id=ids["blank"],
                    return_confidence=return_confidence,
                )
                for j in range(n_real)
            ]
        if self.method in ("ctc", "ctc_greedy", "ctc_beam"):
            texts = decode_ctc_batch(
                pred,
                aux,
                n_real,
                self._itos,
                ctc_skip_ids(
                    ids["pad"], ids["sos"], ids["eos"], ids["ctc_blank"]
                ),
            )
            if return_confidence:
                conf_rows = np.asarray(conf)
                return [
                    (texts[j], float(conf_rows[j])) for j in range(n_real)
                ]
            return texts
        if self.method != "attention":
            raise ValueError(
                f"artifact decode method {self.method!r} is unknown to this "
                f"loader (format {self.manifest['format_version']}); upgrade "
                "rcnn_ocr_tpu on the serving host"
            )
        maxp = np.asarray(aux)
        return [
            decode_attention_row(
                pred[j],
                maxp[j],
                self._itos,
                pad_id=ids["pad"],
                eos_id=ids["eos"],
                blank_id=ids["blank"],
                return_confidence=return_confidence,
            )
            for j in range(n_real)
        ]

    def _predict_long(
        self, images_list: List[Any], return_confidence: bool = False
    ) -> List[Any]:
        """Unbounded-width stitched decode from the exported tile kernel.

        Runs the SAME host driver as the live engine's ``predict_ctc_long``
        / ``predict_long`` (`rcnn_ocr_tpu.long_lines`: plan_tiles -> per-
        tile kernel -> junction cuts / text merge), with the per-tile work
        going through the deserialized StableHLO kernel — so artifact and
        live long-line decodes cannot diverge.
        """
        from rcnn_ocr_tpu.data.transforms import ResizeAndPad, load_rgb_uint8
        from rcnn_ocr_tpu.long_lines import plan_tiles
        from rcnn_ocr_tpu.postprocess import pad_rows

        m = self.manifest
        tile_w, overlap = self.tile_w, self.overlap
        pad_one = ResizeAndPad(img_h=self.img_h, img_w=tile_w)
        if self.method in HYBRID_LONG_METHODS:
            return self._predict_hybrid(
                images_list, tile_w, overlap, pad_one, return_confidence
            )
        tiles, plans = plan_tiles(
            [load_rgb_uint8(img) for img in images_list],
            self.img_h, tile_w, overlap, pad_one,
        )
        call = self._calls[tile_w]

        if self.method in ATTN_LONG_METHODS:
            # per-tile seq2seq decode; junction policy from the manifest —
            # frame-aligned (the kernel also ships the attention argmax)
            # or text-space merge, exactly like the live predict_long
            from rcnn_ocr_tpu.long_lines import (
                merge_tile_texts,
                stitch_aligned_rows,
            )
            from rcnn_ocr_tpu.postprocess import decode_attention_row

            ids = self._ids
            aligned = m.get("merge", "text") == "align"
            tok_rows: List[np.ndarray] = []
            align_rows: List[np.ndarray] = []
            for i in range(0, len(tiles), self.batch_size):
                chunk, n_real = pad_rows(
                    tiles[i : i + self.batch_size], self.batch_size
                )
                outs = call(self.variables, self._device_batch(np.stack(chunk)))
                tok_rows.extend(np.asarray(outs[0])[:n_real])
                if aligned:
                    align_rows.extend(np.asarray(outs[-1])[:n_real])

            def tile_text(row: np.ndarray) -> str:
                return decode_attention_row(
                    row, None, self._itos,
                    pad_id=ids["pad"], eos_id=ids["eos"],
                    blank_id=ids["blank"], return_confidence=False,
                )

            skip_ids = {
                v for v in (ids["pad"], ids["blank"]) if v is not None
            }
            out: List[str] = []
            for first, starts in plans:
                if len(starts) == 1:
                    out.append(tile_text(tok_rows[first]))
                elif aligned:
                    out.append(stitch_aligned_rows(
                        np.stack(tok_rows[first : first + len(starts)]),
                        np.stack(align_rows[first : first + len(starts)]),
                        starts, tile_w, int(m["frames_t"]),
                        eos_id=ids["eos"], skip_ids=skip_ids,
                        itos=self._itos,
                    ))
                else:
                    texts = [
                        tile_text(tok_rows[first + j])
                        for j in range(len(starts))
                    ]
                    out.append(merge_tile_texts(texts, tile_w, starts))
            return out

        from rcnn_ocr_tpu.long_lines import (
            decode_stitched,
            decode_stitched_ids,
            extract_tile_frames,
            extract_tile_ids,
        )
        from rcnn_ocr_tpu.postprocess import ctc_skip_ids

        ids = self._ids
        skip = ctc_skip_ids(
            ids["pad"], ids["sos"], ids["eos"], ids["ctc_blank"]
        )
        tk = m.get("tile_kernel")
        if tk in ("argmax", "argmax_maxp"):
            # greedy/midpoint artifacts carry the per-frame-ids kernel
            # (v5: + the max-softmax row feeding stitched confidence)
            with_maxp = tk == "argmax_maxp"
            got = extract_tile_ids(
                tiles, self.batch_size,
                lambda b: call(self.variables, self._device_batch(b)),
                with_maxp=with_maxp,
            )
            frame_ids, maxp = got if with_maxp else (got, None)
            return decode_stitched_ids(
                frame_ids, plans, tile_w,
                blank_id=ids["ctc_blank"], itos=self._itos, skip_ids=skip,
                maxp=maxp if return_confidence else None,
            )
        vals, idx = extract_tile_frames(
            tiles, self.batch_size,
            lambda batch: call(self.variables, self._device_batch(batch)),
        )
        return decode_stitched(
            vals, idx, plans, tile_w,
            blank_id=ids["ctc_blank"],
            num_classes=len(self._itos),
            itos=self._itos,
            skip_ids=skip,
            method="beam" if self.method == "ctc_long_beam" else "greedy",
            beam_width=int(m.get("beam_width", 16)),
            snap=m.get("snap", "midpoint"),
            return_confidence=return_confidence,
        )

    def _predict_hybrid(
        self,
        images_list: List[Any],
        tile_w: int,
        overlap: int,
        pad_one,
        return_confidence: bool = False,
    ) -> List[Any]:
        """Hybrid decode from the artifact's TWO kernels, through the SAME
        host driver as the live engine (`long_lines.hybrid_decode_driver`)
        — the CTC tile kernel locates character groups, the attention
        decode kernel reads each full-resolution crop."""
        from rcnn_ocr_tpu.data.transforms import load_rgb_uint8
        from rcnn_ocr_tpu.long_lines import hybrid_decode_driver
        from rcnn_ocr_tpu.postprocess import (
            decode_attention_row,
            decode_beam_row,
        )

        m = self.manifest
        ids = self._ids
        call = self._calls[tile_w]
        dec = self._decode_calls[tile_w]
        if m.get("tile_kernel") == "argmax":
            tile_fn = lambda b: call(self.variables, self._device_batch(b))  # noqa: E731
        else:
            # early round-4 hybrid artifacts shipped the top-k kernel;
            # slice to argmax on device so only [B, T] crosses the link
            tile_fn = lambda b: call(  # noqa: E731
                self.variables, self._device_batch(b)
            )[1][..., 0]
        row_fn = (
            decode_beam_row
            if self.method == "hybrid_long_beam"
            else decode_attention_row
        )

        def decode_row(pred_row, aux_row):
            return row_fn(
                pred_row, aux_row, self._itos,
                pad_id=ids["pad"], eos_id=ids["eos"],
                blank_id=ids["blank"], return_confidence=return_confidence,
            )

        return hybrid_decode_driver(
            [load_rgb_uint8(img) for img in images_list],
            self.img_h, tile_w, overlap, pad_one, self.batch_size,
            tile_fn=tile_fn,
            decode_fn=lambda b: dec(self.variables, self._device_batch(b)),
            decode_row=decode_row,
            blank_id=ids["ctc_blank"],
            min_gap=int(m.get("min_gap", 3)),
            margin=int(m.get("margin", 1)),
            return_confidence=return_confidence,
        )

    def _device_batch(self, arr: np.ndarray):
        import jax

        if self._mesh is not None:
            return jax.device_put(arr, self._data_sh)
        return arr

    def predict(
        self,
        images: Union[Any, List[Any]],
        return_confidence: bool = False,
    ):
        """Decode image paths / arrays / PIL images to strings.

        Single image in -> single result out (``OCRInference`` parity).
        """
        from rcnn_ocr_tpu.data.loader import bucket_for_width, scaled_width
        from rcnn_ocr_tpu.data.transforms import load_rgb_uint8
        from rcnn_ocr_tpu.ops.preprocess import (
            host_letterbox,
            host_resize_geometry,
        )

        if return_confidence and self.method in ATTN_LONG_METHODS:
            raise ValueError(
                "return_confidence is not supported by tiled attention-merge "
                "artifacts (junction-merged decodes have no step-aligned "
                "confidence) — use hybrid_long or a ctc method"
            )
        if (
            return_confidence
            and not self.manifest.get("ctc_confidence", False)
            and (
                self.method in ("ctc", "ctc_greedy", "ctc_beam")
                or (
                    self.method == "ctc_long"
                    and self.manifest.get("tile_kernel") != "topk"
                )
            )
        ):
            raise ValueError(
                "this artifact was exported without the CTC confidence "
                "outputs — re-export with with_confidence=True "
                "(export_serving_artifact) / --confidence (the CLI) to "
                "serve confidences"
            )
        is_single = not isinstance(images, list)
        images_list = [images] if is_single else list(images)
        if not images_list:
            return []
        if self.method in LONG_METHODS:
            results_long = self._predict_long(images_list, return_confidence)
            return results_long[0] if is_single else results_long

        rgb = [load_rgb_uint8(img) for img in images_list]
        groups: Dict[int, List[int]] = {}
        for i, arr in enumerate(rgb):
            w = bucket_for_width(
                scaled_width(arr.shape[0], arr.shape[1], self.img_h), self.widths
            )
            groups.setdefault(w, []).append(i)
        from rcnn_ocr_tpu.postprocess import chunk_indices, pad_rows

        chunks = chunk_indices(groups, self.batch_size)

        canvas_h, canvas_w = self.canvas

        def letterbox_chunk(chunk):
            w, idxs = chunk
            rows, n_real = pad_rows([rgb[j] for j in idxs], self.batch_size)
            raw, sizes = host_letterbox(rows, canvas_h, canvas_w)
            geom = host_resize_geometry(sizes, self.img_h, w)
            return w, idxs, n_real, raw, np.concatenate([sizes, geom], axis=1)

        results: List[Any] = [None] * len(images_list)
        # predict_serving parity: letterbox chunk k+1 on a worker thread
        # while chunk k computes on device (the decode fetch blocks)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = pool.submit(letterbox_chunk, chunks[0]) if chunks else None
            for k in range(len(chunks)):
                w, idxs, n_real, raw, sizes = pending.result()
                if k + 1 < len(chunks):
                    pending = pool.submit(letterbox_chunk, chunks[k + 1])
                out = self._calls[w](self.variables, raw, sizes)
                # v5 CTC kernels always ship (pred, aux, conf); older
                # kernels and every attention kernel ship (pred, aux)
                pred, aux = out[0], out[1]
                conf = out[2] if len(out) == 3 else None
                texts = self._decode_rows(
                    pred, aux, n_real, return_confidence, conf=conf
                )
                for j, out_idx in enumerate(idxs):
                    results[out_idx] = texts[j]
        return results[0] if is_single else results
