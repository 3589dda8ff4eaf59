"""Dataset evaluation CLI.

Mirror of the reference CLI (`/root/reference/evaluate_dataset.py`):

    python evaluate_dataset.py --model model.msgpack --charset charset.txt \
        --csv labels.csv --root images/

Loads a labeled CSV (columns ``filename``, ``text``; extension guessing
fallback), runs batched prediction, reports exact-match accuracy / CER /
WER with min/max/median stats and the top-5 worst-CER examples, and writes
``evaluation_results_<model>.csv`` with per-sample rows.

Extensions over the reference: ``--decode`` picks the head and search
(``attention`` greedy | ``attention_beam`` | ``ctc_greedy`` | ``ctc_beam``,
plus the unbounded-width long-line paths ``ctc_long[_beam]`` |
``attention_long[_beam]`` | ``hybrid_long[_beam]`` with ``--tile-w`` /
``--overlap``), ``--lm/--lm-weight`` fuse a bigram LM into the beams (a
comma list of weights sweeps them and prints a comparison table),
``--artifact DIR`` certifies an exported deployment unit instead of a
checkpoint, ``--error-analysis`` appends length-stratified metrics and
character-confusion tables, ``--report-json`` writes everything as JSON
for CI gates, and reference ``.pth`` checkpoints load directly.
"""

from __future__ import annotations

import argparse
import math
import os
from typing import List, Optional, Tuple

import numpy as np

from rcnn_ocr_tpu.inference import OCRInference
from rcnn_ocr_tpu.training.metrics import (
    batch_character_error_rate,
    character_error_rate,
    compute_accuracy,
    word_error_rate,
)

IMAGE_EXTS = [".png", ".jpg", ".jpeg", ".bmp", ".tiff"]


def load_dataset(csv_path: str, root_path: str) -> Tuple[List[str], List[str]]:
    """CSV with filename/text columns -> (image_paths, texts)."""
    if not os.path.exists(csv_path):
        raise FileNotFoundError(f"CSV file not found: {csv_path}")
    if not os.path.exists(root_path):
        raise FileNotFoundError(f"Images folder not found: {root_path}")

    import pandas as pd

    df = pd.read_csv(csv_path)
    if "filename" not in df.columns or "text" not in df.columns:
        raise ValueError("CSV must contain 'filename' and 'text' columns")

    image_paths: List[str] = []
    texts: List[str] = []
    for _, row in df.iterrows():
        filename = row["filename"]
        text = str(row["text"])
        image_path = os.path.join(root_path, filename)
        if not os.path.exists(image_path):
            for ext in IMAGE_EXTS:
                candidate = os.path.join(root_path, str(filename) + ext)
                if os.path.exists(candidate):
                    image_path = candidate
                    break
        if os.path.exists(image_path):
            image_paths.append(image_path)
            texts.append(text)
        else:
            print(f"  image not found: {filename}")
    return image_paths, texts


def evaluate_model(
    model_path: Optional[str] = None,
    charset_path: Optional[str] = None,
    csv_path: str = "",
    root_path: str = "",
    batch_size: int = 16,
    max_samples: int | None = None,
    img_h: int = 32,
    img_w: int = 128,
    decode: str = "attention",
    max_length: int = 25,
    beam_width: int = 16,
    lm: Optional[str] = None,
    lm_weight: float = 0.0,
    length_penalty: float = 0.0,
    width_buckets=None,
    quantize: bool = False,
    serving: bool = False,
    static_quant: bool = False,
    save_calibration: Optional[str] = None,
    artifact: Optional[str] = None,
    tile_w: Optional[int] = None,
    overlap: Optional[int] = None,
    error_analysis: bool = False,
):
    if serving and decode not in (
        "attention", "attention_beam", "ctc_greedy", "ctc_beam"
    ):
        raise ValueError(f"--serving does not support --decode {decode!r}")
    long_decode = decode.startswith(("ctc_long", "attention_long", "hybrid_long"))
    if (tile_w or overlap) and not long_decode:
        raise ValueError("--tile-w/--overlap require a *_long --decode")
    print("Evaluating model on dataset")
    if artifact:
        # deployment-unit certification: the decode configuration is baked
        # into the artifact manifest at export time
        print(f"  artifact: {artifact}")
    else:
        print(f"  model:   {model_path}")
        print(f"  charset: {charset_path}")
    print(f"  csv:     {csv_path}")
    print(f"  images:  {root_path}")
    if not artifact:
        print(
            f"  size:    {img_h}x{img_w}   decode: {decode}"
            f"{'   int8' if quantize else ''}{'-static' if static_quant else ''}"
            f"{'   serving' if serving else ''}"
        )
    print("-" * 60)

    image_paths, true_texts = load_dataset(csv_path, root_path)
    if max_samples:
        image_paths = image_paths[:max_samples]
        true_texts = true_texts[:max_samples]
    print(f"Found {len(image_paths)} samples")
    if not image_paths:
        print("No data to evaluate!")
        return None

    if isinstance(width_buckets, str) and width_buckets.startswith("auto"):
        # "auto" / "auto:K": derive the K waste-minimizing widths from the
        # eval data itself (same DP the training loop uses)
        k = int(width_buckets.split(":")[1]) if ":" in width_buckets else 4
        from rcnn_ocr_tpu.data.loader import optimal_width_buckets, scaled_width
        from rcnn_ocr_tpu.data.transforms import image_size

        sizes = [image_size(p) for p in image_paths]
        scaled = [scaled_width(h, w, img_h) for h, w in sizes]
        width_buckets = optimal_width_buckets(
            scaled, k, multiple=8, max_width=img_w
        )
        print(f"Auto width buckets (k={k}): {width_buckets}")

    if artifact:
        from rcnn_ocr_tpu.export import ServingArtifact

        art = ServingArtifact.load(artifact)
        print(
            f"  artifact method: {art.method}   batch: {art.batch_size}"
        )
        from tqdm import tqdm as _tqdm

        predicted: List[str] = []
        for i in _tqdm(range(0, len(image_paths), art.batch_size), desc="Predict"):
            out = art.predict(image_paths[i : i + art.batch_size])
            predicted.extend(out if isinstance(out, list) else [out])
        return _report_metrics(
            true_texts, predicted, image_paths,
            os.path.basename(artifact.rstrip("/")),
            error_analysis=error_analysis,
        )

    if lm_weight and decode not in (
        "attention_beam", "ctc_beam", "attention_long_beam", "hybrid_long_beam"
    ):
        raise ValueError(
            "--lm-weight requires --decode attention_beam, ctc_beam, "
            "attention_long_beam, or hybrid_long_beam"
        )
    if length_penalty and decode not in (
        "attention_beam", "attention_long_beam", "hybrid_long_beam"
    ):
        raise ValueError(
            "--length-penalty requires --decode attention_beam, "
            "attention_long_beam, or hybrid_long_beam"
        )
    ocr = OCRInference(
        model_path, charset_path, device="auto", img_h=img_h, img_w=img_w,
        width_buckets=width_buckets, quantize=quantize, lm=lm,
    )
    if static_quant:
        # calibrate static int8 activation scales on a data sample
        n_cal = min(256, len(image_paths))
        print(f"Calibrating static int8 scales on {n_cal} images ...")
        ocr.calibrate(image_paths[:n_cal], batch_size=min(batch_size, n_cal))
        if save_calibration:
            ocr.save_calibration(save_calibration)
            print(f"Calibrated checkpoint written to: {save_calibration}")

    from tqdm import tqdm

    predicted: List[str] = []
    for i in tqdm(range(0, len(image_paths), batch_size), desc="Predict"):
        chunk = image_paths[i : i + batch_size]
        if serving:
            out = ocr.predict_serving(
                chunk,
                max_length=max_length,
                batch_size=batch_size,
                method=decode,  # every --decode choice is a serving method too
                beam_width=beam_width,
                length_penalty=(
                    length_penalty if decode == "attention_beam" else 0.0
                ),
                lm_weight=lm_weight,
            )
            predicted.extend(out if isinstance(out, list) else [out])
        elif decode == "attention":
            predicted.extend(ocr.predict(chunk, max_length=max_length, batch_size=batch_size))
        elif decode == "attention_beam":
            predicted.extend(
                ocr.predict(
                    chunk, max_length=max_length, batch_size=batch_size,
                    beam_width=beam_width, lm_weight=lm_weight,
                    length_penalty=length_penalty,
                )
            )
        elif decode == "ctc_greedy":
            predicted.extend(ocr.predict_ctc(chunk, batch_size=batch_size, method="greedy"))
        elif decode == "ctc_beam":
            predicted.extend(
                ocr.predict_ctc(
                    chunk, batch_size=batch_size, method="beam",
                    beam_width=beam_width, lm_weight=lm_weight,
                )
            )
        elif decode in ("ctc_long", "ctc_long_beam"):
            predicted.extend(
                ocr.predict_ctc_long(
                    chunk, tile_w=tile_w, overlap=overlap,
                    batch_size=batch_size,
                    method="beam" if decode.endswith("beam") else "greedy",
                    beam_width=beam_width,
                )
            )
        elif long_decode:
            # attention_long[_beam] / hybrid_long[_beam] via the one
            # unbounded-width entry point
            method = {
                "attention_long": "attention",
                "attention_long_beam": "attention_beam",
                "hybrid_long": "hybrid",
                "hybrid_long_beam": "hybrid_beam",
            }[decode]
            predicted.extend(
                ocr.predict_long(
                    chunk, method=method, tile_w=tile_w, overlap=overlap,
                    batch_size=batch_size, max_length=max_length,
                    beam_width=beam_width, lm_weight=lm_weight,
                    length_penalty=length_penalty,
                )
            )
        else:
            raise ValueError(f"unknown decode mode: {decode}")

    return _report_metrics(
        true_texts, predicted, image_paths, os.path.basename(model_path),
        error_analysis=error_analysis,
    )


def _error_analysis(true_texts, predicted, cers) -> dict:
    """Length-stratified metrics + top character confusions.

    The analysis a production accuracy review actually starts from: WHERE
    the errors live (text-length buckets — long-line degradation shows
    here first) and WHAT the model confuses (minimal-edit substitution /
    insertion / deletion counts via `metrics.edit_ops`)."""
    from collections import Counter

    from rcnn_ocr_tpu.training.metrics import edit_ops

    # first bucket starts at 0: empty ground-truth rows (blank-line
    # images, a real OCR failure class when text appears on them) must
    # show in the table, not silently vanish from the stratification
    buckets = [(0, 5), (6, 10), (11, 15), (16, 20), (21, None)]
    by_length = []
    for lo, hi in buckets:
        rows = [
            (t, p, c)
            for t, p, c in zip(true_texts, predicted, cers)
            if len(t) >= lo and (hi is None or len(t) <= hi)
        ]
        if not rows:
            continue
        by_length.append({
            "length": f"{lo}-{hi if hi is not None else ''}".rstrip("-") + ("+" if hi is None else ""),
            "n": len(rows),
            "accuracy": sum(1 for t, p, _ in rows if t == p) / len(rows),
            "cer": float(np.mean([c for _, _, c in rows])),
        })

    subs: Counter = Counter()
    ins: Counter = Counter()
    dels: Counter = Counter()
    skipped_long = 0
    for t, p in zip(true_texts, predicted):
        if t == p:
            continue
        if len(t) * len(p) > 4_000_000:  # pathological pair; O(nm) DP
            skipped_long += 1
            continue
        for op, rc, hc in edit_ops(t, p):
            if op == "sub":
                subs[(rc, hc)] += 1
            elif op == "ins":
                ins[hc] += 1
            else:
                dels[rc] += 1
    return {
        "by_length": by_length,
        "top_substitutions": [
            {"true": rc, "predicted": hc, "count": n}
            for (rc, hc), n in subs.most_common(15)
        ],
        "top_insertions": [
            {"predicted": hc, "count": n} for hc, n in ins.most_common(10)
        ],
        "top_deletions": [
            {"true": rc, "count": n} for rc, n in dels.most_common(10)
        ],
        "pairs_skipped_too_long": skipped_long,
    }


def _print_error_analysis(analysis: dict) -> None:
    print("\nAccuracy by true-text length:")
    print(f"{'length':>8} {'n':>6} {'accuracy':>10} {'CER':>8}")
    for row in analysis["by_length"]:
        print(
            f"{row['length']:>8} {row['n']:>6} "
            f"{row['accuracy']:>10.4f} {row['cer']:>8.4f}"
        )
    if analysis["top_substitutions"]:
        print("\nTop character confusions (true -> predicted x count):")
        for row in analysis["top_substitutions"]:
            print(f"  {row['true']!r} -> {row['predicted']!r} x {row['count']}")
    if analysis["top_insertions"]:
        ins = ", ".join(
            f"{r['predicted']!r} x {r['count']}"
            for r in analysis["top_insertions"]
        )
        print(f"Top spurious insertions: {ins}")
    if analysis["top_deletions"]:
        dels = ", ".join(
            f"{r['true']!r} x {r['count']}" for r in analysis["top_deletions"]
        )
        print(f"Top dropped characters:  {dels}")
    if analysis["pairs_skipped_too_long"]:
        print(
            f"(confusions skipped for {analysis['pairs_skipped_too_long']} "
            "pathologically long pairs)"
        )


def _report_metrics(
    true_texts, predicted, image_paths, result_name, error_analysis=False
):
    """Accuracy/CER/WER summary + per-sample CSV (shared by the live-engine
    and --artifact evaluation paths)."""
    accuracy = compute_accuracy(true_texts, predicted)
    # one native FFI call for the whole dataset (falls back per-pair)
    cers = batch_character_error_rate(true_texts, predicted)
    wers = []
    for t, p in zip(true_texts, predicted):
        w = word_error_rate(t, p)
        wers.append(1.0 if not math.isfinite(w) else w)
    avg_cer = float(np.mean(cers))
    avg_wer = float(np.mean(wers))

    print("\n" + "=" * 60)
    print("EVALUATION RESULTS")
    print("=" * 60)
    print(f"Samples:               {len(image_paths)}")
    print(f"Accuracy (exact match): {accuracy:.4f} ({accuracy * 100:.2f}%)")
    print(f"Mean CER:               {avg_cer:.4f} ({avg_cer * 100:.2f}%)")
    print(f"Mean WER:               {avg_wer:.4f} ({avg_wer * 100:.2f}%)")
    print("\nError stats:")
    print(f"CER: min={min(cers):.3f}, max={max(cers):.3f}, median={np.median(cers):.3f}")
    print(f"WER: min={min(wers):.3f}, max={max(wers):.3f}, median={np.median(wers):.3f}")

    print("\nWorst examples (top-5 by CER):")
    worst = sorted(zip(true_texts, predicted, cers), key=lambda x: x[2], reverse=True)
    for i, (true, pred, cer) in enumerate(worst[:5]):
        print(f"{i + 1}. CER={cer:.3f}")
        print(f"   true:      '{true}'")
        print(f"   predicted: '{pred}'")
        print()

    import pandas as pd

    results_df = pd.DataFrame(
        {
            "image_path": [os.path.basename(p) for p in image_paths],
            "true_text": true_texts,
            "predicted_text": predicted,
            "cer": cers,
            "wer": wers,
            "exact_match": [t == p for t, p in zip(true_texts, predicted)],
        }
    )
    output_path = f"evaluation_results_{result_name}.csv"
    results_df.to_csv(output_path, index=False, encoding="utf-8")
    print(f"Per-sample results written to: {output_path}")
    out = {"accuracy": accuracy, "cer": avg_cer, "wer": avg_wer, "n": len(image_paths)}
    if error_analysis:
        out["analysis"] = _error_analysis(true_texts, predicted, cers)
        _print_error_analysis(out["analysis"])
    return out


def _parse_lm_weights(raw) -> List[float]:
    """``--lm-weight`` comma list -> floats (raises ValueError on garbage)."""
    return [float(v) for v in str(raw).split(",") if v.strip() != ""]


def _lm_weight_given(raw) -> bool:
    """Whether ``--lm-weight`` asks for fusion (numerically non-zero)."""
    try:
        return _parse_lm_weights(raw) != [0.0]
    except ValueError:
        return True


def main() -> int:
    parser = argparse.ArgumentParser(description="Evaluate an OCR model on a dataset")
    parser.add_argument("--model", type=str, default=None, help="model checkpoint (.msgpack or .pth)")
    parser.add_argument("--charset", type=str, default=None, help="charset file (with --model)")
    parser.add_argument(
        "--artifact", type=str, default=None,
        help="evaluate an exported serving artifact directory instead of a "
        "checkpoint — certifies the actual deployment unit (decode "
        "method/settings come from its manifest)",
    )
    parser.add_argument("--csv", type=str, required=True, help="labels CSV")
    parser.add_argument("--root", type=str, required=True, help="images folder")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--img-h", type=int, default=32)
    parser.add_argument("--img-w", type=int, default=128)
    parser.add_argument(
        "--decode",
        type=str,
        default="attention",
        choices=[
            "attention", "attention_beam", "ctc_greedy", "ctc_beam",
            "ctc_long", "ctc_long_beam",  # unbounded-width stitched decode
            "attention_long", "attention_long_beam",  # tiled seq2seq + merge
            "hybrid_long", "hybrid_long_beam",  # CTC segments, attention reads
        ],
    )
    parser.add_argument(
        "--tile-w", type=int, default=None,
        help="*_long decodes: tile width in px (default: the model img_w)",
    )
    parser.add_argument(
        "--overlap", type=int, default=None,
        help="*_long decodes: junction overlap in px "
        "(default: min(64, tile_w/2))",
    )
    parser.add_argument("--max-length", type=int, default=25)
    parser.add_argument("--beam-width", type=int, default=16)
    parser.add_argument(
        "--lm", default=None, metavar="LM.npz",
        help="bigram LM for attention_beam shallow fusion (tools/train_lm.py)",
    )
    parser.add_argument(
        "--length-penalty", type=float, default=0.0,
        help="attention_beam rank normalization: score / len**p (0 = off)",
    )
    parser.add_argument(
        "--lm-weight", type=str, default="0.0",
        help="fusion weight (0 = off); requires --decode attention_beam "
        "or ctc_beam.  A comma list (0,0.2,0.4) sweeps the values and "
        "prints a comparison table — the standard way to tune fusion",
    )
    parser.add_argument(
        "--width-buckets", type=str, default=None,
        help="comma-separated static widths, e.g. 64,128,256 (less pad "
        "waste); or auto:K to derive K optimal widths from the eval data",
    )
    parser.add_argument(
        "--quantize", action="store_true",
        help="int8 inference for the wide conv stages (the bench headline path)",
    )
    parser.add_argument(
        "--serving", action="store_true",
        help="on-device preprocessing + double-buffered host letterbox "
        "(attention decode; fastest end-to-end path)",
    )
    parser.add_argument(
        "--static-quant", action="store_true",
        help="with --quantize: calibrate static int8 activation scales on "
        "up to 256 eval images (drops the per-conv abs-max pass)",
    )
    parser.add_argument(
        "--save-calibration", metavar="PATH", default=None,
        help="with --static-quant: write a copy of the checkpoint with the "
        "calibrated scales embedded (re-opens straight onto the static path)",
    )
    parser.add_argument(
        "--error-analysis", action="store_true",
        help="append accuracy-by-text-length and top character "
        "confusion/insertion/deletion tables (minimal-edit alignment) — "
        "where the errors live and what the model confuses",
    )
    parser.add_argument(
        "--report-json", metavar="PATH", default=None,
        help="write the metrics (and --error-analysis tables, and the "
        "lm-weight sweep when given a list) as JSON — for CI accuracy "
        "gates and dashboards",
    )
    parser.add_argument(
        "--compile-cache-dir", default=None,
        help="persistent XLA compile cache; repeat evaluations skip the "
        "remote compile (tools/compile_cache_probe.py: 3 s warm vs 199-335 s cold)",
    )
    args = parser.parse_args()

    if args.compile_cache_dir:
        from rcnn_ocr_tpu.utils import enable_compile_cache

        enable_compile_cache(args.compile_cache_dir)

    if bool(args.artifact) == bool(args.model):
        print("Pass exactly one of --model or --artifact")
        return 1
    if args.artifact:
        # the artifact bakes its decode configuration at export time —
        # refuse knobs that cannot apply instead of silently ignoring them
        baked = {
            "--charset": args.charset is not None,
            "--decode": args.decode != parser.get_default("decode"),
            "--beam-width": args.beam_width != parser.get_default("beam_width"),
            "--max-length": args.max_length != parser.get_default("max_length"),
            "--lm": args.lm is not None,
            # numeric compare: "--lm-weight 0" / "0.00" means OFF, not a
            # baked-knob conflict (string compare flagged it spuriously);
            # garbage counts as given so it is refused loudly here too
            "--lm-weight": _lm_weight_given(args.lm_weight),
            "--length-penalty": args.length_penalty != 0.0,
            "--width-buckets": args.width_buckets is not None,
            "--quantize": args.quantize,
            "--serving": args.serving,
            "--static-quant": args.static_quant,
            "--tile-w": args.tile_w is not None,
            "--overlap": args.overlap is not None,
            "--img-h": args.img_h != parser.get_default("img_h"),
            "--img-w": args.img_w != parser.get_default("img_w"),
            "--batch-size": args.batch_size != parser.get_default("batch_size"),
            "--save-calibration": args.save_calibration is not None,
        }
        conflicting = [flag for flag, given in baked.items() if given]
        if conflicting:
            print(
                f"{', '.join(conflicting)} cannot be used with --artifact "
                "(baked in at export time; re-export to change them)"
            )
            return 1
        if not os.path.exists(os.path.join(args.artifact, "manifest.json")):
            print(f"Artifact not found: {args.artifact}")
            return 1
    else:
        if args.charset is None:
            print("--charset is required with --model")
            return 1
        if not os.path.exists(args.model):
            print(f"Model not found: {args.model}")
            return 1
        if not os.path.exists(args.charset):
            print(f"Charset not found: {args.charset}")
            return 1
    try:
        lm_weights = _parse_lm_weights(args.lm_weight)
    except ValueError:
        print(f"--lm-weight is not a comma list of numbers: {args.lm_weight!r}")
        return 1
    if not lm_weights:
        print(f"--lm-weight parsed to an empty sweep: {args.lm_weight!r}")
        return 1
    try:
        sweep = []
        for w in lm_weights:
            if len(lm_weights) > 1:
                print(f"\n##### lm_weight = {w} #####")
            metrics = evaluate_model(
                model_path=args.model,
                charset_path=args.charset,
                csv_path=args.csv,
                root_path=args.root,
                batch_size=args.batch_size,
                max_samples=args.max_samples,
                img_h=args.img_h,
                img_w=args.img_w,
                decode=args.decode,
                max_length=args.max_length,
                beam_width=args.beam_width,
                lm=args.lm,
                lm_weight=w,
                length_penalty=args.length_penalty,
                width_buckets=(
                    args.width_buckets
                    if args.width_buckets and args.width_buckets.startswith("auto")
                    else [int(v) for v in args.width_buckets.split(",")]
                    if args.width_buckets
                    else None
                ),
                quantize=args.quantize or args.static_quant,
                serving=args.serving,
                static_quant=args.static_quant,
                save_calibration=args.save_calibration,
                artifact=args.artifact,
                tile_w=args.tile_w,
                overlap=args.overlap,
                error_analysis=args.error_analysis,
            )
            sweep.append((w, metrics))
        if len(sweep) > 1:
            print("\nLM-weight sweep (pick the CER minimum):")
            print(f"{'lm_weight':>10} {'accuracy':>10} {'CER':>8} {'WER':>8}")
            for w, m in sweep:
                if m:
                    print(
                        f"{w:>10.3f} {m['accuracy']:>10.4f} "
                        f"{m['cer']:>8.4f} {m['wer']:>8.4f}"
                    )
        if args.report_json:
            import json as json_mod

            payload = (
                sweep[0][1]
                if len(sweep) == 1
                else {
                    "sweep": [
                        dict(m, lm_weight=w) for w, m in sweep if m
                    ]
                }
            )
            if payload is None or payload == {"sweep": []}:
                # an empty dataset must not hand a CI gate `null` with a
                # green exit code
                print(
                    f"No metrics to report — {args.report_json} not written"
                )
                return 1
            with open(args.report_json, "w", encoding="utf-8") as f:
                json_mod.dump(payload, f, ensure_ascii=False, indent=2)
            print(f"JSON report written to: {args.report_json}")
    except Exception as e:
        print(f"Error: {e}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
