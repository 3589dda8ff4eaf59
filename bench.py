"""Throughput benchmark: batched greedy-decode inference on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Measures the flagship pipeline at the reference's shipped input size
(32x128, charset 194, max_len 25 decoder steps == the BASELINE.json
configuration): CNN encode + BiLSTM + autoregressive greedy decode, and a
CTC greedy decode variant (the BASELINE metric names greedy CTC decode).
The reported headline is the CTC-greedy number; both are printed to
stderr for context.  Baseline target: 20,000 line-images/sec/chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMGS_PER_SEC = 20_000.0


def _fetch(out):
    """Force completion with a real device->host transfer (some remote
    platforms no-op block_until_ready; an in-order device must finish all
    queued work before the final output can be copied out)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), out)


def _time_fn(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def _render_calibration_batch(batch, img_h, img_w, seed=0):
    """Rendered text lines for int8-static calibration (NOT noise): the
    static activation scales the headline path serves with should come
    from image-like activations.  Falls back to Gaussian noise when no
    fonts are discoverable (throughput itself is input-independent)."""
    try:
        from rcnn_ocr_tpu.data.synthetic import (
            discover_fonts,
            render_line,
            sample_texts,
        )
        from rcnn_ocr_tpu.data.transforms import ResizeAndPad, normalize_unit

        fonts = discover_fonts()
        if not fonts:
            raise RuntimeError("no fonts")
        rng = np.random.default_rng(seed)
        texts = sample_texts(batch, rng, max_len=18)
        pad = ResizeAndPad(img_h=img_h, img_w=img_w)
        rows = [
            normalize_unit(
                pad(render_line(
                    t, fonts[i % len(fonts)], img_h=img_h,
                    rng=np.random.default_rng([seed, i]),
                    difficulty="medium",
                ))
            )
            for i, t in enumerate(texts)
        ]
        return np.stack(rows).astype(np.float32), "rendered"
    except Exception as e:  # noqa: BLE001 - calibration input is best-effort
        print(f"[bench] calibration render unavailable ({e}); using noise",
              file=sys.stderr)
        rng = np.random.default_rng(seed)
        return rng.normal(size=(batch, img_h, img_w, 3)).astype(np.float32), "noise"


def main():
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.ops.ctc import ctc_greedy_decode_jnp
    from rcnn_ocr_tpu.utils import enable_compile_cache

    # persistent compile cache: 3 s warm vs 199-335 s cold per kernel
    # through the remote-compile tunnel — the latency/geometry rows below
    # add ~8 kernels, untenable cold on every bench run
    enable_compile_cache(
        os.environ.get("RCNN_OCR_COMPILE_CACHE", "/tmp/xla_cache")
    )

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    batch = 2048 if on_tpu else 8  # measured best throughput at 2048
    img_h, img_w = 32, 128
    num_classes = 194
    max_len = 25

    common = dict(
        num_classes=num_classes,
        hidden_size=256,
        sos_id=1,
        eos_id=2,
        pad_id=0,
        blank_id=None,
        with_ctc_head=True,
        ctc_blank_id=0,
        dtype=jnp.bfloat16,
        # measured: XLA's own fusion beats the pallas SE/LSTM kernels at
        # these shapes (49ms vs 60ms per 1024-batch) — keep them off here
        use_pallas=False,
    )
    model = RCNN(**common)
    # int8 serving path: +27% throughput at zero measured accuracy cost
    # (identical acc/CER on a trained model — see PERF.md)
    model_q = RCNN(**common, quantize=True)
    # int8 with CALIBRATED static activation scales: the quantize step fuses
    # into the producer epilogue instead of paying a per-conv abs-max pass
    model_qs = RCNN(**common, quantize=True, act_quant="static")
    rng = jax.random.PRNGKey(0)
    x_init = jnp.zeros((2, img_h, img_w, 3), jnp.float32)
    variables = model.init(
        {"params": rng},
        x_init,
        text=jnp.zeros((2, max_len + 1), jnp.int32),
        batch_max_length=max_len,
        method=model.init_all,
    )
    variables = jax.device_put(variables)

    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, img_h, img_w, 3)).astype(np.float32)
    )

    @jax.jit
    def attn_greedy(variables, images):
        logits = model.apply(variables, images, train=False, batch_max_length=max_len)
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def ctc_greedy(variables, images):
        logits = model.apply(variables, images, train=False, method=model.ctc_logits)
        tokens, valid = ctc_greedy_decode_jnp(logits, 0)
        return tokens, valid

    @jax.jit
    def ctc_greedy_int8(variables, images):
        logits = model_q.apply(variables, images, train=False, method=model_q.ctc_logits)
        tokens, valid = ctc_greedy_decode_jnp(logits, 0)
        return tokens, valid

    @jax.jit
    def calibrate(variables, images):
        _, mutated = model_qs.apply(
            variables, images, train=False, method=model_qs.encode,
            mutable=["quant_stats"],
        )
        return mutated["quant_stats"]

    @jax.jit
    def ctc_greedy_int8_static(variables, images):
        logits = model_qs.apply(
            variables, images, train=False, method=model_qs.ctc_logits
        )
        tokens, valid = ctc_greedy_decode_jnp(logits, 0)
        return tokens, valid

    @jax.jit
    def attn_greedy_int8_static(variables, images):
        logits = model_qs.apply(
            variables, images, train=False, batch_max_length=max_len
        )
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def ctc_beam_int8_static(variables, images):
        # beam search fully on device (ops/ctc.py ctc_beam_search_jax):
        # encoder -> log-probs -> top-16 frame pruning -> W=16 prefix beam
        from rcnn_ocr_tpu.ops.ctc import ctc_beam_search_jax

        logits = model_qs.apply(
            variables, images, train=False, method=model_qs.ctc_logits
        )
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        vals, idx = jax.lax.top_k(log_probs, 16)
        labels, lens, _ = ctc_beam_search_jax(
            vals, idx.astype(jnp.int32), blank_id=0, beam_width=16
        )
        return labels, lens

    if os.environ.get("BENCH_CHECK_PALLAS") == "1" and on_tpu:
        # TPU-side numerics check of the Pallas kernels (interpret-mode tests
        # run on CPU only; this asserts on the real chip).  Gated: two extra
        # remote compiles are slow, run once per round and record in PERF.md.
        from rcnn_ocr_tpu.ops.lstm_pallas import _scan_reference, bilstm_scan
        from rcnn_ocr_tpu.ops.se_pallas import se_scale, se_scale_reference

        rng_np = np.random.default_rng(1)
        # xs: [T, 2, B, 4H]; w_hh: [2, H, 4H]
        xs = jnp.asarray(rng_np.normal(size=(16, 2, 64, 4 * 32)).astype(np.float32))
        whh = jnp.asarray(rng_np.normal(size=(2, 32, 4 * 32)).astype(np.float32) * 0.1)
        got = np.asarray(jax.jit(lambda a, b: bilstm_scan(a, b, 32))(xs, whh))
        want = np.asarray(jax.jit(lambda a, b: _scan_reference(a, b, 32))(xs, whh))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
        xse = jnp.asarray(rng_np.normal(size=(8, 4, 16, 128)).astype(np.float32))
        w1 = jnp.asarray(rng_np.normal(size=(128, 8)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng_np.normal(size=(8, 128)).astype(np.float32) * 0.1)
        got = np.asarray(jax.jit(se_scale)(xse, w1, w2))
        want = np.asarray(jax.jit(se_scale_reference)(xse, w1, w2))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
        print("[bench] pallas TPU numerics check: OK", file=sys.stderr)

    dt_ctc = _time_fn(ctc_greedy, variables, images)
    ctc_ips = batch / dt_ctc
    dt_q = _time_fn(ctc_greedy_int8, variables, images)
    q_ips = batch / dt_q
    # calibrate the static scales on RENDERED lines (image-like
    # activations), not on the throughput noise batch
    calib_np, calib_kind = _render_calibration_batch(
        min(batch, 256), img_h, img_w
    )
    calib_images = jnp.asarray(
        np.resize(calib_np, (batch, img_h, img_w, 3)).astype(np.float32)
    )
    variables_qs = {
        **variables, "quant_stats": _fetch(calibrate(variables, calib_images))
    }
    variables_qs = jax.device_put(variables_qs)
    dt_qs = _time_fn(ctc_greedy_int8_static, variables_qs, images)
    qs_ips = batch / dt_qs
    dt_attn = _time_fn(attn_greedy, variables, images)
    attn_ips = batch / dt_attn
    dt_attn_qs = _time_fn(attn_greedy_int8_static, variables_qs, images)
    attn_qs_ips = batch / dt_attn_qs
    dt_beam = _time_fn(ctc_beam_int8_static, variables_qs, images)
    beam_ips = batch / dt_beam

    # --- small-batch latency (the reference's actual usage pattern:
    # predict(batch_size=32), single images in minimal_inference.py).
    # Scalar-reduced outputs (compute not elidable behind the reductions,
    # fetch is one int32) and the measured per-call dispatch floor
    # subtracted, per the platform timing rules (CLAUDE.md).
    @jax.jit
    def null_op(x):
        return x + 1

    one = jnp.zeros((), jnp.int32)
    floor_s = _time_fn(null_op, one, iters=50, warmup=5)

    @jax.jit
    def ctc_greedy_qs_scalar(variables, images):
        logits = model_qs.apply(
            variables, images, train=False, method=model_qs.ctc_logits
        )
        tokens, valid = ctc_greedy_decode_jnp(logits, 0)
        return jnp.sum(tokens) + jnp.sum(valid)

    lat_ms = {}
    for lb in (1, 8, 64):
        x_small = jnp.asarray(
            np.random.default_rng(lb).normal(
                size=(lb, img_h, img_w, 3)
            ).astype(np.float32)
        )
        dt = _time_fn(
            ctc_greedy_qs_scalar, variables_qs, x_small, iters=50, warmup=5
        )
        lat_ms[lb] = max(dt - floor_s, 0.0) * 1e3

    # --- second geometry: the reference's DEFAULT 64x256
    # (train.py:211-212, example_evaluation.py) — certify
    # matching-or-beating beyond the shipped 32x128 config
    big_h, big_w = 64, 256
    big_batch = 512 if on_tpu else 4  # same pixel budget as 2048 @ 32x128
    images_big = jnp.asarray(
        np.random.default_rng(3).normal(
            size=(big_batch, big_h, big_w, 3)
        ).astype(np.float32)
    )
    dt_big_qs = _time_fn(ctc_greedy_int8_static, variables_qs, images_big)
    big_qs_ips = big_batch / dt_big_qs
    dt_big_bf16 = _time_fn(ctc_greedy, variables, images_big)
    big_bf16_ips = big_batch / dt_big_bf16

    # label the headline with the path that actually won (a regression that
    # made bf16 beat int8 must not be misattributed)
    best_ips, best_path = max(
        (ctc_ips, "bf16"),
        (q_ips, "int8 serving path"),
        (qs_ips, "int8-static serving path"),
    )
    print(
        f"[bench] platform={platform} batch={batch} "
        f"ctc_greedy_int8_static={qs_ips:,.0f} img/s  "
        f"ctc_greedy_int8={q_ips:,.0f} img/s  ctc_greedy_bf16={ctc_ips:,.0f} img/s  "
        f"attn_greedy={attn_ips:,.0f} img/s  "
        f"attn_greedy_int8_static={attn_qs_ips:,.0f} img/s  "
        f"ctc_beam16_int8_static={beam_ips:,.0f} img/s  "
        f"latency(bs1/8/64)={lat_ms[1]:.2f}/{lat_ms[8]:.2f}/{lat_ms[64]:.2f} ms "
        f"(floor {floor_s * 1e3:.2f} ms)  "
        f"64x256 bs{big_batch}: int8-static={big_qs_ips:,.0f} "
        f"bf16={big_bf16_ips:,.0f} img/s  calib={calib_kind}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "line-images/sec/chip (greedy CTC decode, 32x128, bs%d, %s)"
                % (batch, best_path),
                "value": round(best_ips, 1),
                "unit": "img/s",
                "vs_baseline": round(best_ips / BASELINE_IMGS_PER_SEC, 4),
                "ctc_greedy_bf16_img_s": round(ctc_ips, 1),
                "ctc_greedy_int8_img_s": round(q_ips, 1),
                "ctc_greedy_int8_static_img_s": round(qs_ips, 1),
                "attn_greedy_img_s": round(attn_ips, 1),
                "attn_greedy_int8_static_img_s": round(attn_qs_ips, 1),
                "ctc_beam16_int8_static_img_s": round(beam_ips, 1),
                # device latency net of the dispatch floor, int8-static
                "latency_bs1_ms": round(lat_ms[1], 3),
                "latency_bs8_ms": round(lat_ms[8], 3),
                "latency_bs64_ms": round(lat_ms[64], 3),
                "dispatch_floor_ms": round(floor_s * 1e3, 3),
                # the reference's default geometry (64x256)
                "img_s_64x256": round(big_qs_ips, 1),
                "img_s_64x256_bf16": round(big_bf16_ips, 1),
                "batch_64x256": big_batch,
                "calibration_input": calib_kind,
                "platform": platform,
            }
        )
    )


if __name__ == "__main__":
    main()
