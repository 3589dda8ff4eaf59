"""Concurrent load generator for the serving daemon.

Drives ``tools/serve.py`` the way production traffic does — many
parallel HTTP clients, one image per request — and reports client-side
throughput + latency percentiles alongside the server's own
``/metrics`` deltas, so you can see micro-batching work (server batch
size climbing with concurrency while per-request latency stays bounded):

    python tools/serve_loadtest.py --url http://127.0.0.1:8000 \
        --image line.png --requests 200 --concurrency 16

With ``--image`` omitted a synthetic text-line PNG is generated.
Prints one JSON line (machine-readable) after the human summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request


def _percentile(sorted_vals, q: float) -> float:
    if not sorted_vals:
        return 0.0
    idx = min(len(sorted_vals) - 1, int(q * len(sorted_vals)))
    return sorted_vals[idx]


def _get(url: str) -> str:
    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp.read().decode()


def _metric(text: str, name: str) -> float:
    for line in text.splitlines():
        if line.startswith(name + " "):
            return float(line.split()[-1])
    return 0.0


def _synthetic_png() -> bytes:
    import cv2
    import numpy as np

    img = np.full((64, 512, 3), 255, np.uint8)
    cv2.putText(
        img, "loadtest 0123456789", (8, 44), cv2.FONT_HERSHEY_SIMPLEX,
        1.2, (0, 0, 0), 2, cv2.LINE_AA,
    )
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return buf.tobytes()


def run_loadtest(
    url: str, body: bytes, n_requests: int, concurrency: int,
) -> dict:
    """Fire ``n_requests`` POST /predict from ``concurrency`` threads."""
    latencies: list = []
    errors: list = []
    lock = threading.Lock()
    remaining = [n_requests]

    def worker() -> None:
        while True:
            with lock:
                if remaining[0] <= 0:
                    return
                remaining[0] -= 1
            req = urllib.request.Request(
                url + "/predict", data=body,
                headers={"Content-Type": "image/png"}, method="POST",
            )
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=120) as resp:
                    json.loads(resp.read())
                with lock:
                    latencies.append(time.perf_counter() - t0)
            except Exception as e:  # count, keep loading
                with lock:
                    errors.append(str(e))

    before = _get(url + "/metrics")
    threads = [
        threading.Thread(target=worker, daemon=True)
        for _ in range(concurrency)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    after = _get(url + "/metrics")

    lats = sorted(latencies)
    return {
        "requests": n_requests,
        "concurrency": concurrency,
        "ok": len(latencies),
        "errors": len(errors),
        "error_samples": errors[:3],
        "wall_s": round(wall, 3),
        "rps": round(len(latencies) / wall, 1) if wall else 0.0,
        "latency_ms": {
            "p50": round(_percentile(lats, 0.50) * 1e3, 1),
            "p95": round(_percentile(lats, 0.95) * 1e3, 1),
            "p99": round(_percentile(lats, 0.99) * 1e3, 1),
        },
        "server": {
            "images_served": int(
                _metric(after, "ocr_served_images_total")
                - _metric(before, "ocr_served_images_total")
            ),
            "engine_batches": int(
                _metric(after, "ocr_engine_batches_total")
                - _metric(before, "ocr_engine_batches_total")
            ),
            "engine_errors": int(
                _metric(after, "ocr_engine_batch_errors_total")
                - _metric(before, "ocr_engine_batch_errors_total")
            ),
        },
    }


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--image", default=None, help="image file to POST (default: synthetic)")
    p.add_argument("--requests", type=int, default=200)
    p.add_argument("--concurrency", type=int, default=16)
    args = p.parse_args()

    body = (
        open(args.image, "rb").read() if args.image else _synthetic_png()
    )
    result = run_loadtest(args.url, body, args.requests, args.concurrency)

    srv = result["server"]
    batches = srv["engine_batches"]
    mean_batch = srv["images_served"] / batches if batches else 0.0
    print(
        f"[loadtest] {result['ok']}/{result['requests']} ok, "
        f"{result['errors']} errors, {result['rps']} req/s over "
        f"{result['wall_s']} s at concurrency {result['concurrency']}"
    )
    print(
        f"[loadtest] client latency ms p50/p95/p99 = "
        f"{result['latency_ms']['p50']}/{result['latency_ms']['p95']}/"
        f"{result['latency_ms']['p99']}"
    )
    print(
        f"[loadtest] server: {srv['images_served']} images in "
        f"{batches} engine batches (mean batch {mean_batch:.1f}), "
        f"{srv['engine_errors']} engine errors"
    )
    print(json.dumps(result))
    return 0 if result["errors"] == 0 and result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
