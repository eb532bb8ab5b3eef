"""On-chip soak of the dynamic-batching serving tier (serve.py).

Fires N concurrent edit requests at a running serve.py instance from M
client threads (Poisson-ish arrivals via a small stagger), collects
per-request latency, then snapshots /v1/stats to record the realized batch
sizes the dynamic batcher actually formed under load — the evidence the
serving tier coalesces concurrent traffic into the bucketed compiled
programs instead of running one edit per request (the reference's demo
serves strictly one at a time, /root/reference/demo/manager.py:160-210).

Usage:
  # terminal 1 (holds the chip):
  python serve.py --model sd15 --inverter etainv --editor ptp --steps 50 \
      --max_batch 8 --max_wait_ms 2000 --sync_dispatch --port 8013
  # terminal 2:
  python scripts/serving_soak.py --port 8013 --requests 24 --concurrency 12

Prints one summary JSON line.
"""

import argparse
import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np


def make_png(seed: int, size: int) -> bytes:
    from PIL import Image

    rs = np.random.RandomState(seed)
    buf = io.BytesIO()
    Image.fromarray((rs.rand(size, size, 3) * 255).astype(np.uint8)).save(
        buf, "PNG")
    return buf.getvalue()


def multipart(fields: dict) -> tuple:
    bound = "soakboundary7f3a"
    out = io.BytesIO()
    for name, val in fields.items():
        out.write(f"--{bound}\r\n".encode())
        if isinstance(val, bytes):
            out.write(f'Content-Disposition: form-data; name="{name}"; '
                      f'filename="img.png"\r\n'
                      f"Content-Type: image/png\r\n\r\n".encode())
            out.write(val)
        else:
            out.write(f'Content-Disposition: form-data; name="{name}"'
                      f"\r\n\r\n".encode())
            out.write(str(val).encode())
        out.write(b"\r\n")
    out.write(f"--{bound}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={bound}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8013)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--concurrency", type=int, default=12)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--stagger_ms", type=float, default=100.0,
                    help="delay between request launches inside a wave")
    ap.add_argument("--timeout_s", type=float, default=3600.0)
    args = ap.parse_args()
    base = f"http://{args.host}:{args.port}"

    # wait for the model to come up
    deadline = time.time() + args.timeout_s
    while True:
        try:
            urllib.request.urlopen(base + "/healthz", timeout=5)
            break
        except Exception:
            if time.time() > deadline:
                raise SystemExit("server never became healthy")
            time.sleep(5)

    pairs = [("cat", "tiger"), ("dog", "wolf"), ("car", "truck"),
             ("house", "castle")]
    latencies = [None] * args.requests
    errors = []
    sem = threading.Semaphore(args.concurrency)

    def one(i: int) -> None:
        with sem:
            src, tgt = pairs[i % len(pairs)]
            body, ctype = multipart({
                "image": make_png(i, args.image_size),
                "source_prompt": f"a {src} sitting in a garden",
                "target_prompt": f"a {tgt} sitting in a garden",
            })
            req = urllib.request.Request(
                base + "/v1/edit", data=body,
                headers={"Content-Type": ctype})
            t0 = time.monotonic()
            try:
                with urllib.request.urlopen(req, timeout=args.timeout_s) as r:
                    payload = json.loads(r.read())
                png = base64.b64decode(payload["image"])
                assert png[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
                latencies[i] = time.monotonic() - t0
            except Exception as e:  # noqa: BLE001 - soak records all failures
                errors.append(f"[{i}] {type(e).__name__}: {e}")

    t_start = time.monotonic()
    threads = []
    for i in range(args.requests):
        t = threading.Thread(target=one, args=(i,))
        t.start()
        threads.append(t)
        time.sleep(args.stagger_ms / 1000.0)
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start

    with urllib.request.urlopen(base + "/v1/stats", timeout=30) as r:
        stats = json.loads(r.read())

    done = [l for l in latencies if l is not None]
    summary = {
        "metric": "serving_soak_req_per_min",
        "value": round(len(done) / wall * 60, 2),
        "unit": "req/min",
        "requests": args.requests,
        "completed": len(done),
        "errors": errors[:5],
        "concurrency": args.concurrency,
        "wall_s": round(wall, 1),
        "latency_p50_s": round(float(np.percentile(done, 50)), 2) if done else None,
        "latency_p95_s": round(float(np.percentile(done, 95)), 2) if done else None,
        "latency_max_s": round(max(done), 2) if done else None,
        "server_stats": stats,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
