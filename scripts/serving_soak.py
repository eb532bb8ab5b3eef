"""On-chip soak of the dynamic-batching serving tier.

Drives BatchingEditServer (eta_inversion_tpu/serving.py) with a Poisson-ish
concurrent arrival process on the REAL chip and records the realized batch
statistics — how well the batcher turns single-request arrivals into the
bucketed compiled programs that amortize per-step fixed costs.  Counterpart
evidence for the serving claim: the reference's only serving surface is the
one-request-at-a-time Gradio demo (/root/reference/demo/manager.py:160-210).

Usage: python scripts/serving_soak.py [--requests 16] [--steps 50]
       [--model sd15] [--max-wait-ms 2000]
Writes one summary JSON line (append it to docs/bench/).
"""

import argparse
import json
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--model", default="sd15")
    ap.add_argument("--max-wait-ms", type=float, default=2000.0,
                    help="batching window; edits take seconds, so a "
                    "~2s window trades little latency for full buckets")
    ap.add_argument("--stagger-ms", type=float, default=150.0,
                    help="mean inter-arrival gap of the synthetic clients")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing the soak "
                    "harness itself; the axon site hook ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE",
                               os.path.expanduser("~/.cache/eta_tpu_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.models import load_diffusion_model
    from eta_inversion_tpu.serving import BatchingEditServer, EditRequest

    model, _ = load_diffusion_model(args.model, dtype="bfloat16")
    inv = load_inverter(model, "etainv", num_inference_steps=args.steps,
                        eta=((0.6, 0.0), (1.0, 0.7)), noise_sample_count=10)
    editor = load_editor(inv, "ptp")
    server = BatchingEditServer(editor, max_batch=8,
                                max_wait_ms=args.max_wait_ms)

    rs = np.random.RandomState(0)
    size = model.image_size
    cfg = {"is_replace_controller": True, "cross_replace_steps": 0.8,
           "self_replace_steps": 0.5}

    # warmup: compile the bucket programs the soak will hit (1 and 8)
    img = rs.rand(size, size, 3).astype("float32") * 2 - 1
    t0 = time.time()
    server.edit(img, "a cat by a window", "a dog by a window", cfg=cfg,
                inv_cfg={"edit_word_idx": (1, 1)})
    print(f"# warmup bucket-1: {time.time() - t0:.1f}s", file=sys.stderr)

    lat = []
    lock = threading.Lock()

    def client(i):
        im = rs.rand(size, size, 3).astype("float32") * 2 - 1
        t = time.monotonic()
        fut = server.submit(EditRequest(im, f"a cat number {i}",
                                        f"a tiger number {i}", cfg=cfg,
                                        inv_cfg={"edit_word_idx": (1, 1)}))
        res = fut.result(timeout=3600)
        with lock:
            lat.append(time.monotonic() - t)
        assert np.asarray(res["image"]).shape[-1] == 3

    t0 = time.time()
    threads = []
    for i in range(args.requests):
        th = threading.Thread(target=client, args=(i,))
        th.start()
        threads.append(th)
        time.sleep(rs.exponential(args.stagger_ms / 1000.0))
    for th in threads:
        th.join()
    wall = time.time() - t0

    stats = server.stats_snapshot()
    server.shutdown()
    lat = sorted(lat)
    summary = {
        "metric": "serving_soak_edits_per_min",
        "value": round(args.requests / wall * 60, 2),
        "unit": "edits/min",
        "requests": args.requests,
        "wall_s": round(wall, 1),
        "p50_latency_s": round(lat[len(lat) // 2], 2),
        "p95_latency_s": round(lat[int(len(lat) * 0.95) - 1], 2),
        "dispatch_sizes": stats.get("dispatch_sizes"),
        "dispatched_batches": stats.get("batches"),
        "mean_batch": round(stats.get("mean_batch", 0), 2),
        "padded_slots": stats.get("padded_slots"),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
