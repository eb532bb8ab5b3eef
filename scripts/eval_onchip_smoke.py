"""On-chip smoke of the PRODUCTION eval harness (eval.py + compute_metrics.py).

bench.py measures the flagship editor in isolation; this script runs the same
workload through the full production path instead — create_configs grid,
PieBenchData parsing (per-sample ptp configs incl. LocalBlend words), the
native threaded image loader, pair-batched editing (synchronous drain under
the axon relay — see --inflight), PNG save, resume protocol, then the metrics
driver — end to end on the real
TPU chip, and reports imgs/min through the harness so the eval-loop overhead
(host IO, decode, save) is measured rather than assumed.

Counterpart evidence for /root/reference/eval.py + compute_metrics.py, which
the reference only ever demonstrates on GPU via its result trees.

Usage: python scripts/eval_onchip_smoke.py [--samples 16] [--batch 8]
       [--steps 50] [--workdir result/onchip_smoke_ws]
Writes a summary JSON line at the end.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def synthesize_pie(root: Path, n: int, size: int = 512) -> None:
    """PIE-Bench_v1-shaped dataset: mapping_file.json + annotation_images/.

    Random images (no pretrained weights exist offline, so content fidelity
    is not the point — the data *shapes* and per-sample ptp configs are real
    PIE semantics: blended words, masks, category-coded filenames)."""
    from PIL import Image

    d = root / "data" / "eval" / "PIE-Bench_v1"
    (d / "annotation_images").mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(0)
    pairs = [("cat", "tiger"), ("dog", "wolf"), ("car", "truck"),
             ("house", "castle")]
    mapping = {}
    for i in range(n):
        src_w, tgt_w = pairs[i % len(pairs)]
        fname = f"0_random/img_{i:06d}.jpg"
        (d / "annotation_images" / "0_random").mkdir(exist_ok=True)
        Image.fromarray((rs.rand(size, size, 3) * 255).astype(np.uint8)).save(
            d / "annotation_images" / fname)
        # 64x64 RLE mask: alternating runs (flat-index run-length pairs)
        mapping[str(i)] = {
            "image_path": fname,
            "original_prompt": f"a [{src_w}] sitting in a garden",
            "editing_prompt": f"a [{tgt_w}] sitting in a garden",
            "editing_instruction": f"change the {src_w} to a {tgt_w}",
            "blended_word": f"{src_w} {tgt_w}",
            "mask": [1000, 800, 1200, 1096],
        }
    (d / "mapping_file.json").write_text(json.dumps(mapping))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--model", default="sd15")
    ap.add_argument("--dtype", default="bfloat16",
                    help="compute dtype for the model config; the TPU-native "
                    "dtype is bfloat16 (matches bench.py).  float32 at "
                    "batch 8/50 steps exceeds the 16 GB chip (fp32 params + "
                    "activations + attention stores) and crashes the TPU "
                    "worker mid-program")
    ap.add_argument("--workdir", default="result/onchip_smoke_ws")
    ap.add_argument("--metrics", nargs="*",
                    default=["mse", "ssim", "lpips", "clip_text_img",
                             "dinovitstruct"])
    ap.add_argument("--inflight", type=int, default=1,
                    help="eval.py pipelining depth; 1 (default) overlaps "
                    "host work with device compute while keeping at most ONE "
                    "big program in flight (fetch-before-next-dispatch — "
                    "safe under the axon relay); 0 = fully synchronous; "
                    ">=2 genuinely pipelines dispatches and crashes the "
                    "relay's chip-side buffer accounting")
    args = ap.parse_args()

    # persistent compile cache (shared with bench.py)
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE",
                               os.path.expanduser("~/.cache/eta_tpu_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    ws = (REPO / args.workdir).resolve()
    ws.mkdir(parents=True, exist_ok=True)
    synthesize_pie(ws, args.samples)
    cfg_dir = ws / "cfg" / "eval"
    cfg_dir.mkdir(parents=True, exist_ok=True)
    import yaml
    cfg = {
        "model": [{"type": args.model, "dtype": args.dtype}],
        "data": ["pie"],
        "edit_cfg": ["ptp_file"],
        "method": [{"type": "etainv", "num_inference_steps": args.steps,
                    "eta": [[0.6, 0], [1, 0.7]], "noise_sample_count": 10}],
        "edit_method": [{"type": "ptp"}],
    }
    (cfg_dir / "onchip.yaml").write_text(yaml.safe_dump(cfg))
    os.chdir(ws)

    import eval as eval_cli
    from eta_inversion_tpu.utils.eval_utils import create_configs

    cfgs, cfg_all = create_configs("onchip")
    Path(cfg_all["path"]).mkdir(parents=True, exist_ok=True)
    with open(Path(cfg_all["path"]) / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfg_all, f)

    print(f"=== eval.py on-chip: {args.samples} samples, batch {args.batch}")
    t0 = time.time()
    eval_cli.run_eval(cfgs[0], batch=args.batch, inflight=args.inflight)
    t_eval = time.time() - t0

    out = Path(cfgs[0]["path"])
    n_imgs = len(list((out / "imgs").glob("*.png")))

    # resume protocol on-chip: a second run must skip every existing png
    t0 = time.time()
    eval_cli.run_eval(cfgs[0], batch=args.batch, inflight=args.inflight)
    t_resume = time.time() - t0

    print(f"=== compute_metrics.py on-chip: {args.metrics}")
    import compute_metrics as metrics_cli
    t0 = time.time()
    for m in args.metrics:
        metrics_cli.run_compute_metric(out, m)
    t_metrics = time.time() - t0
    means = {}
    for m in args.metrics:
        mf = out / "metrics" / f"{m}.yaml"
        if mf.exists():
            means[m] = float(yaml.safe_load(mf.read_text())["mean"])

    summary = {
        "metric": "eval_harness_onchip_imgs_per_min",
        "value": round(n_imgs / t_eval * 60, 2),
        "unit": "imgs/min",
        "samples": n_imgs,
        "eval_s": round(t_eval, 1),
        "s_per_edit_harness": round(t_eval / max(n_imgs, 1), 3),
        "resume_s": round(t_resume, 1),
        "metrics_s": round(t_metrics, 1),
        # no pretrained CLIP/DINO/LPIPS backbones exist in this environment:
        # these exercise the metric PATH only; the values are numerically
        # meaningless (random-init backbones) and must not be read as quality
        "metric_means_randominit": means,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
