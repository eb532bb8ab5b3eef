"""Metric computation driver (counterpart of /root/reference/compute_metrics.py).

For each experiment directory under result/{cfg}/ and each metric, writes
metrics/{metric}.yaml with mean + per-file values; idempotency via exclusive
creation of the output yaml (reference :44-50); per-sample failures recorded
as NaN (reference :97-107).
"""

import argparse
import math
from pathlib import Path

import numpy as np
import yaml

from eta_inversion_tpu.utils.debug_utils import enable_deterministic

enable_deterministic()


def run_compute_metric(eval_dir: str, metric_name: str, override: bool = False,
                       metric_kwargs=None) -> None:
    from eta_inversion_tpu.metrics import EditMetric
    from eta_inversion_tpu.utils.eval_utils import EditResultData

    eval_dir = Path(eval_dir)
    out_dir = eval_dir / "metrics"
    out_dir.mkdir(parents=True, exist_ok=True)
    out_file = out_dir / f"{metric_name}.yaml"

    if not override:
        try:
            # exclusive create as an idempotency lock
            with open(out_file, "x"):
                pass
        except FileExistsError:
            print(f"skipping existing {out_file}")
            return

    with open(eval_dir / "cfg.yaml", "r") as f:
        cfg = yaml.safe_load(f)
    data = EditResultData.from_state_dict(cfg)
    data.metrics = None

    metric = EditMetric(metric_name, **(metric_kwargs or {}))
    results = []
    # worker-thread prefetch: sample image-pair loading (PIL decode of source
    # + edited pngs inside data[i]) overlaps the device-side metric forward
    # (the reference loads synchronously per sample, compute_metrics.py:98-104)
    from eta_inversion_tpu.native import Prefetcher

    for i, sample in Prefetcher(lambda j: data[j], range(len(data))):
        name = data.get_edit_image_name(i)
        try:
            if sample["edit_image"] is None:
                raise FileNotFoundError(sample["edit_image_file"])
            src = sample["image"].astype(np.float32)[None] / 127.5 - 1.0
            tgt = sample["edit_image"].astype(np.float32)[None] / 127.5 - 1.0
            edit_word = None
            widx = sample.get("edit_word_idx")
            if widx and widx[1] is not None:
                edit_word = sample["edit"]["target_prompt"].split(" ")[widx[1]]
            val = metric.update(src, tgt, sample["source_prompt"],
                                sample["edit"]["target_prompt"], edit_word,
                                mask=sample.get("mask"))
            if val is None:
                val = math.nan
        except Exception as e:  # per-sample failures -> NaN (reference :97-107)
            print(f"[{i}] {metric_name} failed: {e}")
            val = math.nan
            metric.metric.losses.append(val)
        results.append({"value": float(val), "file": f"{name}.png"})
        print(f"[{i}] {metric_name} = {val}")

    mean, _ = metric.compute()
    with open(out_file, "w") as f:
        yaml.safe_dump({"name": metric_name, "mean": float(mean),
                        "results": results}, f)
    print(f"wrote {out_file}")


def main(args):
    from eta_inversion_tpu.metrics import EditMetric

    metrics = args.metrics or EditMetric.get_available_metrics()
    eval_dirs = sorted(p for p in Path(args.result_dir).glob("*/")
                       if (p / "cfg.yaml").exists())
    for eval_dir in eval_dirs:
        for metric in metrics:
            run_compute_metric(eval_dir, metric, override=args.override)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Compute metrics for eval results")
    parser.add_argument("--result_dir", type=str, required=True,
                        help="result/{experiment} directory")
    parser.add_argument("--metrics", type=str, nargs="*", default=None,
                        help="Metric names (default: all)")
    parser.add_argument("--override", action="store_true")
    main(parser.parse_args())
