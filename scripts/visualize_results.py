"""Result visualization (counterpart of the reference's
notebooks/visualize_results.ipynb): loads metric yamls from result
directories, prints per-metric (and per-PIE-category) mean tables, and writes
a labeled source/edit image grid.

Usage:
  python scripts/visualize_results.py --result_dir result/myexp [--categories]
  python scripts/visualize_results.py --result_dir result/myexp --grid out.png
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(args):
    from eta_inversion_tpu.data.pie_bench import PieBenchData
    from eta_inversion_tpu.utils.eval_utils import EditResultData
    from eta_inversion_tpu.utils.vis_utils import img_grid

    categories = None
    if args.categories:
        categories = {k: list(v) for k, v in PieBenchData.categories.items()}

    exp_dirs = sorted(p for p in Path(args.result_dir).glob("*/")
                      if (p / "cfg.yaml").exists())
    if not exp_dirs:
        raise SystemExit(f"no experiment dirs under {args.result_dir}")

    for exp in exp_dirs:
        try:
            data = EditResultData.from_metrics(str(exp), categories=categories,
                                               skip_img_load=False)
        except Exception as e:
            print(f"{exp}: failed to load ({e})")
            continue
        print(f"\n=== {exp.name}")
        for metric, md in sorted(data.metrics.items()):
            mean = md["mean"]
            if isinstance(mean, dict):
                print(f"  {metric}:")
                for cat, v in mean.items():
                    print(f"    {cat:32s} {v if v is None else f'{v:.5f}'}")
            else:
                print(f"  {metric:24s} {mean:.5f}")

        if args.grid:
            rows = []
            labels = []
            for i in range(min(len(data), args.grid_rows)):
                sample = data[i]
                if sample is None or sample["edit_image"] is None:
                    continue
                rows.append([sample["image"], sample["edit_image"]])
                labels.append(sample["source_prompt"][:40])
            if rows:
                grid = img_grid(rows, col_labels=["source", "edit"],
                                row_labels=labels)
                from PIL import Image

                out = Path(args.grid)
                Image.fromarray(grid).save(out)
                print(f"  wrote {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_dir", required=True)
    parser.add_argument("--categories", action="store_true",
                        help="per-PIE-category means")
    parser.add_argument("--grid", type=str, default=None,
                        help="write an image grid png")
    parser.add_argument("--grid_rows", type=int, default=8)
    main(parser.parse_args())
