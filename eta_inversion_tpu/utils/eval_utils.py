"""Evaluation harness utilities: yaml config grid + result-directory dataset.

Counterpart of /root/reference/utils/eval_utils.py.  The result tree layout is
kept byte-compatible with the reference
(result/{exp}/{NN_name}/{cfg.yaml,imgs/*.png,metrics/*.yaml}) so existing
analysis notebooks work across both frameworks.
"""

from __future__ import annotations

from itertools import product
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
import yaml

from ..data import load_dataset


def get_save_dir(name: str) -> Path:
    path = Path("result") / name
    path.mkdir(parents=True, exist_ok=True)
    return path


# the five axes an eval yaml may sweep; their nesting order in the grid walk
# is part of the directory-numbering contract (reference eval_utils.py:65-75)
GRID_AXES = ("model", "data", "edit_cfg", "method", "edit_method")


def _cfg_to_filename(cfg) -> str:
    """Directory-name fragment for a config value: dicts join their values
    (key-sorted, keys omitted) with '_'; scalars stringify (reference :27-41)."""
    if not isinstance(cfg, dict):
        return str(cfg)
    return "_".join(_cfg_to_filename(cfg[k]) for k in sorted(cfg))


def create_configs(cfg_all: str) -> Tuple[List[Dict[str, Any]], Dict[str, Any]]:
    """yaml -> one sub config per point of the cartesian grid over GRID_AXES.

    Output contract (byte-compatible result tree, reference :44-85): every
    non-axis yaml key is copied into each sub config verbatim, and sub config
    number i is rooted at result/<exp>/<i:02d>_<name>, <name> being the
    sorted-value join of the sub config (before "path" is added).
    """
    if not cfg_all.endswith(".yaml"):
        cfg_all = f"cfg/eval/{cfg_all}.yaml"
    exp_name = Path(cfg_all).stem
    with open(cfg_all, "r") as f:
        grid = yaml.safe_load(f)

    shared = {k: v for k, v in grid.items() if k not in GRID_AXES}
    root = Path("result") / exp_name

    cfgs: List[Dict[str, Any]] = []
    for point in product(*(grid.get(axis, [None]) for axis in GRID_AXES)):
        cfg = dict(zip(GRID_AXES, point))
        cfg.update(shared)
        cfg["path"] = str(root / f"{len(cfgs):02d}_{_cfg_to_filename(cfg)}")
        cfgs.append(cfg)

    grid["path"] = str(root)
    return cfgs, grid


class EditResultData:
    """Dataset + result-directory wrapper (reference :88-277)."""

    def __init__(self, data_name: str, method: Dict[str, Any],
                 edit_method: Dict[str, Any], edit_cfg: Optional[Dict[str, Any]] = None,
                 exp_name: Optional[str] = None, path: Optional[str] = None,
                 skip_existing: bool = False, model=None, **kwargs):
        self.path = Path(path) if path is not None else None
        self.data_name = data_name
        self.data = load_dataset(data_name, **kwargs)
        self.method = method
        self.edit_method = edit_method
        self.metrics: Dict[str, Any] = {}
        self.exp_name = exp_name
        self.edit_cfg = edit_cfg
        self.model = model
        self.skip_existing = skip_existing

    @staticmethod
    def from_state_dict(dic: Dict[str, Any], **kwargs) -> "EditResultData":
        dic = {**dic}
        data = dic.pop("data")
        if not isinstance(data, dict):
            data = {"type": data}
        dic["data_name"] = data.pop("type")
        return EditResultData(**dic, **kwargs, **data)

    @staticmethod
    def from_metrics(eval_dir: str, categories: Optional[Dict[str, List[int]]] = None,
                     metric_filter=None, **kwargs) -> "EditResultData":
        cfg_file = Path(eval_dir) / "cfg.yaml"
        metric_files = sorted((Path(eval_dir) / "metrics").glob("*.yaml"))
        with open(cfg_file, "r") as f:
            cfg = yaml.safe_load(f)
        cfg["exp_name"] = Path(eval_dir).parent.parent.stem + "_" + \
            Path(eval_dir).parent.stem
        data = EditResultData.from_state_dict(cfg, **kwargs)

        metrics = {}
        for metric_file in metric_files:
            if metric_filter is not None and Path(metric_file).stem not in metric_filter:
                continue
            if metric_file.stem.endswith("_bak"):
                continue
            with open(metric_file, "r") as f:
                metric_data = yaml.safe_load(f)
            assert metric_data is not None, metric_file
            if categories is None:
                metrics_total = {"mean": metric_data["mean"]}
            else:
                try:
                    values = np.array([r["value"] for r in metric_data["results"]]
                                      ).astype(float)
                except Exception:
                    print(f"skipping {metric_file}")
                    continue
                metrics_total = {"mean": {
                    name: np.mean(values[ind]) if len(values) > 0 else None
                    for name, ind in categories.items()}}
            metrics[metric_data["name"]] = {**metrics_total,
                                            "results": metric_data["results"]}
        data.metrics = metrics
        return data

    def __len__(self) -> int:
        return len(self.data)

    def get_edit_image_name(self, i: int) -> str:
        source_prompt = self.data[i]["source_prompt"]
        target_prompt = self.data[i]["edit"]["target_prompt"]
        return f"{i:04d}_{source_prompt}_{target_prompt}"

    def get_metrics(self, i: int) -> Union[Dict[str, Any], None]:
        filename = self.get_edit_image_name(i)
        metrics = {}
        if self.metrics is not None:
            for k in self.metrics.keys():
                assert Path(filename).stem == \
                    Path(self.metrics[k]["results"][i]["file"]).stem
                metrics[k] = self.metrics[k]["results"][i]["value"]
            return metrics
        return None

    def __getitem__(self, i: int):
        edit_image_file = self.path / "imgs" / f"{self.get_edit_image_name(i)}.png"
        if self.skip_existing and edit_image_file.exists():
            return None
        sample = {**self.data[i]}
        sample["edit_image_file"] = edit_image_file
        if not self.data.skip_img_load and edit_image_file.exists():
            from PIL import Image

            sample["edit_image"] = np.array(Image.open(edit_image_file).convert("RGB"))
        else:
            sample["edit_image"] = None
        sample["metrics"] = self.get_metrics(i)
        return sample
