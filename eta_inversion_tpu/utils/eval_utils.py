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


def _cfg_to_filename(cfg) -> str:
    if isinstance(cfg, dict):
        return "_".join([f"{_cfg_to_filename(v)}" for k, v in sorted(cfg.items())])
    return str(cfg)


def create_configs(cfg_all: str) -> Tuple[List[Dict[str, Any]], Dict[str, Any]]:
    """yaml -> cartesian product over [model, data, edit_cfg, method,
    edit_method] (reference :44-85)."""
    if not cfg_all.endswith(".yaml"):
        cfg_all = f"cfg/eval/{cfg_all}.yaml"
    exp_name = Path(cfg_all).stem
    with open(cfg_all, "r") as f:
        cfg_all = yaml.safe_load(f)

    keys_batch = ["model", "data", "edit_cfg", "method", "edit_method"]
    vals_batch = list(product(*[cfg_all.get(k, [None]) for k in keys_batch]))
    cfgs = [{
        **dict(zip(keys_batch, vals)),
        **{k: v for k, v in cfg_all.items() if k not in keys_batch},
    } for vals in vals_batch]

    for i, cfg in enumerate(cfgs):
        sub_dir = f"{i:02d}_" + _cfg_to_filename(cfg)
        cfg["path"] = str(Path("result") / exp_name / sub_dir)
    cfg_all["path"] = str(Path("result") / exp_name)
    return cfgs, cfg_all


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
