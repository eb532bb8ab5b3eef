"""Dataset registry (counterpart of /root/reference/dataset/__init__.py)."""

from __future__ import annotations

from functools import partial
from pathlib import Path

from .base import DatasetBase, DatasetSubset
from .coco import CocoData
from .editing_data import EditingDataset
from .imagen_hub import ImagenHubData
from .pie_bench import PieBenchData

# Index 29 appears twice — faithful to the reference's hard-coded list
# (/root/reference/dataset/__init__.py `pie_sub`), which duplicates it; the
# subset therefore evaluates sample 29 twice by design, not by accident.
PIE_SUB_INDICES = [
    5, 15, 175, 18, 67, 93, 19, 29, 137, 181, 149, 528, 507, 389,
    384, 177, 162, 136, 132, 129, 14, 21, 24, 170, 173, 241, 0, 17, 25, 31, 36,
    29, 412,
]


def load_dataset(name: str, **kwargs) -> DatasetBase:
    dataset_cls = {
        "imagenetr-fake-ti2i": partial(
            EditingDataset, path="data/eval/plug_and_play/imagenetr-fake-ti2i"),
        "imagenetr-ti2i": partial(
            EditingDataset, path="data/eval/plug_and_play/imagenetr-ti2i"),
        "ptp20": partial(EditingDataset, path="data/eval/prompt-to-prompt/prompts20.yaml"),
        "ptp_debug": partial(EditingDataset, path="data/eval/prompt-to-prompt/debug.yaml"),
        "pie": PieBenchData,
        "pie_debug": partial(PieBenchData, limit=1),
        "pie_test3": partial(PieBenchData, limit=3),
        "pie_20": partial(DatasetSubset, PieBenchData, length=20),
        "pie_sub": partial(DatasetSubset, PieBenchData, indices=PIE_SUB_INDICES,
                           shuffle=False),
        "imagenhub": ImagenHubData,
        "imagenhub_debug": partial(ImagenHubData, limit=1),
        "coco": CocoData,
    }.get(name, None)
    if dataset_cls is None:
        dataset_cls = partial(EditingDataset, Path("data/eval") / name)
    return dataset_cls(**kwargs)


__all__ = ["DatasetBase", "DatasetSubset", "EditingDataset", "PieBenchData",
           "ImagenHubData", "CocoData", "load_dataset", "PIE_SUB_INDICES"]
