"""COCO-captions reconstruction dataset (counterpart of
/root/reference/dataset/coco.py; deterministic shuffle seed 0, limit 100)."""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from .base import DatasetBase


class CocoData(DatasetBase):
    def __init__(self, data_path: str = "data/eval/coco", skip_img_load: bool = False,
                 limit: Optional[int] = 100, split: str = "train2017"):
        super().__init__()
        img_dir = Path(data_path) / split
        label_file = Path(data_path) / "annotations" / f"captions_{split}.json"
        with open(label_file, "r") as f:
            labels = json.load(f)

        random.Random(0).shuffle(labels["annotations"])

        self.img_files = []
        self.captions = []
        for anno in labels["annotations"][:limit]:
            img_file = img_dir / f"{anno['image_id']:012d}.jpg"
            assert img_file.exists()
            self.img_files.append(img_file)
            self.captions.append(anno["caption"])
        self.skip_img_load = skip_img_load
        self.limit = limit

    def __len__(self) -> int:
        return len(self.img_files) if self.limit is None else self.limit

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if not self.skip_img_load:
            from PIL import Image

            image = np.array(Image.open(self.img_files[idx]))[:, :, :3]
        else:
            image = None
        caption = self.captions[idx]
        return {
            "name": caption,
            "image": image,
            "image_file": str(self.img_files[idx]),
            "source_prompt": caption,
            "target_prompt": "",
            "edit": {"target_prompt": ""},
            "mask": None,
        }

    def __repr__(self) -> str:
        return "coco"
