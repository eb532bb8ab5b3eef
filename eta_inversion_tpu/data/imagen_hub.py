"""ImagenHub text-guided editing dataset (counterpart of
/root/reference/dataset/imagen_hub.py).  Requires the HuggingFace dataset
`ImagenHub/Text_Guided_Image_Editing` (local cache / `data_dir`); alpha-channel
smooth masks are inverted to foreground masks.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .base import DatasetBase


class ImagenHubData(DatasetBase):
    def __init__(self, skip_img_load: bool = False, limit: Optional[int] = None,
                 split: str = "dev", img_size: int = 512,
                 data_dir: Optional[str] = None):
        super().__init__()
        from datasets import load_dataset  # hf datasets; needs local cache offline

        if data_dir is not None:
            self.data = load_dataset("imagefolder", data_dir=data_dir)
        else:
            self.data = load_dataset("ImagenHub/Text_Guided_Image_Editing")
        self.split = split
        self.limit = limit
        self.skip_img_load = False
        self.img_size = img_size

    def __len__(self) -> int:
        return len(self.data[self.split]) if self.limit is None else self.limit

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        sample = self.data[self.split][idx]
        image = np.array(sample["source_img"].resize((self.img_size, self.img_size)))
        # mask stored as background alpha; invert to foreground (reference :52)
        mask = 1 - (np.array(sample["mask_img"].split()[-1].resize(
            (self.img_size, self.img_size)), np.float32) / 255)
        source_prompt = sample["source_global_caption"]
        target_prompt = sample["target_global_caption"]
        return {
            "name": f'{sample["img_id"]}_{source_prompt}_{target_prompt}',
            "image": image,
            "image_file": None,
            "source_prompt": source_prompt,
            "target_prompt": target_prompt,
            "mask": mask,
            "edit": {"target_prompt": target_prompt, "ptp": None},
        }
