"""Generic editing dataset from prompts.yaml + imgs/ (counterpart of
/root/reference/dataset/editing_data.py; serves plug-and-play
imagenetr-(fake-)ti2i, ptp20, and any `data/eval/{name}` directory).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Union

import numpy as np
import yaml

from .base import DatasetBase


class EditingDataset(DatasetBase):
    def __init__(self, path: str = "data/eval/plug_and_play", skip_img_load: bool = False):
        super().__init__()
        prompt_path = Path(path)
        if prompt_path.suffix != ".yaml":
            prompt_path /= "prompts.yaml"
        self.img_dir = prompt_path.parent / "imgs"
        self.skip_img_load = skip_img_load

        latents_path = prompt_path.parent / "latents.pkl"
        if latents_path.exists():
            with open(latents_path, "rb") as f:
                self.latents = pickle.load(f)
        else:
            self.latents = None

        with open(prompt_path, "r") as f:
            self.edit_prompts = yaml.safe_load(f)

    def __repr__(self) -> str:
        return "editingdata"

    def __len__(self) -> int:
        return len(self.edit_prompts)

    def _to_ptp(self, edit_prompt: Dict[str, Union[int, Any]]) -> Dict[str, Any]:
        """replace/add edit spec -> default ptp config (reference :52-107)."""
        assert len(edit_prompt["edit"]) == 1, "Only one edit per prompt is supported"
        for edit in edit_prompt["edit"]:
            edit_type, edit_cfg = edit
            source_prompt = edit_prompt["source_prompt"]
            target_prompt = edit_prompt["target_prompt"]
            if edit_type == "replace":
                (source_word, target_word) = edit_cfg
                assert " " not in source_word and " " not in target_word, \
                    "Edit word cannot contain space"
                return dict(
                    prompts=[source_prompt, target_prompt],
                    is_replace_controller=False,
                    cross_replace_steps={"default_": 0.4},
                    self_replace_steps=0.6,
                    blend_words=(((source_word,), (target_word,))),
                    equilizer_params={"words": (target_word,), "values": (2,)},
                )
            elif edit_type == "add":
                blend_words = edit_cfg.get("blend_words", None)
                focus_words = edit_cfg.get("focus_words", None)
                out = dict(
                    prompts=[source_prompt, target_prompt],
                    is_replace_controller=False,
                    cross_replace_steps={"default_": 0.4},
                    self_replace_steps=0.6,
                )
                if blend_words is not None:
                    out["blend_words"] = (blend_words, blend_words)
                if focus_words is not None:
                    out["equilizer_params"] = {
                        "words": focus_words,
                        "values": (2 if blend_words is not None else 5,) * len(focus_words),
                    }
                return out
            raise AssertionError(edit_type)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        ep = self.edit_prompts[idx]
        image_file = self.img_dir / (ep["source_prompt"] + ".png")
        if not self.skip_img_load:
            from PIL import Image

            image = np.array(Image.open(image_file).convert("RGB"))
        else:
            image = None

        out = {
            "name": ep["source_prompt"] + "-" + ep["target_prompt"],
            "image": image,
            "image_file": str(image_file),
            "source_prompt": ep["source_prompt"],
            "target_prompt": ep["target_prompt"],
            "edit": {
                "target_prompt": ep["target_prompt"],
                "ptp": self._to_ptp(ep),
            },
            "mask": None,
        }
        if self.latents is not None:
            out["zT_gt"] = self.latents[ep["source_prompt"]]
        return out
