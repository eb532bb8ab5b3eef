"""BG-LPIPS: LPIPS on the background region given a ground-truth mask.

Counterpart of /root/reference/metrics/bglpips.py (minus its always-on mask
dumping to result/mask/N — a quirk deliberately not reproduced; pass
`mask_save_path` to opt in).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .simple import _lpips_fn
from .base import SimpleMetric


class BGLPIPS(SimpleMetric):
    def __init__(self, input_range: Tuple[float, float] = (-1, 1),
                 device: Optional[str] = None, mask_save_path: Optional[str] = None,
                 weights_path: Optional[str] = None):
        super().__init__(input_range, device)
        self.mask_save_path = mask_save_path
        self.weights_path = weights_path
        if mask_save_path:
            os.makedirs(mask_save_path, exist_ok=True)

    def forward(self, source_image, edit_image, source_prompt: str = "", mask=None):
        """mask: (H, W) or (1, H, W) float, 1=foreground."""
        src = self._normalize(source_image)
        tgt = self._normalize(edit_image)
        mask = jnp.asarray(mask, jnp.float32)
        if mask.ndim == 2:
            mask = mask[None]
        bg = (1.0 - mask)[..., None]  # (1, H, W, 1) NHWC broadcast
        src_bg = src * bg
        tgt_bg = tgt * bg
        if self.mask_save_path:
            import cv2

            out = (255 * np.asarray(1.0 - bg[0, ..., 0])).astype(np.uint8)
            cv2.imwrite(os.path.join(self.mask_save_path, source_prompt + ".png"), out)
        # lpips expects [-1, 1]
        return _lpips_fn(self.weights_path)(src_bg * 2 - 1, tgt_bg * 2 - 1)[0]

    def __repr__(self):
        return "bglpips"
