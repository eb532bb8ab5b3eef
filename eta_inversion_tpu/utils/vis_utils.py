"""Visualization helpers (counterpart of /root/reference/utils/vis_utils.py):
labeled image grids for result inspection."""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np


def _label_band(width: int, text: str, height: int = 20) -> np.ndarray:
    """White band with a rendered text label (PIL-based; cv2-free)."""
    from PIL import Image, ImageDraw

    band = Image.new("RGB", (width, height), (255, 255, 255))
    if text:
        ImageDraw.Draw(band).text((4, 4), text, fill=(0, 0, 0))
    return np.asarray(band)


def img_grid(images: Sequence[Union[np.ndarray, Sequence[np.ndarray]]],
             col_labels: Optional[List[str]] = None,
             row_labels: Optional[List[str]] = None,
             pad: int = 2, label_height: int = 20) -> np.ndarray:
    """Assemble a (rows x cols) uint8 HWC image grid with optional labels.

    `images` is a list of rows, each a list of HWC uint8 arrays (or a flat
    list, treated as one row)."""
    if images and isinstance(images[0], np.ndarray):
        images = [list(images)]
    rows = []
    for r, row in enumerate(images):
        cells = []
        for c, img in enumerate(row):
            img = np.asarray(img)
            if img.dtype != np.uint8:
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            cell = np.pad(img, ((pad, pad), (pad, pad), (0, 0)),
                          constant_values=255)
            if r == 0 and col_labels is not None:
                cell = np.concatenate(
                    [_label_band(cell.shape[1], col_labels[c], label_height), cell],
                    axis=0)
            cells.append(cell)
        row_img = np.concatenate(cells, axis=1)
        if row_labels is not None:
            band = np.rot90(_label_band(row_img.shape[0], row_labels[r],
                                        label_height), k=1)
            row_img = np.concatenate([band, row_img], axis=1)
        rows.append(row_img)
    width = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 0), (0, width - r.shape[1]), (0, 0)),
                   constant_values=255) for r in rows]
    return np.concatenate(rows, axis=0)
