"""Dataset protocol: sized, indexable, iterable sample sources.

Counterpart of /root/reference/dataset/base.py — the contract carried over is
behavioral only: `len()` + integer indexing yield sample dicts, iteration
walks indices in order, and `DatasetSubset` must reproduce the reference's
selection semantics exactly (seed-0 `random.Random` shuffle over the index
list, truncation via `length`, explicit `indices` overriding `length`) so that
result trees stay byte-compatible with reference sweeps.
"""

from __future__ import annotations

import random
from typing import Any, Dict, List, Optional, Type


class DatasetBase:
    """Sized + indexable sample source; iteration is derived from those two."""

    def __iter__(self):
        return (self[i] for i in range(len(self)))

    def __len__(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Dict[str, Any]:  # pragma: no cover
        raise NotImplementedError


class DatasetSubset(DatasetBase):
    """View over another dataset: an index list, optionally seed-shuffled and
    cut to `length` (reference base.py:25-65 selection semantics)."""

    def __init__(self, dataset_cls: Type[DatasetBase], length: Optional[int] = None,
                 indices: Optional[List[int]] = None, shuffle: bool = True,
                 seed: int = 0, **kwargs):
        self.dataset = dataset_cls(**kwargs)
        explicit = indices is not None
        self.ind = list(indices) if explicit else list(range(len(self.dataset)))
        self.length = len(self.ind) if explicit else length
        if shuffle:
            # must match the reference bit-for-bit: stdlib Random(seed)
            # in-place shuffle of the full index list, truncation afterwards
            random.Random(seed).shuffle(self.ind)

    @property
    def skip_img_load(self):
        return self.dataset.skip_img_load

    def __len__(self) -> int:
        return self.length if self.length is not None else len(self.ind)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.dataset[self.ind[idx]]

    def __repr__(self) -> str:
        return f"{self.dataset}_{self.length}"
