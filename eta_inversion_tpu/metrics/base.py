"""Metric base classes (counterpart of /root/reference/metrics/base.py).

Protocol: `update(...)` computes + records one example, `compute()` returns
(mean, {"value": mean, "all": [...]}) and resets.  Images are NHWC arrays in
`input_range` (default [-1, 1]); `_normalize` maps to [0, 1].
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np


class BaseMetric:
    def __init__(self, input_range: Tuple[float, float] = (-1, 1),
                 device: Optional[str] = None):
        self.input_range = input_range
        self.device = device  # kept for API parity; JAX manages placement

    def _normalize(self, x):
        if self.input_range is None:
            return x
        x = jnp.asarray(x)
        return (x - self.input_range[0]) / (self.input_range[1] - self.input_range[0])

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def update(self, *args, **kwargs):
        raise NotImplementedError

    def compute(self):
        raise NotImplementedError


class SimpleMetric(BaseMetric):
    def __init__(self, input_range: Tuple[float, float] = (-1, 1),
                 device: Optional[str] = None):
        super().__init__(input_range=input_range, device=device)
        self.losses: List[float] = []

    def update(self, *args, **kwargs) -> Union[float, None]:
        loss = self.forward(*args, **kwargs)
        if loss is None:
            return None
        self.losses.append(float(np.asarray(loss)))
        return self.losses[-1]

    def compute(self) -> Tuple[float, Dict[str, Union[float, List[float]]]]:
        res = float(np.mean(self.losses))
        out = res, {"value": res, "all": self.losses}
        self.losses = []
        return out
