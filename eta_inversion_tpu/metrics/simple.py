"""MSE / PSNR / LPIPS metrics (counterpart of /root/reference/metrics/metrics.py)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.lpips import load_lpips_params
from .base import SimpleMetric


class MSEMetric(SimpleMetric):
    def forward(self, pred, target):
        pred, target = self._normalize(pred), self._normalize(target)
        return jnp.mean((pred - target) ** 2)

    def __repr__(self):
        return "mse"


class PSNRMetric(SimpleMetric):
    def forward(self, pred, target):
        pred, target = self._normalize(pred), self._normalize(target)
        mse = jnp.mean((pred - target) ** 2)
        return 10.0 * jnp.log10(1.0 / mse)

    def __repr__(self):
        return "psnr"


@functools.lru_cache(maxsize=2)
def _lpips_fn(weights_path: Optional[str]):
    model, params = load_lpips_params(weights_path)

    # params as an argument (not a closure constant): keeps the compiled HLO
    # weight-free (axon's compile relay rejects giant constant blobs)
    @jax.jit
    def fn(params_, a, b):
        return model.apply({"params": params_}, a, b)

    return functools.partial(fn, params)


class LPIPSMetric(SimpleMetric):
    """LPIPS (AlexNet). Lower is better."""

    def __init__(self, input_range: Tuple[float, float] = (-1, 1),
                 device: Optional[str] = None, weights_path: Optional[str] = None):
        super().__init__(input_range, device)
        self.weights_path = weights_path

    def forward(self, pred, target):
        pred = self._normalize(pred) * 2 - 1
        target = self._normalize(target) * 2 - 1
        return _lpips_fn(self.weights_path)(jnp.asarray(pred), jnp.asarray(target))[0]

    def __repr__(self):
        return "lpips"
