"""SSIM and MS-SSIM in pure jnp.

Counterpart of /root/reference/metrics/ssim.py (torchmetrics SSIM) and
msssim.py (bundled pytorch-msssim): separable 11-tap Gaussian (sigma 1.5),
valid padding, K=(0.01, 0.03), data_range=1.0; MS-SSIM uses the standard
5-level weights with 2x average-pool downsampling (odd sizes padded as in
pytorch-msssim) and ReLU'd per-level contrast terms.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import SimpleMetric

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gauss_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(x, win):
    """Separable valid-padding Gaussian blur over H, W of NHWC.  Dimensions
    smaller than the kernel are skipped (pytorch-msssim semantics,
    reference msssim.py:82-103)."""
    c = x.shape[-1]
    n = win.shape[0]
    kh = win.reshape(-1, 1, 1, 1) * jnp.ones((1, 1, 1, c))
    kw = win.reshape(1, -1, 1, 1) * jnp.ones((1, 1, 1, c))
    if x.shape[1] >= n:
        dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                         feature_group_count=c)
    if x.shape[2] >= n:
        dn = jax.lax.conv_dimension_numbers(x.shape, kw.shape, ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                         feature_group_count=c)
    return x


def ssim_parts(x, y, win, k=(0.01, 0.03), data_range=1.0):
    """Returns (ssim_per_channel, cs_per_channel), each (B, C)."""
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2
    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _blur(x * x, win) - mu_xx
    sigma_y = _blur(y * y, win) - mu_yy
    sigma_xy = _blur(x * y, win) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim_map.mean(axis=(1, 2)), cs.mean(axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(x, y, data_range: float = 1.0):
    win = jnp.asarray(_gauss_kernel())
    s, _ = ssim_parts(x, y, win, data_range=data_range)
    return s.mean()


@functools.partial(jax.jit, static_argnames=("data_range",))
def ms_ssim(x, y, data_range: float = 1.0):
    win = jnp.asarray(_gauss_kernel())
    weights = jnp.asarray(MSSSIM_WEIGHTS)
    levels = len(MSSSIM_WEIGHTS)
    mcs = []
    s = None
    for i in range(levels):
        s, cs = ssim_parts(x, y, win, data_range=data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            # pytorch-msssim downsamples with avg_pool2d(2, padding=s % 2):
            # torch's pool padding is SYMMETRIC (zeros on both sides, included
            # in the /4 average).  Right-side-only padding looks plausible and
            # yields the same output shape but different border values — pinned
            # against the literal oracle in tests/oracle_msssim.py.
            pad_h, pad_w = x.shape[1] % 2, x.shape[2] % 2
            pads = ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0))
            x = jnp.pad(x, pads)
            y = jnp.pad(y, pads)
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4.0
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4.0
    s = jax.nn.relu(s)
    mcs_and_ssim = jnp.stack(mcs + [s], axis=0)  # (levels, B, C)
    out = jnp.prod(mcs_and_ssim ** weights[:, None, None], axis=0)
    return out.mean()


class SSIM(SimpleMetric):
    """SSIM, 1 best / 0 worst (reference metrics/ssim.py)."""

    def forward(self, pred, target):
        pred, target = self._normalize(pred), self._normalize(target)
        return ssim(jnp.asarray(pred), jnp.asarray(target))

    def __repr__(self):
        return "ssim"


class MSSSIM(SimpleMetric):
    """MS-SSIM, 1 best / 0 worst (reference metrics/msssim.py, data_range=1)."""

    def forward(self, pred, target):
        pred, target = self._normalize(pred), self._normalize(target)
        return ms_ssim(jnp.asarray(pred), jnp.asarray(target))

    def __repr__(self):
        return "msssim"
