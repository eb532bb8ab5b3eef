"""LPIPS perceptual metric (AlexNet backbone) in Flax.

Counterpart of the `lpips` package the reference uses
(/root/reference/metrics/metrics.py:41-63): AlexNet conv features at the five
ReLU stages, channel-unit-normalized, squared difference, learned nonnegative
1x1 "lin" weights, spatial mean, summed over stages.

Offline note: pretrained AlexNet/lin weights are not available in this
environment; `load_lpips_params` falls back to deterministic random init
(useful for regression testing and benchmarking — values are self-consistent
but not comparable to published LPIPS numbers) and accepts an .npz produced by
tools/convert_lpips.py when real weights are available.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision AlexNet feature channels at the 5 conv/ReLU stages
ALEX_CHANNELS = (64, 192, 384, 256, 256)
# imagenet scaling used by lpips.ScalingLayer
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `features` trunk, NHWC, returning the 5 ReLU maps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="conv0")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv3")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv4")(x)
        x = nn.relu(x)
        feats.append(x)
        return feats


class LPIPS(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        """x, y: (B, H, W, 3) in [-1, 1]. Returns (B,) LPIPS distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        xs = (x - shift) / scale
        ys = (y - shift) / scale
        net = AlexNetFeatures(self.dtype, name="alex")
        fx = net(xs)
        fy = net(ys)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            # lpips.normalize_tensor: f / (||f|| + eps) — eps OUTSIDE the sqrt
            a = a / (jnp.sqrt(jnp.sum(a ** 2, axis=-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b ** 2, axis=-1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.uniform(0.1),
                           (ALEX_CHANNELS[i],))
            d = jnp.sum(d * jnp.abs(w), axis=-1)  # nonneg lin weights
            total = total + d.mean(axis=(1, 2))
        return total


_LPIPS_CACHE = {}


def load_lpips_params(weights_path: Optional[str] = None, seed: int = 7):
    """Load LPIPS params from an .npz (flat {path: array}, explicit path or
    the ETA_TPU_LPIPS_NPZ env var) or random-init."""
    if weights_path is None:
        env = os.environ.get("ETA_TPU_LPIPS_NPZ")
        if env and os.path.exists(env):
            weights_path = env
    key = weights_path or f"random-{seed}"
    if key in _LPIPS_CACHE:
        return _LPIPS_CACHE[key]
    model = LPIPS()
    dummy = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(lambda k: model.init(k, dummy, dummy)["params"])(
        jax.random.PRNGKey(seed))
    if weights_path and os.path.exists(weights_path):
        import flax

        flat = dict(np.load(weights_path))
        params = flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
    _LPIPS_CACHE[key] = (model, params)
    return model, params
