"""Small math helpers.

Counterpart of the slerp helpers in
/root/reference/modules/utils/ptp_utils.py:33-47 (spherical interpolation
between latents, e.g. for latent-space interpolation sweeps).
"""

from __future__ import annotations

import jax.numpy as jnp


def slerp(val, low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
    """Spherical linear interpolation along axis 1 of (B, N) arrays."""
    low_n = low / jnp.linalg.norm(low, axis=1, keepdims=True)
    high_n = high / jnp.linalg.norm(high, axis=1, keepdims=True)
    omega = jnp.arccos(jnp.clip((low_n * high_n).sum(1), -1.0, 1.0))
    so = jnp.sin(omega)
    return (jnp.sin((1.0 - val) * omega) / so)[:, None] * low + \
           (jnp.sin(val * omega) / so)[:, None] * high


def slerp_tensor(val, low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
    """slerp over arbitrarily-shaped arrays, flattened per sample."""
    shape = low.shape
    out = slerp(val, low.reshape(shape[0], -1), high.reshape(shape[0], -1))
    return out.reshape(shape)
