"""DINO-ViT structure distance (Splice-style).

Counterpart of /root/reference/metrics/dino_vit_structure.py: MSE between the
cosine self-similarity matrices of DINO ViT attention keys (layer 11) of the
two images, after resize-224 + ImageNet normalization.  DINO/DINOv2 weights
are unavailable offline — deterministic random init, or a local .npz.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vit import DINO_VITB8, DINOV2_VITB14, ViT, ViTConfig
from .base import SimpleMetric

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def attn_cosine_sim(x, eps: float = 1e-8):
    """Cosine-similarity matrix over token vectors (t, d) -> (t, t), matching
    the reference's attn_cosine_sim."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    factor = jnp.maximum(norm @ norm.T, eps)
    return (x @ x.T) / factor


@functools.lru_cache(maxsize=2)
def _dino_fns(model_name: str, image_size: int, hidden: int, layers: int,
              heads: int, seed: int = 13, weights_path: Optional[str] = None):
    patch = {"dino_vitb8": 8, "dinov2_vitb14": 14}.get(model_name, 8)
    cfg = ViTConfig(image_size=image_size, patch_size=patch, hidden_size=hidden,
                    num_layers=layers, num_heads=heads,
                    layerscale=model_name.startswith("dinov2"))
    model = ViT(cfg)
    if weights_path:
        # torch.hub state-dict .npz (tools/convert_weights.py `dino` mode)
        from ..models.backbone_weights import map_dino_vit, to_jax

        params = to_jax(map_dino_vit(dict(np.load(weights_path)), layers,
                                     layerscale=cfg.layerscale))
    else:
        params = jax.jit(lambda k: model.init(
            k, jnp.zeros((1, image_size, image_size, 3)))["params"])(
                jax.random.PRNGKey(seed))
    layer = cfg.num_layers - 1

    # params as a jit argument, not a closure constant (see inversion/base.py)
    @jax.jit
    def self_sim(params_, pixels01):
        x = jax.image.resize(pixels01, (pixels01.shape[0], image_size, image_size, 3),
                             method="bilinear")
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        keys = model.keys_at_layer(params_, x, layer)  # (1, tokens, hidden)
        return attn_cosine_sim(keys[0])

    return functools.partial(self_sim, params)


class DinoVitStructure(SimpleMetric):
    """Lower is better (reference :212-284)."""

    def __init__(self, input_range: Tuple[float, float] = (-1, 1),
                 device: Optional[str] = None, vit_model: str = "dino_vitb8",
                 image_size: int = 224, hidden: int = 768, layers: int = 12,
                 heads: int = 12, weights_path: Optional[str] = None):
        super().__init__(input_range, device)
        self.vit_model = vit_model
        from ..models.backbone_weights import env_weights

        env = ("ETA_TPU_DINOV2_NPZ" if vit_model.startswith("dinov2")
               else "ETA_TPU_DINO_NPZ")
        weights_path = env_weights(env, weights_path)
        self._self_sim = _dino_fns(vit_model, image_size, hidden, layers, heads,
                                   weights_path=weights_path)

    def forward(self, pred, target):
        pred, target = self._normalize(pred), self._normalize(target)
        s_t = self._self_sim(jnp.asarray(target))
        s_p = self._self_sim(jnp.asarray(pred))
        return jnp.mean((s_p - s_t) ** 2)

    def __repr__(self):
        return self.vit_model
