"""CLIP similarity / accuracy metrics.

Counterpart of /root/reference/metrics/clip_similarity.py: cosine similarity
between CLIP embeddings — text<->image, image<->image, directional
(text-delta <-> image-delta), and BLIP-caption<->text; plus the pix2pix-zero
accuracy variants (target-prompt similarity > source-prompt similarity).

Offline notes: CLIP ViT-B/16 weights are loaded from a local .npz when
available, else deterministic random init (self-consistent values); the
text_text metric captions with the Flax BLIP captioner (models/blip.py) by
default — pass `caption_fn` to override, `captioner="tiny"` for tests.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import (
    CLIPTextConfig,
    CLIPTextProjector,
    CLIPVisionConfig,
    CLIPVisionEncoder,
)
from ..models.tokenizer import load_tokenizer
from .base import SimpleMetric

# 80 ImageNet prompt templates (openai CLIP; reference clip_similarity.py:14-95)
IMAGENET_TEMPLATES = [
    "a bad photo of a {}.", "a photo of many {}.", "a sculpture of a {}.",
    "a photo of the hard to see {}.", "a low resolution photo of the {}.",
    "a rendering of a {}.", "graffiti of a {}.", "a bad photo of the {}.",
    "a cropped photo of the {}.", "a tattoo of a {}.", "the embroidered {}.",
    "a photo of a hard to see {}.", "a bright photo of a {}.",
    "a photo of a clean {}.", "a photo of a dirty {}.", "a dark photo of the {}.",
    "a drawing of a {}.", "a photo of my {}.", "the plastic {}.",
    "a photo of the cool {}.", "a close-up photo of a {}.",
    "a black and white photo of the {}.", "a painting of the {}.",
    "a painting of a {}.", "a pixelated photo of the {}.",
    "a sculpture of the {}.", "a bright photo of the {}.",
    "a cropped photo of a {}.", "a plastic {}.", "a photo of the dirty {}.",
    "a jpeg corrupted photo of a {}.", "a blurry photo of the {}.",
    "a photo of the {}.", "a good photo of the {}.", "a rendering of the {}.",
    "a {} in a video game.", "a photo of one {}.", "a doodle of a {}.",
    "a close-up photo of the {}.", "a photo of a {}.", "the origami {}.",
    "the {} in a video game.", "a sketch of a {}.", "a doodle of the {}.",
    "a origami {}.", "a low resolution photo of a {}.", "the toy {}.",
    "a rendition of the {}.", "a photo of the clean {}.",
    "a photo of a large {}.", "a rendition of a {}.", "a photo of a nice {}.",
    "a photo of a weird {}.", "a blurry photo of a {}.", "a cartoon {}.",
    "art of a {}.", "a sketch of the {}.", "a embroidered {}.",
    "a pixelated photo of a {}.", "itap of the {}.",
    "a jpeg corrupted photo of the {}.", "a good photo of a {}.",
    "a plushie {}.", "a photo of the nice {}.", "a photo of the small {}.",
    "a photo of the weird {}.", "the cartoon {}.", "art of the {}.",
    "a drawing of the {}.", "a photo of the large {}.",
    "a black and white photo of a {}.", "the plushie {}.",
    "a dark photo of a {}.", "itap of a {}.", "graffiti of the {}.",
    "a toy {}.", "itap of my {}.", "a photo of a cool {}.",
    "a photo of a small {}.", "a tattoo of the {}.",
]

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class _ClipBackbone:
    """Cached CLIP towers + jitted encoders (random-init offline)."""

    def __init__(self, vision_cfg: CLIPVisionConfig, text_cfg: CLIPTextConfig,
                 seed: int = 11, weights_path: Optional[str] = None,
                 vocab_dir: Optional[str] = None):
        self.vision_cfg = vision_cfg
        self.vision = CLIPVisionEncoder(vision_cfg)
        self.text = CLIPTextProjector(text_cfg, vision_cfg.projection_dim)
        self.tokenizer = load_tokenizer(vocab_dir, vocab_size=text_cfg.vocab_size)
        sz = vision_cfg.image_size
        if weights_path:
            # openai `clip` state-dict .npz (tools/convert_weights.py `clip`)
            from ..models.backbone_weights import (map_openai_clip_text,
                                                   map_openai_clip_vision,
                                                   to_jax)

            flat = dict(np.load(weights_path))
            self.vparams = to_jax(map_openai_clip_vision(
                flat, vision_cfg.num_layers))
            self.tparams = to_jax(map_openai_clip_text(flat, text_cfg.num_layers))
        else:
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            self.vparams = jax.jit(lambda k: self.vision.init(
                k, jnp.zeros((1, sz, sz, 3)))["params"])(k1)
            self.tparams = jax.jit(lambda k: self.text.init(
                k, jnp.zeros((1, text_cfg.max_length), jnp.int32))["params"])(k2)

        # params passed as jit arguments (not closure constants) — see
        # inversion/base.py note on the axon compile relay's size limit
        @jax.jit
        def encode_image(vparams, pixels01):
            x = jax.image.resize(pixels01, (pixels01.shape[0], sz, sz, 3),
                                 method="cubic")
            x = (jnp.clip(x, 0, 1) - CLIP_MEAN) / CLIP_STD
            f = self.vision.apply({"params": vparams}, x)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        @jax.jit
        def encode_ids(tparams, ids):
            f = self.text.apply({"params": tparams}, ids)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        self.encode_image = functools.partial(encode_image, self.vparams)
        self.encode_ids = functools.partial(encode_ids, self.tparams)

    def text_feat(self, prompt: str, templates: List[str]) -> jnp.ndarray:
        texts = [t.format(prompt).replace("a a", "a").replace("the a", "a")
                 for t in templates]
        ids = self.tokenizer(texts)
        emb = self.encode_ids(jnp.asarray(ids))
        mean = emb.mean(axis=0)
        return mean / jnp.linalg.norm(mean)


@functools.lru_cache(maxsize=2)
def _cached_clip_backbone(image_size, hidden, layers, heads, patch, text_hidden,
                          text_layers, text_heads, vocab_size, weights_path,
                          vocab_dir, projection_dim) -> _ClipBackbone:
    vcfg = CLIPVisionConfig(image_size=image_size, patch_size=patch,
                            hidden_size=hidden, num_layers=layers, num_heads=heads,
                            projection_dim=projection_dim)
    tcfg = CLIPTextConfig(vocab_size=vocab_size, hidden_size=text_hidden,
                          num_layers=text_layers, num_heads=text_heads)
    return _ClipBackbone(vcfg, tcfg, weights_path=weights_path,
                         vocab_dir=vocab_dir)


def get_clip_backbone(image_size: int = 224, hidden: int = 768, layers: int = 12,
                      heads: int = 12, patch: int = 16, text_hidden: int = 512,
                      text_layers: int = 12, text_heads: int = 8,
                      vocab_size: int = 49408,
                      weights_path: Optional[str] = None,
                      vocab_dir: Optional[str] = None,
                      projection_dim: int = 512) -> _ClipBackbone:
    """CLIP ViT-B/16 by default (the reference's metric model); pass smaller
    dims for tests.  Pretrained weights: explicit `weights_path` (openai clip
    state-dict .npz) / `vocab_dir` or the ETA_TPU_CLIP_NPZ / ETA_TPU_CLIP_VOCAB
    env vars; random init otherwise."""
    from ..models.backbone_weights import env_weights

    weights_path = env_weights("ETA_TPU_CLIP_NPZ", weights_path)
    vocab_dir = vocab_dir or os.environ.get("ETA_TPU_CLIP_VOCAB")
    return _cached_clip_backbone(image_size, hidden, layers, heads, patch,
                                 text_hidden, text_layers, text_heads,
                                 vocab_size, weights_path, vocab_dir,
                                 projection_dim)


class CLIPSimilarity(SimpleMetric):
    """Cosine similarity metrics (reference :160-278). Higher is better."""

    def __init__(self, input_range: Tuple[float, float] = (-1, 1),
                 device: Optional[str] = None, use_imagenet_templates: bool = False,
                 metric: str = "text_img", clip_model: str = "ViT-B/16",
                 caption_fn: Optional[Callable] = None, backbone_kwargs=None,
                 captioner: str = "base"):
        assert metric in ("text_img", "img_img", "text_text", "textdir_imgdir")
        super().__init__(input_range, device)
        self.metric = metric
        self.templates = IMAGENET_TEMPLATES if use_imagenet_templates else ["{}"]
        self.caption_fn = caption_fn
        self.captioner = captioner  # BLIP preset used when caption_fn is None
        self.backbone = get_clip_backbone(**(backbone_kwargs or {}))

    def img_feat(self, image):
        x = self._normalize(jnp.asarray(image))
        return self.backbone.encode_image(x)[0]

    def txt_feat(self, prompt: str):
        return self.backbone.text_feat(prompt, self.templates)

    def forward(self, source_image=None, target_image=None, source_prompt=None,
                target_prompt=None):
        if self.metric == "text_img":
            a = self.img_feat(target_image)
            b = self.txt_feat(target_prompt)
        elif self.metric == "img_img":
            a = self.img_feat(source_image)
            b = self.img_feat(target_image)
        elif self.metric == "textdir_imgdir":
            a = self.img_feat(target_image) - self.img_feat(source_image)
            b = self.txt_feat(target_prompt) - self.txt_feat(source_prompt)
        elif self.metric == "text_text":
            if self.caption_fn is None:
                # BLIP captioner, LAVIS convention: prompt "a picture of"
                # stripped from the caption (reference clip_similarity.py:
                # 128-157). Offline (no BLIP weights) the captioner is
                # deterministic random init, so captions are self-consistent
                # token strings rather than English.
                from ..models.blip import get_blip_captioner

                cap = get_blip_captioner(self.captioner)
                self.caption_fn = lambda img: cap.caption(
                    self._normalize(jnp.asarray(img)) * 2.0 - 1.0,
                    prompt="a picture of", include_prompt=False)[0]
            caption = self.caption_fn(target_image)
            a = self.txt_feat(caption)
            b = self.txt_feat(target_prompt)
        return jnp.dot(a, b)

    def __repr__(self):
        return f"clip_{self.metric}"


class CLIPAccuracy(SimpleMetric):
    """1 if similarity(target prompt) > similarity(source prompt)
    (reference :281-324)."""

    def __init__(self, input_range: Tuple[float, float] = (-1, 1),
                 device: Optional[str] = None, use_imagenet_templates: bool = False,
                 metric: str = "text_img", clip_model: str = "ViT-B/16",
                 backbone_kwargs=None):
        super().__init__(input_range, device)
        self.clip_sim = CLIPSimilarity(input_range, device, use_imagenet_templates,
                                       metric, clip_model,
                                       backbone_kwargs=backbone_kwargs)

    def forward(self, source_image=None, target_image=None, source_prompt=None,
                target_prompt=None):
        sim_src = self.clip_sim(target_image=target_image, source_prompt=source_prompt,
                                target_prompt=source_prompt)
        sim_tgt = self.clip_sim(target_image=target_image, source_prompt=source_prompt,
                                target_prompt=target_prompt)
        return (sim_tgt > sim_src).astype(jnp.float32)

    def __repr__(self):
        return f"{self.clip_sim}_acc"
