"""NS-LPIPS: LPIPS on the background, mask derived from Stable Diffusion's
cross-attention map of the edited word (runs a diffusion inversion inside the
metric).

Counterpart of /root/reference/metrics/nslpips.py: a ptp attention-store
inversion (forward CFG=1) aggregates the edit word's cross-attention map,
resized to image resolution; background = 1 - map; LPIPS on masked images.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..editing.ptp import AttnStoreController, aggregate_store, attention_map_for_token
from ..editing.seq_aligner import get_word_inds
from .base import SimpleMetric
from .simple import _lpips_fn


class NSLPIPS(SimpleMetric):
    def __init__(self, input_range: Tuple[float, float] = (-1, 1),
                 device: Optional[str] = None, model: str = "sd15",
                 num_inference_steps: int = 50, weights_path: Optional[str] = None):
        super().__init__(input_range, device)
        from ..inversion.base import DiffusionInversion
        from ..models import load_diffusion_model

        bundle, _ = load_diffusion_model(model)
        self.inverter = DiffusionInversion(bundle, scheduler="ddim",
                                           num_inference_steps=num_inference_steps,
                                           guidance_scale_fwd=1)
        self.weights_path = weights_path

    def get_bg_mask(self, image, prompt: str, word: str):
        inv = self.inverter
        ctrl = AttnStoreController(inv, n_prompts=1)
        res_side = ctrl.store_res[0]
        context = inv.create_context(prompt)
        # run the mask inversion at the diffusion model's native resolution;
        # the attention map is resized back to the metric image size
        img = jnp.asarray(image, jnp.float32)
        size = inv.model.image_size
        if img.shape[1] != size:
            img = jax.image.resize(img, (img.shape[0], size, size, 3),
                                   method="bilinear")
        latent = inv.encode(img)
        fwd = inv.diffusion_forward(latent, context, guidance_scale_fwd=1, ctrl=ctrl)
        st = fwd["fwd_state"]
        agg = aggregate_store(st["store_sum"], list(ctrl.store_keys), res_side, 1, 0)
        widx = get_word_inds(prompt, word, inv.model.tokenizer)
        if len(widx) == 0:
            return None
        amap = attention_map_for_token(agg, int(widx[0]),
                                       resize=image.shape[1])
        return 1.0 - amap  # (H, W)

    def forward(self, source_image, edit_image, source_prompt: str, edit_word: str):
        src = self._normalize(source_image)
        tgt = self._normalize(edit_image)
        bg = self.get_bg_mask(src * 2 - 1, source_prompt, edit_word)
        if bg is None:
            return None
        bg = bg[None, ..., None]
        return _lpips_fn(self.weights_path)((src * bg) * 2 - 1, (tgt * bg) * 2 - 1)[0]

    def __repr__(self):
        return "nslpips"
