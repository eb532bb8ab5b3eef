"""Pretrained-weight mapping for the METRIC backbones (CLIP ViT-B/16, DINO
ViT) — the counterpart of models/weights.py for the models the reference's
metric suite downloads at runtime (OpenAI CLIP via `clip.load("ViT-B/16")`,
/root/reference/metrics/clip_similarity.py:160-180; DINO via torch.hub,
dino_vit_structure.py:23-60).

Zero-egress discipline: weights arrive as flat .npz dumps of the ORIGINAL
torch state dicts (tools/convert_weights.py `clip` / `dino` modes — raw
`state_dict()` key->array), and these mappers transform them onto this
package's Flax module trees (transposes for linear/conv layouts, fused-qkv
splits).  Resolution order everywhere: explicit argument > environment
variable > deterministic random init.

Env vars: ETA_TPU_CLIP_NPZ, ETA_TPU_CLIP_VOCAB, ETA_TPU_DINO_NPZ,
ETA_TPU_DINOV2_NPZ, ETA_TPU_LPIPS_NPZ, ETA_TPU_BLIP_NPZ (see
docs/WEIGHTS_RUNBOOK.md).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def env_weights(var: str, explicit: Optional[str] = None) -> Optional[str]:
    """Explicit path wins; else the env var; None if neither points at a file."""
    path = explicit or os.environ.get(var)
    return path if path and os.path.exists(path) else None


def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32).T


def _ln(flat, prefix) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(flat[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(flat[f"{prefix}.bias"], np.float32)}


def _linear(flat, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(flat[f"{prefix}.weight"])}
    if f"{prefix}.bias" in flat:
        out["bias"] = np.asarray(flat[f"{prefix}.bias"], np.float32)
    return out


def _clip_resblock(flat, prefix) -> Dict[str, Any]:
    """One openai-CLIP ResidualAttentionBlock -> models/clip.py CLIPLayer.

    The fused in_proj (3C, C) rows are ordered [q; k; v] (torch
    nn.MultiheadAttention convention)."""
    w = np.asarray(flat[f"{prefix}.attn.in_proj_weight"], np.float32)
    b = np.asarray(flat[f"{prefix}.attn.in_proj_bias"], np.float32)
    c = w.shape[1]
    qkv_w = np.split(w, 3, axis=0)
    qkv_b = np.split(b, 3, axis=0)
    attn = {}
    for name, wi, bi in zip(("q_proj", "k_proj", "v_proj"), qkv_w, qkv_b):
        attn[name] = {"kernel": wi.T.copy(), "bias": bi.copy()}
    attn["out_proj"] = _linear(flat, f"{prefix}.attn.out_proj")
    assert attn["q_proj"]["kernel"].shape == (c, c)
    return {
        "layer_norm1": _ln(flat, f"{prefix}.ln_1"),
        "self_attn": attn,
        "layer_norm2": _ln(flat, f"{prefix}.ln_2"),
        "fc1": _linear(flat, f"{prefix}.mlp.c_fc"),
        "fc2": _linear(flat, f"{prefix}.mlp.c_proj"),
    }


def map_openai_clip_vision(flat: Dict[str, np.ndarray], num_layers: int
                           ) -> Dict[str, Any]:
    """openai CLIP `visual.*` state dict -> CLIPVisionEncoder params."""
    p: Dict[str, Any] = {
        # conv1 (O, 3, p, p) -> HWIO; no bias in openai CLIP
        "patch_embedding": {"kernel": np.transpose(
            np.asarray(flat["visual.conv1.weight"], np.float32), (2, 3, 1, 0))},
        "class_embedding": np.asarray(flat["visual.class_embedding"], np.float32),
        "position_embedding": np.asarray(
            flat["visual.positional_embedding"], np.float32),
        "pre_layernorm": _ln(flat, "visual.ln_pre"),
        "post_layernorm": _ln(flat, "visual.ln_post"),
        # applied as x @ proj on both sides: no transpose
        "visual_projection": np.asarray(flat["visual.proj"], np.float32),
    }
    for i in range(num_layers):
        p[f"layers_{i}"] = _clip_resblock(flat, f"visual.transformer.resblocks.{i}")
    return p


def map_openai_clip_text(flat: Dict[str, np.ndarray], num_layers: int
                         ) -> Dict[str, Any]:
    """openai CLIP text tower -> CLIPTextProjector params
    ({text_model: ..., text_projection})."""
    tm: Dict[str, Any] = {
        "token_embedding": {"embedding": np.asarray(
            flat["token_embedding.weight"], np.float32)},
        "position_embedding": np.asarray(flat["positional_embedding"], np.float32),
        "final_layer_norm": _ln(flat, "ln_final"),
    }
    for i in range(num_layers):
        tm[f"layers_{i}"] = _clip_resblock(flat, f"transformer.resblocks.{i}")
    return {"text_model": tm,
            "text_projection": np.asarray(flat["text_projection"], np.float32)}


def map_dino_vit(flat: Dict[str, np.ndarray], num_layers: int,
                 layerscale: bool = False) -> Dict[str, Any]:
    """facebookresearch DINO / DINOv2 ViT state dict -> models/vit.py ViT
    params.  DINOv2 blocks carry LayerScale gammas (ls1/ls2) — present in the
    mapped tree only when `layerscale` (ViTConfig.layerscale must match)."""
    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.transpose(np.asarray(
                flat["patch_embed.proj.weight"], np.float32), (2, 3, 1, 0)),
            "bias": np.asarray(flat["patch_embed.proj.bias"], np.float32),
        },
        "cls_token": np.asarray(flat["cls_token"], np.float32).reshape(-1),
        "pos_embed": np.asarray(flat["pos_embed"], np.float32).reshape(
            np.asarray(flat["pos_embed"]).shape[-2:]),
        "norm": _ln(flat, "norm"),
    }
    for i in range(num_layers):
        pre = f"blocks.{i}"
        blk = {
            "norm1": _ln(flat, f"{pre}.norm1"),
            "qkv": _linear(flat, f"{pre}.attn.qkv"),
            "proj": _linear(flat, f"{pre}.attn.proj"),
            "norm2": _ln(flat, f"{pre}.norm2"),
            "fc1": _linear(flat, f"{pre}.mlp.fc1"),
            "fc2": _linear(flat, f"{pre}.mlp.fc2"),
        }
        if layerscale:
            blk["ls1_gamma"] = np.asarray(flat[f"{pre}.ls1.gamma"], np.float32)
            blk["ls2_gamma"] = np.asarray(flat[f"{pre}.ls2.gamma"], np.float32)
        p[f"blocks_{i}"] = blk
    return p


def to_jax(tree):
    import jax.numpy as jnp

    import jax

    return jax.tree_util.tree_map(jnp.asarray, tree)
