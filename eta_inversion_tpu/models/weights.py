"""Pretrained-weight loading: diffusers safetensors -> Flax param pytrees.

The reference downloads CompVis/stable-diffusion-v1-4 through diffusers
(/root/reference/modules/models/__init__.py:104-138).  This environment has no
network egress, so weights arrive as local files; this module provides:

  * a dependency-free safetensors reader/writer (the format is an 8-byte
    little-endian header length + JSON header + raw tensor buffer);
  * the complete key mapping from diffusers' torch state dicts (UNet, VAE,
    CLIP text encoder) onto this package's module tree, including layout
    transposes (torch OIHW conv -> flax HWIO, torch (out,in) linear -> flax
    (in,out));
  * `load_pretrained_params(weights_dir, preset, dtype)` used by
    models.load_diffusion_model when `weights_dir` is given.

The mapping is declared as (torch_key -> (flax_path, transform)) pairs built
programmatically from the preset config, so the tiny test preset exercises the
exact same mapping code as SD-1.5.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from .clip import CLIPTextConfig
from .unet import UNetConfig
from .vae import VAEConfig

_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": None, "I32": np.int32,
    "I64": np.int64, "U8": np.uint8, "F64": np.float64,
}


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (no external deps)."""
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len))
        buf = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        raw = buf[start:end]
        if meta["dtype"] == "BF16":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = np.frombuffer(raw, dtype=_DTYPES[meta["dtype"]])
        out[name] = arr.reshape(meta["shape"]).copy()
    return out


def write_safetensors(path: str, tensors: Dict[str, np.ndarray]) -> None:
    """Minimal safetensors writer (for tests / conversion tools)."""
    header = {}
    offset = 0
    blobs = []
    dtype_names = {np.dtype(np.float32): "F32", np.dtype(np.float16): "F16",
                   np.dtype(np.int64): "I64", np.dtype(np.int32): "I32"}
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        blob = arr.tobytes()
        header[name] = {"dtype": dtype_names[arr.dtype], "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(blob)]}
        offset += len(blob)
        blobs.append(blob)
    hj = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for b in blobs:
            f.write(b)


# ---------------------------------------------------------------------------
# transforms (torch layout -> flax layout); each has an inverse for tests
# ---------------------------------------------------------------------------

def t_conv(w):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def t_conv_inv(w):
    return np.transpose(w, (3, 2, 0, 1))


def t_dense(w):  # (O, I) -> (I, O)
    return np.transpose(w, (1, 0))


t_dense_inv = t_dense


def t_id(w):
    return w


Transform = Tuple[Callable, Callable]
CONV: Transform = (t_conv, t_conv_inv)
DENSE: Transform = (t_dense, t_dense_inv)
ID: Transform = (t_id, t_id)


def _norm(dst: Dict, torch_prefix: str, flax_path: Tuple[str, ...]):
    dst[f"{torch_prefix}.weight"] = (flax_path + ("scale",), ID)
    dst[f"{torch_prefix}.bias"] = (flax_path + ("bias",), ID)


def _conv(dst: Dict, torch_prefix: str, flax_path: Tuple[str, ...]):
    dst[f"{torch_prefix}.weight"] = (flax_path + ("kernel",), CONV)
    dst[f"{torch_prefix}.bias"] = (flax_path + ("bias",), ID)


def _dense(dst: Dict, torch_prefix: str, flax_path: Tuple[str, ...],
           bias: bool = True):
    dst[f"{torch_prefix}.weight"] = (flax_path + ("kernel",), DENSE)
    if bias:
        dst[f"{torch_prefix}.bias"] = (flax_path + ("bias",), ID)


def _resnet(dst: Dict, tp: str, fp: Tuple[str, ...], time_emb: bool = True,
            has_shortcut: bool = False):
    _norm(dst, f"{tp}.norm1", fp + ("norm1",))
    _conv(dst, f"{tp}.conv1", fp + ("conv1",))
    if time_emb:
        _dense(dst, f"{tp}.time_emb_proj", fp + ("time_emb_proj",))
    _norm(dst, f"{tp}.norm2", fp + ("norm2",))
    _conv(dst, f"{tp}.conv2", fp + ("conv2",))
    if has_shortcut:
        _conv(dst, f"{tp}.conv_shortcut", fp + ("conv_shortcut",))


def _transformer(dst: Dict, tp: str, fp: Tuple[str, ...], linear: bool = False,
                 depth: int = 1):
    _norm(dst, f"{tp}.norm", fp + ("norm",))
    if linear:  # SD2.x use_linear_projection: (inner, in) nn.Linear weights
        _dense(dst, f"{tp}.proj_in", fp + ("proj_in",))
        _dense(dst, f"{tp}.proj_out", fp + ("proj_out",))
    else:
        _conv(dst, f"{tp}.proj_in", fp + ("proj_in",))
        _conv(dst, f"{tp}.proj_out", fp + ("proj_out",))
    for d in range(depth):
        b = f"{tp}.transformer_blocks.{d}"
        fb = fp + (f"blocks_{d}",)
        _norm(dst, f"{b}.norm1", fb + ("norm1",))
        _norm(dst, f"{b}.norm2", fb + ("norm2",))
        _norm(dst, f"{b}.norm3", fb + ("norm3",))
        for attn in ("attn1", "attn2"):
            _dense(dst, f"{b}.{attn}.to_q", fb + (attn, "to_q"), bias=False)
            _dense(dst, f"{b}.{attn}.to_k", fb + (attn, "to_k"), bias=False)
            _dense(dst, f"{b}.{attn}.to_v", fb + (attn, "to_v"), bias=False)
            _dense(dst, f"{b}.{attn}.to_out.0", fb + (attn, "to_out"))
        _dense(dst, f"{b}.ff.net.0.proj", fb + ("ff", "geglu_proj"))
        _dense(dst, f"{b}.ff.net.2", fb + ("ff", "proj_out"))


def unet_key_map(cfg: UNetConfig) -> Dict[str, Tuple[Tuple[str, ...], Transform]]:
    m: Dict[str, Tuple[Tuple[str, ...], Transform]] = {}
    _conv(m, "conv_in", ("conv_in",))
    _dense(m, "time_embedding.linear_1", ("time_embedding", "linear_1"))
    _dense(m, "time_embedding.linear_2", ("time_embedding", "linear_2"))
    ch_prev = cfg.block_out_channels[0]
    for i, ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            in_ch = ch_prev if j == 0 else ch
            _resnet(m, f"down_blocks.{i}.resnets.{j}", (f"down_{i}_resnet_{j}",),
                    has_shortcut=in_ch != ch)
            if cfg.attn_down[i]:
                _transformer(m, f"down_blocks.{i}.attentions.{j}",
                             (f"down_{i}_attn_{j}",),
                             linear=cfg.use_linear_projection,
                             depth=cfg.depth_for(i))
        if i < cfg.num_stages - 1:
            _conv(m, f"down_blocks.{i}.downsamplers.0.conv",
                  (f"down_{i}_downsample", "conv"))
        ch_prev = ch
    last = cfg.block_out_channels[-1]
    _resnet(m, "mid_block.resnets.0", ("mid_resnet_0",))
    _resnet(m, "mid_block.resnets.1", ("mid_resnet_1",))
    _transformer(m, "mid_block.attentions.0", ("mid_attn",),
                 linear=cfg.use_linear_projection,
                 depth=cfg.depth_for(cfg.num_stages - 1))
    # up path: every resnet concatenates a skip -> always has a shortcut
    for up_i, stage in enumerate(reversed(range(cfg.num_stages))):
        for j in range(cfg.layers_per_block + 1):
            _resnet(m, f"up_blocks.{up_i}.resnets.{j}", (f"up_{up_i}_resnet_{j}",),
                    has_shortcut=True)
            if cfg.attn_down[stage]:
                _transformer(m, f"up_blocks.{up_i}.attentions.{j}",
                             (f"up_{up_i}_attn_{j}",),
                             linear=cfg.use_linear_projection,
                             depth=cfg.depth_for(stage))
        if stage > 0:
            _conv(m, f"up_blocks.{up_i}.upsamplers.0.conv",
                  (f"up_{up_i}_upsample", "conv"))
    if cfg.addition_embed:
        # SDXL text_time added conditioning MLP
        _dense(m, "add_embedding.linear_1", ("add_embedding", "linear_1"))
        _dense(m, "add_embedding.linear_2", ("add_embedding", "linear_2"))
    _norm(m, "conv_norm_out", ("conv_norm_out",))
    _conv(m, "conv_out", ("conv_out",))
    return m


def _vae_attn(dst: Dict, tp: str, fp: Tuple[str, ...]):
    _norm(dst, f"{tp}.group_norm", fp + ("group_norm",))
    for a, b in (("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"),
                 ("to_out.0", "to_out")):
        _dense(dst, f"{tp}.{a}", fp + (b,))


def vae_key_map(cfg: VAEConfig) -> Dict[str, Tuple[Tuple[str, ...], Transform]]:
    m: Dict[str, Tuple[Tuple[str, ...], Transform]] = {}
    # encoder
    _conv(m, "encoder.conv_in", ("encoder", "conv_in"))
    ch_prev = cfg.block_out_channels[0]
    for i, ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            in_ch = ch_prev if j == 0 else ch
            _resnet(m, f"encoder.down_blocks.{i}.resnets.{j}",
                    ("encoder", f"down_{i}_resnet_{j}"), time_emb=False,
                    has_shortcut=in_ch != ch)
        if i < len(cfg.block_out_channels) - 1:
            _conv(m, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  ("encoder", f"down_{i}_downsample", "conv"))
        ch_prev = ch
    _resnet(m, "encoder.mid_block.resnets.0", ("encoder", "mid_resnet_0"),
            time_emb=False)
    _resnet(m, "encoder.mid_block.resnets.1", ("encoder", "mid_resnet_1"),
            time_emb=False)
    _vae_attn(m, "encoder.mid_block.attentions.0", ("encoder", "mid_attn"))
    _norm(m, "encoder.conv_norm_out", ("encoder", "conv_norm_out"))
    _conv(m, "encoder.conv_out", ("encoder", "conv_out"))
    _conv(m, "quant_conv", ("quant_conv",))
    _conv(m, "post_quant_conv", ("post_quant_conv",))
    # decoder
    _conv(m, "decoder.conv_in", ("decoder", "conv_in"))
    _resnet(m, "decoder.mid_block.resnets.0", ("decoder", "mid_resnet_0"),
            time_emb=False)
    _resnet(m, "decoder.mid_block.resnets.1", ("decoder", "mid_resnet_1"),
            time_emb=False)
    _vae_attn(m, "decoder.mid_block.attentions.0", ("decoder", "mid_attn"))
    ch_prev = cfg.block_out_channels[-1]
    for up_i, stage in enumerate(reversed(range(len(cfg.block_out_channels)))):
        ch = cfg.block_out_channels[stage]
        for j in range(cfg.layers_per_block + 1):
            in_ch = ch_prev if j == 0 else ch
            _resnet(m, f"decoder.up_blocks.{up_i}.resnets.{j}",
                    ("decoder", f"up_{up_i}_resnet_{j}"), time_emb=False,
                    has_shortcut=in_ch != ch)
        if stage > 0:
            _conv(m, f"decoder.up_blocks.{up_i}.upsamplers.0.conv",
                  ("decoder", f"up_{up_i}_upsample", "conv"))
        ch_prev = ch
    _norm(m, "decoder.conv_norm_out", ("decoder", "conv_norm_out"))
    _conv(m, "decoder.conv_out", ("decoder", "conv_out"))
    return m


def clip_text_key_map(cfg: CLIPTextConfig) -> Dict[str, Tuple[Tuple[str, ...], Transform]]:
    m: Dict[str, Tuple[Tuple[str, ...], Transform]] = {}
    p = "text_model"
    m[f"{p}.embeddings.token_embedding.weight"] = (("token_embedding", "embedding"), ID)
    m[f"{p}.embeddings.position_embedding.weight"] = (("position_embedding",), ID)
    for i in range(cfg.num_layers):
        lp = f"{p}.encoder.layers.{i}"
        fp = (f"layers_{i}",)
        _norm(m, f"{lp}.layer_norm1", fp + ("layer_norm1",))
        _norm(m, f"{lp}.layer_norm2", fp + ("layer_norm2",))
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _dense(m, f"{lp}.self_attn.{proj}", fp + ("self_attn", proj))
        _dense(m, f"{lp}.mlp.fc1", fp + ("fc1",))
        _dense(m, f"{lp}.mlp.fc2", fp + ("fc2",))
    _norm(m, f"{p}.final_layer_norm", ("final_layer_norm",))
    if cfg.projection_dim is not None:
        # CLIPTextModelWithProjection (SDXL text_encoder_2): bias-free
        # projection stored at the top level, outside text_model
        m["text_projection.weight"] = (("text_projection",), DENSE)
    return m


# pre-0.18 diffusers serialized the VAE mid attention as AttentionBlock
# (query/key/value/proj_attn, with 4D (C,C,1,1) conv-style proj weights in
# some exports); the original 2022 sd15 VAE safetensors on HF uses these.
_LEGACY_VAE_ATTN = {"query": "to_q", "key": "to_k", "value": "to_v",
                    "proj_attn": "to_out.0", "group_norm": "group_norm"}


def normalize_legacy_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename legacy diffusers VAE attention keys to the modern layout and
    squeeze conv-style (C, C, 1, 1) projection weights to (C, C)."""
    out = {}
    for k, v in state.items():
        parts = k.split(".")
        if (len(parts) >= 4 and parts[-4] == "attentions"
                and parts[-2] in _LEGACY_VAE_ATTN):
            parts[-2] = _LEGACY_VAE_ATTN[parts[-2]]
            k = ".".join(parts)
            if k.endswith(".weight") and v.ndim == 4:
                v = v.reshape(v.shape[0], v.shape[1])
        out[k] = v
    return out


def map_state_dict(state: Dict[str, np.ndarray],
                   key_map: Dict[str, Tuple[Tuple[str, ...], Transform]],
                   dtype=np.float32, strict: bool = True) -> Dict[str, Any]:
    """Apply a key map to a torch state dict, producing a nested flax tree."""
    state = normalize_legacy_keys(state)
    tree: Dict[str, Any] = {}
    missing = []
    for tk, (path, (fwd, _inv)) in key_map.items():
        if tk not in state:
            missing.append(tk)
            continue
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = fwd(np.asarray(state[tk])).astype(dtype)
    if strict and missing:
        raise KeyError(f"missing {len(missing)} keys, e.g. {missing[:5]}")
    return tree


def load_pretrained_params(weights_dir: str, preset, dtype=np.float32
                           ) -> Dict[str, Any]:
    """Load a diffusers-layout directory:
    {unet,vae,text_encoder}/*.safetensors."""
    import glob
    import os

    import jax.numpy as jnp

    np_dtype = np.dtype(jnp.dtype(dtype).name) if not isinstance(dtype, np.dtype) \
        else dtype

    def load_dir(sub):
        files = sorted(glob.glob(os.path.join(weights_dir, sub, "*.safetensors")))
        if not files:
            raise FileNotFoundError(f"no safetensors under {weights_dir}/{sub}")
        state = {}
        for f in files:
            state.update(read_safetensors(f))
        return state

    unet = map_state_dict(load_dir("unet"), unet_key_map(preset.unet), np_dtype)
    vae = map_state_dict(load_dir("vae"), vae_key_map(preset.vae), np_dtype)
    text = map_state_dict(load_dir("text_encoder"), clip_text_key_map(preset.text),
                          np_dtype)
    out = {"unet": unet, "vae": vae, "text": text}
    if getattr(preset, "text2", None) is not None:
        out["text2"] = map_state_dict(load_dir("text_encoder_2"),
                                      clip_text_key_map(preset.text2), np_dtype)
    return out
