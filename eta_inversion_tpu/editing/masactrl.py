"""MasaCtrl editing (registry key "masactrl"): mutual self-attention control.

Counterpart of /root/reference/modules/utils/masactrl.py +
modules/editing/masactrl_editor.py: from denoising step `start_step` (4) and
self-attention layer `start_layer` (10 of 16), every batch row's keys/values
are replaced by the *source* row's (per CFG half), so target queries attend to
source content.  Because this is a pure k/v substitution before the attention
kernel, it composes with Pallas flash attention — no probability tensors are
ever materialized (the reference recomputes full sim matrices per layer,
masactrl.py:41-54).

Variants (reference masactrl.py:75-334, there unwired; here first-class
`mode=` options on the controller and editor cfg):

  * ``union``   — target queries attend to the *union* [K_s, K_t]/[V_s, V_t]
    (MutualSelfAttentionControlUnion, masactrl.py:75-112).
  * ``mask``    — mask-guided: target queries attend to source k/v twice
    (foreground-only and background-only keys) and the two outputs are blended
    spatially by the target mask (MutualSelfAttentionControlMask,
    masactrl.py:115-200).
  * ``mask_auto`` — same, with masks derived on the fly from the current
    step's aggregated cross-attention maps of `ref/cur_token_idx`
    (MutualSelfAttentionControlMaskAuto, masactrl.py:202-334).

All three are implemented as pure probability rewrites via the identity
``softmax(sim + log m) = (p * m) / sum(p * m)``: a key-masked softmax equals
the plain softmax renormalized over the kept keys, and a spatial output blend
of two such softmaxes is linear in p, so the whole variant collapses to one
`probs` hook producing an effective probability matrix.  No -inf biases, no
doubled attention calls, no monkey-patching.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attn_ctrl import AttnHooks, AttnLayerMeta
from .controller import BatchLayout, Controller
from .editor import Editor


def _target_rows(layout: BatchLayout) -> np.ndarray:
    """Static bool (batch,): True on target rows [*, t_1..t_B] of each half."""
    n, B = layout.n_prompts, layout.n_pairs
    rows = np.zeros(layout.batch, bool)
    for h0 in range(0, layout.batch, n):
        rows[h0 + B: h0 + n] = True
    return rows


def _pair_of_row(layout: BatchLayout) -> np.ndarray:
    """Static (batch,) pair index of every row."""
    n, B = layout.n_prompts, layout.n_pairs
    return np.array([(r % n) % B for r in range(layout.batch)])


def _minmax(img: jnp.ndarray) -> jnp.ndarray:
    """Per-sample min-max normalize (B, h, w) (reference masactrl.py:267-270;
    +eps so an all-constant map — possible with random weights — stays finite)."""
    mn = img.min(axis=(1, 2), keepdims=True)
    mx = img.max(axis=(1, 2), keepdims=True)
    return (img - mn) / (mx - mn + 1e-8)


def _resize_nearest(m: jnp.ndarray, res: int) -> jnp.ndarray:
    """(B, h, w) -> (B, res, res), nearest (reference F.interpolate default)."""
    return jax.image.resize(m, (m.shape[0], res, res), method="nearest")


@dataclasses.dataclass
class MasaCtrlHooks(AttnHooks):
    layout: BatchLayout
    gate: Any  # traced bool: step within the active range
    start_layer: int
    mode: str = "substitute"  # substitute | union | mask | mask_auto
    mask_s: Optional[jnp.ndarray] = None  # (B, h, w) binary fg mask (mask mode)
    mask_t: Optional[jnp.ndarray] = None
    thres: float = 0.1
    ref_token_idx: Tuple[int, ...] = (1,)
    cur_token_idx: Tuple[int, ...] = (1,)
    auto_map_res: int = 16
    # trace-time accumulator: cross-attention maps of the current UNet call so
    # far, in layer order (the reference appends per patched forward and clears
    # in after_step, masactrl.py:227-229,280-282)
    cross_maps: List[jnp.ndarray] = dataclasses.field(default_factory=list)

    def _active(self, meta: AttnLayerMeta) -> bool:
        return (not meta.is_cross and meta.self_idx >= self.start_layer
                and self.layout.n_prompts >= 2)

    def passthrough_attn(self, meta: AttnLayerMeta) -> bool:
        # self layers below start_layer are untouched (reference
        # masactrl.py:20-39 layer gating); cross layers are never passthrough
        # (mask_auto taps their probabilities)
        return not meta.is_cross and not self._active(meta)

    def cfg_prefix_safe(self, first_self_meta: AttnLayerMeta) -> bool:
        # every self-layer intervention gates on self_idx >= start_layer and
        # cross hooks sit after the shared-prefix duplication point, so the
        # prefix is hook-free whenever the first self layer is below the
        # start layer (SD default start_layer=10)
        return first_self_meta.self_idx < self.start_layer

    # ------------------------------------------------------------------ qkv
    def qkv(self, meta: AttnLayerMeta, q, k, v):
        if not self._active(meta):
            return q, k, v
        n = self.layout.n_prompts
        B = self.layout.n_pairs

        def pair_src(x):
            # per CFG half [s_1..s_B, t_1..t_B] -> [s, s]: each row mapped to
            # its pair-source's tensor
            halves = []
            for h0 in range(0, x.shape[0], n):
                src = x[h0: h0 + B]
                halves.append(jnp.concatenate([src, src], axis=0))
            return jnp.concatenate(halves, axis=0)

        if self.mode == "union":
            # keys become [pair-source | own]; the probs hook restricts source
            # rows (and inactive steps) to the own half, so shapes stay static
            k2 = jnp.concatenate([pair_src(k), k], axis=2)
            v2 = jnp.concatenate([pair_src(v), v], axis=2)
            return q, k2, v2

        def sub(x):
            # target rows take their pair-source's k/v (reference
            # masactrl.py:64-71; mask variants likewise feed source k/v to
            # target queries, masactrl.py:180-184)
            return jnp.where(self.gate, pair_src(x), x)

        return q, sub(k), sub(v)

    # ----------------------------------------------------------------- probs
    def wants_probs(self, meta: AttnLayerMeta) -> bool:
        if self.mode == "substitute":
            return False
        if meta.is_cross:
            return self.mode == "mask_auto" and meta.res == self.auto_map_res
        return self._active(meta)

    def _auto_masks(self, meta: AttnLayerMeta, dtype):
        """Masks from the running mean of this step's cross maps
        (aggregate_cross_attn_map, reference masactrl.py:260-272)."""
        if not self.cross_maps:
            return None, None
        maps = sum(self.cross_maps) / len(self.cross_maps)  # (rows, S, 77)
        r = self.auto_map_res
        B = self.layout.n_pairs
        cs = self.layout.cond_start

        def word_map(rows, idx):
            img = rows[..., list(idx)].sum(-1).reshape(-1, r, r)
            return _minmax(img)

        ref = word_map(maps[cs: cs + B], self.ref_token_idx)  # source branch
        cur = word_map(maps[cs + B: cs + 2 * B], self.cur_token_idx)
        ms = (_resize_nearest(ref, meta.res) >= self.thres).astype(dtype)
        mt = (_resize_nearest(cur, meta.res) >= self.thres).astype(dtype)
        return ms.reshape(B, -1), mt.reshape(B, -1)

    def probs(self, meta: AttnLayerMeta, p):
        if meta.is_cross:
            if self.mode == "mask_auto" and meta.res == self.auto_map_res:
                # mean over heads, like the reference's per-layer append
                # (masactrl.py:278-281)
                self.cross_maps.append(p.mean(axis=1))
            return p
        if not self._active(meta):
            return p

        tgt = jnp.asarray(_target_rows(self.layout))[:, None, None, None]
        if self.mode == "union":
            S = p.shape[3] // 2
            own = jnp.concatenate([jnp.zeros(S, p.dtype), jnp.ones(S, p.dtype)])
            keep = jnp.where(jnp.logical_and(self.gate, tgt), 1.0, own)
            pe = p * keep
            return pe / jnp.maximum(pe.sum(-1, keepdims=True), 1e-20)

        if self.mode == "mask":
            if self.mask_s is None:
                return p
            B = self.layout.n_pairs
            ms = _resize_nearest(self.mask_s, meta.res).reshape(B, -1)
            # mask-mode blends with the *float* target mask (masactrl.py:194-198)
            mt = _resize_nearest(self.mask_t, meta.res).reshape(B, -1)
        else:  # mask_auto
            ms, mt = self._auto_masks(meta, p.dtype)
            if ms is None:
                return p

        pair = _pair_of_row(self.layout)
        m_fg = ms[pair][:, None, None, :].astype(p.dtype)  # key-side fg keep
        mt_q = mt[pair][:, None, :, None].astype(p.dtype)  # query-side blend
        p_fg = p * m_fg
        p_fg = p_fg / jnp.maximum(p_fg.sum(-1, keepdims=True), 1e-20)
        p_bg = p * (1.0 - m_fg)
        p_bg = p_bg / jnp.maximum(p_bg.sum(-1, keepdims=True), 1e-20)
        p_edit = mt_q * p_fg + (1.0 - mt_q) * p_bg
        return jnp.where(jnp.logical_and(self.gate, tgt), p_edit, p)


class MasaCtrlController(Controller):
    def __init__(self, engine, start_step: int = 4, start_layer: int = 10,
                 total_steps: Optional[int] = None, mode: str = "substitute",
                 mask_s=None, mask_t=None, thres: float = 0.1,
                 ref_token_idx=(1,), cur_token_idx=(1,)):
        assert mode in ("substitute", "union", "mask", "mask_auto"), mode
        self.engine = engine
        self.start_step = start_step
        self.start_layer = start_layer
        self.total_steps = total_steps or engine.num_inference_steps
        self.mode = mode
        def as_mask(m):
            if m is None:
                return None
            m = jnp.asarray(m, jnp.float32)
            return m.reshape((-1,) + tuple(m.shape[-2:]))  # (h,w)|(B,h,w)

        self.mask_s = as_mask(mask_s)
        self.mask_t = as_mask(mask_t)
        self.thres = float(thres)
        self.ref_token_idx = tuple(ref_token_idx)
        self.cur_token_idx = tuple(cur_token_idx)
        # the reference aggregates 16x16 cross maps (masactrl.py:278-280); on
        # small test models fall back to the nearest available cross res
        from .ptp import nearest_cross_res
        self.auto_map_res = nearest_cross_res(engine.model.attn_metas, 16,
                                              ("down", "mid", "up"))

    def static_key(self):
        return ("masactrl", self.start_step, self.start_layer, self.total_steps,
                self.mode, self.thres, self.ref_token_idx, self.cur_token_idx,
                self.mask_s is not None)

    def hooks(self, i, state, layout: BatchLayout) -> AttnHooks:
        gate = jnp.logical_and(i >= self.start_step, i < self.total_steps)
        B = layout.n_pairs

        def rep(m):
            return None if m is None else jnp.broadcast_to(
                m, (B,) + m.shape[-2:])

        return MasaCtrlHooks(layout=layout, gate=gate,
                             start_layer=self.start_layer, mode=self.mode,
                             mask_s=rep(self.mask_s), mask_t=rep(self.mask_t),
                             thres=self.thres, ref_token_idx=self.ref_token_idx,
                             cur_token_idx=self.cur_token_idx,
                             auto_map_res=self.auto_map_res)


class MasactrlEditor(Editor):
    """Counterpart of reference MasactrlEditor (masactrl_editor.py:12-71):
    invert with the source prompt (or ""), denoise [source, target] under
    mutual self-attention control."""

    def __init__(self, inverter, no_null_source_prompt: bool = True, step: int = 4,
                 layer: int = 10):
        self.inverter = inverter
        self.model = inverter.model
        self.no_null_source_prompt = no_null_source_prompt
        self.step = step
        self.layer = layer

    def edit(self, image, source_prompt: str, target_prompt: str,
             cfg: Optional[Dict[str, Any]] = None, inv_cfg: Optional[Dict[str, Any]] = None,
             **kwargs) -> Optional[Dict[str, Any]]:
        cfg = dict(cfg or {})
        allowed = {"mode", "mask_s", "mask_t", "thres", "ref_token_idx",
                   "cur_token_idx"}
        assert set(cfg) <= allowed, f"unknown masactrl cfg keys: {set(cfg) - allowed}"
        inv_cfg = inv_cfg or {}

        src_context = self.inverter.create_context(
            "" if not self.no_null_source_prompt else source_prompt)
        target_context = self.inverter.create_context(target_prompt)

        inv_res = self.inverter.invert(image, context=src_context,
                                       prompt=source_prompt, inv_cfg=inv_cfg)
        ctrl = MasaCtrlController(self.inverter, self.step, self.layer, **cfg)
        edit_res = self.inverter.sample(inv_res, context=[src_context, target_context],
                                        ctrl=ctrl)
        if edit_res is None:
            return None
        return {
            "image_inv": edit_res["image"][0:1],
            "image": edit_res["image"][1:2],
            "latent_inv": edit_res["latent"][0:1],
            "latent": edit_res["latent"][1:2],
        }
