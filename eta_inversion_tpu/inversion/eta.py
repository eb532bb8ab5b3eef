"""Eta inversion (registry key "etainv") — the paper's method, TPU-native.

Counterpart of /root/reference/modules/inversion/eta_inversion.py: a
time-dependent eta schedule over the 1000 train steps (linear or piecewise-
power), per-step sampling of `noise_sample_count` candidate variance noises, a
closed-form solve for the optimal variance noise (where the DDIM step would
land exactly on the recorded forward latent), selection of the sampled noise
closest to optimal, a spatial eta mask derived from forward-pass cross-
attention maps, and direct-inversion-style source-row replacement with optional
masked delta propagation to the target branch.

TPU-native redesign:
  * the candidate argmin loop (reference :330-375) is one vectorized
    argmin over a (count, ...) noise batch inside the scan body;
  * per-pixel eta is a first-class array in the scheduler step — no EtaTensor
    operator hack (reference :23-33);
  * forward attention masks accumulate functionally in the scan carry
    (AttnStoreController with per-step normalized token maps) instead of
    Python dict side effects (reference :36-49, 388-396);
  * the reference's import-time `os.system("rm -rf result/pie_eta_new/*")`
    (:19-20) is deliberately NOT reproduced.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..editing.ptp import (
    AttnStoreController,
    aggregate_store,
    aggregate_store_batched,
    attention_map_for_token,
    store_keys_for,
)
from ..schedulers import ddim_backward_step
from .base import DiffusionInversion


def _create_eta_func_pow(p1, p2, p=1):
    """Piecewise-power eta ramp between control points (reference :52-58)."""
    (x1, y1), (x2, y2) = p1, p2
    a = (y2 - y1) / (x2 - x1) ** p

    def f(t):
        return a * (np.clip(t, x1, x2) - x1) ** p + y1

    return f


def build_eta_table(eta, num_train_steps: int = 1000) -> np.ndarray:
    """eta spec -> (1000,) table over train timesteps (reference :121-137)."""
    if not isinstance(eta, (tuple, list)):
        eta = (eta, eta)
    ts = np.linspace(0, 1, num_train_steps)
    if len(eta) == 3:
        etas = _create_eta_func_pow(*eta)(ts)
    elif isinstance(eta[0], (tuple, list)):
        etas = _create_eta_func_pow(*eta)(ts)
    else:
        etas = np.linspace(eta[0], eta[1], num_train_steps)
    return np.clip(etas, 0, None).astype(np.float32)


class EtaInversion(DiffusionInversion):
    name = "etainv"
    requires_source_rows = True  # bwd snaps rows [:B] to the fwd trajectory

    def __init__(self, model, scheduler=None, num_inference_steps=None,
                 guidance_scale_bwd=None, guidance_scale_fwd=None, verbose=False,
                 eta=(0.0, 0.4), noise_sample_count: int = 10, seed: int = 0,
                 eta_start: Optional[float] = None, eta_end: Optional[float] = None,
                 use_mask: bool = True, mask_mode_cfg: Optional[Dict[str, Any]] = None):
        if use_mask:
            dft = dict(attn_from_where=("up", "down"), attn_res=16, mask_dirinv=None,
                       mask_eta="fwd_mean", pow=None, target_dirinv=None, thres=0.2)
            mask_mode_cfg = {**dft, **(mask_mode_cfg or {})}
        else:
            mask_mode_cfg = None
        self.mask_mode_cfg = mask_mode_cfg

        # per-timestep forward guidance table (reference :109-112)
        self.gs_fwd_table = None
        if isinstance(guidance_scale_fwd, (tuple, list)):
            assert len(guidance_scale_fwd) == 2
            self.gs_fwd_table = np.linspace(guidance_scale_fwd[0],
                                            guidance_scale_fwd[1], 1000)
            guidance_scale_fwd = float(self.gs_fwd_table[0])

        super().__init__(model, scheduler, num_inference_steps, guidance_scale_bwd,
                         guidance_scale_fwd, verbose=verbose, seed=seed)

        if eta_start is not None:
            assert eta_end is not None
            eta = (eta_start, eta_end)
        self.eta_spec = eta
        self.etas = build_eta_table(eta)
        self.noise_sample_count = noise_sample_count

    def config_key(self):
        mm = self.mask_mode_cfg
        mm_key = None if mm is None else tuple(sorted((k, str(v)) for k, v in mm.items()))
        return super().config_key() + (
            str(self.eta_spec), self.noise_sample_count, mm_key,
            None if self.gs_fwd_table is None else "gs_table")

    def _attn_res(self) -> int:
        """Configured attention-mask resolution, clamped to a resolution that
        actually has cross-attention layers (small test models lack 16x16)."""
        want = self.mask_mode_cfg["attn_res"]
        places = tuple(self.mask_mode_cfg["attn_from_where"])
        avail = sorted({m.res for pair in self.model.attn_metas.values()
                        for m in pair if m.is_cross and m.place in places})
        if want in avail:
            return want
        return min(avail, key=lambda r: abs(r - want))

    # --------------------------------------------------------------- forward

    def predict_noise(self, params, latent, t, context, guidance_scale,
                      hooks=None, collect_store=False, is_fwd=False, inp=None,
                      force_full_cfg=False):
        # per-timestep guidance via table lookup (reference :319-328)
        if is_fwd and self.gs_fwd_table is not None:
            guidance_scale = jnp.asarray(self.gs_fwd_table, jnp.float32)[
                jnp.clip(t, 0, 999)]
        # The reference always runs the full 2-branch CFG batch even for
        # scalar guidance 0/1 (:319-328) — pure waste at the default fwd
        # scale of 1 (u + 1*(c-u) == c up to one rounding). Keep the
        # single-branch fast path for exact 0/1 scalars; force the full batch
        # otherwise (incl. per-t tables).
        scalar01 = isinstance(guidance_scale, (int, float)) and guidance_scale in (0, 1)
        return super().predict_noise(params, latent, t, context, guidance_scale,
                                     hooks, collect_store, is_fwd, inp,
                                     force_full_cfg=not scalar01)

    def invert(self, image, prompt=None, context=None, guidance_scale_fwd=None,
               rng=None, inv_cfg=None, **kwargs) -> Optional[Dict[str, Any]]:
        inv_cfg = inv_cfg or {}
        context = context if context is not None else self.create_context(prompt)
        latent = self.encode(jnp.asarray(image, dtype=jnp.float32))

        if self.mask_mode_cfg is None:
            fwd = self.diffusion_forward(latent, context, guidance_scale_fwd, rng=rng)
        else:
            widx = inv_cfg.get("edit_word_idx")
            if widx is None or self._widx_invalid(widx):
                return None
            n_src = latent.shape[0]  # B source images batched through one scan
            ctrl = AttnStoreController(
                self, store_res=(self._attn_res(),),
                store_places=tuple(self.mask_mode_cfg["attn_from_where"]),
                n_prompts=n_src, per_step_maps=True,
                resize=self.model.latent_size)
            fwd = self.diffusion_forward(latent, context, guidance_scale_fwd,
                                         ctrl=ctrl, rng=rng)
            st = fwd.pop("fwd_state")
            # mean over steps of per-step normalized token maps, per sample
            # (reference :392-396)
            fwd["fwd_token_maps"] = st["norm_map_sum"] / jnp.maximum(st["count"], 1.0)
        fwd["context"] = context
        return {**kwargs, "inv_cfg": inv_cfg, **fwd}

    @staticmethod
    def _widx_invalid(widx) -> bool:
        if isinstance(widx, (list, tuple)) and widx and \
                isinstance(widx[0], (list, tuple)):
            return any(w[0] is None or w[1] is None for w in widx)
        return widx[0] is None or widx[1] is None

    @staticmethod
    def _widx_array(widx) -> np.ndarray:
        """(B, 2) int array of per-sample (source, target) word indices."""
        arr = np.asarray(widx, dtype=np.int64)
        if arr.ndim == 1:
            arr = arr[None]
        return arr

    # -------------------------------------------------------------- backward

    def backward_scan_extras(self, inv_result, n_prompts):
        extras = dict(super().backward_scan_extras(inv_result, n_prompts))
        latents = jnp.asarray(inv_result["latents"])
        extras["source_latent_prev"] = jnp.flip(latents, axis=0)[1:]
        return extras

    def _static_mask(self, inv_result, key) -> Optional[jnp.ndarray]:
        """Step-independent eta/dirinv masks ("gt" / "fwd_mean"), (B,h,w,1)."""
        mm = self.mask_mode_cfg
        mode = mm[key]
        size = self.model.latent_size
        inv_cfg = inv_result.get("inv_cfg") or {}
        if mode is None:
            return None
        if mode == "gt":
            mask = jnp.asarray(inv_cfg["mask"], jnp.float32)
            if mask.ndim == 2:
                mask = mask[None]
            mask = jax.vmap(lambda m: jax.image.resize(m, (size, size),
                                                       method="bilinear"))(mask)
        elif mode == "fwd_mean":
            widx = self._widx_array(inv_cfg["edit_word_idx"])[:, 0]
            maps = inv_result["fwd_token_maps"]  # (B, size, size, 77)
            mask = jax.vmap(
                lambda m, w: attention_map_for_token(m, w + 1, resize=None)
            )(maps, jnp.asarray(widx))
        elif mode.startswith("bwd"):
            return None  # computed per step inside the scan (_bwd_mask)
        else:
            raise NotImplementedError(f"unknown mask mode {mode!r}")
        return self._finish_mask(mask, size)

    def _finish_mask(self, mask, size):
        mm = self.mask_mode_cfg
        if mm["thres"] is not None:
            mask = (mask > mm["thres"]).astype(jnp.float32)
        if mm["pow"] is not None:
            mask = jnp.power(mask, mm["pow"])
        return mask.reshape(-1, size, size, 1)

    def _bwd_mask(self, key, ctrl, state, store, latent, widx_arr):
        """Masks from the *backward* controller's accumulated attention store,
        including the current step's maps (reference mask modes bwd_source /
        bwd_target / bwd_source_target, eta_inversion.py:176-183; requires a
        store-carrying controller such as ptp).  Pair-batched: widx_arr is
        (B, 2) traced; latent rows are [s_1..s_B, t_1..t_B]."""
        mode = self.mask_mode_cfg[key]
        size = self.model.latent_size
        n = latent.shape[0]  # 2B
        B = n // 2
        keys = [k for k in getattr(ctrl, "store_keys", ())
                if f"_{self._attn_res()}_" in k]
        if not keys:
            raise ValueError(
                f"mask mode {mode!r} needs a controller with attention stores "
                f"at res {self._attn_res()} (e.g. ptp)")
        merged = {k: state["store_sum"][k] + store[k][-n:].astype(jnp.float32)
                  for k in keys}
        res = self._attn_res()
        agg = aggregate_store_batched(merged, keys, res, n)  # (2B, res, res, 77)

        def token_masks(rows, widx):
            return jax.vmap(
                lambda m, w: attention_map_for_token(m, w + 1, resize=size)
            )(rows, widx)

        if mode == "bwd_source":
            mask = token_masks(agg[:B], widx_arr[:, 0])
        elif mode == "bwd_target":
            mask = token_masks(agg[B:], widx_arr[:, 1])
        elif mode == "bwd_source_target":
            mask = jnp.maximum(token_masks(agg[:B], widx_arr[:, 0]),
                               token_masks(agg[B:], widx_arr[:, 1]))
        else:
            raise NotImplementedError(mode)
        return self._finish_mask(mask, size)

    def _mask_mode_is_bwd(self, key) -> bool:
        mode = self.mask_mode_cfg[key] if self.mask_mode_cfg else None
        return isinstance(mode, str) and mode.startswith("bwd")

    def backward_carry_extras(self, inv_result):
        extras = dict(super().backward_carry_extras(inv_result))
        if self.mask_mode_cfg is not None:
            me = self._static_mask(inv_result, "mask_eta")
            md = self._static_mask(inv_result, "mask_dirinv")
            if me is not None:
                extras["mask_eta"] = me
            if md is not None:
                extras["mask_dirinv"] = md
            if self._mask_mode_is_bwd("mask_eta") or self._mask_mode_is_bwd("mask_dirinv"):
                widx = (inv_result.get("inv_cfg") or {}).get("edit_word_idx")
                extras["edit_word_idx"] = jnp.asarray(self._widx_array(widx),
                                                     jnp.int32)
        return extras

    def predict_step_backward(self, params, carry, inp, context, ctrl, layout):
        latent, state, rng = carry["latent"], carry["state"], carry["rng"]
        i, t = inp["i"], inp["t"]
        rng, k_noise = jax.random.split(rng)
        latent = ctrl.begin_step(i, t, latent, state)
        eps, store = self.predict_noise(params, latent, t, context,
                                        self.guidance_scale_bwd,
                                        hooks=ctrl.hooks(i, state, layout),
                                        collect_store=ctrl.collect_store(), inp=inp)

        src_prev = inp["source_latent_prev"]  # (B, h, w, c)
        B = src_prev.shape[0]
        eta_t = jnp.asarray(self.etas)[jnp.clip(t, 0, 999)]

        # candidate variance noises + closed-form optimal noise (reference
        # :296-317, :330-375), vectorized argmin — per sample when batched
        noises = jax.random.normal(
            k_noise, (self.noise_sample_count,) + src_prev.shape, latent.dtype)
        rec0 = ddim_backward_step(self.schedule, latent[:B], eps[:B], t, eta=eta_t)
        std = eta_t * jnp.sqrt(self.schedule.variance(t))
        opt = jnp.where(std > 0, (src_prev - rec0) / jnp.maximum(std, 1e-20), 0.0)
        losses = jnp.mean((noises - opt[None]) ** 2,
                          axis=tuple(range(2, noises.ndim)))  # (count, B)
        best = jnp.argmin(losses, axis=0)  # (B,)
        vn = jnp.take_along_axis(
            noises, best.reshape(1, B, *([1] * (noises.ndim - 2))), axis=0)[0]

        # latent rows are [s_1..s_B, t_1..t_B]: each pair shares its noise/mask
        vn_full = jnp.concatenate([vn, vn], axis=0) if latent.shape[0] == 2 * B \
            else vn
        eta_map = eta_t
        mask_eta = carry.get("mask_eta")
        if self._mask_mode_is_bwd("mask_eta"):
            mask_eta = self._bwd_mask("mask_eta", ctrl, state, store, latent,
                                      carry["edit_word_idx"])
        if self.mask_mode_cfg is not None and mask_eta is not None:
            pair_mask = jnp.concatenate([mask_eta, mask_eta], axis=0) \
                if latent.shape[0] == 2 * B else mask_eta
            eta_map = pair_mask * eta_t

        new_latent = ddim_backward_step(self.schedule, latent, eps, t,
                                        eta=eta_map, noise=vn_full)
        # source rows snap to the forward trajectory (reference :245-261)
        delta = src_prev - new_latent[:B]
        rest = new_latent[B:]
        if self.mask_mode_cfg is not None and \
                self.mask_mode_cfg.get("target_dirinv") is not None:
            d = delta
            mask_dirinv = carry.get("mask_dirinv")
            if self._mask_mode_is_bwd("mask_dirinv"):
                mask_dirinv = self._bwd_mask("mask_dirinv", ctrl, state, store,
                                             latent, carry["edit_word_idx"])
            if mask_dirinv is not None:
                d = (1.0 - mask_dirinv) * d
            rest = rest + self.mask_mode_cfg["target_dirinv"] * d
        new_latent = jnp.concatenate([src_prev, rest], axis=0)

        new_latent, state = ctrl.end_step(i, t, new_latent, eps, store, state)
        carry = {**carry, "latent": new_latent, "state": state, "rng": rng}
        return carry, {"latent": new_latent, "eps": eps}
