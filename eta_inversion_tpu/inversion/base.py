"""DiffusionInversion: the scan-compiled inversion/denoise engine.

TPU-native counterpart of /root/reference/modules/inversion/
diffusion_inversion.py (class DiffusionInversion, the `diffinv` method).  The
reference's Python `for t in timesteps` loops (:411, :432) become `lax.scan`
bodies with fused classifier-free guidance; controllers are functional
(editing/controller.py) instead of mutable objects; randomness is explicit
PRNG-key threading.  Subclasses override the same primitive methods as in the
reference (`predict_noise`, `step_forward/backward`, `predict_step_*`,
`diffusion_forward/backward`) — but each override is a pure function traced
into the scan.

Compiled functions are cached globally keyed by (engine config, shapes,
controller static structure), so repeated edits in an eval sweep never retrace.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..editing.controller import BatchLayout, Controller, ControllerEmpty
from ..models import DiffusionModel
from ..schedulers import (
    DiffusionSchedule,
    ddim_backward_step,
    ddim_inverse_step,
)
from ..schedulers.dpm import (
    dpm_init_state,
    dpm_step,
    dpm_timesteps_backward,
    dpm_timesteps_forward,
)

_COMPILE_CACHE: Dict[Any, Any] = {}


class DiffusionInversion:
    """Naive DDIM inversion (registry key "diffinv") and the base engine."""

    name = "diffinv"

    def __init__(self, model: DiffusionModel, scheduler: Optional[str] = None,
                 num_inference_steps: Optional[int] = None,
                 guidance_scale_bwd: Optional[float] = None,
                 guidance_scale_fwd: Optional[float] = None,
                 inv_steps: str = "sameshift", verbose: bool = False, seed: int = 0,
                 solver_order: int = 2):
        # defaults mirror the reference (diffusion_inversion.py:32-35)
        self.model = model
        self.scheduler_name = scheduler or "ddim"
        assert solver_order in (1, 2, 3), solver_order
        self.solver_order = solver_order  # dpm only
        self.num_inference_steps = num_inference_steps or 50
        self.guidance_scale_bwd = 7.5 if guidance_scale_bwd is None else guidance_scale_bwd
        self.guidance_scale_fwd = 1.0 if guidance_scale_fwd is None else guidance_scale_fwd
        self.inv_steps = inv_steps
        self.verbose = verbose
        self.seed = seed
        self.schedule = DiffusionSchedule(model.schedule_config, self.num_inference_steps)
        # "ddpm" backward = DDIM with eta=1 (reference diffusion_inversion.py:141,158-163)
        self.eta_bwd = 1.0 if self.scheduler_name == "ddpm" else 0.0
        if self.scheduler_name not in ("ddim", "ddpm", "dpm"):
            raise ValueError(f"unknown scheduler {self.scheduler_name}")
        if self.scheduler_name == "dpm" and self.inv_steps == "sameshift":
            # the reference's DPM inverse defaults to "samesame"
            # (scheduling_dpmsolver_multistep_inverse.py:16-24)
            self.inv_steps = "samesame"

    # ------------------------------------------------------------------ config

    def config_key(self) -> Tuple:
        """Hashable engine configuration for the global compile cache."""
        return (type(self).__name__, self.model.name, str(self.model.dtype),
                self.scheduler_name, self.num_inference_steps,
                self.guidance_scale_bwd, self.guidance_scale_fwd, self.inv_steps,
                self.solver_order)

    @staticmethod
    def get_available_schedulers() -> List[str]:
        return ["ddim", "ddpm", "dpm"]

    # ---------------------------------------------------------------- codecs

    # NOTE: the jitted wrappers below must consume the `params` ARGUMENT —
    # closing over self.model.params would bake every weight into the HLO as a
    # constant (hundreds of MB; the axon compile relay rejects such requests
    # with HTTP 413, and it defeats executable caching).

    def encode(self, image) -> jnp.ndarray:
        image = jnp.asarray(image)
        if image.ndim == 3:  # accept unbatched HWC
            image = image[None]
        if image.ndim != 4 or image.shape[-1] != 3:
            raise ValueError(
                f"expected NHWC image with 3 channels, got shape {image.shape}")
        model = self.model

        def fn(params, x):
            from ..models.vae import AutoencoderKL

            z = model.vae.apply({"params": params["vae"]}, x,
                                method=AutoencoderKL.encode)
            # diffusion state stays fp32 regardless of compute dtype; the UNet
            # casts at its input, scheduler math is fp32
            return (z * model.scaling_factor).astype(jnp.float32)

        return self._cached("encode", (), fn)(self.model.params,
                                              self._shard_batch(image))

    def decode(self, latent) -> jnp.ndarray:
        model = self.model

        def fn(params, z):
            from ..models.vae import AutoencoderKL

            return model.vae.apply({"params": params["vae"]},
                                   z / model.scaling_factor,
                                   method=AutoencoderKL.decode)

        return self._cached("decode", (), fn)(self.model.params,
                                              self._shard_batch(latent))

    def create_context(self, prompt: str, negative_prompt: Optional[str] = "") -> jnp.ndarray:
        """[uncond; cond] embeddings, shape (2, 77, D) — reference
        diffusion_inversion.py:210-247.  (Dual-tower presets return the packed
        (2, 78, D) SDXL context; see DiffusionModel.text_context_fn.)"""
        jfn = self._cached("text", (), self.model.text_context_fn())
        ids_c = jnp.asarray(self.model.tokenizer([prompt]))
        cond = jfn(self.model.params, ids_c)
        if negative_prompt is None:
            return cond
        ids_u = jnp.asarray(self.model.tokenizer([negative_prompt]))
        uncond = jfn(self.model.params, ids_u)
        return jnp.concatenate([uncond, cond], axis=0)

    def embed_texts(self, prompts: List[str]) -> jnp.ndarray:
        """Batch-embed N prompts -> (N, 77, D) in one text-encoder call."""
        ids = jnp.asarray(self.model.tokenizer(list(prompts)))
        return self._cached("text", (), self.model.text_context_fn())(
            self.model.params, ids)

    def cat_context(self, contexts: List[jnp.ndarray]) -> jnp.ndarray:
        """[[u1,c1],[u2,c2]] -> [u1,u2,c1,c2] (reference :462-479)."""
        n = len(contexts)
        b = contexts[0].shape[0]
        assert b == 2, "cfg context should have batch dimension 2"
        x = jnp.stack(contexts, axis=1)
        return x.reshape(b * n, *x.shape[2:])

    def cat_latent(self, latents: List[jnp.ndarray]) -> jnp.ndarray:
        return jnp.concatenate(latents, axis=0)

    # True for inverters whose backward step anchors the first B latent rows
    # to the recorded forward trajectory (direct-inversion-style source-row
    # snapping).  Such inverters REQUIRE the pair layout [src rows; tgt rows]:
    # denoising a single-prompt batch would make every row a "source" row,
    # reduce the output to the replayed forward trajectory, and let XLA
    # dead-code-eliminate the entire UNet from the backward program (observed
    # on-chip: a 50-step backward scan in 83 ms).  Editors reject
    # no_source_backward for these.
    requires_source_rows: bool = False

    def flat_latent(self, z0: jnp.ndarray) -> jnp.ndarray:
        """Flat (rows, h, w, c) view of a diffusion_backward result.  Coupled-
        pair inverters (edict) override to select the output chain, so
        sample()/editors always see plain row-batched latents."""
        return z0

    # ------------------------------------------------------------- primitives

    def combine_guidance(self, eps_u, eps_c, guidance_scale, latent, t, inp=None,
                         is_fwd=False):
        """CFG combination; override point for proximal guidance etc."""
        return eps_u + guidance_scale * (eps_c - eps_u)

    def to_eps(self, out, x, t):
        """Convert a raw UNet output to EPSILON space under the schedule's
        prediction_type, so every inverter/editor keeps operating on noise
        predictions regardless of the model family's parameterization.

        v_prediction (SD2.x 768-v checkpoints): eps = sqrt(a_t)*v +
        sqrt(1-a_t)*x_t — the `pred_epsilon` diffusers' DDIMScheduler.step
        derives for prediction_type="v_prediction"; conversion commutes with
        CFG (affine with coefficients summing to 1), so doing it at the UNet
        boundary is exactly equivalent to diffusers' post-CFG handling."""
        if self.schedule.config.prediction_type != "v_prediction":
            return out
        a = self.schedule.alpha_at(t).astype(jnp.float32)
        a = a.reshape(a.shape + (1,) * (out.ndim - a.ndim))
        return (jnp.sqrt(a) * out.astype(jnp.float32)
                + jnp.sqrt(1.0 - a) * x.astype(jnp.float32)).astype(out.dtype)

    def predict_noise(self, params, latent, t, context, guidance_scale,
                      hooks=None, collect_store=False, is_fwd=False, inp=None,
                      force_full_cfg=False):
        """UNet noise prediction with classifier-free guidance
        (reference :249-286). Returns (eps, store_dict)."""
        store: Dict[str, Any] = {}

        def unet(lat, ctx, shared_prefix=False):
            in_rows = getattr(hooks, "unet_in_rows", None) if hooks is not None else None
            out_rows = getattr(hooks, "unet_out_rows", None) if hooks is not None else None
            if in_rows is not None:
                lat = lat[jnp.asarray(in_rows)]
                ctx = ctx[jnp.asarray(in_rows)]
            if collect_store:
                eps, vars_ = self.model.unet.apply(
                    {"params": params["unet"]}, lat, t, ctx, hooks,
                    cfg_shared_prefix=shared_prefix, mutable=["attn_store"])
            else:
                eps = self.model.unet.apply({"params": params["unet"]}, lat, t,
                                            ctx, hooks,
                                            cfg_shared_prefix=shared_prefix)
                vars_ = None
            if out_rows is not None:
                eps = eps[jnp.asarray(out_rows)]
            return eps, vars_

        scalar_gs = (isinstance(guidance_scale, (int, float)) or guidance_scale is None) \
            and not force_full_cfg
        if guidance_scale is None:
            eps, vars_ = unet(latent, context)
            eps = self.to_eps(eps, latent, t)
        elif scalar_gs and guidance_scale == 0:
            n = context.shape[0] // 2
            eps, vars_ = unet(latent, context[:n])
            eps = self.to_eps(eps, latent, t)
        elif scalar_gs and guidance_scale == 1:
            n = context.shape[0] // 2
            eps, vars_ = unet(latent, context[n:])
            eps = self.to_eps(eps, latent, t)
        else:
            if latent.shape[0] * 2 == context.shape[0]:
                if self._cfg_prefix_ok(hooks):
                    # CFG shared prefix: both guidance rows carry the same
                    # latent, so the UNet runs the pre-cross-attention prefix
                    # once (exact dedup, see models/unet.py)
                    eps_all, vars_ = unet(latent, context, shared_prefix=True)
                else:
                    eps_all, vars_ = unet(
                        jnp.concatenate([latent, latent], axis=0), context)
            else:
                assert latent.shape[0] == context.shape[0]
                eps_all, vars_ = unet(latent, context)
            n = eps_all.shape[0] // 2
            # v-pred conversion happens BEFORE combine_guidance so overrides
            # (proximal shrinkage etc.) always see epsilon-space deltas; each
            # guidance half converts against ITS latent rows
            x_u, x_c = (latent[:n], latent[n:]) \
                if latent.shape[0] == 2 * n else (latent, latent)
            eps_u = self.to_eps(eps_all[:n], x_u, t)
            eps_c = self.to_eps(eps_all[n:], x_c, t)
            eps = self.combine_guidance(eps_u, eps_c, guidance_scale, latent, t, inp,
                                        is_fwd=is_fwd)
        if vars_ is not None:
            from ..ops.attn_ctrl import flatten_store

            store = flatten_store(vars_.get("attn_store", {}))
        return eps, store

    def _cfg_prefix_ok(self, hooks) -> bool:
        """Shared-prefix CFG is exact whenever no hook touches the UNet prefix
        up to the first self-attention layer (AttnHooks.cfg_prefix_safe) and
        no batch-restructuring plan is active."""
        if self.model.preset.unet.addition_embed:
            # added-cond (SDXL): the pooled text embedding differentiates the
            # uncond/cond rows from the very first resnet — no shared prefix
            return False
        if hooks is None:
            return True
        if getattr(hooks, "unet_in_rows", None) is not None:
            return False
        metas = [m for pair in self.model.attn_metas.values() for m in pair
                 if not m.is_cross]
        if not metas:
            return False
        first_self = min(metas, key=lambda m: m.idx)
        return hooks.cfg_prefix_safe(first_self)

    def step_forward(self, eps, t, latent, inp=None, rng=None):
        return ddim_inverse_step(self.schedule, latent, eps, t, self.inv_steps)

    def step_backward(self, eps, t, latent, inp=None, rng=None):
        if self.eta_bwd:
            noise = jax.random.normal(rng, latent.shape, latent.dtype)
            return ddim_backward_step(self.schedule, latent, eps, t,
                                      eta=self.eta_bwd, noise=noise)
        return ddim_backward_step(self.schedule, latent, eps, t)

    # ------------------------------------------------------------ scan bodies

    def predict_step_forward(self, params, carry, inp, context, ctrl: Controller,
                             layout: BatchLayout, guidance_scale=None):
        latent, state, rng = carry["latent"], carry["state"], carry["rng"]
        i, t = inp["i"], inp["t"]
        rng, krng = jax.random.split(rng)
        latent = ctrl.begin_step(i, t, latent, state)
        ctx = inp.get("context", context)
        gs = self.guidance_scale_fwd if guidance_scale is None else guidance_scale
        eps, store = self.predict_noise(params, latent, t, ctx, gs,
                                        hooks=ctrl.hooks(i, state, layout),
                                        collect_store=ctrl.collect_store(),
                                        is_fwd=True, inp=inp)
        new_latent, sched_upd = self._apply_scheduler_step(True, carry, eps, t,
                                                           latent, inp, krng)
        new_latent, state = ctrl.end_step(i, t, new_latent, eps, store, state)
        carry = {**carry, **sched_upd, "latent": new_latent, "state": state,
                 "rng": rng}
        return carry, {"latent": new_latent, "eps": eps}

    def predict_step_backward(self, params, carry, inp, context, ctrl: Controller,
                              layout: BatchLayout):
        latent, state, rng = carry["latent"], carry["state"], carry["rng"]
        i, t = inp["i"], inp["t"]
        rng, krng = jax.random.split(rng)
        latent = ctrl.begin_step(i, t, latent, state)
        ctx = inp.get("context", context)
        if "uncond_emb" in inp:
            # per-step null-embedding patching (NPI/NTI; reference
            # negative_prompt_inversion.py:17-23, null_text_inversion.py:96-101):
            # every unconditional row is replaced by this step's embedding.
            # Batched pair editing carries 2B uncond rows ([u_src(B), u_tgt(B)])
            # for B per-sample embeddings — tile so each sample's optimized
            # embedding lands on both its src and tgt rows.
            n = ctx.shape[0] // 2
            ue = inp["uncond_emb"]
            if ue.ndim == 3 and n % ue.shape[0] == 0 and ue.shape[0] not in (1, n):
                ue = jnp.tile(ue, (n // ue.shape[0], 1, 1))
            ctx = jnp.concatenate(
                [jnp.broadcast_to(ue, ctx[:n].shape), ctx[n:]], axis=0)
        eps, store = self.predict_noise(params, latent, t, ctx,
                                        self.guidance_scale_bwd,
                                        hooks=ctrl.hooks(i, state, layout),
                                        collect_store=ctrl.collect_store(), inp=inp)
        new_latent, sched_upd = self._apply_scheduler_step(False, carry, eps, t,
                                                           latent, inp, krng)
        new_latent, state = ctrl.end_step(i, t, new_latent, eps, store, state)
        carry = {**carry, **sched_upd, "latent": new_latent, "state": state,
                 "rng": rng}
        return carry, {"latent": new_latent, "eps": eps}

    # extra per-step scanned arrays / extra carry entries (subclass hooks)
    def forward_scan_extras(self, latent, context) -> Dict[str, jnp.ndarray]:
        return {}

    def backward_scan_extras(self, inv_result: Dict[str, Any], n_prompts: int
                             ) -> Dict[str, jnp.ndarray]:
        return {}

    def backward_carry_extras(self, inv_result: Dict[str, Any]) -> Dict[str, Any]:
        return {}

    def backward_timesteps(self, inv_result: Dict[str, Any]) -> np.ndarray:
        """Denoising timestep grid (subclasses may skip early steps)."""
        if self.scheduler_name == "dpm":
            return dpm_timesteps_backward(self.schedule)
        return self.schedule.timesteps_backward

    def forward_timesteps(self) -> np.ndarray:
        """Inversion timestep grid."""
        if self.scheduler_name == "dpm":
            return dpm_timesteps_forward(self.schedule, self.inv_steps)
        return self.schedule.timesteps_forward(self.inv_steps)

    # ---------------------------------------------------------- dpm plumbing

    def _dpm_scan_extras(self, ts: np.ndarray, is_fwd: bool) -> Dict[str, jnp.ndarray]:
        """Per-step prev-timestep targets + order-ramp flags for dpm."""
        S = len(ts)
        if is_fwd:
            noisiest = self.schedule.config.num_train_timesteps - 1
            prev = np.concatenate([ts[1:], [noisiest]]).astype(np.int32)
        else:
            # denoise: target is the next (smaller) grid point; last -> 0-sigma
            prev = np.concatenate([ts[1:], [0]]).astype(np.int32)
        is_last = np.zeros(S, bool)
        is_last[-1] = True
        is_second_last = np.zeros(S, bool)
        if S >= 2:
            is_second_last[-2] = True
        return {"dpm_prev_t": jnp.asarray(prev),
                "dpm_is_last": jnp.asarray(is_last),
                "dpm_is_second_last": jnp.asarray(is_second_last)}

    def _apply_scheduler_step(self, is_fwd: bool, carry, eps, t, latent, inp, rng):
        """Dispatch ddim-family vs dpm multistep; returns (latent, carry_upd)."""
        if self.scheduler_name == "dpm":
            state = {k: carry[k] for k in ("dpm_m_prev", "dpm_t_prev",
                                           "dpm_m_prev2", "dpm_t_prev2",
                                           "dpm_low")}
            new_latent, new_state = dpm_step(
                self.schedule, state, latent, eps, t, inp["dpm_prev_t"],
                inp["dpm_is_last"], inp["dpm_is_second_last"],
                solver_order=self.solver_order)
            return new_latent, new_state
        if is_fwd:
            return self.step_forward(eps, t, latent, inp, rng), {}
        return self.step_backward(eps, t, latent, inp, rng), {}

    # ------------------------------------------------------------- main loops

    def _layout(self, n_prompts: int, guidance_scale) -> BatchLayout:
        cfg_dup = not (isinstance(guidance_scale, (int, float))
                       and guidance_scale in (0, 1)) and guidance_scale is not None
        return BatchLayout(n_prompts, cfg_dup)

    def _forward_program(self, latent, context, guidance_scale_fwd=None,
                         ctrl: Optional[Controller] = None, rng=None):
        """Build (but do not run) the forward scan program: returns
        ``(jfn, args)`` with ``args = (params, latent, context, extras,
        state0, rng)``.  See `_backward_program` for why this is separated."""
        ctrl = ctrl or ControllerEmpty()
        gs = self.guidance_scale_fwd if guidance_scale_fwd is None else guidance_scale_fwd
        n_prompts = context.shape[0] // 2
        layout = self._layout(n_prompts, gs)
        ts = self.forward_timesteps()
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)

        def fn(params, latent, context, extras, state0, rng):
            inputs = {"i": jnp.arange(len(ts)), "t": jnp.asarray(ts), **extras}
            carry0 = {"latent": latent, "state": state0, "rng": rng}
            if self.scheduler_name == "dpm":
                carry0.update(dpm_init_state(latent.shape, latent.dtype))

            def body(carry, inp):
                return self.predict_step_forward(params, carry, inp, context, ctrl,
                                                 layout, guidance_scale=gs)

            carry, ys = jax.lax.scan(body, carry0, inputs)
            return {"latents": jnp.concatenate([latent[None], ys["latent"]], axis=0),
                    "noise_preds": ys["eps"],
                    "zT_inv": carry["latent"],
                    "state": carry["state"]}

        extras = self.forward_scan_extras(latent, context)
        if self.scheduler_name == "dpm":
            extras = {**extras, **self._dpm_scan_extras(ts, is_fwd=True)}
        state0 = ctrl.init_state(self, latent, context)
        jfn = self._cached("fwd", (gs, latent.shape, context.shape,
                                   ctrl.static_key(), layout), fn)
        return jfn, (self.model.params, latent, context, extras, state0, rng)

    def diffusion_forward(self, latent, context, guidance_scale_fwd=None,
                          ctrl: Optional[Controller] = None, rng=None) -> Dict[str, Any]:
        jfn, (params, latent, context, extras, state0, rng) = \
            self._forward_program(latent, context, guidance_scale_fwd, ctrl, rng)
        latent = self._shard_batch(latent)
        context = self._shard_batch(context)
        out = jfn(params, latent, context, extras, state0, rng)
        out["fwd_state"] = out.pop("state")
        return out

    def _backward_program(self, latent, context, inv_result: Dict[str, Any],
                          ctrl: Optional[Controller] = None, rng=None):
        """Build (but do not run) the backward scan program: returns
        ``(jfn, args)`` with ``args = (params, latent, context, extras,
        carry_extras, state0, rng)``.  Separated from `diffusion_backward` so
        tests can `jfn.lower(*args)` at real model geometry (abstract sharded
        params, no compile) to validate mesh spec propagation before
        multi-chip hardware exists."""
        ctrl = ctrl or ControllerEmpty()
        n_prompts = context.shape[0] // 2
        layout = self._layout(n_prompts, self.guidance_scale_bwd)
        ts = self.backward_timesteps(inv_result)
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed + 1)

        def fn(params, latent, context, extras, carry_extras, state0, rng):
            inputs = {"i": jnp.arange(len(ts)), "t": jnp.asarray(ts), **extras}
            carry0 = {"latent": latent, "state": state0, "rng": rng, **carry_extras}
            if self.scheduler_name == "dpm":
                carry0.update(dpm_init_state(latent.shape, latent.dtype))

            def body(carry, inp):
                carry, _ = self.predict_step_backward(params, carry, inp, context,
                                                      ctrl, layout)
                return carry, None

            carry, _ = jax.lax.scan(body, carry0, inputs)
            return carry["latent"]

        extras = self.backward_scan_extras(inv_result, n_prompts)
        if self.scheduler_name == "dpm":
            extras = {**extras, **self._dpm_scan_extras(ts, is_fwd=False)}
        carry_extras = self.backward_carry_extras(inv_result)
        state0 = ctrl.init_state(self, latent, context)
        jfn = self._cached("bwd", (latent.shape, context.shape,
                                   ctrl.static_key(), layout, len(ts),
                                   tuple(sorted(extras)), tuple(sorted(carry_extras))), fn)
        args = (self.model.params, latent, context, extras, carry_extras,
                state0, rng)
        return jfn, args

    def diffusion_backward(self, latent, context, inv_result: Dict[str, Any],
                           ctrl: Optional[Controller] = None, rng=None):
        jfn, (params, latent, context, extras, carry_extras, state0, rng) = \
            self._backward_program(latent, context, inv_result, ctrl, rng)
        latent = self._shard_batch(latent)
        context = self._shard_batch(context)
        return jfn(params, latent, context, extras, carry_extras, state0, rng)

    # --------------------------------------------------------------- user API

    def invert(self, image, prompt: Optional[str] = None, context=None,
               guidance_scale_fwd: Optional[float] = None, rng=None,
               **kwargs) -> Dict[str, Any]:
        """image (NHWC [-1,1]) -> inversion result dict
        {latents (S+1,B,h,w,c), noise_preds, zT_inv, context, ...}."""
        context = context if context is not None else self.create_context(prompt)
        latent = self.encode(jnp.asarray(image, dtype=jnp.float32))
        fwd = self.diffusion_forward(latent, context, guidance_scale_fwd, rng=rng)
        fwd["context"] = context
        return {**kwargs, **fwd}

    def sample(self, inv_result: Optional[Dict[str, Any]],
               prompt: Optional[Union[str, List[str]]] = None,
               context=None, ctrl: Optional[Controller] = None,
               rng=None) -> Optional[Dict[str, Any]]:
        if inv_result is None:
            return None
        latent = inv_result["latents"][-1]
        if context is None:
            if isinstance(prompt, (list, tuple)):
                context = [self.create_context(p) for p in prompt]
            else:
                context = self.create_context(prompt)
        if isinstance(context, list):
            n = len(context)
            context = self.cat_context(context)
            latent = self.cat_latent([latent] * n)
        z0 = self.diffusion_backward(latent, context, inv_result, ctrl=ctrl, rng=rng)
        if z0 is None:
            return None
        # pair inverters (edict) return (2, rows, ...): flatten to the output
        # chain BEFORE decode, so image/latent rows always align with the
        # context rows (and the discarded chain is never decoded).  The
        # reference reads the first chain as the result (edict_inversion.py
        # denoise loop's x latent).
        z0 = self.flat_latent(z0)
        image = self.decode(z0)
        return {"image": image, "latent": z0}

    def invert_sample(self, image, prompt: str, rng=None) -> Dict[str, Any]:
        context = self.create_context(prompt)
        inv_res = self.invert(image, context=context, rng=rng)
        return self.sample(inv_res, context=context, rng=rng)

    def generate(self, prompt: Optional[str] = None, context=None, rng=None,
                 batch: int = 1) -> Dict[str, Any]:
        """Text-to-image: denoise from pure noise (used e.g. to materialize the
        fake-ti2i benchmark images, reference scripts/
        convert_plug_and_play_imagenetr-fake-ti2i.py)."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)
        rng, knoise = jax.random.split(rng)
        s = self.model.latent_size
        zT = jax.random.normal(knoise, (batch, s, s, self.model.latent_channels),
                               jnp.float32)
        return self.sample({"latents": zT[None]}, prompt=prompt, context=context,
                           rng=rng)

    # ------------------------------------------------------------------- jit

    @staticmethod
    def _shard_batch(x):
        """Explicitly split a batch-leading input over an active "data" mesh
        axis (eval.py --mesh / dryrun_multichip).  Without this GSPMD
        replicates the batch and every data-device computes it redundantly —
        this is what makes the mesh path the working TPU replacement for the
        reference's per-GPU process pool (utils/device_pool.py:10-61).
        No-op (and zero overhead) when no mesh context is active."""
        from ..parallel.sharding import shard_batch

        return shard_batch(x)

    def _cached(self, tag: str, extra_key: Tuple, fn):
        # The attention dispatchers consult trace-time contexts
        # (parallel/ring_attention.sequence_parallel, parallel/sharding mesh)
        # that jax.jit's own cache key cannot see: identical avals trace to
        # DIFFERENT programs inside vs outside the context.  Fold a static
        # fingerprint of the active contexts into the key so a program traced
        # outside `sequence_parallel(mesh)` is never reused inside it (and
        # vice versa) — ADVICE r4 medium.
        from ..parallel.ring_attention import active_sequence_parallel
        from ..parallel.sharding import active_data_mesh

        sp = active_sequence_parallel()
        sp_key = None if sp is None else (
            sp.axis, sp.batch_axis, sp.min_seq, tuple(sorted(sp.mesh.shape.items())))
        mesh = active_data_mesh()
        mesh_key = None if mesh is None else tuple(sorted(mesh.shape.items()))
        key = (tag, self.config_key(), extra_key, sp_key, mesh_key)
        cached = _COMPILE_CACHE.get(key)
        if cached is None:
            cached = jax.jit(fn)
            _COMPILE_CACHE[key] = cached
        return cached
