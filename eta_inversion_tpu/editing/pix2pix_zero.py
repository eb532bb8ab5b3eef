"""pix2pix-zero editing (registry key "pix2pix_zero").

Counterpart of /root/reference/modules/editing/pix2pix_zero.py: caption the
image (BLIP), build an edit direction as the difference of mean prompt
embeddings, invert with the caption, then (a) denoise the source storing every
cross-attention map, and (b) denoise the target, per step taking one SGD step
(lr = cross_attention_guidance_amount) on the latent to minimize the L2
distance between its cross-attention maps and the source's before predicting
noise.  Incompatible with dirinv/etainv (reference :300-301); edict
composition is not yet implemented here (reference supports it via per-pair
attention stores).

TPU-native redesign: the reference runs two full backward passes and caches
every cross-attention map of the source pass on the CPU (tens of GB at SD
scale, :85-100).  Because the source trajectory is independent of the target,
both trajectories here advance in ONE `lax.scan` — each step uses the source
maps of the same step directly from the live computation, so nothing is ever
stored across steps.  The math is identical.

Captioning uses the Flax BLIP captioner (models/blip.py; random init offline —
no BLIP weights in this zero-egress environment).  Pass `caption` in the edit
cfg or supply a `caption_fn` to override; gen_caption=False uses the
reference's fallback "" caption.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attn_ctrl import AttnHooks, AttnLayerMeta
from .editor import Editor


class StoreAllCrossHooks(AttnHooks):
    """Materialize + sow every cross-attention probability tensor."""

    def store(self, meta: AttnLayerMeta) -> bool:
        return meta.is_cross

    def passthrough_attn(self, meta: AttnLayerMeta) -> bool:
        return not meta.is_cross


class Pix2PixZeroEditor(Editor):
    def __init__(self, inverter, cross_attention_guidance_amount: float = 0.1,
                 gen_caption: bool = True,
                 caption_fn: Optional[Callable[[Any], str]] = None):
        self.inverter = inverter
        self.model = inverter.model
        self.cross_attention_guidance_amount = cross_attention_guidance_amount
        self.gen_caption = gen_caption
        self.caption_fn = caption_fn

    # ------------------------------------------------------------------ setup

    def generate_caption(self, image) -> str:
        if self.caption_fn is not None:
            return self.caption_fn(image)
        # Flax BLIP captioner, HF generate() convention: the "a photography
        # of" prompt stays in the caption (reference :243-297).  Offline the
        # captioner is deterministic random init (no BLIP weights exist in
        # this zero-egress environment); tiny diffusion models pair with the
        # tiny captioner so tests stay fast.
        from ..models.blip import captioner_preset_for_model, get_blip_captioner

        return get_blip_captioner(captioner_preset_for_model(self.model.name))(image)

    def construct_direction(self, source_prompts, target_prompts) -> jnp.ndarray:
        """Mean target embedding - mean source embedding (reference :250-271)."""
        if not isinstance(source_prompts, (tuple, list)):
            source_prompts = [source_prompts]
        if not isinstance(target_prompts, (tuple, list)):
            target_prompts = [target_prompts]
        src = jnp.concatenate([self.inverter.create_context(p, None)
                               for p in source_prompts], axis=0)
        tgt = jnp.concatenate([self.inverter.create_context(p, None)
                               for p in target_prompts], axis=0)
        return (tgt.mean(0) - src.mean(0))[None]

    # ------------------------------------------------------------------- edit

    def edit(self, image, source_prompt: str, target_prompt: str,
             cfg: Optional[Dict[str, Any]] = None, inv_cfg: Optional[Dict[str, Any]] = None,
             **kwargs) -> Optional[Dict[str, Any]]:
        from ..inversion.direct import DirectInversion
        from ..inversion.edict import EdictInversion
        from ..inversion.eta import EtaInversion

        if isinstance(self.inverter, (DirectInversion, EtaInversion)):
            return None  # incompatible (reference :300-301)
        is_edict = isinstance(self.inverter, EdictInversion)
        cfg = dict(cfg or {})
        caption = cfg.pop("caption", None)
        assert not cfg

        if caption is None:
            caption = self.generate_caption(image) if self.gen_caption else ""

        src_context = self.inverter.create_context(caption, negative_prompt=caption)
        direction = self.construct_direction(source_prompt, target_prompt)
        target_context = src_context.at[1:2].add(direction)

        inv_res = self.inverter.invert(image, context=src_context,
                                       guidance_scale_fwd=1, inv_cfg=inv_cfg or {})
        if inv_res is None:
            return None

        if is_edict:
            z0 = self._joint_backward_edict(inv_res, src_context, target_context)
        else:
            z0 = self._joint_backward(inv_res, src_context, target_context)
        image_out = self.inverter.decode(z0)
        return {"image": image_out, "latent": z0}

    # ---------------------------------------------------------- joint backward

    def _joint_backward(self, inv_res, src_context, tgt_context):
        inv = self.inverter
        if hasattr(inv, "skip_inv_result") and getattr(inv, "skip_steps", None) is not None:
            inv_res = inv.skip_inv_result(inv_res)
        ts = inv.backward_timesteps(inv_res)
        extras = inv.backward_scan_extras(inv_res, 1)
        carry_extras = inv.backward_carry_extras(inv_res)
        latent0 = inv_res["latents"][-1]
        lr = self.cross_attention_guidance_amount
        hooks = StoreAllCrossHooks()

        def fn(params, src0, tgt0, src_ctx, tgt_ctx, extras, carry_extras, rng):
            def body(carry, inp):
                i, t = inp["i"], inp["t"]
                rng = carry["rng"]
                rng, k1, k2 = jax.random.split(rng, 3)

                # ---- source branch: normal step, sowing cross maps ----------
                src_eps, src_store = inv.predict_noise(
                    params, carry["src"], t, patched_ctx(src_ctx, inp),
                    inv.guidance_scale_bwd, hooks=hooks, collect_store=True, inp=inp)
                new_src = inv.step_backward(src_eps, t, carry["src"], inp, k1)

                # ---- target branch: latent SGD on attention-map L2 ----------
                def loss_fn(lat2):
                    # lat2: explicitly CFG-duplicated (2B rows) so the kept
                    # update carries the unconditional-branch gradient only,
                    # matching the reference (:148-193)
                    _, store = inv.predict_noise(
                        params, lat2, t, patched_ctx(tgt_ctx, inp),
                        inv.guidance_scale_bwd, hooks=hooks, collect_store=True,
                        inp=inp, force_full_cfg=True)
                    # diffusers Pix2PixZeroL2Loss: sum over (seq, key) dims,
                    # mean over batch*heads.  The reference only ever runs
                    # batch 1; with B pair-batched samples the mean's 1/(2Bh)
                    # would shrink each sample's gradient by 1/B, so scale by
                    # B to keep batched == per-sample exactly.
                    loss = 0.0
                    for key, ref in src_store.items():
                        m = store[key].reshape(-1, *store[key].shape[-2:])
                        r = jax.lax.stop_gradient(ref).reshape(m.shape)
                        loss = loss + ((m - r) ** 2).sum((1, 2)).mean(0)
                    return loss * src0.shape[0]

                lat2 = jnp.concatenate([carry["tgt"], carry["tgt"]], axis=0)
                g = jax.grad(loss_fn)(lat2)
                new_tgt_in = carry["tgt"] - lr * g[: carry["tgt"].shape[0]]
                tgt_eps, _ = inv.predict_noise(
                    params, new_tgt_in, t, patched_ctx(tgt_ctx, inp),
                    inv.guidance_scale_bwd, inp=inp)
                new_tgt = inv.step_backward(tgt_eps, t, new_tgt_in, inp, k2)

                return {**carry, "src": new_src, "tgt": new_tgt, "rng": rng}, None

            def patched_ctx(ctx, inp):
                if "uncond_emb" in inp:
                    n = ctx.shape[0] // 2
                    return jnp.concatenate(
                        [jnp.broadcast_to(inp["uncond_emb"], ctx[:n].shape), ctx[n:]],
                        axis=0)
                return ctx

            inputs = {"i": jnp.arange(len(ts)), "t": jnp.asarray(ts), **extras}
            carry0 = {**carry_extras, "src": src0, "tgt": tgt0, "rng": rng}
            carry, _ = jax.lax.scan(body, carry0, inputs)
            return carry["tgt"]

        jfn = inv._cached("p2p_bwd", (latent0.shape, src_context.shape, len(ts),
                                      tuple(sorted(extras)), lr), fn)
        rng = jax.random.PRNGKey(inv.seed + 1)
        return jfn(inv.model.params, latent0, latent0, src_context, tgt_context,
                   extras, carry_extras, rng)

    # ------------------------------------------------- edict joint backward

    def _joint_backward_edict(self, inv_res, src_context, tgt_context):
        """pix2pix-zero over EDICT's coupled pair: the reference keeps one
        attention store per pair slot and, in the target pass, optimizes the
        *model-input* latent and steps from it (reference :24-38, :148-193
        with is_edict + latent_idx).  Here both pairs advance in one scan;
        each half-update's source maps guide the matching target half-update."""
        inv = self.inverter
        ts = inv.backward_timesteps()
        pair0 = inv_res["latents"][-1]  # (2, B, h, w, c)
        lr = self.cross_attention_guidance_amount
        hooks = StoreAllCrossHooks()
        gs = inv.guidance_scale_bwd

        def fn(params, src0, tgt0, src_ctx, tgt_ctx):
            def body(carry, inp):
                src, tgt = carry
                i, t = inp["i"], inp["t"]
                offset = i % 2
                perm = jnp.stack([offset, 1 - offset]).astype(jnp.int32)
                src_p = src[perm]
                tgt_p = tgt[perm]
                for k in range(2):
                    # source half-update, sowing cross maps
                    eps_s, store_s = inv.predict_noise(
                        params, src_p[1 - k], t, src_ctx, gs, hooks=hooks,
                        collect_store=True)
                    new_s = inv.edict_step_backward(src_p[k], eps_s, t)
                    src_p = src_p.at[k].set(new_s.astype(src_p.dtype))

                    # target half-update: SGD on the model-input latent
                    other_t = tgt_p[1 - k]

                    def loss_fn(lat2):
                        _, store = inv.predict_noise(
                            params, lat2, t, tgt_ctx, gs, hooks=hooks,
                            collect_store=True, force_full_cfg=True)
                        loss = 0.0
                        for key, ref in store_s.items():
                            m = store[key].reshape(-1, *store[key].shape[-2:])
                            r = jax.lax.stop_gradient(ref).reshape(m.shape)
                            loss = loss + ((m - r) ** 2).sum((1, 2)).mean(0)
                        return loss * other_t.shape[0]  # see _joint_backward

                    lat2 = jnp.concatenate([other_t, other_t], axis=0)
                    g = jax.grad(loss_fn)(lat2)
                    opt = other_t - lr * g[: other_t.shape[0]]
                    eps_t, _ = inv.predict_noise(params, opt, t, tgt_ctx, gs)
                    # reference injector steps from the optimized input latent
                    new_t = inv.edict_step_backward(opt, eps_t, t)
                    tgt_p = tgt_p.at[k].set(new_t.astype(tgt_p.dtype))

                src = inv.sync_pair(src_p[perm], is_fwd=False)
                tgt = inv.sync_pair(tgt_p[perm], is_fwd=False)
                return (src, tgt), None

            inputs = {"i": jnp.arange(len(ts)), "t": jnp.asarray(ts)}
            (_, tgt), _ = jax.lax.scan(body, (src0, tgt0), inputs)
            return tgt

        jfn = inv._cached("p2p_edict_bwd", (pair0.shape, src_context.shape,
                                            len(ts), lr), fn)
        return jfn(inv.model.params, pair0, pair0, src_context, tgt_context)
