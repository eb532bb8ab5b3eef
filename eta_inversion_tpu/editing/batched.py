"""Pair-batched editing: B independent (image, source, target) edits in one
compiled diffusion program.

The TPU-native capability the reference lacks (its parallelism is one process
per GPU per experiment, SURVEY.md §2.12): the conditional CFG half carries B
(source, target) pairs laid out [s_1..s_B, t_1..t_B]; every functional editing
hook (ptp probability edits, LocalBlend, masactrl k/v substitution, pnp batch
plans, eta-inversion masks/noise selection) is written pair-wise, so batched
results are bitwise-consistent with running each edit alone (up to the usual
cross-batch reduction reordering).

Amortizes fixed per-step costs across B samples for substantially higher
images/sec/chip; combine with the "data" mesh axis (parallel/sharding.py) for
multi-chip scaling.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp


def _merged_ptp_cfg(cfgs: Sequence[Optional[Dict[str, Any]]], B: int) -> Dict[str, Any]:
    """Merge per-sample ptp configs: scalar options must agree; word options
    become per-pair lists."""
    cfgs = [dict(c or {}) for c in cfgs]
    merged: Dict[str, Any] = {}
    for key in ("is_replace_controller", "cross_replace_steps", "self_replace_steps"):
        vals = [c.get(key) for c in cfgs if key in c]
        if vals:
            assert all(v == vals[0] for v in vals), \
                f"batched ptp requires equal {key} across samples"
            merged[key] = vals[0]
    merged["blend_words"] = [c.get("blend_words") for c in cfgs]
    merged["equilizer_params"] = [c.get("equilizer_params") for c in cfgs]
    return merged


def edit_batch(editor, images, source_prompts: List[str], target_prompts: List[str],
               cfgs: Optional[Sequence[Optional[Dict[str, Any]]]] = None,
               inv_cfgs: Optional[Sequence[Optional[Dict[str, Any]]]] = None
               ) -> Optional[Dict[str, Any]]:
    """Run B edits through `editor` in one batched program.

    Supported editors: simple, ptp (ControllerBasedEditor), masactrl, pnp,
    invedit, pix2pix_zero.  Returns {"image", "image_inv", "latent",
    "latent_inv"} with leading dim B (pix2pix_zero, like its single-sample
    edit(), has no reconstruction output and returns {"image", "latent"}).
    """
    from .editor import ControllerBasedEditor
    from .inv_editor import InversionEditor
    from .masactrl import MasaCtrlController, MasactrlEditor
    from .pix2pix_zero import Pix2PixZeroEditor
    from .pnp import PlugAndPlayEditor, PnpController
    from .simple import SimpleEditor

    inv = editor.inverter
    B = len(source_prompts)
    assert len(target_prompts) == B and images.shape[0] == B
    cfgs = list(cfgs) if cfgs is not None else [None] * B
    inv_cfgs = list(inv_cfgs) if inv_cfgs is not None else [None] * B

    if isinstance(editor, InversionEditor):
        # reconstruction-only sweep (e.g. COCO): B sources in one program
        if editor.vae_rec:
            latent = inv.encode(jnp.asarray(images))
            image = inv.decode(latent)
            return {"image": image, "image_inv": image,
                    "latent": latent, "latent_inv": latent}
        prompts = [p if editor.no_null_source_prompt else ""
                   for p in source_prompts]
        uncond = inv.embed_texts([""])
        cond = inv.embed_texts(prompts)
        ctx = jnp.concatenate([jnp.broadcast_to(uncond, cond.shape), cond], axis=0)
        widx = [((c or {}).get("edit_word_idx") or (None, None)) for c in inv_cfgs]
        inv_res = inv.invert(jnp.asarray(images), context=ctx,
                             inv_cfg={"edit_word_idx": widx})
        edit_res = inv.sample(inv_res, context=ctx)
        if edit_res is None:
            return None
        return {"image": edit_res["image"], "image_inv": edit_res["image"],
                "latent": edit_res["latent"], "latent_inv": edit_res["latent"]}

    # merged inversion config (per-sample word indices / masks stacked)
    widx = [((c or {}).get("edit_word_idx") or (None, None)) for c in inv_cfgs]
    masks = [(c or {}).get("mask") for c in inv_cfgs]
    inv_cfg: Dict[str, Any] = {"edit_word_idx": widx}
    if all(m is not None for m in masks):
        inv_cfg["mask"] = jnp.stack([jnp.asarray(m, jnp.float32) for m in masks])

    if isinstance(editor, Pix2PixZeroEditor):
        from ..inversion.direct import DirectInversion
        from ..inversion.edict import EdictInversion
        from ..inversion.eta import EtaInversion

        if isinstance(inv, (DirectInversion, EtaInversion)):
            return None  # incompatible (reference pix2pix_zero.py:300-301)
        caps = []
        for i, c in enumerate(cfgs):
            cap = dict(c or {}).get("caption")
            if cap is None:
                cap = editor.generate_caption(images[i: i + 1]) \
                    if editor.gen_caption else ""
            caps.append(cap)
        cap_emb = inv.embed_texts(caps)  # caption is also the negative prompt
        src_ctx = jnp.concatenate([cap_emb, cap_emb], axis=0)
        dirs = jnp.concatenate(
            [editor.construct_direction(s, t)
             for s, t in zip(source_prompts, target_prompts)], axis=0)
        tgt_ctx = src_ctx.at[B:].add(dirs)
        inv_res = inv.invert(jnp.asarray(images), context=src_ctx,
                             guidance_scale_fwd=1, inv_cfg=inv_cfg)
        if inv_res is None:
            return None
        if isinstance(inv, EdictInversion):
            z0 = editor._joint_backward_edict(inv_res, src_ctx, tgt_ctx)
        else:
            z0 = editor._joint_backward(inv_res, src_ctx, tgt_ctx)
        image = inv.decode(z0)
        return {"image": image, "latent": z0}

    # contexts: source prompts for inversion (conditional rows only at CFG=1)
    uncond = inv.embed_texts([""])
    cond_src = inv.embed_texts(source_prompts)

    if isinstance(editor, (MasactrlEditor, PlugAndPlayEditor)) and \
            not getattr(editor, "no_null_source_prompt", True):
        cond_src = jnp.broadcast_to(uncond, cond_src.shape)

    ctx_inv = jnp.concatenate([jnp.broadcast_to(uncond, cond_src.shape), cond_src],
                              axis=0)

    inv_res = inv.invert(jnp.asarray(images), context=ctx_inv,
                         guidance_scale_fwd=1 if isinstance(editor, SimpleEditor)
                         else None, inv_cfg=inv_cfg)
    if inv_res is None:
        return None

    # denoising contexts: cond half [c_s1..c_sB, c_t1..c_tB]
    if isinstance(editor, PlugAndPlayEditor) and editor.negative_prompt:
        neg = inv.embed_texts([editor.negative_prompt])
        u_t = jnp.broadcast_to(neg, cond_src.shape)
    else:
        u_t = jnp.broadcast_to(uncond, cond_src.shape)
    cond_tgt = inv.embed_texts(target_prompts)
    ctx_bwd = jnp.concatenate([
        jnp.broadcast_to(uncond, cond_src.shape), u_t, cond_src, cond_tgt], axis=0)

    # controller
    if isinstance(editor, ControllerBasedEditor):
        ctrl = editor.make_controller(
            image=images, source_prompt=list(source_prompts),
            target_prompt=list(target_prompts), inv_res=inv_res,
            **_merged_ptp_cfg(cfgs, B))
    elif isinstance(editor, MasactrlEditor):
        mcfgs = [dict(c or {}) for c in cfgs]
        opts: Dict[str, Any] = {}
        for key in ("mode", "thres", "ref_token_idx", "cur_token_idx"):
            vals = [c[key] for c in mcfgs if key in c]
            if vals:
                assert all(v == vals[0] for v in vals), \
                    f"batched masactrl requires equal {key} across samples"
                opts[key] = vals[0]
        for key in ("mask_s", "mask_t"):
            vals = [c.get(key) for c in mcfgs]
            if all(v is not None for v in vals):
                opts[key] = jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])
        ctrl = MasaCtrlController(inv, editor.step, editor.layer, **opts)
    elif isinstance(editor, PlugAndPlayEditor):
        ctrl = PnpController(inv, editor.pnp_f_t, editor.pnp_attn_t)
    elif isinstance(editor, SimpleEditor):
        ctrl = None
    else:
        raise NotImplementedError(
            f"batched editing not supported for {type(editor).__name__}")

    # step skipping (ddpminv) is normally applied inside sample()
    if hasattr(inv, "skip_inv_result") and getattr(inv, "skip_steps", None) is not None:
        inv_res = inv.skip_inv_result(inv_res)
    zT = inv_res["latents"][-1]
    # [s rows; t rows] — cat_latent, not a raw axis-0 concat: edict's coupled
    # pair keeps its (2, rows, ...) chain axis in front and batches on axis 1
    latent2 = inv.cat_latent([zT, zT])
    z0 = inv.diffusion_backward(latent2, ctx_bwd, inv_res, ctrl=ctrl)
    # coupled-pair inverters (edict) flatten to their output chain before
    # decode, matching sample(); the discarded chain is never decoded
    z0 = inv.flat_latent(z0)
    image = inv.decode(z0)
    # slicing rows of a "data"-sharded array de-shards it (the half-slice
    # spans only half the devices); re-place so downstream consumers
    # (metrics, postprocess) stay data-parallel under an active mesh
    from ..parallel.sharding import shard_batch

    return {
        "image_inv": shard_batch(image[:B]), "image": shard_batch(image[B:]),
        "latent_inv": shard_batch(z0[:B]), "latent": shard_batch(z0[B:]),
    }
