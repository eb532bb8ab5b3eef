"""Real-geometry mesh validation on CPU: the flagship sd15 batched edit is
lowered AND SPMD-compiled (AOT, never executed) under the (4,2) mesh.

The dryrun/virtual-mesh tests exercise tiny presets; sharding-spec propagation
surprises (axis divisibility, conflicting annotations, GSPMD/Shardy resolution
at 64x64 latents / 77-token contexts / real kernel shapes) would otherwise
surface only on real multi-chip hardware.  Params stay ABSTRACT
(`jax.ShapeDtypeStruct` with `NamedSharding`s) so the 860M-parameter tree is
never materialized — `jit.lower()` + `.compile()` run the full XLA SPMD
partitioner on shapes alone.

Reference anchor: the reference's parallelism is one process per GPU
(/root/reference/utils/device_pool.py:10-61) and never shards a model; this
validates the mesh path that replaces it at production geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from eta_inversion_tpu import load_editor, load_inverter
from eta_inversion_tpu.models import (DiffusionModel, PRESETS,
                                      init_random_params, load_diffusion_model)
from eta_inversion_tpu.parallel.mesh import make_mesh
from eta_inversion_tpu.parallel.sharding import param_spec

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _abstract_params(preset, mesh, dtype):
    """Tensor-parallel-sharded ShapeDtypeStructs with the exact real-geometry
    shapes (nothing allocated)."""
    shapes = jax.eval_shape(lambda: init_random_params(preset, dtype))

    def to_abstract(path, leaf):
        names = [p.key for p in path]
        return jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype,
            sharding=NamedSharding(mesh, param_spec(names, leaf)))

    return jax.tree_util.tree_map_with_path(to_abstract, shapes)


def _spec_names(spec):
    return {n for part in (spec or ()) for n in
            (part if isinstance(part, tuple) else (part,)) if n is not None}


def test_sd15_flagship_edit_spmd_compiles_under_mesh():
    """etainv+ptp pair-batched edit at REAL sd15 geometry: both scan programs
    (inversion forward with attention-store controller; [src,tgt] denoise with
    the ptp controller + eta candidate argmin) must lower and SPMD-compile on
    the (data=4, model=2) mesh, with the denoised latent propagated to
    PartitionSpec("data")."""
    mesh = make_mesh(8, model_parallel=2)
    preset = PRESETS["sd15"]
    dtype = jnp.bfloat16
    aparams = _abstract_params(preset, mesh, dtype)

    # tokenizer is geometry-independent; reuse the tiny model's
    tiny, _ = load_diffusion_model("tiny")
    model = DiffusionModel(preset, aparams, tiny.tokenizer, dtype=dtype)
    assert model.latent_size == 64 and preset.unet.cross_attention_dim == 768

    B = 4
    D = preset.unet.cross_attention_dim
    data = NamedSharding(mesh, P("data"))

    with mesh:
        inv = load_inverter(model, "etainv", num_inference_steps=2,
                            eta=((0.6, 0.0), (1.0, 0.7)), noise_sample_count=2)
        editor = load_editor(inv, "ptp")

        # ---- inversion program (edit_batch's ctx layout: [u(B), c_src(B)])
        latent = jax.device_put(jnp.zeros((B, 64, 64, 4), jnp.float32), data)
        ctx_inv = jax.device_put(jnp.zeros((2 * B, 77, D), dtype), data)

        from eta_inversion_tpu.editing.ptp import AttnStoreController
        ctrl_fwd = AttnStoreController(
            inv, store_res=(inv._attn_res(),),
            store_places=tuple(inv.mask_mode_cfg["attn_from_where"]),
            n_prompts=B, per_step_maps=True, resize=model.latent_size)
        jfn_f, args_f = inv._forward_program(latent, ctx_inv, ctrl=ctrl_fwd)
        low_f = jfn_f.lower(*args_f)
        out_f = jax.eval_shape(jfn_f, *args_f)
        assert out_f["zT_inv"].shape == (B, 64, 64, 4)
        assert out_f["latents"].shape == (3, B, 64, 64, 4)

        # synthetic inversion result at the forward program's exact shapes
        # (never executed, so zeros are as good as real trajectories)
        zeros = lambda tree: jax.tree.map(  # noqa: E731
            lambda s: jnp.zeros(s.shape, s.dtype), tree)
        st = zeros(out_f["state"])
        inv_res = {
            "latents": zeros(out_f["latents"]),
            "noise_preds": zeros(out_f["noise_preds"]),
            "zT_inv": zeros(out_f["zT_inv"]),
            "fwd_token_maps": st["norm_map_sum"],
            "context": ctx_inv,
            "inv_cfg": {"edit_word_idx": [(1, 1)] * B},
        }

        # ---- denoise program: rows [u_s(B), u_t(B), c_s(B), c_t(B)]
        ctrl = editor.make_controller(
            image=np.zeros((B, 512, 512, 3), np.float32),
            source_prompt=[f"a cat {i}" for i in range(B)],
            target_prompt=[f"a dog {i}" for i in range(B)],
            inv_res=inv_res, is_replace_controller=True,
            cross_replace_steps=0.8, self_replace_steps=0.5,
            blend_words=[None] * B, equilizer_params=[None] * B)

        ctx_bwd = jax.device_put(jnp.zeros((4 * B, 77, D), dtype), data)
        zT = inv_res["latents"][-1]
        latent2 = jax.device_put(jnp.concatenate([zT, zT], axis=0), data)
        jfn_b, args_b = inv._backward_program(latent2, ctx_bwd, inv_res, ctrl=ctrl)
        low_b = jfn_b.lower(*args_b)
        assert jax.eval_shape(jfn_b, *args_b).shape == (2 * B, 64, 64, 4)

        # the lowered module carries the user annotations: batch inputs on
        # "data", TP kernels on "model" (many attention/MLP kernels)
        txt = low_b.as_text()
        assert 'sdy.sharding<@mesh, [{"data"}' in txt or "devices=[4" in txt, \
            "no data-axis input annotation in the lowered module"
        assert txt.count('{"model"}') > 100, \
            "tensor-parallel kernel annotations missing at real shapes"

        # full SPMD propagation (AOT compile, no execution): this is where
        # divisibility/conflict surprises would break on real hardware
        comp_b = low_b.compile()
        out_sharding = comp_b.output_shardings
        assert "data" in _spec_names(out_sharding.spec), \
            f"denoised latent not data-sharded: {out_sharding}"

        comp_f = low_f.compile()
        fwd_shardings = comp_f.output_shardings
        assert "data" in _spec_names(fwd_shardings["zT_inv"].spec), \
            f"zT not data-sharded: {fwd_shardings['zT_inv']}"
