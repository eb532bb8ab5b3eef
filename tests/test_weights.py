"""Weight-loading tests: safetensors IO + diffusers key-map round trip.

Strategy (no pretrained weights offline): export the tiny model's own params
to torch-layout safetensors via the declared inverse transforms, reload through
`load_pretrained_params`, and require exact tree equality — proving the
mapping covers every parameter with correct layout transposes.
"""

import jax
import numpy as np
import pytest

from eta_inversion_tpu.models import TINY, TINY21, TINYXL, init_random_params
from eta_inversion_tpu.models.weights import (
    clip_text_key_map,
    map_state_dict,
    read_safetensors,
    unet_key_map,
    vae_key_map,
    write_safetensors,
)


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def to_torch_state(params, key_map):
    """Inverse-map a flax tree to a torch-layout state dict."""
    flat = flatten(params)
    state = {}
    for tk, (path, (_fwd, inv)) in key_map.items():
        assert path in flat, f"mapping targets missing param {path}"
        state[tk] = inv(flat[path]).astype(np.float32)
    return state


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.c": np.ones((2, 2, 2), dtype=np.float32) * 0.5,
    }
    p = tmp_path / "x.safetensors"
    write_safetensors(str(p), tensors)
    back = read_safetensors(str(p))
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


@pytest.mark.parametrize("preset", [TINY, TINY21, TINYXL], ids=lambda p: p.name)
@pytest.mark.parametrize("component", ["unet", "vae", "text", "text2"])
def test_key_map_roundtrip(component, preset, tmp_path):
    if component == "text2" and preset.text2 is None:
        pytest.skip("single text tower preset")
    params = init_random_params(preset)[component]
    key_map = {
        "unet": unet_key_map(preset.unet),
        "vae": vae_key_map(preset.vae),
        "text": clip_text_key_map(preset.text),
        "text2": clip_text_key_map(preset.text2) if preset.text2 else None,
    }[component]

    # every flax param must be covered by the mapping (no silent gaps)
    covered = {path for path, _ in key_map.values()}
    all_params = set(flatten(params))
    assert all_params == covered, (
        f"unmapped params: {sorted(all_params - covered)[:5]}; "
        f"extra mappings: {sorted(covered - all_params)[:5]}")

    state = to_torch_state(params, key_map)
    p = tmp_path / f"{component}.safetensors"
    write_safetensors(str(p), state)
    reloaded = map_state_dict(read_safetensors(str(p)), key_map)

    flat_a = flatten(params)
    flat_b = flatten(reloaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=str(k))


def test_load_pretrained_end_to_end(tmp_path):
    """Full loader path: directory layout -> model that runs."""
    import jax.numpy as jnp

    from eta_inversion_tpu.models import DiffusionModel, load_diffusion_model
    from eta_inversion_tpu.models.weights import load_pretrained_params

    params = init_random_params(TINY)
    for comp, km in (("unet", unet_key_map(TINY.unet)),
                     ("vae", vae_key_map(TINY.vae)),
                     ("text_encoder", clip_text_key_map(TINY.text))):
        d = tmp_path / comp
        d.mkdir()
        src = params["text" if comp == "text_encoder" else comp]
        write_safetensors(str(d / "model.safetensors"),
                          to_torch_state(src, km))

    loaded = load_pretrained_params(str(tmp_path), TINY)
    base, _ = load_diffusion_model("tiny")
    model = DiffusionModel(TINY, jax.tree.map(jnp.asarray, loaded),
                           base.tokenizer)
    eps_a = base.apply_unet(jnp.zeros((1, 8, 8, 4)), 5, jnp.zeros((1, 77, 32)))
    eps_b = model.apply_unet(jnp.zeros((1, 8, 8, 4)), 5, jnp.zeros((1, 77, 32)))
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_b),
                               rtol=1e-5, atol=1e-6)


def test_load_pretrained_dual_tower_end_to_end(tmp_path):
    """Full loader path for a dual-tower (SDXL-layout) directory: unet + vae +
    text_encoder + text_encoder_2, each written in torch layout, reloaded, and
    run — pinning the text2 branch of load_pretrained_params and the packed
    context equality."""
    import jax.numpy as jnp

    from eta_inversion_tpu.models import (DiffusionModel, TINYXL,
                                          load_diffusion_model)
    from eta_inversion_tpu.models.weights import load_pretrained_params

    params = init_random_params(TINYXL)
    for comp, km in (("unet", unet_key_map(TINYXL.unet)),
                     ("vae", vae_key_map(TINYXL.vae)),
                     ("text_encoder", clip_text_key_map(TINYXL.text)),
                     ("text_encoder_2", clip_text_key_map(TINYXL.text2))):
        d = tmp_path / comp
        d.mkdir()
        src = params[{"text_encoder": "text", "text_encoder_2": "text2"}.get(comp, comp)]
        write_safetensors(str(d / "model.safetensors"), to_torch_state(src, km))

    loaded = load_pretrained_params(str(tmp_path), TINYXL)
    assert "text2" in loaded
    base, _ = load_diffusion_model("tinyxl")
    model = DiffusionModel(TINYXL, jax.tree.map(jnp.asarray, loaded),
                           base.tokenizer, schedule=TINYXL.schedule)
    ids = base.tokenizer(["a cat"])
    np.testing.assert_allclose(np.asarray(base.encode_text(ids)),
                               np.asarray(model.encode_text(ids)),
                               rtol=1e-5, atol=1e-6)
    ctx = jnp.tile(model.encode_text(ids), (2, 1, 1))
    eps_a = base.apply_unet(jnp.zeros((2, 8, 8, 4)), 5, ctx)
    eps_b = model.apply_unet(jnp.zeros((2, 8, 8, 4)), 5, ctx)
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_b),
                               rtol=1e-5, atol=1e-6)
