"""Inversion-engine tests: golden-regen regression (reference test strategy,
/root/reference/test/test_inv.py) on the tiny model, determinism, and method
behaviors."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import functools

from eta_inversion_tpu.inversion.base import DiffusionInversion
from eta_inversion_tpu.inversion.ddpm import DDPMInversion
from eta_inversion_tpu.inversion.direct import DirectInversion
from eta_inversion_tpu.inversion.edict import EdictInversion
from eta_inversion_tpu.inversion.eta import EtaInversion
from eta_inversion_tpu.inversion.npi import NegativePromptInversion
from eta_inversion_tpu.inversion.nti import NullTextInversion
from eta_inversion_tpu.inversion.proxnpi import ProximalNegativePromptInversion
from eta_inversion_tpu.inversion.regularized import RegularizedDiffusionInversion

PROMPT = "a cat sitting next to a mirror"
STEPS = 6

INVERTERS = {
    "diffinv": DiffusionInversion,
    "npi": NegativePromptInversion,
    "proxnpi": ProximalNegativePromptInversion,
    "dirinv": DirectInversion,
    "nti": functools.partial(NullTextInversion, num_inner_steps=3),
    "edict": EdictInversion,
    "ddpminv": DDPMInversion,
    "cyclediff": functools.partial(DDPMInversion, markovian_forward=True),
    "etainv": EtaInversion,
    "regdiffinv": functools.partial(RegularizedDiffusionInversion,
                                    num_reg_steps=2, num_ac_rolls=2),
}


def run_invert(name, model, image):
    inv = INVERTERS[name](model, num_inference_steps=STEPS)
    if name == "etainv":
        ctx = inv.create_context(PROMPT)
        res = inv.invert(jnp.asarray(image), context=ctx,
                         inv_cfg={"edit_word_idx": (1, 1)})
        res = inv.sample(res, context=ctx)
    else:
        res = inv.invert_sample(jnp.asarray(image), PROMPT)
    return float(np.asarray(res["image"]).mean())


@pytest.mark.parametrize("name", sorted(INVERTERS))
def test_inverter_golden(name, tiny_model, goldens, tmp_path):
    val = run_invert(name, tiny_model, pytest.importorskip("numpy").asarray(
        _image()))
    key = f"inv_{name}"
    if key in goldens:
        assert val == pytest.approx(goldens[key], abs=1e-4), \
            f"{key}: {val} != golden {goldens[key]}"
    else:
        pytest.skip(f"no golden for {key}; run tests/gen_goldens.py")


def _image():
    rs = np.random.RandomState(0)
    return (rs.rand(1, 16, 16, 3).astype("float32") * 2 - 1)


def test_diffinv_deterministic(tiny_model, test_image):
    inv = DiffusionInversion(tiny_model, num_inference_steps=STEPS)
    a = inv.invert_sample(jnp.asarray(test_image), PROMPT)
    b = inv.invert_sample(jnp.asarray(test_image), PROMPT)
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))


def test_invert_result_contract(tiny_model, test_image):
    inv = DiffusionInversion(tiny_model, num_inference_steps=STEPS)
    res = inv.invert(jnp.asarray(test_image), PROMPT)
    assert res["latents"].shape == (STEPS + 1, 1, 8, 8, 4)
    assert res["noise_preds"].shape == (STEPS, 1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(res["latents"][-1]),
                                  np.asarray(res["zT_inv"]))
    assert res["context"].shape == (2, 77, 32)


def test_dirinv_reconstruction_exact(tiny_model, test_image):
    """Direct inversion snaps the source row to the recorded forward
    trajectory each step, so single-prompt reconstruction recovers z0 exactly
    (up to float assembly) even with a random-weight UNet.  (Approximate DDIM
    invertibility does NOT hold for random weights at few steps, so the
    diffinv-quality check lives in the golden test instead.)"""
    inv = DirectInversion(tiny_model, num_inference_steps=STEPS)
    z0 = inv.encode(jnp.asarray(test_image))
    res = inv.invert_sample(jnp.asarray(test_image), PROMPT)
    np.testing.assert_allclose(np.asarray(res["latent"]), np.asarray(z0),
                               rtol=1e-4, atol=1e-5)


def test_npi_uses_cond_as_null(tiny_model, test_image):
    inv = NegativePromptInversion(tiny_model, num_inference_steps=STEPS)
    res = inv.invert(jnp.asarray(test_image), PROMPT)
    n = res["context"].shape[0] // 2
    np.testing.assert_array_equal(np.asarray(res["uncond_embeddings"][0]),
                                  np.asarray(res["context"][n:]))
    assert res["uncond_embeddings"].shape[0] == STEPS


def test_multi_prompt_sample(tiny_model, test_image):
    inv = DiffusionInversion(tiny_model, num_inference_steps=STEPS)
    c1 = inv.create_context(PROMPT)
    c2 = inv.create_context("a tiger sitting next to a mirror")
    res = inv.invert(jnp.asarray(test_image), context=c1)
    out = inv.sample(res, context=[c1, c2])
    assert out["image"].shape == (2, 16, 16, 3)
    assert out["latent"].shape == (2, 8, 8, 4)


def test_dpm_scheduler_end_to_end(tiny_model, test_image):
    """diffinv with the dpm multistep scheduler: full invert+sample runs,
    deterministic, and differs from the ddim path."""
    inv = DiffusionInversion(tiny_model, scheduler="dpm", num_inference_steps=STEPS)
    assert inv.inv_steps == "samesame"  # dpm default (reference :16-24)
    a = inv.invert_sample(jnp.asarray(test_image), PROMPT)
    b = inv.invert_sample(jnp.asarray(test_image), PROMPT)
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
    ddim = DiffusionInversion(tiny_model, num_inference_steps=STEPS)
    c = ddim.invert_sample(jnp.asarray(test_image), PROMPT)
    assert not np.allclose(np.asarray(a["image"]), np.asarray(c["image"]))


def test_edict_exact_reconstruction(tiny_model, test_image):
    """EDICT's affine-coupling steps are exactly invertible: single-prompt
    invert+denoise must recover z0 to float precision."""
    inv = EdictInversion(tiny_model, num_inference_steps=STEPS)
    z0 = DiffusionInversion(tiny_model, num_inference_steps=STEPS).encode(
        jnp.asarray(test_image))
    ctx = inv.create_context(PROMPT)
    res = inv.invert(jnp.asarray(test_image), context=ctx)
    out = inv.sample(res, context=ctx)
    # sample() flattens the coupled pair to the output x chain (rows, h, w, c)
    rec = np.asarray(out["latent"])
    assert rec.shape == np.asarray(z0).shape
    np.testing.assert_allclose(rec, np.asarray(z0), rtol=1e-2, atol=1e-3)


def test_ddpminv_skip_and_shapes(tiny_model, test_image):
    inv = DDPMInversion(tiny_model, num_inference_steps=STEPS)
    res = inv.invert(jnp.asarray(test_image), PROMPT)
    S = STEPS
    assert res["latents"].shape[0] == S + 1
    assert res["variance_noises"].shape[0] == S
    # first (t=min) noisemap zeroed (reference ddpm_inversion.py:104-105)
    assert float(jnp.abs(res["variance_noises"][0]).max()) == 0.0
    skip = inv.get_bwd_skip()
    assert skip == int(0.36 * S)
    assert len(inv.backward_timesteps(res)) == S - skip
    # trajectory replay: single-prompt reconstruction ends at the recorded
    # (corrected) latent... run full sample for smoke
    out = inv.invert_sample(jnp.asarray(test_image), PROMPT)
    assert out["image"].shape == (1, 16, 16, 3)


def test_etainv_requires_word_idx(tiny_model, test_image):
    inv = EtaInversion(tiny_model, num_inference_steps=STEPS)
    assert inv.invert(jnp.asarray(test_image), PROMPT, inv_cfg={}) is None
    res = inv.invert(jnp.asarray(test_image), PROMPT,
                     inv_cfg={"edit_word_idx": (1, 1)})
    assert res["fwd_token_maps"].shape == (1, 8, 8, 77)  # per-sample maps
    maps = np.asarray(res["fwd_token_maps"])
    assert maps.min() >= 0 and maps.max() <= 1.0 + 1e-6


def test_etainv_eta_table():
    from eta_inversion_tpu.inversion.eta import build_eta_table

    t = build_eta_table((0.0, 0.4))
    assert t.shape == (1000,) and t[0] == 0 and abs(t[-1] - 0.4) < 1e-6
    # paper config: piecewise-linear ramp [[0.6, 0], [1, 0.7]]
    t2 = build_eta_table(((0.6, 0.0), (1.0, 0.7)))
    assert t2[0] == 0 and t2[599] == 0 and t2[-1] == pytest.approx(0.7, abs=1e-3)
    assert t2[800] == pytest.approx(0.35, abs=2e-3)


def test_nti_optimizes_uncond(tiny_model, test_image):
    inv = NullTextInversion(tiny_model, num_inference_steps=STEPS, num_inner_steps=2)
    res = inv.invert(jnp.asarray(test_image), PROMPT)
    ue = res["uncond_embeddings"]
    assert ue.shape == (STEPS, 1, 77, 32)
    n = res["context"].shape[0] // 2
    # must differ from the initial uncond embedding (optimization happened)
    assert not np.allclose(np.asarray(ue[-1]), np.asarray(res["context"][:n]))


def test_ddpm_scheduler_backward_stochastic_but_seeded(tiny_model, test_image):
    inv = DiffusionInversion(tiny_model, scheduler="ddpm", num_inference_steps=STEPS)
    a = inv.invert_sample(jnp.asarray(test_image), PROMPT)
    b = inv.invert_sample(jnp.asarray(test_image), PROMPT)
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
    c = inv.sample(inv.invert(jnp.asarray(test_image), PROMPT), PROMPT,
                   rng=jax.random.PRNGKey(123))
    assert not np.allclose(np.asarray(a["image"]), np.asarray(c["image"]))


def test_etainv_fwd_maps_are_per_step_normalized(tiny_model, test_image):
    """The forward token maps must be the MEAN OVER STEPS of each step's own
    max-normalized aggregated cross-attention map (reference
    eta_inversion.py:36-49 ControllerAttentionStorePerStep + :388-396), not a
    normalization of the running sum.  Replicated here from the raw per-step
    stores via a manual two-step run."""
    import jax.numpy as jnp

    from eta_inversion_tpu import load_inverter
    from eta_inversion_tpu.editing.ptp import (
        AttnStoreController,
        aggregate_store_batched,
        normalized_token_maps,
    )

    inv = load_inverter(tiny_model, "etainv", num_inference_steps=2,
                        noise_sample_count=2)
    img = jnp.asarray(test_image)
    res = inv.invert(img, prompt="a cat", inv_cfg={"edit_word_idx": (1, 1)})
    got = np.asarray(res["fwd_token_maps"])  # (1, size, size, 77)

    # manual replica: run the same forward with a store controller that keeps
    # raw per-layer maps, then normalize per step and mean
    ctrl = AttnStoreController(inv, store_res=(inv._attn_res(),),
                               store_places=("up", "down"), n_prompts=1,
                               per_step_maps=True,
                               resize=tiny_model.latent_size)
    # reuse the controller's own accumulated result for cross-checking the
    # composition: mean of per-step normalized maps == norm_map_sum / count
    ctx = inv.create_context("a cat")
    latent = inv.encode(img)
    fwd = inv.diffusion_forward(latent, ctx, ctrl=ctrl)
    st = fwd["fwd_state"]
    want = np.asarray(st["norm_map_sum"] / np.maximum(np.asarray(st["count"]), 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # and each accumulated step map is itself max-normalized: after one step
    # the accumulated map must have per-token max ~1 for active tokens
    ctrl1 = AttnStoreController(inv, store_res=(inv._attn_res(),),
                                store_places=("up", "down"), n_prompts=1,
                                per_step_maps=True,
                                resize=tiny_model.latent_size)
    inv1 = load_inverter(tiny_model, "etainv", num_inference_steps=1,
                         noise_sample_count=2)
    fwd1 = inv1.diffusion_forward(latent, ctx, ctrl=ctrl1)
    m1 = np.asarray(fwd1["fwd_state"]["norm_map_sum"])[0]  # (s, s, 77)
    active = m1.reshape(-1, 77).max(axis=0)
    # per-step normalization puts every nonzero token channel's max at ~1
    # (bicubic resize clips to [0, 1]; zero channels stay zero)
    nz = active[active > 1e-6]
    assert nz.size > 0
    assert np.all(nz <= 1.0 + 1e-5)
    assert np.all(nz > 0.5), "per-step maps must be normalized per token"


# ---------------------------------------------------------------------------
# v-prediction (SD2.x 768-v family): epsilon conversion at the UNet boundary
# ---------------------------------------------------------------------------

def test_v_prediction_to_eps_identity(tiny_model):
    """Algebraic contract (diffusers DDIMScheduler.step, v_prediction):
    given x_t = sqrt(a)*x0 + sqrt(1-a)*eps and v = sqrt(a)*eps - sqrt(1-a)*x0,
    the engine's to_eps(v, x_t, t) must recover eps exactly."""
    from eta_inversion_tpu.models import load_diffusion_model

    model, _ = load_diffusion_model("tinyv")
    assert model.schedule_config.prediction_type == "v_prediction"
    inv = DiffusionInversion(model, num_inference_steps=STEPS)

    rs = np.random.RandomState(3)
    x0 = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    eps = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    for t in (1, 401, 801):
        a = inv.schedule.alpha_at(t)
        xt = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps
        v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
        got = inv.to_eps(v, xt, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(eps),
                                   rtol=2e-5, atol=2e-5)
    # per-row timesteps broadcast too (ddpminv's timestep-batched forward)
    ts = jnp.asarray([1, 801])
    a = inv.schedule.alpha_at(ts).reshape(2, 1, 1, 1)
    xt = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps
    v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
    np.testing.assert_allclose(np.asarray(inv.to_eps(v, xt, ts)),
                               np.asarray(eps), rtol=2e-5, atol=2e-5)


def test_v_prediction_end_to_end(test_image):
    """tinyv (v-pred schedule over the tiny geometry): invert+sample runs,
    is deterministic, and actually differs from the epsilon-pred tiny model
    (the conversion is wired, not dead config)."""
    from eta_inversion_tpu.models import load_diffusion_model

    model_v, _ = load_diffusion_model("tinyv")
    model_e, _ = load_diffusion_model("tiny")
    out = {}
    for name, model in (("v", model_v), ("eps", model_e)):
        inv = DiffusionInversion(model, num_inference_steps=STEPS)
        res = inv.invert_sample(jnp.asarray(test_image), PROMPT)
        out[name] = float(np.asarray(res["image"]).mean())
        res2 = inv.invert_sample(jnp.asarray(test_image), PROMPT)
        assert out[name] == float(np.asarray(res2["image"]).mean())
    assert np.isfinite(out["v"]) and out["v"] != out["eps"]
