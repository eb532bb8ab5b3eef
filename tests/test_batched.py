"""Pair-batched editing tests: B edits in one program must match running each
edit alone (the batching is semantically transparent for deterministic paths).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eta_inversion_tpu import load_editor, load_inverter
from eta_inversion_tpu.editing.batched import edit_batch

STEPS = 4

SRCS = ["a cat sitting next to a mirror", "a dog running on grass"]
TGTS = ["a tiger sitting next to a mirror", "a wolf running on grass"]

PTP_CFG = {"is_replace_controller": True, "cross_replace_steps": 0.8,
           "self_replace_steps": 0.5}


def images():
    rs = np.random.RandomState(7)
    return jnp.asarray(rs.rand(2, 16, 16, 3).astype("float32") * 2 - 1)


def run_single(editor_name, model, img, src, tgt, inverter="diffinv", cfg=None,
               inv_cfg=None, **editor_kwargs):
    inv = load_inverter(model, inverter, num_inference_steps=STEPS)
    editor = load_editor(inv, editor_name, **editor_kwargs)
    return editor.edit(img[None] if img.ndim == 3 else img, src, tgt, cfg=cfg,
                       inv_cfg=inv_cfg)


def run_batched(editor_name, model, imgs, inverter="diffinv", cfgs=None,
                inv_cfgs=None, **editor_kwargs):
    inv = load_inverter(model, inverter, num_inference_steps=STEPS)
    editor = load_editor(inv, editor_name, **editor_kwargs)
    return edit_batch(editor, imgs, SRCS, TGTS, cfgs=cfgs, inv_cfgs=inv_cfgs)


@pytest.mark.parametrize("editor_name,cfg", [
    ("simple", None),
    ("ptp", PTP_CFG),
    ("ptp", {**PTP_CFG, "is_replace_controller": False,
             "blend_words": (("cat",), ("tiger",))}),
])
def test_batched_matches_single(editor_name, cfg, tiny_model):
    imgs = images()
    cfgs = [cfg, None if cfg is None else
            ({**cfg, "blend_words": (("dog",), ("wolf",))}
             if "blend_words" in (cfg or {}) else cfg)]
    batched = run_batched(editor_name, tiny_model, imgs,
                          cfgs=cfgs if editor_name == "ptp" else None)
    for i in range(2):
        single = run_single(editor_name, tiny_model, imgs[i], SRCS[i], TGTS[i],
                            cfg=cfgs[i] if editor_name == "ptp" else None)
        np.testing.assert_allclose(
            np.asarray(batched["image"][i]), np.asarray(single["image"][0]),
            rtol=2e-4, atol=2e-4,
            err_msg=f"{editor_name} pair {i} (cfg={cfgs[i]})")
        np.testing.assert_allclose(
            np.asarray(batched["image_inv"][i]), np.asarray(single["image_inv"][0]),
            rtol=2e-4, atol=2e-4)


def test_batched_masactrl_matches_single(tiny_model):
    imgs = images()
    batched = run_batched("masactrl", tiny_model, imgs, layer=1, step=1)
    for i in range(2):
        single = run_single("masactrl", tiny_model, imgs[i], SRCS[i], TGTS[i],
                            layer=1, step=1)
        np.testing.assert_allclose(
            np.asarray(batched["image"][i]), np.asarray(single["image"][0]),
            rtol=2e-4, atol=2e-4)


def test_batched_pnp_matches_single(tiny_model):
    imgs = images()
    batched = run_batched("pnp", tiny_model, imgs)
    for i in range(2):
        single = run_single("pnp", tiny_model, imgs[i], SRCS[i], TGTS[i])
        np.testing.assert_allclose(
            np.asarray(batched["image"][i]), np.asarray(single["image"][0]),
            rtol=2e-4, atol=2e-4)


def test_batched_etainv_ptp_runs(tiny_model):
    """etainv draws per-sample candidate noises from a different stream than
    B sequential runs, so exact equality is not expected — check shape/finite
    and that the source branches still reconstruct the forward trajectory."""
    imgs = images()
    inv = load_inverter(tiny_model, "etainv", num_inference_steps=STEPS)
    editor = load_editor(inv, "ptp")
    res = edit_batch(editor, imgs, SRCS, TGTS,
                     cfgs=[PTP_CFG, PTP_CFG],
                     inv_cfgs=[{"edit_word_idx": (1, 1)},
                               {"edit_word_idx": (1, 1)}])
    assert res["image"].shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(res["image"])).all()
    # deterministic across calls
    res2 = edit_batch(editor, imgs, SRCS, TGTS,
                      cfgs=[PTP_CFG, PTP_CFG],
                      inv_cfgs=[{"edit_word_idx": (1, 1)},
                                {"edit_word_idx": (1, 1)}])
    np.testing.assert_array_equal(np.asarray(res["image"]),
                                  np.asarray(res2["image"]))


@pytest.mark.parametrize("vae_rec", [False, True])
def test_batched_invedit_matches_single(vae_rec, tiny_model):
    imgs = images()
    batched = run_batched("invedit", tiny_model, imgs, vae_rec=vae_rec)
    for i in range(2):
        single = run_single("invedit", tiny_model, imgs[i], SRCS[i], TGTS[i],
                            vae_rec=vae_rec)
        np.testing.assert_allclose(
            np.asarray(batched["image"][i]), np.asarray(single["image"][0]),
            rtol=2e-4, atol=2e-4)


def test_batched_ddpminv_simple_runs(tiny_model):
    imgs = images()
    res = run_batched("simple", tiny_model, imgs, inverter="ddpminv")
    assert res["image"].shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(res["image"])).all()


def test_batched_pix2pix_zero_matches_single(tiny_model):
    """The joint source/target scan is batch-transparent: the attention-map
    L2 loss is per-sample (scaled mean), so gradients don't mix samples."""
    imgs = images()
    batched = run_batched("pix2pix_zero", tiny_model, imgs)
    assert set(batched) == {"image", "latent"}
    for i in range(2):
        single = run_single("pix2pix_zero", tiny_model, imgs[i], SRCS[i],
                            TGTS[i])
        np.testing.assert_allclose(
            np.asarray(batched["image"][i]), np.asarray(single["image"][0]),
            rtol=2e-4, atol=2e-4, err_msg=f"pix2pix_zero pair {i}")


def test_batched_pix2pix_zero_edict_runs(tiny_model):
    """edict decode flattens both pair slots: rows [slot0 x B, slot1 x B]."""
    imgs = images()
    res = run_batched("pix2pix_zero", tiny_model, imgs, inverter="edict")
    assert res["image"].shape == (4, 16, 16, 3)
    assert res["latent"].shape[:2] == (2, 2)  # (pair, B, ...)
    assert np.isfinite(np.asarray(res["image"])).all()
    # per-sample parity with the single-sample edict composition
    single = run_single("pix2pix_zero", tiny_model, imgs[0], SRCS[0], TGTS[0],
                        inverter="edict")
    np.testing.assert_allclose(np.asarray(res["image"][0]),
                               np.asarray(single["image"][0]),
                               rtol=2e-4, atol=2e-4)


def test_batched_pix2pix_zero_incompatible_returns_none(tiny_model):
    assert run_batched("pix2pix_zero", tiny_model, images(),
                       inverter="etainv") is None


def test_batched_nti_simple_matches_single(tiny_model):
    """Per-sample optimized null embeddings must land on each sample's own
    src AND tgt uncond rows in the pair layout (regression: B>1 NTI batches
    broadcast-crashed before the tile fix in predict_step_backward)."""
    imgs = images()
    inv = load_inverter(tiny_model, "nti", num_inference_steps=STEPS,
                        num_inner_steps=2)
    editor = load_editor(inv, "simple")
    batched = edit_batch(editor, imgs, SRCS, TGTS)
    for i in range(2):
        inv1 = load_inverter(tiny_model, "nti", num_inference_steps=STEPS,
                             num_inner_steps=2)
        single = load_editor(inv1, "simple").edit(imgs[i][None], SRCS[i], TGTS[i])
        np.testing.assert_allclose(
            np.asarray(batched["image"][i]), np.asarray(single["image"][0]),
            rtol=2e-4, atol=2e-4, err_msg=f"nti pair {i}")
