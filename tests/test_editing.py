"""Editing tests: the inverter x editor grid on the tiny model (reference
strategy: test_edit.py's 8x5 grid + bitwise consistency checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eta_inversion_tpu import load_editor, load_inverter

SRC = "a cat sitting next to a mirror"
TGT = "a tiger sitting next to a mirror"
STEPS = 6

EDITORS = ["simple", "ptp", "masactrl", "pnp", "invedit", "pix2pix_zero"]

PTP_CFG = {
    "is_replace_controller": True,
    "cross_replace_steps": 0.8,
    "self_replace_steps": 0.5,
}


def run_edit(editor_name, model, image, inverter_name="diffinv"):
    inv = load_inverter(model, inverter_name, num_inference_steps=STEPS)
    editor = load_editor(inv, editor_name)
    cfg = dict(PTP_CFG) if editor_name == "ptp" else None
    inv_cfg = {"edit_word_idx": (1, 1)} if inverter_name == "etainv" else None
    res = editor.edit(jnp.asarray(image), SRC, TGT, cfg=cfg, inv_cfg=inv_cfg)
    if res is None:
        return None
    return float(np.asarray(res["image"]).mean())


@pytest.mark.parametrize("name", EDITORS)
def test_editor_golden(name, tiny_model, test_image, goldens):
    val = run_edit(name, tiny_model, test_image)
    key = f"edit_{name}"
    if key in goldens:
        assert val == pytest.approx(goldens[key], abs=1e-4)
    else:
        pytest.skip(f"no golden for {key}; run tests/gen_goldens.py")


def test_ptp_blend_changes_output(tiny_model, test_image):
    a = run_edit("ptp", tiny_model, test_image)
    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "ptp")
    res = editor.edit(jnp.asarray(test_image), SRC, TGT,
                      cfg={**PTP_CFG, "blend_words": [["cat"], ["tiger"]]})
    b = float(np.asarray(res["image"]).mean())
    assert a != b


def test_ptp_refine_mode(tiny_model, test_image):
    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "ptp")
    res = editor.edit(jnp.asarray(test_image), SRC,
                      "a big cat sitting next to a mirror",
                      cfg={**PTP_CFG, "is_replace_controller": False})
    assert res is not None and res["image"].shape[0] == 1


def test_edit_consistency(tiny_model, test_image):
    """Same edit twice with an unrelated edit in between must be bitwise
    identical (reference test_edit.py:258-289)."""
    a = run_edit("ptp", tiny_model, test_image)
    run_edit("simple", tiny_model, test_image)
    b = run_edit("ptp", tiny_model, test_image)
    assert a == b


def test_masactrl_differs_from_simple(tiny_model, test_image):
    # tiny model has 4 self-attn layers; the SD default start_layer=10 would be
    # a no-op here, so start control at layer 1 / step 1
    from eta_inversion_tpu import load_editor, load_inverter

    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "masactrl", layer=1, step=1)
    res = editor.edit(jnp.asarray(test_image), SRC, TGT)
    a = float(np.asarray(res["image"]).mean())
    b = run_edit("simple", tiny_model, test_image)
    assert a != b
    # and the SD-default layer threshold is indeed inert on the tiny model
    assert run_edit("masactrl", tiny_model, test_image) == b


def test_pnp_source_branch_unconditional(tiny_model, test_image):
    res = run_edit("pnp", tiny_model, test_image)
    assert res is not None


def test_pix2pix_zero_incompatible_combos(tiny_model, test_image):
    assert run_edit("pix2pix_zero", tiny_model, test_image, "dirinv") is None
    assert run_edit("pix2pix_zero", tiny_model, test_image, "etainv") is None


def test_editor_with_other_inverters(tiny_model, test_image):
    for inverter in ["npi", "ddpminv"]:
        val = run_edit("ptp", tiny_model, test_image, inverter)
        assert val is not None and np.isfinite(val), inverter
