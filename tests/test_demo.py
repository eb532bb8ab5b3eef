"""Demo backend tests (reference demo/manager.py:75-177): flat->nested config
conversion, cfg-keyed component caching, unsupported-combo error payload."""

import numpy as np
import pytest


@pytest.fixture()
def manager():
    from demo.manager import EditorManager

    return EditorManager()


def _cfg(img, **over):
    cfg = {"model.model": "tiny", "model.dtype": "float32",
           "inverter.type": "diffinv", "inverter.num_inference_steps": 3,
           "editor.type": "simple", "editor.source_image": img,
           "editor.source_prompt": "a cat", "editor.target_prompt": "a dog"}
    cfg.update(over)
    return cfg


def test_manager_run_and_cache(manager):
    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype("uint8")
    res = manager.run(_cfg(img))
    assert res["edit_image"].shape == (16, 16, 3)
    assert res["edit_image"].dtype == np.uint8

    # same cfg -> components reused (reference caches on cfg equality,
    # manager.py:146-153)
    inv_before, ed_before = manager.inverter, manager.editor
    res2 = manager.run(_cfg(img))
    assert manager.inverter is inv_before and manager.editor is ed_before
    np.testing.assert_array_equal(res["edit_image"], res2["edit_image"])

    # changing the inverter cfg rebuilds inverter + editor
    manager.run(_cfg(img, **{"inverter.num_inference_steps": 4}))
    assert manager.inverter is not inv_before


def test_manager_unsupported_combo(manager):
    img = (np.random.RandomState(1).rand(16, 16, 3) * 255).astype("uint8")
    res = manager.run(_cfg(img, **{"inverter.type": "etainv",
                                   "editor.type": "pix2pix_zero",
                                   "editor.gen_caption": False}))
    assert res["edit_image"] is None
    assert "unsupported" in res["error"]


def test_flat_to_nested():
    from demo.manager import to_nested_dict

    nested = to_nested_dict({"a.b.c": 1, "a.b.d": 2, "e": 3})
    assert nested == {"a": {"b": {"c": 1, "d": 2}}, "e": 3}


def test_method_defaults():
    """Per-method guidance defaults (reference demo_utils.py:183-189)."""
    from demo.demo_utils import method_defaults

    assert method_defaults("edict")["guidance_scale_fwd"] == 3.0
    assert method_defaults("ddpminv")["guidance_scale_bwd"] == 15.0
    assert method_defaults("diffinv") == {"guidance_scale_fwd": 1.0,
                                          "guidance_scale_bwd": 7.5}
