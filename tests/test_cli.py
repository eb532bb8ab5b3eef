"""CLI smoke tests: edit_image.py / invert_image.py main() end-to-end on the
tiny model (counterpart of the reference's manual CLI usage,
/root/reference/edit_image.py:61-130, invert_image.py:17-43)."""

import argparse
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture()
def input_png(tmp_path):
    rs = np.random.RandomState(0)
    p = tmp_path / "in.png"
    Image.fromarray((rs.rand(20, 24, 3) * 255).astype("uint8")).save(p)
    return str(p)


def test_edit_image_cli(tmp_path, input_png):
    import edit_image

    out = tmp_path / "edited.png"
    out_inv = tmp_path / "recon.png"
    args = argparse.Namespace(
        input=input_png, output=str(out), output_inv=str(out_inv),
        source_prompt="a cat sitting", target_prompt="a tiger sitting",
        model="tiny", dtype="float32", inv_method="etainv", edit_method="ptp",
        steps=4, seed=0, method_cfg='{"noise_sample_count": 2}',
        editor_cfg="{}", edit_cfg=None)
    edit_image.main(args)
    for f in (out, out_inv):
        img = np.asarray(Image.open(f))
        assert img.shape[2] == 3 and img.dtype == np.uint8, f


def test_edit_image_cli_json_cfgs(tmp_path, input_png):
    import edit_image

    out = tmp_path / "edited.png"
    args = argparse.Namespace(
        input=input_png, output=str(out), output_inv=None,
        source_prompt="a cat sitting", target_prompt="a tiger sitting",
        model="tiny", dtype="float32", inv_method="diffinv",
        edit_method="masactrl", steps=4, seed=0,
        method_cfg='{"scheduler": "dpm", "solver_order": 2}',
        editor_cfg='{"layer": 1, "step": 1}', edit_cfg=None)
    edit_image.main(args)
    assert out.exists()


def test_invert_image_cli(tmp_path, input_png):
    import invert_image

    out = tmp_path / "inverted.png"
    args = argparse.Namespace(
        input=input_png, output=str(out), prompt="a cat sitting",
        model="tiny", dtype="float32", inv_method="npi", steps=4, seed=0,
        method_cfg="{}")
    invert_image.main(args)
    assert np.asarray(Image.open(out)).dtype == np.uint8
