"""Dataset loader tests (reference strategy: test_data.py required-keys checks)
using synthetic on-disk fixtures."""

import json

import numpy as np
import pytest
from PIL import Image

from eta_inversion_tpu.data import DatasetSubset, EditingDataset, load_dataset
from eta_inversion_tpu.data.pie_bench import PieBenchData

REQUIRED_KEYS = {"name", "image", "source_prompt", "target_prompt", "edit", "mask"}


@pytest.fixture()
def pie_dir(tmp_path):
    d = tmp_path / "PIE"
    (d / "annotation_images").mkdir(parents=True)
    mapping = {}
    rs = np.random.RandomState(0)
    for i in range(3):
        fname = f"img_{i}.jpg"
        Image.fromarray((rs.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            d / "annotation_images" / fname)
        mapping[str(i)] = {
            "image_path": fname,
            "original_prompt": f"a [cat] number {i}",
            "editing_prompt": f"a [tiger] number {i}",
            "editing_instruction": "change cat to tiger",
            "blended_word": "cat tiger",
            "mask": [10, 20, 100, 5],
        }
    (d / "mapping_file.json").write_text(json.dumps(mapping))
    return str(d)


@pytest.fixture()
def editing_dir(tmp_path):
    import yaml

    d = tmp_path / "editdata"
    (d / "imgs").mkdir(parents=True)
    rs = np.random.RandomState(1)
    prompts = []
    for i in range(2):
        sp = f"a photo of a cat {i}"
        tp = f"a photo of a dog {i}"
        Image.fromarray((rs.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            d / "imgs" / f"{sp}.png")
        prompts.append({"source_prompt": sp, "target_prompt": tp,
                        "edit": [["replace", ["cat", "dog"]]]})
    (d / "prompts.yaml").write_text(yaml.safe_dump(prompts))
    return str(d)


def test_pie_bench_loader(pie_dir):
    data = PieBenchData(data_path=pie_dir)
    assert len(data) == 3
    s = data[0]
    assert REQUIRED_KEYS <= set(s)
    assert s["source_prompt"] == "a cat number 0"
    assert s["target_prompt"] == "a tiger number 0"
    assert s["edit"]["ptp"]["blend_words"] == (("cat",), ("tiger",))
    assert s["edit_word_idx"] == [1, 1]
    assert s["image"].shape == (32, 32, 3)
    # run-length mask decode: 20 pixels at 10, 5 at 100, plus the 1px border
    m = s["mask"]
    assert m.shape == (512, 512)
    assert m.reshape(-1)[10:30].all() and m.reshape(-1)[100:105].all()
    assert m[0].all() and m[:, 0].all()
    # iterator protocol
    assert len(list(iter(data))) == 3


def test_pie_limit_and_categories(pie_dir):
    assert len(PieBenchData(data_path=pie_dir, limit=1)) == 1
    assert len(PieBenchData(data_path=pie_dir, skip_img_load=True)[1] or {}) > 0


def test_editing_dataset(editing_dir):
    data = EditingDataset(path=editing_dir)
    assert len(data) == 2
    s = data[0]
    assert REQUIRED_KEYS <= set(s)
    ptp = s["edit"]["ptp"]
    assert ptp["blend_words"] == (("cat",), ("dog",))
    assert ptp["equilizer_params"]["words"] == ("dog",)
    assert s["image"].shape == (32, 32, 3)


def test_dataset_subset(pie_dir):
    sub = DatasetSubset(PieBenchData, indices=[2, 0], shuffle=False,
                        data_path=pie_dir)
    assert len(sub) == 2
    assert sub[0]["source_prompt"] == "a cat number 2"


def test_load_dataset_registry_fallback(tmp_path, editing_dir):
    import shutil

    target = tmp_path / "data" / "eval" / "mydata"
    shutil.copytree(editing_dir, target)
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        data = load_dataset("mydata")
        assert len(data) == 2
    finally:
        os.chdir(cwd)
