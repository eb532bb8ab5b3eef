"""End-to-end eval harness tests: config grid -> eval.py driver -> result tree
-> compute_metrics.py -> metric yamls (reference call stacks §3.3/3.4)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture()
def workspace(tmp_path, monkeypatch):
    """Synthetic PIE dataset + eval cfg, cwd switched to tmp."""
    d = tmp_path / "data" / "eval" / "PIE-Bench_v1"
    (d / "annotation_images").mkdir(parents=True)
    rs = np.random.RandomState(0)
    mapping = {}
    for i in range(2):
        fname = f"img_{i}.jpg"
        Image.fromarray((rs.rand(16, 16, 3) * 255).astype(np.uint8)).save(
            d / "annotation_images" / fname)
        mapping[str(i)] = {
            "image_path": fname,
            "original_prompt": f"a [cat] number {i}",
            "editing_prompt": f"a [tiger] number {i}",
            "editing_instruction": "x",
            "blended_word": "cat tiger",
            "mask": [10, 20],
        }
    (d / "mapping_file.json").write_text(json.dumps(mapping))

    cfg_dir = tmp_path / "cfg" / "eval"
    cfg_dir.mkdir(parents=True)
    cfg = {
        "model": ["tiny"],
        "data": ["pie"],
        "method": [{"type": "diffinv", "num_inference_steps": 4}],
        "edit_method": [{"type": "simple"}],
    }
    (cfg_dir / "testcfg.yaml").write_text(yaml.safe_dump(cfg))
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_create_configs_grid(workspace):
    from eta_inversion_tpu.utils.eval_utils import create_configs

    cfgs, cfg_all = create_configs("testcfg")
    assert len(cfgs) == 1
    assert cfgs[0]["method"]["type"] == "diffinv"
    assert cfgs[0]["path"].startswith("result/testcfg/00_")


def test_eval_and_metrics_end_to_end(workspace):
    import eval as eval_cli
    import compute_metrics as metrics_cli
    from eta_inversion_tpu.utils.eval_utils import EditResultData, create_configs

    cfgs, cfg_all = create_configs("testcfg")
    eval_cli.run_eval(cfgs[0])

    out = Path(cfgs[0]["path"])
    imgs = sorted((out / "imgs").glob("*.png"))
    assert len(imgs) == 2, imgs
    assert (out / "cfg.yaml").exists()
    assert imgs[0].name == "0000_a cat number 0_a tiger number 0.png"

    # resume: second run skips everything (no new files, no error)
    eval_cli.run_eval(cfgs[0])

    # batched path produces identical files (ptp cfgs batch per-sample)
    import shutil

    batched_dir = Path(str(out) + "_batched")
    shutil.copytree(out, batched_dir)
    for f in (batched_dir / "imgs").glob("*.png"):
        f.unlink()
    cfg_b = dict(cfgs[0])
    cfg_b["path"] = str(batched_dir)
    eval_cli.run_eval(cfg_b, batch=2)
    import numpy as np
    from PIL import Image

    for f in sorted((out / "imgs").glob("*.png")):
        a = np.asarray(Image.open(f))
        b = np.asarray(Image.open(batched_dir / "imgs" / f.name))
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1, f.name

    # metrics pass over the results
    for metric in ["mse", "psnr", "ssim"]:
        metrics_cli.run_compute_metric(str(out), metric)
        mfile = out / "metrics" / f"{metric}.yaml"
        data = yaml.safe_load(mfile.read_text())
        assert data["name"] == metric
        assert len(data["results"]) == 2
        assert np.isfinite(data["mean"])

    # idempotency: rerun skips (exclusive-create lock)
    metrics_cli.run_compute_metric(str(out), "mse")

    # from_metrics loads the tree back
    res = EditResultData.from_metrics(str(out))
    assert set(res.metrics) == {"mse", "psnr", "ssim"}
    sample = res[0]
    assert sample["edit_image"] is not None
    assert set(sample["metrics"]) == {"mse", "psnr", "ssim"}


def test_eval_on_device_mesh(workspace):
    """--mesh DATAxMODEL: the sharded sweep must write the same images as the
    single-device run (virtual 8-device CPU mesh from conftest)."""
    import shutil

    import eval as eval_cli
    from eta_inversion_tpu.utils.eval_utils import create_configs

    cfgs, _ = create_configs("testcfg")
    eval_cli.run_eval(cfgs[0])
    out = Path(cfgs[0]["path"])

    mesh_dir = Path(str(out) + "_mesh")
    shutil.copytree(out, mesh_dir)
    for f in (mesh_dir / "imgs").glob("*.png"):
        f.unlink()
    cfg_m = dict(cfgs[0])
    cfg_m["path"] = str(mesh_dir)
    eval_cli.run_eval(cfg_m, batch=2, mesh="4x2")

    import numpy as np
    from PIL import Image

    files = sorted((out / "imgs").glob("*.png"))
    assert files
    for f in files:
        a = np.asarray(Image.open(f))
        b = np.asarray(Image.open(mesh_dir / "imgs" / f.name))
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1, f.name


def test_eval_model_axis_cross_family(workspace):
    """The model key is a grid AXIS: one cfg yaml sweeping
    model x [tiny, tinyxl] produces one experiment (and result tree) per
    model family through the production run_eval driver — the cross-family
    sweep the reference cannot express (it wires only SD-1.4)."""
    import yaml as _yaml

    import eval as eval_cli
    from eta_inversion_tpu.utils.eval_utils import create_configs

    cfg = {
        "model": ["tiny", "tinyxl"],
        "data": ["pie"],
        "method": [{"type": "diffinv", "num_inference_steps": 3}],
        "edit_method": [{"type": "simple"}],
    }
    (workspace / "cfg" / "eval" / "families_t.yaml").write_text(
        _yaml.safe_dump(cfg))
    cfgs, _ = create_configs("families_t")
    assert [c["model"] for c in cfgs] == ["tiny", "tinyxl"]
    means = {}
    for c in cfgs:
        eval_cli.run_eval(c)
        out = Path(c["path"])
        imgs = sorted((out / "imgs").glob("*.png"))
        assert len(imgs) == 2, (c["model"], imgs)
        from PIL import Image
        means[c["model"]] = float(np.asarray(Image.open(imgs[0])).mean())
    # distinct families produce distinct results from the same inputs
    assert means["tiny"] != means["tinyxl"]
