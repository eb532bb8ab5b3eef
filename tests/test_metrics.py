"""Metric tests (reference strategy: test_metrics.py golden values on a fixed
image pair; here tiny backbones + property tests since no pretrained weights)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eta_inversion_tpu.metrics import EditMetric, MSSSIM, SSIM
from eta_inversion_tpu.metrics.simple import LPIPSMetric, MSEMetric, PSNRMetric

TINY_CLIP = dict(backbone_kwargs=dict(image_size=32, hidden=32, layers=2, heads=2,
                                      patch=8, text_hidden=32, text_layers=2,
                                      text_heads=2, vocab_size=1024))
TINY_DINO = dict(image_size=32, hidden=32, layers=2, heads=2)


def images():
    rs = np.random.RandomState(1)
    a = rs.rand(1, 64, 64, 3).astype("float32") * 2 - 1
    b = np.clip(a + 0.1 * rs.randn(1, 64, 64, 3).astype("float32"), -1, 1)
    return jnp.asarray(a), jnp.asarray(b)


def test_mse_psnr():
    a, b = images()
    mse = MSEMetric()
    psnr = PSNRMetric()
    m = mse.update(b, a)
    p = psnr.update(b, a)
    # psnr = 10 log10(1/mse) on [0,1]-normalized images
    assert p == pytest.approx(10 * np.log10(1 / m), abs=1e-3)
    assert mse.update(a, a) == 0.0
    mean, details = mse.compute()
    assert mean == pytest.approx(m / 2, abs=1e-7)
    assert details["all"] == [m, 0.0]
    assert mse.losses == []  # reset after compute


def test_ssim_properties():
    a, b = images()
    s = SSIM()
    assert s.update(a, a) == pytest.approx(1.0, abs=1e-5)
    v = s.update(b, a)
    assert 0 < v < 1.0


def test_msssim_properties():
    a, b = images()
    m = MSSSIM()
    assert m.update(a, a) == pytest.approx(1.0, abs=1e-4)
    v = m.update(b, a)
    assert 0 < v <= 1.0
    # more distortion -> lower score
    c = jnp.clip(a + 0.5, -1, 1)
    assert m.update(c, a) < v


def test_lpips_deterministic_and_zero_on_identical():
    a, b = images()
    l = LPIPSMetric()
    assert l.update(a, a) == pytest.approx(0.0, abs=1e-6)
    v1 = l.update(a, b)
    v2 = l.update(a, b)
    assert v1 == v2 and v1 > 0


def test_clip_similarity_tiny():
    from eta_inversion_tpu.metrics.clip_similarity import CLIPSimilarity

    a, b = images()
    m = CLIPSimilarity(metric="img_img", **TINY_CLIP)
    v = m.update(source_image=a, target_image=a)
    assert v == pytest.approx(1.0, abs=1e-4)  # identical image, unit cosine
    v2 = m.update(source_image=a, target_image=b)
    assert v2 <= 1.0 + 1e-5

    t = CLIPSimilarity(metric="text_img", **TINY_CLIP)
    v3 = t.update(target_image=b, target_prompt="a cat")
    assert -1.0 - 1e-5 <= v3 <= 1.0 + 1e-5

    d = CLIPSimilarity(metric="textdir_imgdir", **TINY_CLIP)
    v4 = d.update(source_image=a, target_image=b, source_prompt="a cat",
                  target_prompt="a dog")
    assert np.isfinite(v4)


def test_dino_structure_tiny():
    from eta_inversion_tpu.metrics.dino_vit_structure import DinoVitStructure

    a, b = images()
    m = DinoVitStructure(**TINY_DINO)
    assert m.update(a, a) == pytest.approx(0.0, abs=1e-6)
    assert m.update(b, a) > 0


def test_bglpips_mask_excludes_foreground():
    from eta_inversion_tpu.metrics.bglpips import BGLPIPS

    a, b = images()
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0  # left half = foreground
    m = BGLPIPS()
    # edits confined to the foreground must not affect the metric
    edited_fg = np.asarray(a).copy()
    edited_fg[:, :, :32] = -np.asarray(a)[:, :, :32]
    v = m.update(a, jnp.asarray(edited_fg), "prompt", mask)
    assert v == pytest.approx(0.0, abs=1e-6)
    v2 = m.update(a, b, "prompt", mask)
    assert v2 > 0


def test_nslpips_runs_inversion_inside(tiny_model):
    """NS-LPIPS computes its mask by running a diffusion inversion with an
    attention store inside the metric (reference metrics/nslpips.py:74-96).
    Metric images are 64px (LPIPS/AlexNet needs >=32px); the inversion runs at
    the tiny model's native 16px and the mask is resized."""
    from eta_inversion_tpu.metrics.nslpips import NSLPIPS

    rs = np.random.RandomState(2)
    a = jnp.asarray(rs.rand(1, 64, 64, 3).astype("float32") * 2 - 1)
    b = jnp.asarray(rs.rand(1, 64, 64, 3).astype("float32") * 2 - 1)
    m = NSLPIPS(model="tiny", num_inference_steps=3)
    v = m.update(a, b, "a cat sitting next to a mirror", "cat")
    assert v is not None and np.isfinite(v) and v > 0
    # unknown edit word -> None (reference returns None on failure)
    assert m.update(a, b, "a cat", "zebra") is None


def test_vis_img_grid():
    from eta_inversion_tpu.utils.vis_utils import img_grid

    imgs = [[np.zeros((8, 8, 3), np.uint8), np.ones((8, 8)) * 0.5]] * 2
    g = img_grid(imgs, col_labels=["a", "b"], row_labels=["r1", "r2"])
    assert g.ndim == 3 and g.dtype == np.uint8


def test_phase_timer():
    from eta_inversion_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("x"):
        pass
    with t.phase("x"):
        pass
    assert t.counts["x"] == 2 and "x" in t.summary()


def test_cost_analysis():
    import jax.numpy as jnp

    from eta_inversion_tpu.utils.profiling import cost_analysis, format_cost

    def f(a, b):
        return a @ b

    a = jnp.ones((128, 128), jnp.float32)
    cost = cost_analysis(f, a, a)
    # 2*N^3 flops for a square matmul
    assert cost["flops"] == pytest.approx(2 * 128 ** 3, rel=0.2)
    assert cost["roofline_ms"] > 0
    line = format_cost("mm", cost, measured_ms=1.0)
    assert "TFLOP" in line and "roofline" in line and "measured" in line


def test_edit_metric_facade_routing():
    a, b = images()
    for name in ["mse", "psnr", "ssim", "msssim", "lpips"]:
        m = EditMetric(name)
        v = m.update(a, b, "a cat", "a dog", "dog", mask=None)
        assert isinstance(v, float) and np.isfinite(v), name
        mean, details = m.compute()
        assert mean == pytest.approx(v)
    assert len(EditMetric.get_available_metrics()) == 14
