"""Native C++ image-pipeline tests: builds the shared library and checks
numerical parity against the Python reference paths."""

import numpy as np
import pytest

from eta_inversion_tpu import native
from eta_inversion_tpu.data.pie_bench import PieBenchData

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_preprocess_matches_python_area_resize():
    rs = np.random.RandomState(0)
    img = (rs.rand(64, 48, 3) * 255).astype(np.uint8)
    out = native.preprocess_image(img, 16, center_crop=True)
    assert out.shape == (1, 16, 16, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
    # reference computation: center crop to 48, exact 3x box filter
    crop = img[8:56, :, :].astype(np.float64)
    ref = crop.reshape(16, 3, 16, 3, 3).mean(axis=(1, 3)) / 127.5 - 1.0
    np.testing.assert_allclose(out[0], ref, atol=2e-3)


def test_preprocess_bilinear_upscale():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, 4:] = 255
    out = native.preprocess_image(img, 16, center_crop=True)
    assert out.shape == (1, 16, 16, 3)
    # left stays -1, right stays 1, smooth transition in between
    assert np.allclose(out[0, :, :6], -1.0)
    assert np.allclose(out[0, :, 10:], 1.0)


def test_postprocess_matches_python():
    rs = np.random.RandomState(1)
    x = (rs.rand(16, 16, 3).astype(np.float32) * 2.4 - 1.2)  # incl. clipping
    out = native.postprocess_image(x)
    ref = (np.clip(x / 2 + 0.5, 0, 1) * 255).round().astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_rle_mask_matches_python():
    enc = [10, 20, 1000, 7, 512 * 512 - 3, 10]
    a = native.decode_rle_mask(enc)
    b = PieBenchData.mask_decode(enc)
    np.testing.assert_array_equal(a, b)


def test_prefetcher_order_and_errors():
    items = list(range(5))
    out = list(native.Prefetcher(lambda x: x * 2, items))
    assert out == [(i, i * 2) for i in items]

    def boom(x):
        if x == 1:
            raise ValueError("x")
        return x

    it = iter(native.Prefetcher(boom, [0, 1, 2]))
    assert next(it) == (0, 0)
    with pytest.raises(ValueError):
        list(it)


# ---------------------------------------------------------------------------
# NativeImageLoader (native/loader.cpp)
# ---------------------------------------------------------------------------

def _write_test_images(tmp_path):
    from PIL import Image

    rs = np.random.RandomState(5)
    paths = []
    for i, (h, w) in enumerate(((40, 56), (64, 64), (30, 22))):
        arr = (rs.rand(h, w, 3) * 255).astype("uint8")
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append((str(p), arr))
    # and one jpeg
    arr = (rs.rand(48, 36, 3) * 255).astype("uint8")
    p = tmp_path / "img_j.jpg"
    Image.fromarray(arr).save(p, quality=95)
    paths.append((str(p), arr))
    return paths


def test_native_loader_matches_preprocess(tmp_path):
    """Native decode+preprocess == PIL decode + native preprocess_image."""
    from eta_inversion_tpu import native

    if native._load_loader() is None:
        pytest.skip("native loader unavailable")
    paths = _write_test_images(tmp_path)
    with native.NativeImageLoader(size=16, threads=2) as loader:
        tickets = [loader.submit(p) for p, _ in paths]
        for (p, arr), t in zip(paths, tickets):
            got = loader.get(t)
            assert got.shape == (1, 16, 16, 3)
            from PIL import Image

            # compare against PIL's decode of the same FILE (jpeg is lossy,
            # so the pre-compression array is not the reference)
            decoded = np.asarray(Image.open(p).convert("RGB"))
            want = native.preprocess_image(decoded, 16, True)
            if p.endswith(".png"):  # lossless -> exact
                np.testing.assert_allclose(got, want, atol=1e-6)
            else:  # libjpeg vs PIL IDCT may differ by a few LSBs
                assert np.mean(np.abs(got - want)) < 0.02


def test_native_loader_error_and_fallback(tmp_path):
    from eta_inversion_tpu import native

    if native._load_loader() is not None:
        with native.NativeImageLoader(size=8, threads=1) as loader:
            t = loader.submit(str(tmp_path / "missing.png"))
            with pytest.raises(IOError):
                loader.get(t)

    # forced-fallback path: Python threads + the supplied callable
    calls = []

    def fake_pre(path):
        calls.append(path)
        return np.zeros((1, 8, 8, 3), np.float32)

    with native.NativeImageLoader(size=8, threads=2, fallback_fn=fake_pre,
                                  force_fallback=True) as loader:
        assert not loader.native
        t1, t2 = loader.submit("a.png"), loader.submit("b.png")
        assert loader.get(t1).shape == (1, 8, 8, 3)
        assert loader.get(t2).shape == (1, 8, 8, 3)
    assert sorted(calls) == ["a.png", "b.png"]
