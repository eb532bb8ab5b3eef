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


# ---------------------------------------------------------------------------
# UI construction with a stubbed gradio module (gradio itself is not bundled
# in this offline image; reference demo/demo_utils.py:15-432 is a live app)
# ---------------------------------------------------------------------------

class _FakeComponent:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.label = kwargs.get("label")
        self.events = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def _event(self, fn, inputs, outputs):
        self.events.append({"fn": fn, "inputs": inputs, "outputs": outputs})

    def change(self, fn, inputs, outputs):
        self._event(fn, inputs, outputs)

    def click(self, fn, inputs, outputs):
        self._event(fn, inputs, outputs)


class _FakeGradio:
    __name__ = "gradio"

    def __init__(self):
        self.created = []

    def _cls(self, name):
        created = self.created

        class C(_FakeComponent):
            _kind = name

            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                created.append(self)

        C.__name__ = name
        return C

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        cls = self._cls(name)
        setattr(self, name, cls)
        return cls


@pytest.fixture()
def fake_gradio(monkeypatch):
    import sys

    fake = _FakeGradio()
    monkeypatch.setitem(sys.modules, "gradio", fake)
    return fake


def _components(fake, kind):
    return [c for c in fake.created if c._kind == kind]


def test_build_app_wires_ui(fake_gradio):
    from eta_inversion_tpu import get_edit_methods, get_inversion_methods
    from demo.demo_utils import build_app

    app = build_app()
    assert app is not None

    drops = _components(fake_gradio, "Dropdown")
    by_label = {d.label: d for d in drops}
    assert set(by_label) == {"Model", "Inversion method", "Editing method"}
    assert by_label["Inversion method"].args[0] == get_inversion_methods()
    assert by_label["Editing method"].args[0] == get_edit_methods()
    assert "tiny" in by_label["Model"].args[0]

    # method-change callback rewires guidance defaults for every method
    (change,) = by_label["Inversion method"].events
    for m in get_inversion_methods():
        fwd, bwd = change["fn"](m)
        assert isinstance(fwd, float) and isinstance(bwd, float)

    # the edit button drives the full backend: 19 inputs -> (image, status)
    (btn,) = _components(fake_gradio, "Button")
    (click,) = btn.events
    assert len(click["inputs"]) == 19 and len(click["outputs"]) == 2


def test_build_app_click_runs_backend(fake_gradio):
    from demo.demo_utils import build_app

    build_app()
    (btn,) = _components(fake_gradio, "Button")
    run_edit = btn.events[0]["fn"]
    img = (np.random.RandomState(2).rand(16, 16, 3) * 255).astype("uint8")
    out_img, err = run_edit(
        img, "a cat", "a dog", "tiny", 2, "diffinv", 1.0, 7.5, "simple",
        False, 0.4, 0.6, "", "", "", 2.0, 0.0, 0.4, 10)
    assert err == ""
    assert out_img is not None and out_img.shape == (16, 16, 3)


# ---------------------------------------------------------------------------
# stdlib web demo (demo/web.py) — actually runnable in this offline env
# ---------------------------------------------------------------------------

def test_web_demo_end_to_end(tmp_path):
    import base64
    import io
    import threading
    import urllib.request
    import uuid

    import numpy as np
    from PIL import Image

    from demo import web

    server = web.serve(port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # form page renders with every registry entry
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read().decode()
        for name in web.INVERTERS + web.EDITORS:
            assert name in page

        # POST a real edit on the tiny model
        rs = np.random.RandomState(0)
        img = Image.fromarray((rs.rand(20, 20, 3) * 255).astype("uint8"))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        boundary = uuid.uuid4().hex
        fields = {"model": "tiny", "inverter": "diffinv", "editor": "simple",
                  "source_prompt": "a cat", "target_prompt": "a tiger",
                  "steps": "4", "gs_fwd": "", "gs_bwd": ""}
        body = b""
        for k, v in fields.items():
            body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                     f'name="{k}"\r\n\r\n{v}\r\n').encode()
        body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="image"; filename="in.png"\r\n'
                 "Content-Type: image/png\r\n\r\n").encode()
        body += buf.getvalue() + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
        resp = urllib.request.urlopen(req, timeout=600).read().decode()
        assert "err" not in resp or "base64" in resp, resp[-500:]
        assert "data:image/png;base64," in resp, resp[-500:]
        b64 = resp.split("data:image/png;base64,")[1].split('"')[0]
        out = Image.open(io.BytesIO(base64.b64decode(b64)))
        assert out.size[0] > 0
    finally:
        server.shutdown()
