"""Dependency-free web demo: the reference ships a Gradio app
(/root/reference/demo/run.py, demo_utils.py:15-432) but gradio is not
installable in this offline image — this serves the same editing backend
(demo/manager.py EditorManager, identical flat dotted-key config protocol)
through a stdlib http.server UI instead, so the demo is actually runnable
here:

    python demo/web.py --port 7860 [--model tiny]

GET  /      -> HTML form (model/inverter/editor dropdowns with the same
               per-method defaults as the reference UI, prompt fields,
               image upload)
POST /edit  -> multipart form -> EditorManager.run -> inline base64 PNG
"""

from __future__ import annotations

import argparse
import base64
import html
import io
import json
import os
import sys
from email import message_from_bytes
from email.policy import HTTP
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demo.manager import METHOD_DEFAULTS, EditorManager  # noqa: E402

INVERTERS = ["diffinv", "nti", "npi", "proxnpi", "edict", "ddpminv",
             "cyclediff", "dirinv", "etainv", "regdiffinv"]
EDITORS = ["simple", "ptp", "masactrl", "pnp", "pix2pix_zero", "invedit"]

PAGE = """<!doctype html>
<html><head><title>eta-inversion-tpu demo</title>
<style>
 body {{ font-family: system-ui, sans-serif; max-width: 760px; margin: 2em auto; }}
 label {{ display: block; margin-top: .8em; font-weight: 600; }}
 input[type=text], select {{ width: 100%; padding: .4em; }}
 .row {{ display: flex; gap: 1em; }} .row > div {{ flex: 1; }}
 button {{ margin-top: 1.2em; padding: .6em 2em; font-size: 1em; }}
 img {{ max-width: 100%; margin-top: 1em; }}
 .err {{ color: #b00; white-space: pre-wrap; }}
</style></head><body>
<h2>eta-inversion-tpu &mdash; real-image editing demo</h2>
<form method="post" action="/edit" enctype="multipart/form-data">
 <div class="row">
  <div><label>Model</label><select name="model">{models}</select></div>
  <div><label>Inversion method</label><select name="inverter">{inverters}</select></div>
  <div><label>Editing method</label><select name="editor">{editors}</select></div>
 </div>
 <label>Source image (png/jpg)</label><input type="file" name="image" required>
 <label>Source prompt</label><input type="text" name="source_prompt"
   value="a cat sitting next to a mirror">
 <label>Target prompt</label><input type="text" name="target_prompt"
   value="a tiger sitting next to a mirror">
 <div class="row">
  <div><label>Steps</label><input type="text" name="steps" value="50"></div>
  <div><label>Fwd guidance (blank = method default)</label>
       <input type="text" name="gs_fwd" value=""></div>
  <div><label>Bwd guidance (blank = method default)</label>
       <input type="text" name="gs_bwd" value=""></div>
 </div>
 <button type="submit">Edit</button>
</form>
{result}
</body></html>"""


def render_page(model_default: str, result: str = "") -> bytes:
    def options(values, default=None):
        return "".join(
            f'<option value="{v}"{" selected" if v == default else ""}>{v}</option>'
            for v in values)

    return PAGE.format(
        models=options(["tiny", "tiny21", "tinyxl", "tinyv", "sd15", "sd21", "sd21v", "sdxl"], model_default),
        inverters=options(INVERTERS, "etainv"),
        editors=options(EDITORS, "ptp"),
        result=result,
    ).encode()


def parse_multipart(headers, body: bytes):
    """Multipart form -> {name: str value | bytes for files} via the stdlib
    email parser (the cgi module is deprecated)."""
    msg = message_from_bytes(
        b"Content-Type: " + headers.get("Content-Type", "").encode() +
        b"\r\nMIME-Version: 1.0\r\n\r\n" + body, policy=HTTP)
    out = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name is None:
            continue
        payload = part.get_payload(decode=True)
        if part.get_filename():
            out[name] = payload
        else:
            out[name] = payload.decode("utf-8", "replace").strip()
    return out


def build_cfg(form, image_path: str):
    """Flat dotted-key config, the same protocol the Gradio UI feeds
    EditorManager (reference demo/manager.py:12-51)."""
    inverter = form.get("inverter", "etainv")
    defaults = METHOD_DEFAULTS.get(inverter, METHOD_DEFAULTS["_default"])
    steps = int(form.get("steps") or 50)
    cfg = {
        "model.model": form.get("model", "tiny"),
        "inverter.type": inverter,
        "inverter.num_inference_steps": steps,
        "editor.type": form.get("editor", "ptp"),
        "editor.source_image": image_path,
        "editor.source_prompt": form.get("source_prompt", ""),
        "editor.target_prompt": form.get("target_prompt", ""),
    }
    for key, field in (("guidance_scale_fwd", "gs_fwd"),
                       ("guidance_scale_bwd", "gs_bwd")):
        val = form.get(field) or defaults.get(key)
        if val is not None and inverter not in ("ddpminv", "cyclediff"):
            cfg[f"inverter.{key}"] = float(val)
    return cfg


class DemoHandler(BaseHTTPRequestHandler):
    manager: EditorManager = None  # class-level, set by serve()
    model_default = "tiny"

    def _respond(self, body: bytes, status=200, ctype="text/html; charset=utf-8"):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            self._respond(render_page(self.model_default))
        else:
            self._respond(b"not found", status=404, ctype="text/plain")

    def do_POST(self):
        if self.path != "/edit":
            self._respond(b"not found", status=404, ctype="text/plain")
            return
        length = int(self.headers.get("Content-Length", "0"))
        form = parse_multipart(self.headers, self.rfile.read(length))
        try:
            import tempfile

            import numpy as np
            from PIL import Image

            with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
                Image.open(io.BytesIO(form["image"])).convert("RGB").save(f.name)
                cfg = build_cfg(form, f.name)
            try:
                res = type(self).manager.run(cfg)
            finally:
                os.unlink(f.name)  # one leaked PNG per request otherwise
            if res.get("edit_image") is None:
                raise ValueError(res.get("error", "edit failed"))
            buf = io.BytesIO()
            Image.fromarray(np.asarray(res["edit_image"])).save(buf, "PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            result = (f"<h3>Edited image</h3>"
                      f'<img src="data:image/png;base64,{b64}">')
        except Exception as e:  # surface in the page, keep serving
            result = f'<p class="err">{html.escape(f"{type(e).__name__}: {e}")}</p>'
        self._respond(render_page(self.model_default, result))

    def log_message(self, fmt, *args):  # quiet by default
        pass


def serve(port: int = 7860, model: str = "tiny", manager: EditorManager = None):
    DemoHandler.manager = manager or EditorManager()
    DemoHandler.model_default = model
    server = ThreadingHTTPServer(("127.0.0.1", port), DemoHandler)
    return server


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--model", default="tiny", choices=["tiny", "tiny21", "tinyxl", "tinyv", "sd15", "sd21", "sd21v", "sdxl"])
    args = ap.parse_args()
    server = serve(args.port, args.model)
    print(f"demo at http://127.0.0.1:{args.port}  (model default: {args.model})")
    print(json.dumps({"inverters": INVERTERS, "editors": EDITORS}))
    server.serve_forever()


if __name__ == "__main__":
    main()
