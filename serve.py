"""Production edit-serving CLI: dynamic-batching HTTP frontend.

One deployment serves one (model, inverter, editor) triple — concurrent
requests are coalesced into bucketed pair-batched device programs by
eta_inversion_tpu/serving.py (the demo, by contrast, runs one edit per click
like the reference's Gradio app, /root/reference/demo/run.py).

    python serve.py --model sd15 --inverter etainv --editor ptp \
        --steps 50 --max_batch 8 --max_wait_ms 50 --port 8000

API:
  POST /v1/edit   multipart form: image (png/jpg file), source_prompt,
                  target_prompt, optional cfg / inv_cfg (JSON strings)
                  -> {"image": <base64 png>, "latency_s": ...}
  GET  /v1/stats  -> batching stats (requests, batches, mean batch, padding)
  GET  /healthz   -> 200 once the model is loaded
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from demo.web import parse_multipart  # noqa: E402  (stdlib multipart parser)


def build_server(args):
    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.models import load_diffusion_model
    from eta_inversion_tpu.serving import BatchingEditServer

    model, (pre, post) = load_diffusion_model(args.model, dtype=args.dtype)
    inverter = load_inverter(model, args.inverter,
                             num_inference_steps=args.steps)
    editor = load_editor(inverter, args.editor)
    buckets = tuple(sorted({1, 2, 4, args.max_batch}))
    server = BatchingEditServer(editor, max_batch=args.max_batch,
                                max_wait_ms=args.max_wait_ms, buckets=buckets,
                                sync_dispatch=getattr(args, "sync_dispatch",
                                                      False))
    return server, pre, post


class EditHandler(BaseHTTPRequestHandler):
    server_ctx = None  # (BatchingEditServer, pre, post), set by main()

    def _json(self, obj, status=200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        batcher, _, _ = type(self).server_ctx
        if self.path == "/healthz":
            self._json({"ok": True})
        elif self.path == "/v1/stats":
            self._json(batcher.stats_snapshot())
        else:
            self._json({"error": "not found"}, status=404)

    def do_POST(self):
        if self.path != "/v1/edit":
            self._json({"error": "not found"}, status=404)
            return
        batcher, pre, post = type(self).server_ctx
        length = int(self.headers.get("Content-Length", "0"))
        form = parse_multipart(self.headers, self.rfile.read(length))

        # Client-input validation: missing/malformed fields are 400s with a
        # clear message, never 500s echoing a raw traceback.
        from PIL import Image

        if not form.get("image"):
            self._json({"error": "missing required form field 'image'"},
                       status=400)
            return
        try:
            img = Image.open(io.BytesIO(form["image"])).convert("RGB")
        except Exception:
            self._json({"error": "field 'image' is not a decodable image"},
                       status=400)
            return
        cfgs = {}
        for key in ("cfg", "inv_cfg"):
            if form.get(key):
                try:
                    cfgs[key] = json.loads(form[key])
                except (json.JSONDecodeError, UnicodeDecodeError):
                    self._json({"error": f"field '{key}' is not valid JSON"},
                               status=400)
                    return

        try:
            t0 = time.monotonic()
            arr = pre(img)  # NHWC [-1,1] at the model's native size
            res = batcher.edit(
                arr, form.get("source_prompt", ""),
                form.get("target_prompt", ""),
                cfg=cfgs.get("cfg"), inv_cfg=cfgs.get("inv_cfg"))
            if res is None:
                self._json({"error": "unsupported inverter/editor combo"},
                           status=422)
                return
            png = io.BytesIO()
            Image.fromarray(post(res["image"])).save(png, "PNG")
            self._json({
                "image": base64.b64encode(png.getvalue()).decode(),
                "latency_s": round(time.monotonic() - t0, 4),
            })
        except Exception as e:
            self._json({"error": f"internal error: {type(e).__name__}"},
                       status=500)

    def log_message(self, fmt, *args):
        pass


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="sd15")
    ap.add_argument("--inverter", default="etainv")
    ap.add_argument("--editor", default="ptp")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=50.0)
    ap.add_argument("--sync_dispatch", action="store_true",
                    help="drain each batch on-device before dispatching the "
                    "next (required under the axon relay, whose HBM fills if "
                    "two 50-step edit programs are in flight; default off = "
                    "pipelined throughput mode)")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    batcher, pre, post = build_server(args)
    EditHandler.server_ctx = (batcher, pre, post)
    httpd = ThreadingHTTPServer(("127.0.0.1", args.port), EditHandler)
    print(f"serving {args.model}/{args.inverter}/{args.editor} "
          f"at http://127.0.0.1:{args.port} (max_batch={args.max_batch})")
    try:
        httpd.serve_forever()
    finally:
        batcher.shutdown()


if __name__ == "__main__":
    main()
