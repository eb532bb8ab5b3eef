"""Dynamic-batching serving tests (eta_inversion_tpu/serving.py + serve.py):
concurrent requests coalesce into bucketed edit_batch dispatches, results
match solo edits, padding and compatibility-grouping behave, and the HTTP
frontend round-trips an edit."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from eta_inversion_tpu import load_editor, load_inverter
from eta_inversion_tpu.serving import BatchingEditServer, EditRequest

STEPS = 3

PTP_CFG = {"is_replace_controller": True, "cross_replace_steps": 0.8,
           "self_replace_steps": 0.5}


def _images(n, seed=7):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(n, 16, 16, 3).astype("float32") * 2 - 1)


def _editor(tiny_model, name="ptp", inverter="diffinv"):
    inv = load_inverter(tiny_model, inverter, num_inference_steps=STEPS)
    return load_editor(inv, name)


def _submit_all(server, imgs, n, cfgs=None):
    futs = []
    for i in range(n):
        cfg = (cfgs[i] if cfgs else dict(PTP_CFG))
        futs.append(server.submit(EditRequest(
            imgs[i], f"a cat number {i}", f"a tiger number {i}", cfg=cfg)))
    return [f.result(timeout=600) for f in futs]


def test_coalesces_full_batch_and_matches_solo(tiny_model):
    editor = _editor(tiny_model)
    server = BatchingEditServer(editor, max_batch=4, max_wait_ms=2000,
                                buckets=(1, 2, 4))
    imgs = _images(4)
    try:
        results = _submit_all(server, imgs, 4)
    finally:
        server.shutdown()

    stats = server.stats_snapshot()
    assert stats["requests"] == 4
    assert stats["batches"] == 1, stats  # one coalesced dispatch
    assert stats["dispatch_sizes"] == {4: 1}
    assert stats["padded_slots"] == 0

    for i, res in enumerate(results):
        assert res["image"].shape[0] == 1
        solo = editor.edit(imgs[i: i + 1], f"a cat number {i}",
                           f"a tiger number {i}", cfg=dict(PTP_CFG))
        np.testing.assert_allclose(res["image"], np.asarray(solo["image"]),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"request {i}")


def test_bucket_padding(tiny_model):
    """3 requests pad up to the 4-bucket (static shapes -> one compiled
    program per bucket); results are sliced back to the real requests."""
    server = BatchingEditServer(_editor(tiny_model), max_batch=4,
                                max_wait_ms=2000, buckets=(1, 2, 4))
    try:
        results = _submit_all(server, _images(3), 3)
    finally:
        server.shutdown()
    stats = server.stats_snapshot()
    assert stats["dispatch_sizes"] == {4: 1}
    assert stats["padded_slots"] == 1
    assert len(results) == 3 and all(r is not None for r in results)


def test_incompatible_cfgs_split_batches(tiny_model):
    """Scalar ptp options must agree within a batch (editing/batched.py
    _merged_ptp_cfg) -> differing self_replace_steps dispatch separately."""
    server = BatchingEditServer(_editor(tiny_model), max_batch=4,
                                max_wait_ms=500, buckets=(1, 2, 4))
    cfgs = [dict(PTP_CFG), {**PTP_CFG, "self_replace_steps": 0.2},
            dict(PTP_CFG)]
    try:
        results = _submit_all(server, _images(3), 3, cfgs=cfgs)
    finally:
        server.shutdown()
    stats = server.stats_snapshot()
    assert stats["batches"] == 2, stats
    assert stats["dispatch_sizes"] == {1: 1, 2: 1}
    assert all(r is not None for r in results)


def test_single_request_uses_editor_edit_path(tiny_model):
    server = BatchingEditServer(_editor(tiny_model), max_batch=4,
                                max_wait_ms=10, buckets=(1, 2, 4))
    img = _images(1)
    try:
        res = server.edit(img, "a cat", "a tiger", cfg=dict(PTP_CFG),
                          timeout=600)
    finally:
        server.shutdown()
    assert server.stats_snapshot()["dispatch_sizes"] == {1: 1}
    solo = _editor(tiny_model).edit(img, "a cat", "a tiger",
                                    cfg=dict(PTP_CFG))
    np.testing.assert_allclose(res["image"], np.asarray(solo["image"]),
                               rtol=2e-4, atol=2e-4)


def test_unsupported_combo_returns_none(tiny_model):
    """Editor.edit's None contract flows through the futures (reference
    test/test_edit.py:240-242 semantics)."""
    editor = _editor(tiny_model, name="pix2pix_zero", inverter="etainv")
    editor.gen_caption = False
    server = BatchingEditServer(editor, max_batch=2, max_wait_ms=10,
                                buckets=(1, 2))
    try:
        res = server.edit(_images(1), "a cat", "a tiger", timeout=600)
    finally:
        server.shutdown()
    assert res is None


def test_http_frontend_end_to_end(tiny_model):
    import argparse
    import base64
    import io
    import json
    import urllib.request
    import uuid

    from http.server import ThreadingHTTPServer

    from PIL import Image

    import serve as serve_cli

    args = argparse.Namespace(model="tiny", inverter="diffinv", editor="ptp",
                              steps=STEPS, dtype="float32", max_batch=2,
                              max_wait_ms=10.0)
    batcher, pre, post = serve_cli.build_server(args)
    serve_cli.EditHandler.server_ctx = (batcher, pre, post)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve_cli.EditHandler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30).read())
        assert health == {"ok": True}

        rs = np.random.RandomState(0)
        buf = io.BytesIO()
        Image.fromarray((rs.rand(20, 20, 3) * 255).astype("uint8")).save(
            buf, "PNG")
        boundary = uuid.uuid4().hex
        fields = {"source_prompt": "a cat", "target_prompt": "a tiger",
                  "cfg": json.dumps(PTP_CFG)}
        body = b""
        for k, v in fields.items():
            body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                     f'name="{k}"\r\n\r\n{v}\r\n').encode()
        body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="image"; filename="in.png"\r\n'
                 "Content-Type: image/png\r\n\r\n").encode()
        body += buf.getvalue() + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/edit", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        resp = json.loads(urllib.request.urlopen(req, timeout=600).read())
        assert "image" in resp, resp
        out = Image.open(io.BytesIO(base64.b64decode(resp["image"])))
        assert out.size == (tiny_model.image_size, tiny_model.image_size)

        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/stats", timeout=30).read())
        assert stats["requests"] == 1 and stats["batches"] == 1

        # Client errors are 400s with a clear message, not 500s: missing
        # image field, undecodable image bytes, malformed cfg JSON.
        def _post(body_fields, image_bytes=None):
            b = uuid.uuid4().hex
            body = b""
            for k, v in body_fields.items():
                body += (f"--{b}\r\nContent-Disposition: form-data; "
                         f'name="{k}"\r\n\r\n{v}\r\n').encode()
            if image_bytes is not None:
                body += (f"--{b}\r\nContent-Disposition: form-data; "
                         f'name="image"; filename="in.png"\r\n'
                         "Content-Type: image/png\r\n\r\n").encode()
                body += image_bytes + b"\r\n"
            body += f"--{b}--\r\n".encode()
            req2 = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/edit", data=body,
                headers={"Content-Type":
                         f"multipart/form-data; boundary={b}"})
            try:
                urllib.request.urlopen(req2, timeout=60)
                return 200
            except urllib.error.HTTPError as e:
                return e.code

        import urllib.error
        assert _post({"source_prompt": "a"}) == 400            # no image
        assert _post({}, image_bytes=b"not-a-png") == 400      # bad image
        assert _post({"cfg": "{not json"},
                     image_bytes=buf.getvalue()) == 400        # bad JSON
    finally:
        httpd.shutdown()
        batcher.shutdown()


def test_throughput_under_concurrent_load(tiny_model):
    """Many caller threads, small max_wait: every request completes and the
    mean dispatched batch exceeds 1 (i.e. batching actually engages)."""
    server = BatchingEditServer(_editor(tiny_model), max_batch=4,
                                max_wait_ms=250, buckets=(1, 2, 4))
    imgs = _images(8)
    out = [None] * 8
    errs = []

    def call(i):
        try:
            out[i] = server.edit(imgs[i], f"cat {i}", f"tiger {i}",
                                 cfg=dict(PTP_CFG), timeout=600)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
        time.sleep(0.01)  # staggered arrivals
    for t in threads:
        t.join()
    server.shutdown()
    assert not errs
    assert all(o is not None for o in out)
    stats = server.stats_snapshot()
    assert stats["requests"] == 8
    assert stats["batches"] < 8, stats  # coalescing happened
