"""Dynamic-batching edit server: the production-serving tier.

The reference serves edits one at a time through its Gradio demo
(/root/reference/demo/manager.py:160-210 runs a single
``editor.edit_image``) — there is no concurrent-request story.  On TPU the
economic unit is the *batched* compiled program (editing/batched.py amortizes
per-step fixed costs across B pairs), so the serving tier's job is to turn an
arbitrary arrival process into full batches without unbounded latency:

- Requests are coalesced for at most ``max_wait_ms`` or until ``max_batch``
  accumulate, whichever first (classic dynamic batching).
- Batches are padded UP to a fixed bucket size (default 1/2/4/8) by repeating
  the last request, so every dispatch reuses one of a handful of compiled
  programs — XLA recompiles on any shape change, so free-size batches would
  compile-storm the server.
- Requests whose scalar ptp options disagree cannot share a ptp batch
  (editing/batched.py::_merged_ptp_cfg asserts equality); the batcher groups
  by a compatibility key and flushes groups independently.

Single-tenant by design: exactly one dispatch thread touches the device
(mirrors the one-process-per-chip rule), while the HTTP/caller threads only
block on futures.  Throughput scales with the "data" mesh axis underneath
(parallel/sharding.py) without any change here.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

# scalar ptp options that must agree across a batch (editing/batched.py)
_SCALAR_CFG_KEYS = ("is_replace_controller", "cross_replace_steps",
                    "self_replace_steps")


@dataclass(eq=False)
class EditRequest:
    """One edit: image is HWC or NHWC float in [-1, 1] (StablePreprocess
    output); cfg/inv_cfg follow Editor.edit semantics.

    ``eq=False``: requests have identity semantics.  A generated ``__eq__``
    would compare the image arrays elementwise (ambiguous-truth ValueError
    the moment ``list.remove`` scans past a non-group member)."""

    image: Any
    source_prompt: str
    target_prompt: str
    cfg: Optional[Dict[str, Any]] = None
    inv_cfg: Optional[Dict[str, Any]] = None
    future: Future = field(default_factory=Future)
    enqueued_at: float = field(default_factory=time.monotonic)

    def compat_key(self) -> Tuple:
        cfg = self.cfg or {}
        return tuple((k, cfg.get(k)) for k in _SCALAR_CFG_KEYS)


class BatchingEditServer:
    """Coalesce concurrent edit requests into bucketed ``edit_batch`` calls.

    Usage::

        server = BatchingEditServer(editor, max_batch=8, max_wait_ms=50)
        fut = server.submit(EditRequest(image, "a cat", "a tiger"))
        result = fut.result()      # {"image", "latent", ...} sliced to B=1
        server.shutdown()
    """

    def __init__(self, editor, max_batch: int = 8, max_wait_ms: float = 50.0,
                 buckets: Sequence[int] = (1, 2, 4, 8),
                 sync_dispatch: bool = False):
        self.editor = editor
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        # sync_dispatch: block the dispatch thread until the group's program
        # has finished on-device before taking the next group.  JAX dispatch
        # is asynchronous, so by default batch N+1's edit program can be in
        # flight while batch N's outputs are still unfetched — the throughput
        # mode.  Under the axon relay two 50-step edit programs in flight
        # exhaust HBM (completed-dispatch chip buffers are not released while
        # a second program is queued; same constraint as eval.py --inflight 0).
        self.sync_dispatch = bool(sync_dispatch)
        self.buckets = sorted(set(int(b) for b in buckets))
        assert self.buckets and self.buckets[0] >= 1
        assert self.max_batch <= self.buckets[-1], \
            "max_batch must be servable by the largest bucket"
        self._queue: List[EditRequest] = []
        self._lock = threading.Lock()
        self._wakeup = threading.Condition(self._lock)
        self._closed = False
        # dispatch_sizes is a per-bucket counter (bucket -> count), not a
        # per-dispatch log: a long-running server must not grow its stats.
        self.stats: Dict[str, Any] = {
            "requests": 0, "batches": 0, "padded_slots": 0,
            "dispatch_sizes": {},
        }
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        name="edit-batcher", daemon=True)
        self._thread.start()

    # ---- client side ----------------------------------------------------

    def submit(self, req: EditRequest) -> Future:
        with self._wakeup:
            if self._closed:
                raise RuntimeError("server is shut down")
            self._queue.append(req)
            self.stats["requests"] += 1
            self._wakeup.notify()
        return req.future

    def edit(self, image, source_prompt: str, target_prompt: str,
             cfg: Optional[Dict[str, Any]] = None,
             inv_cfg: Optional[Dict[str, Any]] = None,
             timeout: Optional[float] = None) -> Optional[Dict[str, Any]]:
        """Blocking convenience wrapper with Editor.edit's signature."""
        fut = self.submit(EditRequest(image, source_prompt, target_prompt,
                                      cfg=cfg, inv_cfg=inv_cfg))
        return fut.result(timeout=timeout)

    def shutdown(self, wait: bool = True) -> None:
        with self._wakeup:
            self._closed = True
            self._wakeup.notify()
        if wait:
            self._thread.join()

    # ---- dispatch side ---------------------------------------------------

    def _take_group(self) -> Optional[List[EditRequest]]:
        """Block until work exists, coalesce up to max_wait/max_batch, then
        return the oldest request's compatibility group (FIFO fairness)."""
        with self._wakeup:
            while not self._queue and not self._closed:
                self._wakeup.wait()
            if not self._queue:
                return None  # closed and drained
            deadline = self._queue[0].enqueued_at + self.max_wait_s
            while (len(self._queue) < self.max_batch
                   and not self._closed):
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._wakeup.wait(timeout=remaining)
            key = self._queue[0].compat_key()
            group = [r for r in self._queue if r.compat_key() == key]
            group = group[: self.max_batch]
            taken = {id(r) for r in group}
            self._queue = [r for r in self._queue if id(r) not in taken]
            return group

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _dispatch_loop(self) -> None:
        # The whole body is guarded: an exception escaping this loop would
        # kill the single dispatch thread and strand every queued future.
        while True:
            group: Optional[List[EditRequest]] = None
            try:
                group = self._take_group()
                if group is None:
                    return
                self._run_group(group)
            except Exception as exc:
                for r in group or ():
                    if not r.future.done():
                        r.future.set_exception(exc)
                if group is None:
                    # _take_group itself failed: the queue state is suspect —
                    # fail everything queued rather than hang callers forever.
                    with self._lock:
                        stranded, self._queue = self._queue, []
                    for r in stranded:
                        if not r.future.done():
                            r.future.set_exception(exc)

    def _run_group(self, group: List[EditRequest]) -> None:
        import jax.numpy as jnp

        from .editing.batched import edit_batch

        n = len(group)
        bucket = self._bucket(n)
        reqs = list(group) + [group[-1]] * (bucket - n)  # pad w/ repeats
        with self._lock:
            self.stats["batches"] += 1
            self.stats["padded_slots"] += bucket - n
            sizes = self.stats["dispatch_sizes"]
            sizes[bucket] = sizes.get(bucket, 0) + 1

        images = jnp.concatenate(
            [jnp.asarray(r.image)[None] if jnp.asarray(r.image).ndim == 3
             else jnp.asarray(r.image) for r in reqs], axis=0)
        if bucket == 1:
            res = self.editor.edit(images, reqs[0].source_prompt,
                                   reqs[0].target_prompt, cfg=reqs[0].cfg,
                                   inv_cfg=reqs[0].inv_cfg)
        else:
            res = edit_batch(self.editor, images,
                             [r.source_prompt for r in reqs],
                             [r.target_prompt for r in reqs],
                             cfgs=[r.cfg for r in reqs],
                             inv_cfgs=[r.inv_cfg for r in reqs])
        if res is not None and self.sync_dispatch:
            # Force completion by fetching one scalar (block_until_ready is
            # unreliable under axon); the full arrays stay on device so the
            # futures still get device slices and the uint8 fast path.
            import numpy as _np
            _np.asarray(res["image"][0, 0, 0])
        for i, r in enumerate(group):
            if res is None:  # unsupported combo — Editor.edit's None contract
                r.future.set_result(None)
            else:
                # Keep device-array slices: StablePostProc's fast path does
                # the uint8 cast on-device before the host fetch, and a
                # blocking fp32 fetch here would serialize the dispatch
                # thread against HTTP encoding.
                r.future.set_result({k: v[i: i + 1] for k, v in res.items()})

    # ---- introspection ---------------------------------------------------

    def stats_snapshot(self) -> Dict[str, Any]:
        with self._lock:
            s = dict(self.stats)
            s["dispatch_sizes"] = dict(s["dispatch_sizes"])
            s["queue_depth"] = len(self._queue)
            if s["batches"]:
                s["mean_batch"] = s["requests"] / s["batches"]
            return s
