"""Experiment-level work pool.

Counterpart of /root/reference/utils/device_pool.py (the reference's only
multi-device mechanism: one process per experiment pinned by
CUDA_VISIBLE_DEVICES).  On TPU the per-sample work is batched onto the mesh
instead (parallel/sharding.py); this pool survives for (a) debugging (inline
execution), and (b) partitioning independent experiment grids across *hosts*
(DCN level — experiments share no tensors, only result files, SURVEY.md §2.12).
"""

from __future__ import annotations

import os
from multiprocessing import Process
from queue import Empty, Queue
from threading import Lock, Thread
from typing import Dict, List, Optional, Sequence


def _worker(device: str, procs: Queue, lk: Lock) -> None:
    while True:
        with lk:
            try:
                proc = procs.get(block=False)
            except Empty:
                return
            # pin the child's visible device before it starts
            os.environ["JAX_DEFAULT_DEVICE_IDX"] = device
            proc.start()
        proc.join()


class DevicePool:
    """Run a list of job specs ({"target": fn, "args": ...}) either inline (no
    devices — reference's debug path) or one process per job per device."""

    def __init__(self, devices: Optional[Sequence[str]] = None):
        self.devices = list(devices) if devices is not None else []

    def run(self, funcs: List[Dict]) -> None:
        procs: Queue = Queue()
        for func in funcs:
            procs.put(Process(**func))

        if len(self.devices) == 0:
            while not procs.empty():
                proc = procs.get(block=False)
                proc._target(*proc._args, **proc._kwargs)
            return

        lk = Lock()
        workers = [Thread(target=_worker, args=(d, procs, lk)) for d in self.devices]
        for w in workers:
            w.start()
        for w in workers:
            w.join()


def partition_grid(cfgs: List[Dict], host_id: int, num_hosts: int) -> List[Dict]:
    """DCN-level partitioning of an experiment grid across hosts (round-robin;
    experiments are independent so no tensor traffic is needed)."""
    return [c for i, c in enumerate(cfgs) if i % num_hosts == host_id]
