"""Tracing / profiling (SURVEY.md §5.1 rebuild note: first-class profiling
replacing the reference's ad-hoc wall-clock prints, edit_image.py:113-130).

`phase_timer` records per-phase wall times (with device sync);
`trace` wraps `jax.profiler` to dump an XPlane trace viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device completion so
    times reflect actual compute, not dispatch."""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                try:
                    import jax

                    jax.block_until_ready(sync)
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:30s} {t:8.3f}s total  {t / n * 1000:8.1f}ms/call  x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = "/tmp/jax-trace"):
    """jax.profiler trace context (open with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


# v5e per-chip peaks (bf16 MXU / HBM); override for other targets
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BW = 819e9


def lowered_cost(fn, *args, **kwargs) -> Dict[str, float]:
    """HLO cost model WITHOUT backend compilation (jit(fn).lower(...).cost_analysis()).

    Cheap enough to run inside bench.py per row (tracing only, seconds even
    for the SDXL UNet — no XLA compile, no device).  Args may be
    jax.ShapeDtypeStruct trees.  NOTE: loop bodies (lax.scan/while) are
    counted ONCE, not multiplied by trip count — callers must scale per-step
    costs by their step counts themselves (verified empirically; this is why
    bench.py costs one UNet apply and multiplies by the scan length)."""
    import jax

    ca = jax.jit(fn).lower(*args, **kwargs).cost_analysis()
    if ca is None:
        # the axon relay backend lowers remotely and returns no client-side
        # cost model — re-lower against the CPU target (the HLO cost model is
        # platform-independent at this level: same graph, same flop count).
        # Pallas TPU kernels refuse to lower for CPU, so force the dispatcher
        # onto the XLA attention path (identical matmul FLOPs).
        from ..ops.flash_attention import force_xla_attention

        with jax.default_device(jax.devices("cpu")[0]), force_xla_attention():
            ca = jax.jit(fn).lower(*args, **kwargs).cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if ca is None:
        ca = {}
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def cost_analysis(fn, *args, **kwargs) -> Dict[str, float]:
    """XLA's compiled cost model for `jit(fn)(*args)`: flops, bytes accessed,
    arithmetic intensity, and roofline-minimum runtime."""
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    out = {"flops": flops, "bytes": byts}
    if byts:
        out["arith_intensity"] = flops / byts
    out["roofline_ms"] = max(flops / V5E_PEAK_FLOPS,
                             byts / V5E_PEAK_BW) * 1e3
    return out


def format_cost(name: str, cost: Dict[str, float],
                measured_ms: Optional[float] = None) -> str:
    s = (f"{name:24s} {cost['flops'] / 1e12:8.2f} TFLOP  "
         f"{cost['bytes'] / 1e9:8.2f} GB  "
         f"AI={cost.get('arith_intensity', 0):6.1f}  "
         f"roofline>={cost['roofline_ms']:8.2f} ms")
    if measured_ms is not None:
        s += (f"  measured={measured_ms:8.2f} ms "
              f"({cost['roofline_ms'] / measured_ms * 100:4.1f}% of roofline)")
    return s
