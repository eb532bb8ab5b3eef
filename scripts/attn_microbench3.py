"""On-chip microbench 3 — correctly timed (serial dependence: each iteration's
q is the previous output, so XLA cannot hoist the op out of the scan loop).

Ground truth from the bwd xprof trace (scripts/perf_trace.py): one 64x64
self-attention flash call at (BH=256, S=4096, D=40) costs 15.26 ms in-model,
plus a 1.63 ms transpose feeding it (the kt swapaxes; the head transposes fuse
into the projection dots).  Variants:

  kt-pre   — today's kernel: HBM kt transpose + NN matmul in-kernel
  NT       — k stays (BH, S, D); dot_general contracts D of both (in-register
             transpose on the MXU operand, no HBM transpose op)
Cross-attention (Sk=77): XLA materialized+edit (ptp today) vs short-K Pallas.
"""

import functools
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/eta_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from eta_inversion_tpu.ops.flash_attention import NEG_INF, flash_attention_bhsd

    LOOP = int(os.environ.get("MB_LOOP", "20"))

    def timed(name, fn, q0, *rest):
        """fn(q, *rest) -> same shape/dtype as q; chained through the scan."""
        def scanned(q0, *rest):
            def body(c, _):
                return fn(c, *rest), None
            y, _ = jax.lax.scan(body, q0, None, length=LOOP)
            return y
        jfn = jax.jit(scanned)
        t0 = time.perf_counter()
        float(np.asarray(jfn(q0, *rest)).astype(np.float32).sum())
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(jfn(q0, *rest)).astype(np.float32).sum())
        dt = (time.perf_counter() - t0) / LOOP * 1000
        print(f"  {name:42s} {dt:8.3f} ms/call   (compile {c:.1f}s)", flush=True)
        return dt

    B, H, S, D = 32, 8, 4096, 40
    BH = B * H
    rs = np.random.RandomState(0)
    # model-layout inputs as the kernel receives them after the (fused) head
    # transpose: (B, H, S, D) flattened to (BH, S, D)
    q0 = jnp.asarray(rs.randn(BH, S, D) * 0.3, jnp.bfloat16)
    k0 = jnp.asarray(rs.randn(BH, S, D) * 0.3, jnp.bfloat16)
    v0 = jnp.asarray(rs.randn(BH, S, D) * 0.3, jnp.bfloat16)
    scale = D ** -0.5
    print(f"self-attention BH={BH} S={S} D={D}")

    timed("kt-pre (today) bq=512 bk=2048",
          lambda q, k, v: flash_attention_bhsd(q, k, v, scale=scale,
                                               block_q=512, block_k=2048),
          q0, k0, v0)

    # ---- cross-attention: materialized vs short-K Pallas --------------------
    SK, SKP = 77, 128
    kc = jnp.asarray(rs.randn(BH, SK, D) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(rs.randn(BH, SK, D) * 0.3, jnp.bfloat16)
    print(f"cross-attention BH={BH} Sq={S} Sk={SK} D={D}")

    def mat_edit(q, k, v):
        # today's ptp cross path: materialize fp32 probs, edit, PV
        s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
        p = jnp.concatenate([p[:128], p[128:] * 0.5 + p[:128] * 0.5], axis=0)
        return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)

    timed("materialize+edit (ptp today)", mat_edit, q0, kc, vc)

    def xla_unmat(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)

    timed("xla no-edit", xla_unmat, q0, kc, vc)

    def kern_crossk(q_ref, kt_ref, v_ref, o_ref, *, sk, scale):
        q = q_ref[0].astype(jnp.float32) * scale   # (bq, D)
        kt = kt_ref[0].astype(jnp.float32)         # (D, SKP)
        s = jnp.dot(q, kt, preferred_element_type=jnp.float32)
        skp = s.shape[-1]
        if sk < skp:
            mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < sk
            s = jnp.where(mask, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        v = v_ref[0]
        o_ref[0] = jnp.dot(p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("sk", "scale", "block_q"))
    def cross_shortk(q, kpad, vpad, sk, scale, block_q=1024):
        bh, sq, d = q.shape
        skp = kpad.shape[1]
        kt = jnp.swapaxes(kpad, 1, 2)  # (BH, D, SKP) — tiny
        return pl.pallas_call(
            functools.partial(kern_crossk, sk=sk, scale=scale),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=(bh, sq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, d, skp), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, skp, d), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * sq * skp * d,
                bytes_accessed=(2 * bh * sq * d + 2 * bh * skp * d) * 2,
                transcendentals=bh * sq * skp),
        )(q, kt, vpad)

    kpad = jnp.pad(kc, ((0, 0), (0, SKP - SK), (0, 0)))
    vpad = jnp.pad(vc, ((0, 0), (0, SKP - SK), (0, 0)))
    for bq in (512, 1024, 2048):
        timed(f"pallas short-K bq={bq}",
              lambda q, kp, vp, bq=bq: cross_shortk(q, kp, vp, sk=SK,
                                                    scale=scale, block_q=bq),
              q0, kpad, vpad)

    # folded ptp edit: +25% rows through the short-K kernel (the extra source-
    # probability rows carrying mapped target values)
    qx = jnp.concatenate([q0, q0[128:192]], axis=0)
    timed("short-K folded rows (320 vs 256)",
          lambda q, kp, vp: cross_shortk(q, kp, vp, sk=SK, scale=scale,
                                         block_q=1024),
          qx, jnp.concatenate([kpad, kpad[128:192]], 0),
          jnp.concatenate([vpad, vpad[128:192]], 0))


if __name__ == "__main__":
    main()
