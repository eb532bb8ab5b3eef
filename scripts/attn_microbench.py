"""On-chip microbench: XLA vs Pallas attention at the SD shapes the bench hits.

Cases:
  self1024  — 32x32 self-attention (BH=256, S=1024, D=40): today's XLA path
              (min_flash_seq=2048 keeps flash off) vs the flash kernel.
  cross     — cross-attention Sk=77 (BH=256, Sq in {4096, 1024}, D=40):
              XLA two-einsum path vs a fused short-K Pallas kernel that keeps
              the score tile in VMEM.

Axon relay dispatch is ~0.8 ms/call, so every variant loops inside one jit
via lax.scan (ROADMAP round-1 note).
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
    from eta_inversion_tpu.ops.flash_attention import (
        NEG_INF,
        flash_attention_bhsd,
        xla_attention,
    )

    LOOP = int(os.environ.get("MB_LOOP", "20"))

    def timed(name, fn, *args):
        def scanned(*a):
            def body(c, _):
                out = fn(*a[:-1], c)
                # keep a data dependence so the scan can't be collapsed
                return c + 1e-6 * out[..., :1, :1].astype(c.dtype).sum(), None
            y, _ = jax.lax.scan(body, a[-1], None, length=LOOP)
            return y
        jfn = jax.jit(scanned)
        seed = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, seed)))
        print(f"  {name:44s} compile+first {time.perf_counter() - t0:6.1f}s", flush=True)
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, seed)))
        dt = (time.perf_counter() - t0) / LOOP * 1000
        print(f"  {name:44s} {dt:8.3f} ms/call", flush=True)
        return dt

    rs = np.random.RandomState(0)

    # ---------------- self-attention at 32x32 (S=1024) ----------------------
    BH, S, D = 256, 1024, 40
    q = jnp.asarray(rs.randn(BH // 8, 8, S, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(BH // 8, 8, S, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(BH // 8, 8, S, D), jnp.bfloat16)
    scale = D ** -0.5
    print(f"self-attention BH={BH} S={S} D={D}")
    timed("xla (today's path)", lambda q, k, v, _s: xla_attention(q, k, v, scale), q, k, v)

    qf = q.reshape(BH, S, D)
    kf = k.reshape(BH, S, D)
    vf = v.reshape(BH, S, D)
    for bq, bk in ((512, 1024), (512, 512), (256, 1024), (1024, 1024)):
        timed(f"flash bq={bq} bk={bk}",
              lambda q, k, v, _s, bq=bq, bk=bk: flash_attention_bhsd(
                  q, k, v, scale=scale, block_q=bq, block_k=bk), qf, kf, vf)

    # ---------------- cross-attention Sk=77 ---------------------------------
    def crossk_kernel(q_ref, kt_ref, v_ref, o_ref, *, sk, scale):
        qq = q_ref[0].astype(jnp.float32) * scale           # (bq, D)
        kt = kt_ref[0].astype(jnp.float32)                  # (D, SKP)
        s = jnp.dot(qq, kt, preferred_element_type=jnp.float32)
        skp = s.shape[-1]
        if sk < skp:
            mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < sk
            s = jnp.where(mask, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        vv = v_ref[0]                                        # (SKP, D)
        o_ref[0] = jnp.dot(p.astype(vv.dtype), vv,
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("sk", "scale", "block_q"))
    def cross_shortk(q, kpad_t, vpad, sk, scale, block_q):
        bh, sq, d = q.shape
        skp = vpad.shape[1]
        grid = (bh, sq // block_q)
        return pl.pallas_call(
            functools.partial(crossk_kernel, sk=sk, scale=scale),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=grid,
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
                bytes_accessed=(2 * bh * sq * d + 2 * bh * skp * d) * q.dtype.itemsize,
                transcendentals=bh * sq * skp,
            ),
        )(q, kpad_t, vpad)

    SK, SKP = 77, 128
    for SQ in (4096, 1024):
        qc = jnp.asarray(rs.randn(BH // 8, 8, SQ, D), jnp.bfloat16)
        kc = jnp.asarray(rs.randn(BH // 8, 8, SK, D), jnp.bfloat16)
        vc = jnp.asarray(rs.randn(BH // 8, 8, SK, D), jnp.bfloat16)
        print(f"cross-attention BH={BH} Sq={SQ} Sk={SK} D={D}")
        timed("xla (today's path)",
              lambda q, k, v, _s: xla_attention(q, k, v, scale), qc, kc, vc)

        qcf = qc.reshape(BH, SQ, D)
        kpad = jnp.pad(kc.reshape(BH, SK, D), ((0, 0), (0, SKP - SK), (0, 0)))
        kpad_t = jnp.swapaxes(kpad, 1, 2)  # (BH, D, SKP)
        vpad = jnp.pad(vc.reshape(BH, SK, D), ((0, 0), (0, SKP - SK), (0, 0)))
        for bq in (512, 1024, 2048):
            if SQ % bq:
                continue
            timed(f"pallas short-K bq={bq}",
                  lambda q, kt, v, _s, bq=bq: cross_shortk(
                      q, kt, v, sk=SK, scale=scale, block_q=bq), qcf, kpad_t, vpad)


if __name__ == "__main__":
    main()
