"""On-chip probe: multi-head flash kernel consuming the PACKED (B, S, H*D)
projection layout directly, vs the production path (per-head (BH, S, D) kernel
plus its materialized q/v transposes and output merge).

Motivation (ROADMAP round-3 roofline): 7.7 ms/step of the flagship bwd step is
layout glue — q/v (B,S,H,D)->(B,H,S,D) transposes, the kt precompute, and the
output merge — forced materialized because pallas_call cannot fuse them the way
XLA fuses transposes into einsums.  A kernel that takes packed q/v and slices
heads in VMEM (static lane slices at d-multiples) would keep only the kt
transpose.  Risk probed here: Mosaic relayout cost of 40-lane slices at
non-128-aligned offsets.

Times END-TO-END from the packed (B, S, H*D) bf16 tensors, 8 chained calls in
one jit (axon relay overhead; chaining defeats LICM/DCE).
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

    NEG_INF = -1e30
    B, H, S, D = 32, 8, 4096, 40
    scale = D ** -0.5
    LOOPS = 8

    # ------------------------------------------------ production per-head path
    def prod_kernel(q_ref, kt_ref, v_ref, o_ref, *, block_k, scale):
        q = q_ref[0].astype(jnp.float32) * scale
        bq, d = q.shape
        seq_k = v_ref.shape[1]
        num_kb = seq_k // block_k

        def body(kb, carry):
            acc, m_prev, l_prev = carry
            kt = kt_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
            v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
            s = jnp.dot(q, kt, preferred_element_type=jnp.float32)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        acc = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    def prod_flash(q, kt, v, *, block_q, block_k):
        bh, sq, d = q.shape
        sk = v.shape[1]
        return pl.pallas_call(
            functools.partial(prod_kernel, block_k=block_k, scale=scale),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=(bh, sq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, d, sk), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * sq * sk * d,
                bytes_accessed=(bh * sq * d * 4 + bh * sk * d * 4),
                transcendentals=bh * sq * sk),
        )(q, kt, v)

    def pre_split(x):
        return x.reshape(B, S, H, D).transpose(0, 2, 1, 3).reshape(B * H, S, D)

    def post_merge(o):
        return o.reshape(B, H, S, D).transpose(0, 2, 1, 3).reshape(B, S, H * D)

    def v0_production(q, k, v):
        qf, kf, vf = pre_split(q), pre_split(k), pre_split(v)
        kt = jnp.swapaxes(kf, 1, 2)
        return post_merge(prod_flash(qf, kt, vf, block_q=512, block_k=2048))

    # ------------------------------------------------- multi-head packed path
    def mh_kernel(q_ref, kt_ref, v_ref, o_ref, *, block_k, scale, heads, d):
        qa = q_ref[0]                             # (bq, H*D) bf16
        bq = qa.shape[0]
        seq_k = v_ref.shape[1]
        num_kb = seq_k // block_k

        for h in range(heads):
            q = qa[:, h * d:(h + 1) * d].astype(jnp.float32) * scale  # lane slice

            def body(kb, carry, h=h, q=q):
                acc, m_prev, l_prev = carry
                kt = kt_ref[0, h * d:(h + 1) * d,
                            pl.ds(kb * block_k, block_k)].astype(jnp.float32)
                v = v_ref[0, pl.ds(kb * block_k, block_k),
                          h * d:(h + 1) * d].astype(jnp.float32)
                s = jnp.dot(q, kt, preferred_element_type=jnp.float32)
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * alpha + jnp.dot(p, v,
                                            preferred_element_type=jnp.float32)
                return acc, m_new, l_new

            acc = jnp.zeros((bq, d), jnp.float32)
            m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
            l0 = jnp.zeros((bq, 1), jnp.float32)
            acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
            o_ref[0, :, h * d:(h + 1) * d] = (acc / l).astype(o_ref.dtype)

    def v8_multihead(q, k, v, *, block_q=512, block_k=2048):
        kt = jnp.swapaxes(k, 1, 2)               # (B, H*D, S) — the one transpose
        hd = H * D
        return pl.pallas_call(
            functools.partial(mh_kernel, block_k=block_k, scale=scale,
                              heads=H, d=D),
            out_shape=jax.ShapeDtypeStruct((B, S, hd), q.dtype),
            grid=(B, S // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, hd, S), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * S * S * D,
                bytes_accessed=(B * S * hd * 4) * 2,
                transcendentals=B * H * S * S),
        )(q, kt, v)

    variants = {
        "v0_production_e2e": v0_production,
        "v8_mh_bq512_bk2048": v8_multihead,
        "v8_mh_bq256_bk2048":
            lambda q, k, v: v8_multihead(q, k, v, block_q=256),
        "v8_mh_bq512_bk1024":
            lambda q, k, v: v8_multihead(q, k, v, block_k=1024),
        "v8_mh_bq512_bk4096":
            lambda q, k, v: v8_multihead(q, k, v, block_k=4096),
    }

    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, S, H * D).astype(np.float32) * 0.1,
                     jnp.bfloat16)

    ref = None
    for name, fn in variants.items():
        def loop(x, fn=fn):
            def body(c, _):
                o = fn(c, c * 0.5, c * 0.25)
                return o.astype(c.dtype) * 0.999 + c * 0.001, None
            y, _ = jax.lax.scan(body, x, None, length=LOOPS)
            return y
        jfn = jax.jit(loop)
        try:
            t0 = time.perf_counter()
            out = jfn(x0)
            s0 = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            s0 = float(np.asarray(jnp.sum(jfn(x0).astype(jnp.float32))))
            dt = (time.perf_counter() - t0) / LOOPS
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(np.asarray(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32)))))
            print(f"{name:24s} {dt * 1000:8.2f} ms/call  (compile {tc:.0f}s, "
                  f"sum={s0:.1f}, maxdiff_vs_v0={err:.5f})", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
