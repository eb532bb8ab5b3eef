"""On-chip sweep of flash-attention kernel variants at the SD bwd shape
(B=32, H=8, S=4096, D=40).  Times END-TO-END from the packed (B, S, H*D)
projection layout — including the reshape/transpose/pad surroundings the UNet
pays — so wins here translate directly to the bench.

Each variant loops 8 chained calls inside one jit (the axon relay has
~0.8 ms/dispatch; chaining also defeats DCE).
"""

import functools
import os
import sys
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

    def kernel(q_ref, kt_ref, v_ref, o_ref, *, block_k, scale, mm_bf16):
        q = q_ref[0].astype(jnp.float32) * scale
        bq, d = q.shape
        seq_k = v_ref.shape[1]
        num_kb = seq_k // block_k
        qm = q.astype(jnp.bfloat16) if mm_bf16 else q

        def body(kb, carry):
            acc, m_prev, l_prev = carry
            kt = kt_ref[0, :, pl.ds(kb * block_k, block_k)]
            v = v_ref[0, pl.ds(kb * block_k, block_k), :]
            if mm_bf16:
                s = jnp.dot(qm, kt.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            else:
                s = jnp.dot(q, kt.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if mm_bf16:
                pv = jnp.dot(p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            else:
                pv = jnp.dot(p, v.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
            acc = acc * alpha + pv
            return acc, m_new, l_new

        acc = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    def flash(q, kt, v, *, block_q, block_k, mm_bf16):
        bh, sq, d = q.shape
        sk = v.shape[1]
        grid = (bh, sq // block_q)
        return pl.pallas_call(
            functools.partial(kernel, block_k=block_k, scale=scale,
                              mm_bf16=mm_bf16),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, d, sk), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * sq * sk * d,
                bytes_accessed=(bh * sq * d * 4 + bh * sk * d * 4),
                transcendentals=bh * sq * sk),
        )(q, kt, v)

    # ---- end-to-end variants: (B, S, H*D) bf16 in -> (B, S, H*D) out
    def pre_split(x):  # packed -> (BH, S, D)
        return x.reshape(B, S, H, D).transpose(0, 2, 1, 3).reshape(B * H, S, D)

    def post_merge(o):  # (BH, S, D) -> packed
        return o.reshape(B, H, S, D).transpose(0, 2, 1, 3).reshape(B, S, H * D)

    def v_current(x, block_q=512, block_k=1024, mm_bf16=False, dpad=128):
        q = pre_split(x)
        k = pre_split(x * 0.5)
        v = pre_split(x * 0.25)
        if dpad and dpad != D:
            pad = [(0, 0), (0, 0), (0, dpad - D)]
            q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        kt = jnp.swapaxes(k, 1, 2)
        o = flash(q, kt, v, block_q=block_q, block_k=block_k, mm_bf16=mm_bf16)
        if dpad and dpad != D:
            o = o[..., :D]
        return post_merge(o)

    variants = {
        "v0_current_pad128":
            lambda x: v_current(x),
        "v1_pad128_mmbf16":
            lambda x: v_current(x, mm_bf16=True),
        "v2_pad128_bk2048":
            lambda x: v_current(x, block_k=2048),
        "v3_dnative":
            lambda x: v_current(x, dpad=None),
        "v4_dnative_bk2048":
            lambda x: v_current(x, block_k=2048, dpad=None),
        "v5_dnative_mmbf16_bk2048":
            lambda x: v_current(x, block_k=2048, mm_bf16=True, dpad=None),
        "v6_dnative_mmbf16":
            lambda x: v_current(x, mm_bf16=True, dpad=None),
        "v7_dnative_mmbf16_bq256":
            lambda x: v_current(x, block_q=256, mm_bf16=True, dpad=None),
    }

    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, S, H * D).astype(np.float32) * 0.1,
                     jnp.bfloat16)

    ref = None
    for name, fn in variants.items():
        def loop(x, fn=fn):
            def body(c, _):
                return fn(c).astype(c.dtype) * 0.999 + c * 0.001, None
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
            print(f"{name:28s} {dt * 1000:8.2f} ms/call  (compile {tc:.0f}s, "
                  f"sum={s0:.1f}, maxdiff_vs_v0={err:.5f})", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
