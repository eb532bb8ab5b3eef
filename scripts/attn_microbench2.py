"""On-chip microbench 2: self-attention kernel variants at the SD 64x64 shape
(BH=256, S=4096, D=40) — the five layers that cost ~107 ms of every 266 ms
backward step.

Variants:
  current      — repo kernel (fori_loop over k blocks, fp32 matmul inputs)
  bf16mm       — same loop, matmuls with bf16 inputs (scale folded pre-kernel)
  kgrid        — k blocks moved into the pallas grid with VMEM scratch
                 accumulators (lets Mosaic software-pipeline DMA/MXU/VPU)
  kgrid+bf16   — both
  official     — jax.experimental.pallas.ops.tpu.flash_attention
Plus the materialized-probs path (what ptp cross layers pay today) at the
cross shape for the value-folding estimate.
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
    )

    LOOP = int(os.environ.get("MB_LOOP", "20"))

    def timed(name, fn, *args):
        def scanned(*a):
            def body(c, _):
                out = fn(*a[:-1], c)
                return c + 1e-6 * out[..., :1, :1].astype(c.dtype).sum(), None
            y, _ = jax.lax.scan(body, a[-1], None, length=LOOP)
            return y
        jfn = jax.jit(scanned)
        seed = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, seed)))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, seed)))
        dt = (time.perf_counter() - t0) / LOOP * 1000
        print(f"  {name:40s} {dt:8.3f} ms/call   (compile {c:.1f}s)", flush=True)
        return dt

    BH, S, D = 256, 4096, 40
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(BH, S, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(BH, S, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(BH, S, D), jnp.bfloat16)
    scale = D ** -0.5
    print(f"self-attention BH={BH} S={S} D={D}")

    timed("current bq=512 bk=2048",
          lambda q, k, v, _s: flash_attention_bhsd(q, k, v, scale=scale,
                                                   block_q=512, block_k=2048),
          q, k, v)

    # ---- bf16 matmul inputs, same structure --------------------------------
    def kern_bf16(q_ref, kt_ref, v_ref, o_ref, *, block_k):
        qq = q_ref[0]  # bf16, scale pre-folded
        bq, d = qq.shape
        seq_k = v_ref.shape[1]

        def body(kb, carry):
            acc, m_prev, l_prev = carry
            kt = kt_ref[0, :, pl.ds(kb * block_k, block_k)]
            vv = v_ref[0, pl.ds(kb * block_k, block_k), :]
            s = jnp.dot(qq, kt, preferred_element_type=jnp.float32)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p.astype(vv.dtype), vv,
                                        preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        acc = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc, _, l = jax.lax.fori_loop(0, seq_k // block_k, body, (acc, m0, l0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
    def flash_bf16(q, k, v, block_q=512, block_k=2048):
        bh, sq, d = q.shape
        kt = jnp.swapaxes(k, 1, 2)
        return pl.pallas_call(
            functools.partial(kern_bf16, block_k=block_k),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=(bh, sq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, d, sq), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, sq, d), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * sq * sq * d,
                bytes_accessed=4 * bh * sq * d * 2,
                transcendentals=bh * sq * sq),
        )(q, kt, v)

    qs = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    timed("bf16mm bq=512 bk=2048",
          lambda qs, k, v, _s: flash_bf16(qs, k, v), qs, k, v)

    # ---- k in the grid with scratch accumulators ---------------------------
    def kern_kgrid(q_ref, kt_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                   *, nk, bf16mm):
        kb = pl.program_id(2)

        @pl.when(kb == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        if bf16mm:
            qq = q_ref[0]
            kt = kt_ref[0]
        else:
            qq = q_ref[0].astype(jnp.float32)
            kt = kt_ref[0].astype(jnp.float32)
        s = jnp.dot(qq, kt, preferred_element_type=jnp.float32)
        m_prev, l_prev, acc = m_ref[...], l_ref[...], acc_ref[...]
        m_cur = jnp.max(s, axis=-1)[:, None]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        vv = v_ref[0]
        acc = acc * alpha + jnp.dot(p.astype(vv.dtype), vv,
                                    preferred_element_type=jnp.float32)
        m_ref[...] = m_new
        l_ref[...] = l_prev * alpha + jnp.sum(p, axis=-1)[:, None]
        acc_ref[...] = acc

        @pl.when(kb == nk - 1)
        def _done():
            o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("block_q", "block_k", "bf16mm"))
    def flash_kgrid(q, k, v, block_q=512, block_k=1024, bf16mm=False):
        bh, sq, d = q.shape
        kt = jnp.swapaxes(k, 1, 2)
        nk = sq // block_k
        return pl.pallas_call(
            functools.partial(kern_kgrid, nk=nk, bf16mm=bf16mm),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=(bh, sq // block_q, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, d, block_k), lambda b, i, j: (b, 0, j)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * sq * sq * d,
                bytes_accessed=4 * bh * sq * d * 2,
                transcendentals=bh * sq * sq),
        )(q, kt, v)

    for bq, bk in ((512, 1024), (512, 2048), (1024, 512), (256, 1024)):
        timed(f"kgrid bq={bq} bk={bk}",
              lambda q, k, v, _s, bq=bq, bk=bk: flash_kgrid(
                  q, k, v, block_q=bq, block_k=bk), q, k, v)
    timed("kgrid+bf16 bq=512 bk=1024",
          lambda qs, k, v, _s: flash_kgrid(qs, k, v, bf16mm=True), qs, k, v)

    # ---- official kernel ----------------------------------------------------
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    q4 = q.reshape(32, 8, S, D)
    k4 = k.reshape(32, 8, S, D)
    v4 = v.reshape(32, 8, S, D)

    def official(q4, k4, v4, _s):
        bs = BlockSizes(block_q=512, block_k_major=1024, block_k=1024,
                        block_b=1,
                        block_q_major_dkv=512, block_k_major_dkv=512,
                        block_k_dkv=512, block_q_dkv=512,
                        block_k_major_dq=512, block_k_dq=512,
                        block_q_dq=512)
        return flash_attention(q4, k4, v4, sm_scale=scale, block_sizes=bs)

    try:
        timed("official flash (pallas ops)", official, q4, k4, v4)
    except Exception as e:
        print(f"  official flash failed: {type(e).__name__}: {e}")

    # ---- materialized-probs cross path (ptp today) -------------------------
    SK = 77
    qc = jnp.asarray(rs.randn(32, 8, S, D), jnp.bfloat16)
    kc = jnp.asarray(rs.randn(32, 8, SK, D), jnp.bfloat16)
    vc = jnp.asarray(rs.randn(32, 8, SK, D), jnp.bfloat16)
    print(f"cross-attention with materialized probs (ptp path) Sq={S} Sk={SK}")

    def mat_probs(q, k, v, _s):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
        # fake "edit": a per-token scale + pair mix like ptp replace does
        p = jnp.concatenate([p[:16], p[16:] * 0.5 + p[:16] * 0.5], axis=0)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    timed("materialize+edit+PV (today)", mat_probs, qc, kc, vc)

    def unmat_pair(q, k, v, _s):
        # value-folded form: 2 unmaterialized attentions for the cond halves
        from eta_inversion_tpu.ops.flash_attention import xla_attention
        o1 = xla_attention(q, k, v, scale)
        o2 = xla_attention(q[:16], k[:16], v[16:] * 0.5, scale)
        return o1.at[16:].add(o2)

    timed("value-folded (2 attn calls)", unmat_pair, qc, kc, vc)


if __name__ == "__main__":
    main()
