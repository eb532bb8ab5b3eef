"""On-chip block-size sweep at sd21v's S=9216 self-attention geometry.

96x96 latents (768px) give S=9216 = 9*1024 = 3*3072: the default picker
falls to block_k=1024 (9216 isn't 2048-divisible), but 3072 keeps the score
tile well inside VMEM with 3x fewer inner iterations, and a full one-pass
(block_k = S) may win as it does at S <= 1024.  Times end-to-end at the bwd
rows of a batch-8 pair edit (BH = 32 rows x 5 heads = 160), 8 chained calls
per jit (axon ~0.8 ms/dispatch).

Usage: python scripts/sweep_s9216.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/eta_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from eta_inversion_tpu.ops.flash_attention import flash_attention_bhsd

    BH, S, D = 160, 9216, 64
    scale = D ** -0.5
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(BH, S, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(BH, S, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(BH, S, D), jnp.bfloat16)

    def timed(bq, bk, label):
        def chain(q, k, v):
            o = q
            for _ in range(8):
                o = flash_attention_bhsd(o, k, v, scale=scale,
                                         block_q=bq, block_k=bk)
            return o

        fn = jax.jit(chain)
        try:
            o = fn(q, k, v)
            float(jnp.sum(o.astype(jnp.float32)))  # sync (axon-safe)
            t0 = time.perf_counter()
            for _ in range(3):
                o = fn(q, k, v)
            float(jnp.sum(o.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / 3 / 8 * 1000
            print(f"{label:24s} bq={bq:5d} bk={bk:5d}  {dt:7.2f} ms/call",
                  flush=True)
        except Exception as e:
            print(f"{label:24s} bq={bq:5d} bk={bk:5d}  FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    timed(512, 1024, "current default")
    timed(512, 3072, "bk=3072")
    timed(256, 3072, "bq=256 bk=3072")
    timed(512, 4608, "bk=4608")
    timed(512, 9216, "onepass")
    timed(256, 9216, "onepass bq=256")


if __name__ == "__main__":
    main()
