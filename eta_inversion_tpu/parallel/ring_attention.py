"""Sequence-parallel (ring) attention over a mesh axis.

Capability beyond the reference (whose only parallelism is a process pool,
/root/reference/utils/device_pool.py): shard the attention *sequence* over
devices so self-attention at resolutions whose S^2 score tile no longer fits
one chip (1024px latents -> S=16384) scales over ICI.  Each device holds
S/n query rows and one K/V block; K/V blocks rotate around the ring with
`lax.ppermute` while a numerically-stable online softmax accumulates, so no
device ever materializes more than an (S/n, S/n) score tile and the
collective rides ICI concurrently with the MXU work (XLA overlaps the
ppermute DMA with the next block's matmuls).

This composes with, and is the alternative to, Megatron head-sharding
(parallel/sharding.py): head-sharding caps at n_heads (8 for SD) and
replicates activations; ring attention splits activations too, so the
sequence axis can absorb arbitrarily many devices.

Layout is (B, H, S, D) to match `ops/flash_attention.xla_attention`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = float("-inf")


def _ring_attention_local(q, k, v, scale: float, axis_name: str):
    """Inside shard_map: q/k/v are the LOCAL (B, H, S_loc, D) blocks of a
    sequence sharded over `axis_name`.  Returns the local (B, H, S_loc, D)
    output rows — exact (up to fp associativity) full attention."""
    n = jax.lax.psum(1, axis_name)
    perm = [(j, (j + 1) % n) for j in range(n)]
    b, h, s_loc, d = q.shape
    qf = q.astype(jnp.float32) * scale

    def step(_, carry):
        acc, m_prev, l_prev, k_cur, v_cur = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32))
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p,
                                       v_cur.astype(jnp.float32))
        # rotate the K/V blocks one hop around the ring; issued after the
        # block's matmuls so XLA overlaps the DMA with the next iteration
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return acc, m_new, l_new, k_nxt, v_nxt

    # pvary: the carries must enter the loop typed as varying over the ring
    # axis (their updates mix in the axis-varying K/V blocks)
    acc0 = jax.lax.pvary(jnp.zeros((b, h, s_loc, d), jnp.float32), axis_name)
    m0 = jax.lax.pvary(jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32),
                       axis_name)
    l0 = jax.lax.pvary(jnp.zeros((b, h, s_loc, 1), jnp.float32), axis_name)
    acc, _, l, _, _ = jax.lax.fori_loop(0, n, step, (acc0, m0, l0, k, v))
    return (acc / l).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "model",
                   scale: Optional[float] = None):
    """Full (B, H, S, D) self-attention with S sharded over `mesh` axis
    `axis`.  Inputs may be unsharded (they are placed here); the output comes
    back sharded P(None, None, axis, None) so downstream sequence-parallel
    ops keep riding the same sharding.

    S must divide by the axis size.  Exact vs `xla_attention` up to fp32
    accumulation order (the online-softmax rescaling)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    if q.shape[2] % n != 0:
        raise ValueError(
            f"ring_attention: S={q.shape[2]} not divisible by mesh axis "
            f"{axis!r} of size {n}")
    seq_spec = P(None, None, axis, None)
    fn = jax.jit(
        jax.shard_map(
            functools.partial(_ring_attention_local, scale=float(scale),
                              axis_name=axis),
            mesh=mesh,
            in_specs=(seq_spec, seq_spec, seq_spec),
            out_specs=seq_spec,
        ),
        in_shardings=(NamedSharding(mesh, seq_spec),) * 3,
    )
    return fn(q, k, v)
