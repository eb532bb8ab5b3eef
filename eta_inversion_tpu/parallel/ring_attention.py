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

import dataclasses
import functools
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = float("-inf")


def _pvary(x, axes):
    """Type a value as varying over `axes` (pcast on current JAX, pvary on
    older releases)."""
    try:
        return jax.lax.pcast(x, axes, to="varying")
    except AttributeError:  # pragma: no cover - pre-pcast JAX
        return jax.lax.pvary(x, axes)


def _ring_attention_local(q, k, v, scale: float, axis_name: str,
                          vary_axes: tuple = ()):
    """Inside shard_map: q/k/v are the LOCAL (B, H, S_loc, D) blocks of a
    sequence sharded over `axis_name`.  Returns the local (B, H, S_loc, D)
    output rows — exact (up to fp associativity) full attention.

    `vary_axes`: every mesh axis the in_specs mention (the ring axis plus a
    batch axis, if sharded) — the loop carries must enter typed as varying
    over the same axes as the K/V blocks they mix with."""
    vary_axes = tuple(vary_axes) or (axis_name,)
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

    acc0 = _pvary(jnp.zeros((b, h, s_loc, d), jnp.float32), vary_axes)
    m0 = _pvary(jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32), vary_axes)
    l0 = _pvary(jnp.zeros((b, h, s_loc, 1), jnp.float32), vary_axes)
    acc, _, l, _, _ = jax.lax.fori_loop(0, n, step, (acc0, m0, l0, k, v))
    return (acc / l).astype(q.dtype)


# ---------------------------------------------------------------- model wiring
#
# The model path reaches the ring via a TRACE-TIME context: the attention
# dispatchers (ops/flash_attention.attention / attention_packed) consult
# `active_sequence_parallel()` while the engine's jit traces, exactly like the
# engine consults `active_data_mesh()` for batch sharding.  The decision is
# static (mesh + shapes), so nothing about it survives into the compiled
# program except the shard_map itself.


@dataclasses.dataclass(frozen=True)
class SeqParallel:
    """Static config for sequence-parallel attention inside a traced model.

    `axis` is the mesh axis that absorbs the sequence; `batch_axis` (if the
    mesh has it, size > 1) keeps the batch dim sharded as the engine placed it
    so the shard_map doesn't force a batch all-gather.  `min_seq` is the
    admission gate: below it, single-chip attention (flash kernel / XLA) is
    faster than paying ring ppermute hops — the default admits exactly the
    shapes the single-chip VMEM gate in ops/flash_attention.attention rejects
    (e.g. the 1024px VAE mid-attention, S=16384 at d=512)."""

    mesh: Mesh
    axis: str = "model"
    batch_axis: Optional[str] = "data"
    min_seq: int = 8192


_SEQ_CTX: list = []


@contextmanager
def sequence_parallel(mesh: Mesh, axis: str = "model",
                      batch_axis: Optional[str] = "data",
                      min_seq: int = 8192):
    """Route eligible self-attention through the ring while tracing under
    this context.  Compose with `with mesh:` — e.g.::

        with mesh, sequence_parallel(mesh, axis="model"):
            out = engine.diffusion_backward(...)

    NOTE: the ring axis competes with Megatron head-sharding for the "model"
    axis — under this context the attention q/k/v activations are sequence-
    sharded, so TP-sharded attention params would force an all-to-all per
    layer.  Use one or the other per run (sharding.py's param rules stay
    correct either way; they just stop paying off for attention layers)."""
    _SEQ_CTX.append(SeqParallel(mesh, axis, batch_axis, min_seq))
    try:
        yield
    finally:
        _SEQ_CTX.pop()


def active_sequence_parallel() -> Optional[SeqParallel]:
    return _SEQ_CTX[-1] if _SEQ_CTX else None


def ring_eligible(sp: Optional[SeqParallel], batch: int, seq: int) -> bool:
    """Static admission: a ring axis of size > 1 whose size divides S, S at or
    above the single-chip gate, and a batch the batch axis can keep sharded."""
    if sp is None:
        return False
    n = sp.mesh.shape.get(sp.axis, 1)
    if n <= 1 or seq < sp.min_seq or seq % n != 0:
        return False
    if sp.batch_axis is not None:
        bp = sp.mesh.shape.get(sp.batch_axis, 1)
        if bp > 1 and batch % bp != 0:
            return False
    return True


def ring_attention_bhsd(q, k, v, sp: SeqParallel, scale: float):
    """(B, H, S, D) ring self-attention, callable INSIDE an outer jit (no jit
    of its own): the shard_map becomes part of the traced program and GSPMD
    reshards q/k/v to the sequence layout around it."""
    bspec = (sp.batch_axis
             if sp.batch_axis and sp.mesh.shape.get(sp.batch_axis, 1) > 1
             else None)
    seq_spec = P(bspec, None, sp.axis, None)
    vary = (bspec, sp.axis) if bspec else (sp.axis,)
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, scale=float(scale),
                          axis_name=sp.axis, vary_axes=vary),
        mesh=sp.mesh, in_specs=(seq_spec,) * 3, out_specs=seq_spec)
    return fn(q, k, v)


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
