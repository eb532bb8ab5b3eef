"""Pallas TPU flash attention + attention dispatch.

The reference materializes full similarity matrices in its patched attention
forward (/root/reference/modules/utils/ptp_utils.py:238-253) — at the 64x64
latent resolution that is a (B*heads, 4096, 4096) tensor per layer.  On TPU we
never materialize it: self-attention at large sequence lengths runs through an
online-softmax Pallas kernel (HBM -> VMEM tiles feeding the MXU), and the probs
tensor only exists for layers where an editing hook actually asks for it (those
are all <= 32x32 = 1024 tokens, or cross-attention with 77 keys — tiny).

Kernel shape contract: q, k, v are (BH, S, D) with S a multiple of the block
size; D is used natively (whole-dim blocks — Mosaic pads the MXU contraction
in registers, so no HBM-level padding is ever paid).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


LOG2E = 1.4426950408889634

# Kernel matmuls pin DEFAULT precision explicitly: a global
# jax_default_matmul_precision="highest" (set by utils.debug_utils.
# enable_deterministic, which eval.py enables for parity with the reference's
# use_deterministic_algorithms) would otherwise stamp contract_precision<fp32>
# onto these bf16 MXU matmuls, which Mosaic rejects ("Bad lhs type").  For
# bf16 operands DEFAULT is already the exact contraction — the MXU multiplies
# bf16 inputs with fp32 accumulation — so this changes no numerics.
_KERNEL_PREC = jax.lax.Precision.DEFAULT


def _flash_onepass_kernel(q_ref, kt_ref, v_ref, o_ref, l_ref=None, *,
                          scale: float):
    """Whole-row softmax in one pass (block_k == seq_k): no online-max
    corrections, exp2 with log2(e) folded into the score scale, bf16 matmul
    inputs.  Measured -4% vs the blockwise kernel at SD's (256, 4096, 40)
    on v5e (scripts/attn_microbench — mb7 sweep).  With l_ref, also writes
    the natural-log row logsumexp (VJP residual)."""
    q = q_ref[0]                      # (bq, D) bf16
    kt = kt_ref[0]                    # (D, S)
    v = v_ref[0]                      # (S, D)
    s = jnp.dot(q, kt, preferred_element_type=jnp.float32, precision=_KERNEL_PREC) * (scale * LOG2E)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if l_ref is not None:
        # scores were in the log2 domain: L_nat = (m + log2 l) / log2(e)
        l_ref[0] = ((m + jnp.log2(l)) * (1.0 / LOG2E)).reshape(1, -1)


def _flash_kernel(q_ref, kt_ref, v_ref, o_ref, l_ref=None, *, block_k: int,
                  scale: float):
    """One (batch*head, q-block) program: online softmax over k blocks.

    K arrives pre-transposed as (D, S) so Q@K^T is a plain NN matmul — the NT
    contraction forced in-kernel transposes and measured ~1.5x slower at large
    batch*heads (13.6ms -> 9.1ms at BH=128, S=4096, D=128 on v5e).  With
    l_ref, also writes the natural-log row logsumexp (VJP residual)."""
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, D)
    bq, d = q.shape
    seq_k = v_ref.shape[1]
    num_kb = seq_k // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        kt = kt_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)  # (D, bk)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, kt, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)  # (bq, bk)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if l_ref is not None:
        l_ref[0] = (m + jnp.log(l)).reshape(1, -1)


def _flash_fwd_impl(q, k, v, scale: float, block_q: int, block_k: int,
                    interpret: bool, need_lse: bool):
    """pallas_call for the forward kernels; optionally also returns the
    per-row natural-log logsumexp (BH, S) fp32 for the backward pass."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    kt = jnp.swapaxes(k, 1, 2)  # (BH, D, S); cheap XLA transpose, reused by
    # every q block
    grid = (bh, sq // block_q)
    onepass = block_k == sk
    kern = functools.partial(_flash_onepass_kernel, scale=scale) if onepass \
        else functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    out_shape = [jax.ShapeDtypeStruct((bh, sq, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0))]
    if need_lse:
        # (BH, 1, S): mosaic requires the last two block dims be (mult of 8,
        # mult of 128) or equal to the array dims — a unit sublane dim is
        out_shape.append(jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)))
    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, d, sk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            # both grid dims are independent -> spread across the 2 megacores
            dimension_semantics=("parallel", "parallel"),
            # the onepass kernel holds a (block_q, seq_k) fp32 score tile and
            # the d=512 VAE blocks need ~17M with double buffering — raise the
            # scoped-VMEM ceiling (v5e has 128M/core)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(bh * sq * d * 2 + bh * sk * d * 2) * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
        interpret=interpret,
    )(q, kt, v)
    return (outs[0], outs[1]) if need_lse else (outs[0], None)


def _flash_dq_kernel(q_ref, k_ref, kt_ref, vt_ref, do_ref, l_ref, d_ref,
                     dq_ref, *, block_k: int, scale: float):
    """dQ for one (bh, q-block) program: dQ = scale * sum_k [P∘(dP − D)] @ K,
    with P recomputed from the saved logsumexp (classic flash backward)."""
    q = q_ref[0].astype(jnp.float32) * scale      # (bq, d)
    do = do_ref[0].astype(jnp.float32)            # (bq, d)
    lse = l_ref[0].reshape(-1, 1)                 # (1, 1, bq) -> (bq, 1)
    dvec = d_ref[0].reshape(-1, 1)
    bq, d = q.shape
    seq_k = k_ref.shape[1]
    num_kb = seq_k // block_k

    def body(kb, acc):
        kt = kt_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        vt = vt_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        kk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, kt, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)   # scaled scores
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, vt, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)  # (bq, bk)
        ds = p * (dp - dvec)
        return acc + jnp.dot(ds, kk, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)

    acc = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_dkv_kernel(k_ref, v_ref, qt_ref, q_ref, dot_ref, do_ref, l_ref,
                      d_ref, dk_ref, dv_ref, *, block_q: int, scale: float):
    """dK/dV for one (bh, k-block) program: transposed-score recompute over q
    blocks — dV = Pᵀ @ dO, dK = scale * [Pᵀ∘(dPᵀ − Dᵀ)] @ Q."""
    k = k_ref[0].astype(jnp.float32) * scale      # (bk, d)
    v = v_ref[0].astype(jnp.float32)              # (bk, d)
    bk, d = k.shape
    seq_q = q_ref.shape[1]
    num_qb = seq_q // block_q

    def body(qb, carry):
        dk_acc, dv_acc = carry
        qt = qt_ref[0, :, pl.ds(qb * block_q, block_q)].astype(jnp.float32)
        qq = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        dot = dot_ref[0, :, pl.ds(qb * block_q, block_q)].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = l_ref[0, 0, pl.ds(qb * block_q, block_q)].reshape(1, -1)
        dvec = d_ref[0, 0, pl.ds(qb * block_q, block_q)].reshape(1, -1)
        st = jnp.dot(k, qt, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)  # (bk, bq)
        pt = jnp.exp(st - lse)
        dv_acc = dv_acc + jnp.dot(pt, do, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
        dpt = jnp.dot(v, dot, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)  # (bk, bq)
        dst = pt * (dpt - dvec)
        dk_acc = dk_acc + jnp.dot(dst, qq, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
        return dk_acc, dv_acc

    z = jnp.zeros((bk, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_qb, body, (z, z))
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, do, scale: float, block_q: int,
                    block_k: int, interpret: bool):
    bh, sq, d = q.shape
    sk = k.shape[1]
    bq = min(block_q, 512)
    bk = min(block_k, sk)
    dvec = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                   axis=-1)[:, None, :]  # (BH, 1, S)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    qt = jnp.swapaxes(q, 1, 2)
    dot = jnp.swapaxes(do, 1, 2)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=64 * 1024 * 1024,
    )
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, block_k=bk, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=(bh, sq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),   # q
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0)),   # k
            pl.BlockSpec((1, d, sk), lambda b, i: (b, 0, 0)),   # kt
            pl.BlockSpec((1, d, sk), lambda b, i: (b, 0, 0)),   # vt
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),   # do
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i)),   # lse
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i)),   # D
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        compiler_params=params,
        interpret=interpret,
    )(q, k, kt, vt, do, lse, dvec)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, block_q=bq, scale=scale),
        out_shape=[jax.ShapeDtypeStruct((bh, sk, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, sk, d), q.dtype)],
        grid=(bh, sk // bk),
        in_specs=[
            pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0)),   # k
            pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0)),   # v
            pl.BlockSpec((1, d, sq), lambda b, i: (b, 0, 0)),   # qt
            pl.BlockSpec((1, sq, d), lambda b, i: (b, 0, 0)),   # q
            pl.BlockSpec((1, d, sq), lambda b, i: (b, 0, 0)),   # doT
            pl.BlockSpec((1, sq, d), lambda b, i: (b, 0, 0)),   # do
            pl.BlockSpec((1, 1, sq), lambda b, i: (b, 0, 0)),   # lse
            pl.BlockSpec((1, 1, sq), lambda b, i: (b, 0, 0)),   # D
        ],
        out_specs=[pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0)),
                   pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0))],
        compiler_params=params,
        interpret=interpret,
    )(k, v, qt, q, dot, do, lse, dvec)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, interpret):
    o, _ = _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret,
                           need_lse=False)
    return o


def _flash_vjp_fwd(q, k, v, scale, block_q, block_k, interpret):
    o, lse = _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret,
                             need_lse=True)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, do, scale, block_q, block_k,
                           interpret)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention_bhsd(q, k, v, scale: float, block_q: int = 512,
                         block_k: int = 512, interpret: bool = False):
    """Flash attention over (BH, S, D) inputs. S % block == 0; D native.

    Differentiable: a custom VJP recomputes probabilities from the saved
    per-row logsumexp in two backward Pallas kernels (dQ over q-blocks,
    dK/dV over k-blocks) — the path NTI's inner gradient loop takes on-chip
    (reference null_text_inversion.py:42-94 runs ~500 UNet backward passes
    per image; materializing (BH, S, S) probabilities for those would be
    2 GB+ per layer)."""
    return _flash(q, k, v, scale, block_q, block_k, interpret)


def _flash_packed_kernel(q_ref, kt_ref, v_ref, o_ref, l_ref=None, *,
                         block_k: int, scale: float, heads: int, d: int):
    """One (batch, q-block) program over PACKED (rows, H*D) tiles: all heads'
    online softmax in one kernel, heads split by static VMEM lane/sublane
    slices.  K/V are staged once per q-block for ALL heads, and — the point —
    the operands arrive in the projection layout (B, S, H*D), so the
    (B,S,H,D)->(B,H,S,D) transposes + output merge that the flat (BH, S, D)
    kernel forces materialized (7.7 ms/step of the flagship bwd step, ROADMAP
    round-3 roofline) disappear.  With l_ref, also writes the natural-log row
    logsumexp per head (VJP residual)."""
    qa = q_ref[0]                                 # (bq, H*D)
    bq = qa.shape[0]
    seq_k = v_ref.shape[1]
    num_kb = seq_k // block_k

    for h in range(heads):
        q = qa[:, h * d:(h + 1) * d].astype(jnp.float32) * scale

        def body(kb, carry, h=h, q=q):
            acc, m_prev, l_prev = carry
            kt = kt_ref[0, h * d:(h + 1) * d,
                        pl.ds(kb * block_k, block_k)].astype(jnp.float32)
            v = v_ref[0, pl.ds(kb * block_k, block_k),
                      h * d:(h + 1) * d].astype(jnp.float32)
            s = jnp.dot(q, kt, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
            return acc, m_new, l_new

        acc = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
        o_ref[0, :, h * d:(h + 1) * d] = (acc / l).astype(o_ref.dtype)
        if l_ref is not None:
            l_ref[0, h:h + 1, :] = (m + jnp.log(l)).reshape(1, bq)


def _packed_fwd_impl(q, k, v, scale: float, heads: int, block_q: int,
                     block_k: int, interpret: bool, need_lse: bool):
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // heads
    kt = jnp.swapaxes(k, 1, 2)  # (B, H*D, S) — the only materialized layout op
    grid = (b, sq // block_q)
    out_shape = [jax.ShapeDtypeStruct((b, sq, hd), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, hd), lambda bb, i: (bb, i, 0))]
    if need_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, heads, sq), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, heads, block_q), lambda bb, i: (bb, 0, i)))
    outs = pl.pallas_call(
        functools.partial(_flash_packed_kernel, block_k=block_k, scale=scale,
                          heads=heads, d=d),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, hd, sk), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, sk, hd), lambda bb, i: (bb, 0, 0)),
        ],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * sq * sq * d,
            bytes_accessed=(3 * b * sq * hd + b * sq * hd) * q.dtype.itemsize,
            transcendentals=b * heads * sq * sq,
        ),
        interpret=interpret,
    )(q, kt, v)
    return (outs[0], outs[1]) if need_lse else (outs[0], None)


def _packed_to_flat(x, heads: int):
    b, s, hd = x.shape
    d = hd // heads
    return x.reshape(b, s, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, s, d)


def _flat_to_packed(x, b: int, heads: int):
    bh, s, d = x.shape
    return x.reshape(b, heads, s, d).transpose(0, 2, 1, 3).reshape(b, s, heads * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_packed(q, k, v, scale, heads, block_q, block_k, interpret):
    o, _ = _packed_fwd_impl(q, k, v, scale, heads, block_q, block_k, interpret,
                            need_lse=False)
    return o


def _flash_packed_vjp_fwd(q, k, v, scale, heads, block_q, block_k, interpret):
    o, lse = _packed_fwd_impl(q, k, v, scale, heads, block_q, block_k,
                              interpret, need_lse=True)
    return o, (q, k, v, o, lse)


def _flash_packed_vjp_bwd(scale, heads, block_q, block_k, interpret, res, do):
    # the backward kernels consume the flat (BH, S, D) layout; the transposes
    # this costs live only on the gradient path (NTI / regdiffinv), where the
    # old layout paid them in BOTH directions
    q, k, v, o, lse = res
    b = q.shape[0]
    qf, kf, vf, of, dof = (_packed_to_flat(x, heads) for x in (q, k, v, o, do))
    lsef = lse.reshape(b * heads, 1, -1)
    dqf, dkf, dvf = _flash_bwd_impl(qf, kf, vf, of, lsef, dof, scale,
                                    block_q, block_k, interpret)
    return tuple(_flat_to_packed(g, b, heads) for g in (dqf, dkf, dvf))


_flash_packed.defvjp(_flash_packed_vjp_fwd, _flash_packed_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "block_q",
                                             "block_k", "interpret"))
def flash_attention_packed(q, k, v, scale: float, heads: int,
                           block_q: int = 512, block_k: int = 2048,
                           interpret: bool = False):
    """Multi-head flash attention over packed (B, S, H*D) inputs — the UNet's
    native projection layout, so no (B,H,S,D) transposes ever materialize.
    S % block_q == 0; head_dim = H*D/heads must be a multiple of 8 (sublane
    alignment of the in-VMEM head slices) and <= 128."""
    return _flash_packed(q, k, v, scale, heads, block_q, block_k, interpret)


def packed_block_sizes(sk: int):
    """Block sizes for the packed multi-head kernel (per-head VMEM tiles are
    the same as the flat kernel's, so the same sweep applies — see
    flash_block_sizes)."""
    if sk <= 1024:
        return 512, sk
    return 512, next(bk for bk in (2048, 1024, 512) if sk % bk == 0)


def attention_packed(q, k, v, heads: int, scale: Optional[float] = None,
                     min_flash_seq: int = 1024):
    """Dispatching self-attention over PACKED (B, S, H*D) q/k/v — the layout
    the q/k/v projections produce.  On TPU, eligible shapes run the packed
    multi-head Pallas kernel with zero materialized layout ops; everything
    else reshapes to (B, H, S, D) for xla_attention, which XLA fuses the
    virtual transposes into (free — the cost only exists around pallas_call).

    Only for hook-passthrough layers: callers with active qkv/probs/store/out
    hooks must use the (B, H, S, D) `attention` path."""
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // heads
    if scale is None:
        scale = d ** -0.5
    sp = _ring_dispatch(b, sq, sk)
    if sp is not None:
        # ring path: the (B,H,S,D) transposes are real here, but the ring is
        # only admitted at sequence lengths where single-chip attention has
        # already lost (S >= min_seq) — layout cost is noise vs the S^2 work
        from ..parallel.ring_attention import ring_attention_bhsd

        qh = q.reshape(b, sq, heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
        o = ring_attention_bhsd(qh, kh, vh, sp, float(scale))
        return o.transpose(0, 2, 1, 3).reshape(b, sq, hd)
    if heads == 1:
        # single-head (VAE mid-attention): packed already IS flat — ride the
        # existing dispatcher through a free reshape
        return attention(q[:, None], k[:, None], v[:, None], scale,
                         min_flash_seq=min_flash_seq)[:, 0]
    use_flash = (
        on_tpu()
        and sq == sk
        and sq >= min_flash_seq
        and sq % 512 == 0
        and heads * d == hd
        and d % 8 == 0
        and d <= 128
    )
    if not use_flash:
        qh = q.reshape(b, sq, heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
        o = xla_attention(qh, kh, vh, scale)
        return o.transpose(0, 2, 1, 3).reshape(b, sq, hd)
    block_q, block_k = packed_block_sizes(sk)
    return flash_attention_packed(q, k, v, scale=float(scale), heads=heads,
                                  block_q=block_q, block_k=block_k)


def _crossk_kernel(q_ref, kt_ref, v_ref, o_ref, *, sk: int, scale: float):
    """Short-K attention, one (batch*head, q-block) program: the whole padded
    key range fits one MXU pass, the score tile never leaves VMEM."""
    q = q_ref[0].astype(jnp.float32) * scale     # (bq, D)
    kt = kt_ref[0].astype(jnp.float32)           # (D, SKP)
    s = jnp.dot(q, kt, preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
    skp = s.shape[-1]
    if sk < skp:
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < sk
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    v = v_ref[0]                                 # (SKP, D)
    o_ref[0] = jnp.dot(p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32, precision=_KERNEL_PREC).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sk", "scale", "block_q", "interpret"))
def crossk_attention_bhsd(q, k, v, sk: int, scale: float, block_q: int = 1024,
                          interpret: bool = False):
    """Cross attention over (BH, Sq, D) q with a short (BH, sk, D) key/value
    range (SD: 77 text tokens).  Keys/values are zero-padded to the 128-lane
    tile and masked in-kernel, so the (Sq, 128) score tile stays in VMEM — the
    XLA two-einsum path materializes the scores in HBM (measured 2.1 ms vs
    1.05 ms/layer-call at (BH, Sq, D) = (256, 4096, 40) on v5e,
    scripts/attn_microbench3.py)."""
    bh, sq, d = q.shape
    skp = 128 if sk <= 128 else ((sk + 127) // 128) * 128
    kpad = jnp.pad(k, ((0, 0), (0, skp - sk), (0, 0)))
    vpad = jnp.pad(v, ((0, 0), (0, skp - sk), (0, 0)))
    kt = jnp.swapaxes(kpad, 1, 2)                # (BH, D, SKP) — tiny
    return pl.pallas_call(
        functools.partial(_crossk_kernel, sk=sk, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=(bh, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, d, skp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, skp, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * skp * d,
            bytes_accessed=(2 * bh * sq * d + 2 * bh * skp * d) * q.dtype.itemsize,
            transcendentals=bh * sq * skp,
        ),
        interpret=interpret,
    )(q, kt, vpad)


# trace-time override: when > 0, on_tpu() reports False so the dispatcher
# takes the pure-XLA path even though the process backend is a TPU.  Used by
# utils.profiling.lowered_cost's CPU re-lower (the axon relay returns no
# client-side cost model): Pallas TPU kernels refuse to lower for the CPU
# target, but the XLA attention path lowers anywhere and counts the same
# matmul FLOPs.
_FORCE_XLA_DEPTH = 0


class force_xla_attention:
    """Context manager forcing the XLA (non-Pallas) attention path at trace
    time.  Re-entrant; affects only traces started inside the context."""

    def __enter__(self):
        global _FORCE_XLA_DEPTH
        _FORCE_XLA_DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _FORCE_XLA_DEPTH
        _FORCE_XLA_DEPTH -= 1
        return False


def on_tpu() -> bool:
    if _FORCE_XLA_DEPTH:
        return False
    return jax.default_backend() not in ("cpu", "gpu")


def xla_attention(q, k, v, scale: float):
    """Reference-path attention via XLA einsums; fp32 softmax. q,k,v (B,H,S,D).

    The softmax is single-pass: a fixed clamp at ±80 replaces the row-max
    subtraction.  exp(80) is still two decades under the fp32 ceiling, so the
    result is mathematically identical for any realistic score range (SD
    cross-attention logits stay within ~±30), and the all-clamped corner
    degrades gracefully to uniform weights.  Dropping the data-dependent
    stabilizer removes two full HBM passes over the (B, H, Sq, Sk) fp32 score
    tensor (reduce_max + subtract — 322 MB each at SD's 64x64 cross shape,
    measured 5.7 ms/UNet-step at batch 32 on v5e) and lets XLA fuse clamp+exp
    into the score einsum's epilogue."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    e = jnp.exp(jnp.clip(s * scale, -80.0, 80.0))
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


# largest (B, H, Sq, Sk) fp32 score tensor the unchunked XLA path may
# materialize.  Above it, attention falls back to q-chunked evaluation: the
# 768px/1024px VAE mid-attention (single head, d=512, S=9216/16384) fails the
# flash kernel's VMEM gate AND its full score tensor is HBM-hostile (16384^2
# fp32 = 1 GB per batch row — batch 8 at 1024px would materialize 8.6 GB
# twice over, an instant OOM next to SDXL's 5 GB of params).
_XLA_SCORE_BUDGET = 256 * 1024 * 1024


def _chunk_size(sq: int, rows: int) -> int:
    """Largest q-chunk dividing sq whose score slab fits the budget.

    Any divisor is admissible, not just powers of two (ADVICE r4: an sq with
    no power-of-two divisor >= 256 used to silently fall back to the UNCHUNKED
    path and materialize the multi-GB score tensor the budget guards against).
    Prefers chunks >= 256 so the MXU still sees full tiles, but takes a
    smaller divisor over blowing the budget."""
    fits = [c for c in range(1, sq + 1)
            if sq % c == 0 and rows * c * 4 <= _XLA_SCORE_BUDGET]
    return max(fits) if fits else 1


def xla_attention_chunked(q, k, v, scale: float, chunk: int):
    """xla_attention evaluated over q-chunks with `lax.map`: only a
    (B, H, chunk, Sk) score slab is ever live.  Exact same math (the clamped
    single-pass softmax is row-independent)."""
    b, h, sq, d = q.shape
    qc = q.reshape(b, h, sq // chunk, chunk, d).transpose(2, 0, 1, 3, 4)
    o = jax.lax.map(lambda qi: xla_attention(qi, k, v, scale), qc)
    return o.transpose(1, 2, 0, 3, 4).reshape(b, h, sq, d)


def attention_probs(q, k, scale: float):
    """Materialized attention probabilities (fp32) for hook-carrying layers."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    return jax.nn.softmax(s * scale, axis=-1)


def _ring_dispatch(batch: int, sq: int, sk: int):
    """Trace-time check for an active sequence-parallel context admitting this
    self-attention shape (see parallel/ring_attention.sequence_parallel).
    Returns the SeqParallel config or None.  Lazy import: ops must not load
    the parallel package at import time."""
    if sq != sk:
        return None
    from ..parallel.ring_attention import active_sequence_parallel, ring_eligible

    sp = active_sequence_parallel()
    return sp if ring_eligible(sp, batch, sq) else None


def attention(q, k, v, scale: Optional[float] = None, min_flash_seq: int = 1024):
    """Dispatching attention: Pallas flash kernel on TPU for long self-attention,
    XLA path otherwise; under an active `sequence_parallel` mesh context,
    self-attention at or above the ring gate shards S over the mesh axis
    (parallel/ring_attention.py). q, k, v: (B, H, S, D)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    sp = _ring_dispatch(b, sq, sk)
    if sp is not None:
        from ..parallel.ring_attention import ring_attention_bhsd

        return ring_attention_bhsd(q, k, v, sp, float(scale))
    use_flash = (
        on_tpu()
        and sq == sk
        and sq >= min_flash_seq
        and sq % 512 == 0
        and d <= 512
        # the kernel stages the FULL (d, sk) K and (sk, d) V per program (only
        # q/o are block_q-tiled), double-buffered: at large d the staged K/V
        # alone can blow the 64 MB VMEM scope (e.g. d=512 VAE attention on a
        # 768px decode, sk=9216).  Budget: 4 copies (K+V, x2 buffering) of
        # d*sk at the input dtype must fit in half the scope, leaving room
        # for q/o/score tiles.
        and (d <= 128 or 4 * d * sk * q.dtype.itemsize <= 32 * 1024 * 1024)
    )
    # measured v5e (scripts/attn_microbench.py, BH=256 S=1024 D=40): flash
    # 1.19 ms vs XLA 1.53 ms — the 32x32 self-attention layers also belong on
    # the kernel.  At S>=2048 the flash win is larger still (XLA materializes
    # the scores).
    if not use_flash:
        # short-K cross attention stays on the XLA path: the Pallas short-K
        # kernel is faster bare (1.69 vs 2.1 ms/layer-call at SD's 64x64
        # cross shape) but forces materialized (B,H,S,D) transposes that XLA
        # otherwise fuses into the einsums — net slower in-model (bwd xprof
        # trace r3).  crossk_attention_bhsd is kept for callers with
        # already-flat layouts.
        if b * h * sq * sk * 4 > _XLA_SCORE_BUDGET:
            chunk = _chunk_size(sq, b * h * sk)
            if sq % chunk == 0 and chunk < sq:
                return xla_attention_chunked(q, k, v, scale, chunk)
        return xla_attention(q, k, v, scale)

    # head_dim stays NATIVE (no HBM pad to 128): the kernel's block specs take
    # the full d per program, so Mosaic pads only in registers.  At SD's d=40
    # this removes 3 pads + a 3.2x-inflated kt transpose per call — measured
    # 24.4 -> 21.4 ms/call end-to-end at (B,H,S,D)=(32,8,4096,40) on v5e
    # (scripts/flash_sweep.py; block_k=2048 included in that win).
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)
    block_q, block_k = flash_block_sizes(b * h, sk, d)
    o = flash_attention_bhsd(qf, kf, vf, scale=float(scale),
                             block_q=block_q, block_k=block_k)
    return o.reshape(b, h, sq, d)


def flash_block_sizes(bh: int, sk: int, d: int):
    """Kernel block sizes for a (BH, S, D) self-attention call.

    From on-chip sweeps at SD shapes (v5e): the onepass kernel (block_k == S)
    wins at S <= 1024; at S = 4096 the blockwise kernel measured faster
    in-model (15.26 vs 15.73 ms/call at BH=256, bwd xprof trace r3).  d > 128
    (VAE single-head d=512) halves the k/v/score tiles to stay inside scoped
    VMEM."""
    if sk <= 1024:
        return 256, sk
    block_q = 256 if bh <= 16 else 512
    block_k = next(bk for bk in (2048, 1024, 512) if sk % bk == 0)
    if d > 128:
        return 256, min(block_k, 1024)
    return block_q, block_k
