"""Fused GEGLU feed-forward (dot -> erf-gelu gate -> dot) for the UNet MLPs.

Counterpart of the reference's diffusers FeedForward/GEGLU
(/root/reference/modules/models — diffusers UNet blocks); here it is a single
Pallas kernel so the (rows, 8*dim) projection tensor never leaves VMEM.  The
XLA pipeline for `proj(x) -> split -> h*gelu(gate) -> proj_out` materializes
the full double-width projection in HBM (the gate product mixes the two
halves, so it cannot be a dot epilogue) and re-reads it: ~1.5 GB of HBM
traffic per big SD layer-step at batch 32, vs ~0.3 GB for the fused kernel.
Measured in-model, however, the kernel is NEUTRAL (see geglu_mlp) — the ops
are compute-bound once the polynomial-erf epilogue fuses — so the XLA path
stays the default and the kernel is opt-in.

Differentiable: a custom VJP recomputes the forward through the plain-XLA
reference path (`jax.vjp` of `geglu_mlp_xla`) — NTI's inner gradient loop
(reference null_text_inversion.py:42-94) differentiates through the UNet, so
every fused op on that path must carry a VJP (pallas_call has no autodiff
rule; see ops/flash_attention.py for the same pattern).

Also home of the pure-FMA polynomial erf used by models/layers.gelu_exact —
it lives here (ops has no models imports) to keep the package DAG acyclic.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pin DEFAULT matmul precision inside the kernel: a global "highest" default
# stamps contract_precision<fp32> onto bf16 MXU matmuls, which Mosaic rejects
# (see ops/flash_attention._KERNEL_PREC; numerics identical for bf16 inputs).
_KERNEL_PREC = jax.lax.Precision.DEFAULT

# Odd minimax polynomial for erf on [-3, 3]: erf(z) ~ z * P(z^2), fit to
# |err| <= 3.4e-5 incl. the saturation error from clamping at 3 (where
# erf(3) = 0.999978).  Gelu abs error <= 2e-4 over the reals — far below the
# bf16 rounding noise of the GEGLU product/matmul it feeds (outputs differ
# from round(exact) only in the tiny-|y| tail where bf16 ulp < 1e-4).
ERF_COEF = (1.1283629719137802, -0.37581876264851877, 0.11186273083615,
            -0.025649756925251198, 0.004437909424632624,
            -0.0005535658971878295, 4.614817819605463e-05,
            -2.2677774146116304e-06, 4.9183736107624126e-08)


def erf_poly(z: jnp.ndarray) -> jnp.ndarray:
    """erf via the clamped odd polynomial; pure FMAs, fuses anywhere
    (lax.erf's large-|x| exp/select branch blocks matmul-epilogue fusion)."""
    z = jnp.clip(z, -3.0, 3.0)
    z2 = z * z
    p = jnp.float32(ERF_COEF[-1])
    for c in ERF_COEF[-2::-1]:
        p = p * z2 + jnp.float32(c)
    return z * p


def gelu_poly_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf gelu on an f32 tensor via the polynomial erf."""
    return 0.5 * x * (1.0 + erf_poly(x * (1.0 / math.sqrt(2.0))))


def _block_rows(inner: int) -> int:
    """Row-block size: the (bn, 2I) f32 projection is the big VMEM tenant;
    larger blocks amortize per-program overhead and DMA switching."""
    if inner <= 1280:
        return 2048          # s = 20 MB
    return 512 if inner <= 2560 else 256


def _geglu_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, inner: int):
    x = x_ref[...]                                       # (bn, C) bf16
    s = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
    s = s + b1_ref[...].astype(jnp.float32)              # (bn, 2I)
    h, gate = s[:, :inner], s[:, inner:]
    a = (h * gelu_poly_f32(gate)).astype(x.dtype)        # (bn, I)
    o = jnp.dot(a, w2_ref[...], preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
    o = o + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def geglu_mlp_xla(x, w1, b1, w2, b2, dtype=None):
    """Plain-XLA reference path; replicates nn.Dense(dtype) -> split ->
    h * gelu_exact(gate) -> nn.Dense(dtype) bit-for-bit (flax promotes every
    operand to `dtype` before the dot).  This is the CPU/f32 path (goldens,
    crosschecks) and the recompute target for the fused kernel's VJP."""
    dt = dtype or x.dtype
    x, w1, b1 = (a.astype(dt) for a in (x, w1, b1))
    s = jnp.dot(x, w1) + b1
    inner = w2.shape[0]
    h, gate = s[..., :inner], s[..., inner:]
    if dt == jnp.float32:
        a = h * jax.nn.gelu(gate, approximate=False)
    else:
        # same bf16 polynomial-erf gelu as models/layers.gelu_exact
        a = (h.astype(jnp.float32) *
             gelu_poly_f32(gate.astype(jnp.float32))).astype(dt)
    w2, b2 = w2.astype(dt), b2.astype(dt)
    return jnp.dot(a, w2) + b2


def _fused_fwd_impl(x, w1, b1, w2, b2, interpret=False):
    n, c = x.shape
    two_i = w1.shape[1]
    inner = two_i // 2
    bn = _block_rows(inner)
    grid = (n // bn,)
    return pl.pallas_call(
        functools.partial(_geglu_kernel, inner=inner),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, c), lambda i: (i, 0)),
            pl.BlockSpec((c, two_i), lambda i: (0, 0)),   # resident across grid
            pl.BlockSpec((1, two_i), lambda i: (0, 0)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, c), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            # row blocks are independent -> split the grid over both megacores;
            # the constant-index weight blocks stay VMEM-resident per core
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * two_i + 2 * n * inner * c,
            bytes_accessed=(2 * n * c + c * two_i + inner * c) * x.dtype.itemsize,
            transcendentals=n * inner,
        ),
        interpret=interpret,
    )(x, w1, b1.reshape(1, two_i), w2, b2.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(x, w1, b1, w2, b2, interpret):
    return _fused_fwd_impl(x, w1, b1, w2, b2, interpret)


def _fused_vjp_fwd(x, w1, b1, w2, b2, interpret):
    return _fused_fwd_impl(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _fused_vjp_bwd(interpret, res, do):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(lambda *a: geglu_mlp_xla(*a), x, w1, b1, w2, b2)
    return vjp(do.astype(x.dtype))


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def geglu_mlp(x, w1, b1, w2, b2, dtype=None, interpret=False,
              force_fused=False):
    """GEGLU feed-forward `proj_out(h * gelu(gate))` with `h, gate =
    split(geglu_proj(x))`.  x: (..., C); w1: (C, 8*dim); w2: (4*dim, dim).

    Dispatch: the XLA path by default.  The fused kernel measured NEUTRAL
    in-model on v5e (batch-8 flagship bench 1.944-1.951 s/edit vs 1.937-1.942
    for XLA, r3): once the polynomial-erf gelu restored the epilogue fusion,
    XLA's pipeline is already compute-bound at ~143 TF/s, and the pallas_call
    forces its input materialized where XLA fused the residual-add producer —
    the same glue tax that sank the short-K cross kernel (ROADMAP round-2/3
    notes).  Kept behind force_fused for flat-layout callers and future
    shapes."""
    dt = dtype or x.dtype
    lead = x.shape[:-1]
    c = x.shape[-1]
    inner = w2.shape[0]
    n = int(math.prod(lead)) if lead else 1
    bn = _block_rows(inner)
    # c need only be sublane-aligned (Mosaic pads lanes); the h/gate split
    # boundary must sit on a 128-lane tile edge
    use_fused = (force_fused and dt == jnp.bfloat16
                 and n % bn == 0 and c % 8 == 0 and inner % 128 == 0)
    if not use_fused:
        return geglu_mlp_xla(x, w1, b1, w2, b2, dtype=dt)
    out = _fused(x.astype(dt).reshape(n, c), w1.astype(dt), b1.astype(dt),
                 w2.astype(dt), b2.astype(dt), interpret)
    return out.reshape(*lead, c)
