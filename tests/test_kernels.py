"""Pallas kernel correctness on CPU via interpret mode.

The dispatch in ops/flash_attention.py routes to these kernels only on TPU
(on_tpu()), so the CPU test suite never exercises them through the model —
interpret mode runs the same kernel body element-for-element.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eta_inversion_tpu.ops.flash_attention import (
    crossk_attention_bhsd,
    flash_attention_bhsd,
    xla_attention,
)


def _mk(bh, s, d, sk=None, seed=0):
    rs = np.random.RandomState(seed)
    sk = sk or s
    q = jnp.asarray(rs.randn(bh, s, d), jnp.float32)
    k = jnp.asarray(rs.randn(bh, sk, d), jnp.float32)
    v = jnp.asarray(rs.randn(bh, sk, d), jnp.float32)
    return q, k, v


def _ref(q, k, v, scale):
    o = xla_attention(q[:, None], k[:, None], v[:, None], scale)
    return np.asarray(o[:, 0])


@pytest.mark.parametrize("bh,s,d,bq,bk", [
    (2, 1024, 40, 512, 512),
    (3, 1024, 8, 256, 1024),
    (2, 2048, 64, 512, 2048),
])
def test_flash_kernel_interpret_matches_xla(bh, s, d, bq, bk):
    q, k, v = _mk(bh, s, d)
    scale = d ** -0.5
    o = flash_attention_bhsd(q, k, v, scale=scale, block_q=bq, block_k=bk,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(o), _ref(q, k, v, scale),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("bh,s,d,sk,bq", [
    (2, 1024, 40, 77, 512),
    (2, 1024, 40, 77, 1024),
    (3, 2048, 8, 13, 512),
    (2, 1024, 40, 128, 512),   # no padding needed
])
def test_crossk_kernel_interpret_matches_xla(bh, s, d, sk, bq):
    q, k, v = _mk(bh, s, d, sk=sk)
    scale = d ** -0.5
    o = crossk_attention_bhsd(q, k, v, sk=sk, scale=scale, block_q=bq,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(o), _ref(q, k, v, scale),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("bh,s,d", [(2, 1024, 40), (2, 512, 16)])
def test_flash_onepass_kernel_interpret_matches_xla(bh, s, d):
    """block_k == seq_k takes the single-pass exp2 kernel."""
    q, k, v = _mk(bh, s, d, seed=3)
    scale = d ** -0.5
    o = flash_attention_bhsd(q, k, v, scale=scale, block_q=256, block_k=s,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(o), _ref(q, k, v, scale),
                               rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# Production-shape coverage (round-3 verdict item 5): the configs the real
# model hits on-chip — S=4096 blockwise with block_k=2048, the d>128 VAE
# branch, BH>16 — plus the dispatch itself routed through Pallas on CPU via
# a monkeypatched on_tpu, so a dispatch bug fails this suite rather than a
# 255-second on-chip bench warmup.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bh,s,d,bq,bk", [
    (2, 4096, 40, 512, 2048),   # SD 64x64 self-attn, batch-8 production blocks
    (1, 4096, 512, 256, 1024),  # VAE mid-attention at 512px decode (d>128)
    (2, 1024, 512, 256, 1024),  # VAE mid-attention at 256px (onepass, d>128)
    (2, 4096, 64, 512, 2048),   # SDXL 1024px stage-2 self-attn (d=64)
    (2, 9216, 64, 512, 1024),   # sd21v 768px 96x96 self-attn (non-2048-div S)
])
def test_flash_kernel_interpret_production_shapes(bh, s, d, bq, bk):
    q, k, v = _mk(bh, s, d, seed=5)
    scale = d ** -0.5
    o = flash_attention_bhsd(q, k, v, scale=scale, block_q=bq, block_k=bk,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(o), _ref(q, k, v, scale),
                               rtol=2e-5, atol=2e-5)


def test_flash_block_size_selection():
    from eta_inversion_tpu.ops.flash_attention import flash_block_sizes

    assert flash_block_sizes(256, 1024, 40) == (256, 1024)   # onepass
    assert flash_block_sizes(256, 4096, 40) == (512, 2048)   # big-BH blockwise
    assert flash_block_sizes(8, 4096, 40) == (256, 2048)     # small-BH
    assert flash_block_sizes(1, 4096, 512) == (256, 1024)    # VAE d>128
    assert flash_block_sizes(4, 1536, 64) == (256, 512)      # non-2048-divisible
    # sd21v 768px: 96x96 latents -> S=9216 self-attention (d=64, SD2.x heads);
    # 9216 is not 2048-divisible, falls to block_k=1024
    assert flash_block_sizes(32, 9216, 64) == (512, 1024)


@pytest.mark.parametrize("b,h,s,d", [
    (4, 8, 1024, 40),    # 32x32 self-attn layers (BH=32, onepass)
    (1, 1, 4096, 512),   # VAE mid-attention
    (2, 8, 4096, 40),    # 64x64 self-attn (blockwise)
])
def test_attention_dispatch_routes_flash_on_cpu(monkeypatch, b, h, s, d):
    """attention() itself, with on_tpu forced True and the kernel in interpret
    mode: exercises the block-size selection + reshape plumbing end-to-end."""
    import eta_inversion_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "on_tpu", lambda: True)
    called = {}
    real = fa.flash_attention_bhsd

    def spy(q, k, v, scale, block_q=512, block_k=512):
        called["blocks"] = (block_q, block_k)
        return real(q, k, v, scale=scale, block_q=block_q, block_k=block_k,
                    interpret=True)

    monkeypatch.setattr(fa, "flash_attention_bhsd", spy)
    rs = np.random.RandomState(9)
    q = jnp.asarray(rs.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, s, d), jnp.float32)
    o = fa.attention(q, k, v)
    assert called["blocks"] == fa.flash_block_sizes(b * h, s, d)
    want = fa.xla_attention(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_attention_dispatch_vmem_gate(monkeypatch):
    """d>128 with a long key range must fall back to XLA: the kernel stages
    full (d, S) K / (S, d) V per program and would blow the 64 MB VMEM scope
    (e.g. 768px VAE decode, S=9216, d=512)."""
    import eta_inversion_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "on_tpu", lambda: True)

    def boom(*a, **k):
        raise AssertionError("flash kernel must not be called for this shape")

    monkeypatch.setattr(fa, "flash_attention_bhsd", boom)
    rs = np.random.RandomState(10)
    shape = (1, 1, 9216, 512)
    q = jnp.asarray(rs.randn(*shape), jnp.bfloat16)
    k = jnp.asarray(rs.randn(*shape), jnp.bfloat16)
    v = jnp.asarray(rs.randn(*shape), jnp.bfloat16)
    o = fa.attention(q, k, v, min_flash_seq=1024)
    assert o.shape == shape  # served by the XLA path


# ---------------------------------------------------------------------------
# Flash attention VJP (the path NTI's inner gradient loop takes on-chip):
# backward Pallas kernels vs jax.grad through the XLA reference.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bh,s,d,bq,bk", [
    (2, 512, 40, 256, 512),    # onepass forward
    (2, 1024, 32, 256, 512),   # blockwise forward
])
def test_flash_vjp_matches_xla_grads(bh, s, d, bq, bk):
    import jax

    q, k, v = _mk(bh, s, d, seed=21)
    scale = d ** -0.5

    def loss_flash(q, k, v):
        o = flash_attention_bhsd(q, k, v, scale=scale, block_q=bq, block_k=bk,
                                 interpret=True)
        return jnp.sum(jnp.sin(o))  # non-uniform cotangent

    def loss_xla(q, k, v):
        o = xla_attention(q[:, None], k[:, None], v[:, None], scale)[:, 0]
        return jnp.sum(jnp.sin(o))

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4,
                                   atol=2e-4, err_msg=f"d{name}")


def test_flash_vjp_value_unchanged():
    """The custom-VJP wrapper must not change the primal value."""
    q, k, v = _mk(2, 512, 16, seed=22)
    scale = 16 ** -0.5
    o = flash_attention_bhsd(q, k, v, scale=scale, block_q=256, block_k=512,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(o), _ref(q, k, v, scale), rtol=2e-5,
                               atol=2e-6)


# ---------------------------------------------------------------- fused GEGLU


def _mk_geglu(n, c, inner, seed=0, dtype=jnp.bfloat16):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(n, c) * 0.5, dtype)
    w1 = jnp.asarray(rs.randn(c, 2 * inner) * (c ** -0.5), dtype)
    b1 = jnp.asarray(rs.randn(2 * inner) * 0.1, dtype)
    w2 = jnp.asarray(rs.randn(inner, c) * (inner ** -0.5), dtype)
    b2 = jnp.asarray(rs.randn(c) * 0.1, dtype)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("n,c,inner", [
    (2048, 320, 1280),    # SD 64x64 level (c not a 128-multiple: lane pad)
    (512, 640, 2560),     # SD 32x32 level
    (256, 1280, 5120),    # SD mid level (bn=256 branch)
])
def test_geglu_fused_interpret_matches_xla(n, c, inner):
    from eta_inversion_tpu.ops.geglu import geglu_mlp, geglu_mlp_xla

    args = _mk_geglu(n, c, inner, seed=5)
    got = geglu_mlp(*args, dtype=jnp.bfloat16, interpret=True,
                    force_fused=True)
    want = geglu_mlp_xla(*args, dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16 and got.shape == (n, c)
    # kernel keeps the projection in f32 where the XLA path rounds to bf16;
    # differences are bounded by bf16 resolution of the intermediates
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_geglu_fused_grads_match_xla():
    import jax

    from eta_inversion_tpu.ops.geglu import geglu_mlp, geglu_mlp_xla

    args = _mk_geglu(2048, 320, 1280, seed=6)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(geglu_mlp(*a, dtype=jnp.bfloat16,
                                         interpret=True, force_fused=True)
                               .astype(jnp.float32)))

    def loss_xla(*a):
        return jnp.sum(jnp.sin(geglu_mlp_xla(*a, dtype=jnp.bfloat16)
                               .astype(jnp.float32)))

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    want = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    for g, w, name in zip(got, want, ("x", "w1", "b1", "w2", "b2")):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=0.1, atol=0.1, err_msg=f"d{name}")


def test_geglu_dispatch_gating():
    """f32 and ragged row counts take the XLA path even under force_fused
    (the kernel is opt-in only; default dispatch is always XLA)."""
    from eta_inversion_tpu.ops import geglu

    args32 = _mk_geglu(96, 320, 1280, seed=7, dtype=jnp.float32)
    out = geglu.geglu_mlp(*args32, dtype=jnp.float32)   # f32 -> XLA path
    ref = geglu.geglu_mlp_xla(*args32, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # ragged rows (not % bn) in bf16 must fall back to XLA even when forced
    argsbf = _mk_geglu(96, 320, 1280, seed=8)
    out = geglu.geglu_mlp(*argsbf, dtype=jnp.bfloat16, force_fused=True)
    ref = geglu.geglu_mlp_xla(*argsbf, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_geglu_leading_batch_dims():
    """(B, S, C) inputs reshape through the kernel and back."""
    from eta_inversion_tpu.ops.geglu import geglu_mlp, geglu_mlp_xla

    x, w1, b1, w2, b2 = _mk_geglu(4096, 320, 1280, seed=9)
    x3 = x.reshape(2, 2048, 320)
    got = geglu_mlp(x3, w1, b1, w2, b2, dtype=jnp.bfloat16, interpret=True,
                    force_fused=True)
    assert got.shape == (2, 2048, 320)
    flat = geglu_mlp(x, w1, b1, w2, b2, dtype=jnp.bfloat16, interpret=True,
                     force_fused=True)
    np.testing.assert_array_equal(np.asarray(got.reshape(4096, 320), np.float32),
                                  np.asarray(flat, np.float32))


# ------------------------------------------------- packed multi-head flash


def _mk_packed(b, s, h, d, seed=0, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(b, s, h * d), dtype)
    k = jnp.asarray(rs.randn(b, s, h * d), dtype)
    v = jnp.asarray(rs.randn(b, s, h * d), dtype)
    return q, k, v


def _ref_packed(q, k, v, heads, scale):
    b, s, hd = q.shape
    d = hd // heads
    qh, kh, vh = (x.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
                  for x in (q, k, v))
    o = xla_attention(qh, kh, vh, scale)
    return np.asarray(o.transpose(0, 2, 1, 3).reshape(b, s, hd))


@pytest.mark.parametrize("b,s,h,d,bq,bk", [
    (2, 4096, 8, 40, 512, 2048),   # SD 64x64 self-attn, production blocks
    (2, 1024, 8, 80, 512, 1024),   # SD 32x32 level (single k-block)
    (3, 1024, 8, 40, 256, 512),    # blockwise, odd batch
    (2, 4096, 10, 64, 512, 2048),  # SD2.x/SDXL: d=64, per-stage head count
])
def test_flash_packed_interpret_matches_xla(b, s, h, d, bq, bk):
    from eta_inversion_tpu.ops.flash_attention import flash_attention_packed

    q, k, v = _mk_packed(b, s, h, d, seed=11)
    scale = d ** -0.5
    o = flash_attention_packed(q, k, v, scale=scale, heads=h, block_q=bq,
                               block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(o), _ref_packed(q, k, v, h, scale),
                               rtol=2e-5, atol=2e-5)


def test_flash_packed_grads_match_xla():
    """The packed kernel's VJP (packed fwd with per-head logsumexp residual,
    flat backward kernels) vs jax.grad through the XLA reference."""
    import jax

    from eta_inversion_tpu.ops.flash_attention import flash_attention_packed

    b, s, h, d = 2, 1024, 8, 40
    q, k, v = _mk_packed(b, s, h, d, seed=12)
    scale = d ** -0.5

    def loss_packed(q, k, v):
        o = flash_attention_packed(q, k, v, scale=scale, heads=h,
                                   block_q=256, block_k=512, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        qh, kh, vh = (x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                      for x in (q, k, v))
        o = xla_attention(qh, kh, vh, scale)
        return jnp.sum(jnp.sin(o.transpose(0, 2, 1, 3).reshape(b, s, h * d)))

    got = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-3,
                                   atol=1e-4, err_msg=f"d{name}")


def test_attention_packed_dispatch_routes_kernel(monkeypatch):
    """attention_packed with on_tpu forced True routes eligible self-attention
    through the packed kernel (in interpret mode) and matches XLA."""
    import eta_inversion_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "on_tpu", lambda: True)
    called = {}
    real = fa.flash_attention_packed

    def spy(q, k, v, scale, heads, block_q=512, block_k=2048):
        called["blocks"] = (block_q, block_k)
        return real(q, k, v, scale=scale, heads=heads, block_q=block_q,
                    block_k=block_k, interpret=True)

    monkeypatch.setattr(fa, "flash_attention_packed", spy)
    b, s, h, d = 2, 1024, 8, 80
    q, k, v = _mk_packed(b, s, h, d, seed=13)
    o = fa.attention_packed(q, k, v, heads=h)
    assert called["blocks"] == fa.packed_block_sizes(s)
    np.testing.assert_allclose(np.asarray(o),
                               _ref_packed(q, k, v, h, d ** -0.5),
                               rtol=2e-5, atol=2e-5)


def test_attention_packed_ineligible_falls_back(monkeypatch):
    """d not sublane-aligned / d>128 / short seq / cross shapes take the XLA
    reshape path even on TPU; heads==1 rides the flat dispatcher."""
    import eta_inversion_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "on_tpu", lambda: True)

    def boom(*a, **kw):
        raise AssertionError("packed kernel must not be called")

    monkeypatch.setattr(fa, "flash_attention_packed", boom)
    rs = np.random.RandomState(14)

    # d=160 (SD 16x16 level): >128 -> XLA
    q = jnp.asarray(rs.randn(2, 1024, 8 * 160), jnp.float32)
    o = fa.attention_packed(q, q * 0.5, q * 0.25, heads=8)
    assert o.shape == q.shape

    # short sequence (S=256) -> XLA
    q = jnp.asarray(rs.randn(2, 256, 8 * 160), jnp.float32)
    o = fa.attention_packed(q, q * 0.5, q * 0.25, heads=8)
    assert o.shape == q.shape

    # heads==1 goes through attention() (flat layout is already packed);
    # block the flat kernel too so the short-seq XLA route is asserted
    monkeypatch.setattr(fa, "flash_attention_bhsd", boom)
    q = jnp.asarray(rs.randn(1, 256, 512), jnp.float32)
    o = fa.attention_packed(q, q * 0.5, q * 0.25, heads=1)
    assert o.shape == q.shape

def test_xla_attention_chunked_matches_plain():
    """q-chunked evaluation is exact vs the one-shot XLA path (row-independent
    softmax), including non-self sk and bf16 inputs."""
    import eta_inversion_tpu.ops.flash_attention as fa

    rs = np.random.RandomState(11)
    q = jnp.asarray(rs.randn(2, 3, 1024, 16), jnp.float32)
    k = jnp.asarray(rs.randn(2, 3, 512, 16), jnp.float32)
    v = jnp.asarray(rs.randn(2, 3, 512, 16), jnp.float32)
    got = fa.xla_attention_chunked(q, k, v, 0.25, chunk=256)
    want = fa.xla_attention(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_attention_dispatch_chunks_huge_scores(monkeypatch):
    """The 1024px VAE mid-attention shape (B=1, H=1, S=16384, d=512 — SDXL
    decode) fails the flash VMEM gate AND exceeds the XLA score budget
    (16384^2 fp32 = 1 GB): the dispatcher must take the q-chunked path with a
    budget-respecting chunk.  (d is shrunk here to keep the CPU test cheap;
    the chunk decision only reads B*H*Sq*Sk.)"""
    import eta_inversion_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "on_tpu", lambda: True)
    called = {}
    real = fa.xla_attention_chunked

    def spy(q, k, v, scale, chunk):
        called["chunk"] = chunk
        return real(q, k, v, scale, chunk)

    monkeypatch.setattr(fa, "xla_attention_chunked", spy)
    rs = np.random.RandomState(12)
    s = 16384
    q = jnp.asarray(rs.randn(1, 1, s, 8), jnp.bfloat16)
    k = jnp.asarray(rs.randn(1, 1, s, 8), jnp.bfloat16)
    v = jnp.asarray(rs.randn(1, 1, s, 8), jnp.bfloat16)
    # d=512's itemsize/VMEM gate is what rejects flash at the real shape;
    # d is small here (CPU cost), so emulate the rejection via min_flash_seq
    # while asserting the real gate would indeed fire for d=512
    assert not (512 <= 128 or 4 * 512 * s * 2 <= 32 * 1024 * 1024)
    o = fa.attention(q, k, v, min_flash_seq=1 << 30)
    assert o.shape == q.shape
    assert called["chunk"] == 4096  # 1*1*16384 rows * 4096 * 4B = 256 MB slab
    # exactness vs the unchunked reference at this shape
    want = fa.xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32), 8 ** -0.5)
    np.testing.assert_allclose(np.asarray(o, np.float32), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_sdxl_shape_kernel_dispatch():
    """Pin the kernel/block decisions at every SDXL (1024px) attention
    geometry: stage-2 S=4096 and stage-3/mid S=1024 self-attention ride the
    flash kernel (d=64 heads), the 128x128 VAE mid-attention (S=16384, d=512)
    is rejected by the VMEM gate, and block sizes match the sweep table."""
    from eta_inversion_tpu.ops.flash_attention import flash_block_sizes

    # batch 8 pair-edit: UNet rows B=32 (2 prompts x CFG x 8), stage-2 has
    # 10 heads (640/64), stage-3/mid 20 (1280/64)
    assert flash_block_sizes(32 * 10, 4096, 64) == (512, 2048)
    assert flash_block_sizes(32 * 20, 1024, 64) == (256, 1024)  # onepass
    # VAE decode at 1024px: d=512 staged K/V = 4*512*16384*2B = 64 MB > gate
    assert not (4 * 512 * 16384 * 2 <= 32 * 1024 * 1024)
    # latency mode (batch 1, rows=4): small-BH block_q
    assert flash_block_sizes(4 * 10, 4096, 64) == (512, 2048)


def test_kernels_under_highest_matmul_precision():
    """eval.py's enable_deterministic() sets jax_default_matmul_precision=
    "highest"; kernel matmuls must pin an explicit precision so that global
    never reaches Mosaic (which rejects contract_precision<fp32> on bf16
    operands — 'Bad lhs type', found by the on-chip eval-harness smoke).
    Guards the code path + numerics under the config; the Mosaic-level
    rejection itself is only reachable on real TPU."""
    import jax

    from eta_inversion_tpu.ops.flash_attention import _KERNEL_PREC

    assert _KERNEL_PREC == jax.lax.Precision.DEFAULT
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        q, k, v = _mk(2, 1024, 40)
        scale = 40 ** -0.5
        o = flash_attention_bhsd(q, k, v, scale=scale, block_q=512,
                                 block_k=512, interpret=True)
        np.testing.assert_allclose(np.asarray(o), _ref(q, k, v, scale),
                                   rtol=2e-5, atol=2e-6)
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def test_attention_dispatch_chunks_non_pow2_seq(monkeypatch):
    """ADVICE r4 (low): an over-budget score tensor whose sq has no
    power-of-two divisor >= 256 (e.g. sq = 3 * 4096 = 12288 ... or a truly odd
    sq like 10000) must STILL be chunked — any divisor of sq is admissible.
    Previously the dispatcher silently fell back to the unchunked path and
    materialized the slab the budget exists to prevent."""
    import eta_inversion_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "on_tpu", lambda: True)
    called = {}
    real = fa.xla_attention_chunked

    def spy(q, k, v, scale, chunk):
        called["chunk"] = chunk
        return real(q, k, v, scale, chunk)

    monkeypatch.setattr(fa, "xla_attention_chunked", spy)
    rs = np.random.RandomState(13)
    sq = 10000  # divisors: 2^4 * 5^4 — largest pow2 divisor is 16
    # rows * chunk * 4 <= 256 MB with rows = b*h*sk = 10000
    # -> chunk <= 6710; largest divisor of 10000 below that is 5000
    q = jnp.asarray(rs.randn(1, 1, sq, 8), jnp.bfloat16)
    o = fa.attention(q, q * 0.5, q * 0.25, min_flash_seq=1 << 30)
    assert o.shape == q.shape
    assert called["chunk"] == 5000, called
    assert 1 * 1 * sq * called["chunk"] * 4 <= fa._XLA_SCORE_BUDGET


def test_chunk_size_always_respects_budget():
    import eta_inversion_tpu.ops.flash_attention as fa

    for sq in (257, 4096, 9216, 10000, 12288, 16384, 65536):
        for rows in (1024, 10000, 16384, 1 << 20):
            c = fa._chunk_size(sq, rows)
            assert sq % c == 0
            assert rows * c * 4 <= fa._XLA_SCORE_BUDGET or c == 1
