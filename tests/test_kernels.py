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
