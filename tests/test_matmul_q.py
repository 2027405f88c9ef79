"""Fused dequant+matmul kernel vs XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_backend_public_tpu.ops.matmul_q import matmul_quantized
from vllm_backend_public_tpu.ops.quant import quantize_int8, quantize_fp8


@pytest.mark.parametrize("m,k,n", [(16, 512, 1024), (8, 1024, 384),
                                   (128, 512, 512)])
def test_matmul_int8_matches_xla(m, k, n):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (m, k), dtype=jnp.float32)
    w = jax.random.normal(k2, (k, n), dtype=jnp.float32)
    qw = quantize_int8(w)
    ref = (jnp.dot(x, qw.q.astype(x.dtype),
                   preferred_element_type=jnp.float32) * qw.s)
    out = matmul_quantized(x, qw.q, qw.s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_matmul_fp8_matches_xla():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (16, 256), dtype=jnp.float32)
    w = jax.random.normal(k2, (256, 512), dtype=jnp.float32)
    qw = quantize_fp8(w)
    ref = (jnp.dot(x, qw.q.astype(x.dtype),
                   preferred_element_type=jnp.float32) * qw.s)
    out = matmul_quantized(x, qw.q, qw.s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_ragged_falls_back():
    """Shapes the kernel can't tile still produce correct results."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (16, 100), dtype=jnp.float32)
    w = jax.random.normal(key, (100, 200), dtype=jnp.float32)
    qw = quantize_int8(w)
    ref = (jnp.dot(x, qw.q.astype(x.dtype),
                   preferred_element_type=jnp.float32) * qw.s)
    out = matmul_quantized(x, qw.q, qw.s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
