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


def test_int4_pack_roundtrip():
    from vllm_backend_public_tpu.ops.quant import pack_int4, unpack_int4
    key = jax.random.PRNGKey(3)
    q = jax.random.randint(key, (64, 32), -8, 8, dtype=jnp.int8)
    packed = pack_int4(q)
    assert packed.shape == (32, 32)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)),
                                  np.asarray(q))


@pytest.mark.parametrize("m,k,n,g", [(16, 512, 512, 128), (8, 1024, 384, 256),
                                     (64, 512, 1024, 128)])
def test_matmul_int4_matches_grouped_reference(m, k, n, g):
    from vllm_backend_public_tpu.ops.matmul_q import matmul_int4
    from vllm_backend_public_tpu.ops.quant import quantize_int4, unpack_int4

    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (m, k), dtype=jnp.float32)
    w = jax.random.normal(k2, (k, n), dtype=jnp.float32)
    qw = quantize_int4(w, group_size=g)
    assert qw.q.shape == (k // 2, n)

    # reference: unpack + per-group dequant matmul
    qd = unpack_int4(qw.q).astype(jnp.float32).reshape(k // g, g, n)
    ref = jnp.einsum("mgi,gio->mgo", x.reshape(m, k // g, g), qd)
    ref = (ref * qw.s).sum(axis=1)

    out = matmul_int4(x, qw.q, qw.s, g, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_int4_linear_dispatch_packed():
    """linear.matmul on a packed int4 weight matches fp32 within quant tol."""
    from vllm_backend_public_tpu.ops.linear import matmul
    from vllm_backend_public_tpu.ops.quant import quantize_int4

    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (4, 256), dtype=jnp.float32)
    w = jax.random.normal(k2, (256, 128), dtype=jnp.float32) * 0.05
    from vllm_backend_public_tpu.ops.quant import unpack_int4
    qw = quantize_int4(w, group_size=128)
    out = matmul(x, qw)  # CPU -> XLA unpack path
    # exact reference: matmul against the dequantized weights
    wd = (unpack_int4(qw.q).astype(jnp.float32).reshape(2, 128, 128)
          * qw.s[:, None, :]).reshape(256, 128)
    ref = x @ wd
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # and it stays a faithful int4 approximation of the fp32 matmul
    err = np.abs(np.asarray(out) - np.asarray(x @ w)).mean()
    assert err / np.abs(np.asarray(x @ w)).mean() < 0.25


def test_stacked_kernels_match_sliced():
    """Zero-copy stacked-layer kernels == slicing the layer first."""
    from vllm_backend_public_tpu.ops.matmul_q import (
        matmul_int4, matmul_int4_stacked, matmul_quantized,
        matmul_quantized_stacked, matmul_w8a8, matmul_w8a8_stacked)

    key = jax.random.PRNGKey(7)
    L, M, K, N, G = 3, 16, 512, 512, 128
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (M, K), dtype=jnp.float32)
    W = jax.random.randint(k2, (L, K, N), -127, 128, dtype=jnp.int8)
    S = jax.random.uniform(k3, (L, N), dtype=jnp.float32) + 0.5
    Wp = jax.random.randint(k2, (L, K // 2, N), -128, 128, dtype=jnp.int8)
    S4 = jax.random.uniform(k3, (L, K // G, N), dtype=jnp.float32) + 0.5

    for li in (0, L - 1):
        ref = matmul_quantized(x, W[li], S[li], interpret=True)
        out = matmul_quantized_stacked(x, W, S, jnp.int32(li),
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

        ref = matmul_w8a8(x, W[li], S[li], interpret=True)
        out = matmul_w8a8_stacked(x, W, S, jnp.int32(li), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

        ref = matmul_int4(x, Wp[li], S4[li], G, interpret=True)
        out = matmul_int4_stacked(x, Wp, S4, G, jnp.int32(li),
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_layer_view_dispatch():
    """matmul on a LayerView == matmul on the sliced weight (XLA path)."""
    from vllm_backend_public_tpu.ops.linear import LayerView, matmul
    from vllm_backend_public_tpu.ops.quant import quantize_int8

    key = jax.random.PRNGKey(8)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (4, 64), dtype=jnp.float32)
    W = jax.random.normal(k2, (3, 64, 32), dtype=jnp.float32)
    qw = quantize_int8(W)  # stacked [L, K, N] int8
    for li in (0, 2):
        from vllm_backend_public_tpu.ops.linear import QuantizedWeight
        sliced = QuantizedWeight("int8", qw.q[li], qw.s[li])
        ref = matmul(x, sliced)
        out = matmul(x, LayerView(qw, jnp.int32(li)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # dense stacked
        ref = x @ W[li]
        out = matmul(x, LayerView(W, jnp.int32(li)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


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
