"""Pallas paged-decode-attention kernel vs XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_backend_public_tpu.models.common import paged_attention_xla
from vllm_backend_public_tpu.ops.attention import paged_decode_attention


@pytest.mark.parametrize("nh,nkv,d", [(8, 8, 64), (8, 2, 64), (4, 4, 128)])
def test_decode_kernel_matches_xla(nh, nkv, d):
    B, MB, BS, NB = 4, 4, 16, 32
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (B, 1, nh, d), dtype=jnp.float32)
    k_pages = jax.random.normal(k2, (NB, nkv, BS, d), dtype=jnp.float32)
    v_pages = jax.random.normal(k3, (NB, nkv, BS, d), dtype=jnp.float32)
    bt = jax.random.permutation(k4, jnp.arange(1, NB))[:B * MB].reshape(B, MB)
    bt = bt.astype(jnp.int32)
    # assorted context lengths incl. exactly-full pages and empty (inactive)
    kv_lens = jnp.array([7, BS * 2, BS * MB, 0], dtype=jnp.int32)
    positions = (kv_lens - 1).clip(0)[:, None]

    scale = 1.0 / np.sqrt(d)
    ref = paged_attention_xla(q, k_pages, v_pages, bt, kv_lens, positions,
                              scale)
    out = paged_decode_attention(q[:, 0], k_pages, v_pages, bt, kv_lens,
                                 scale, interpret=True)[:, None]
    # rows with kv_len == 0 are masked garbage in both paths; compare valid
    valid = np.asarray(kv_lens) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_bf16():
    B, MB, BS, NB, nh, nkv, d = 2, 2, 16, 8, 4, 2, 64
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, 1, nh, d), dtype=jnp.bfloat16)
    k_pages = jax.random.normal(k2, (NB, nkv, BS, d), dtype=jnp.bfloat16)
    v_pages = jax.random.normal(k3, (NB, nkv, BS, d), dtype=jnp.bfloat16)
    bt = jnp.arange(1, 1 + B * MB, dtype=jnp.int32).reshape(B, MB)
    kv_lens = jnp.array([20, 31], dtype=jnp.int32)
    positions = (kv_lens - 1)[:, None]
    scale = 1.0 / np.sqrt(d)
    ref = paged_attention_xla(q, k_pages, v_pages, bt, kv_lens, positions,
                              scale)
    out = paged_decode_attention(q[:, 0], k_pages, v_pages, bt, kv_lens,
                                 scale, interpret=True)[:, None]
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        rtol=2e-2, atol=2e-2)
