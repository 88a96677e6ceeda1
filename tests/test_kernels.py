"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icka_tpu.kernels.attention import attention_reference, fused_attention

ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.parametrize("shape", [
    (2, 128, 64, 8),    # txt2img: 128 text queries × padded image keys
    (2, 64, 64, 4),     # self-attention
    (1, 8, 128, 4),     # single query row attending many keys
])
def test_fused_attention_matches_reference(rng, shape):
    B, Sq, Sk, N = shape
    D = N * 16
    q = rng.standard_normal((B, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, Sk, D)).astype(np.float32)
    v = rng.standard_normal((B, Sk, D)).astype(np.float32)
    # mask off the tail keys like the 49-region pad
    key_mask = np.ones((B, Sk), np.float32)
    key_mask[:, Sk - 7:] = 0
    bias = ((1.0 - key_mask) * -10000.0)[:, None, None, :]

    got = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(bias), num_heads=N,
                          interpret=not ON_TPU)
    want = attention_reference(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), jnp.asarray(bias),
                               num_heads=N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_fused_attention_bf16(rng):
    B, Sq, Sk, N = 2, 64, 64, 4
    D = N * 32
    q = rng.standard_normal((B, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, Sk, D)).astype(np.float32)
    v = rng.standard_normal((B, Sk, D)).astype(np.float32)
    bias = np.zeros((B, 1, 1, Sk), np.float32)
    got = fused_attention(jnp.asarray(q, jnp.bfloat16),
                          jnp.asarray(k, jnp.bfloat16),
                          jnp.asarray(v, jnp.bfloat16),
                          jnp.asarray(bias), num_heads=N,
                          interpret=not ON_TPU)
    want = attention_reference(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), jnp.asarray(bias),
                               num_heads=N)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.06, rtol=0.06)


def test_mha_pallas_path_matches_einsum(rng):
    """MultiHeadAttention(use_pallas=True) equals the einsum core."""
    from icka_tpu.nn.attention import MultiHeadAttention

    B, Sq, Sk, N, D = 2, 16, 8, 4, 32
    x = rng.standard_normal((B, Sq, D)).astype(np.float32)
    kv = rng.standard_normal((B, Sk, D)).astype(np.float32)
    bias = np.zeros((B, 1, 1, Sk), np.float32)
    bias[:, :, :, -2:] = -10000.0

    ref = MultiHeadAttention(num_heads=N, dropout_rate=0.0)
    params = ref.init(jax.random.PRNGKey(0), x, kv, jnp.asarray(bias))
    want = ref.apply(params, x, kv, jnp.asarray(bias))
    fast = MultiHeadAttention(num_heads=N, dropout_rate=0.0,
                              use_pallas=True)
    got = fast.apply(params, x, kv, jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
