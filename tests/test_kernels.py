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


# --- round-4 v2 fused conv kernels -----------------------------------------


def test_bottleneck_v2_bit_exact(rng):
    """Patch-concat fused bottleneck == XLA reference semantics, bitwise."""
    from icka_tpu.kernels.conv import (bottleneck_reference,
                                       int8_bottleneck_v2)
    B, H, W, Cw = 4, 8, 8, 16
    Cin = 4 * Cw
    x = jnp.asarray(rng.integers(-127, 128, (B, H, W, Cin)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-127, 128, (Cin, Cw)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (9 * Cw, Cw)), jnp.int8)
    w3 = jnp.asarray(rng.integers(-127, 128, (Cw, Cin)), jnp.int8)
    s1 = jnp.asarray(rng.uniform(1e-4, 1e-3, (Cw,)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 1, (Cw,)), jnp.float32)
    s2 = jnp.asarray(rng.uniform(1e-4, 1e-3, (Cw,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 1, (Cw,)), jnp.float32)
    s3 = jnp.asarray(rng.uniform(1e-4, 1e-3, (Cin,)), jnp.float32)
    b3 = jnp.asarray(rng.normal(0, 1, (Cin,)), jnp.float32)
    for out_bf16 in (False, True):
        for g in (1, 2):
            got = int8_bottleneck_v2(
                x, w1, w2, w3, s1, b1, s2, b2, s3, b3, 0.37,
                out_bf16=out_bf16, g=g, interpret=not ON_TPU)
            ref = bottleneck_reference(
                x, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                res_scale=0.37, out_bf16=out_bf16)
            assert bool(jnp.all(got == ref)), (out_bf16, g)


def test_stem_pool_kernel_bit_exact(rng):
    """Fused stem dot+epilogue+s2d-maxpool == the XLA StemPoolS2D tail."""
    from icka_tpu.kernels.conv import int8_stem_pool
    B, OB, F, K = 3, 8, 64, 432
    pt = jnp.asarray(rng.integers(-127, 128, (B, OB, OB, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (K, 4 * F)), jnp.int8)
    sc = jnp.asarray(rng.uniform(1e-4, 1e-3, (4 * F,)), jnp.float32)
    bs = jnp.asarray(rng.normal(0, 0.5, (4 * F,)), jnp.float32)
    got = int8_stem_pool(pt, w, sc, bs, interpret=not ON_TPU)
    # reference = the XLA StemPoolS2D tail, including its bf16 rounding
    # points ((int32->fp32 * scale) -> bf16, + bf16 bias, pool in bf16)
    y = jax.lax.dot_general(pt, w, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * sc).astype(jnp.bfloat16) \
        + bs.astype(jnp.bfloat16)
    y = jnp.maximum(y.reshape(B, OB, OB, 2, 2, F),
                    jnp.zeros((), jnp.bfloat16))
    p0, p1 = y[:, :, :, 0], y[:, :, :, 1]
    p1s = jnp.pad(p1, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :OB]
    r = jnp.maximum(jnp.maximum(p0, p1), p1s)
    q0, q1 = r[:, :, :, 0], r[:, :, :, 1]
    q1s = jnp.pad(q1, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :OB]
    ref = jnp.maximum(jnp.maximum(q0, q1), q1s).astype(jnp.bfloat16)
    assert bool(jnp.all(got == ref))


def test_fused_backbone_matches_production(rng):
    """End-to-end: fused-Pallas int8_static backbone vs the XLA int8_static
    path, both quantized from the same fp32 weights via the real converter
    (exercises the out_scale chaining fix-up). The int8-resident chain
    skips the production path's bf16 round-trips between convs, so the
    contract is closeness, not bit-equality."""
    from icka_tpu.models.resnet import VisualBackbone
    from icka_tpu.models.convert import static_quantize_backbone

    layers = (2, 2)
    B = 4
    imgs = rng.standard_normal((B, 32, 32, 3)).astype(np.float32) * 0.5

    fp32 = VisualBackbone(layers=layers, att_size=2, dtype=jnp.float32)
    fvars = fp32.init(jax.random.PRNGKey(0), jnp.asarray(imgs))

    dyn = VisualBackbone(layers=layers, att_size=2, dtype=jnp.bfloat16,
                         quant="int8")
    _, calib = dyn.apply(
        {"params": fvars["params"], "batch_stats": fvars["batch_stats"]},
        jnp.asarray(imgs, jnp.bfloat16), mutable=["calib"])

    fused_model = VisualBackbone(layers=layers, att_size=2,
                                 dtype=jnp.bfloat16, quant="int8_static",
                                 fused_pallas=True,
                                 pallas_interpret=not ON_TPU)
    tvars = fused_model.init(jax.random.PRNGKey(1),
                             jnp.asarray(imgs, jnp.bfloat16))
    qvars = static_quantize_backbone(tvars, fvars, calib["calib"])

    def drop_out_scale(t):
        if isinstance(t, dict):
            return {k: drop_out_scale(v) for k, v in t.items()
                    if k != "out_scale"}
        return t

    prod = VisualBackbone(layers=layers, att_size=2, dtype=jnp.bfloat16,
                          quant="int8_static")
    _, _, att_prod = prod.apply(drop_out_scale(qvars),
                                jnp.asarray(imgs, jnp.bfloat16))
    _, _, att_fused = fused_model.apply(qvars,
                                        jnp.asarray(imgs, jnp.bfloat16))
    a = np.asarray(att_prod, np.float32).ravel()
    b = np.asarray(att_fused, np.float32).ravel()
    cos = float((a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.995, cos
    _, _, att_fp32 = fp32.apply(fvars, jnp.asarray(imgs))
    c = np.asarray(att_fp32, np.float32).ravel()
    cos_fp32 = float((b @ c) / (np.linalg.norm(b) * np.linalg.norm(c) + 1e-9))
    assert cos_fp32 > 0.99, cos_fp32


def test_fused_stem_bit_identical_to_xla_stem(rng):
    """StemPoolS2D(fused_pallas=True) is bit-identical to the XLA s2d stem
    (same integer dot, same epilogue arithmetic)."""
    from icka_tpu.models.resnet import StemPoolS2D
    B = 2
    x = jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.bfloat16)
    ref_m = StemPoolS2D(dtype=jnp.bfloat16, quant="int8_static")
    v = ref_m.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(lambda a: a, v)
    # random non-trivial weights
    p = dict(v["params"])
    rngs = np.random.default_rng(1)
    p["wq"] = jnp.asarray(rngs.integers(-127, 128, (147, 64)), jnp.int8)
    p["w_scale"] = jnp.asarray(rngs.uniform(1e-4, 1e-3, (64,)), jnp.float32)
    p["fused_bias"] = jnp.asarray(rngs.normal(0, 0.5, (64,)), jnp.float32)
    v = {"params": p}
    want = ref_m.apply(v, x)
    got = StemPoolS2D(dtype=jnp.bfloat16, quant="int8_static",
                      fused_pallas=True,
                      pallas_interpret=not ON_TPU).apply(v, x)
    assert bool(jnp.all(got == want))


# ---------------------------------------------------------------------------
# Blockwise (flash-style) attention (VERDICT r04 next #5)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,blocks", [
    ((2, 128, 64, 8), (32, 32)),     # multi-block both dims
    ((2, 64, 64, 4), (64, 64)),      # single block (degenerates to fused)
    ((1, 48, 256, 4), (16, 128)),    # long keys: the length-scalable case
    ((2, 24, 24, 4), (128, 128)),    # blocks snap down to the seq dims
])
def test_blockwise_attention_matches_reference(rng, shape, blocks):
    from icka_tpu.kernels.attention import fused_attention_blockwise
    B, Sq, Sk, N = shape
    bq, bk = blocks
    D = N * 16
    q = rng.standard_normal((B, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, Sk, D)).astype(np.float32)
    v = rng.standard_normal((B, Sk, D)).astype(np.float32)
    key_mask = np.ones((B, Sk), np.float32)
    key_mask[:, Sk - 7:] = 0
    bias = ((1.0 - key_mask) * -10000.0)[:, None, None, :]

    got = fused_attention_blockwise(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        num_heads=N, block_q=bq, block_k=bk, interpret=not ON_TPU)
    want = attention_reference(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), jnp.asarray(bias),
                               num_heads=N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_blockwise_attention_full_bias_and_bf16(rng):
    """Full (B, Sq, Sk) biases (the packed block-diagonal masks) block
    along BOTH dims; bf16 inputs ride the MXU path."""
    from icka_tpu.kernels.attention import fused_attention_blockwise
    B, Sq, Sk, N = 2, 64, 64, 4
    D = N * 32
    q = rng.standard_normal((B, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, Sk, D)).astype(np.float32)
    v = rng.standard_normal((B, Sk, D)).astype(np.float32)
    # block-diagonal packed-style mask
    slot = (np.arange(Sq) // 32)
    full = (slot[:, None] == slot[None, :]).astype(np.float32)
    bias = ((1.0 - full) * -10000.0)[None].repeat(B, 0)

    got = fused_attention_blockwise(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        num_heads=N, block_q=32, block_k=32, interpret=not ON_TPU)
    want = attention_reference(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), jnp.asarray(bias[:, None]),
                               num_heads=N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    got16 = fused_attention_blockwise(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(bias),
        num_heads=N, block_q=32, block_k=32, interpret=not ON_TPU)
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got16, np.float32),
                               np.asarray(want), atol=0.06, rtol=0.06)
