"""Static (calibrated) W8A8 serving quantization contracts.

The serving int8 mode has two layouts:

  - quant="int8":        dynamic per-row activation scales, weights
                         quantized offline (`quantize_params_like`) — also
                         the CALIBRATION vehicle (it sows per-layer
                         activation abs-max into the "calib" collection);
  - quant="int8_static": one calibrated per-tensor activation scale stored
                         as a param — no per-call abs-max reduction, fully
                         offline weight prep (`static_quantize_params_like`
                         / `static_quantize_backbone`).

These tests pin the conversion pipeline end to end at tiny dims: fp32 model
→ dynamic int8 + calibration pass → static int8, asserting the static model
tracks fp32 (the accuracy contract behind the 2x-MXU serving mode) and that
the static tree is genuinely offline-prepared (int8 leaves, no batch_stats).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from icka_tpu.core.config import EncoderConfig, GateCLConfig, ICKAConfig
from icka_tpu.models.convert import (
    quantize_params_like,
    static_quantize_backbone,
    static_quantize_params_like,
)


def _cos_min(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    cos = (a * b).sum(-1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-9)
    return cos.min()


TINY = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=192, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)


def test_static_int8_encoder_close_to_fp32(rng):
    from icka_tpu.nn.bert import TextEncoder

    cfg = EncoderConfig(**TINY)
    ids = rng.integers(2, cfg.vocab_size, (4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.int32)

    fp = TextEncoder(cfg, with_pooler=False)
    params = fp.init(jax.random.PRNGKey(3), ids, mask)
    want, _ = fp.apply(params, ids, mask)

    dyn = TextEncoder(dataclasses.replace(cfg, quant="int8"),
                      with_pooler=False)
    dyn_init = dyn.init(jax.random.PRNGKey(3), ids, mask)
    dyn_params = quantize_params_like(dyn_init["params"], params["params"])

    # calibration: two batches, the second fed back so sow's maximum
    # reduce accumulates across batches
    calib = {}
    for seed in (0, 1):
        b_ids = np.random.default_rng(seed).integers(
            2, cfg.vocab_size, (4, 12)).astype(np.int32)
        vars_in = {"params": dyn_params}
        if calib:
            vars_in["calib"] = calib
        _, st = dyn.apply(vars_in, b_ids, mask, mutable=["calib"])
        calib = st["calib"]

    stat = TextEncoder(dataclasses.replace(cfg, quant="int8_static"),
                       with_pooler=False)
    st_init = stat.init(jax.random.PRNGKey(3), ids, mask)
    st_params = {"params": static_quantize_params_like(
        st_init["params"], params["params"], calib)}
    got, _ = stat.apply(st_params, ids, mask)

    assert _cos_min(want, got) > 0.99, _cos_min(want, got)
    # static act scales really were calibrated (not the 1/127 init)
    leaves = jax.tree_util.tree_leaves_with_path(st_params)
    scales = [l for p, l in leaves if "act_scale" in str(p)]
    assert len(scales) == cfg.num_hidden_layers * 6
    assert all(abs(float(s) - 1.0 / 127.0) > 1e-9 for s in scales)


def test_static_int8_backbone_close_to_fp32():
    from icka_tpu.models.resnet import VisualBackbone

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    fp = VisualBackbone(layers=(1, 1, 1, 1))
    v = fp.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    _, mean_fp, att_fp = fp.apply(v, jnp.asarray(imgs))

    dyn = VisualBackbone(layers=(1, 1, 1, 1), quant="int8")
    _, calib = dyn.apply(v, jnp.asarray(imgs), mutable=["calib"])
    calib = calib["calib"]

    stat = VisualBackbone(layers=(1, 1, 1, 1), quant="int8_static")
    st_init = stat.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    assert "batch_stats" not in st_init  # BN folded offline
    st_vars = static_quantize_backbone(st_init, v, calib)
    _, mean_q, att_q = stat.apply(st_vars, jnp.asarray(imgs))

    a = np.asarray(att_fp, np.float64).reshape(2, -1, 2048)
    b = np.asarray(att_q, np.float64).reshape(2, -1, 2048)
    assert _cos_min(a, b) > 0.99, _cos_min(a, b)
    # weights are pre-quantized int8 params, not derived in the forward
    leaves = jax.tree_util.tree_leaves_with_path(st_vars)
    assert any(l.dtype == np.int8 for _, l in leaves)


def test_static_int8_bilstm_close_to_fp32(rng):
    from icka_tpu.nn.lstm import BiLSTM

    x = rng.standard_normal((2, 8, 16)).astype(np.float32)
    fp = BiLSTM(hidden=12)
    params = fp.init(jax.random.PRNGKey(0), x)
    want = fp.apply(params, x)

    dyn = BiLSTM(hidden=12, quant="int8")
    _, st = dyn.apply(params, x, mutable=["calib"])
    calib = st["calib"]

    stat = BiLSTM(hidden=12, quant="int8_static")
    st_init = stat.init(jax.random.PRNGKey(0), x)
    st_params = {"params": static_quantize_params_like(
        st_init["params"], params["params"], calib)}
    got = stat.apply(st_params, x)
    assert _cos_min(want, got) > 0.99, _cos_min(want, got)


def _quant_icka_cfg(cfg: ICKAConfig, mode: str) -> ICKAConfig:
    return dataclasses.replace(
        cfg,
        embedding=dataclasses.replace(cfg.embedding, quant=mode),
        last_encoder=dataclasses.replace(cfg.last_encoder, quant=mode))


def test_static_int8_icka_flagship_close_to_fp32(rng):
    """The full serving pipeline contract: fp32 flagship → calibrated
    static-int8 flagship, emissions cosine > 0.99 per token."""
    from icka_tpu.models.icka import ICKAModel
    from tests.test_models import make_icka_batch

    cfg = ICKAConfig.tiny()
    batch, labels, mask_pos, offset = make_icka_batch(rng, cfg, B=2)

    fp = ICKAModel(cfg)
    params = fp.init(jax.random.PRNGKey(0), batch, mask_pos, offset,
                     mode="test")
    want, _ = fp.apply(params, method="emissions", mask_positions=mask_pos,
                       offset=offset,
                       **{k: batch[k] for k in batch if k != "output_mask"})

    dyn = ICKAModel(_quant_icka_cfg(cfg, "int8"))
    dyn_init = dyn.init(jax.random.PRNGKey(0), batch, mask_pos, offset,
                        mode="test")
    dyn_params = {"params": quantize_params_like(dyn_init["params"],
                                                 params["params"])}
    _, st = dyn.apply(dyn_params, batch, mask_pos, offset, mode="test",
                      mutable=["calib"])
    calib = st["calib"]

    stat = ICKAModel(_quant_icka_cfg(cfg, "int8_static"))
    st_init = stat.init(jax.random.PRNGKey(0), batch, mask_pos, offset,
                        mode="test")
    st_params = {"params": static_quantize_params_like(
        st_init["params"], params["params"], calib)}
    got, _ = stat.apply(st_params, method="emissions",
                        mask_positions=mask_pos, offset=offset,
                        **{k: batch[k] for k in batch
                           if k != "output_mask"})
    assert _cos_min(want, got) > 0.99, _cos_min(want, got)
    # the BiLSTM input projection is quantized too (VERDICT r02 next #2)
    lstm = st_params["params"]["lstm"]
    assert lstm["w_ih_q"].dtype == np.int8 and "act_scale" in lstm


def _gate_cl_args(rng, cfg: GateCLConfig, B=4):
    L = cfg.max_seq_length
    return (
        rng.integers(2, cfg.encoder.vocab_size, (B, L)).astype(np.int32),
        np.zeros((B, L), np.int32),
        np.ones((B, L), np.int32),
        np.ones((B, cfg.num_regions), np.int32),
        rng.standard_normal((B, cfg.region_dim)).astype(np.float32),
        rng.standard_normal((B, 7, 7, cfg.region_dim)).astype(np.float32),
    )


def test_int8_gate_cl_close_to_fp32(rng):
    """gate_cl serving quantization contract (VERDICT r02 next #1): both
    the dynamic and the calibrated static int8 models track the fp32
    emissions at cosine > 0.995 per token."""
    from icka_tpu.models.gate_cl import GateCLModel

    cfg = GateCLConfig.tiny()
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder,
                                         hidden_dropout_prob=0.0,
                                         attention_probs_dropout_prob=0.0))
    args = _gate_cl_args(rng, cfg)

    fp = GateCLModel(cfg)
    params = fp.init(jax.random.PRNGKey(0), *args)
    want = fp.apply(params, *args, return_emissions=True)

    dyn_cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, quant="int8"))
    dyn = GateCLModel(dyn_cfg)
    dyn_init = dyn.init(jax.random.PRNGKey(0), *args)
    dyn_params = {"params": quantize_params_like(dyn_init["params"],
                                                 params["params"])}
    got_dyn, st = dyn.apply(dyn_params, *args, return_emissions=True,
                            mutable=["calib"])
    assert _cos_min(want, got_dyn) > 0.995, _cos_min(want, got_dyn)

    st_cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, quant="int8_static"))
    stat = GateCLModel(st_cfg)
    st_init = stat.init(jax.random.PRNGKey(0), *args)
    st_params = {"params": static_quantize_params_like(
        st_init["params"], params["params"], st["calib"])}
    got_st = stat.apply(st_params, *args, return_emissions=True)
    assert _cos_min(want, got_st) > 0.995, _cos_min(want, got_st)

    # decoded tags agree too (the metric the serving mode actually ships)
    tags_fp = np.asarray(fp.apply(params, *args))
    tags_st = np.asarray(stat.apply(st_params, *args))
    assert (tags_fp == tags_st).mean() > 0.9


def test_fused_qkv_fp32_exact(rng):
    """fuse_qkv=True is a pure re-layout: converting an unfused fp32 tree
    with `fuse_qkv_params` must reproduce the unfused outputs exactly."""
    from icka_tpu.models.convert import fuse_qkv_params
    from icka_tpu.nn.bert import TextEncoder

    cfg = EncoderConfig(**TINY)
    ids = rng.integers(2, cfg.vocab_size, (4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.int32)

    fp = TextEncoder(cfg, with_pooler=False)
    params = fp.init(jax.random.PRNGKey(3), ids, mask)
    want, _ = fp.apply(params, ids, mask)

    fused = TextEncoder(dataclasses.replace(cfg, fuse_qkv=True),
                        with_pooler=False)
    f_init = fused.init(jax.random.PRNGKey(3), ids, mask)
    f_params = {"params": fuse_qkv_params(f_init["params"],
                                          params["params"])}
    got, _ = fused.apply(f_params, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_fused_qkv_int8_static_serving_stack(rng):
    """The full serving conversion: fp32 → calibrate (dynamic int8,
    unfused) → fuse (params + calib) → static quantize → fused int8_static
    forward stays close to fp32."""
    from icka_tpu.models.convert import fuse_qkv_params
    from icka_tpu.nn.bert import TextEncoder

    cfg = EncoderConfig(**TINY)
    ids = rng.integers(2, cfg.vocab_size, (4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.int32)

    fp = TextEncoder(cfg, with_pooler=False)
    params = fp.init(jax.random.PRNGKey(3), ids, mask)
    want, _ = fp.apply(params, ids, mask)

    dyn = TextEncoder(dataclasses.replace(cfg, quant="int8"),
                      with_pooler=False)
    dyn_init = dyn.init(jax.random.PRNGKey(3), ids, mask)
    dyn_params = quantize_params_like(dyn_init["params"], params["params"])
    _, st = dyn.apply({"params": dyn_params}, ids, mask, mutable=["calib"])
    calib = st["calib"]

    stat = TextEncoder(dataclasses.replace(cfg, quant="int8_static",
                                           fuse_qkv=True),
                       with_pooler=False)
    st_init = stat.init(jax.random.PRNGKey(3), ids, mask)
    fused_fp32 = fuse_qkv_params(st_init["params"], params["params"])
    fused_calib = fuse_qkv_params(st_init["params"], calib)
    st_params = {"params": static_quantize_params_like(
        st_init["params"], fused_fp32, fused_calib)}
    got, _ = stat.apply(st_params, ids, mask)
    assert _cos_min(want, got) > 0.99, _cos_min(want, got)
    # the fused layout really has ONE projection per layer (4 act scales:
    # qkv, attn out, ffn wi, ffn wo)
    leaves = jax.tree_util.tree_leaves_with_path(st_params)
    scales = [l for p, l in leaves if "act_scale" in str(p)]
    assert len(scales) == cfg.num_hidden_layers * 4


def test_bf16_softmax_close_to_fp32(rng):
    """softmax_dtype="bfloat16" (serving bandwidth knob) must stay within
    the serving accuracy contract of the fp32-softmax encoder."""
    from icka_tpu.nn.bert import TextEncoder

    cfg = EncoderConfig(**TINY)
    ids = rng.integers(2, cfg.vocab_size, (4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.int32)
    fp = TextEncoder(cfg, with_pooler=False)
    params = fp.init(jax.random.PRNGKey(3), ids, mask)
    want, _ = fp.apply(params, ids, mask)

    soft = TextEncoder(dataclasses.replace(cfg, softmax_dtype="bfloat16"),
                       with_pooler=False)
    got, _ = soft.apply(params, ids, mask)
    assert _cos_min(want, got) > 0.999, _cos_min(want, got)
