"""Model-level tests: flagship ICKA and the gate_cl family on tiny configs.

Includes parity checks for the vectorized InfoNCE and the negative-pair
permutation against straightforward torch/loop references implementing the
reference's per-sample math."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from icka_tpu.core.config import GateCLConfig, ICKAConfig
from icka_tpu.models.gate_cl import (
    GateCLModel,
    info_nce,
    negative_swap_permutation,
)
from icka_tpu.models.icka import ICKAModel


def make_icka_batch(rng, cfg: ICKAConfig, B=2, offset=14, m1=3, m2=11):
    L = cfg.max_seq_length
    Lp = offset + L
    vocab = cfg.embedding.vocab_size
    H = cfg.embedding.hidden_size
    batch = {
        "input_ids": rng.integers(2, vocab, (B, Lp)).astype(np.int32),
        "segment_ids": np.concatenate(
            [np.zeros((B, offset), np.int32), np.ones((B, L), np.int32)], 1),
        "input_mask": np.ones((B, Lp), np.int32),
        "ori_input_ids": rng.integers(2, vocab, (B, L)).astype(np.int32),
        "ori_input_mask": np.ones((B, L), np.int32),
        "ori_segment_ids": np.zeros((B, L), np.int32),
        "img_mask": np.ones((B, cfg.num_regions), np.int32),
        "clip_features": rng.standard_normal((B, 1, cfg.clip_dim))
        .astype(np.float32),
        "visual_mean": rng.standard_normal((B, cfg.region_dim))
        .astype(np.float32),
        "visual_grid": rng.standard_normal((B, 7, 7, cfg.region_dim))
        .astype(np.float32),
        "output_mask": np.ones((B, L), np.int32),
    }
    labels = rng.integers(0, cfg.num_labels, (B, L)).astype(np.int32)
    return batch, labels, (m1, m2), offset


def test_icka_forward_modes(rng):
    cfg = ICKAConfig.tiny()
    batch, labels, mask_pos, offset = make_icka_batch(rng, cfg)
    model = ICKAModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, mask_pos, offset,
                        mode="test")
    loss = model.apply(params, batch, mask_pos, offset, mode="train",
                       labels=labels, deterministic=True)
    assert np.isfinite(float(loss)) and float(loss) > 0
    pred, dev_loss = model.apply(params, batch, mask_pos, offset,
                                 mode="dev", labels=labels)
    assert pred.shape == labels.shape
    np.testing.assert_allclose(float(dev_loss), float(loss), rtol=1e-5)
    test_pred = model.apply(params, batch, mask_pos, offset, mode="test")
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(test_pred))


def test_icka_prompted_input_tail_slack(rng):
    """The featurized layout pads the prompted input to `max_input_length`
    which can EXCEED offset + max_seq_length (`features.py:126-128` slack
    for long wordpiece expansions). The sentence-region slice must come
    from the bare-sentence length, not the prompted tensor's tail
    (regression: shape-derived sent_len overshot under slack and broke the
    CLI path)."""
    cfg = ICKAConfig.tiny()
    batch, labels, mask_pos, offset = make_icka_batch(rng, cfg)
    model = ICKAModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, mask_pos, offset,
                        mode="test")
    pred = model.apply(params, batch, mask_pos, offset, mode="test")

    slack = 7
    B = batch["input_ids"].shape[0]
    padded = dict(batch)
    padded["input_ids"] = np.concatenate(
        [batch["input_ids"], np.ones((B, slack), np.int32)], axis=1)
    padded["input_mask"] = np.concatenate(
        [batch["input_mask"], np.zeros((B, slack), np.int32)], axis=1)
    padded["segment_ids"] = np.concatenate(
        [batch["segment_ids"], np.zeros((B, slack), np.int32)], axis=1)
    pred_slack = model.apply(params, padded, mask_pos, offset, mode="test")
    assert pred_slack.shape == labels.shape
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred_slack))


def test_icka_train_with_dropout_rng(rng):
    cfg = ICKAConfig.tiny()
    batch, labels, mask_pos, offset = make_icka_batch(rng, cfg)
    model = ICKAModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, mask_pos, offset,
                        mode="test")
    loss = model.apply(params, batch, mask_pos, offset, mode="train",
                       labels=labels,
                       rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("flag", ["use_txt2img", "use_alignment",
                                  "use_vision_prompt", "use_alignment_prompt",
                                  "use_gate"])
def test_icka_ablations_run(rng, flag):
    import dataclasses
    cfg = dataclasses.replace(ICKAConfig.tiny(), **{flag: False})
    batch, labels, mask_pos, offset = make_icka_batch(rng, cfg)
    model = ICKAModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, mask_pos, offset,
                        mode="test")
    loss = model.apply(params, batch, mask_pos, offset, mode="train",
                       labels=labels, deterministic=True)
    assert np.isfinite(float(loss))


def test_icka_gradients_flow(rng):
    cfg = ICKAConfig.tiny()
    batch, labels, mask_pos, offset = make_icka_batch(rng, cfg)
    model = ICKAModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, mask_pos, offset,
                        mode="test")

    def loss_fn(p):
        return model.apply(p, batch, mask_pos, offset, mode="train",
                           labels=labels, deterministic=True)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(g["params"])
    nonzero = sum(bool(np.any(np.asarray(v) != 0)) for _, v in flat)
    # every major branch should receive gradient
    assert nonzero / len(flat) > 0.9, f"only {nonzero}/{len(flat)} grads"


def torch_info_nce(text, image, temp, temp_lamb):
    """Reference per-sample loops (`gate_cl_modeling.py:1276-1316`)."""
    text = torch.as_tensor(text)
    image = torch.as_tensor(image)
    B = text.shape[0]

    def t2i():
        loss = 0
        for i in range(B):
            up = torch.exp((text[i] @ image[i]
                            / (text[i].norm() * image[i].norm())) / temp)
            down = torch.sum(torch.exp(
                (torch.sum(text[i] * image, dim=-1)
                 / (text[i].norm() * image.norm(dim=1))) / temp))
            loss += -torch.log(up / down)
        return loss

    def i2t():
        loss = 0
        for i in range(B):
            up = torch.exp((image[i] @ text[i]
                            / (image[i].norm() * text[i].norm())) / temp)
            down = torch.sum(torch.exp(
                (torch.sum(image[i] * text, dim=-1)
                 / (image[i].norm() * text.norm(dim=1))) / temp))
            loss += -torch.log(up / down)
        return loss

    return ((temp_lamb * t2i() + (1 - temp_lamb) * i2t()) / B).item()


def test_info_nce_matches_reference_loops(rng):
    B, H = 7, 12
    text = rng.standard_normal((B, H)).astype(np.float32)
    image = rng.standard_normal((B, H)).astype(np.float32)
    got = float(info_nce(jnp.asarray(text), jnp.asarray(image), 0.179, 0.7))
    want = torch_info_nce(text, image, 0.179, 0.7)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_negative_swap_permutation_matches_reference():
    """Swap semantics from gate_cl_modeling.py:1348-1356: in the last R
    samples, element i of the front half exchanges with element i of the
    back half."""
    B, R = 20, 16
    perm = negative_swap_permutation(B, R)
    x = np.arange(B)
    swapped = x[perm]
    # reference loop
    want = x.copy()
    neg = want[B - R:].copy()
    front = neg[: R // 2].copy()
    neg[: R // 2] = neg[R // 2:]
    neg[R // 2:] = front
    want[B - R:] = neg
    np.testing.assert_array_equal(swapped, want)
    # no swap when batch too small
    np.testing.assert_array_equal(negative_swap_permutation(8, 16),
                                  np.arange(8))


@pytest.mark.parametrize("variant", ["ip", "cl", "gate_cl"])
def test_gate_cl_variants(rng, variant):
    cfg = GateCLConfig.tiny(variant=variant)
    B, L = 20, cfg.max_seq_length
    vocab = cfg.encoder.vocab_size
    ids = rng.integers(2, vocab, (B, L)).astype(np.int32)
    seg = np.zeros((B, L), np.int32)
    mask = np.ones((B, L), np.int32)
    img_mask = np.ones((B, cfg.num_regions), np.int32)
    vmean = rng.standard_normal((B, cfg.region_dim)).astype(np.float32)
    vgrid = rng.standard_normal((B, 7, 7, cfg.region_dim)).astype(np.float32)
    labels = rng.integers(0, cfg.num_labels, (B, L)).astype(np.int32)

    model = GateCLModel(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, seg, mask, img_mask,
                        vmean, vgrid)
    loss = model.apply(params, ids, seg, mask, img_mask, vmean, vgrid,
                       labels=labels, deterministic=True)
    assert np.isfinite(float(loss))
    pred = model.apply(params, ids, seg, mask, img_mask, vmean, vgrid)
    assert pred.shape == (B, L)


def test_remat_encoder_loss_identical():
    """Per-layer remat (EncoderConfig.remat) must not change the math —
    identical train loss, finite nonzero grads (it only trades backward
    memory for recompute; required to fit flagship training in HBM)."""
    import dataclasses

    import jax
    import numpy as np

    from icka_tpu.core.config import EncoderConfig, ICKAConfig
    from icka_tpu.models.icka import ICKAModel

    enc = EncoderConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=128)
    cfg = ICKAConfig(embedding=enc, last_encoder=enc, layer_num1=1,
                     region_dim=32, clip_dim=16, prompt_hidden=16,
                     last_hidden=32, max_seq_length=16)
    rcfg = dataclasses.replace(
        cfg, embedding=dataclasses.replace(enc, remat=True),
        last_encoder=dataclasses.replace(enc, remat=True))
    rng = np.random.default_rng(0)
    B, L, OFF = 2, 16, 10
    batch = {
        "input_ids": rng.integers(2, 128, (B, OFF + L)).astype(np.int32),
        "segment_ids": np.concatenate([np.zeros((B, OFF), np.int32),
                                       np.ones((B, L), np.int32)], 1),
        "input_mask": np.ones((B, OFF + L), np.int32),
        "ori_input_ids": rng.integers(2, 128, (B, L)).astype(np.int32),
        "ori_input_mask": np.ones((B, L), np.int32),
        "ori_segment_ids": np.zeros((B, L), np.int32),
        "img_mask": np.ones((B, 49), np.int32),
        "clip_features": rng.standard_normal((B, 1, 16)).astype(np.float32),
        "visual_mean": rng.standard_normal((B, 32)).astype(np.float32),
        "visual_grid": rng.standard_normal((B, 7, 7, 32))
        .astype(np.float32),
        "output_mask": np.ones((B, L), np.int32),
    }
    labels = rng.integers(0, cfg.num_labels, (B, L)).astype(np.int32)
    m, mr = ICKAModel(cfg), ICKAModel(rcfg)
    p = m.init(jax.random.PRNGKey(0), batch, (3, 7), OFF, mode="test")
    loss = float(m.apply(p, batch, (3, 7), OFF, mode="train",
                         labels=labels, deterministic=True))
    loss_r = float(mr.apply(p, batch, (3, 7), OFF, mode="train",
                            labels=labels, deterministic=True))
    assert abs(loss - loss_r) < 1e-6
    g = jax.grad(lambda p: mr.apply(p, batch, (3, 7), OFF, mode="train",
                                    labels=labels, deterministic=True))(p)
    gn = float(sum(np.abs(np.asarray(l)).sum()
                   for l in jax.tree.leaves(g)))
    assert np.isfinite(gn) and gn > 0
