"""ChunkAlign VCR model tests: staged masks, chunk-mean queries, heads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icka_tpu.models.chunkalign import (
    ChunkAlignCLS,
    ChunkAlignConfig,
    GlobalVLEncoder,
    StagedVLEncoder,
    binary_to_mp,
    chunk_mean_queries,
)


def test_chunk_mean_queries_matches_loop(rng):
    B, L, D, C = 2, 6, 4, 3
    q = rng.standard_normal((B, L, D)).astype(np.float32)
    gidx = np.array([[0, 0, 1, 2, 2, 2], [1, 1, 1, 0, 0, 2]], np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 5] = 0  # padding token
    got = np.asarray(chunk_mean_queries(jnp.asarray(q), jnp.asarray(gidx),
                                        jnp.asarray(mask), C))
    for b in range(B):
        for l in range(L):
            if not mask[b, l]:
                np.testing.assert_allclose(got[b, l], q[b, l])
                continue
            members = [i for i in range(L)
                       if gidx[b, i] == gidx[b, l] and mask[b, i]]
            np.testing.assert_allclose(got[b, l], q[b, members].mean(0),
                                       rtol=1e-5)


def _inputs(rng, cfg, BC=4):
    Lh, Li = cfg.max_hypo, 5
    vocab = cfg.encoder.vocab_size
    ids = rng.integers(1, vocab, (BC, Lh)).astype(np.int32)
    img = rng.standard_normal((BC, Li, cfg.img_feature_dim)) \
        .astype(np.float32)
    mask = np.ones((BC, Lh + Li), np.int32)
    # block-diagonal chunk visibility: 2 chunks over the hypo
    cm = np.zeros((BC, Lh, Lh), np.int32)
    half = Lh // 2
    cm[:, :half, :half] = 1
    cm[:, half:, half:] = 1
    gidx = np.concatenate([np.zeros(half, np.int32),
                           np.ones(Lh - half, np.int32)])
    gidx = np.broadcast_to(gidx, (BC, Lh)).copy()
    return ids, img, mask, cm, gidx


def test_staged_encoder_shapes(rng):
    cfg = ChunkAlignConfig.tiny()
    ids, img, mask, cm, gidx = _inputs(rng, cfg)
    model = StagedVLEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, img, mask, cm, gidx, 4)
    seq, pooled, probs, chunk_hidden = model.apply(
        params, ids, img, mask, cm, gidx, 4)
    BC, Lh = ids.shape
    L = Lh + img.shape[1]
    assert seq.shape == (BC, L, cfg.encoder.hidden_size)
    assert pooled.shape == (BC, cfg.encoder.hidden_size)
    assert probs.shape[0] == BC  # (BC, n_cross_layers, heads, L, L)
    assert probs.shape[-1] == L
    assert chunk_hidden.shape == seq.shape


def test_stage_a_blocks_cross_chunk(rng):
    """With a single chunk-stage layer, tokens in chunk 0 must be unaffected
    by content of chunk 1 (mask blocks it)."""
    import dataclasses
    cfg = ChunkAlignConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, num_hidden_layers=1),
        chunk_layers=(0,), cross_chunk_layers=(), cross_modal_layers=())
    ids, img, mask, cm, gidx = _inputs(rng, cfg, BC=1)
    model = StagedVLEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, img, mask, cm, gidx, 4)
    seq1, *_ = model.apply(params, ids, img, mask, cm, gidx, 4)
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % cfg.encoder.vocab_size or 1  # chunk 1
    seq2, *_ = model.apply(params, ids2, img, mask, cm, gidx, 4)
    half = cfg.max_hypo // 2
    np.testing.assert_allclose(np.asarray(seq1[0, :half]),
                               np.asarray(seq2[0, :half]), atol=1e-6)
    assert not np.allclose(np.asarray(seq1[0, half:cfg.max_hypo]),
                           np.asarray(seq2[0, half:cfg.max_hypo]))


def test_binary_to_mp():
    logits = jnp.asarray([[0.0, 2.0], [0.0, -2.0],
                          [0.0, 1.0], [0.0, 0.0]])
    out = np.asarray(binary_to_mp(logits, 4))
    assert out.shape == (1, 4)
    assert out.argmax() == 0


def test_chunkalign_cls_train_and_eval(rng):
    cfg = ChunkAlignConfig.tiny()
    BC = 4  # one question with 4 choices
    ids, img, mask, cm, gidx = _inputs(rng, cfg, BC=BC)
    Lh = cfg.max_hypo
    label = np.zeros((BC,), np.int32)
    label[1] = 1  # choice 1 is correct
    align_pos = np.zeros((BC, Lh), np.int32)
    align_pos[:, 2] = 1
    total_label = np.zeros((BC, Lh), np.int32)
    total_label[:, 2] = 3  # token 2 aligns with region 3

    model = ChunkAlignCLS(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, img, mask, cm, gidx, 4,
                        label=label, align_pos=align_pos,
                        total_label=total_label)
    cls_loss, matched, align_loss, correct, total = model.apply(
        params, ids, img, mask, cm, gidx, 4, label=label,
        align_pos=align_pos, total_label=total_label)
    assert np.isfinite(float(cls_loss)) and np.isfinite(float(align_loss))
    assert float(total) == BC
    pred, scores = model.apply(params, ids, img, mask, cm, gidx, 4)
    assert scores.shape == (1, 4)
    assert pred.shape == (1,)
