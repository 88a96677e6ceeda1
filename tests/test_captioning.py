"""Captioning model tests: seq2seq mask semantics, training loss,
generation through every decode mode."""

import numpy as np

import jax
import jax.numpy as jnp

from icka_tpu.models.captioning import (
    CaptionConfig,
    CaptionModel,
    generate_captions,
    seq2seq_mask,
)


def test_seq2seq_mask_shape_and_causality():
    B, Lc, Li = 2, 4, 3
    cap_mask = np.ones((B, Lc), np.int32)
    img_mask = np.ones((B, Li), np.int32)
    img_mask[1, 2] = 0
    bias = np.asarray(seq2seq_mask(Lc, Li, jnp.asarray(cap_mask),
                                   jnp.asarray(img_mask)))[:, 0]
    # caption row 1 cannot see caption col 2 (future)
    assert bias[0, 1, 2] < -1e3
    assert bias[0, 2, 1] == 0.0
    # caption rows see valid image, not padded region
    assert bias[0, 0, Lc] == 0.0
    assert bias[1, 0, Lc + 2] < -1e3
    # image rows don't see caption
    assert (bias[:, Lc:, :Lc] < -1e3).all()


def _setup(rng, B=2):
    cfg = CaptionConfig.tiny()
    model = CaptionModel(cfg)
    Lc, Li = cfg.max_caption_len, cfg.max_regions
    caps = rng.integers(1, cfg.encoder.vocab_size, (B, Lc)).astype(np.int32)
    cap_mask = np.ones((B, Lc), np.int32)
    img = rng.standard_normal((B, Li, cfg.img_feature_dim)) \
        .astype(np.float32)
    img_mask = np.ones((B, Li), np.int32)
    params = model.init(jax.random.PRNGKey(0), caps, cap_mask, img,
                        img_mask)
    return cfg, model, params, caps, cap_mask, img, img_mask


def test_caption_training_loss_decreases(rng):
    cfg, model, params, caps, cap_mask, img, img_mask = _setup(rng)

    def loss_fn(p):
        loss, _ = model.apply(p, caps, cap_mask, img, img_mask, labels=caps)
        return loss

    l0 = float(loss_fn(params))
    g = jax.grad(loss_fn)(params)
    params2 = jax.tree.map(lambda p, gg: p - 0.5 * gg, params, g)
    assert float(loss_fn(params2)) < l0


def test_future_tokens_dont_leak(rng):
    """Changing a future caption token must not change logits at position
    t (causal mask)."""
    cfg, model, params, caps, cap_mask, img, img_mask = _setup(rng, B=1)
    logits1 = model.apply(params, caps, cap_mask, img, img_mask)
    caps2 = caps.copy()
    caps2[0, -1] = (caps2[0, -1] + 1) % cfg.encoder.vocab_size or 1
    logits2 = model.apply(params, caps2, cap_mask, img, img_mask)
    np.testing.assert_allclose(np.asarray(logits1[0, :-1]),
                               np.asarray(logits2[0, :-1]), atol=1e-5)


def test_generate_modes(rng):
    cfg, model, params, caps, cap_mask, img, img_mask = _setup(rng)
    out = generate_captions(model, params, bos_id=1, eos_id=2,
                            img_feats=img, img_mask=img_mask,
                            max_len=cfg.max_caption_len, mode="greedy")
    assert out.tokens.shape == (2, cfg.max_caption_len)
    assert (np.asarray(out.tokens)[:, 0] == 1).all()

    res = generate_captions(model, params, bos_id=1, eos_id=2,
                            img_feats=img, img_mask=img_mask,
                            max_len=cfg.max_caption_len, mode="beam",
                            num_beams=2)
    assert res.tokens.shape == (2, 2, cfg.max_caption_len)

    samp = generate_captions(model, params, bos_id=1, eos_id=2,
                             img_feats=img, img_mask=img_mask,
                             max_len=cfg.max_caption_len, mode="sample",
                             key=jax.random.PRNGKey(7), top_k=3)
    assert samp.tokens.shape == (2, cfg.max_caption_len)


def test_greedy_beats_or_ties_in_beam(rng):
    """The greedy path must appear among beam hypotheses scores ≤ best."""
    cfg, model, params, caps, cap_mask, img, img_mask = _setup(rng, B=1)
    res = generate_captions(model, params, bos_id=1, eos_id=2,
                            img_feats=img, img_mask=img_mask,
                            max_len=6, mode="beam", num_beams=3)
    s = np.asarray(res.scores)
    assert (np.diff(s[0]) <= 1e-6).all()
