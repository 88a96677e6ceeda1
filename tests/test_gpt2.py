"""GPT-2 decoder + encoder-decoder captioner tests."""

import numpy as np

import jax
import jax.numpy as jnp

from icka_tpu.models.gpt2 import (
    GPT2Captioner,
    GPT2Config,
    GPT2Decoder,
    generate_gpt2_captions,
)


def test_decoder_causality(rng):
    cfg = GPT2Config.tiny()
    model = GPT2Decoder(cfg, with_cross=False)
    B, L = 1, 8
    ids = rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    l1 = model.apply(params, ids)
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % cfg.vocab_size or 1
    l2 = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(l1[0, :-1]),
                               np.asarray(l2[0, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]))


def _setup(rng, B=2, num_cls=0):
    cfg = GPT2Config.tiny()
    model = GPT2Captioner(cfg, num_cls_labels=num_cls)
    Le, Li, Lc = 6, 4, 8
    enc_ids = rng.integers(1, cfg.encoder.vocab_size, (B, Le)) \
        .astype(np.int32)
    img = rng.standard_normal((B, Li, cfg.img_feature_dim)) \
        .astype(np.float32)
    enc_mask = np.ones((B, Le + Li), np.int32)
    caps = rng.integers(1, cfg.vocab_size, (B, Lc)).astype(np.int32)
    cap_mask = np.ones((B, Lc), np.int32)
    params = model.init(jax.random.PRNGKey(0), enc_ids, img, enc_mask,
                        caps, cap_mask)
    return cfg, model, params, enc_ids, img, enc_mask, caps, cap_mask


def test_captioner_loss_and_grads(rng):
    cfg, model, params, enc_ids, img, enc_mask, caps, cap_mask = \
        _setup(rng)

    def loss_fn(p):
        out = model.apply(p, enc_ids, img, enc_mask, caps, cap_mask,
                          labels=caps)
        return out["loss"]

    l0 = float(loss_fn(params))
    assert np.isfinite(l0)
    g = jax.grad(loss_fn)(params)
    p2 = jax.tree.map(lambda p, gg: p - 0.3 * gg, params, g)
    assert float(loss_fn(p2)) < l0


def test_captioner_with_cls_head(rng):
    cfg, model, params, enc_ids, img, enc_mask, caps, cap_mask = \
        _setup(rng, num_cls=4)
    cls_labels = np.array([1, 2], np.int32)
    out = model.apply(params, enc_ids, img, enc_mask, caps, cap_mask,
                      labels=caps, cls_labels=cls_labels)
    assert out["cls_logits"].shape == (2, 4)
    assert np.isfinite(float(out["loss"]))


def test_gpt2_generation(rng):
    cfg, model, params, enc_ids, img, enc_mask, caps, cap_mask = \
        _setup(rng)
    out = generate_gpt2_captions(model, params, enc_ids, img, enc_mask,
                                 bos_id=1, eos_id=2, max_len=6)
    assert out.tokens.shape == (2, 6)
    beam = generate_gpt2_captions(model, params, enc_ids, img, enc_mask,
                                  bos_id=1, eos_id=2, max_len=6,
                                  mode="beam", num_beams=2)
    assert beam.tokens.shape == (2, 2, 6)
    # greedy sequence score ≤ best beam score (same length penalty 1, but
    # beam may finish early; just check ordering within beams)
    s = np.asarray(beam.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
