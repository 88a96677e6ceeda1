"""KV-cached decoding must produce exactly the full-recompute outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from icka_tpu.generation.kv_cache import (
    cached_caption_step,
    generate_captions_cached,
    precompute_image_cache,
)
from icka_tpu.models.captioning import (
    CaptionConfig,
    CaptionModel,
    generate_captions,
)


def _setup(rng, B=2):
    cfg = CaptionConfig.tiny()
    model = CaptionModel(cfg)
    Li = cfg.max_regions
    img = rng.standard_normal((B, Li, cfg.img_feature_dim)) \
        .astype(np.float32)
    img_mask = np.ones((B, Li), np.int32)
    img_mask[-1, -1] = 0
    caps = rng.integers(1, cfg.encoder.vocab_size,
                        (B, cfg.max_caption_len)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), caps, np.ones_like(caps),
                        img, img_mask)
    return cfg, model, params, img, img_mask


def test_cached_step_matches_full_logits(rng):
    """Step-by-step logits from the cache path equal the full re-encode
    path for a forced token sequence."""
    cfg, model, params, img, img_mask = _setup(rng)
    B = img.shape[0]
    L = cfg.max_caption_len
    forced = rng.integers(1, cfg.encoder.vocab_size, (B, L)) \
        .astype(np.int32)

    cache = precompute_image_cache(params, cfg, jnp.asarray(img),
                                   jnp.asarray(img_mask), L)
    for t in range(L - 1):
        got, cache = cached_caption_step(params, cfg,
                                         jnp.asarray(forced[:, t]), t,
                                         cache)
        buf = jnp.asarray(np.where(np.arange(L)[None] <= t, forced, 0))
        want = model.apply(params, buf, img, img_mask, t,
                           method=CaptionModel.decode_step)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)


def test_cached_greedy_equals_full_greedy(rng):
    cfg, model, params, img, img_mask = _setup(rng)
    full = generate_captions(model, params, bos_id=1, eos_id=2,
                             img_feats=img, img_mask=img_mask,
                             max_len=cfg.max_caption_len, mode="greedy")
    cached = generate_captions_cached(model, params, bos_id=1, eos_id=2,
                                      img_feats=img, img_mask=img_mask,
                                      max_len=cfg.max_caption_len,
                                      mode="greedy")
    np.testing.assert_array_equal(np.asarray(full.tokens),
                                  np.asarray(cached.tokens))


def test_cached_beam_equals_full_beam(rng):
    cfg, model, params, img, img_mask = _setup(rng)
    full = generate_captions(model, params, bos_id=1, eos_id=2,
                             img_feats=img, img_mask=img_mask,
                             max_len=6, mode="beam", num_beams=2)
    cached = generate_captions_cached(model, params, bos_id=1, eos_id=2,
                                      img_feats=img, img_mask=img_mask,
                                      max_len=6, mode="beam", num_beams=2)
    np.testing.assert_allclose(np.asarray(full.scores),
                               np.asarray(cached.scores), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(full.tokens),
                                  np.asarray(cached.tokens))
