"""Oscar image-BERT heads (`modeling/modeling_bert.py:424,574,2045`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icka_tpu.models.chunkalign import ChunkAlignConfig
from icka_tpu.models.oscar import (
    ImageBertPreTraining,
    ImageBertSequenceClassifier,
    OscarMultipleChoice,
)

CFG = ChunkAlignConfig.tiny()
B, L, R = 3, 8, 4


def _inputs(rng, lead=(B,)):
    ids = rng.integers(2, CFG.encoder.vocab_size, lead + (L,)) \
        .astype(np.int32)
    img = rng.standard_normal(lead + (R, CFG.img_feature_dim)) \
        .astype(np.float32)
    mask = np.ones(lead + (L + R,), np.int32)
    return ids, img, mask


def test_sequence_classifier_ce_and_kl():
    rng = np.random.default_rng(0)
    ids, img, mask = _inputs(rng)
    model = ImageBertSequenceClassifier(CFG, num_labels=5, classifier="mlp")
    params = model.init(jax.random.PRNGKey(0), ids, img, mask)
    logits = model.apply(params, ids, img, mask)
    assert logits.shape == (B, 5)

    labels = rng.integers(0, 5, (B,)).astype(np.int32)
    loss, lg = model.apply(params, ids, img, mask, labels=labels)
    assert np.isfinite(float(loss)) and float(loss) > 0

    soft = jax.nn.softmax(jnp.asarray(rng.standard_normal((B, 5))), -1)
    model_kl = ImageBertSequenceClassifier(CFG, num_labels=5,
                                           loss_type="kl")
    params_kl = model_kl.init(jax.random.PRNGKey(0), ids, img, mask)
    loss_kl, _ = model_kl.apply(params_kl, ids, img, mask, labels=soft)
    assert np.isfinite(float(loss_kl))


def test_multiple_choice_scores_and_loss():
    rng = np.random.default_rng(1)
    C = 4
    ids, img, mask = _inputs(rng, lead=(B, C))
    model = OscarMultipleChoice(CFG, num_labels=2)
    params = model.init(jax.random.PRNGKey(0), ids, img, mask)
    scores = model.apply(params, ids, img, mask)
    assert scores.shape == (B, C, 2)
    labels = np.zeros((B, C), np.int32)
    labels[:, 0] = 1
    loss, s = model.apply(params, ids, img, mask, labels=labels)
    assert np.isfinite(float(loss))


def test_pretraining_tied_decoder():
    rng = np.random.default_rng(2)
    ids, img, mask = _inputs(rng)
    model = ImageBertPreTraining(CFG)
    params = model.init(jax.random.PRNGKey(0), ids, img, mask)

    # the MLM decoder has no weight of its own: only a bias param exists
    top = params["params"]
    assert "decoder_bias" in top
    assert not any("decoder" in k for k in top if k != "decoder_bias")

    lm_logits, rel_logits = model.apply(params, ids, img, mask)
    assert lm_logits.shape == (B, L, CFG.encoder.vocab_size)
    assert rel_logits.shape == (B, 2)

    # tying is live: perturbing the embedding table changes the logits
    import copy
    p2 = jax.tree.map(lambda x: x, params)
    emb = p2["params"]["encoder"]["embeddings"]["word_embeddings"]
    p2["params"]["encoder"]["embeddings"]["word_embeddings"] = emb + 1.0
    lm2, _ = model.apply(p2, ids, img, mask)
    assert not np.allclose(np.asarray(lm2), np.asarray(lm_logits))

    mlm_labels = np.full((B, L), -1, np.int64)
    mlm_labels[:, 2] = 5
    total, lm, rel, mlm = model.apply(
        params, ids, img, mask, masked_lm_labels=mlm_labels,
        next_sentence_label=np.zeros((B,), np.int32))
    assert np.isfinite(float(total)) and float(mlm) > 0
