"""Oscar image-BERT task heads over the joint text⊕image encoder.

Closes reference component #22's remaining heads (VERDICT r01 missing #4) —
thin layers over `GlobalVLEncoder` (our `BertImgModel` equivalent,
`modeling/modeling_bert.py:158`):

  - `ImageBertSequenceClassifier` ≙ `ImageBertForSequenceClassification`
    (:424): pooled CLS → dropout → linear or 2×-hidden MLP classifier, with
    the reference's three loss types (ce / bce / kl soft-target, :471-490);
  - `OscarMultipleChoice` ≙ `OscarForMultipleChoice` (:574): choices
    flattened into the batch, per-choice binary logits, CE or BCE loss;
  - `ImageBertPreTraining` ≙ `BertImgForPreTraining` (:2045): masked-LM head
    (transform + decoder TIED to the word embeddings, `tie_weights` :2106)
    plus next-sentence/contrastive relation head; losses ignore label −1
    exactly like `CrossEntropyLoss(ignore_index=-1)`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.models.chunkalign import ChunkAlignConfig, GlobalVLEncoder
from icka_tpu.nn.layers import Dense, LayerNorm, gelu


def _masked_ce(logits, labels, ignore_index: int = -1):
    """Mean cross-entropy over positions where labels != ignore_index."""
    valid = (labels != ignore_index).astype(jnp.float32)
    safe = jnp.where(labels == ignore_index, 0, labels).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


class _Classifier(nn.Module):
    """linear | mlp (hidden × cls_hidden_scale, ReLU) classifier."""

    num_labels: int
    kind: str = "linear"
    hidden_scale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kind == "mlp":
            h = Dense(x.shape[-1] * self.hidden_scale, dtype=self.dtype,
                      name="wi")(x)
            x = nn.relu(h)
        return Dense(self.num_labels, dtype=self.dtype, name="wo")(x)


class ImageBertSequenceClassifier(nn.Module):
    cfg: ChunkAlignConfig
    num_labels: int = 2
    classifier: str = "linear"
    loss_type: str = "ce"            # ce | bce | kl (soft targets)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, img_feats, input_mask,
                 token_type_ids=None, labels=None, deterministic=True):
        _, pooled = GlobalVLEncoder(self.cfg, dtype=self.dtype,
                                    name="encoder")(
            input_ids, img_feats, input_mask, token_type_ids,
            deterministic)
        pooled = nn.Dropout(self.cfg.encoder.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        logits = _Classifier(self.num_labels, self.classifier,
                             dtype=self.dtype, name="classifier")(pooled)
        if labels is None:
            return logits
        if self.loss_type == "kl":
            # soft-target cross entropy (the reference's VQA KLDivLoss)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            loss = -jnp.mean(jnp.sum(labels * logp, axis=-1))
        elif self.loss_type == "bce":
            loss = jnp.mean(optax_sigmoid_bce(logits, labels))
        else:
            loss = _masked_ce(logits, labels.astype(jnp.int32))
        return loss, logits


def optax_sigmoid_bce(logits, labels):
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


class OscarMultipleChoice(nn.Module):
    """Inputs carry a choices axis: (B, C, L) ids/types/mask and
    (B, C, R, D) image features; per-choice logits (B, C)."""

    cfg: ChunkAlignConfig
    num_labels: int = 2
    classifier: str = "linear"
    loss_type: str = "ce"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, img_feats, input_mask,
                 token_type_ids=None, labels=None, deterministic=True):
        B, C, L = input_ids.shape
        flat = lambda x: x.reshape((B * C,) + x.shape[2:])  # noqa: E731
        _, pooled = GlobalVLEncoder(self.cfg, dtype=self.dtype,
                                    name="encoder")(
            flat(input_ids), flat(img_feats), flat(input_mask),
            flat(token_type_ids) if token_type_ids is not None else None,
            deterministic)
        pooled = nn.Dropout(self.cfg.encoder.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        logits = _Classifier(self.num_labels, self.classifier,
                             dtype=self.dtype, name="classifier")(pooled)
        scores = logits.reshape(B, C, -1)
        if labels is None:
            return scores
        if self.loss_type == "bce":
            loss = jnp.mean(optax_sigmoid_bce(
                logits, labels.reshape(B * C, -1)))
        else:
            loss = _masked_ce(logits, labels.reshape(-1).astype(jnp.int32))
        return loss, scores


class ImageBertPreTraining(nn.Module):
    """Masked-LM + image-text relation pretraining
    (`BertImgForPreTraining`, :2045-2140). The MLM decoder weight is the
    encoder's word-embedding table (tie_weights :2106-2111); a separate
    decoder bias is learned."""

    cfg: ChunkAlignConfig
    num_seq_relations: int = 2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        enc = self.cfg.encoder
        self.encoder = GlobalVLEncoder(self.cfg, dtype=self.dtype,
                                       name="encoder")
        self.transform = Dense(enc.hidden_size, dtype=self.dtype,
                               name="transform")
        self.transform_norm = LayerNorm(eps=enc.layer_norm_eps,
                                        dtype=self.dtype,
                                        name="transform_norm")
        self.decoder_bias = self.param("decoder_bias",
                                       nn.initializers.zeros,
                                       (enc.vocab_size,), jnp.float32)
        self.seq_relationship = Dense(self.num_seq_relations,
                                      dtype=self.dtype,
                                      name="seq_relationship")

    def __call__(self, input_ids, img_feats, input_mask,
                 token_type_ids=None, masked_lm_labels=None,
                 next_sentence_label=None, deterministic=True):
        seq, pooled = self.encoder(input_ids, img_feats, input_mask,
                                   token_type_ids, deterministic)
        Lt = input_ids.shape[1]
        h = self.transform_norm(gelu(self.transform(seq[:, :Lt])))
        table = self.encoder.variables["params"]["embeddings"][
            "word_embeddings"]                       # tied decoder weight
        lm_logits = jnp.einsum("bld,vd->blv", h.astype(jnp.float32),
                               jnp.asarray(table, jnp.float32)) \
            + self.decoder_bias
        rel_logits = self.seq_relationship(pooled)
        if masked_lm_labels is None:
            return lm_logits, rel_logits
        mlm_loss = _masked_ce(lm_logits, masked_lm_labels.astype(jnp.int32))
        rel_loss = _masked_ce(rel_logits,
                              next_sentence_label.astype(jnp.int32))
        return mlm_loss + rel_loss, lm_logits, rel_logits, mlm_loss
