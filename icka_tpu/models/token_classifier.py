"""Text-only token classification channel.

Rebuild of `my_bert/bichannel_modeling.py` (reference component #13): a
plain BERT encoder + per-token linear classifier trained with masked
cross-entropy (`BertForTokenClassification` :1061-1124) — the text-only
NER baseline channel of the bichannel family. Also provides the
sequence-classification head (`BertForSequenceClassification` :907)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.core.config import EncoderConfig
from icka_tpu.nn.bert import TextEncoder
from icka_tpu.nn.layers import Dense


class TokenClassifier(nn.Module):
    cfg: EncoderConfig
    num_labels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 labels=None, deterministic=True):
        seq, _ = TextEncoder(self.cfg, with_pooler=False, dtype=self.dtype,
                             name="bert")(input_ids, attention_mask,
                                          token_type_ids,
                                          deterministic=deterministic)
        seq = nn.Dropout(self.cfg.hidden_dropout_prob)(
            seq, deterministic=deterministic)
        logits = Dense(self.num_labels, dtype=self.dtype,
                       name="classifier")(seq)
        if labels is None:
            return logits
        # masked CE exactly like the reference active-loss selection
        # (`bichannel_modeling.py:1115-1124`), vectorized
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        m = (attention_mask if attention_mask is not None
             else jnp.ones_like(labels)).astype(jnp.float32)
        return -(ll * m).sum() / jnp.maximum(m.sum(), 1.0)


class SequenceClassifier(nn.Module):
    cfg: EncoderConfig
    num_labels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 labels=None, deterministic=True):
        _, pooled = TextEncoder(self.cfg, with_pooler=True,
                                dtype=self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic)
        pooled = nn.Dropout(self.cfg.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        logits = Dense(self.num_labels, dtype=self.dtype,
                       name="classifier")(pooled)
        if labels is None:
            return logits
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
