"""Image captioning: seq2seq-masked VL BERT with an LM head + decoding.

Capability rebuild of the vestigial captioning stack (reference components
#21/#22): `BertForImageCaptioning` (`modeling/modeling_bert.py:744`) trains
a joint text⊕image encoder with a causal (seq2seq) mask over the caption
region and a masked-LM head, and generates through the
`CaptionPreTrainedModel.generate` engine — here through
`icka_tpu.generation` (greedy/sample/beam/constrained all plug in).

Decode-time recomputation note: generation currently re-encodes the full
prefix each step (the cache pytree carries the token buffer); the attention
layers are shape-static so XLA compiles one step program of fixed cost.
Incremental KV caching is an optimization slot, not a semantics change.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.core.config import EncoderConfig
from icka_tpu.generation.decoding import (
    BeamResult,
    beam_search,
    greedy_decode,
    sample_decode,
)
from icka_tpu.nn.attention import Encoder
from icka_tpu.nn.bert import TextEmbeddings
from icka_tpu.nn.layers import Dense, LayerNorm, additive_mask, gelu


@dataclass(frozen=True)
class CaptionConfig:
    encoder: EncoderConfig = field(default_factory=EncoderConfig.bert_base)
    img_feature_dim: int = 2048
    max_caption_len: int = 40
    max_regions: int = 50
    tie_word_embeddings: bool = True

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "CaptionConfig":
        enc = EncoderConfig(
            vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=128, layer_norm_eps=1e-12,
            position_offset=0, pad_token_id=0)
        return cls(encoder=enc, img_feature_dim=16, max_caption_len=8,
                   max_regions=5)


def seq2seq_mask(cap_len: int, img_len: int, cap_mask, img_mask):
    """(B, 1, L, L) additive bias: caption rows attend causally over the
    caption and fully over valid image regions; image rows attend over
    valid image regions and NOT the caption (Oscar captioning mask)."""
    B = cap_mask.shape[0]
    L = cap_len + img_len
    causal = jnp.tril(jnp.ones((cap_len, cap_len), jnp.float32))
    rows = jnp.zeros((B, L, L), jnp.float32)
    capm = cap_mask.astype(jnp.float32)
    imgm = img_mask.astype(jnp.float32)
    rows = rows.at[:, :cap_len, :cap_len].set(
        causal[None] * capm[:, None, :])
    rows = rows.at[:, :cap_len, cap_len:].set(
        jnp.broadcast_to(imgm[:, None, :], (B, cap_len, img_len)))
    rows = rows.at[:, cap_len:, cap_len:].set(
        jnp.broadcast_to(imgm[:, None, :], (B, img_len, img_len)))
    return ((1.0 - rows) * -10000.0)[:, None]


class CaptionModel(nn.Module):
    cfg: CaptionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        enc = self.cfg.encoder
        self.embeddings = TextEmbeddings(enc, dtype=self.dtype,
                                         name="embeddings")
        self.img_embedding = Dense(enc.hidden_size, dtype=self.dtype,
                                   name="img_embedding")
        self.encoder = Encoder(enc, dtype=self.dtype, name="encoder")
        self.lm_transform = Dense(enc.hidden_size, dtype=self.dtype,
                                  name="lm_transform")
        self.lm_norm = LayerNorm(eps=enc.layer_norm_eps, dtype=self.dtype,
                                 name="lm_norm")
        if not self.cfg.tie_word_embeddings:
            self.lm_decoder = Dense(enc.vocab_size, dtype=self.dtype,
                                    name="lm_decoder")
        self.lm_bias = self.param("lm_bias", nn.initializers.zeros,
                                  (enc.vocab_size,), jnp.float32)

    def _lm_logits(self, hidden):
        h = self.lm_norm(gelu(self.lm_transform(hidden)))
        if self.cfg.tie_word_embeddings:
            table = self.embeddings.word_embeddings
            logits = jnp.einsum("bld,vd->blv", h.astype(jnp.float32),
                                table.astype(jnp.float32))
        else:
            logits = self.lm_decoder(h).astype(jnp.float32)
        return logits + self.lm_bias

    def encode(self, caption_ids, cap_mask, img_feats, img_mask,
               deterministic=True):
        cap_len = caption_ids.shape[1]
        img_len = img_feats.shape[1]
        txt = self.embeddings(caption_ids, deterministic=deterministic)
        img = self.img_embedding(img_feats.astype(self.dtype))
        x = jnp.concatenate([txt, img], axis=1)
        bias = seq2seq_mask(cap_len, img_len, cap_mask, img_mask)
        return self.encoder(x, bias, deterministic)

    def __call__(self, caption_ids, cap_mask, img_feats, img_mask,
                 labels=None, deterministic=True):
        """Train: next-token cross-entropy over valid caption positions.
        labels default to the shifted caption itself."""
        cap_len = caption_ids.shape[1]
        hidden = self.encode(caption_ids, cap_mask, img_feats, img_mask,
                             deterministic)
        logits = self._lm_logits(hidden[:, :cap_len])
        if labels is None:
            return logits
        # predict token t+1 from position t
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = labels[:, 1:]
        tok_ll = jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        mask = cap_mask[:, 1:].astype(jnp.float32)
        loss = -(tok_ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return loss, logits

    def decode_step(self, tokens_buf, img_feats, img_mask, t):
        """Logits for position t given the buffered prefix (full
        re-encode; static shapes)."""
        B, cap_len = tokens_buf.shape
        pos = jnp.arange(cap_len)[None, :]
        cap_mask = jnp.broadcast_to((pos <= t), (B, cap_len)) \
            .astype(jnp.int32)
        hidden = self.encode(tokens_buf, cap_mask, img_feats, img_mask,
                             deterministic=True)
        logits = self._lm_logits(hidden[:, :cap_len])
        return logits[jnp.arange(logits.shape[0]), t]


def make_caption_step_fn(model: CaptionModel, params, img_feats, img_mask,
                         max_len: int):
    """StepFn closure for the generation engine. The cache carries the
    token buffer (B, max_len); img features are closed over (they are
    re-gathered by beam search through the cache when needed, so pass them
    inside the cache for beam/CBS)."""

    def step(tokens_t, cache, t):
        buf = cache["tokens"]
        buf = buf.at[:, t].set(tokens_t)
        logits = model.apply(
            params, buf, cache["img_feats"], cache["img_mask"], t,
            method=CaptionModel.decode_step)
        return logits, {**cache, "tokens": buf}

    return step


def generate_captions(model: CaptionModel, params, bos_id: int, eos_id: int,
                      img_feats, img_mask, max_len: int, mode="greedy",
                      num_beams: int = 3, key=None, **kw):
    """The `CaptionPreTrainedModel.generate` surface: greedy / sample /
    beam over image features."""
    B = img_feats.shape[0]
    cache = {
        "tokens": jnp.zeros((B, max_len), jnp.int32),
        "img_feats": jnp.asarray(img_feats),
        "img_mask": jnp.asarray(img_mask),
    }
    init = jnp.full((B,), bos_id, jnp.int32)
    step = make_caption_step_fn(model, params, img_feats, img_mask, max_len)
    if mode == "greedy":
        return greedy_decode(step, init, cache, max_len, eos_id, **kw)
    if mode == "sample":
        key = key if key is not None else jax.random.PRNGKey(0)
        return sample_decode(step, init, cache, max_len, eos_id, key=key,
                             **kw)
    if mode == "beam":
        return beam_search(step, init, cache, max_len, eos_id,
                           num_beams=num_beams, **kw)
    raise ValueError(f"unknown mode {mode!r}")
