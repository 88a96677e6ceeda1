"""Text encoders: legacy-BERT and RoBERTa semantics on one stack.

Rebuilds two encoder dialects the reference mixes:

  - the in-repo legacy BERT (`Cross_Modal_Interaction_Module.py:302-382`,
    `my_bert/*_modeling.py`): 0-based position ids, token-type embeddings,
    post-LN transformer, pooler over token 0;
  - HF RoBERTa (`My_cross_attention.py:660-672` external dependency):
    position ids derived from non-pad token positions offset by the padding
    index, layer_norm_eps 1e-5.

Both are the same `Encoder` stack; the dialect only changes the embedding
position arithmetic, selected by `EncoderConfig.position_offset`
(0 → BERT-style arange, >0 → RoBERTa-style pad-aware cumsum).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.core.config import EncoderConfig
from icka_tpu.nn.attention import Encoder, Pooler
from icka_tpu.nn.layers import LayerNorm, additive_mask


def roberta_position_ids(input_ids, pad_token_id: int):
    """HF RoBERTa position ids: consecutive positions for non-pad tokens,
    starting at pad_token_id+1; pad positions get pad_token_id."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_token_id


def mask_position_ids(attention_mask, pad_token_id: int):
    """RoBERTa-style position ids computed from an attention mask instead of
    token ids (used for spliced sequences that have no token ids)."""
    m = attention_mask.astype(jnp.int32)
    return jnp.cumsum(m, axis=1) * m + pad_token_id


class TextEmbeddings(nn.Module):
    """word + position + token-type embeddings → LayerNorm → dropout.

    `embed_tokens` / `finalize` split the pipeline so callers can transform
    token embeddings (prompt splicing) before positions are assigned.
    """

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        init = nn.initializers.normal(0.02)
        self.word_embeddings = self.param(
            "word_embeddings", init,
            (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        self.position_embeddings = self.param(
            "position_embeddings", init,
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        self.token_type_embeddings = self.param(
            "token_type_embeddings", init,
            (cfg.type_vocab_size, cfg.hidden_size), jnp.float32)
        self.norm = LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                              name="norm")
        self.drop = nn.Dropout(cfg.hidden_dropout_prob)

    def embed_tokens(self, input_ids):
        return jnp.take(self.word_embeddings, input_ids, axis=0)

    def finalize(self, inputs_embeds, position_ids, token_type_ids,
                 deterministic=True):
        x = (inputs_embeds
             + jnp.take(self.position_embeddings, position_ids, axis=0)
             + jnp.take(self.token_type_embeddings, token_type_ids, axis=0))
        x = self.norm(x.astype(self.dtype))
        return self.drop(x, deterministic=deterministic)

    def __call__(self, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None, deterministic=True):
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        B, S = inputs_embeds.shape[:2]
        if position_ids is None:
            if cfg.position_offset > 0 and input_ids is not None:
                position_ids = roberta_position_ids(input_ids,
                                                    cfg.pad_token_id)
            else:
                position_ids = jnp.broadcast_to(
                    jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, S), jnp.int32)
        return self.finalize(inputs_embeds, position_ids, token_type_ids,
                             deterministic)


class TextEncoder(nn.Module):
    """Full encoder: embeddings + transformer stack (+ optional pooler).

    Equivalent public surface to the reference's `BertModel.forward`
    (returns (sequence_output, pooled_output),
    `Cross_Modal_Interaction_Module.py:302-382`) and HF `RobertaModel`.
    """

    cfg: EncoderConfig
    with_pooler: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, deterministic=True):
        if attention_mask is None:
            ref = input_ids if input_ids is not None else inputs_embeds[..., 0]
            attention_mask = jnp.ones(ref.shape[:2], jnp.int32)
        bias = additive_mask(attention_mask)
        x = TextEmbeddings(self.cfg, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, position_ids, inputs_embeds,
            deterministic)
        x = Encoder(self.cfg, dtype=self.dtype, name="encoder")(
            x, bias, deterministic)
        pooled = (Pooler(dtype=self.dtype, name="pooler")(x)
                  if self.with_pooler else None)
        return x, pooled


def splice_prompt(seq, prompt, m1: int, m2: int):
    """Replace positions m1 and m2 of `seq` (axis 1) with the two halves of
    `prompt` (axis 1, even length). Works for (B, L) masks and (B, L, D)
    embeddings; all shapes static."""
    P = prompt.shape[1] // 2
    return jnp.concatenate(
        [seq[:, :m1], prompt[:, :P], seq[:, m1 + 1:m2], prompt[:, P:],
         seq[:, m2 + 1:]], axis=1)


class PromptSpliceEncoder(nn.Module):
    """RoBERTa encoder that splices learned prompt embeddings in place of
    the two `<mask>` placeholder tokens — a reconstruction of the missing
    `local_transformers...roberta_ner` fork from its call site
    (`My_cross_attention.py:1010-1012`): given the prompted input
    `<s> Image is <mask> Bridge between Image and the Text is <mask> </s>
    Text is <sentence>`, the embeddings at the two `<mask>` positions are
    replaced by `prompt_len` learned vectors each, giving output length
    L − 2 + 2·prompt_len (`Cross_Modal_Interaction_Module.py:1014-1024`).

    `mask_positions` are static Python ints — the driver asserts all offsets
    in a batch are equal (`My_cross_attention.py:802`) — so the splice is
    static-shape concatenation: far simpler under XLA than the fork's
    dynamic indexing. Position ids are assigned RoBERTa-style over the
    *spliced* layout; prompt slots inherit token-type of the prompt region.

    Returns (sequence_output, spliced_attention_mask).
    """

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 prompt_embeddings, prompt_mask, mask_positions,
                 deterministic=True, position_ids=None, prompt_gather=None):
        cfg = self.cfg
        emb = TextEmbeddings(cfg, dtype=self.dtype, name="embeddings")
        if prompt_gather is not None:
            # Sequence-PACKED path (`icka_tpu.serving.packing`): the host
            # has ALREADY laid the row out in spliced form — `input_ids`
            # carries pad placeholders at prompt-vector positions,
            # `prompt_embeddings` is a flat (B, K, H) table of prompt
            # vectors (K = slots × 2·prompt_len), and `prompt_gather`
            # (B, L) indexes it per position (K = "not a prompt slot").
            # `attention_mask` is the (B, 1, L, L) block-diagonal packed
            # mask; `position_ids`/`token_type_ids` are host-computed per
            # segment; `prompt_mask`/`mask_positions` are unused.
            B, K = prompt_embeddings.shape[:2]
            tok = emb.embed_tokens(input_ids)
            table = jnp.concatenate(
                [prompt_embeddings.astype(tok.dtype),
                 jnp.zeros((B, 1, tok.shape[-1]), tok.dtype)], axis=1)
            pv = jnp.take_along_axis(table, prompt_gather[:, :, None],
                                     axis=1)
            spliced = jnp.where((prompt_gather < K)[:, :, None], pv, tok)
            x = emb.finalize(spliced, position_ids, token_type_ids,
                             deterministic)
            x = Encoder(cfg, dtype=self.dtype, name="encoder")(
                x, additive_mask(attention_mask), deterministic)
            return x, attention_mask
        m1, m2 = mask_positions
        P = prompt_embeddings.shape[1] // 2

        tok = emb.embed_tokens(input_ids)
        spliced = splice_prompt(tok, prompt_embeddings.astype(tok.dtype),
                                m1, m2)
        spliced_mask = splice_prompt(attention_mask.astype(jnp.int32),
                                     prompt_mask.astype(jnp.int32), m1, m2)
        type1 = jnp.repeat(token_type_ids[:, m1:m1 + 1], P, axis=1)
        type2 = jnp.repeat(token_type_ids[:, m2:m2 + 1], P, axis=1)
        spliced_types = jnp.concatenate(
            [token_type_ids[:, :m1], type1, token_type_ids[:, m1 + 1:m2],
             type2, token_type_ids[:, m2 + 1:]], axis=1)
        position_ids = mask_position_ids(spliced_mask, cfg.pad_token_id)

        x = emb.finalize(spliced, position_ids, spliced_types, deterministic)
        bias = additive_mask(spliced_mask)
        x = Encoder(cfg, dtype=self.dtype, name="encoder")(
            x, bias, deterministic)
        return x, spliced_mask
