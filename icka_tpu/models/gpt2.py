"""GPT-2 decoder + encoder-decoder captioner.

Capability rebuild of the vestigial GPT-2 caption/cls hybrid
(`modeling/modeling_transfomres.py`, reference component #23): a pre-LN
GPT-2 stack (`Attention/MLP/Block` :266-470, `GPT2Model` :752) decoding over
a joint text⊕image encoder (`BertImgModel` :564), combined in
`BertForImageCaptioningAndCls` (:729). Differences are TPU-shaped: fused
per-head einsums, static causal masks, fp32 softmax, and decoding through
`icka_tpu.generation` instead of a Python loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.core.config import EncoderConfig
from icka_tpu.generation.decoding import beam_search, greedy_decode
from icka_tpu.nn.attention import _merge_heads, _split_heads, \
    dot_product_attention
from icka_tpu.nn.layers import Dense, LayerNorm, additive_mask


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_eps: float = 1e-5
    # encoder (for the captioning hybrid)
    encoder: EncoderConfig = field(default_factory=EncoderConfig.bert_base)
    img_feature_dim: int = 2048

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "GPT2Config":
        enc = EncoderConfig(
            vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, position_offset=0, pad_token_id=0)
        return cls(vocab_size=vocab_size, n_positions=32, n_embd=32,
                   n_layer=2, n_head=4, encoder=enc, img_feature_dim=16)


class GPT2Block(nn.Module):
    """Pre-LN transformer block with causal self-attention and optional
    encoder cross-attention."""

    cfg: GPT2Config
    with_cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias, memory=None, memory_bias=None,
                 deterministic=True):
        cfg = self.cfg
        D, N = cfg.n_embd, cfg.n_head

        h = LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                      name="ln_1")(x)
        qkv = Dense(3 * D, dtype=self.dtype, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, N) for t in (q, k, v))
        ctx = dot_product_attention(q, k, v, bias=causal_bias,
                                    dtype=self.dtype)
        x = x + Dense(D, dtype=self.dtype, name="c_proj")(_merge_heads(ctx))

        if self.with_cross and memory is not None:
            h = LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                          name="ln_cross")(x)
            q = Dense(D, dtype=self.dtype, name="q_cross")(h)
            k = Dense(D, dtype=self.dtype, name="k_cross")(memory)
            v = Dense(D, dtype=self.dtype, name="v_cross")(memory)
            q, k, v = (_split_heads(t, N) for t in (q, k, v))
            ctx = dot_product_attention(q, k, v, bias=memory_bias,
                                        dtype=self.dtype)
            x = x + Dense(D, dtype=self.dtype,
                          name="cross_proj")(_merge_heads(ctx))

        h = LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                      name="ln_2")(x)
        h = Dense(4 * D, dtype=self.dtype, name="c_fc")(h)
        h = jax.nn.gelu(h, approximate=True)   # GPT-2 uses tanh-gelu
        return x + Dense(D, dtype=self.dtype, name="mlp_proj")(h)


class GPT2Decoder(nn.Module):
    """GPT-2 LM stack, optionally cross-attending over encoder memory.

    `return_hidden=True` yields the final pre-logits hidden states instead
    of tied-embedding logits — for heads with a separate untied `lm_head`
    (the ChunkAlign dec5_4 family, `modeling_vcr_chunkalign_v10.py:1338`).
    """

    cfg: GPT2Config
    with_cross: bool = True
    dtype: jnp.dtype = jnp.float32
    return_hidden: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, memory=None,
                 memory_mask=None, deterministic=True):
        cfg = self.cfg
        B, L = input_ids.shape
        wte = self.param("wte", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.n_embd), jnp.float32)
        wpe = self.param("wpe", nn.initializers.normal(0.01),
                         (cfg.n_positions, cfg.n_embd), jnp.float32)
        x = (jnp.take(wte, input_ids, axis=0)
             + wpe[None, :L]).astype(self.dtype)

        causal = jnp.tril(jnp.ones((L, L), jnp.float32))[None, None]
        bias = (1.0 - causal) * -10000.0
        if attention_mask is not None:
            bias = bias + additive_mask(attention_mask)
        mem_bias = (additive_mask(memory_mask)
                    if memory_mask is not None else None)
        for i in range(cfg.n_layer):
            x = GPT2Block(cfg, with_cross=self.with_cross, dtype=self.dtype,
                          name=f"h_{i}")(x, bias, memory, mem_bias,
                                         deterministic)
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                      name="ln_f")(x)
        if self.return_hidden:
            return x
        logits = jnp.einsum("bld,vd->blv", x.astype(jnp.float32),
                            wte.astype(jnp.float32))
        return logits


class GPT2Captioner(nn.Module):
    """BertForImageCaptioningAndCls equivalent: VL encoder → GPT-2 decoder
    with a CLS head on the encoder's pooled output."""

    cfg: GPT2Config
    num_cls_labels: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from icka_tpu.models.chunkalign import ChunkAlignConfig, \
            GlobalVLEncoder
        ca = ChunkAlignConfig(encoder=self.cfg.encoder,
                              img_feature_dim=self.cfg.img_feature_dim)
        self.encoder = GlobalVLEncoder(ca, dtype=self.dtype, name="encoder")
        self.decoder = GPT2Decoder(self.cfg, with_cross=True,
                                   dtype=self.dtype, name="decoder")
        if self.num_cls_labels:
            self.cls_head = Dense(self.num_cls_labels, dtype=self.dtype,
                                  name="cls_head")

    def encode(self, input_ids, img_feats, input_mask, deterministic=True):
        memory, pooled = self.encoder(input_ids, img_feats, input_mask,
                                      deterministic=deterministic)
        return memory, pooled

    def __call__(self, enc_ids, img_feats, enc_mask, caption_ids,
                 cap_mask, labels=None, cls_labels=None,
                 deterministic=True):
        memory, pooled = self.encode(enc_ids, img_feats, enc_mask,
                                     deterministic)
        logits = self.decoder(caption_ids, cap_mask, memory, enc_mask,
                              deterministic)
        out = {"logits": logits}
        if self.num_cls_labels:
            out["cls_logits"] = self.cls_head(pooled)
        if labels is not None:
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            tgt = labels[:, 1:]
            ll = jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
            m = cap_mask[:, 1:].astype(jnp.float32)
            out["loss"] = -(ll * m).sum() / jnp.maximum(m.sum(), 1.0)
            if cls_labels is not None and self.num_cls_labels:
                clogp = jax.nn.log_softmax(out["cls_logits"], axis=-1)
                out["loss"] = out["loss"] - jnp.mean(
                    jnp.take_along_axis(clogp, cls_labels[:, None], 1))
        return out

    def decode_step(self, tokens_buf, memory, enc_mask, t):
        B, L = tokens_buf.shape
        pos = jnp.arange(L)[None, :]
        mask = jnp.broadcast_to(pos <= t, (B, L)).astype(jnp.int32)
        logits = self.decoder(tokens_buf, mask, memory, enc_mask,
                              deterministic=True)
        return logits[jnp.arange(B), t]


def generate_gpt2_captions(model: GPT2Captioner, params, enc_ids, img_feats,
                           enc_mask, bos_id: int, eos_id: int, max_len: int,
                           mode: str = "greedy", num_beams: int = 3, **kw):
    memory, _ = model.apply(params, enc_ids, img_feats, enc_mask,
                            method=GPT2Captioner.encode)
    B = memory.shape[0]
    cache = {
        "tokens": jnp.zeros((B, max_len), jnp.int32),
        "memory": memory,
        "enc_mask": jnp.asarray(enc_mask),
    }

    def step(tokens_t, cache, t):
        buf = cache["tokens"].at[:, t].set(tokens_t)
        logits = model.apply(params, buf, cache["memory"],
                             cache["enc_mask"], t,
                             method=GPT2Captioner.decode_step)
        return logits, {**cache, "tokens": buf}

    init = jnp.full((B,), bos_id, jnp.int32)
    if mode == "greedy":
        return greedy_decode(step, init, cache, max_len, eos_id, **kw)
    if mode == "beam":
        return beam_search(step, init, cache, max_len, eos_id,
                           num_beams=num_beams, **kw)
    raise ValueError(f"unknown mode {mode!r}")
