"""Transformer blocks: self-attention and cross-modal co-attention.

Rebuilds the semantics of the reference's legacy BERT stack
(`Cross_Modal_Interaction_Module.py:415-697`) as einsum-based flax modules
that XLA fuses onto the MXU:

  - `SelfAttentionLayer`   ≙ BertLayer (:431) — self-attn + FFN, post-LN
  - `CrossAttentionLayer`  ≙ BertCrossAttentionLayer (:639) — queries from
    stream 1, keys/values from stream 2 (BertCoAttention :568-624)
  - `Encoder` / `CrossEncoder` ≙ BertEncoder (:415) / BertCrossEncoder (:653)
  - `Pooler` ≙ BertPooler (:669)
  - `GatedCrossAttention` ≙ cross_attention_Y (:700-837) — Bart-style MHA
    with temperature `tau`, `neg_type` (1 − softmax) and additive
    `prior_score`, used by the knowledge-alignment ClsLayer_Y (:842).

Attention uses one fused einsum per projection over all heads (no per-head
loops), additive −10000 masks, and fp32 softmax. Head dimension layout is
(B, S, N, H) throughout — XLA lays this out efficiently for the MXU without
the reference's permute/contiguous dance.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.core.config import EncoderConfig
from icka_tpu.nn.layers import ACT2FN, Dense, LayerNorm, matmul_precision


def _split_heads(x, num_heads):
    B, S, D = x.shape
    return x.reshape(B, S, num_heads, D // num_heads)


def _merge_heads(x):
    B, S, N, H = x.shape
    return x.reshape(B, S, N * H)


def dot_product_attention(q, k, v, bias=None, dtype=jnp.float32,
                          dropout_rng=None, dropout_rate=0.0,
                          deterministic=True, scale=None, tau=1.0,
                          neg_type=False, prior=None,
                          softmax_dtype=jnp.float32):
    """Multi-head attention core. q,k,v: (B, S, N, H). bias broadcastable to
    (B, N, Sq, Sk). fp32 softmax by default regardless of compute dtype;
    `softmax_dtype=bfloat16` is the serving-mode bandwidth knob (the score
    max-subtraction inside softmax keeps bf16 numerically safe)."""
    N, H = q.shape[-2], q.shape[-1]
    scale = (H ** -0.5) if scale is None else scale
    scores = jnp.einsum("bqnh,bknh->bnqk", q, k,
                        preferred_element_type=softmax_dtype,
                        precision=matmul_precision(dtype)) * scale
    if bias is not None:
        scores = scores + bias.astype(softmax_dtype)
    probs = nn.softmax(scores / tau, axis=-1)
    if neg_type:
        probs = 1.0 - probs
    if prior is not None:
        probs = probs + prior.astype(probs.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    return jnp.einsum("bnqk,bknh->bqnh", probs, v,
                      preferred_element_type=dtype,
                      precision=matmul_precision(dtype))


class MultiHeadAttention(nn.Module):
    """Q/K/V/O projections around the attention core. Covers both
    self-attention (kv = x) and co-attention (kv = other stream).

    `use_pallas=True` routes the (deterministic) core through the fused
    Pallas TPU kernel (`icka_tpu.kernels.attention`) — whole-batch-element
    VMEM-resident attention for the short-sequence regime. Training with
    attention dropout always uses the einsum core.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.1
    use_pallas: bool = False
    quant: str = "none"
    fuse_qkv: bool = False
    softmax_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None, bias=None, deterministic=True):
        self_attn = kv is None
        kv = x if kv is None else kv
        d = x.shape[-1]
        if self.fuse_qkv and self_attn:
            qkv = Dense(3 * d, dtype=self.dtype, name="qkv",
                        quant=self.quant,
                        kernel_axes=("embed", "heads"))(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = Dense(d, dtype=self.dtype, name="query", quant=self.quant,
                      kernel_axes=("embed", "heads"))(x)
            k = Dense(d, dtype=self.dtype, name="key", quant=self.quant,
                      kernel_axes=("embed", "heads"))(kv)
            v = Dense(d, dtype=self.dtype, name="value", quant=self.quant,
                      kernel_axes=("embed", "heads"))(kv)
        if self.use_pallas and (deterministic or self.dropout_rate == 0.0):
            import jax as _jax
            from icka_tpu.kernels.attention import fused_attention

            B, Sq, _ = q.shape
            Sk = k.shape[1]
            zero_bias = (jnp.zeros((B, 1, 1, Sk), jnp.float32)
                         if bias is None else bias)
            return fused_attention(
                q, k, v, zero_bias, num_heads=self.num_heads,
                interpret=_jax.default_backend() != "tpu")
        q, k, v = (_split_heads(t, self.num_heads) for t in (q, k, v))
        rng = (None if deterministic
               else self.make_rng("dropout"))
        ctx = dot_product_attention(
            q, k, v, bias=bias, dtype=self.dtype, dropout_rng=rng,
            dropout_rate=self.dropout_rate, deterministic=deterministic,
            softmax_dtype=self.softmax_dtype)
        return _merge_heads(ctx)


class AttentionOutput(nn.Module):
    """Projection + dropout + residual + LayerNorm (BertSelfOutput :554)."""

    eps: float
    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.1
    quant: str = "none"

    @nn.compact
    def __call__(self, x, residual, deterministic=True):
        x = Dense(residual.shape[-1], dtype=self.dtype, name="dense",
                  quant=self.quant, kernel_axes=("heads", "embed"))(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return LayerNorm(eps=self.eps, dtype=self.dtype,
                         name="norm")(x + residual)


class FeedForward(nn.Module):
    """Intermediate + Output FFN with post-LN residual
    (BertIntermediate :539 / BertOutput :525).

    `adapter_size > 0` inserts a Pfeiffer-style bottleneck adapter in the
    output sublayer — the architecture behind the reference's CoNLL-2000
    chunker (`BertModelWithHeads.load_adapter`, `utils/GetChunk_v4_vcr.py:
    20-23`). Composition (adapter-transformers Pfeiffer config:
    `original_ln_before/after=True, residual_before_ln=True`):

        pre = wo(act(wi(x))) + x
        h   = LN(pre)
        out = LN(up(relu(down(h))) + pre)      # LN weights shared
    """

    intermediate: int
    eps: float
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.1
    quant: str = "none"
    adapter_size: int = 0

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = Dense(self.intermediate, dtype=self.dtype, name="wi",
                  quant=self.quant, kernel_axes=("embed", "mlp"))(x)
        h = ACT2FN[self.act](h)
        h = Dense(x.shape[-1], dtype=self.dtype, name="wo",
                  quant=self.quant, kernel_axes=("mlp", "embed"))(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        norm = LayerNorm(eps=self.eps, dtype=self.dtype, name="norm")
        if self.adapter_size <= 0:
            return norm(h + x)
        pre = h + x
        a = Dense(self.adapter_size, dtype=self.dtype,
                  name="adapter_down")(norm(pre))
        a = Dense(x.shape[-1], dtype=self.dtype,
                  name="adapter_up")(nn.relu(a))
        return norm(a + pre)


class SelfAttentionLayer(nn.Module):
    """Self-attention + FFN. `history`/`history_bias` implement the
    reference's `history_state` KV-concat (`modeling_vcr_chunkalign_v10.py
    :57-61`): queries come from `x` but keys/values from
    [history; x] — the mechanism behind the ChunkAlign decoder variants."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, deterministic=True, history=None,
                 history_bias=None):
        # kv=None signals pure self-attention to MultiHeadAttention, which
        # may then fuse the Q/K/V projections into one matmul
        kv = None
        if history is not None:
            kv = jnp.concatenate([history.astype(x.dtype), x], axis=1)
            if bias is None:
                bias = jnp.zeros((x.shape[0], 1, 1, x.shape[1]),
                                 jnp.float32)
            if history_bias is None:
                history_bias = jnp.zeros(
                    (x.shape[0], 1, 1, history.shape[1]), jnp.float32)
            bias = jnp.concatenate(
                [jnp.broadcast_to(
                    history_bias, bias.shape[:-1] + (history.shape[1],)),
                 bias], axis=-1)
        a = MultiHeadAttention(
            self.cfg.num_attention_heads, dtype=self.dtype,
            dropout_rate=self.cfg.attention_probs_dropout_prob,
            use_pallas=self.cfg.use_pallas, quant=self.cfg.quant,
            fuse_qkv=self.cfg.fuse_qkv,
            softmax_dtype=jnp.dtype(self.cfg.softmax_dtype),
            name="attn")(x, kv=kv, bias=bias, deterministic=deterministic)
        x = AttentionOutput(self.cfg.layer_norm_eps, dtype=self.dtype,
                            dropout_rate=self.cfg.hidden_dropout_prob,
                            quant=self.cfg.quant,
                            name="attn_out")(a, x, deterministic)
        return FeedForward(self.cfg.intermediate_size, self.cfg.layer_norm_eps,
                           dtype=self.dtype,
                           dropout_rate=self.cfg.hidden_dropout_prob,
                           quant=self.cfg.quant,
                           adapter_size=self.cfg.adapter_size,
                           name="ffn")(x, deterministic)


class CrossAttentionLayer(nn.Module):
    """Queries from `x`, keys/values from `kv`; `bias` masks the kv stream."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv, bias=None, deterministic=True):
        a = MultiHeadAttention(
            self.cfg.num_attention_heads, dtype=self.dtype,
            dropout_rate=self.cfg.attention_probs_dropout_prob,
            # cross-attention shapes (128 q × 49 kv) measure FASTER on the
            # XLA einsum path (tools/bench_pallas.py: pallas 1.12x slower),
            # so use_pallas only routes the self-attention stacks.
            use_pallas=False, quant=self.cfg.quant,
            softmax_dtype=jnp.dtype(self.cfg.softmax_dtype),
            name="attn")(x, kv=kv, bias=bias, deterministic=deterministic)
        x = AttentionOutput(self.cfg.layer_norm_eps, dtype=self.dtype,
                            dropout_rate=self.cfg.hidden_dropout_prob,
                            quant=self.cfg.quant,
                            name="attn_out")(a, x, deterministic)
        return FeedForward(self.cfg.intermediate_size, self.cfg.layer_norm_eps,
                           dtype=self.dtype,
                           dropout_rate=self.cfg.hidden_dropout_prob,
                           quant=self.cfg.quant,
                           name="ffn")(x, deterministic)


class Encoder(nn.Module):
    """Self-attention stack. `history_states` (optional, one entry per
    layer, entries may be None) injects per-layer history KV-concat
    (`encoder_history_states` in the reference ChunkAlign decoders);
    `history_mask` (B, Sh) masks the history keys (default: all visible)."""

    cfg: EncoderConfig
    num_layers: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, deterministic=True,
                 history_states=None, history_mask=None):
        from icka_tpu.nn.layers import additive_mask
        n = self.num_layers or self.cfg.num_hidden_layers
        hbias = (additive_mask(history_mask)
                 if history_mask is not None else None)
        layer_cls = SelfAttentionLayer
        if self.cfg.remat:
            # deterministic is a python bool -> static. nn.remat's
            # static_argnums count the module itself as arg 0, so
            # (x=1, bias=2, deterministic=3).
            policy = None
            if self.cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.checkpoint_dots
            elif self.cfg.remat_policy == "dots_nb":
                # save only matmul outputs WITHOUT batch dims (projections,
                # FFN) — the batched (B,N,S,S) attention-score products are
                # recomputed, which is what lets batch 32 fit where plain
                # "dots" OOMs on saved fp32 score tensors
                policy = (jax.checkpoint_policies
                          .checkpoint_dots_with_no_batch_dims)
            layer_cls = nn.remat(SelfAttentionLayer, static_argnums=(3,),
                                 prevent_cse=False, policy=policy)
        for i in range(n):
            cls_i = layer_cls
            if self.cfg.remat and self.cfg.remat_policy == "alternate" \
                    and i % 2 == 1:
                cls_i = SelfAttentionLayer
            hist = (history_states[i]
                    if history_states is not None else None)
            x = cls_i(self.cfg, dtype=self.dtype,
                      name=f"layer_{i}")(
                x, bias, deterministic, hist, hbias)
        return x


class CrossEncoder(nn.Module):
    """Stack of cross-attention layers — the txt2img fusion
    (`BertCrossEncoder`, depth layer_num1=5 in the flagship config)."""

    cfg: EncoderConfig
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv, bias=None, deterministic=True):
        for i in range(self.num_layers):
            x = CrossAttentionLayer(self.cfg, dtype=self.dtype,
                                    name=f"layer_{i}")(x, kv, bias,
                                                       deterministic)
        return x


class Pooler(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        first = x[:, 0]
        return jnp.tanh(Dense(x.shape[-1], dtype=self.dtype,
                              name="dense")(first))


class GatedCrossAttention(nn.Module):
    """Bart-style MHA with pre-scaled queries, temperature and optional
    negated attention — `cross_attention_Y` (:700-837). Bias convention
    differs from the BERT blocks: the reference masks with `masked_fill`
    before dividing by tau, which an additive −10000 bias reproduces."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, kv=None, bias=None, tau=1.0, neg_type=False,
                 prior=None, deterministic=True):
        kv = x if kv is None else kv
        q = Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(x)
        k = Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(kv)
        v = Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(kv)
        q, k, v = (_split_heads(t, self.num_heads) for t in (q, k, v))
        head_dim = self.embed_dim // self.num_heads
        rng = None if deterministic else self.make_rng("dropout")
        # reference scales q by head_dim**-0.5 *before* the matmul and then
        # divides the (masked) scores by tau; fold both into the core.
        ctx = dot_product_attention(
            q, k, v, bias=bias, dtype=self.dtype, dropout_rng=rng,
            dropout_rate=self.dropout_rate, deterministic=deterministic,
            scale=head_dim ** -0.5, tau=tau, neg_type=neg_type, prior=prior)
        return Dense(self.embed_dim, dtype=self.dtype,
                     name="out_proj")(_merge_heads(ctx))
