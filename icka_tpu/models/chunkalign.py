"""ChunkAlign VCR models: staged chunk/cross-modal attention + aligned CLS.

TPU-native rebuild of the vestigial VCR subsystem's model core
(`modeling/modeling_vcr_chunkalign_v10.py`, reference component #20):

  - `StagedVLEncoder` ≙ `SeqBertImgModel` (:235) over `CaptionBertEncoder`
    (:153): a joint text⊕image-region transformer whose attention mask
    changes by stage — layers 0-2 chunk-internal text (+ image keys),
    layers 3-8 full cross-chunk attention, layers 9-11 cross-modal with
    *chunk-mean queries* and identity-only image rows (:166-206);
  - chunk-mean queries ≙ the reference's per-sample `index_add` loop
    (:66-78), vectorized here as a batched segment-mean over a
    chunk-id map (`gather_index`), one gather + one scatter, no loops;
  - `GlobalVLEncoder` ≙ the plain `BertImgModel`-style global encoder
    (`modeling/modeling_bert.py:158`, component #22's encoder role);
  - `ChunkAlignCLS` ≙ `ChunkAlign_CLS_enc4_align` (:1019): ensemble of
    global+chunk CLS, 3 CLS-attention layers over the concatenated
    [global_hypo; chunk_align; chunk_hidden] memory, binary-per-choice
    classification with `binary_to_mp`, and the attention-supervised
    align loss over the last 3 cross-modal layers (:1074-1080).

Everything is static-shape: `gather_index` maps every hypothesis token to a
chunk id (padding tokens map to a dedicated dead chunk), `chunk_attention
mask` is a precomputed (B, Lh, Lh) 0/1 block-diagonal, and the align loss
selects supervised positions with a mask instead of boolean indexing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.core.config import EncoderConfig
from icka_tpu.nn.attention import (
    AttentionOutput,
    FeedForward,
    MultiHeadAttention,
    Pooler,
    _merge_heads,
    _split_heads,
    dot_product_attention,
)
from icka_tpu.nn.bert import TextEmbeddings
from icka_tpu.nn.layers import Dense, additive_mask


@dataclass(frozen=True)
class ChunkAlignConfig:
    encoder: EncoderConfig = field(
        default_factory=EncoderConfig.bert_base)
    img_feature_dim: int = 2048
    max_hypo: int = 50
    chunk_layers: tuple = (0, 1, 2)
    cross_chunk_layers: tuple = (3, 4, 5, 6, 7, 8)
    cross_modal_layers: tuple = (9, 10, 11)
    add_residual: bool = True
    add_local_residual: bool = False
    num_choices: int = 4
    # family variant flags (reference classes → flags):
    #   use_chunk_align=False → `_wo_chual` (:1255, dec :1654): no staged
    #     chunk encoder; CLS + memory come from the global encoder only
    #   use_reasoning=False  → `_wo_reasoning` (:1171, dec :1500): no CLS
    #     cross-attention reasoning layers before the classifier
    use_chunk_align: bool = True
    use_reasoning: bool = True

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "ChunkAlignConfig":
        enc = EncoderConfig(
            vocab_size=vocab_size, hidden_size=32, num_hidden_layers=6,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=128, layer_norm_eps=1e-12,
            position_offset=0, pad_token_id=0)
        return cls(encoder=enc, img_feature_dim=16, max_hypo=10,
                   chunk_layers=(0,), cross_chunk_layers=(1, 2, 3),
                   cross_modal_layers=(4, 5), num_choices=4)


def chunk_mean_queries(q, gather_index, token_mask, num_chunks: int):
    """Replace each hypothesis token's query with the mean query of its
    chunk. `gather_index` (B, Lh) holds chunk ids in [0, num_chunks);
    padding tokens must map to an unused chunk id. Vectorized equivalent of
    the reference's per-sample index_add/gather loop (:66-78)."""
    onehot = jax.nn.one_hot(gather_index, num_chunks,
                            dtype=q.dtype)                 # (B, Lh, C)
    onehot = onehot * token_mask[..., None].astype(q.dtype)
    sums = jnp.einsum("blc,bld->bcd", onehot, q)            # (B, C, D)
    counts = jnp.maximum(onehot.sum(axis=1), 1.0)           # (B, C)
    means = sums / counts[..., None]
    spread = jnp.einsum("blc,bcd->bld", onehot, means)
    return jnp.where(token_mask[..., None] > 0, spread, q)


class StagedAttention(nn.Module):
    """Self-attention whose queries can be chunk-averaged."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, gather_index=None, token_mask=None,
                 num_chunks: int = 0, chunk_query: bool = False,
                 hypo_len: int = 0, deterministic=True):
        d = x.shape[-1]
        q = Dense(d, dtype=self.dtype, name="query")(x)
        k = Dense(d, dtype=self.dtype, name="key")(x)
        v = Dense(d, dtype=self.dtype, name="value")(x)
        if chunk_query:
            # only hypothesis positions 1..hypo_len-1 get chunk-mean queries
            q_h = chunk_mean_queries(q[:, :hypo_len], gather_index,
                                     token_mask, num_chunks)
            q = jnp.concatenate([q_h, q[:, hypo_len:]], axis=1)
        N = self.cfg.num_attention_heads
        qh, kh, vh = (_split_heads(t, N) for t in (q, k, v))
        ctx = dot_product_attention(qh, kh, vh, bias=bias, dtype=self.dtype,
                                    deterministic=True)
        # also return fp32 attention probabilities for the align loss
        head_dim = d // N
        scores = jnp.einsum("bqnh,bknh->bnqk", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores * (head_dim ** -0.5) + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        return _merge_heads(ctx), probs


class StagedLayer(nn.Module):
    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, deterministic=True, **chunk_kw):
        a, probs = StagedAttention(self.cfg, dtype=self.dtype,
                                   name="attn")(x, bias, **chunk_kw)
        x = AttentionOutput(self.cfg.layer_norm_eps, dtype=self.dtype,
                            name="attn_out")(a, x, deterministic)
        x = FeedForward(self.cfg.intermediate_size, self.cfg.layer_norm_eps,
                        dtype=self.dtype, name="ffn")(x, deterministic)
        return x, probs


class StagedVLEncoder(nn.Module):
    """SeqBertImgModel equivalent. Inputs:

      input_ids      (B, Lh) hypothesis tokens (CLS first)
      img_feats      (B, Li, img_dim) region features
      input_mask     (B, Lh + Li) joint validity mask
      chunk_mask     (B, Lh, Lh) 0/1 chunk-internal visibility
      gather_index   (B, Lh) chunk id per hypothesis token
      num_chunks     static max chunk count

    Returns (sequence, pooled_cls, cross_modal_attn_probs, chunk_hidden).
    """

    cfg: ChunkAlignConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, img_feats, input_mask, chunk_mask,
                 gather_index, num_chunks: int, token_type_ids=None,
                 deterministic=True):
        enc = self.cfg.encoder
        B, Lh = input_ids.shape
        Li = img_feats.shape[1]
        L = Lh + Li

        txt = TextEmbeddings(enc, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        img = Dense(enc.hidden_size, dtype=self.dtype,
                    name="img_embedding")(img_feats.astype(self.dtype))
        x = jnp.concatenate([txt, img], axis=1)

        full_bias = additive_mask(input_mask)               # (B,1,1,L)
        full_rows = jnp.broadcast_to(full_bias, (B, 1, L, L))

        # stage A: text rows see chunk-internal text + visible image; image
        # rows see nothing of the text (reference :178-183)
        chunk_bias = (1.0 - chunk_mask.astype(jnp.float32)) * -10000.0
        stage_a = full_rows
        stage_a = stage_a.at[:, :, :Lh, :Lh].set(chunk_bias[:, None])
        stage_a = stage_a.at[:, :, Lh:, :Lh].set(-10000.0)

        # stage C: text rows as stage A; image rows identity-only (:190-200)
        eye = jnp.eye(Li, dtype=jnp.float32)
        img_rows = jnp.concatenate(
            [jnp.zeros((Li, Lh), jnp.float32), eye], axis=1)
        img_rows = (1.0 - img_rows) * -10000.0
        stage_c = full_rows
        stage_c = stage_c.at[:, :, :Lh, :Lh].set(chunk_bias[:, None])
        stage_c = stage_c.at[:, :, Lh:, :].set(img_rows[None, None])

        token_mask = input_mask[:, :Lh]
        chunk_hidden = None
        cross_probs = []
        for i in range(enc.num_hidden_layers):
            if i in self.cfg.chunk_layers:
                bias, chunk_q = stage_a, False
            elif i in self.cfg.cross_modal_layers:
                bias, chunk_q = stage_c, True
                if chunk_hidden is None:
                    chunk_hidden = x
            else:
                bias, chunk_q = full_bias, False
            y, probs = StagedLayer(enc, dtype=self.dtype,
                                   name=f"layer_{i}")(
                x, bias, deterministic=deterministic,
                gather_index=gather_index, token_mask=token_mask,
                num_chunks=num_chunks, chunk_query=chunk_q, hypo_len=Lh)
            if self.cfg.add_local_residual \
                    and i in self.cfg.cross_modal_layers:
                x = y + x
            else:
                x = y
            if i in self.cfg.cross_modal_layers:
                cross_probs.append(probs)
        if self.cfg.add_residual and chunk_hidden is not None:
            x = x + chunk_hidden
        pooled = Pooler(dtype=self.dtype, name="pooler")(x)
        if cross_probs:
            probs = jnp.stack(cross_probs, 1)
        else:  # no cross-modal stage configured (ablation)
            probs = jnp.zeros(
                (B, 1, enc.num_attention_heads, L, L), jnp.float32)
        if chunk_hidden is None:
            chunk_hidden = x
        return x, pooled, probs, chunk_hidden


class GlobalVLEncoder(nn.Module):
    """Plain joint text⊕image encoder + pooler (BertImgModel role)."""

    cfg: ChunkAlignConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, img_feats, input_mask,
                 token_type_ids=None, deterministic=True,
                 history_states=None, history_mask=None):
        from icka_tpu.nn.attention import Encoder
        enc = self.cfg.encoder
        txt = TextEmbeddings(enc, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        img = Dense(enc.hidden_size, dtype=self.dtype,
                    name="img_embedding")(img_feats.astype(self.dtype))
        x = jnp.concatenate([txt, img], axis=1)
        x = Encoder(enc, dtype=self.dtype, name="encoder")(
            x, additive_mask(input_mask), deterministic,
            history_states=history_states, history_mask=history_mask)
        pooled = Pooler(dtype=self.dtype, name="pooler")(x)
        return x, pooled


class ClsAttentionLayer(nn.Module):
    """CLS token cross-attends over an alignment memory (`ClsLayer2`).

    `return_probs=True` additionally returns the head-averaged fp32
    attention distribution over the memory — the signal the `_beam`
    decoders rank to pick constraint words (:2114-2118)."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, cls, mem_bias, deterministic=True,
                 return_probs: bool = False):
        mha = MultiHeadAttention(self.cfg.num_attention_heads,
                                 dtype=self.dtype, name="attn")
        a = mha(cls[:, None, :], kv=memory, bias=mem_bias,
                deterministic=deterministic)
        x = AttentionOutput(self.cfg.layer_norm_eps, dtype=self.dtype,
                            name="attn_out")(a, cls[:, None, :],
                                             deterministic)
        x = FeedForward(self.cfg.intermediate_size, self.cfg.layer_norm_eps,
                        dtype=self.dtype, name="ffn")(x, deterministic)
        if not return_probs:
            return x[:, 0]
        # re-derive the (1-query) attention probs for ranking; reuses the
        # bound MHA's q/k parameters (negligible extra work at 1 query)
        attn = mha.variables["params"]
        d = memory.shape[-1]
        N = self.cfg.num_attention_heads
        q = (cls @ attn["query"]["kernel"]
             + attn["query"]["bias"]).reshape(-1, N, d // N)
        k = (memory @ attn["key"]["kernel"] + attn["key"]["bias"]) \
            .reshape(memory.shape[0], -1, N, d // N)
        scores = jnp.einsum("bnh,bknh->bnk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
        scores = scores * ((d // N) ** -0.5) \
            + mem_bias.astype(jnp.float32)[:, 0, 0][:, None, :]
        probs = jax.nn.softmax(scores, axis=-1).mean(axis=1)   # (B, Lm)
        return x[:, 0], probs


def binary_to_mp(logits, num_choices: int):
    """Per-choice binary logits (B·C, 2) → multiple-choice scores (B, C)
    from the positive-class probability."""
    pos = jax.nn.softmax(logits, axis=-1)[:, 1]
    return pos.reshape(-1, num_choices)


class ChunkAlignCLS(nn.Module):
    """ChunkAlign_CLS_enc4_align: answer classification + align loss."""

    cfg: ChunkAlignConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        enc = self.cfg.encoder
        self.global_enc = GlobalVLEncoder(self.cfg, dtype=self.dtype,
                                          name="global_enc")
        if self.cfg.use_chunk_align:
            self.seq_enc = StagedVLEncoder(self.cfg, dtype=self.dtype,
                                           name="seq_enc")
            self.cls_ensemble = Dense(enc.hidden_size, dtype=self.dtype,
                                      name="cls_ensemble")
        if self.cfg.use_reasoning:
            self.cls_layers = [ClsAttentionLayer(enc, dtype=self.dtype,
                                                 name=f"cls_layer_{i}")
                               for i in range(3)]
        self.classifier = Dense(2, dtype=self.dtype, name="classifier")

    def _headless(self, input_ids, img_feats, input_mask, chunk_mask,
                  gather_index, num_chunks, deterministic,
                  history_states=None, history_mask=None):
        B, Lh = input_ids.shape
        g_seq, g_cls = self.global_enc(input_ids, img_feats, input_mask,
                                       deterministic=deterministic,
                                       history_states=history_states,
                                       history_mask=history_mask)
        word_mask = input_mask[:, 1:Lh]
        if self.cfg.use_chunk_align:
            s_seq, s_cls, cross_probs, chunk_hidden = self.seq_enc(
                input_ids, img_feats, input_mask, chunk_mask, gather_index,
                num_chunks, deterministic=deterministic)
            cls = self.cls_ensemble(jnp.concatenate([g_cls, s_cls], -1))
            memory = jnp.concatenate(
                [g_seq[:, 1:Lh], s_seq[:, 1:Lh], chunk_hidden[:, 1:Lh]],
                axis=1)
            mem_bias = additive_mask(
                jnp.concatenate([word_mask] * 3, axis=1))
        else:
            # `_wo_chual` (:1266-1293): CLS and memory from the global
            # encoder alone; no staged encoder, no align supervision
            s_seq, chunk_hidden = g_seq, g_seq
            cross_probs = jnp.zeros(
                (B, 1, self.cfg.encoder.num_attention_heads,
                 Lh + img_feats.shape[1], Lh + img_feats.shape[1]),
                jnp.float32)
            cls = g_cls
            memory = g_seq[:, 1:Lh]
            mem_bias = additive_mask(word_mask)
        cls_attn = None
        if self.cfg.use_reasoning:
            for layer in self.cls_layers:
                cls, probs = layer(memory, cls, mem_bias, deterministic,
                                   return_probs=True)
                cls_attn = probs if cls_attn is None else cls_attn + probs
        logits = self.classifier(cls)                   # (B·C, 2)
        inter = {"g_seq": g_seq, "s_seq": s_seq,
                 "chunk_hidden": chunk_hidden, "word_mask": word_mask,
                 "cls_attn": cls_attn}
        return logits, cross_probs, inter

    def __call__(self, input_ids, img_feats, input_mask, chunk_mask,
                 gather_index, num_chunks: int, label=None,
                 align_pos=None, total_label=None, deterministic=True):
        """Train path: returns (cls_loss, matched, align_loss, n_correct,
        n_supervised) like the reference forward (:1070-1083).
        `label` is (B·C,) binary; `align_pos`/`total_label` (B·C, Lh-ish)
        mark supervised alignment positions and their gold region index."""
        B_C, Lh = input_ids.shape
        C = self.cfg.num_choices
        logits, cross_probs, _ = self._headless(
            input_ids, img_feats, input_mask, chunk_mask, gather_index,
            num_chunks, deterministic)
        if label is None:
            scores = binary_to_mp(logits, C)
            return scores.argmax(-1), scores

        logp = jax.nn.log_softmax(logits, axis=-1)
        cls_loss = -jnp.mean(
            jnp.take_along_axis(logp, label[:, None].astype(jnp.int32), 1))
        scores = binary_to_mp(logits, C)
        pred = scores.argmax(-1)
        gold = label.reshape(-1, C).argmax(-1)
        matched = pred == gold
        if not self.cfg.use_chunk_align:
            # `_wo_chual` has no align supervision (:1266-1293)
            zero = jnp.zeros((), jnp.float32)
            return cls_loss, matched, zero, zero, zero

        # align loss: last-3-layer attention, summed over layers+heads,
        # text→image block, supervised positions only (:1074-1080)
        attn = cross_probs.sum(axis=(1, 2))             # (B·C, L, L)
        attn = attn[:, :Lh, Lh:]
        attn = jnp.where(attn == 0, -1e5, attn)
        attn = jax.nn.log_softmax(attn, axis=-1)
        sup = (align_pos > 0).astype(jnp.float32)        # (B·C, Lh)
        gold_region = total_label.astype(jnp.int32)      # (B·C, Lh)
        picked = jnp.take_along_axis(attn, gold_region[..., None],
                                     axis=-1)[..., 0]
        n_sup = jnp.maximum(sup.sum(), 1.0)
        align_loss = -(picked * sup).sum() / n_sup
        correct = ((attn.argmax(-1) == gold_region)
                   .astype(jnp.float32) * sup).sum()
        return cls_loss, matched, align_loss, correct, sup.sum()


class ChunkAlignRationale(nn.Module):
    """`ChunkAlign_CLS_dec5_4` (`modeling_vcr_chunkalign_v10.py:1322-1499`):
    the ChunkAlign answer classifier plus a GPT-2 rationale decoder that
    cross-attends over the concatenated encoder memory
    [s_seq; g_seq; chunk_hidden] of the gold answer's row.

    Train (`__call__` with expl/label args): returns
    (gen_loss, cls_loss, matched) like the reference forward — the decoder
    consumes the per-question gold-answer row (detached, :1386-1399) and the
    question's first explanation candidate; LM loss ignores pad positions.

    Inference (`generate`): greedy rationale decoding from the prompt
    prefix, full-recompute per step (fixed `max_gen_len`, static shapes; the
    reference's per-sample KV-cache python loop :1465-1495 becomes a
    `lax.scan`). Answer selection uses the classifier's prediction.
    """

    cfg: ChunkAlignConfig
    gpt2_cfg: "object" = None          # GPT2Config
    pad_token_id: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from icka_tpu.models.gpt2 import GPT2Decoder
        self.core = ChunkAlignCLS(self.cfg, dtype=self.dtype, name="core")
        self.dec = GPT2Decoder(self.gpt2_cfg, with_cross=True,
                               return_hidden=True, dtype=self.dtype,
                               name="dec")
        self.lm_head = Dense(self.gpt2_cfg.vocab_size, use_bias=False,
                             dtype=jnp.float32, name="lm_head")

    def _encode(self, input_ids, img_feats, input_mask, chunk_mask,
                gather_index, num_chunks, deterministic):
        Lh = input_ids.shape[1]
        logits, _, inter = self.core._headless(
            input_ids, img_feats, input_mask, chunk_mask, gather_index,
            num_chunks, deterministic)
        if self.cfg.use_chunk_align:
            # decoder memory order differs from the cls memory (:1386-1389)
            memory = jnp.concatenate(
                [inter["s_seq"][:, 1:Lh], inter["g_seq"][:, 1:Lh],
                 inter["chunk_hidden"][:, 1:Lh]], axis=1)
            mem_mask = jnp.concatenate([inter["word_mask"]] * 3, axis=1)
        else:
            # `dec5_4_wo_chual` feeds the global hypothesis rows (:1724)
            memory = inter["g_seq"][:, 1:Lh]
            mem_mask = inter["word_mask"]
        return logits, memory, mem_mask, inter

    def encode_for_generation(self, input_ids, img_feats, input_mask,
                              chunk_mask, gather_index, num_chunks: int):
        """Classifier pass + per-question decoder memory of the PREDICTED
        answer's row (the `test_beam` pre-generation block, :2078-2196).
        Returns (pred_answer (Bq,), memory, memory_mask, cls_attn) where
        cls_attn is the summed reasoning-layer attention over the memory
        (the constraint-word ranking signal; zeros when use_reasoning=False).
        """
        C = self.cfg.num_choices
        logits, memory, mem_mask, inter = self._encode(
            input_ids, img_feats, input_mask, chunk_mask, gather_index,
            num_chunks, True)
        scores = binary_to_mp(logits, C)
        pred = scores.argmax(-1)
        mem_chosen = self._choose_row(memory, pred, C)
        mask_chosen = self._choose_row(mem_mask, pred, C)
        cls_attn = inter.get("cls_attn")
        if cls_attn is None:
            cls_attn = jnp.zeros(mem_mask.shape, jnp.float32)
        attn_chosen = self._choose_row(cls_attn, pred, C)
        return pred, mem_chosen, mask_chosen, attn_chosen

    @staticmethod
    def _choose_row(x, row_idx, C):
        """(B·C, ...) → (B, ...) picking `row_idx` within each C-group."""
        grouped = x.reshape((-1, C) + x.shape[1:])
        idx = row_idx.reshape(-1, 1, *([1] * (x.ndim - 1)))
        idx = jnp.broadcast_to(idx, (grouped.shape[0], 1)
                               + grouped.shape[2:]).astype(jnp.int32)
        return jnp.take_along_axis(grouped, idx, axis=1)[:, 0]

    def __call__(self, input_ids, img_feats, input_mask, chunk_mask,
                 gather_index, num_chunks: int, expl_ids, attn_mask,
                 label, gpt_labels, deterministic=True):
        C = self.cfg.num_choices
        logits, memory, mem_mask, _ = self._encode(
            input_ids, img_feats, input_mask, chunk_mask, gather_index,
            num_chunks, deterministic)

        label = label.astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        cls_loss = -jnp.mean(jnp.take_along_axis(logp, label[:, None], 1))
        scores = binary_to_mp(logits, C)
        pred = scores.argmax(-1)
        gold = label.reshape(-1, C).argmax(-1)
        matched = pred == gold

        # decoder sees the GOLD answer's memory, gradients stopped (:1386)
        mem_chosen = self._choose_row(jax.lax.stop_gradient(memory), gold, C)
        mask_chosen = self._choose_row(mem_mask, gold, C)
        expl = expl_ids.reshape(gold.shape[0], C, -1)[:, 0]
        attn = attn_mask.reshape(gold.shape[0], C, -1)[:, 0]
        tgts = gpt_labels.reshape(gold.shape[0], C, -1)[:, 0]

        hidden = self.dec(expl, attention_mask=attn, memory=mem_chosen,
                          memory_mask=mask_chosen,
                          deterministic=deterministic)
        lm_logits = self.lm_head(hidden.astype(jnp.float32))
        shift_logits = lm_logits[:, :-1]
        shift_labels = tgts[:, 1:].astype(jnp.int32)
        valid = (shift_labels != self.pad_token_id).astype(jnp.float32)
        logp_lm = jax.nn.log_softmax(shift_logits, axis=-1)
        nll = -jnp.take_along_axis(logp_lm, shift_labels[..., None],
                                   axis=-1)[..., 0]
        gen_loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return gen_loss, cls_loss, matched

    def generate(self, input_ids, img_feats, input_mask, chunk_mask,
                 gather_index, num_chunks: int, prompt_ids,
                 max_gen_len: int = 30, eos_id: int = 1):
        """Greedy rationale generation, FULL-RECOMPUTE reference path: each
        step re-runs the decoder over the whole buffer. Kept as the
        exactness oracle for the KV-cached `generate_rationale` (which is
        the serving path — O(L) attention work per step, beam/constrained
        capable). `prompt_ids` (B, Lp) is the decoding prefix (the
        reference slices everything before `<|b_rtnl|>`).
        Returns (tokens (B, Lp+max_gen_len), pred_answer)."""
        C = self.cfg.num_choices
        logits, memory, mem_mask, _ = self._encode(
            input_ids, img_feats, input_mask, chunk_mask, gather_index,
            num_chunks, True)
        scores = binary_to_mp(logits, C)
        pred = scores.argmax(-1)
        mem_chosen = self._choose_row(memory, pred, C)
        mask_chosen = self._choose_row(mem_mask, pred, C)

        B, Lp = prompt_ids.shape
        total = Lp + max_gen_len
        buf = jnp.full((B, total), self.pad_token_id, jnp.int32)
        buf = buf.at[:, :Lp].set(prompt_ids.astype(jnp.int32))
        finished = jnp.zeros((B,), bool)

        def body(carry, t):
            buf, finished = carry
            amask = (jnp.arange(total)[None, :] <= t).astype(jnp.int32)
            hidden = self.dec(buf, attention_mask=amask, memory=mem_chosen,
                              memory_mask=mask_chosen, deterministic=True)
            step_logits = self.lm_head(
                jnp.take_along_axis(
                    hidden, jnp.full((B, 1, 1), t).astype(jnp.int32)
                    .repeat(hidden.shape[-1], -1), axis=1)[:, 0]
                .astype(jnp.float32))
            nxt = step_logits.argmax(-1).astype(jnp.int32)
            nxt = jnp.where(finished, self.pad_token_id, nxt)
            buf = buf.at[:, t + 1].set(nxt)
            finished = jnp.logical_or(finished, nxt == eos_id)
            return (buf, finished), None

        (buf, _), _ = jax.lax.scan(
            body, (buf, finished),
            jnp.arange(Lp - 1, total - 1, dtype=jnp.int32))
        return buf, pred


def rationale_bonus_mask(cls_attn, input_ids, dec_vocab_size: int,
                         enc_to_dec_ids, stop_ids=(),
                         top_frac: float = 0.5):
    """Constraint-word extraction for the `_beam` rationale decoders
    (`test_beam`, :2114-2146): rank hypothesis tokens by the summed
    reasoning-layer CLS attention, keep the top half (minus stop words),
    and mark their DECODER-vocab ids in a dense (Bq, dec_vocab) bonus mask
    for `beam_search(bonus_mask=..., bonus_factor=...)`.

    Host-side numpy. `enc_to_dec_ids` maps encoder token id → decoder token
    id (build once from the two tokenizers; -1 = unmappable, e.g. subword
    continuations — the reference drops '#'-pieces and short tokens).
    `cls_attn` is (Bq, k·(Lh-1)) over k stacked copies of the hypothesis
    words (copies are folded by word before ranking); `input_ids` is the
    (Bq, Lh) hypothesis ids of the PREDICTED answer rows (gather with
    `ChunkAlignRationale._choose_row` first)."""
    import numpy as np

    cls_attn = np.asarray(cls_attn, np.float64)
    ids = np.asarray(input_ids)
    Bq = cls_attn.shape[0]
    Lw = ids.shape[1] - 1                          # hypothesis words
    k = cls_attn.shape[1] // Lw
    word_attn = cls_attn[:, :k * Lw].reshape(Bq, k, Lw).sum(1)
    mapping = np.asarray(enc_to_dec_ids)
    stop = set(int(s) for s in stop_ids)
    mask = np.zeros((Bq, dec_vocab_size), bool)
    keep = max(1, int(Lw * top_frac))
    for b in range(Bq):
        order = np.argsort(-word_attn[b])[:keep]
        for w in order:
            enc_id = int(ids[b, 1 + w])
            if enc_id in stop:
                continue
            dec_id = int(mapping[enc_id]) if enc_id < len(mapping) else -1
            if 0 <= dec_id < dec_vocab_size:
                mask[b, dec_id] = True
    return mask


def generate_rationale(model: ChunkAlignRationale, params, enc_inputs: dict,
                       prompt_ids, prompt_len, max_gen_len: int = 50,
                       mode: str = "greedy", num_beams: int = 5,
                       eos_id: int = 1, length_penalty: float = 1.0,
                       repetition_penalty: float = 1.0,
                       bonus_mask=None, bonus_factor: float = 1.0,
                       fsm=None, beams_per_state: int = 2,
                       min_constraints: int = 2):
    """KV-cached rationale generation — the `ChunkAlign_CLS_dec5_4_beam`
    family (:2042-2827) as one engine with modes:

      - "greedy":      cached greedy (== the full-recompute `generate`)
      - "beam":        fixed-shape beam search with the reference's
                       repetition/length penalties and the
                       `BeamSearchScorer_constrained` score-bonus rule
                       (`bonus_mask` from `rationale_bonus_mask`,
                       `bonus_factor` = the reference `constrained` arg)
      - "constrained": FSM-constrained beam search (utils/cbs.py machinery)
                       over explicit constraint token sequences

    `enc_inputs` carries the classifier inputs (input_ids...num_chunks);
    `prompt_ids` (Bq, Lp) is the rationale prompt, teacher-forced through
    the decoder (`prompt_len` int or (Bq,) for ragged prompts). Returns
    (tokens, pred_answer) — tokens (Bq, Lp+max_gen_len) for greedy/beam,
    or the constraint-selected best beam for "constrained".
    """
    from icka_tpu.generation.constrained import (
        constrained_beam_search,
        select_best_beam_with_constraints,
    )
    from icka_tpu.generation.decoding import beam_search, greedy_decode
    from icka_tpu.generation.gpt2_cache import (
        cached_gpt2_step,
        precompute_gpt2_cache,
    )

    pred, memory, mem_mask, _ = model.apply(
        params, method="encode_for_generation", **enc_inputs)
    dec_params = params["params"]["dec"]
    lm_kernel = params["params"]["lm_head"]["kernel"]
    B, Lp = prompt_ids.shape
    total = Lp + max_gen_len
    cache = precompute_gpt2_cache(dec_params, model.gpt2_cfg,
                                  memory, mem_mask, total)

    def step(tok, cache, t):
        return cached_gpt2_step(dec_params, model.gpt2_cfg, lm_kernel,
                                tok, t, cache)

    forced = jnp.asarray(prompt_ids, jnp.int32)
    init = forced[:, 0]
    pad = model.pad_token_id
    if mode == "greedy":
        st = greedy_decode(step, init, cache, total, eos_id, pad_id=pad,
                           repetition_penalty=repetition_penalty,
                           forced=forced, forced_len=prompt_len)
        return st.tokens, pred
    if mode == "beam":
        res = beam_search(step, init, cache, total, eos_id,
                          num_beams=num_beams, pad_id=pad,
                          length_penalty=length_penalty,
                          repetition_penalty=repetition_penalty,
                          forced=forced, forced_len=prompt_len,
                          bonus_mask=bonus_mask, bonus_factor=bonus_factor)
        return res.tokens[:, 0], pred
    if mode == "constrained":
        res = constrained_beam_search(step, init, cache, fsm, total,
                                      eos_id,
                                      beams_per_state=beams_per_state,
                                      pad_id=pad, forced=forced,
                                      forced_len=prompt_len)
        toks, _ = select_best_beam_with_constraints(
            res, fsm, min_constraints=min_constraints)
        return toks, pred
    raise ValueError(f"unknown mode {mode!r}")
