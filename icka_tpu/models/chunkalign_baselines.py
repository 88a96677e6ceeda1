"""ChunkAlign baseline and ensemble classes — the VCR family tail.

Thin compositions over the encoders in `icka_tpu.models.chunkalign`,
closing reference component #20's remaining classes
(`modeling/modeling_vcr_chunkalign_v10.py`):

  - `BaselineCLS`        ≙ `BaseLine_cls_xe` (:376): global VL encoder →
    pooled CLS → binary-per-choice classifier, no chunk/reasoning stages.
  - `BaselineRationale`  ≙ `BaseLine` (:423) and `Base_freeze` (:535): the
    baseline classifier plus a GPT-2 rationale decoder cross-attending
    over the gold answer's encoder states. `BaseLine` feeds the FULL
    joint sequence (CLS + words + image rows, :457); `Base_freeze` feeds
    hypothesis words only and freezes the encoder (:571,:612) —
    `hypo_only_memory` / `freeze_encoder` flags.
  - `EnsembleRefiner`    ≙ `ChunkAlign_CLS_enc4_align_ensemble` (:874):
    frozen global+chunk encoders, ensembled CLS refined by TWO
    `ClsLayer_lyx` reasoning layers (`cross_attention_lyx`-based — the
    Bart-style gated MHA already rebuilt as `GatedCrossAttention`),
    returning the refined CLS and the align loss. Used by the
    abstract/specific ensembles (`modeling_ensemble.py`, component #24).

All losses/decodes are fixed-shape; the rationale decoder reuses the
KV-cached engines via `icka_tpu.models.chunkalign.generate_rationale`'s
building blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.models.chunkalign import (
    ChunkAlignConfig,
    GlobalVLEncoder,
    StagedVLEncoder,
    binary_to_mp,
)
from icka_tpu.nn.attention import FeedForward, GatedCrossAttention
from icka_tpu.nn.layers import Dense, LayerNorm, additive_mask


class BaselineCLS(nn.Module):
    """`BaseLine_cls_xe` (:376-421): Oscar-style joint encoder + binary
    classifier. Train: (cls_loss, matched); eval (label=None):
    (pred, scores)."""

    cfg: ChunkAlignConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, img_feats, input_mask, label=None,
                 deterministic=True):
        C = self.cfg.num_choices
        _, pooled = GlobalVLEncoder(self.cfg, dtype=self.dtype,
                                    name="oscar")(
            input_ids, img_feats, input_mask, deterministic=deterministic)
        pooled = nn.Dropout(self.cfg.encoder.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        logits = Dense(2, dtype=self.dtype, name="classifier")(pooled)
        scores = binary_to_mp(logits, C)
        pred = scores.argmax(-1)
        if label is None:
            return pred, scores
        logp = jax.nn.log_softmax(logits, axis=-1)
        cls_loss = -jnp.mean(
            jnp.take_along_axis(logp, label[:, None].astype(jnp.int32), 1))
        gold = label.reshape(-1, C).argmax(-1)
        return cls_loss, pred == gold


class BaselineRationale(nn.Module):
    """`BaseLine` (:423-533) / `Base_freeze` (:535-659): baseline
    classifier + GPT-2 rationale decoder over the gold answer's encoder
    states (stop-gradient, like the reference `.detach()`).

    Train `__call__`: (gen_loss, cls_loss, matched).
    """

    cfg: ChunkAlignConfig
    gpt2_cfg: "object" = None
    pad_token_id: int = 0
    hypo_only_memory: bool = False     # Base_freeze feeds words only
    freeze_encoder: bool = False       # Base_freeze stops encoder grads
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from icka_tpu.models.gpt2 import GPT2Decoder
        self.oscar = GlobalVLEncoder(self.cfg, dtype=self.dtype,
                                     name="oscar")
        self.classifier = Dense(2, dtype=self.dtype, name="classifier")
        self.dec = GPT2Decoder(self.gpt2_cfg, with_cross=True,
                               return_hidden=True, dtype=self.dtype,
                               name="dec")
        self.lm_head = Dense(self.gpt2_cfg.vocab_size, use_bias=False,
                             dtype=jnp.float32, name="lm_head")

    def _memory(self, seq, input_mask, hypo_len):
        if self.hypo_only_memory:
            return seq[:, 1:hypo_len], input_mask[:, 1:hypo_len]
        return seq, input_mask

    @staticmethod
    def _choose_row(x, row_idx, C):
        grouped = x.reshape((-1, C) + x.shape[1:])
        idx = row_idx.reshape(-1, 1, *([1] * (x.ndim - 1)))
        idx = jnp.broadcast_to(idx, (grouped.shape[0], 1)
                               + grouped.shape[2:]).astype(jnp.int32)
        return jnp.take_along_axis(grouped, idx, axis=1)[:, 0]

    def __call__(self, input_ids, img_feats, input_mask, expl_ids,
                 attn_mask, label, deterministic=True):
        C = self.cfg.num_choices
        hypo_len = input_ids.shape[1]
        seq, pooled = self.oscar(input_ids, img_feats, input_mask,
                                 deterministic=deterministic)
        if self.freeze_encoder:
            seq = jax.lax.stop_gradient(seq)
            pooled = jax.lax.stop_gradient(pooled)
        logits = self.classifier(pooled)
        label = label.astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        cls_loss = -jnp.mean(jnp.take_along_axis(logp, label[:, None], 1))
        scores = binary_to_mp(logits, C)
        gold = label.reshape(-1, C).argmax(-1)
        matched = scores.argmax(-1) == gold

        memory, mem_mask = self._memory(jax.lax.stop_gradient(seq),
                                        input_mask, hypo_len)
        mem_chosen = self._choose_row(memory, gold, C)
        mask_chosen = self._choose_row(mem_mask, gold, C)
        expl = expl_ids.reshape(gold.shape[0], C, -1)[:, 0]
        attn = attn_mask.reshape(gold.shape[0], C, -1)[:, 0]

        hidden = self.dec(expl, attention_mask=attn, memory=mem_chosen,
                          memory_mask=mask_chosen,
                          deterministic=deterministic)
        lm_logits = self.lm_head(hidden.astype(jnp.float32))
        shift_logits = lm_logits[:, :-1]
        shift_labels = expl[:, 1:].astype(jnp.int32)
        valid = (shift_labels != self.pad_token_id).astype(jnp.float32)
        logp_lm = jax.nn.log_softmax(shift_logits, axis=-1)
        nll = -jnp.take_along_axis(logp_lm, shift_labels[..., None],
                                   axis=-1)[..., 0]
        gen_loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return gen_loss, cls_loss, matched

    def encode_for_generation(self, input_ids, img_feats, input_mask):
        """(pred, memory, memory_mask) of the PREDICTED answer row — plug
        into the KV-cached engines exactly like `generate_rationale`."""
        C = self.cfg.num_choices
        hypo_len = input_ids.shape[1]
        seq, pooled = self.oscar(input_ids, img_feats, input_mask,
                                 deterministic=True)
        logits = self.classifier(pooled)
        pred = binary_to_mp(logits, C).argmax(-1)
        memory, mem_mask = self._memory(seq, input_mask, hypo_len)
        return (pred, self._choose_row(memory, pred, C),
                self._choose_row(mem_mask, pred, C))


class LyxClsLayer(nn.Module):
    """`ClsLayer_lyx` (:840-873): CLS refined by a Bart-style gated MHA
    (`cross_attention_lyx` ≙ GatedCrossAttention, 8 heads) + LN + FFN."""

    cfg: ChunkAlignConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, cls, mem_bias, prior=None,
                 deterministic=True):
        enc = self.cfg.encoder
        a = GatedCrossAttention(enc.hidden_size, 8, dtype=self.dtype,
                                dropout_rate=0.1, name="cross")(
            cls[:, None, :], kv=memory, bias=mem_bias, tau=1.0,
            neg_type=False, prior=prior, deterministic=deterministic)
        a = nn.Dropout(enc.hidden_dropout_prob)(
            a[:, 0], deterministic=deterministic)
        x = LayerNorm(eps=enc.layer_norm_eps, dtype=self.dtype,
                      name="norm")(a + cls)
        x = FeedForward(enc.intermediate_size, enc.layer_norm_eps,
                        dtype=self.dtype, name="ffn")(
            x[:, None, :], deterministic)
        return x[:, 0]


class EnsembleRefiner(nn.Module):
    """`ChunkAlign_CLS_enc4_align_ensemble` (:874-1000): frozen dual
    encoders → ensembled CLS → 2 × `ClsLayer_lyx` over the 3-copy word
    memory. Returns (refined_cls, align_loss) — downstream ensembles
    (`icka_tpu.models.ensemble`) consume the refined CLS."""

    cfg: ChunkAlignConfig
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, img_feats, input_mask, chunk_mask,
                 gather_index, num_chunks: int, align_pos=None,
                 total_label=None, deterministic=True):
        Lh = input_ids.shape[1]
        g_seq, g_cls = GlobalVLEncoder(self.cfg, dtype=self.dtype,
                                       name="global_enc")(
            input_ids, img_feats, input_mask, deterministic=deterministic)
        s_seq, s_cls, cross_probs, chunk_hidden = StagedVLEncoder(
            self.cfg, dtype=self.dtype, name="seq_enc")(
            input_ids, img_feats, input_mask, chunk_mask, gather_index,
            num_chunks, deterministic=deterministic)
        # reference runs both encoders under no_grad (:898-913) — the
        # align loss is computed from no-grad attention too
        g_seq, g_cls, s_seq, s_cls, chunk_hidden, cross_probs = \
            jax.tree.map(
                jax.lax.stop_gradient,
                (g_seq, g_cls, s_seq, s_cls, chunk_hidden, cross_probs))
        cls = Dense(self.cfg.encoder.hidden_size, dtype=self.dtype,
                    name="cls_ensemble_1")(
            jnp.concatenate([g_cls, s_cls], -1))
        memory = jnp.concatenate(
            [g_seq[:, 1:Lh], s_seq[:, 1:Lh], chunk_hidden[:, 1:Lh]],
            axis=1)
        word_mask = input_mask[:, 1:Lh]
        mem_bias = additive_mask(jnp.concatenate([word_mask] * 3, axis=1))
        for i in range(self.num_layers):
            cls = LyxClsLayer(self.cfg, dtype=self.dtype,
                              name=f"cls_layer_lyx_{i}")(
                memory, cls, mem_bias, deterministic=deterministic)

        align_loss = jnp.zeros((), jnp.float32)
        if total_label is not None:
            attn = cross_probs.sum(axis=(1, 2))          # (B·C, L, L)
            attn = attn[:, :Lh, Lh:]
            attn = jnp.where(attn == 0, -1e5, attn)
            attn = jax.nn.log_softmax(attn, axis=-1)
            sup = (align_pos > 0).astype(jnp.float32)
            gold_region = total_label.astype(jnp.int32)
            picked = jnp.take_along_axis(attn, gold_region[..., None],
                                         axis=-1)[..., 0]
            align_loss = -(picked * sup).sum() / jnp.maximum(sup.sum(), 1.0)
        return cls, align_loss
