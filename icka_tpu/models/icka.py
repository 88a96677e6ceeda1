"""The flagship ICKA model: Instruction Construction + Knowledge Alignment
multimodal NER, as ONE jittable XLA program.

Rebuilds `MTCCMBertForMMTokenClassificationCRF`
(`Cross_Modal_Interaction_Module.py:887-1057`) and folds its 10 ablation
copies (:1061-2484) into config flags (see `ICKAConfig`). Pipeline:

  1. text encoding: RoBERTa over the bare sentence (:949-950)
  2. visual grid: 7×7×2048 ResNet features → 49×H (`vismap2text`, :956-958)
  3. txt2img cross-attention fusion, depth `layer_num1` (:968-969)
  4. knowledge alignment: CLIP text feature → H, refined by two
     `CrossEncoder`s attending over the fused text (:984-990)
  5. instruction construction: two 5-slot prompt prefixes from MLP mapping
     networks (:995-1004), spliced into the prompted RoBERTa-large in place
     of its two `<mask>` tokens (`PromptSpliceEncoder`, :1010-1024)
  6. relevance gate: global-feature fusion + sigmoid blend of prompt-encoder
     tokens vs cross-modal tokens (:1029-1036)
  7. BiLSTM → classifier → CRF (:1042-1057)

All branches are static-shape; the whole forward + CRF compiles to a single
XLA program. Visual features arrive NHWC (B, 7, 7, C).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.core.config import ICKAConfig
from icka_tpu.nn.attention import CrossEncoder
from icka_tpu.nn.bert import PromptSpliceEncoder, TextEncoder
from icka_tpu.nn.crf import CRF
from icka_tpu.nn.layers import Dense, additive_mask
from icka_tpu.nn.lstm import BiLSTM


class MappingNetwork(nn.Module):
    """Prompt mapping network (:914-928): Dropout → Linear(in, W·P) → Tanh →
    Dropout → Linear(W·P, H·P), reshaped to (B, P, H)."""

    prompt_len: int
    width: int
    hidden: int
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        P = self.prompt_len
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = jnp.tanh(Dense(self.width * P, dtype=self.dtype, name="wi")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = Dense(self.hidden * P, dtype=self.dtype, name="wo")(x)
        return x.reshape(x.shape[0], P, self.hidden)


class GlobalFusionGate(nn.Module):
    """`cls_layer_both` + `aux_head` (:873-884, :933-935): LayerNorm(sum of
    the two global features) → Linear → Linear(H, 1) → sigmoid."""

    hidden: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, lang_feat, img_feat):
        x = nn.LayerNorm(epsilon=self.eps, name="norm")(lang_feat + img_feat)
        x = Dense(self.hidden, dtype=self.dtype, name="proj")(x)
        logit = Dense(1, dtype=self.dtype, name="aux_head")(x)
        return nn.sigmoid(logit)


class ICKAModel(nn.Module):
    cfg: ICKAConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        H = cfg.embedding.hidden_size
        self.embedding = TextEncoder(cfg.embedding, with_pooler=False,
                                     dtype=self.dtype, name="embedding")
        self.drop = nn.Dropout(cfg.embedding.hidden_dropout_prob)
        self.vismapping = Dense(H, dtype=self.dtype, name="vismapping")
        self.vismap2text = Dense(H, dtype=self.dtype, name="vismap2text")
        self.txt2img = CrossEncoder(cfg.embedding, cfg.layer_num1,
                                    dtype=self.dtype, name="txt2img")
        self.align_layers = [
            CrossEncoder(cfg.embedding, cfg.layer_num1, dtype=self.dtype,
                         name=f"align_{i}") for i in range(2)]
        self.map_alignment = MappingNetwork(
            cfg.prompt_len, cfg.prompt_hidden, H, dtype=self.dtype,
            name="map_alignment")
        self.map_vision = MappingNetwork(
            cfg.prompt_len, cfg.prompt_hidden, H, dtype=self.dtype,
            name="map_vision")
        self.needs_lastproj = H != cfg.last_hidden
        if self.needs_lastproj:
            self.lastproj = Dense(cfg.last_hidden, dtype=self.dtype,
                                  name="lastproj")
        self.last_encoder = PromptSpliceEncoder(
            cfg.last_encoder, dtype=self.dtype, name="last_encoder")
        self.gate = GlobalFusionGate(H, cfg.embedding.layer_norm_eps,
                                     dtype=self.dtype, name="gate")
        self.lstm = BiLSTM(hidden=cfg.last_hidden, dtype=self.dtype,
                           quant=cfg.last_encoder.quant, name="lstm")
        self.classifier = Dense(cfg.num_labels, dtype=self.dtype,
                                name="classifier")
        self.crf = CRF(num_tags=cfg.num_labels, name="crf")

    def emissions(self, *, input_ids, segment_ids, input_mask,
                  ori_input_ids, ori_input_mask, ori_segment_ids,
                  img_mask, clip_features, visual_mean, visual_grid,
                  mask_positions, offset: int, deterministic=True):
        """Everything up to the CRF: returns (emissions, aux dict)."""
        cfg = self.cfg
        B = ori_input_ids.shape[0]

        # 1. text encoding (+ dropout, :953)
        seq, _ = self.embedding(ori_input_ids, ori_input_mask,
                                ori_segment_ids, deterministic=deterministic)
        seq = self.drop(seq, deterministic=deterministic)

        # 2-3. visual grid → txt2img fusion
        if cfg.use_txt2img:
            grid = visual_grid.reshape(B, -1, visual_grid.shape[-1])
            grid = self.vismap2text(grid)                      # (B, 49, H)
            img_bias = additive_mask(img_mask)
            cross = self.txt2img(seq, grid, img_bias,
                                 deterministic=deterministic)
        else:
            cross = seq

        # 4. knowledge alignment: CLIP token attends over fused text
        text_bias = additive_mask(ori_input_mask)
        if cfg.use_alignment:
            clip_tok = self.vismapping(
                clip_features.reshape(B, -1))[:, None, :]       # (B, 1, H)
        else:
            clip_tok = cross[:, 0:1, :]   # ablation: global fused token
        for layer in self.align_layers:
            clip_tok = layer(clip_tok, cross, text_bias,
                             deterministic=deterministic)

        # 5. instruction construction
        align_prompt = self.map_alignment(clip_tok.reshape(B, -1),
                                          deterministic=deterministic)
        vision_prompt = self.map_vision(visual_mean,
                                        deterministic=deterministic)
        if not cfg.use_vision_prompt:
            vision_prompt = align_prompt
        if not cfg.use_alignment_prompt:
            align_prompt = vision_prompt
        prefix = jnp.concatenate([vision_prompt, align_prompt], axis=1)
        if self.needs_lastproj:
            prefix = self.lastproj(prefix)
        prompt_mask = jnp.repeat(input_mask[:, :1], 2 * cfg.prompt_len,
                                 axis=1)
        out, _ = self.last_encoder(input_ids, input_mask, segment_ids,
                                   prefix, prompt_mask, mask_positions,
                                   deterministic=deterministic)
        # output layout: L − 2 + 2P; the sentence starts at
        # offset − 2 + 2P (:1020-1024). The sentence-region length is
        # derived from the input shape (== cfg.max_seq_length in the
        # reference layout; shorter under length-bucketed serving).
        tok_start = offset - 2 + 2 * cfg.prompt_len
        # the prompted input may carry tail slack beyond offset + sentence
        # (`max_input_length`, features.py:126-128), so the sentence-region
        # width comes from the bare-sentence tensor (== cfg.max_seq_length
        # in the reference layout; shorter under bucketed serving)
        sent_len = ori_input_ids.shape[1]
        token_embedding = out[:, tok_start:tok_start + sent_len, :]

        # 6. relevance gate
        if cfg.use_gate:
            g = self.gate(cross[:, 0, :], token_embedding[:, 0, :])
            g = g.reshape(B, 1, 1)
        else:
            g = jnp.full((B, 1, 1), cfg.gate_fixed, self.dtype)
        fused = g * token_embedding + (1.0 - g) * cross

        # 7. BiLSTM → emissions. masked_lstm (serving-exactness mode) holds
        # the recurrent state at padding timesteps so bucketed decode is
        # bit-identical to the 128-padded layout; default False keeps torch
        # nn.LSTM parity (the reference scans the padding tail, :1042).
        x = self.lstm(fused,
                      mask=ori_input_mask if cfg.masked_lstm else None)
        emissions = self.classifier(x)
        return emissions, {"gate": g, "cross": cross,
                           "token_embedding": token_embedding}

    def __call__(self, batch, mask_positions, offset: int, mode: str = "train",
                 labels=None, deterministic=None,
                 loss_reduction: str = "token_mean"):
        """Reference-forward-compatible entry. `batch` is a dict of arrays
        (see `icka_tpu.data.features`); mode ∈ {train, dev, test} selects the
        CRF head behavior exactly like the reference (:1046-1057).
        `loss_reduction` applies to the dev-mode loss: "none" yields the
        per-row NLL (B,) so evaluators can aggregate EXACT token-mean
        losses over ragged eval tails (padded duplicate rows excluded)."""
        if deterministic is None:
            deterministic = mode != "train"
        emissions, _ = self.emissions(
            input_ids=batch["input_ids"],
            segment_ids=batch["segment_ids"],
            input_mask=batch["input_mask"],
            ori_input_ids=batch["ori_input_ids"],
            ori_input_mask=batch["ori_input_mask"],
            ori_segment_ids=batch["ori_segment_ids"],
            img_mask=batch["img_mask"],
            clip_features=batch["clip_features"],
            visual_mean=batch["visual_mean"],
            visual_grid=batch["visual_grid"],
            mask_positions=mask_positions,
            offset=offset,
            deterministic=deterministic,
        )
        output_mask = batch["output_mask"]
        if mode == "train":
            return -self.crf(emissions, labels, output_mask,
                             reduction="token_mean")
        if mode == "dev":
            pred = self.crf.decode(emissions, output_mask)
            loss = -self.crf(emissions, labels, output_mask,
                             reduction=loss_reduction)
            return pred, loss
        if mode == "test":
            return self.crf.decode(emissions, output_mask)
        raise ValueError(f"unknown mode {mode!r}")
