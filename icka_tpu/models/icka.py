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

    def forward_packed(self, batch):
        """Sequence-PACKED flagship inference (`icka_tpu.serving.packing.
        PackedICKAServer`): each row carries up to S (sentence, image)
        pairs. The reference pads every pair to max_seq_length=128 and
        pays the full cost (`Cross_Modal_Interaction_Module.py:941-1057`
        driven by `My_cross_attention.py:375-427`); packing fills rows to
        ~95% with exact per-pair isolation.

        The flagship runs TWO packed token layouts per row, because its
        pipeline does (the prompted encoder input is longer than the bare
        sentence by the spliced prompt head):

          layout A — concatenated BARE sentences (L1 = row_len): feeds
            the embedding encoder, txt2img fusion, gate, BiLSTM, CRF;
          layout B — concatenated SPLICED prompted sequences (L2 =
            row_len + S·(offset − 2 + 2·prompt_len)): feeds the prompt
            RoBERTa; prompt-vector positions carry placeholders resolved
            on device via `prompt_gather` into the per-slot prefix table
            (`PromptSpliceEncoder` packed path).

        batch keys (B rows, S slots; sentinel = S for slot ids, array
        length for gather indices):
          ids_a/pos_a/types_a/slot_a/valid_a/seg_start/seg_end (B, L1);
          ids_b/pos_b/types_b/slot_b/valid_b/prompt_gather (B, L2);
          sent_gather (B, L1) — layout-B index of each bare token's
            post-splice counterpart; seg_first (B, S) — layout-A index
            of each segment's first token;
          img_mask (B, S, 49), visual_grid (B, S, 7, 7, R),
            visual_mean (B, S, R), clip_features (B, S, C).

        Isolation is exact: block-diagonal self-attention in BOTH
        layouts, per-slot visual/alignment keys, host-computed
        per-segment position ids, BiLSTM carry resets at segment
        starts/ends (the `masked_lstm=True` exactness semantics — packed
        rows have no reference-style padding tail for the torch-parity
        quirk to scan), and a Viterbi lattice cut at `seg_start`.

        Returns (B, L1) decoded tags in packed order; the server slices
        per-segment spans back out.
        """
        cfg = self.cfg
        ids_a = batch["ids_a"]
        slot_a = batch["slot_a"]
        B, L1 = ids_a.shape
        S = batch["img_mask"].shape[1]
        P = cfg.prompt_len

        # 1. bare-sentence encoding, block-diagonal by slot (padding's
        # sentinel slot only sees padding)
        pair_a = (slot_a[:, :, None] == slot_a[:, None, :])
        seq, _ = self.embedding(ids_a, pair_a[:, None].astype(jnp.int32),
                                batch["types_a"],
                                position_ids=batch["pos_a"],
                                deterministic=True)
        seq = self.drop(seq, deterministic=True)

        # 2-3. txt2img fusion with per-slot visual keys: token i may read
        # region (s, r) iff slot_a[i] == s and img_mask[s, r]
        if cfg.use_txt2img:
            grid = batch["visual_grid"].reshape(
                B, S * cfg.num_regions, batch["visual_grid"].shape[-1])
            grid = self.vismap2text(grid)
            slot_onehot = (slot_a[:, :, None]
                           == jnp.arange(S, dtype=jnp.int32)[None, None, :])
            kv_ok = (slot_onehot[:, :, :, None]
                     & (batch["img_mask"][:, None, :, :] > 0)
                     ).reshape(B, L1, S * cfg.num_regions)
            cross = self.txt2img(
                seq, grid, additive_mask(kv_ok[:, None].astype(jnp.int32)),
                deterministic=True)
        else:
            cross = seq

        crossw = jnp.concatenate(
            [cross, jnp.zeros((B, 1, cross.shape[-1]), cross.dtype)],
            axis=1)

        # 4. knowledge alignment: one CLIP query PER SLOT attends over its
        # own segment's fused text (empty slots see a uniform softmax over
        # fully-masked keys; their prompt vectors are never consumed)
        q_ok = (jnp.arange(S, dtype=jnp.int32)[None, :, None]
                == slot_a[:, None, :])                         # (B, S, L1)
        align_bias = additive_mask(q_ok[:, None].astype(jnp.int32))
        if cfg.use_alignment:
            clip_tok = self.vismapping(
                batch["clip_features"].reshape(B, S, -1))      # (B, S, H)
        else:
            # ablation: each segment's first fused token stands in
            clip_tok = jnp.take_along_axis(
                crossw, batch["seg_first"][:, :, None], axis=1)
        for layer in self.align_layers:
            clip_tok = layer(clip_tok, cross, align_bias,
                             deterministic=True)

        # 5. instruction construction per slot → flat prefix table
        align_prompt = self.map_alignment(
            clip_tok.reshape(B * S, clip_tok.shape[-1]),
            deterministic=True)                              # (B·S, P, H)
        vision_prompt = self.map_vision(
            batch["visual_mean"].reshape(B * S, -1), deterministic=True)
        if not cfg.use_vision_prompt:
            vision_prompt = align_prompt
        if not cfg.use_alignment_prompt:
            align_prompt = vision_prompt
        prefix = jnp.concatenate([vision_prompt, align_prompt], axis=1)
        if self.needs_lastproj:
            prefix = self.lastproj(prefix)
        prefix = prefix.reshape(B, S * 2 * P, prefix.shape[-1])

        ids_b = batch["ids_b"]
        slot_b = batch["slot_b"]
        pair_b = (slot_b[:, :, None] == slot_b[:, None, :])
        out, _ = self.last_encoder(
            ids_b, pair_b[:, None].astype(jnp.int32), batch["types_b"],
            prefix, None, (0, 0), deterministic=True,
            position_ids=batch["pos_b"],
            prompt_gather=batch["prompt_gather"])
        outw = jnp.concatenate(
            [out, jnp.zeros((B, 1, out.shape[-1]), out.dtype)], axis=1)
        token_embedding = jnp.take_along_axis(
            outw, batch["sent_gather"][:, :, None], axis=1)  # (B, L1, Hl)

        # 6. relevance gate per slot, broadcast to tokens by owning slot
        if cfg.use_gate:
            cross0 = jnp.take_along_axis(
                crossw, batch["seg_first"][:, :, None], axis=1)
            tew = jnp.concatenate(
                [token_embedding,
                 jnp.zeros((B, 1, token_embedding.shape[-1]),
                           token_embedding.dtype)], axis=1)
            te0 = jnp.take_along_axis(
                tew, batch["seg_first"][:, :, None], axis=1)
            g = self.gate(cross0.reshape(B * S, -1),
                          te0.reshape(B * S, -1)).reshape(B, S)
        else:
            g = jnp.full((B, S), cfg.gate_fixed, self.dtype)
        g_tok = jnp.take_along_axis(
            jnp.concatenate([g, jnp.zeros((B, 1), g.dtype)], axis=1),
            jnp.minimum(slot_a, S), axis=1)                    # (B, L1)
        fused = (g_tok[:, :, None] * token_embedding
                 + (1.0 - g_tok)[:, :, None] * cross)

        # 7. BiLSTM with carry resets at segment boundaries → CRF with a
        # reset-cut Viterbi lattice
        x = self.lstm(fused, mask=batch["valid_a"],
                      reset_fwd=batch["seg_start"],
                      reset_bwd=batch["seg_end"])
        emissions = self.classifier(x)
        return self.crf.decode(emissions, batch["valid_a"],
                               reset=batch["seg_start"])
