"""The my_bert model family: gated bichannel fusion + contrastive knowledge
alignment over a single legacy-BERT encoder.

Rebuilds `MTCCMBertForMMTokenClassificationCRF` from
`my_bert/gate_cl_modeling.py:1248-1400` (variant="gate_cl"),
`my_bert/cl_modeling.py:1252` (variant="cl") and
`my_bert/ip_modeling.py:1247` (variant="ip") as one model with a variant
switch — the three reference files are ~95% identical copies.

TPU-native deltas from the reference:

  - InfoNCE is fully vectorized: one (B, B) cosine-similarity matrix and a
    log-softmax diagonal, replacing the per-sample Python loops
    (`gate_cl_modeling.py:1280-1309`) — the SURVEY-flagged obvious XLA win;
  - the negative-pair construction (swapping the cross-modal features of the
    last `negative_rate` samples, :1348-1356) is a static batch permutation
    (`negative_swap_permutation`) instead of an in-place tensor shuffle;
  - everything (losses included) compiles into one XLA program.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.core.config import GateCLConfig
from icka_tpu.nn.attention import CrossEncoder
from icka_tpu.nn.bert import TextEncoder
from icka_tpu.nn.crf import CRF
from icka_tpu.nn.layers import Dense, additive_mask


def negative_swap_permutation(batch: int, negative_rate: int) -> np.ndarray:
    """Index permutation replicating the reference's negative-sample swap:
    within the last `negative_rate` samples, the first half exchanges
    cross-modal features with the second half (:1348-1356)."""
    idx = np.arange(batch)
    if negative_rate and batch > negative_rate:
        r = negative_rate
        half = r // 2
        lo = batch - r
        mid = batch - r + half
        front = idx[lo:mid].copy()
        idx[lo:mid] = idx[mid:batch - r + 2 * half]
        idx[mid:batch - r + 2 * half] = front
    return idx


def info_nce(text_h, image_h, temp, temp_lamb):
    """Bidirectional InfoNCE over cosine similarities
    (`total_loss`/`text_toimage_loss`/`image_totext_loss`, :1276-1316).
    Returns the same scalar as the reference's per-sample loops."""
    t = text_h / jnp.linalg.norm(text_h, axis=-1, keepdims=True)
    v = image_h / jnp.linalg.norm(image_h, axis=-1, keepdims=True)
    sim = (t @ v.T) / temp                                    # (B, B)
    diag = jnp.arange(sim.shape[0])
    t2i = -(sim[diag, diag] - jnp.log(jnp.sum(jnp.exp(sim), axis=1)))
    i2t = -(sim.T[diag, diag] - jnp.log(jnp.sum(jnp.exp(sim.T), axis=1)))
    B = sim.shape[0]
    return (temp_lamb * jnp.sum(t2i) + (1 - temp_lamb) * jnp.sum(i2t)) / B


class GateCLModel(nn.Module):
    cfg: GateCLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        H = cfg.encoder.hidden_size
        self.bert = TextEncoder(cfg.encoder, with_pooler=True,
                                dtype=self.dtype, name="bert")
        self.drop = nn.Dropout(cfg.encoder.hidden_dropout_prob)
        self.vismap2text = Dense(H, dtype=self.dtype, name="vismap2text")
        self.txt2img = CrossEncoder(cfg.encoder, cfg.layer_num1,
                                    dtype=self.dtype, name="txt2img")
        self.classifier = Dense(cfg.num_labels, dtype=self.dtype,
                                name="classifier")
        self.crf = CRF(num_tags=cfg.num_labels, name="crf")
        if cfg.variant == "gate_cl":
            self.crs_classifier = Dense(2, dtype=self.dtype,
                                        name="crs_classifier")
        if cfg.variant in ("gate_cl", "cl"):
            self.gate_text = Dense(H, dtype=self.dtype, name="gate_text")
            self.gate_image = Dense(H, dtype=self.dtype, name="gate_image")
            self.text_dense_cl = Dense(H, dtype=self.dtype,
                                       name="text_dense_cl")
            self.text_output_cl = Dense(H, dtype=self.dtype,
                                        name="text_output_cl")
            self.image_dense_cl = Dense(H, dtype=self.dtype,
                                        name="image_dense_cl")
            self.image_output_cl = Dense(H, dtype=self.dtype,
                                         name="image_output_cl")

    def __call__(self, input_ids, segment_ids, input_mask, img_mask,
                 visual_mean, visual_grid, labels=None, deterministic=True,
                 return_emissions=False):
        """Train: returns scalar loss; inference (labels=None): decoded tags.
        Matches the reference calling convention (:1319-1400).
        `return_emissions=True` short-circuits to the pre-CRF emissions —
        used by the int8 serving accuracy-contract tests."""
        cfg = self.cfg
        B = input_ids.shape[0]
        seq, pooled = self.bert(input_ids, input_mask, segment_ids,
                                deterministic=deterministic)
        seq = self.drop(seq, deterministic=deterministic)

        grid = visual_grid.reshape(B, -1, visual_grid.shape[-1])
        grid = self.vismap2text(grid)
        cross = self.txt2img(seq, grid, additive_mask(img_mask),
                             deterministic=deterministic)

        training = labels is not None
        aux_loss = 0.0
        if cfg.variant == "gate_cl":
            if training:
                perm = negative_swap_permutation(B, cfg.negative_rate)
                cross_used = cross[jnp.asarray(perm)]
                labels_crs = jnp.asarray(
                    (np.arange(B) < B - cfg.negative_rate).astype(np.int32)
                    if cfg.negative_rate and B > cfg.negative_rate
                    else np.ones(B, np.int32))
            else:
                cross_used = cross
                labels_crs = None
            # The relation classifier flattens (L, 2H) positions into one
            # feature vector (`crs_classifier` = Linear(2H*128, 2),
            # gate_cl_modeling.py:1258). Pad the position axis to
            # max_seq_length so the weight shape is independent of the
            # padded batch length — a no-op at L = max_seq_length, and the
            # enabler for length-bucketed serving (icka_tpu.serving):
            # missing positions contribute exactly 0, like all-zero rows.
            crs_in = jnp.concatenate([seq, cross_used], axis=-1)
            if cfg.masked_crs:
                # serving-exactness mode: padding positions contribute
                # exactly 0 to the flatten at ANY padded length, so the
                # relevance gate P is bit-identical under bucketing.
                # Default False keeps the reference quirk (the gate
                # flattens pad-token activations, :1258).
                crs_in = crs_in * input_mask[:, :, None].astype(crs_in.dtype)
            L = crs_in.shape[1]
            if L < cfg.max_seq_length:
                crs_in = jnp.pad(
                    crs_in, ((0, 0), (0, cfg.max_seq_length - L), (0, 0)))
            crs_logits = self.crs_classifier(crs_in.reshape(B, -1))
            P = nn.softmax(crs_logits, axis=-1)[:, -1]
            cross_used = P[:, None, None] * cross_used
            gate = nn.sigmoid(self.gate_text(seq)
                              + self.gate_image(cross_used))
            gated = gate * cross_used
            if training:
                logp = nn.log_softmax(crs_logits, axis=-1)
                crs_loss = -jnp.mean(
                    jnp.take_along_axis(logp, labels_crs[:, None], 1))
                aux_loss = aux_loss + crs_loss
        elif cfg.variant == "cl":
            gate = nn.sigmoid(self.gate_text(seq) + self.gate_image(cross))
            gated = gate * cross
        else:  # "ip"
            gated = cross

        final = jnp.concatenate([seq, gated], axis=-1)
        emissions = self.classifier(final)
        if return_emissions:
            return emissions

        # contrastive projection heads run unconditionally so params exist
        # whether the module is initialized from the train or infer path
        if cfg.variant in ("gate_cl", "cl"):
            text_cl = self.text_output_cl(
                nn.relu(self.text_dense_cl(pooled)))
            image_cl = self.image_output_cl(
                nn.relu(self.image_dense_cl(visual_mean)))

        if not training:
            return self.crf.decode(emissions, input_mask)

        if cfg.variant in ("gate_cl", "cl"):
            aux_loss = aux_loss + info_nce(text_cl, image_cl,
                                           cfg.temp, cfg.temp_lamb)

        main_loss = -self.crf(emissions, labels, input_mask,
                              reduction="mean")
        if cfg.variant == "ip":
            return main_loss
        alpha = cfg.alpha if cfg.variant == "gate_cl" else cfg.cl_alpha
        return alpha * main_loss + (1 - alpha) * aux_loss

    def forward_packed(self, input_ids, position_ids, token_type_ids,
                       slot_index, token_valid, seg_start, img_mask,
                       visual_grid, seg_gather):
        """Sequence-PACKED inference: each row carries up to S short
        sentences (the reference pads every tweet to 128 and pays the full
        cost, `My_cross_attention.py:375-427`; bucketing removes most of
        that tax, packing removes the rest by filling rows to ~100%).

        Inputs (B rows, L = packed row length, S = slots per row):
          input_ids / position_ids / token_type_ids (B, L) — concatenated
            segments; position ids are HOST-computed per segment in the
            encoder's dialect so each sentence sees exactly the positions
            it would see alone;
          slot_index (B, L) int32 — owning slot per token, S for padding;
          token_valid (B, L) {0,1}; seg_start (B, L) {0,1} first-token
            marks;
          img_mask (B, S, num_regions); visual_grid (B, S, 7, 7, R) — one
            image PER SLOT (every pair keeps its own image);
          seg_gather (B, S, max_seq_length) int32 — indices into the row's
            token axis mapping (slot, within-segment offset) → position,
            L for "missing" (reads an appended zero row).

        Isolation is exact: block-diagonal self-attention (tokens only see
        their own segment), per-slot visual keys in the cross-attention,
        per-segment position ids, Viterbi lattice cut at `seg_start`
        (`crf_decode(reset=...)`). The relation gate uses the
        `masked_crs=True` semantics (missing positions contribute exact
        zeros to the flatten) regardless of the config flag — packed rows
        have no reference-style padding tail to flatten.

        Returns (B, L) decoded tags in packed order; the server slices
        per-segment spans back out.
        """
        cfg = self.cfg
        B, L = input_ids.shape
        S = img_mask.shape[1]
        H = cfg.encoder.hidden_size
        R_n = cfg.num_regions

        # block-diagonal self-attention: key j visible to query i iff the
        # same slot owns both (padding's sentinel slot only sees padding)
        pair = (slot_index[:, :, None] == slot_index[:, None, :])
        seq, pooled = self.bert(
            input_ids, pair[:, None].astype(jnp.int32), token_type_ids,
            position_ids=position_ids, deterministic=True)

        grid = visual_grid.reshape(B, S * R_n, visual_grid.shape[-1])
        grid = self.vismap2text(grid)
        # per-slot visual keys: query token i may read region (s, r) iff
        # slot_index[i] == s and img_mask[s, r]
        slot_onehot = (slot_index[:, :, None]
                       == jnp.arange(S, dtype=jnp.int32)[None, None, :])
        kv_ok = (slot_onehot[:, :, :, None]
                 & (img_mask[:, None, :, :] > 0)).reshape(B, L, S * R_n)
        cross = self.txt2img(seq, grid,
                             additive_mask(kv_ok[:, None].astype(jnp.int32)),
                             deterministic=True)

        if cfg.variant == "gate_cl":
            validf = token_valid[:, :, None].astype(cross.dtype)
            crs_in = jnp.concatenate([seq, cross], axis=-1) * validf
            # per-segment flatten: gather each slot's tokens into the
            # canonical (max_seq_length, 2H) layout the relation
            # classifier was trained on (missing positions = exact zeros,
            # the masked_crs contract), then one batched Dense call.
            work = jnp.concatenate(
                [crs_in, jnp.zeros((B, 1, 2 * H), crs_in.dtype)], axis=1)
            idx = seg_gather.reshape(B, S * cfg.max_seq_length)[:, :, None]
            g = jnp.take_along_axis(work, idx, axis=1)
            g = g.reshape(B * S, cfg.max_seq_length * 2 * H)
            crs_logits = self.crs_classifier(g)               # (B*S, 2)
            P = nn.softmax(crs_logits, axis=-1)[:, -1].reshape(B, S)
            # P per token via its owning slot (sentinel slot → 0)
            P_tok = jnp.take_along_axis(
                jnp.concatenate([P, jnp.zeros((B, 1), P.dtype)], axis=1),
                jnp.minimum(slot_index, S), axis=1)           # (B, L)
            cross_used = P_tok[:, :, None].astype(cross.dtype) * cross
            gate = nn.sigmoid(self.gate_text(seq)
                              + self.gate_image(cross_used))
            gated = gate * cross_used
        elif cfg.variant == "cl":
            gate = nn.sigmoid(self.gate_text(seq) + self.gate_image(cross))
            gated = gate * cross
        else:  # "ip"
            gated = cross

        final = jnp.concatenate([seq, gated], axis=-1)
        emissions = self.classifier(final)
        return self.crf.decode(emissions, token_valid, reset=seg_start)
