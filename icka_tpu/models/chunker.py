"""CoNLL-2000 chunk tagger — the trained chunker behind ChunkAlign data prep.

The reference prepares VCR chunk masks with `BertModelWithHeads` +
the AdapterHub `bert-base-uncased-pf-conll2000` Pfeiffer adapter and a
23-label tagging head (`utils/GetChunk_v4_vcr.py:20-37`), then groups BIO
tags into chunk spans/masks (`utils/GetChunk_v4_vcr.py:104-146` — ported
as `icka_tpu.data.chunking.chunk_mask_v4`).

This module is the TPU-native equivalent of that model: the shared
`TextEncoder` stack in its legacy-BERT dialect with per-layer Pfeiffer
bottleneck adapters (`EncoderConfig.adapter_size`, see
`nn.attention.FeedForward`), plus a linear tagging head. Weights convert
from a local torch `BertModelWithHeads` state dict via
`chunker_params_from_torch` (zero-egress: no hub download, same policy as
the rest of `models/convert.py`).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from icka_tpu.core.config import EncoderConfig
from icka_tpu.models.convert import encoder_params_from_torch, _np
from icka_tpu.nn.bert import TextEncoder

# `utils/GetChunk_v4_vcr.py:40-43` — model.config.id2label of the
# CoNLL-2000 tagging head.
CONLL2000_LABELS = ("O",) + tuple(
    f"{bi}-{tag}" for tag in
    ("ADJP", "ADVP", "CONJP", "INTJ", "LST", "NP", "PP", "PRT", "SBAR",
     "UCP", "VP")
    for bi in ("B", "I"))
CONLL2000_ID2LABEL = dict(enumerate(CONLL2000_LABELS))


def chunker_config(vocab_size: int = 30522) -> EncoderConfig:
    """bert-base-uncased + Pfeiffer adapter (reduction_factor 16 ⇒ 768/16
    = 48). The reference resizes embeddings for 45 `<|det%d|>` special
    tokens (`GetChunk_v4_vcr.py:33-35`); pass the resized vocab if the
    checkpoint has them."""
    return EncoderConfig(
        vocab_size=vocab_size, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, type_vocab_size=2,
        layer_norm_eps=1e-12, position_offset=0, pad_token_id=0,
        adapter_size=48)


class ChunkTagger(nn.Module):
    """BERT + adapters + token tagging head → (B, S, 23) logits.

    Equivalent surface to `model(input_ids, attention_mask).logits`
    (`utils/GetChunk_v4_vcr.py:95`)."""

    cfg: EncoderConfig
    num_labels: int = len(CONLL2000_LABELS)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        x, _ = TextEncoder(self.cfg, with_pooler=False, dtype=self.dtype,
                           name="bert")(
            input_ids, attention_mask=attention_mask,
            deterministic=deterministic)
        x = nn.Dropout(self.cfg.hidden_dropout_prob)(
            x, deterministic=deterministic)
        return nn.Dense(self.num_labels, dtype=self.dtype, name="head")(x)


def chunker_params_from_torch(sd: dict, num_layers: int = 12) -> dict:
    """Convert a torch `BertModelWithHeads` state dict (base BERT +
    Pfeiffer output adapters + one tagging head) to `ChunkTagger` params.

    Key layout handled (adapter-transformers):
      bert.encoder.layer.{i}.output.adapters.{name}.adapter_down.0.{weight,bias}
      bert.encoder.layer.{i}.output.adapters.{name}.adapter_up.{weight,bias}
      heads.{name}.{k}.{weight,bias}            (Sequential: dropout, linear)
    """
    sd = {k: _np(v) for k, v in sd.items()}
    params = encoder_params_from_torch(sd, num_layers, prefix="bert.")
    for i in range(num_layers):
        down_w = down_b = up_w = up_b = None
        pat = re.compile(
            rf"(?:bert\.)?encoder\.layer\.{i}\.output\.adapters\.[^.]+\."
            r"(adapter_down(?:\.0)?|adapter_up)\.(weight|bias)$")
        for k, v in sd.items():
            m = pat.search(k)
            if not m:
                continue
            which, kind = m.group(1), m.group(2)
            if which.startswith("adapter_down"):
                if kind == "weight":
                    down_w = v
                else:
                    down_b = v
            else:
                if kind == "weight":
                    up_w = v
                else:
                    up_b = v
        if down_w is None or up_w is None:
            raise KeyError(f"no adapter weights found for layer {i}")
        params["encoder"][f"layer_{i}"]["ffn"]["adapter_down"] = {
            "kernel": down_w.T, "bias": down_b}
        params["encoder"][f"layer_{i}"]["ffn"]["adapter_up"] = {
            "kernel": up_w.T, "bias": up_b}
    head = None
    for k, v in sd.items():
        if k.startswith("heads.") and k.endswith(".weight") and v.ndim == 2:
            head = {"kernel": v.T, "bias": sd[k[:-len("weight")] + "bias"]}
    if head is None:
        raise KeyError("no tagging head found under heads.*")
    return {"bert": params, "head": head}


class ModelChunker:
    """Pluggable trained chunker: token ids → BIO labels → chunk spans.

    Drop-in counterpart to `data.chunking.heuristic_chunks` for callers
    that have a converted checkpoint. Sequences are padded to length
    buckets (multiples of `bucket`) so XLA compiles a handful of programs,
    mirroring the serving engines' static-shape policy.
    """

    def __init__(self, params, cfg: EncoderConfig | None = None,
                 bucket: int = 32):
        self.cfg = cfg or chunker_config()
        self.params = params
        self.bucket = bucket
        model = ChunkTagger(self.cfg)
        self._apply = jax.jit(
            lambda p, ids, mask: jnp.argmax(
                model.apply({"params": p}, ids, attention_mask=mask), -1))

    def tag(self, input_ids_batch) -> list:
        """List of id sequences (incl. CLS/SEP) → list of BIO label lists
        for the interior positions (1..len-2), as in
        `utils/GetChunk_v4_vcr.py:104-118`."""
        lens = [len(ids) for ids in input_ids_batch]
        S = max(self.bucket, -(-max(lens) // self.bucket) * self.bucket)
        ids = np.zeros((len(lens), S), np.int32)
        mask = np.zeros((len(lens), S), np.int32)
        for r, seq in enumerate(input_ids_batch):
            ids[r, :len(seq)] = seq
            mask[r, :len(seq)] = 1
        classes = np.asarray(self._apply(self.params, ids, mask))
        return [[CONLL2000_ID2LABEL[int(c)] for c in row[1:n - 1]]
                for row, n in zip(classes, lens)]

    def __call__(self, input_ids) -> list:
        """One sequence → chunk spans ([start, end) over interior tokens),
        same contract as `heuristic_chunks`."""
        from icka_tpu.data.chunking import bio_spans

        return bio_spans(self.tag([input_ids])[0])
