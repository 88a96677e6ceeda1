"""Typed configuration system.

Replaces the reference's argparse monolith (`My_cross_attention.py:475-622`,
~30 flags) and its ad-hoc `model_config.json` round-trip (:928-934, :949-954)
with dataclasses that serialize to/from JSON. Hyperparameter defaults mirror
the reference run configuration documented in BASELINE.md.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


def _from_dict(cls, d: dict) -> Any:
    names = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in names:
            continue
        t = names[k].type
        if isinstance(v, dict) and t not in ("dict", dict):
            sub = _NESTED.get((cls.__name__, k))
            kwargs[k] = _from_dict(sub, v) if sub else v
        else:
            kwargs[k] = v
    return cls(**kwargs)


@dataclass(frozen=True)
class EncoderConfig:
    """Transformer encoder hyperparameters.

    Covers both the legacy-BERT stack (`Cross_Modal_Interaction_Module.py:45-105`
    BertConfig) and HF-style RoBERTa configs loaded by the driver
    (`My_cross_attention.py:662,671`).
    """

    vocab_size: int = 50265
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 514
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-5
    # RoBERTa reserves position ids 0/1 for padding; BERT uses 0-based
    # positions. `position_offset` = pad_token_id + 1 for RoBERTa (=2), 0 for
    # BERT-style encoders.
    position_offset: int = 2
    pad_token_id: int = 1
    # route deterministic attention through the fused Pallas TPU kernel
    # (`icka_tpu.kernels.attention`) instead of the XLA einsum core.
    # Default set by measurement — see DESIGN.md "Attention and kernels".
    use_pallas: bool = False
    # "int8" = W8A8 serving quantization of the six projection matmuls per
    # layer (q/k/v/o + ffn wi/wo) — 2x MXU peak on v5e; see nn.layers.Dense
    quant: str = "none"
    # rematerialize transformer layers in the backward pass
    # (jax.checkpoint): peak activation memory drops from O(layers ·
    # seq · intermediates) to O(layers · seq · hidden) for ~1.3x forward
    # FLOPs — required to fit flagship training batches in 16 GB HBM.
    remat: bool = False
    # remat_policy selects WHAT is rematerialized when remat=True:
    #   "full"      — whole layer, save only layer inputs (max memory
    #                 savings, full recompute cost)
    #   "alternate" — remat every other layer (half the recompute for
    #                 ~half the memory savings)
    #   "dots"      — jax.checkpoint_policies.checkpoint_dots: matmul
    #                 outputs are saved, only elementwise work (gelu,
    #                 LayerNorm, softmax scaling) is recomputed
    #   "dots_nb"   — like "dots" but batched matmul outputs (the
    #                 (B,N,S,S) attention scores/contexts) are NOT saved
    #                 — the memory knee between "dots" and "full"
    # r03 sweep on chip (flagship train step, batch 16): dots 76.4
    # pairs/s > alternate 71.5 > full 69.5 — dots is the default; "full"
    # remains the fallback when a batch does not fit HBM under dots.
    remat_policy: str = "dots"
    # serve-time layout: one fused (H, 3H) QKV projection per
    # self-attention instead of three (H, H) matmuls — the input is read
    # and (when quantized) round/clip'd ONCE instead of three times, and
    # the wider N dim tiles the MXU better. Checkpoints convert with
    # `icka_tpu.models.convert.fuse_qkv_params`. Self-attention only;
    # cross-attention keeps separate Q vs K/V streams.
    fuse_qkv: bool = False
    # softmax accumulation dtype for attention probabilities. "float32"
    # (default) is the parity dtype; "bfloat16" halves the HBM traffic of
    # the (B, N, Sq, Sk) score/prob tensors — a serving-mode knob covered
    # by the int8 accuracy-contract tests.
    softmax_dtype: str = "float32"
    # >0 inserts a Pfeiffer bottleneck adapter in every layer's FFN output
    # sublayer (see nn.attention.FeedForward) — used by the CoNLL-2000
    # chunk tagger (`models/chunker.py`, reference utils/GetChunk_v4_vcr.py
    # :20-23, bert-base + reduction_factor 16 ⇒ adapter_size 48).
    adapter_size: int = 0

    @classmethod
    def roberta_large(cls) -> "EncoderConfig":
        return cls()

    @classmethod
    def roberta_base(cls) -> "EncoderConfig":
        return cls(hidden_size=768, num_hidden_layers=12,
                   num_attention_heads=12, intermediate_size=3072)

    @classmethod
    def bert_base(cls) -> "EncoderConfig":
        return cls(vocab_size=30522, hidden_size=768, num_hidden_layers=12,
                   num_attention_heads=12, intermediate_size=3072,
                   max_position_embeddings=512, layer_norm_eps=1e-12,
                   position_offset=0, pad_token_id=0)

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "EncoderConfig":
        """Small config for unit tests."""
        return cls(vocab_size=vocab_size, hidden_size=32,
                   num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=64, max_position_embeddings=192)


@dataclass(frozen=True)
class ICKAConfig:
    """The flagship ICKA model (`Cross_Modal_Interaction_Module.py:887-1057`)
    plus its ablation family, expressed as flags over ONE model instead of the
    reference's 11 copy-pasted classes (:1061-2484).

    Ablation flags map to reference variants:
      - use_txt2img=False        → `_woCrossAtt_*` (:1237,:1412)
      - use_alignment=False      → `_woPart2_*` drop the CLIP knowledge-
                                   alignment branch (:1586,:1744,:1912)
      - use_vision_prompt=False / use_alignment_prompt=False
                                 → `_prompt_*` ablations (:2078,:2253)
      - use_gate=False           → `_gate_1` fixed blend (:2383)
    """

    embedding: EncoderConfig = field(default_factory=EncoderConfig.roberta_large)
    last_encoder: EncoderConfig = field(default_factory=EncoderConfig.roberta_large)
    num_labels: int = 15                 # len(label_list)+1, driver :641
    layer_num1: int = 5                  # txt2img fusion depth, :603
    layer_num2: int = 2
    layer_num3: int = 2
    num_regions: int = 49                # 7x7 ResNet grid
    region_dim: int = 2048
    clip_dim: int = 512
    prompt_len: int = 5                  # per-prompt prefix slots, :913
    prompt_hidden: int = 756             # mapping-network width, :916
    last_hidden: int = 1024              # last_encoder output width
    max_seq_length: int = 128
    # ablation flags (all True = full ICKA)
    use_txt2img: bool = True
    use_alignment: bool = True
    use_vision_prompt: bool = True
    use_alignment_prompt: bool = True
    use_gate: bool = True
    gate_fixed: float = 0.5              # blend used when use_gate=False
    # Serving-exactness knob: mask the BiLSTM so padding timesteps hold the
    # recurrent state (the backward scan then enters the valid region with
    # the same zero state at ANY padded length). With it, length-bucketed
    # decode is BIT-IDENTICAL to the 128-padded layout at valid positions
    # (tests/test_serving.py). Default False = reference parity: torch
    # nn.LSTM runs unmasked over the padded sequence
    # (`Cross_Modal_Interaction_Module.py:1042`), so its backward states
    # inside the valid region depend on the padding tail.
    masked_lstm: bool = False

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "ICKAConfig":
        enc = EncoderConfig.tiny(vocab_size)
        return cls(embedding=enc, last_encoder=enc, layer_num1=2,
                   num_regions=49, region_dim=64, clip_dim=32,
                   prompt_len=5, prompt_hidden=48, last_hidden=enc.hidden_size,
                   max_seq_length=32)


@dataclass(frozen=True)
class GateCLConfig:
    """The my_bert model family (`gate_cl_modeling.py` / `cl_modeling.py` /
    `ip_modeling.py`): single BERT encoder + txt2img fusion + gate + CRF, with
    optional contrastive knowledge alignment and relation-classifier gating.

    variant:
      - "ip":      plain concat fusion + CRF               (ip_modeling.py:1247)
      - "cl":      + InfoNCE contrastive, fixed alpha=0.88 (cl_modeling.py:1252)
      - "gate_cl": + relation classifier P-gate + alpha    (gate_cl_modeling.py:1248)
    """

    encoder: EncoderConfig = field(default_factory=EncoderConfig.bert_base)
    num_labels: int = 15
    layer_num1: int = 1
    num_regions: int = 49
    region_dim: int = 2048
    max_seq_length: int = 128
    variant: str = "gate_cl"
    alpha: float = 0.62                 # loss mix `lamb`, driver :494
    cl_alpha: float = 0.88             # cl_modeling fixed mix :1381
    temp: float = 0.179                # InfoNCE temperature, driver :483
    temp_lamb: float = 0.7             # directional mix, driver :487
    negative_rate: int = 16            # negative-pair swap count, driver :480
    # Serving-exactness knob for variant="gate_cl": zero the masked
    # positions of the relation-classifier input before its (L·2H) flatten
    # (`crs_classifier`, gate_cl_modeling.py:1258). The scalar relevance
    # gate P then sees identical features at any padded length, making
    # length-bucketed decode BIT-IDENTICAL to the 128-padded layout.
    # Default False = reference parity: the reference flattens
    # padding-position activations into the gate (a padding-artifact
    # quirk). "ip"/"cl" variants are exact either way.
    masked_crs: bool = False

    @classmethod
    def tiny(cls, vocab_size: int = 128, variant: str = "gate_cl") -> "GateCLConfig":
        return cls(encoder=EncoderConfig.tiny(vocab_size), layer_num1=1,
                   region_dim=64, max_seq_length=16, variant=variant)


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop hyperparameters (reference defaults, BASELINE.md)."""

    learning_rate: float = 3e-5
    weight_decay: float = 0.01
    warmup_proportion: float = 0.1
    num_train_epochs: int = 25
    train_batch_size: int = 1
    eval_batch_size: int = 1
    gradient_accumulation_steps: int = 5
    max_grad_norm: float = 1.0
    seed: int = 19260817
    fine_tune_cnn: bool = False
    # TPU-native knobs (no reference equivalent)
    compute_dtype: str = "bfloat16"
    data_axis: int = 1                  # mesh size along the data axis
    model_axis: int = 1                 # mesh size along the model (TP) axis
    # ZeRO-1: shard Adam moments over the data axis (params stay replicated;
    # XLA inserts the reduce-scatter/all-gather pair around the update)
    zero1: bool = False
    # dtype of the Adam first moment (mu); bf16 halves its HBM residency.
    # The second moment stays fp32 (sqrt(nu) precision gates the update).
    mu_dtype: str = "float32"


@dataclass(frozen=True)
class DataConfig:
    """Dataset locations and preprocessing, mirroring driver flags
    (`My_cross_attention.py:497-528,615-618`)."""

    data_dir: str = "data/twitter2015"
    path_image: str = "data/twitter2015_images"
    crop_size: int = 224
    max_seq_length: int = 128
    task_name: str = "twitter2015"


_NESTED = {
    ("ICKAConfig", "embedding"): EncoderConfig,
    ("ICKAConfig", "last_encoder"): EncoderConfig,
    ("GateCLConfig", "encoder"): EncoderConfig,
}


def to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def from_json(cls, text: str):
    return _from_dict(cls, json.loads(text))


def save_config(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        f.write(to_json(cfg))


def load_config(cls, path: str):
    with open(path) as f:
        return from_json(cls, f.read())
