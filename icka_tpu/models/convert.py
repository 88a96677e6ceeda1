"""Checkpoint converters: PyTorch state dicts → icka_tpu param pytrees.

One converter per checkpoint dialect the reference consumes (SURVEY.md §7
"Weight import"):

  - HF BERT/RoBERTa `pytorch_model.bin` (and the legacy gamma/beta renames
    the reference applies in `Cross_Modal_Interaction_Module.py:256-268`)
  - torch `nn.LSTM` flat weights (`Cross_Modal_Interaction_Module.py:905`)
  - torchvision ResNet-152 `.pth` (`My_cross_attention.py:762-763`)

Inputs are plain dicts of numpy arrays (call `.numpy()` on torch tensors or
pass a torch state_dict directly — tensors are converted). No torch
dependency at import time.
"""

from __future__ import annotations

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _normalize_keys(sd: dict) -> dict:
    """Strip a leading model prefix and apply legacy gamma/beta renames."""
    out = {}
    for k, v in sd.items():
        k = k.replace("gamma", "weight").replace("beta", "bias")
        out[k] = _np(v)
    return out


def _linear(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def encoder_params_from_torch(sd: dict, num_layers: int,
                              prefix: str = "") -> dict:
    """Convert an HF BERT/RoBERTa-style state dict to `TextEncoder` params.

    `prefix` strips e.g. "bert." / "roberta." from key names.
    """
    sd = _normalize_keys(sd)
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}

    emb = {
        "word_embeddings": sd["embeddings.word_embeddings.weight"],
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "norm": _layernorm(sd, "embeddings.LayerNorm"),
    }
    encoder = {}
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        encoder[f"layer_{i}"] = {
            "attn": {
                "query": _linear(sd, f"{p}.attention.self.query"),
                "key": _linear(sd, f"{p}.attention.self.key"),
                "value": _linear(sd, f"{p}.attention.self.value"),
            },
            "attn_out": {
                "dense": _linear(sd, f"{p}.attention.output.dense"),
                "norm": _layernorm(sd, f"{p}.attention.output.LayerNorm"),
            },
            "ffn": {
                "wi": _linear(sd, f"{p}.intermediate.dense"),
                "wo": _linear(sd, f"{p}.output.dense"),
                "norm": _layernorm(sd, f"{p}.output.LayerNorm"),
            },
        }
    params = {"embeddings": emb, "encoder": encoder}
    if "pooler.dense.weight" in sd:
        params["pooler"] = {"dense": _linear(sd, "pooler.dense")}
    return params


def cross_encoder_params_from_torch(sd: dict, num_layers: int,
                                    prefix: str = "") -> dict:
    """Convert a reference `BertCrossEncoder` state dict
    (layer.N.attention.self.{query,key,value} / attention.output /
    intermediate / output) to `CrossEncoder` params."""
    sd = _normalize_keys(sd)
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    out = {}
    for i in range(num_layers):
        p = f"layer.{i}"
        out[f"layer_{i}"] = {
            "attn": {
                "query": _linear(sd, f"{p}.attention.self.query"),
                "key": _linear(sd, f"{p}.attention.self.key"),
                "value": _linear(sd, f"{p}.attention.self.value"),
            },
            "attn_out": {
                "dense": _linear(sd, f"{p}.attention.output.dense"),
                "norm": _layernorm(sd, f"{p}.attention.output.LayerNorm"),
            },
            "ffn": {
                "wi": _linear(sd, f"{p}.intermediate.dense"),
                "wo": _linear(sd, f"{p}.output.dense"),
                "norm": _layernorm(sd, f"{p}.output.LayerNorm"),
            },
        }
    return out


def lstm_params_from_torch(sd: dict, prefix: str = "") -> dict:
    """torch nn.LSTM(bidirectional=True, batch_first=True) → `BiLSTM`."""
    sd = {k[len(prefix):] if prefix and k.startswith(prefix) else k: _np(v)
          for k, v in sd.items()}
    return {
        "w_ih_fwd": sd["weight_ih_l0"],
        "w_hh_fwd": sd["weight_hh_l0"],
        "b_ih_fwd": sd["bias_ih_l0"],
        "b_hh_fwd": sd["bias_hh_l0"],
        "w_ih_bwd": sd["weight_ih_l0_reverse"],
        "w_hh_bwd": sd["weight_hh_l0_reverse"],
        "b_ih_bwd": sd["bias_ih_l0_reverse"],
        "b_hh_bwd": sd["bias_hh_l0_reverse"],
    }


def crf_params_from_torch(sd: dict, prefix: str = "") -> dict:
    """torchcrf CRF state dict → `CRF` params."""
    sd = {k[len(prefix):] if prefix and k.startswith(prefix) else k: _np(v)
          for k, v in sd.items()}
    return {
        "start_transitions": sd["start_transitions"],
        "end_transitions": sd["end_transitions"],
        "transitions": sd["transitions"],
    }


def quantize_params_like(target: dict, fp32: dict) -> dict:
    """Convert a trained fp32 param tree into the W8A8 serving layout.

    `target` is the param tree of a model built with
    `EncoderConfig(quant="int8")` (its Dense layers declare
    kernel_q/kernel_scale instead of kernel); `fp32` is the matching tree
    from the quant="none" model. Wherever `target` expects kernel_q, the
    fp32 kernel is quantized per-output-channel (abs-max / 127); all other
    leaves are copied from `fp32` unchanged.
    """
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if k == "kernel_q":
                w = np.asarray(fp32["kernel"], np.float32)
                scale = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
                out["kernel_q"] = np.clip(
                    np.round(w / scale[None, :]), -127, 127).astype(np.int8)
                out["kernel_scale"] = scale.astype(np.float32)
            elif k == "kernel_scale":
                continue  # produced together with kernel_q
            else:
                out[k] = quantize_params_like(v, fp32[k])
        return out
    return fp32
