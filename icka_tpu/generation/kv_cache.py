"""KV-cached incremental decoding for the captioning model.

The full-recompute decode path re-encodes the whole prefix every step
(O(L²) attention FLOPs per sequence). This module decodes incrementally:

  - the Oscar seq2seq mask (`icka_tpu/models/captioning.py::seq2seq_mask`)
    lets image rows attend ONLY over image rows, so the image part of every
    layer is caption-independent → its per-layer K/V are precomputed once;
  - caption K/V live in preallocated (B, max_len, N, Hd) buffers updated
    with `dynamic_update_slice` at each step — static shapes throughout;
  - each decode step embeds ONE token, runs every layer on a (B, 1, D)
    query and attends over [caption cache ≤ t ; image K/V].

Operates directly on `CaptionModel` parameter pytrees (the same params
serve training, full-recompute decode and cached decode), and plugs into
`icka_tpu.generation.decoding` as a StepFn whose cache pytree carries the
per-layer buffers — beam search re-gathers them per hypothesis for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from icka_tpu.models.captioning import CaptionConfig
from icka_tpu.generation.decoding import beam_search, greedy_decode
from icka_tpu.nn.layers import gelu


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _layernorm(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _split(x, n_heads):
    B, S, D = x.shape
    return x.reshape(B, S, n_heads, D // n_heads)


# The cache pytree is a dict of per-layer entries whose leaves are ALL
# batch-leading — beam search re-gathers hypotheses by indexing axis 0.
#   {"layers": [{"cap_k": (B, max_len, N, Hd), "cap_v": ..., "img_k":
#     (B, Li, N, Hd), "img_v": ...} per layer], "img_bias": (B, 1, 1, Li)}


def precompute_image_cache(params, cfg: CaptionConfig, img_feats, img_mask,
                           max_len: int) -> dict:
    """Run the image-only forward once, recording per-layer K/V."""
    enc = cfg.encoder
    p = params["params"]
    N = enc.num_attention_heads
    eps = enc.layer_norm_eps
    B, Li, _ = img_feats.shape
    Hd = enc.hidden_size // N

    x = _dense(p["img_embedding"], img_feats.astype(jnp.float32))
    bias = ((1.0 - img_mask.astype(jnp.float32))
            * -10000.0)[:, None, None, :]

    layers = []
    for i in range(enc.num_hidden_layers):
        lp = p["encoder"][f"layer_{i}"]
        k = _split(_dense(lp["attn"]["key"], x), N)
        v = _split(_dense(lp["attn"]["value"], x), N)
        layers.append({
            "img_k": k, "img_v": v,
            "cap_k": jnp.zeros((B, max_len, N, Hd), jnp.float32),
            "cap_v": jnp.zeros((B, max_len, N, Hd), jnp.float32),
        })
        q = _split(_dense(lp["attn"]["query"], x), N)
        scores = jnp.einsum("bqnh,bknh->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (q.shape[-1] ** -0.5) + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bnqk,bknh->bqnh", probs, v)
        ctx = ctx.reshape(B, Li, -1)
        a = _dense(lp["attn_out"]["dense"], ctx)
        x = _layernorm(lp["attn_out"]["norm"], a + x, eps)
        h = gelu(_dense(lp["ffn"]["wi"], x))
        h = _dense(lp["ffn"]["wo"], h)
        x = _layernorm(lp["ffn"]["norm"], h + x, eps)

    return {"layers": layers, "img_bias": bias}


def cached_caption_step(params, cfg: CaptionConfig, token_t, t, cache):
    """One incremental decode step: (B,) token ids at position t →
    ((B, vocab) logits, updated cache)."""
    enc = cfg.encoder
    p = params["params"]
    emb = p["embeddings"]
    N = enc.num_attention_heads
    eps = enc.layer_norm_eps
    B = token_t.shape[0]
    max_len = cache["layers"][0]["cap_k"].shape[1]
    Li = cache["layers"][0]["img_k"].shape[1]

    x = (jnp.take(emb["word_embeddings"], token_t, axis=0)
         + emb["position_embeddings"][t]
         + emb["token_type_embeddings"][0])[:, None, :]      # (B, 1, D)
    x = _layernorm(emb["norm"], x, eps)

    # causal mask over the caption cache: positions ≤ t visible
    pos = jnp.arange(max_len)
    cap_bias = jnp.where(pos <= t, 0.0, -10000.0)[None, None, None, :]
    bias = jnp.concatenate(
        [jnp.broadcast_to(cap_bias, (B, 1, 1, max_len)),
         jnp.broadcast_to(cache["img_bias"], (B, 1, 1, Li))], axis=-1)

    new_layers = []
    for i in range(enc.num_hidden_layers):
        lp = p["encoder"][f"layer_{i}"]
        layer_cache = cache["layers"][i]
        q = _split(_dense(lp["attn"]["query"], x), N)         # (B,1,N,Hd)
        k_t = _split(_dense(lp["attn"]["key"], x), N)
        v_t = _split(_dense(lp["attn"]["value"], x), N)
        cap_k = jax.lax.dynamic_update_slice(
            layer_cache["cap_k"], k_t, (0, t, 0, 0))
        cap_v = jax.lax.dynamic_update_slice(
            layer_cache["cap_v"], v_t, (0, t, 0, 0))
        new_layers.append({"cap_k": cap_k, "cap_v": cap_v,
                           "img_k": layer_cache["img_k"],
                           "img_v": layer_cache["img_v"]})

        k_all = jnp.concatenate([cap_k, layer_cache["img_k"]], axis=1)
        v_all = jnp.concatenate([cap_v, layer_cache["img_v"]], axis=1)
        scores = jnp.einsum("bqnh,bknh->bnqk", q, k_all,
                            preferred_element_type=jnp.float32)
        scores = scores * (q.shape[-1] ** -0.5) + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bnqk,bknh->bqnh", probs, v_all).reshape(B, 1, -1)
        a = _dense(lp["attn_out"]["dense"], ctx)
        x = _layernorm(lp["attn_out"]["norm"], a + x, eps)
        h = gelu(_dense(lp["ffn"]["wi"], x))
        h = _dense(lp["ffn"]["wo"], h)
        x = _layernorm(lp["ffn"]["norm"], h + x, eps)

    # LM head (tied)
    h = _layernorm(p["lm_norm"], gelu(_dense(p["lm_transform"], x)), eps)
    logits = jnp.einsum("bd,vd->bv", h[:, 0].astype(jnp.float32),
                        emb["word_embeddings"].astype(jnp.float32))
    logits = logits + p["lm_bias"]
    return logits, {"layers": new_layers, "img_bias": cache["img_bias"]}


def generate_captions_cached(model, params, bos_id: int, eos_id: int,
                             img_feats, img_mask, max_len: int,
                             mode: str = "greedy", num_beams: int = 3,
                             **kw):
    """KV-cached counterpart of `generate_captions` — identical outputs,
    O(L) attention work per step instead of O(L²) re-encoding."""
    cfg = model.cfg
    B = img_feats.shape[0]
    cache = precompute_image_cache(params, cfg, jnp.asarray(img_feats),
                                   jnp.asarray(img_mask), max_len)

    def step(tokens_t, cache, t):
        return cached_caption_step(params, cfg, tokens_t, t, cache)

    init = jnp.full((B,), bos_id, jnp.int32)
    if mode == "greedy":
        return greedy_decode(step, init, cache, max_len, eos_id, **kw)
    if mode == "beam":
        return beam_search(step, init, cache, max_len, eos_id,
                           num_beams=num_beams, **kw)
    raise ValueError(f"unknown mode {mode!r}")
