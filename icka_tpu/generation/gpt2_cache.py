"""KV-cached incremental decoding for the GPT-2 decoder stack.

Counterpart of `icka_tpu.generation.kv_cache` (Oscar captioner) for
`icka_tpu.models.gpt2.GPT2Decoder` — the decoder behind the ChunkAlign
rationale family (`modeling_vcr_chunkalign_v10.py:1322-2827`). The reference
re-encodes the whole buffer every generation step (its `beam_sample` passes
the full `input_ids` each iteration, :2255-2258); here decode is O(L) per
step:

  - cross-attention K/V over the (fixed) encoder memory are precomputed
    once per layer;
  - causal self-attention K/V live in preallocated (B, max_len, N, Hd)
    buffers updated with `dynamic_update_slice` — static shapes, so beam
    search re-gathers hypotheses by batch indexing for free;
  - each step embeds ONE token and runs every pre-LN block on a (B, 1, D)
    query.

Operates directly on `GPT2Decoder` parameter pytrees: the same params serve
training (full teacher-forced pass) and cached decode, and equality of the
two paths is pinned by `tests/test_gpt2_cache.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icka_tpu.models.gpt2 import GPT2Config


def _dense(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layernorm(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _split(x, n_heads):
    B, S, D = x.shape
    return x.reshape(B, S, n_heads, D // n_heads)


def precompute_gpt2_cache(dec_params: dict, cfg: GPT2Config, memory,
                          memory_mask, max_len: int) -> dict:
    """Per-layer cross-attention K/V over the encoder memory + empty causal
    self-attention buffers. All leaves are batch-leading."""
    N = cfg.n_head
    B, Lm, _ = memory.shape
    Hd = cfg.n_embd // N
    mem = memory.astype(jnp.float32)
    layers = []
    for i in range(cfg.n_layer):
        lp = dec_params[f"h_{i}"]
        entry = {
            "k": jnp.zeros((B, max_len, N, Hd), jnp.float32),
            "v": jnp.zeros((B, max_len, N, Hd), jnp.float32),
        }
        if "k_cross" in lp:
            entry["mem_k"] = _split(_dense(lp["k_cross"], mem), N)
            entry["mem_v"] = _split(_dense(lp["v_cross"], mem), N)
        layers.append(entry)
    mem_bias = ((1.0 - memory_mask.astype(jnp.float32))
                * -10000.0)[:, None, None, :]
    return {"layers": layers, "mem_bias": mem_bias}


def cached_gpt2_step(dec_params: dict, cfg: GPT2Config, lm_kernel,
                     token_t, t, cache):
    """One incremental decode step: (B,) token ids at position t →
    ((B, vocab) logits, updated cache). `lm_kernel` is the untied LM head
    (D, V) matrix; pass the transposed `wte` for tied heads."""
    N = cfg.n_head
    eps = cfg.layer_norm_eps
    B = token_t.shape[0]
    max_len = cache["layers"][0]["k"].shape[1]

    x = (jnp.take(dec_params["wte"], token_t, axis=0)
         + dec_params["wpe"][t])[:, None, :].astype(jnp.float32)  # (B,1,D)

    pos = jnp.arange(max_len)
    causal_bias = jnp.where(pos <= t, 0.0, -10000.0)[None, None, None, :]

    new_layers = []
    for i in range(cfg.n_layer):
        lp = dec_params[f"h_{i}"]
        lc = cache["layers"][i]
        h = _layernorm(lp["ln_1"], x, eps)
        qkv = _dense(lp["c_attn"], h)
        q, k_t, v_t = jnp.split(qkv, 3, axis=-1)
        q = _split(q, N)
        k = jax.lax.dynamic_update_slice(lc["k"], _split(k_t, N),
                                         (0, t, 0, 0))
        v = jax.lax.dynamic_update_slice(lc["v"], _split(v_t, N),
                                         (0, t, 0, 0))
        entry = {"k": k, "v": v}
        scores = jnp.einsum("bqnh,bknh->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (q.shape[-1] ** -0.5) + causal_bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bnqk,bknh->bqnh", probs, v).reshape(B, 1, -1)
        x = x + _dense(lp["c_proj"], ctx)

        if "mem_k" in lc:
            entry["mem_k"], entry["mem_v"] = lc["mem_k"], lc["mem_v"]
            h = _layernorm(lp["ln_cross"], x, eps)
            q = _split(_dense(lp["q_cross"], h), N)
            scores = jnp.einsum("bqnh,bknh->bnqk", q, lc["mem_k"],
                                preferred_element_type=jnp.float32)
            scores = (scores * (q.shape[-1] ** -0.5)
                      + cache["mem_bias"][:, :, :1, :])
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bnqk,bknh->bqnh", probs,
                             lc["mem_v"]).reshape(B, 1, -1)
            x = x + _dense(lp["cross_proj"], ctx)
        new_layers.append(entry)

        h = _layernorm(lp["ln_2"], x, eps)
        h = jax.nn.gelu(_dense(lp["c_fc"], h), approximate=True)
        x = x + _dense(lp["mlp_proj"], h)

    x = _layernorm(dec_params["ln_f"], x, eps)
    logits = x[:, 0].astype(jnp.float32) @ lm_kernel.astype(jnp.float32)
    return logits, {"layers": new_layers, "mem_bias": cache["mem_bias"]}
