"""Pallas TPU kernel: fused multi-head attention for short sequences.

The ICKA fusion stack runs attention over short sequences — 128 text
tokens × 49 image regions (txt2img, `Cross_Modal_Interaction_Module.py:968`),
≤192 prompt tokens self-attention — where the whole per-batch working set
(Q, K, V, scores) fits comfortably in VMEM. This kernel computes

    out[b] = softmax(Q[b] Kᵀ[b] · scale + bias[b]) V[b]

for all heads of one batch element per grid step, entirely in VMEM: HBM
traffic is exactly Q+K+V in and O out, with no materialized (B, N, Sq, Sk)
score tensor in HBM (XLA usually fuses this too; the kernel guarantees it
and removes layout round-trips between the head reshape and the two
matmuls).

Layout: Q (B, Sq, D), K/V (B, Sk, D) with D = num_heads · head_dim; the
head loop is a static Python loop over VMEM column slices, each feeding the
MXU with a (Sq, head_dim) × (head_dim, Sk) matmul. Sequence dims should be
padded to lane multiples by the caller (pad K/V rows are masked via bias).

fp32 softmax; inputs may be bf16. Falls back to interpret mode off-TPU so
the same code path is unit-testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads: int,
                 scale: float):
    D = q_ref.shape[-1]
    head_dim = D // num_heads
    q = q_ref[0]                      # (Sq, D)
    k = k_ref[0]                      # (Sk, D)
    v = v_ref[0]
    bias = bias_ref[0]                # (Sq, Sk) fp32, already broadcast
    # fp32 inputs mean fp32 math (parity path); bf16 rides the MXU default
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec) * scale
        scores = scores + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def _normalize_bias(bias, B, Sq, Sk):
    """Accepts the additive-mask conventions used in the model: (B,1,1,Sk)
    from `additive_mask`, (B,Sk) key masks, or full (B,Sq,Sk). Per-head
    biases are not supported (the ICKA stack only masks keys)."""
    bias = jnp.asarray(bias, jnp.float32)
    if bias.ndim == 4:
        bias = bias[:, 0]
    if bias.ndim == 2:
        bias = bias[:, None, :]
    return jnp.broadcast_to(bias, (B, Sq, Sk))


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_attention(q, k, v, bias, num_heads: int, interpret: bool = False):
    """q (B, Sq, D), k/v (B, Sk, D), bias broadcastable to (B, Sq, Sk)
    additive fp32. Returns (B, Sq, D) in q.dtype."""
    B, Sq, D = q.shape
    Sk = k.shape[1]
    head_dim = D // num_heads
    scale = head_dim ** -0.5
    bias = _normalize_bias(bias, B, Sq, Sk)

    kernel = functools.partial(_attn_kernel, num_heads=num_heads,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Sq, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sq, Sk), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Sq, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sq, D), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def attention_reference(q, k, v, bias, num_heads: int):
    """XLA einsum reference with identical semantics (for tests and as the
    non-TPU fallback)."""
    B, Sq, D = q.shape
    Sk = k.shape[1]
    head_dim = D // num_heads
    qh = q.reshape(B, Sq, num_heads, head_dim)
    kh = k.reshape(B, -1, num_heads, head_dim)
    vh = v.reshape(B, -1, num_heads, head_dim)
    scores = jnp.einsum("bqnh,bknh->bnqk", qh, kh,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    scores = scores * (head_dim ** -0.5)
    scores = scores + _normalize_bias(bias, B, Sq, Sk)[:, None]
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bnqk,bknh->bqnh", p, vh,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(B, Sq, D).astype(q.dtype)
