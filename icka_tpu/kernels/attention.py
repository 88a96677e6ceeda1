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


# ---------------------------------------------------------------------------
# Blockwise (flash-style) attention — length-scalable variant
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref,
                  acc_ref, *, num_heads: int, scale: float, nk: int):
    """One (batch, q-block, k-block) grid step of online-softmax attention.

    Running per-head max (m) and denominator (l) live in VMEM scratch as
    (num_heads, bq, 128) lane-broadcast columns; the fp32 output
    accumulator is (bq, D). k is the innermost grid dim, so scratch
    carries the running stats across k blocks and the output is finalized
    (acc / l) on the last k block — the standard flash recurrence:

        m' = max(m, max_k s);  p = exp(s - m');  a = exp(m - m')
        l' = a·l + Σ_k p;      acc' = a·acc + p·V
    """
    D = q_ref.shape[-1]
    hd = D // num_heads
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                       # (bq, D)
    k = k_ref[0]                       # (bk, D)
    v = v_ref[0]
    bias = bias_ref[0]                 # (1, bk) key mode / (bq, bk) full
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec) * scale
        s = s + bias
        m_prev = m_ref[h][:, :1]                      # (bq, 1)
        l_prev = l_ref[h][:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[h] = jnp.broadcast_to(m_new, m_ref[h].shape)
        l_ref[h] = jnp.broadcast_to(l_new, l_ref[h].shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + pv

    @pl.when(ki == nk - 1)
    def _fin():
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            o_ref[0, :, sl] = (acc_ref[:, sl]
                               / l_ref[h][:, :1]).astype(o_ref.dtype)


def _pick_block(total: int, want: int, lane: int = 1) -> int:
    """Largest divisor of `total` that is <= want AND a multiple of `lane`
    (the Mosaic tiling rule: a block's trailing dims must be divisible by
    (8, 128) or equal the full array dims). Falls back to `total`."""
    b = min(want, total)
    while b > 0:
        if total % b == 0 and b % lane == 0:
            return b
        b -= 1
    return total


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q",
                                             "block_k", "interpret"))
def fused_attention_blockwise(q, k, v, bias, num_heads: int,
                              block_q: int = 128, block_k: int = 128,
                              interpret: bool = False):
    """Blockwise (flash-style) fused attention: K/V are tiled along the
    sequence dim with an online-softmax recurrence, so VMEM holds one
    (block_q, block_k) score tile instead of the whole (Sq, Sk) matrix —
    length-scalable where `fused_attention` is whole-sequence-in-VMEM
    (SURVEY §5: "the fusion kernels should still be written blockwise …
    so they're length-scalable").

    Same contract as `fused_attention`: q (B, Sq, D), k/v (B, Sk, D),
    bias broadcastable to (B, Sq, Sk) additive fp32. A key-only bias
    ((B, 1, 1, Sk) from `additive_mask`, or (B, Sk)) is kept un-broadcast
    and blocked along k — O(B·Sk) HBM, no quadratic score tensor
    anywhere. Block sizes snap to divisors of the sequence dims.
    """
    B, Sq, D = q.shape
    Sk = k.shape[1]
    head_dim = D // num_heads
    scale = head_dim ** -0.5

    bias = jnp.asarray(bias, jnp.float32)
    key_mode = (bias.ndim == 4 and bias.shape[1] == 1
                and bias.shape[2] == 1) or bias.ndim == 2
    if key_mode:
        kb = bias.reshape(bias.shape[0], Sk)
        kb = jnp.broadcast_to(kb, (B, Sk))[:, None, :]     # (B, 1, Sk)
    else:
        kb = _normalize_bias(bias, B, Sq, Sk)              # (B, Sq, Sk)

    # Mosaic block rule: the k block feeds both the (bq, bk) score lanes
    # and the (1, 1|bq, bk) bias block's lane dim -> multiple of 128 (or
    # the whole dim); the q block is a sublane dim -> multiple of 8.
    bq = _pick_block(Sq, block_q, lane=8)
    bk = _pick_block(Sk, block_k, lane=128)
    nq, nk = Sq // bq, Sk // bk

    kernel = functools.partial(_flash_kernel, num_heads=num_heads,
                               scale=scale, nk=nk)
    bias_spec = (pl.BlockSpec((1, 1, bk), lambda b, qi, ki: (b, 0, ki),
                              memory_space=pltpu.VMEM)
                 if key_mode else
                 pl.BlockSpec((1, bq, bk), lambda b, qi, ki: (b, qi, ki),
                              memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(B, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((num_heads, bq, 128), jnp.float32),
            pltpu.VMEM((num_heads, bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, kb)
