"""Pallas TPU kernel: fused int8 3×3 stride-1 convolution.

The XLA im2col path (`models/resnet.py::ConvBN`) materializes a
(B, H, W, 9C) patch tensor in HBM per 3×3 conv and runs the quantize /
scale / bias / relu epilogues as separate fusions between dots — at
ResNet-152's l1/l2 shapes the stages measure 15-32% MXU with the time
going to patch traffic and inter-conv epilogue passes
(tools/profile_resnet.py, r04 corrected timings).

This kernel keeps one image's activation block in VMEM and:

  - accumulates the 9 kernel taps as 9 MXU int8 dots over shifted VMEM
    views (no HBM patch tensor ever exists);
  - applies the whole epilogue in-register: int32 → fp32 × per-channel
    scale + bias → optional residual add → optional ReLU → bf16 out, or
    requantized int8 out (`out_scale`) for int8-resident chains.

HBM traffic per conv is exactly x in + y out. Grid is (B,); per-image
working sets at ResNet shapes are ≤2 MB (l1: 58²·64 int8 + 56²·64 int32
accumulator), far under the 16 MB VMEM budget.

Interpret mode makes the same code path unit-testable on CPU
(tests/test_pallas_conv.py asserts bit-equality with the XLA im2col path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3_kernel(x_ref, w_ref, scale_ref, bias_ref, res_ref, o_ref, *,
                  H: int, W: int, C: int, F: int, relu: bool,
                  out_scale: float | None, has_residual: bool):
    x = x_ref[0]                                   # (H+2, W+2, C) int8
    acc = None
    for i in range(3):
        for j in range(3):
            v = x[i:i + H, j:j + W, :]             # (H, W, C)
            w_tap = w_ref[(i * 3 + j) * C:(i * 3 + j + 1) * C, :]
            y = jax.lax.dot_general(
                v, w_tap, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = y if acc is None else acc + y
    out = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if has_residual:
        out = out + res_ref[0].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    if out_scale is not None:
        q = jnp.clip(jnp.round(out * (1.0 / out_scale)), -127, 127)
        o_ref[0] = q.astype(jnp.int8)
    else:
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "relu", "out_scale", "out_dtype", "interpret"))
def int8_conv3x3(x_pad, w_q, scale, bias, residual=None, relu: bool = True,
                 out_scale: float | None = None,
                 out_dtype=jnp.bfloat16, interpret: bool = False):
    """Fused int8 3×3/s1 conv.

    x_pad (B, H+2, W+2, C) int8, spatially pre-padded by 1;
    w_q (9·C, F) int8 in (tap-major, channel-minor) im2col order —
    exactly `ConvBN`'s stored `wq` layout;
    scale (F,) fp32 = act_scale · per-channel weight scale;
    bias (F,) fp32 (the BN-folded bias);
    residual: optional (B, H, W, F) tensor added before the ReLU
    (bottleneck shortcut);
    out_scale: None → `out_dtype` output; a float → output requantized to
    int8 with that static scale (int8-resident chaining).

    Returns (B, H, W, F).
    """
    B, Hp, Wp, C = x_pad.shape
    H, W = Hp - 2, Wp - 2
    F = w_q.shape[1]
    has_residual = residual is not None
    kernel = functools.partial(
        _conv3_kernel, H=H, W=W, C=C, F=F, relu=relu,
        out_scale=out_scale, has_residual=has_residual)
    out_dt = jnp.int8 if out_scale is not None else out_dtype

    in_specs = [
        pl.BlockSpec((1, Hp, Wp, C), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),        # weights, replicated
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x_pad, w_q, scale, bias]
    if has_residual:
        in_specs.append(pl.BlockSpec((1, H, W, F), lambda b: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)
    else:
        # dummy ref so the kernel arity is static
        in_specs.append(pl.BlockSpec((1, 1, 1, 1), lambda b: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1, 1, 1), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, W, F), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, F), out_dt),
        interpret=interpret,
    )(*args)


def conv3x3_reference(x_pad, w_q, scale, bias, residual=None,
                      relu: bool = True, out_scale: float | None = None,
                      out_dtype=jnp.bfloat16):
    """XLA im2col reference with identical integer/epilogue semantics."""
    B, Hp, Wp, C = x_pad.shape
    H, W = Hp - 2, Wp - 2
    views = [x_pad[:, i:i + H, j:j + W, :]
             for i in range(3) for j in range(3)]
    patches = jnp.concatenate(views, axis=-1)
    acc = jax.lax.dot_general(patches, w_q, (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) + 0.0
    out = out * scale[None, None, None, :] + bias[None, None, None, :]
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    if out_scale is not None:
        return jnp.clip(jnp.round(out * (1.0 / out_scale)),
                        -127, 127).astype(jnp.int8)
    return out.astype(out_dtype)


def _bottleneck_kernel(x_ref, w1_ref, w2_ref, w3_ref,
                       s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
                       o_ref, pad_ref, *, H: int, W: int, Cin: int,
                       Cw: int, res_scale: float, out_bf16: bool):
    x = x_ref[0]                                    # (H, W, Cin) int8
    # conv1 1x1 -> relu -> requant (scales pre-folded: s1 = a_s*w_s/q1)
    a1 = jax.lax.dot_general(x, w1_ref[...], (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    a1 = jnp.maximum(a1.astype(jnp.float32) * s1_ref[:] + b1_ref[:], 0.0)
    a1q = jnp.clip(jnp.round(a1), 0, 127).astype(jnp.int8)
    # conv2 3x3: zero-padded scratch, 9 accumulated taps
    pad_ref[...] = jnp.zeros((H + 2, W + 2, Cw), jnp.int8)
    pad_ref[1:H + 1, 1:W + 1, :] = a1q
    acc = None
    for i in range(3):
        for j in range(3):
            v = pad_ref[i:i + H, j:j + W, :]
            w_tap = w2_ref[(i * 3 + j) * Cw:(i * 3 + j + 1) * Cw, :]
            y = jax.lax.dot_general(v, w_tap, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            acc = y if acc is None else acc + y
    a2 = jnp.maximum(acc.astype(jnp.float32) * s2_ref[:] + b2_ref[:], 0.0)
    a2q = jnp.clip(jnp.round(a2), 0, 127).astype(jnp.int8)
    # conv3 1x1 + dequantized-int8 shortcut + relu (+ requant)
    a3 = jax.lax.dot_general(a2q, w3_ref[...], (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    out = a3.astype(jnp.float32) * s3_ref[:] + b3_ref[:] \
        + x.astype(jnp.float32) * res_scale
    out = jnp.maximum(out, 0.0)
    if out_bf16:
        o_ref[0] = out.astype(jnp.bfloat16)
    else:
        o_ref[0] = jnp.clip(jnp.round(out), 0, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=(
    "res_scale", "out_bf16", "interpret"))
def int8_bottleneck(x_q, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                    res_scale: float, out_bf16: bool = False,
                    interpret: bool = False):
    """Fully-fused int8-resident ResNet bottleneck (stride 1, identity
    shortcut): conv1 1x1 → relu → conv2 3x3 → relu → conv3 1x1 →
    +shortcut → relu, all inside VMEM for one image per grid step.

    HBM traffic is exactly x in + y out (+O(weights)) — the XLA path
    moves every intermediate activation, im2col patch tensor and
    epilogue pass through HBM instead.

    x_q (B, H, W, Cin) int8 in the BLOCK's input-quantization domain.
    Scales/biases are PRE-FOLDED by the caller so every requant is one
    multiply-add (`fold_bottleneck_params`):
      s1 = a1_s·w1_s/q1, b1 = b1_fused/q1 (q1 = conv2's act scale), etc;
      the last stage s3/b3 land in the OUTPUT domain (next block's input
      quantization, or real units for `out_bf16=True`);
      res_scale converts x's int8 domain into the output domain.
    Returns (B, H, W, Cin) int8 (or bf16).
    """
    B, H, W, Cin = x_q.shape
    Cw = w1.shape[1]
    kernel = functools.partial(
        _bottleneck_kernel, H=H, W=W, Cin=Cin, Cw=Cw,
        res_scale=res_scale, out_bf16=out_bf16)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  vmem(), vmem(), vmem(),
                  vmem(), vmem(), vmem(), vmem(), vmem(), vmem()],
        out_specs=pl.BlockSpec((1, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, H, W, Cin), jnp.bfloat16 if out_bf16 else jnp.int8),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, Cw), jnp.int8)],
        interpret=interpret,
    )(x_q, w1, w2, w3, s1, b1, s2, b2, s3, b3)


def bottleneck_reference(x_q, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                         res_scale: float, out_bf16: bool = False):
    """XLA reference with identical integer/epilogue semantics."""
    a1 = jax.lax.dot_general(x_q, w1, (((3,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    a1 = jnp.maximum(a1.astype(jnp.float32) * s1 + b1, 0.0)
    a1q = jnp.clip(jnp.round(a1), 0, 127).astype(jnp.int8)
    B, H, W, Cw = a1q.shape
    xp = jnp.pad(a1q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [xp[:, i:i + H, j:j + W, :]
             for i in range(3) for j in range(3)]
    patches = jnp.concatenate(views, axis=-1)
    acc = jax.lax.dot_general(patches, w2, (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    a2 = jnp.maximum(acc.astype(jnp.float32) * s2 + b2, 0.0)
    a2q = jnp.clip(jnp.round(a2), 0, 127).astype(jnp.int8)
    a3 = jax.lax.dot_general(a2q, w3, (((3,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    out = a3.astype(jnp.float32) * s3 + b3 \
        + x_q.astype(jnp.float32) * res_scale
    out = jnp.maximum(out, 0.0)
    if out_bf16:
        return out.astype(jnp.bfloat16)
    return jnp.clip(jnp.round(out), 0, 127).astype(jnp.int8)
