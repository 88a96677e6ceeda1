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


# ---------------------------------------------------------------------------
# Round-4 v2 kernels: padded-grid fused bottleneck + fused stem/pool.
#
# The v1 `int8_bottleneck` above LOST to the XLA int8-resident chain
# (DESIGN.md r04 A/B: 2.34 vs 1.80 ms at l1 shapes) for two measured
# reasons: the 3x3 conv contracted K=Cw per tap (9 half-empty MXU passes)
# and the zero-padded scratch-ref writes forced Mosaic relayouts. A first
# v2 attempt (9 shifted int8 views lane-concatenated into one im2col
# patch array) died in Mosaic layout inference: shifted int8 views get
# mismatched vregister offsets and `tpu.concatenate` refuses them.
#
# This v2 sidesteps every shifted-int8-view op with three moves:
#   1. PADDED-GRID residency: the kernel computes on a zero-bordered
#      (Hp=H+2, Wp=W+2 rounded up to the 32-sublane int8 tile) grid
#      end-to-end and re-zeros the border where needed, so no view is
#      ever sliced out of the middle of a tiled dim. Chained fused blocks
#      pass the padded int8 grid directly — no per-block pad/slice at all.
#   2. Wp a tile multiple makes the (g*Hp, Wp, C) <-> (g*Hp*Wp, C)
#      reshapes LAYOUT-FREE, so every conv contracts as ONE flat 2D dot
#      with M = g*Hp*Wp (a rank-3 variant measured 2.5 ms at l2 vs 1.6 ms
#      XLA — Mosaic runs rank-3 dots as R separate M=Wp matmuls).
#      Row taps are built by slice+concat on the UNTILED dim 0 of the
#      rank-3 view — pure vreg-row bookkeeping, so the lane concat of the
#      3 row views is offset-uniform by construction. (Cross-image
#      wraparound pulls only zeroed pad rows.)
#   3. Column taps folded into the MATMUL: w2 is split by column offset
#      dj into 3 (3Cw, Cw) groups, each contracted against the row-view
#      concat, and the int32 PARTIAL SUMS are column-shifted with
#      `pltpu.roll` (sublane rotate of 32-bit data — natively supported)
#      before summing. In flat space a 1-column shift is a 1-sublane roll
#      whose row-boundary wraps land only on masked pad columns. No int8
#      rotate, no narrow-of-rolled-view, and K per dot is 3*Cw.
# ---------------------------------------------------------------------------


def _bneck_v2_kernel(x_ref, w1_ref, w2d_ref, w3_ref, s1_ref, b1_ref,
                     s2_ref, b2_ref, s3_ref, b3_ref, rs_ref, o_ref, *,
                     g: int, H: int, W: int, Wp: int, Cw: int,
                     out_bf16: bool):
    Cin = 4 * Cw
    Hp = H + 2
    R = g * Hp
    P = R * Wp
    x = x_ref[...].reshape(P, Cin)                  # int8, borders arbitrary
    # conv1 1x1 -> relu -> requant into conv2's activation domain
    a1 = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    a1 = jnp.maximum(a1.astype(jnp.float32) * s1_ref[:] + b1_ref[:], 0.0)
    a1q = jnp.clip(jnp.round(a1), 0, 127).astype(jnp.int8)
    # zero the pad border: conv2 consumes neighbours, so border cells must
    # be exactly 0 (conv1's bias/relu makes them nonzero otherwise)
    p_ = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    row, col = (p_ // Wp) % Hp, p_ % Wp
    interior = ((row >= 1) & (row <= H) & (col >= 1) & (col <= W))
    a1q = jnp.where(interior, a1q, 0)
    # conv2 3x3/s1 row views on the untiled dim of the rank-3 view (wrap
    # rows are zeroed pad rows, so cross-image wraparound is exact)
    a3d = a1q.reshape(R, Wp, Cw)
    up = jnp.concatenate([a3d[1:], a3d[:1]], axis=0)      # row r+1
    dn = jnp.concatenate([a3d[R - 1:], a3d[:R - 1]], axis=0)  # row r-1
    rowcat = jnp.concatenate([dn, a3d, up], axis=-1) \
        .reshape(P, 3 * Cw)
    acc = None
    for dj in (-1, 0, 1):
        y = jax.lax.dot_general(
            rowcat, w2d_ref[dj + 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (P, Cw)
        if dj:  # output cell p needs y[p + dj]: left-rotate by dj; the
            # row-boundary wraps pull y at pad columns, which is exactly 0
            # (all rowcat inputs there are masked to 0)
            y = pltpu.roll(y, (-dj) % P, 0)
        acc = y if acc is None else acc + y
    a2 = jnp.maximum(acc.astype(jnp.float32) * s2_ref[:] + b2_ref[:], 0.0)
    a2q = jnp.clip(jnp.round(a2), 0, 127).astype(jnp.int8)
    # conv3 1x1 + int8 shortcut (rescaled into the output domain) + relu;
    # border cells hold garbage until the final interior mask re-zeros them
    a3 = jax.lax.dot_general(a2q, w3_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    out = a3.astype(jnp.float32) * s3_ref[:] + b3_ref[:] \
        + x.astype(jnp.float32) * rs_ref[0]
    out = jnp.maximum(out, 0.0)
    out = jnp.where(interior, out, 0.0)
    out = out.reshape(g, Hp, Wp, Cin)
    if out_bf16:
        o_ref[...] = out.astype(jnp.bfloat16)
    else:
        o_ref[...] = jnp.clip(jnp.round(out), 0, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=(
    "out_bf16", "g", "padded_io", "interpret"))
def int8_bottleneck_v2(x_q, w1, w2, w3, s1, b1, s2, b2, s3, b3, res_scale,
                       out_bf16: bool = False, g: int = 1,
                       padded_io: bool = False, interpret: bool = False):
    """Fused int8-resident identity bottleneck on the padded grid.

    x_q (B, H, W, 4*Cw) int8 in this block's conv1 activation domain
    (square: H == W) — or, with `padded_io=True`, the padded layout
    (B, H+2, Wp, 4*Cw), Wp = H+2 rounded up to the 32-sublane int8 tile,
    whose border content is arbitrary (a chained fused block emits zeroed
    borders);
    w1 (4Cw, Cw), w2 (9Cw, Cw), w3 (Cw, 4Cw) int8 (im2col tap-major);
    s*/b* (F,) fp32 pre-folded so each requant is one multiply-add:
      s1 = a0*w1s/q2, b1 = bias1/q2   (q2 = conv2's act scale)
      s2 = q2*w2s/q3, b2 = bias2/q3   (q3 = conv3's act scale)
      s3 = q3*w3s/qN, b3 = bias3/qN   (qN = next block's input act scale,
                                       or 1.0 with out_bf16=True)
    res_scale (1,) fp32 = a0/qN (the shortcut's domain change).
    `g` images are processed per grid step (B % g == 0).
    Returns int8 in the next block's domain (or bf16), with the same
    padded/unpadded layout as the input; padded outputs have zero borders.
    """
    B, Hx, Wx, Cin = x_q.shape
    H = Hx - 2 if padded_io else Hx
    W = H  # square grids only (ResNet stages)
    Cw = w1.shape[1]
    Hp = H + 2
    Wp = -(-(W + 2) // 32) * 32     # lane-tile-aligned padded width
    assert Cin == 4 * Cw and B % g == 0
    if padded_io:
        assert Wx == Wp, (Wx, Wp)
    else:
        assert Wx == W
        x_q = jnp.pad(x_q, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0)))
    # split w2 by column tap dj (tap index t = (di+1)*3 + (dj+1)) into
    # (3, 3Cw, Cw), di-major rows to match the kernel's rowcat order
    w2d = jnp.stack([w2.reshape(3, 3, Cw, Cw)[:, j].reshape(3 * Cw, Cw)
                     for j in range(3)])
    kernel = functools.partial(_bneck_v2_kernel, g=g, H=H, W=W, Wp=Wp,
                               Cw=Cw, out_bf16=out_bf16)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, Hp, Wp, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  vmem(), vmem(), vmem(),
                  vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem()],
        out_specs=pl.BlockSpec((g, Hp, Wp, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, Hp, Wp, Cin), jnp.bfloat16 if out_bf16 else jnp.int8),
        interpret=interpret,
    )(x_q, w1, w2d, w3, s1, b1, s2, b2, s3, b3,
      jnp.asarray(res_scale, jnp.float32).reshape(1))
    if padded_io:
        return out
    return out[:, 1:H + 1, 1:W + 1, :]


def bottleneck_v2_reference(x_q, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                            res_scale, out_bf16: bool = False):
    """XLA reference with identical integer/epilogue semantics."""
    rs = jnp.asarray(res_scale, jnp.float32).reshape(())
    return bottleneck_reference(
        x_q, w1, w2, w3, s1, b1, s2, b2, s3, b3,
        res_scale=rs, out_bf16=out_bf16)


def _stem_pool_kernel(p_ref, w_ref, s_ref, b_ref, o_ref, *,
                      OB: int, F: int):
    pt = p_ref[0]                                   # (OB, OB, 432) int8
    ptm = pt.reshape(OB * OB, pt.shape[-1])
    # One dot per subpixel plane (pq = p*2+q). A single (K, 4F) dot would
    # need lane slices / a lane-splitting reshape of the output, both of
    # which Mosaic rejects ("unsupported shape cast" / concat offset
    # mismatch); four offset-0 (K, F) dots keep every intermediate at
    # vregister offset (0, 0). Epilogue order matches the XLA stem
    # BIT-EXACTLY: (int32 -> fp32 * scale) -> bf16, + bf16 bias, relu and
    # pool in bf16.
    planes = []
    for pq in range(4):
        acc = jax.lax.dot_general(
            ptm, w_ref[pq], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * s_ref[pq]).astype(o_ref.dtype)
        y = y + b_ref[pq].astype(o_ref.dtype)
        planes.append(jnp.maximum(y, 0).reshape(OB, OB, F))
    a, b, c, d = planes                 # p0q0, p0q1, p1q0, p1q1
    # 3x3/s2 maxpool in s2d space: output row i pools conv rows
    # {2i-1, 2i, 2i+1} = subpixel planes p0(i), p1(i), p1(i-1); columns
    # likewise. Zero padding is exact: inputs are relu'd (>= 0).
    zr = jnp.zeros((1, OB, F), o_ref.dtype)
    rq0 = jnp.maximum(jnp.maximum(a, c),
                      jnp.concatenate([zr, c[:-1]], axis=0))
    rq1 = jnp.maximum(jnp.maximum(b, d),
                      jnp.concatenate([zr, d[:-1]], axis=0))
    # column shift via roll + first-column mask (offset-preserving).
    # Mosaic's rotate only supports 32-bit data: roll in fp32 (the
    # bf16->fp32->bf16 round-trip is exact).
    col = jax.lax.broadcasted_iota(jnp.int32, (OB, OB, F), 1)
    r1s = jnp.where(col == 0, jnp.zeros((), o_ref.dtype),
                    pltpu.roll(rq1.astype(jnp.float32), 1, 1)
                    .astype(o_ref.dtype))
    o_ref[0] = jnp.maximum(jnp.maximum(rq0, rq1), r1s)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_stem_pool(patches, w2, scale, bias, out_dtype=jnp.bfloat16,
                   interpret: bool = False):
    """Fused epilogue+maxpool for the space-to-depth ResNet stem.

    patches (B, OB, OB, 432) int8 — the s2d-4 im2col views built by XLA
    (`models/resnet.py::StemPoolS2D`); w2 (432, 4*F) int8 in the s2d
    scatter layout (subpixel-major output lanes); scale (4F,) fp32 =
    act_scale * tiled weight scale; bias (4F,) fp32 tiled fused bias.

    The XLA stem materializes the (B, OB, OB, 4F) int32 dot output, its
    fp32 dequant, the relu and three maxpool passes through HBM (~1.3 GB
    at B=128); here everything after the patch read stays in VMEM and
    only the pooled (B, OB, OB, F) output is written. Output is
    BIT-IDENTICAL to the XLA stem tail (same integer dot, same bf16
    rounding points; tests/test_kernels.py).
    """
    B, OB, _, K = patches.shape
    F = w2.shape[1] // 4
    w4 = w2.reshape(K, 4, F).transpose(1, 0, 2)     # (4, K, F)
    s4 = scale.reshape(4, F)
    b4 = bias.reshape(4, F)
    kernel = functools.partial(_stem_pool_kernel, OB=OB, F=F)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, OB, OB, K), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  vmem(), vmem(), vmem()],
        out_specs=pl.BlockSpec((1, OB, OB, F), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OB, OB, F), out_dtype),
        interpret=interpret,
    )(patches, w4, s4, b4)
