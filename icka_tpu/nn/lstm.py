"""Bidirectional LSTM head via a fused `lax.scan`.

Replaces the cuDNN-backed `nn.LSTM(hidden, hidden, bidirectional=True)` that
feeds the CRF classifier in the flagship model
(`Cross_Modal_Interaction_Module.py:905-908,1042`). Numerics match
torch.nn.LSTM exactly (gate order i,f,g,o; separate input/hidden biases) so
reference weights import cleanly.

TPU mapping:
  - the input projection for ALL timesteps and BOTH directions is one large
    MXU matmul outside the scan;
  - both directions run in ONE `lax.scan` (the backward direction scans the
    time-reversed sequence), halving the sequential step count; the
    recurrent matmul is a single batched einsum over a leading direction
    axis of 2;
  - the scan is unrolled (8×) to amortize loop overhead — the recurrent
    step is tiny relative to TPU loop-iteration cost;
  - recurrent math accumulates fp32; the matmuls follow the compute dtype
    (fp32 → HIGHEST precision for torch parity, bf16 → MXU fast path).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilstm_scan(x_proj, w_hh, b_hh, hidden: int, matmul_dtype, unroll=None,
                 mask=None, reset=None):
    """x_proj: (2, B, L, 4H) input contributions (+ b_ih), direction 0 in
    forward time order, direction 1 time-reversed. w_hh: (2, H, 4H),
    b_hh: (2, 1, 4H). Returns (2, B, L, H) hidden states in scan order.

    `mask` (2, B, L) {0,1} in scan order, optional: masked timesteps HOLD
    the recurrent state (h, c) instead of updating it, so the backward
    direction enters each row's valid region with the initial zero state
    regardless of how much padding follows the sequence. This is the
    serving-exactness mode (`ICKAConfig.masked_lstm`); the default
    (mask=None) matches torch nn.LSTM over a padded batch bit-for-bit.

    `reset` (2, B, L) {0,1} in scan order, optional — sequence-PACKING
    support: a set bit zeroes the carry (h, c) BEFORE the timestep is
    consumed, so each packed segment's recurrence starts from the initial
    zero state exactly as if it ran alone (`icka_tpu.serving.packing`:
    direction 0 marks segment starts, direction 1 segment ends)."""
    _, B, L, _ = x_proj.shape
    h0 = jnp.zeros((2, B, hidden), jnp.float32)
    c0 = jnp.zeros((2, B, hidden), jnp.float32)
    precise = matmul_dtype == jnp.float32
    w = w_hh.astype(matmul_dtype)
    masked = mask is not None
    resetting = reset is not None

    def step(carry, xt):                    # xt: (2, B, 4H) [+ (2, B, 1)]
        h, c = carry
        if masked and resetting:
            xt, mt, rt = xt
        elif masked:
            xt, mt = xt
        elif resetting:
            xt, rt = xt
        if resetting:
            h = jnp.where(rt, 0.0, h)
            c = jnp.where(rt, 0.0, c)
        rec = jnp.einsum(
            "dbh,dhg->dbg", h.astype(matmul_dtype), w,
            precision=jax.lax.Precision.HIGHEST if precise else None,
            preferred_element_type=jnp.float32)
        gates = xt + rec + b_hh[:, None, 0]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if masked:
            c_new = jnp.where(mt, c_new, c)
            h_new = jnp.where(mt, h_new, h)
        return (h_new, c_new), h_new

    xs = jnp.moveaxis(x_proj.astype(jnp.float32), 2, 0)   # (L, 2, B, 4H)
    extras = []
    if masked:
        extras.append(jnp.moveaxis(mask, 2, 0)[..., None] > 0)
    if resetting:
        extras.append(jnp.moveaxis(reset, 2, 0)[..., None] > 0)
    if extras:
        xs = (xs, *extras)
    if unroll is None:
        from icka_tpu.nn.layers import scan_unroll
        unroll = scan_unroll()
    _, hs = jax.lax.scan(step, (h0, c0), xs, unroll=unroll)
    return jnp.moveaxis(hs, 0, 2)                         # (2, B, L, H)


class BiLSTM(nn.Module):
    """torch-compatible bidirectional LSTM, batch_first, single layer.

    Output: (B, L, 2H) — forward states concatenated with backward states.
    """

    hidden: int
    dtype: jnp.dtype = jnp.float32
    unroll: int = 0  # 0 = backend default (8 on TPU, 1 elsewhere)
    # "int8" quantizes the hoisted input projection dynamically (and sows
    # calibration abs-max); "int8_static" consumes offline-quantized
    # weights + a calibrated per-tensor activation scale. The tiny
    # latency-bound recurrent matmul stays in the compute dtype.
    quant: str = "none"

    @nn.compact
    def __call__(self, x, mask=None, reset_fwd=None, reset_bwd=None):
        """x: (B, L, D). `mask` (B, L) {0,1}, optional: padding timesteps
        hold the recurrent state (see `_bilstm_scan`) — the
        serving-exactness mode. Default None = torch-parity unmasked.

        `reset_fwd`/`reset_bwd` (B, L) {0,1}, optional — sequence-PACKING
        support: the forward carry is zeroed before consuming a token with
        `reset_fwd` set (segment starts), the backward carry before a token
        with `reset_bwd` set (segment ends), so every packed segment's
        recurrence is exactly the recurrence it would run alone."""
        from icka_tpu.nn.layers import matmul_precision

        in_dim = x.shape[-1]
        H = self.hidden
        k = 1.0 / math.sqrt(H)
        init = nn.initializers.uniform(scale=2 * k)

        def u(key, shape, dtype):
            return init(key, shape, dtype) - k

        params = {}
        static_q = self.quant == "int8_static"
        for direction in ("fwd", "bwd"):
            params[direction] = dict(
                w_hh=self.param(f"w_hh_{direction}", u, (4 * H, H),
                                jnp.float32),
                b_ih=self.param(f"b_ih_{direction}", u, (4 * H,),
                                jnp.float32),
                b_hh=self.param(f"b_hh_{direction}", u, (4 * H,),
                                jnp.float32),
            )
            if not static_q:
                params[direction]["w_ih"] = self.param(
                    f"w_ih_{direction}", u, (4 * H, in_dim), jnp.float32)

        # One MXU matmul for every timestep's input contribution, both
        # directions at once: (B, L, D) × (D, 8H).
        if static_q:
            w_ih_q = self.param("w_ih_q", nn.initializers.zeros,
                                (in_dim, 8 * H), jnp.int8)
            w_ih_scale = self.param("w_ih_scale",
                                    nn.initializers.constant(1.0 / 127.0),
                                    (8 * H,), jnp.float32)
            a_s = self.param("act_scale",
                             nn.initializers.constant(1.0 / 127.0),
                             (), jnp.float32)
            x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s),
                           -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x_q, w_ih_q, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            proj = acc.astype(jnp.float32) * (a_s * w_ih_scale)
        elif self.quant == "int8":
            w_ih_all = jnp.concatenate(
                [params["fwd"]["w_ih"].T, params["bwd"]["w_ih"].T], axis=1)
            w_s = jnp.maximum(jnp.max(jnp.abs(w_ih_all), axis=0),
                              1e-8) / 127.0
            w_q = jnp.clip(jnp.round(w_ih_all / w_s[None, :]),
                           -127, 127).astype(jnp.int8)
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                           keepdims=True)
            self.sow("calib", "amax", jnp.max(amax),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))
            a_s = jnp.maximum(amax, 1e-8) / 127.0
            x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s),
                           -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x_q, w_q, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            proj = acc.astype(jnp.float32) * (a_s * w_s)
        else:
            w_ih_all = jnp.concatenate(
                [params["fwd"]["w_ih"].T, params["bwd"]["w_ih"].T], axis=1)
            proj = jnp.einsum(
                "bld,dg->blg", x.astype(self.dtype),
                w_ih_all.astype(self.dtype),
                preferred_element_type=jnp.float32,
                precision=matmul_precision(self.dtype))
        fwd_in = proj[..., : 4 * H] + params["fwd"]["b_ih"]
        bwd_in = proj[..., 4 * H:] + params["bwd"]["b_ih"]
        x_proj = jnp.stack([fwd_in, bwd_in[:, ::-1, :]], axis=0)

        w_hh = jnp.stack([params["fwd"]["w_hh"].T,
                          params["bwd"]["w_hh"].T], axis=0)   # (2, H, 4H)
        b_hh = jnp.stack([params["fwd"]["b_hh"],
                          params["bwd"]["b_hh"]], axis=0)[:, None, :]

        scan_mask = None
        if mask is not None:
            m = mask.astype(jnp.float32)
            scan_mask = jnp.stack([m, m[:, ::-1]], axis=0)   # (2, B, L)
        scan_reset = None
        if reset_fwd is not None or reset_bwd is not None:
            rf = (jnp.zeros(x.shape[:2], jnp.float32)
                  if reset_fwd is None else reset_fwd.astype(jnp.float32))
            rb = (jnp.zeros(x.shape[:2], jnp.float32)
                  if reset_bwd is None else reset_bwd.astype(jnp.float32))
            scan_reset = jnp.stack([rf, rb[:, ::-1]], axis=0)
        hs = _bilstm_scan(x_proj, w_hh, b_hh, H, self.dtype,
                          unroll=self.unroll or None,
                          mask=scan_mask, reset=scan_reset)  # (2, B, L, H)
        fwd_h = hs[0]
        bwd_h = hs[1][:, ::-1, :]
        return jnp.concatenate([fwd_h, bwd_h], axis=-1).astype(self.dtype)
