"""Bidirectional LSTM head via `lax.scan`.

Replaces the cuDNN-backed `nn.LSTM(hidden, hidden, bidirectional=True)` that
feeds the CRF classifier in the flagship model
(`Cross_Modal_Interaction_Module.py:905-908,1042`). Numerics match
torch.nn.LSTM exactly (gate order i,f,g,o; separate input/hidden biases) so
reference weights import cleanly.

TPU mapping: the input projection for ALL timesteps is one large (B·L, 4H)
matmul on the MXU outside the scan; the scan body only carries the (B, 4H)
recurrent matmul. Recurrent math runs fp32 for parity; the big input
projection follows the compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _lstm_scan(x_proj, w_hh, b_hh, hidden: int, reverse: bool,
               matmul_dtype=jnp.float32):
    """x_proj: (B, L, 4H) precomputed input contribution (+ b_ih).
    Returns (B, L, H) hidden states. The recurrent matmul runs at full
    fp32 precision when `matmul_dtype` is fp32 (torch parity); in bf16
    mode it rides the MXU fast path (the fp32 carry is preserved)."""
    B = x_proj.shape[0]
    h0 = jnp.zeros((B, hidden), jnp.float32)
    c0 = jnp.zeros((B, hidden), jnp.float32)
    precise = matmul_dtype == jnp.float32
    w_hh_t = w_hh.T.astype(matmul_dtype)

    def step(carry, xt):
        h, c = carry
        rec = jnp.matmul(
            h.astype(matmul_dtype), w_hh_t,
            precision=jax.lax.Precision.HIGHEST if precise else None,
            preferred_element_type=jnp.float32)
        gates = xt + rec + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.moveaxis(x_proj.astype(jnp.float32), 1, 0)  # (L, B, 4H)
    _, hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.moveaxis(hs, 0, 1)


class BiLSTM(nn.Module):
    """torch-compatible bidirectional LSTM, batch_first, single layer.

    Output: (B, L, 2H) — forward states concatenated with backward states.
    """

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math
        in_dim = x.shape[-1]
        H = self.hidden
        k = 1.0 / math.sqrt(H)
        init = nn.initializers.uniform(scale=2 * k)

        def u(key, shape, dtype):
            return init(key, shape, dtype) - k

        outs = []
        for direction, reverse in (("fwd", False), ("bwd", True)):
            w_ih = self.param(f"w_ih_{direction}", u, (4 * H, in_dim),
                              jnp.float32)
            w_hh = self.param(f"w_hh_{direction}", u, (4 * H, H), jnp.float32)
            b_ih = self.param(f"b_ih_{direction}", u, (4 * H,), jnp.float32)
            b_hh = self.param(f"b_hh_{direction}", u, (4 * H,), jnp.float32)
            # One MXU matmul for every timestep's input contribution.
            from icka_tpu.nn.layers import matmul_precision
            x_proj = jnp.einsum(
                "bld,gd->blg", x.astype(self.dtype), w_ih.astype(self.dtype),
                preferred_element_type=jnp.float32,
                precision=matmul_precision(self.dtype)) + b_ih
            outs.append(_lstm_scan(x_proj, w_hh, b_hh, H, reverse,
                                   matmul_dtype=self.dtype))
        return jnp.concatenate(outs, axis=-1).astype(self.dtype)
