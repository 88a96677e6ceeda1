"""A/B: blockwise (flash-style) vs whole-sequence Pallas attention vs XLA
einsum, at the ICKA serving shapes (VERDICT r04 next #5).

Times the attention CORE alone (projections excluded) in a chained
fori_loop on the real chip, bf16, at the flagship encoder geometry
(H=1024, 16 heads) across the serving bucket lengths and a long-sequence
extrapolation point the whole-sequence kernel cannot reach without
holding the full (Sq, Sk) score tile in VMEM.

Usage: python tools/ab_blockwise_attention.py [--iters N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icka_tpu.kernels.attention import (
    attention_reference,
    fused_attention,
    fused_attention_blockwise,
)


def time_fn(fn, args, iters):
    """Chained timing through the RPC tunnel. Two platform gotchas the
    r5 debugging session measured: (a) `jax.block_until_ready` does NOT
    force completion through the axon tunnel — only a HOST FETCH does,
    so the fetched value must be a SCALAR checksum (fetching the (B,S,D)
    output costs ~1 s of tunnel transfer and swamps the signal); (b) the
    output is fed back as the next query so every iteration data-depends
    on the previous one (a `+0/+1 dep` nudge lets XLA hoist both branch
    values out of the loop and collapse the body to a select)."""
    @partial(jax.jit, static_argnames=("n",))
    def loop(q0, rest, n):
        def body(i, p):
            # softmax keeps the chained query bounded (convex combo of v)
            return fn(p, *rest)
        out = jax.lax.fori_loop(0, n, body, q0)
        return jnp.sum(out.astype(jnp.float32))

    q0, rest = args[0], args[1:]
    float(loop(q0, rest, iters))          # warmup (compile + execute)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(q0, rest, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--dim", type=int, default=1024)
    args = p.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    B, N, D = args.batch, args.heads, args.dim
    print(f"# backend={jax.default_backend()} B={B} N={N} D={D} bf16")
    print("# S | xla_ms | fused_ms | blockwise_ms | block/fused | "
          "block/xla")
    for S in (16, 24, 32, 48, 64, 128, 192, 512, 1024):
        q = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
        bias = jnp.zeros((B, 1, 1, S), jnp.float32)
        a = (q, k, v, bias)
        t_x = time_fn(partial(attention_reference, num_heads=N), a,
                      args.iters)
        t_f = float("nan")
        if S <= 256:  # whole-sequence kernel's design regime
            t_f = time_fn(partial(fused_attention, num_heads=N,
                                  interpret=not on_tpu), a, args.iters)
        t_b = time_fn(partial(fused_attention_blockwise, num_heads=N,
                              interpret=not on_tpu), a, args.iters)
        print(f"{S:5d} | {t_x:7.3f} | {t_f:7.3f} | {t_b:7.3f} | "
              f"{t_b / t_f:10.2f} | {t_b / t_x:8.2f}", flush=True)


if __name__ == "__main__":
    main()
