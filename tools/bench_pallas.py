"""Pallas fused attention vs XLA einsum at the flagship's real shapes.

Settles VERDICT r01 weak-#3 with a measurement: is the custom kernel
faster than XLA's fusion for the self-attention (seq 150) and txt2img
cross-attention (128×49) shapes? Both sides timed as one fori_loop
dispatch (see tools/profile_stages.py for the tunnel traps).

Run: python tools/bench_pallas.py [--batch 64] [--inner 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tools.profile_stages import _enable_cache, dep, loop_time  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--inner", type=int, default=20)
    p.add_argument("--seqs", default=None,
                   help="comma list of extra self-attention seq lengths "
                   "(e.g. 16,24,38,48 — the bucketed engine's short "
                   "shapes, where the kernel's one-element-per-grid-step "
                   "layout may starve the MXU)")
    args = p.parse_args()
    _enable_cache()

    from icka_tpu.kernels.attention import (
        attention_reference,
        fused_attention,
    )

    B, D, N = args.batch, 1024, 16
    rng = np.random.default_rng(0)
    shapes = [("self150", 150, 150), ("cross128x49", 128, 49)]
    if args.seqs:
        shapes += [(f"self{s}", int(s), int(s))
                   for s in args.seqs.split(",")]
    for name, Sq, Sk in shapes:
        q = jnp.asarray(rng.standard_normal((B, Sq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, Sk, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Sk, D)), jnp.bfloat16)
        bias = jnp.zeros((B, 1, 1, Sk), jnp.float32)

        def step_pallas(out, q, k, v):
            return fused_attention(q + dep(out).astype(q.dtype), k, v,
                                   bias, num_heads=N)

        def step_xla(out, q, k, v):
            return attention_reference(q + dep(out).astype(q.dtype), k, v,
                                       bias, num_heads=N)

        init = jnp.zeros((B, Sq, D), jnp.bfloat16)
        t_x = loop_time(step_xla, init, args.inner, args=(q, k, v))
        t_p = loop_time(step_pallas, init, args.inner, args=(q, k, v))
        flops = 2 * 2 * B * Sq * Sk * D
        print(f"{name:12s}: xla {t_x * 1e3:7.3f} ms "
              f"({flops / t_x / 1e12:5.1f} TF/s)  "
              f"pallas {t_p * 1e3:7.3f} ms "
              f"({flops / t_p / 1e12:5.1f} TF/s)  "
              f"pallas/xla = {t_p / t_x:.2f}x", flush=True)


if __name__ == "__main__":
    main()
