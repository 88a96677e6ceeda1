"""A/B: v2 fused Pallas kernels vs the production XLA int8_static path.

Times, at ResNet-152's production shapes (batch 128):
  - stem+pool: `StemPoolS2D` (XLA s2d + dot + epilogue + pool) vs the same
    XLA patch build feeding `int8_stem_pool` (dot+epilogue+pool in VMEM);
  - one identity bottleneck per stage: the production ConvBN chain
    (bf16-resident between convs, requant per conv) vs
    `int8_bottleneck_v2` (int8-resident, patch-concat single-K dot),
    sweeping images-per-program g.

Run:  python tools/ab_fused_v2.py [--batch 128] [--inner 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _enable_cache():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def dep(prev):
    return jnp.where(jnp.sum(prev.astype(jnp.float32)) > 1e30, 1.0, 0.0)


def loop_time(step_fn, init_carry, inner: int, outer: int = 3, args=()):
    """See tools/profile_stages.py::loop_time (tunnel-safe device timing)."""

    @jax.jit
    def run(carry, *a):
        out = jax.lax.fori_loop(
            0, inner, lambda i, c: step_fn(c, *a), carry)
        leaf = jax.tree.leaves(out)[0]
        return out, jnp.sum(leaf.astype(jnp.float32))

    carry, s = run(init_carry, *args)
    float(s)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        carry, s = run(carry, *args)
        float(s)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--inner", type=int, default=40)
    p.add_argument("--which", default="all")
    args = p.parse_args()
    _enable_cache()
    B = args.batch
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    want = (set(args.which.split(",")) if args.which != "all"
            else {"stem", "l1", "l2", "l3", "l4"})

    if "stem" in want:
        from flax import linen as nn
        from icka_tpu.models.resnet import StemPoolS2D, _STEM_S2D_IDX
        from icka_tpu.kernels.conv import int8_stem_pool

        stem = StemPoolS2D(dtype=jnp.bfloat16, quant="int8_static")
        x = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.bfloat16)
        sv = stem.init(key, x)

        def step_xla(out, sv, x):
            return stem.apply(sv, x + dep(out).astype(x.dtype))

        t = loop_time(step_xla, jnp.zeros((B, 56, 56, 64), jnp.bfloat16),
                      args.inner, args=(sv, x))
        print(f"stem XLA (prod)        : {t*1e3:7.2f} ms  "
              f"({B/t:8.1f} imgs/s)", flush=True)

        # kernel path: identical XLA front (quant, pad, s2d, patch views),
        # then the fused dot+epilogue+pool kernel
        p_ = sv["params"]
        dst_r, dst_pq, src = _STEM_S2D_IDX
        w2 = jnp.zeros((432, 4, 64), jnp.int8)
        w2 = w2.at[jnp.asarray(dst_r), jnp.asarray(dst_pq)].set(
            jnp.asarray(p_["wq"])[jnp.asarray(src)])
        w2 = w2.reshape(432, 256)
        a_s = jnp.asarray(p_["act_scale"])
        scale = a_s * jnp.tile(jnp.asarray(p_["w_scale"]), 4)
        bias = jnp.tile(jnp.asarray(p_["fused_bias"]), 4)

        def step_kernel(out, x, w2, scale, bias, a_s):
            xx = x + dep(out).astype(x.dtype)
            xd = jnp.clip(jnp.round(xx.astype(jnp.float32) / a_s),
                          -127, 127).astype(jnp.int8)
            xp = jnp.pad(xd, ((0, 0), (3, 5), (3, 5), (0, 0)))
            nb, ob = 58, 56
            xs = (xp.reshape(B, nb, 4, nb, 4, 3)
                  .transpose(0, 1, 3, 2, 4, 5).reshape(B, nb, nb, 48))
            views = [xs[:, i:i + ob, j:j + ob, :]
                     for i in range(3) for j in range(3)]
            patches = jnp.concatenate(views, axis=-1)
            return int8_stem_pool(patches, w2, scale, bias)

        t = loop_time(step_kernel, jnp.zeros((B, 56, 56, 64), jnp.bfloat16),
                      args.inner, args=(x, w2, scale, bias, a_s))
        print(f"stem XLA-front + kernel: {t*1e3:7.2f} ms  "
              f"({B/t:8.1f} imgs/s)", flush=True)

    specs = {  # name: (H, Cw, g_sweep)
        "l1": (56, 64, (1,)),
        "l2": (28, 128, (1, 2)),
        "l3": (14, 256, (2, 4, 8)),
        "l4": (7, 512, (4, 8, 16)),
    }
    for name, (H, Cw, gs) in specs.items():
        if name not in want:
            continue
        Cin = 4 * Cw
        from flax import linen as nn
        from icka_tpu.models.resnet import Bottleneck
        from icka_tpu.kernels.conv import int8_bottleneck_v2

        blk = Bottleneck(Cw, 1, project=False, dtype=jnp.bfloat16,
                         quant="int8_static")
        x = jnp.asarray(rng.standard_normal((B, H, H, Cin)) * 0.1,
                        jnp.bfloat16)
        bv = blk.init(key, x)

        def step_xla(out, bv, x, blk=blk):
            return blk.apply(bv, x + dep(out).astype(x.dtype))

        t = loop_time(step_xla, jnp.zeros((B, H, H, Cin), jnp.bfloat16),
                      args.inner, args=(bv, x))
        print(f"{name} XLA prod block    : {t*1e3:7.2f} ms", flush=True)

        w1 = jnp.asarray(rng.integers(-127, 128, (Cin, Cw)), jnp.int8)
        w2 = jnp.asarray(rng.integers(-127, 128, (9 * Cw, Cw)), jnp.int8)
        w3 = jnp.asarray(rng.integers(-127, 128, (Cw, Cin)), jnp.int8)
        s1 = jnp.full((Cw,), 1e-4, jnp.float32)
        b1 = jnp.zeros((Cw,), jnp.float32)
        s2 = jnp.full((Cw,), 1e-4, jnp.float32)
        b2 = jnp.zeros((Cw,), jnp.float32)
        s3 = jnp.full((Cin,), 1e-4, jnp.float32)
        b3 = jnp.zeros((Cin,), jnp.float32)
        xq = jnp.asarray(rng.integers(-127, 128, (B, H, H, Cin)), jnp.int8)

        for g in gs:
            if B % g:
                continue

            def step_k(out, xq, w1, w2, w3, s1, b1, s2, b2, s3, b3, g=g):
                d = jnp.where(out[0, 0, 0, 0] > 100, 1, 0).astype(jnp.int8)
                return int8_bottleneck_v2(
                    xq + d, w1, w2, w3, s1, b1, s2, b2, s3, b3, 0.5, g=g)

            try:
                t = loop_time(
                    step_k, jnp.zeros((B, H, H, Cin), jnp.int8),
                    args.inner,
                    args=(xq, w1, w2, w3, s1, b1, s2, b2, s3, b3))
                print(f"{name} v2 kernel g={g:<3d}   : {t*1e3:7.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"{name} v2 kernel g={g}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
