"""Per-stage TPU timing of the ResNet-152 visual backbone.

VERDICT r03 next #1: the backbone (36.7 ms/128 imgs, 39.9% MXU int8) caps
every image-inclusive number at ~3.5k pairs/s. Before touching kernels,
this answers WHERE the 36.7 ms go: preprocess+stem+maxpool, layer1..4 and
the adaptive pool are each timed standalone as one jitted
`lax.fori_loop` dispatch (per-call timing through the RPC tunnel measures
dispatch, not the chip — see tools/profile_stages.py).

Run:  python tools/profile_resnet.py [--batch 128] [--int8] [--ab]

--ab additionally microbenchmarks layout experiments at the measured
hot shapes (tap-sum conv vs patch-concat im2col, space-to-depth stem)
so the kernel strategy is chosen by measurement.
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
from flax import linen as nn  # noqa: E402


def _enable_cache():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def dep(prev):
    return jnp.where(jnp.sum(prev.astype(jnp.float32)) > 1e30, 1.0, 0.0)


def loop_time(step_fn, init_carry, inner: int, outer: int = 3, args=()):
    """One fori_loop(inner) per dispatch; fetch only a scalar reduction.
    Params must be passed via args (closed-over arrays 413 the remote
    compiler). See tools/profile_stages.py::loop_time."""

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


class _Stage(nn.Module):
    """One ResNet stage (layerN): `blocks` bottlenecks, first may stride."""

    width: int
    blocks: int
    first_stride: int
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"
    fused_pallas: bool = False
    g: int = 1

    @nn.compact
    def __call__(self, x):
        from icka_tpu.models.resnet import Bottleneck
        for b in range(self.blocks):
            x = Bottleneck(self.width, self.first_stride if b == 0 else 1,
                           project=(b == 0), dtype=self.dtype,
                           quant=self.quant, fused_pallas=self.fused_pallas,
                           last=(b == self.blocks - 1), g=self.g,
                           name=f"b{b}")(x)
        return x


class _Stem(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"
    s2d: bool = True
    fused_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from icka_tpu.models.resnet import ConvBN, StemPoolS2D
        if self.s2d:
            return StemPoolS2D(dtype=self.dtype, quant=self.quant,
                               fused_pallas=self.fused_pallas,
                               name="stem")(x)
        x = nn.relu(ConvBN(64, 7, 2, dtype=self.dtype, quant=self.quant,
                           name="stem")(x))
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


def _stage_flops(cin, width, blocks, hw_in, stride):
    """MAC*2 for one stage at spatial hw_in -> hw_in/stride."""
    hw = hw_in // stride
    f = 0
    # first block (projection)
    f += 2 * hw_in * hw_in * cin * width // (stride * stride) * 0  # conv1 below
    # conv1 1x1 (stride 1 in torchvision: stride applies at conv2)
    f += 2 * hw_in * hw_in * cin * width
    f += 2 * hw * hw * 9 * width * width
    f += 2 * hw * hw * width * width * 4
    f += 2 * hw * hw * cin * width * 4          # downsample
    for _ in range(blocks - 1):
        f += 2 * hw * hw * width * 4 * width
        f += 2 * hw * hw * 9 * width * width
        f += 2 * hw * hw * width * width * 4
    return f


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    # inner=40: jit dispatch through the RPC tunnel costs ~23 ms per call
    # (measured r04: 206 MB copy 3.04 ms/it at inner=10 vs 1.23 at 40);
    # at inner=10 every stage reads ~2.4 ms slow. True HBM bw ~650 GB/s.
    p.add_argument("--inner", type=int, default=40)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--pallas_conv", action="store_true",
                   help="route bottleneck stages through the fused Pallas "
                        "int8 conv kernel (requires --int8; measured "
                        "negative result, see DESIGN.md r04)")
    p.add_argument("--fused_stem", action="store_true",
                   help="use the fused stem Pallas kernel (bit-identical; "
                        "requires --int8)")
    p.add_argument("--ab", action="store_true",
                   help="run layout A/B microbenchmarks")
    p.add_argument("--stages", default="all")
    args = p.parse_args()
    _enable_cache()

    B = args.batch
    quant = "int8_static" if args.int8 else "none"
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    peak = 201e12 if args.int8 else 127e12  # measured MXU peaks (DESIGN.md)

    results = {}

    def report(name, secs, flops):
        results[name] = secs
        print(f"{name:10s}: {secs * 1e3:7.2f} ms/step "
              f"({B / secs:8.1f} imgs/s)  MXU {flops * B / secs / peak * 100:5.1f}%",
              flush=True)

    want = (set(args.stages.split(",")) if args.stages != "all"
            else {"pre", "stem", "l1", "l2", "l3", "l4", "pool", "full"})

    from icka_tpu.data.images import preprocess_images

    if "pre" in want:
        imgs = jax.device_put(
            rng.integers(0, 255, (B, 256, 256, 3)).astype(np.uint8))

        def step(px, imgs):
            return preprocess_images(imgs, jax.random.PRNGKey(0),
                                     crop_size=224,
                                     train=False) + dep(px)

        t = loop_time(step, jnp.zeros((B, 224, 224, 3), jnp.float32),
                      args.inner, args=(imgs,))
        report("preprocess", t, 0)

    if "stem" in want:
        stem = _Stem(dtype=dtype, quant=quant,
                     fused_pallas=args.pallas_conv or args.fused_stem)
        x = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), dtype)
        sv = stem.init(key, x)

        def step(out, sv, x):
            return stem.apply(sv, x + dep(out).astype(dtype))

        t = loop_time(step, jnp.zeros((B, 56, 56, 64), dtype),
                      args.inner, args=(sv, x))
        report("stem+pool", t, 2 * 112 * 112 * 49 * 3 * 64)

    stage_specs = {
        "l1": (64, 3, 1, 56, 64),      # width, blocks, stride, hw_in, cin
        "l2": (128, 8, 2, 56, 256),
        "l3": (256, 36, 2, 28, 512),
        "l4": (512, 3, 2, 14, 1024),
    }
    for name, (w, blk, s, hw, cin) in stage_specs.items():
        if name not in want:
            continue
        st = _Stage(width=w, blocks=blk, first_stride=s, dtype=dtype,
                    quant=quant, fused_pallas=args.pallas_conv,
                    g={56: 1, 28: 2, 14: 4, 7: 8}.get(hw // s, 1))
        x = jnp.asarray(rng.standard_normal((B, hw, hw, cin)), dtype)
        pv = st.init(key, x)
        out_hw = hw // s

        def step(out, pv, x, st=st):
            return st.apply(pv, x + dep(out).astype(dtype))

        t = loop_time(step, jnp.zeros((B, out_hw, out_hw, 4 * w), dtype),
                      args.inner, args=(pv, x))
        report(name, t, _stage_flops(cin, w, blk, hw, s))

    if "full" in want:
        from icka_tpu.models.resnet import VisualBackbone
        bb = VisualBackbone(layers=(3, 8, 36, 3), dtype=dtype, quant=quant,
                            fused_stem=args.fused_stem,
                            fused_pallas=args.pallas_conv)
        bv = bb.init(key, jnp.zeros((1, 224, 224, 3), dtype))
        imgs = jax.device_put(
            rng.integers(0, 255, (B, 256, 256, 3)).astype(np.uint8))

        def step(att, bv, imgs):
            px = preprocess_images(imgs, jax.random.PRNGKey(0),
                                   crop_size=224, train=False)
            _, _, att2 = bb.apply(bv, (px + dep(att)).astype(dtype))
            return att2.astype(jnp.float32)

        t = loop_time(step, jnp.zeros((B, 7, 7, 2048), jnp.float32),
                      args.inner, args=(bv, imgs))
        report("full", t, 2 * 11.5e9)

    staged = sum(v for k, v in results.items() if k != "full")
    if staged:
        print(f"\nsum of stages: {staged * 1e3:.2f} ms/step "
              f"({B / staged:.1f} imgs/s)")

    if args.ab:
        _ab_experiments(B, rng, args.inner)


def _ab_experiments(B, rng, inner):
    """Layout A/Bs at the hot shapes (int8)."""
    print("\n--- A/B microbenchmarks (int8 contractions) ---")

    def time_fn(fn, carry, fargs):
        return loop_time(fn, carry, inner, args=fargs)

    # L3 body conv 3x3: (B,14,14,256) -> (B,14,14,256)
    H, C = 14, 256
    x8 = jax.device_put(
        rng.integers(-127, 127, (B, H, H, C)).astype(np.int8))
    w8 = jax.device_put(
        rng.integers(-127, 127, (9 * C, C)).astype(np.int8))

    def patch_concat(out, x8, w8):
        d = jnp.where(out[0, 0, 0, 0] > 1e30, 1, 0).astype(jnp.int8)
        xp = jnp.pad(x8 + d, ((0, 0), (1, 1), (1, 1), (0, 0)))
        views = [xp[:, i:i + H, j:j + H, :] for i in range(3)
                 for j in range(3)]
        patches = jnp.concatenate(views, axis=-1)
        y = jax.lax.dot_general(patches, w8, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32)

    def tap_sum(out, x8, w8):
        d = jnp.where(out[0, 0, 0, 0] > 1e30, 1, 0).astype(jnp.int8)
        xp = jnp.pad(x8 + d, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for i in range(3):
            for j in range(3):
                v = xp[:, i:i + H, j:j + H, :]
                y = jax.lax.dot_general(
                    v, w8[(i * 3 + j) * C:(i * 3 + j + 1) * C],
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = y if acc is None else acc + y
        return acc.astype(jnp.float32)

    carry = jnp.zeros((B, H, H, C), jnp.float32)
    t1 = time_fn(patch_concat, carry, (x8, w8))
    t2 = time_fn(tap_sum, carry, (x8, w8))
    print(f"l3 3x3 conv  patch-concat: {t1 * 1e3:6.2f} ms   "
          f"tap-sum: {t2 * 1e3:6.2f} ms")

    # L1 body conv 3x3: (B,56,56,64) — sub-128 lanes
    H, C = 56, 64
    x8 = jax.device_put(
        rng.integers(-127, 127, (B, H, H, C)).astype(np.int8))
    w8 = jax.device_put(
        rng.integers(-127, 127, (9 * C, C)).astype(np.int8))
    carry = jnp.zeros((B, H, H, C), jnp.float32)
    t1 = time_fn(patch_concat, carry, (x8, w8))
    t2 = time_fn(tap_sum, carry, (x8, w8))
    print(f"l1 3x3 conv  patch-concat: {t1 * 1e3:6.2f} ms   "
          f"tap-sum: {t2 * 1e3:6.2f} ms")

    # stem: 7x7/s2 on (B,224,224,3) — im2col 147-ch patches vs
    # space-to-depth: x4 s2d -> (B,56,56,48), kernel becomes 2x2 over
    # 48ch taps (7x7 kernel padded to 8x8 then regrouped 4x4) = one
    # (B,56,56, 8*8*3=192) x (192, 64*4)... measured simplest variant:
    # s2d by 2 -> (B,112,112,12), conv 4x4 stride 1... full equivalence
    # is in the kernel; here just measure the matmul shapes.
    x8 = jax.device_put(
        rng.integers(-127, 127, (B, 230, 230, 3)).astype(np.int8))
    w8 = jax.device_put(
        rng.integers(-127, 127, (147, 64)).astype(np.int8))

    def stem_im2col(out, x8, w8):
        d = jnp.where(out[0, 0, 0, 0] > 1e30, 1, 0).astype(jnp.int8)
        xp = x8 + d
        views = [xp[:, i:i + 223:2, j:j + 223:2, :] for i in range(7)
                 for j in range(7)]
        patches = jnp.concatenate(views, axis=-1)       # (B,112,112,147)
        y = jax.lax.dot_general(patches, w8, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32)

    # space-to-depth factor 4: pad 224->232? 7x7 s2 kernel on s2d-4 input:
    # out(i,j) reads rows 2i-3..2i+3 -> within 4-row groups starting at
    # 2i-3: group index varies with parity; use factor-2 s2d (112x112x12,
    # kernel 4x4 stride 1 over parity-expanded weights = 16*12=192 taps)
    x8b = jax.device_put(
        rng.integers(-127, 127, (B, 116, 116, 12)).astype(np.int8))
    w8b = jax.device_put(
        rng.integers(-127, 127, (192, 64)).astype(np.int8))

    def stem_s2d(out, x8b, w8b):
        d = jnp.where(out[0, 0, 0, 0] > 1e30, 1, 0).astype(jnp.int8)
        xp = x8b + d
        views = [xp[:, i:i + 112, j:j + 112, :] for i in range(4)
                 for j in range(4)]
        patches = jnp.concatenate(views, axis=-1)       # (B,112,112,192)
        y = jax.lax.dot_general(patches, w8b, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32)

    carry = jnp.zeros((B, 112, 112, 64), jnp.float32)
    t1 = time_fn(stem_im2col, carry, (x8, w8))
    t2 = time_fn(stem_s2d, carry, (x8b, w8b))
    print(f"stem 7x7/s2  im2col-49tap: {t1 * 1e3:6.2f} ms   "
          f"s2d2-16tap: {t2 * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
