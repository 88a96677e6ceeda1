"""A/B: ResNet l1 stage in space-to-depth-2 layout vs the production
im2col path (VERDICT r04 next #2).

The r4 stage profile has l1 at 5.47 ms / 15.5% MXU (B=128): every l1
matmul has a 64-wide (sub-lane) output or contraction dim. The s2d trick
that fixed the stem (13.1 → 4.3 ms) is a LAYOUT change, not an
arithmetic change — this experiment applies it to l1:

  x (B,56,56,64) → s2d2 → (B,28,28,256), then
  - 1×1 convs become block-diagonal (4·Cin, 4·Cout) matmuls
    (kron(I₄, W) — 4× dense MACs, zeros included);
  - the 3×3/s1 conv2 becomes a DENSE 3×3 conv over the 28² cell grid
    with a (2304, 256) scattered weight (each original tap lands in
    exactly one (cell, sub-pos) slot; 4× dense MACs);
  - epilogues (int8 dequant scales, biases) tile ×4 per sub-position;
  - un-s2d after block 3 restores (B,56,56,256).

Integer accumulation makes the rewrite BIT-EXACT on the int8_static
path (zero weights contribute int32 zeros): asserted here before
timing. The bet: 4× dense MACs at full 128-lane tiles beats 1× MACs at
15.5% utilization. The measured answer is recorded in DESIGN.md either
way.

Usage: python tools/ab_l1_s2d.py [--batch 128] [--iters 32]
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

# l1 of ResNet-152: 3 bottlenecks, width 64, expansion 4, stride 1
WIDTH, EXP, BLOCKS = 64, 4, 3


# ---------------------------------------------------------------- weights

def rand_block_weights(rng, cin):
    """int8_static-style params for one bottleneck (im2col layout)."""
    def conv(cin, cout, k):
        return {
            "wq": rng.integers(-127, 128, (k * k * cin, cout))
            .astype(np.int8),
            "w_scale": rng.uniform(1e-4, 1e-3, cout).astype(np.float32),
            "bias": rng.normal(0, 0.1, cout).astype(np.float32),
            "a_scale": np.float32(rng.uniform(0.01, 0.03)),
        }
    w = {"conv1": conv(cin, WIDTH, 1), "conv2": conv(WIDTH, WIDTH, 3),
         "conv3": conv(WIDTH, WIDTH * EXP, 1)}
    if cin != WIDTH * EXP:
        w["downsample"] = conv(cin, WIDTH * EXP, 1)
    return w


def s2d_1x1(w):
    """(Cin, Cout) int8 → block-diagonal (4Cin, 4Cout)."""
    cin, cout = w.shape
    out = np.zeros((4 * cin, 4 * cout), np.int8)
    for p in range(4):
        out[p * cin:(p + 1) * cin, p * cout:(p + 1) * cout] = w
    return out


def s2d_3x3(wmat, cin, cout):
    """(9·Cin, Cout) im2col int8 (taps i-major) → dense s2d-2 cell conv
    (9·4Cin, 4Cout), taps ci-major, in-channel order (ra, rb, ic),
    out-channel order (a, b, oc)."""
    w = wmat.reshape(3, 3, cin, cout)
    out = np.zeros((3, 3, 4 * cin, 4 * cout), np.int8)
    for a in range(2):
        for b in range(2):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    ci, ra = (a + di) // 2, (a + di) % 2
                    cj, rb = (b + dj) // 2, (b + dj) % 2
                    out[ci + 1, cj + 1,
                        (ra * 2 + rb) * cin:(ra * 2 + rb + 1) * cin,
                        (a * 2 + b) * cout:(a * 2 + b + 1) * cout] = \
                        w[di + 1, dj + 1]
    return out.reshape(9 * 4 * cin, 4 * cout)


def s2d_params(w):
    out = {}
    for name, c in w.items():
        cin = c["wq"].shape[0] if name != "conv2" else WIDTH
        cout = c["wq"].shape[1]
        out[name] = {
            "wq": (s2d_3x3(c["wq"], cin, cout) if name == "conv2"
                   else s2d_1x1(c["wq"])),
            "w_scale": np.tile(c["w_scale"], 4),
            "bias": np.tile(c["bias"], 4),
            "a_scale": c["a_scale"],
        }
    return out


# ---------------------------------------------------------------- forward

def quant(x, a_s):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / a_s),
                    -127, 127).astype(jnp.int8)


def conv_im2col(x, c, k, dtype=jnp.bfloat16):
    """The production ConvBN int8_static math (resnet.py:141-164)."""
    xd = quant(x, c["a_scale"])
    if k == 1:
        y = jax.lax.dot_general(xd, c["wq"], (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    else:
        pad = k // 2
        xp = jnp.pad(xd, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        H = x.shape[1]
        views = [xp[:, i:i + H, j:j + H, :]
                 for i in range(k) for j in range(k)]
        patches = jnp.concatenate(views, axis=-1)
        y = jax.lax.dot_general(patches, c["wq"], (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * (c["a_scale"] * c["w_scale"])) \
        .astype(dtype)
    return y + c["bias"].astype(dtype)


def block(x, w, k2=3):
    out = jax.nn.relu(conv_im2col(x, w["conv1"], 1))
    out = jax.nn.relu(conv_im2col(out, w["conv2"], k2))
    out = conv_im2col(out, w["conv3"], 1)
    sc = conv_im2col(x, w["downsample"], 1) if "downsample" in w else x
    return jax.nn.relu(out + sc)


def l1_baseline(x, weights):
    for w in weights:
        x = block(x, w)
    return x


def s2d2(x):
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def un_s2d2(x):
    B, H, W, C = x.shape
    return x.reshape(B, H, W, 2, 2, C // 4) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C // 4)


def l1_s2d(x, weights_s2d):
    x = s2d2(x)
    for w in weights_s2d:
        x = block(x, w)
    return un_s2d2(x)


# ---------------------------------------------------------------- harness

def time_fn(fn, x0, iters):
    """Chained loop; a SCALAR checksum is fetched (jax.block_until_ready
    does not force completion through the axon tunnel — r5 finding)."""
    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(i, p):
            o = fn(p)
            # renormalize into a stable activation range; cost identical
            # across variants
            return (x + o[..., :x.shape[-1]]
                    / (jnp.max(jnp.abs(o.astype(jnp.float32))) + 1.0)
                    ).astype(x.dtype)
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out.astype(jnp.float32))

    float(loop(x0, iters))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x0, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--check_batch", type=int, default=2)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    weights = [rand_block_weights(rng, WIDTH if b == 0 else WIDTH * EXP)
               for b in range(BLOCKS)]
    # first block of real l1 takes the 64-ch stem output
    weights[0] = rand_block_weights(np.random.default_rng(1), 64)
    w_s2d = [s2d_params(w) for w in weights]
    jw = jax.device_put(jax.tree.map(jnp.asarray, weights))
    jw2 = jax.device_put(jax.tree.map(jnp.asarray, w_s2d))

    # ---- bit-exactness (small batch) ----
    xs = jnp.asarray(rng.standard_normal(
        (args.check_batch, 56, 56, 64)), jnp.bfloat16)
    want = jax.jit(l1_baseline)(xs, jw)
    got = jax.jit(l1_s2d)(xs, jw2)
    same = bool(jnp.all(want == got))
    print(f"# bit-exact: {same}")
    assert same, "s2d rewrite is not bit-exact"

    # ---- timing ----
    x = jnp.asarray(rng.standard_normal(
        (args.batch, 56, 56, 64)), jnp.bfloat16)
    t_base = time_fn(lambda v: l1_baseline(v, jw), x, args.iters)
    t_s2d = time_fn(lambda v: l1_s2d(v, jw2), x, args.iters)
    print(f"# l1 baseline (im2col): {t_base:.2f} ms/step (B={args.batch})")
    print(f"# l1 s2d-2 dense:       {t_s2d:.2f} ms/step "
          f"({t_s2d / t_base:.2f}x)")


if __name__ == "__main__" and not os.environ.get("L1_EXTRA"):
    main()


# -------- additional arms (r5): traffic-reduction variants ---------------
# The s2d result (4x dense MACs -> only +31% time) proves l1 is NOT
# MXU-tile-bound: it is activation-traffic/epilogue-bound. These arms
# attack traffic instead of tiles.

def conv3x3_taps(x, c, dtype=jnp.bfloat16):
    """conv2 as the SUM of 9 shifted (M, Cin)@(Cin, Cout) dots — no
    (B, H, W, 9*Cin) patch concat materialized in HBM (the im2col path
    writes+rereads ~231 MB per l1 conv2 at B=128)."""
    xd = quant(x, c["a_scale"])
    xp = jnp.pad(xd, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H = x.shape[1]
    cin = x.shape[-1]
    w = c["wq"].reshape(3, 3, cin, -1)
    y = None
    for i in range(3):
        for j in range(3):
            t = jax.lax.dot_general(
                xp[:, i:i + H, j:j + H, :], w[i, j],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = t if y is None else y + t
    y = (y.astype(jnp.float32) * (c["a_scale"] * c["w_scale"])) \
        .astype(dtype)
    return y + c["bias"].astype(dtype)


def block_taps(x, w):
    out = jax.nn.relu(conv_im2col(x, w["conv1"], 1))
    out = jax.nn.relu(conv3x3_taps(out, w["conv2"]))
    out = conv_im2col(out, w["conv3"], 1)
    sc = conv_im2col(x, w["downsample"], 1) if "downsample" in w else x
    return jax.nn.relu(out + sc)


def l1_taps(x, weights):
    for w in weights:
        x = block_taps(x, w)
    return x


def conv_bf16(x, c, k, dtype=jnp.bfloat16):
    """bf16 arm: same weights dequantized offline — drops the per-conv
    activation round/clip passes at 2x matmul input bytes."""
    w = (c["wq"].astype(jnp.float32) * c["w_scale"]).astype(dtype)
    xd = x.astype(dtype)
    if k == 1:
        y = jax.lax.dot_general(xd, w, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    else:
        pad = k // 2
        xp = jnp.pad(xd, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        H = x.shape[1]
        views = [xp[:, i:i + H, j:j + H, :]
                 for i in range(k) for j in range(k)]
        patches = jnp.concatenate(views, axis=-1)
        y = jax.lax.dot_general(patches, w, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    # a_scale folded: weights were calibrated against quantized x; the
    # bf16 arm times the traffic shape, numerics differ (timing arm only)
    return y.astype(dtype) + c["bias"].astype(dtype)


def block_bf16(x, w):
    out = jax.nn.relu(conv_bf16(x, w["conv1"], 1))
    out = jax.nn.relu(conv_bf16(out, w["conv2"], 3))
    out = conv_bf16(out, w["conv3"], 1)
    sc = conv_bf16(x, w["downsample"], 1) if "downsample" in w else x
    return jax.nn.relu(out + sc)


def l1_bf16(x, weights):
    for w in weights:
        x = block_bf16(x, w)
    return x


def main_extra():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=32)
    args, _ = p.parse_known_args()

    rng = np.random.default_rng(0)
    weights = [rand_block_weights(rng, WIDTH if b == 0 else WIDTH * EXP)
               for b in range(BLOCKS)]
    jw = jax.device_put(jax.tree.map(jnp.asarray, weights))

    # exactness: taps == im2col (identical int32 accumulation up to
    # summation order — integer adds commute exactly)
    xs = jnp.asarray(rng.standard_normal((2, 56, 56, 64)), jnp.bfloat16)
    want = jax.jit(l1_baseline)(xs, jw)
    got = jax.jit(l1_taps)(xs, jw)
    print(f"# taps bit-exact: {bool(jnp.all(want == got))}")

    x = jnp.asarray(rng.standard_normal(
        (args.batch, 56, 56, 64)), jnp.bfloat16)
    t_base = time_fn(lambda v: l1_baseline(v, jw), x, args.iters)
    t_taps = time_fn(lambda v: l1_taps(v, jw), x, args.iters)
    t_bf16 = time_fn(lambda v: l1_bf16(v, jw), x, args.iters)
    print(f"# l1 baseline (im2col): {t_base:.2f} ms/step (B={args.batch})")
    print(f"# l1 9-shifted-dots:    {t_taps:.2f} ms/step "
          f"({t_taps / t_base:.2f}x)")
    print(f"# l1 bf16 (no quant):   {t_bf16:.2f} ms/step "
          f"({t_bf16 / t_base:.2f}x)")


if __name__ == "__main__" and os.environ.get("L1_EXTRA"):
    main_extra()
