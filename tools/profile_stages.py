"""Stage-by-stage TPU timing of the flagship inference pipeline.

Answers VERDICT weak-#1: where do the 133 ms/step (batch 64) go? Each hot
stage is jitted standalone at the flagship's real shapes and timed as ONE
dispatch of `lax.fori_loop(K)` chained steps — per-call measurements through
the axon RPC tunnel are dominated by dispatch overhead (a first attempt at
per-call chained timing measured the stage SUM at 10× the full pipeline),
so only in-program loops give device truth here.

Run:  python tools/profile_stages.py [--batch 64] [--inner 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12  # TPU v5e (v5 lite) peak bf16 FLOP/s

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
    """Data-dependent zero scalar: forces sequential execution of chained
    steps without changing the math."""
    return jnp.where(jnp.sum(prev.astype(jnp.float32)) > 1e30, 1.0, 0.0)


def loop_time(step_fn, init_carry, inner: int, outer: int = 3, args=()):
    """step_fn: (carry, *args) -> carry. Returns seconds per step, measured
    as one jitted fori_loop(inner) per dispatch, best of `outer` dispatches.

    Two tunnel traps this encodes:
      - only a SCALAR reduction of the carry is fetched — pulling the full
        tensor through the RPC tunnel moves at ~40 MB/s and dwarfs device
        time;
      - params/weights MUST be passed via `args`, never closed over:
        jit embeds closed-over arrays as constants in the serialized
        program, and a big-encoder compile request then exceeds the remote
        compiler's body limit (HTTP 413)."""

    @jax.jit
    def run(carry, *a):
        out = jax.lax.fori_loop(
            0, inner, lambda i, c: step_fn(c, *a), carry)
        leaf = jax.tree.leaves(out)[0]
        return out, jnp.sum(leaf.astype(jnp.float32))

    carry, s = run(init_carry, *args)
    float(s)                                    # warmup incl. compile
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        carry, s = run(carry, *args)
        float(s)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--stages", default="all",
                   help="comma list: resnet,embed,last,fusion,lstm,crf")
    p.add_argument("--enc_layers", type=int, default=24,
                   help="encoder depth for embed/last stages — the remote "
                        "compile service dies on 24-layer fori_loop "
                        "programs, so measure a slice and scale by "
                        "24/enc_layers (per-layer cost is uniform)")
    p.add_argument("--int8", action="store_true",
                   help="profile the int8_static serving layout (encoder "
                        "projections + ResNet conv contractions W8A8, "
                        "calibrated activation scales)")
    p.add_argument("--pallas", action="store_true",
                   help="route encoder self-attention through the Pallas "
                        "fused kernel, as the serving pipeline does "
                        "(bench.py sets use_pallas=True on TPU) — without "
                        "this the embed/last stage numbers measure the "
                        "einsum path, NOT the serving path")
    args = p.parse_args()
    _enable_cache()

    from icka_tpu.core.config import ICKAConfig
    from icka_tpu.data.images import preprocess_images
    from icka_tpu.models.resnet import VisualBackbone
    from icka_tpu.nn.attention import CrossEncoder
    from icka_tpu.nn.bert import PromptSpliceEncoder, TextEncoder
    from icka_tpu.nn.crf import crf_decode
    from icka_tpu.nn.lstm import BiLSTM

    import dataclasses
    cfg = ICKAConfig()
    rep = {}
    if args.int8:
        rep["quant"] = "int8_static"
    if args.pallas:
        rep["use_pallas"] = True
    if rep:
        cfg = dataclasses.replace(
            cfg,
            embedding=dataclasses.replace(cfg.embedding, **rep),
            last_encoder=dataclasses.replace(cfg.last_encoder, **rep))
    enc_cfg = dataclasses.replace(cfg.embedding,
                                  num_hidden_layers=args.enc_layers)
    enc_scale = cfg.embedding.num_hidden_layers / args.enc_layers
    B = args.batch
    L = cfg.max_seq_length              # 128
    OFFSET = 14
    LP = OFFSET + L
    HID = cfg.embedding.hidden_size     # 1024
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    want = set(args.stages.split(",")) if args.stages != "all" else {
        "resnet", "embed", "last", "fusion", "lstm", "crf"}

    results = {}

    peak = 201e12 if args.int8 else V5E_PEAK_BF16  # measured int8 peak

    def report(name, secs, flops_per_pair):
        pairs = B / secs
        util = flops_per_pair * pairs / peak
        results[name] = secs
        print(f"{name:8s}: {secs * 1e3:7.2f} ms/step  {pairs:8.1f} pairs/s"
              f"  {flops_per_pair / 1e9:6.1f} GFLOP/pair"
              f"  MXU {util * 100:5.1f}%", flush=True)

    def enc_flops(layers, hidden, inter, seq):
        return layers * (2 * (4 * hidden * hidden + 2 * hidden * inter)
                         * seq + 4 * seq * seq * hidden)

    FL_EMBED = enc_flops(24, 1024, 4096, L)
    FL_LAST = enc_flops(24, 1024, 4096, LP - 2 + 10)
    FL_RESNET = 2 * 11.5e9
    FL_FUSION = 5 * (2 * (4 * HID * HID) * L + 4 * L * 49 * HID
                     + 2 * 2 * HID * 4 * HID * L)
    FL_ALIGN = 2 * 5 * (2 * (4 * HID * HID) + 4 * L * HID
                        + 2 * 2 * HID * 4 * HID)
    FL_LSTM = 2 * 2 * 2 * L * HID * 4 * HID

    if "resnet" in want:
        bb = VisualBackbone(layers=(3, 8, 36, 3), dtype=dtype,
                            quant="int8_static" if args.int8 else "none")
        bv = bb.init(key, jnp.zeros((1, 224, 224, 3), dtype))
        imgs = jax.device_put(rng.integers(0, 255, (B, 256, 256, 3))
                              .astype(np.uint8))

        def step(att, bv, imgs):
            px = preprocess_images(imgs, jax.random.PRNGKey(0),
                                   crop_size=224, train=False)
            _, _, att2 = bb.apply(bv, (px + dep(att)).astype(dtype))
            return att2.astype(jnp.float32)

        t = loop_time(step, jnp.zeros((B, 7, 7, 2048), jnp.float32),
                      args.inner, args=(bv, imgs))
        report("resnet", t, FL_RESNET)

    if "embed" in want:
        te = TextEncoder(enc_cfg, with_pooler=False, dtype=dtype)
        ids = jax.device_put(rng.integers(2, 50000, (B, L)).astype(np.int32))
        mask = jnp.ones((B, L), jnp.int32)
        tv = te.init(key, ids, mask, mask * 0)

        def step(seq, tv, ids):
            out, _ = te.apply(tv, ids + dep(seq).astype(jnp.int32),
                              mask, mask * 0)
            return out

        t = loop_time(step, jnp.zeros((B, L, HID), dtype), args.inner,
                      args=(tv, ids))
        report("embed", t * enc_scale, FL_EMBED)

    if "last" in want:
        pe = PromptSpliceEncoder(enc_cfg, dtype=dtype)
        ids = jax.device_put(rng.integers(2, 50000, (B, LP))
                             .astype(np.int32))
        mask = jnp.ones((B, LP), jnp.int32)
        segs = jnp.concatenate([jnp.zeros((B, OFFSET), jnp.int32),
                                jnp.ones((B, L), jnp.int32)], 1)
        prefix = jnp.zeros((B, 10, HID), dtype)
        pmask = jnp.ones((B, 10), jnp.int32)
        pv = pe.init(key, ids, mask, segs, prefix, pmask, (3, 11))

        def step(out, pv, ids, prefix):
            o, _ = pe.apply(pv, ids, mask, segs,
                            prefix + dep(out).astype(dtype), pmask, (3, 11))
            return o

        t = loop_time(step, jnp.zeros((B, LP - 2 + 10, HID), dtype),
                      args.inner, args=(pv, ids, prefix))
        report("last", t * enc_scale, FL_LAST)

    if "fusion" in want:
        ce = CrossEncoder(cfg.embedding, cfg.layer_num1, dtype=dtype)
        q = jnp.asarray(rng.standard_normal((B, L, HID)), dtype)
        kv = jnp.asarray(rng.standard_normal((B, 49, HID)), dtype)
        cv = ce.init(key, q, kv, None)

        def step(x, cv, q, kv):
            return ce.apply(cv, q + dep(x).astype(dtype), kv, None)

        t = loop_time(step, q, args.inner, args=(cv, q, kv))
        report("fusion5", t, FL_FUSION)

    if "lstm" in want:
        lstm = BiLSTM(hidden=HID, dtype=dtype,
                      quant="int8_static" if args.int8 else "none")
        x = jnp.asarray(rng.standard_normal((B, L, HID)), dtype)
        lv = lstm.init(key, x)

        def step(out, lv, x):
            return lstm.apply(lv, x + dep(out).astype(dtype))

        t = loop_time(step, jnp.zeros((B, L, 2 * HID), dtype), args.inner,
                      args=(lv, x))
        report("lstm", t, FL_LSTM)

    if "crf" in want:
        em = jnp.asarray(rng.standard_normal((B, L, cfg.num_labels)),
                         jnp.float32)
        mask = jnp.ones((B, L), jnp.int32)
        z = jnp.zeros(cfg.num_labels)
        trans = jnp.zeros((cfg.num_labels, cfg.num_labels))

        def step(tags, em):
            return crf_decode(em + dep(tags), mask, z, z, trans)

        t = loop_time(step, jnp.zeros((B, L), jnp.int32), args.inner,
                      args=(em,))
        report("crf", t, 0.0)

    total = FL_EMBED + FL_LAST + FL_RESNET + FL_FUSION + FL_ALIGN + FL_LSTM
    print(f"\nanalytic total: {total / 1e9:.1f} GFLOP/pair "
          f"-> speed-of-light {V5E_PEAK_BF16 / total:.0f} pairs/s"
          f" on v5e bf16")
    staged = sum(results.values())
    print(f"sum of stages: {staged * 1e3:.2f} ms/step "
          f"({B / staged:.1f} pairs/s)")


if __name__ == "__main__":
    main()
