"""Stage-by-stage TPU timing of the gate_cl serving pipeline (int8_static
or bf16) — answers where the gap to the 5,000 pairs/s north star lives.

Stages at serving shapes (batch 128, L=128, BERT-base):
    bert    — 12-layer encoder (the FLOP bulk)
    fusion  — txt2img CrossEncoder (layer_num1=1, q=128, kv=49)
    head    — vismap2text + crs_classifier + P-gate + classifier
    crf     — Viterbi decode (15 tags)

Run:  python tools/profile_gate_cl.py [--batch 128] [--int8] [--inner 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from profile_stages import _enable_cache, dep, loop_time  # noqa: E402

V5E_BF16 = 127e12     # measured practical bf16 matmul peak (DESIGN.md)
V5E_INT8 = 201e12     # measured int8 matmul peak


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--stages", default="all",
                   help="comma list: bert,fusion,head,crf")
    args = p.parse_args()
    _enable_cache()

    import dataclasses

    from icka_tpu.core.config import GateCLConfig
    from icka_tpu.nn.attention import CrossEncoder
    from icka_tpu.nn.bert import TextEncoder
    from icka_tpu.nn.crf import crf_decode
    from icka_tpu.nn.layers import Dense, additive_mask

    cfg = GateCLConfig()
    enc_cfg = cfg.encoder
    if args.int8:
        enc_cfg = dataclasses.replace(enc_cfg, quant="int8_static")
    B, L = args.batch, cfg.max_seq_length
    H = enc_cfg.hidden_size
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    want = set(args.stages.split(",")) if args.stages != "all" else {
        "bert", "fusion", "head", "crf"}
    peak = V5E_INT8 if args.int8 else V5E_BF16

    results = {}

    def report(name, secs, flops_per_pair):
        pairs = B / secs
        util = flops_per_pair * pairs / peak
        results[name] = secs
        print(f"{name:8s}: {secs * 1e3:7.2f} ms/step  {pairs:8.1f} pairs/s"
              f"  {flops_per_pair / 1e9:6.2f} GFLOP/pair"
              f"  MXU {util * 100:5.1f}%", flush=True)

    inter = enc_cfg.intermediate_size
    FL_BERT = enc_cfg.num_hidden_layers * (
        2 * (4 * H * H + 2 * H * inter) * L + 4 * L * L * H)
    FL_FUSION = cfg.layer_num1 * (2 * (4 * H * H) * L + 4 * L * 49 * H
                                  + 2 * 2 * H * inter * L)
    FL_HEAD = 2 * (49 * 2048 * H            # vismap2text
                   + L * 2 * H * 2          # crs (flattened, out=2)
                   + 2 * L * H * H          # two gate projections
                   + L * 2 * H * cfg.num_labels)

    if "bert" in want:
        te = TextEncoder(enc_cfg, with_pooler=True, dtype=dtype)
        ids = jax.device_put(
            rng.integers(2, enc_cfg.vocab_size, (B, L)).astype(np.int32))
        mask = jnp.ones((B, L), jnp.int32)
        tv = te.init(key, ids, mask, mask * 0)

        def step(seq, tv, ids):
            out, _ = te.apply(tv, ids + dep(seq).astype(jnp.int32),
                              mask, mask * 0)
            return out

        t = loop_time(step, jnp.zeros((B, L, H), dtype), args.inner,
                      args=(tv, ids))
        report("bert", t, FL_BERT)

    if "fusion" in want:
        ce = CrossEncoder(enc_cfg, cfg.layer_num1, dtype=dtype)
        q = jnp.asarray(rng.standard_normal((B, L, H)), dtype)
        kv = jnp.asarray(rng.standard_normal((B, 49, H)), dtype)
        cv = ce.init(key, q, kv, None)

        def step(x, cv, q, kv):
            return ce.apply(cv, q + dep(x).astype(dtype), kv, None)

        t = loop_time(step, q, args.inner, args=(cv, q, kv))
        report("fusion", t, FL_FUSION)

    if "head" in want:
        from flax import linen as nn

        class _Head(nn.Module):
            @nn.compact
            def __call__(self, seq, grid):
                g = Dense(H, dtype=dtype, name="vismap2text")(grid)
                cross = g.mean(1, keepdims=True) + seq      # stand-in mix
                crs = Dense(2, dtype=dtype, name="crs")(
                    jnp.concatenate([seq, cross], -1).reshape(B, -1))
                P = jax.nn.softmax(crs, -1)[:, -1][:, None, None]
                cross = P * cross
                gate = jax.nn.sigmoid(
                    Dense(H, dtype=dtype, name="gt")(seq)
                    + Dense(H, dtype=dtype, name="gi")(cross))
                final = jnp.concatenate([seq, gate * cross], -1)
                return Dense(cfg.num_labels, dtype=dtype,
                             name="cls")(final)

        head = _Head()
        seq = jnp.asarray(rng.standard_normal((B, L, H)), dtype)
        grid = jnp.asarray(rng.standard_normal((B, 49, cfg.region_dim)),
                           dtype)
        hv = head.init(key, seq, grid)

        def step(x, hv, seq, grid):
            return head.apply(hv, seq + dep(x).astype(dtype), grid)

        t = loop_time(step, jnp.zeros((B, L, cfg.num_labels), dtype),
                      args.inner, args=(hv, seq, grid))
        report("head", t, FL_HEAD)

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

    staged = sum(results.values())
    print(f"\nsum of stages: {staged * 1e3:.2f} ms/step "
          f"({B / staged:.1f} pairs/s at batch {B})")
    print(f"analytic bert+fusion: {(FL_BERT + FL_FUSION) / 1e9:.2f} "
          f"GFLOP/pair -> SoL {peak / (FL_BERT + FL_FUSION):.0f} pairs/s "
          f"at {'int8' if args.int8 else 'bf16'} practical peak")


if __name__ == "__main__":
    main()
