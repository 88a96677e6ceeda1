"""A/B: Pallas fused self-attention vs einsum per serving bucket.

The flagship serving default routes self-attention through the fused
Pallas kernel (`kernels/attention.py`) — a decision measured at seq
128/150 (identical at 128, 1.55x win at 150, DESIGN.md round 3). But the
bucketed engine spends ~95% of its traffic at seq 16-48, where the
kernel's one-batch-element-per-grid-step layout feeds the MXU tiny
(L, 64) x (64, L) per-head matmuls while the einsum path batches all
heads into one large contraction. This measures both modes per bucket so
`BucketedICKAServer` can route attention per bucket by measurement.

Run: python tools/ab_bucket_pallas.py [--buckets 16,24,32,48] [--batch 128]
     [--iters 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="16,24,32,48")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--quant", default="int8_static")
    ap.add_argument("--enc_layers", type=int, default=6,
                    help="encoder slice depth (6 = 1/4 of RoBERTa-large; "
                    "the pallas-vs-einsum verdict is per-layer, so a "
                    "slice answers it at 1/4 the compile cost — same "
                    "methodology as tools/profile_stages.py)")
    args = ap.parse_args()
    buckets = tuple(int(b) for b in args.buckets.split(","))

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from bench import _batch  # noqa: E402
    from icka_tpu.core.config import ICKAConfig  # noqa: E402
    from icka_tpu.models.icka import ICKAModel  # noqa: E402

    cfg0 = ICKAConfig()
    cfg0 = dataclasses.replace(
        cfg0,
        embedding=dataclasses.replace(
            cfg0.embedding, num_hidden_layers=args.enc_layers),
        last_encoder=dataclasses.replace(
            cfg0.last_encoder, num_hidden_layers=args.enc_layers))
    offset, mask_positions = 14, (3, 11)
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    models = {}
    for use_pallas in (True, False):
        rep = dict(use_pallas=use_pallas, quant=args.quant)
        cfg = dataclasses.replace(
            cfg0,
            embedding=dataclasses.replace(cfg0.embedding, **rep),
            last_encoder=dataclasses.replace(cfg0.last_encoder, **rep))
        models[use_pallas] = ICKAModel(cfg, dtype=dtype)

    init_b = _batch(cfg0, 2, offset, rng, 64)
    init_b.pop("images")
    init_b["visual_mean"] = np.zeros((2, cfg0.region_dim), np.float32)
    init_b["visual_grid"] = np.zeros((2, 7, 7, cfg0.region_dim), np.float32)
    # NOTE: with --quant int8_static these init params carry PLACEHOLDER
    # activation scales / quantized kernels (no calibration pass runs
    # here) — the timings are valid (same shapes/dtypes/program as a
    # calibrated tree) but decoded outputs are numerically meaningless.
    params = models[True].init(jax.random.PRNGKey(0), init_b,
                               mask_positions, offset, mode="test")

    def make_loop(model):
        def infer(params, batch, prev):
            idep = jnp.where(jnp.sum(prev) > jnp.int32(2 ** 30), 1, 0)
            mb = dict(batch)
            mb["ori_input_ids"] = batch["ori_input_ids"] + idep
            mb["input_ids"] = batch["input_ids"] + idep
            return model.apply(params, mb, mask_positions, offset,
                               mode="test")

        @partial(jax.jit, static_argnames=("n",))
        def infer_loop(params, batch, prev, n):
            return jax.lax.fori_loop(
                0, n, lambda i, p: infer(params, batch, p), prev)

        return infer_loop

    results = {}
    for L in buckets:
        b = _batch(cfg0, args.batch, offset, rng, 64, seq_len=L)
        b.pop("images", None)
        b["visual_mean"] = np.zeros((args.batch, cfg0.region_dim),
                                    np.float32)
        b["visual_grid"] = np.zeros((args.batch, 7, 7, cfg0.region_dim),
                                    np.float32)
        b = jax.device_put(b)
        for use_pallas in (True, False):
            loop = make_loop(models[use_pallas])
            prev = jnp.zeros((args.batch, L), jnp.int32)
            out = loop(params, b, prev, args.iters)
            np.asarray(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = loop(params, b, out, args.iters)
                np.asarray(out)
                best = min(best, (time.perf_counter() - t0) / args.iters)
            results[(L, use_pallas)] = best
            tag = "pallas" if use_pallas else "einsum"
            print(f"L={L:3d} {tag}: {best * 1e3:7.2f} ms/step  "
                  f"{args.batch / best:8.1f} pairs/s (encoders only)",
                  flush=True)

    print("\n| bucket | pallas ms | einsum ms | winner |")
    print("|---|---|---|---|")
    for L in buckets:
        tp, te = results[(L, True)], results[(L, False)]
        win = "einsum" if te < tp else "pallas"
        print(f"| L{L} | {tp * 1e3:.2f} | {te * 1e3:.2f} | {win} "
              f"({max(tp, te) / min(tp, te):.2f}x) |")


if __name__ == "__main__":
    main()
