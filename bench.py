"""Headline benchmark: multimodal NER inference throughput on one chip.

Measures the flagship ICKA pipeline end to end — uint8 images → device-side
preprocess → ResNet-152 → cross-modal fusion → prompt RoBERTa-large →
BiLSTM → CRF Viterbi — as ONE jitted XLA program at bf16, and reports
image+sentence pairs/sec/chip against the BASELINE.json north star
(≥5,000 pairs/sec/chip on TPU v5e).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N/5000}

Usage:
    python bench.py                 # full-size flagship, TPU
    python bench.py --quick         # reduced model/iters (CPU smoke)
    python bench.py --model gate_cl # BERT-base fusion family instead
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAIRS_PER_SEC = 5000.0


def _batch(cfg, B, offset, rng, image_size=256, seq_len=None):
    import numpy as np

    L = seq_len or cfg.max_seq_length
    Lp = offset + L
    vocab = cfg.embedding.vocab_size
    return {
        "input_ids": rng.integers(2, vocab, (B, Lp)).astype(np.int32),
        "segment_ids": np.concatenate(
            [np.zeros((B, offset), np.int32), np.ones((B, L), np.int32)], 1),
        "input_mask": np.ones((B, Lp), np.int32),
        "ori_input_ids": rng.integers(2, vocab, (B, L)).astype(np.int32),
        "ori_input_mask": np.ones((B, L), np.int32),
        "ori_segment_ids": np.zeros((B, L), np.int32),
        "img_mask": np.ones((B, cfg.num_regions), np.int32),
        "clip_features": rng.standard_normal((B, 1, cfg.clip_dim))
        .astype(np.float32),
        "output_mask": np.ones((B, L), np.int32),
        "images": rng.integers(0, 255, (B, image_size, image_size, 3))
        .astype(np.uint8),
    }


def _bucket_shares(buckets, median: float = 22.0):
    """Bucket shares of the documented tweet-length distribution at a
    given lognormal median (22.0 = the documented point estimate)."""
    import numpy as np

    from icka_tpu.serving.bucketed import pick_bucket, sample_tweet_lengths

    lens = sample_tweet_lengths(100_000, np.random.default_rng(11),
                                max_len=buckets[-1], median=median)
    share = {b: 0.0 for b in buckets}
    for ln in lens:
        share[pick_bucket(int(ln), buckets)] += 1.0 / len(lens)
    return share


def _weighted_throughput(buckets, step_time, batch_of, median=22.0):
    share = _bucket_shares(buckets, median)
    return 1.0 / sum(share[b] * step_time[b] / batch_of(b) for b in buckets)


def _sensitivity_rows(buckets, step_time, batch_of):
    """VERDICT r03 next #7: the length distribution is assumed, so the
    weighted headline carries a ±20%-median sensitivity band computed from
    the SAME measured per-bucket step times (re-weighting only)."""
    return {
        "median_x0.8": round(
            _weighted_throughput(buckets, step_time, batch_of, 17.6), 1),
        "median_x1.2": round(
            _weighted_throughput(buckets, step_time, batch_of, 26.4), 1),
    }


def _enable_compile_cache():
    """Persistent XLA compilation cache — the flagship program takes tens of
    minutes to compile through the device tunnel; cache it across runs."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def bench_icka(quick: bool, batch_sizes, iters: int, pallas: bool = False,
               int8: bool = False, quant_mode: str = "int8",
               fuse_qkv: bool = None, softmax_bf16: bool = None):
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from icka_tpu.core.config import EncoderConfig, ICKAConfig
    from icka_tpu.data.images import preprocess_images
    from icka_tpu.models.icka import ICKAModel
    from icka_tpu.models.resnet import VisualBackbone

    if quick:
        enc = EncoderConfig(vocab_size=1024, hidden_size=256,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=512)
        cfg = ICKAConfig(embedding=enc, last_encoder=enc, layer_num1=2,
                         clip_dim=128, prompt_hidden=128, last_hidden=256,
                         max_seq_length=64)
        resnet_layers = (1, 1, 1, 1)
        image_size = 64
    else:
        cfg = ICKAConfig()           # roberta-large dual encoders
        resnet_layers = (3, 8, 36, 3)
        image_size = 256
    if pallas or int8:
        rep = dict(use_pallas=pallas)
        if int8:
            rep["quant"] = quant_mode
        # serving-layout components are A/B-able independently
        # (--fuse_qkv/--no_fuse_qkv etc). Measured defaults for the
        # flagship (r03 A/B at batch 128, int8_static + Pallas):
        # fused QKV 559.8 pairs/s vs unfused 586 — the (1024,3072)
        # fused projection LOSES to three (1024,1024) matmuls XLA can
        # overlap, so the flagship default is unfused; bf16 softmax
        # rides along only where measured to help.
        if fuse_qkv:
            rep["fuse_qkv"] = True
        if softmax_bf16:
            rep["softmax_dtype"] = "bfloat16"
        cfg = dataclasses.replace(
            cfg,
            embedding=dataclasses.replace(cfg.embedding, **rep),
            last_encoder=dataclasses.replace(cfg.last_encoder, **rep))

    dtype = jnp.bfloat16
    model = ICKAModel(cfg, dtype=dtype)
    backbone = VisualBackbone(layers=resnet_layers, dtype=dtype,
                              quant=quant_mode if int8 else "none")
    offset, mask_positions = 14, (3, 11)
    rng = np.random.default_rng(0)

    init_b = _batch(cfg, 2, offset, rng, image_size)
    images = init_b.pop("images")
    init_b["visual_mean"] = np.zeros((2, cfg.region_dim), np.float32)
    init_b["visual_grid"] = np.zeros((2, 7, 7, cfg.region_dim), np.float32)
    params = model.init(jax.random.PRNGKey(0), init_b, mask_positions,
                        offset, mode="test")
    crop = min(224, image_size)
    bvars = backbone.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, crop, crop, 3), dtype))

    def infer(params, bvars, batch, prev):
        # `prev` (the previous step's decode output) feeds a runtime-data-
        # dependent zero into EVERY pipeline entry point (pixels, token
        # ids): a stage with no dep is loop-invariant and XLA hoists it out
        # of the timing loop — measuring a pipeline minus its encoders.
        dep = jnp.where(jnp.sum(prev) > jnp.int32(2 ** 30), 1.0, 0.0)
        idep = dep.astype(jnp.int32)
        pixels = preprocess_images(batch["images"],
                                   jax.random.PRNGKey(0),
                                   crop_size=crop, train=False)
        pooled, mean, att = backbone.apply(bvars,
                                           (pixels + dep).astype(dtype))
        mb = {k: v for k, v in batch.items() if k != "images"}
        mb["ori_input_ids"] = batch["ori_input_ids"] + idep
        mb["input_ids"] = batch["input_ids"] + idep
        mb["visual_mean"] = mean.astype(jnp.float32)
        mb["visual_grid"] = att
        return model.apply(params, mb, mask_positions, offset, mode="test")

    # ALL chained iterations run inside ONE jitted fori_loop: per-call
    # dispatch through the axon RPC tunnel costs tens of ms (round-2
    # stage profiling measured python-chained stage sums at 10x the full
    # pipeline), so only an in-program loop times the chip rather than
    # the tunnel. A production host dispatches asynchronously at ~100 us
    # and overlaps, so device time per step IS the serving number.
    @partial(jax.jit, static_argnames=("n",))
    def infer_loop(params, bvars, batch, prev, n):
        return jax.lax.fori_loop(
            0, n, lambda i, p: infer(params, bvars, batch, p), prev)

    best = 0.0
    best_bs = 0
    for B in batch_sizes:
        batch = _batch(cfg, B, offset, rng, image_size)
        batch = jax.device_put(batch)
        prev = jnp.zeros((B, cfg.max_seq_length), jnp.int32)
        out = infer_loop(params, bvars, batch, prev, iters)
        np.asarray(out)  # full warmup incl. host fetch
        step = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = infer_loop(params, bvars, batch, out, iters)
            np.asarray(out)
            step = min(step, (time.perf_counter() - t0) / iters)
        pairs = B / step
        print(f"# batch={B}: {pairs:.1f} pairs/s "
              f"({step * 1e3:.1f} ms/step, {iters}-step loop)",
              file=sys.stderr)
        if pairs > best:
            best, best_bs = pairs, B
    return best, best_bs


def bench_icka_bucketed(quick: bool, iters: int,
                        quant_mode: str = "int8_static",
                        buckets_override: tuple | None = None,
                        batch_override: int | None = None):
    """Length-bucketed flagship serving (icka_tpu.serving rationale): both
    RoBERTa stacks scale with token count (~167 of the 215 GFLOP/pair),
    while ResNet-152 is the per-pair floor. Buckets share one parameter
    tree (the flagship is length-stable); weighting follows
    `sample_tweet_lengths` — see bench_gate_cl_bucketed."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from icka_tpu.core.config import EncoderConfig, ICKAConfig
    from icka_tpu.data.images import preprocess_images
    from icka_tpu.models.icka import ICKAModel
    from icka_tpu.models.resnet import VisualBackbone

    if quick:
        enc = EncoderConfig(vocab_size=1024, hidden_size=256,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=512)
        cfg = ICKAConfig(embedding=enc, last_encoder=enc, layer_num1=2,
                         clip_dim=128, prompt_hidden=128, last_hidden=256,
                         max_seq_length=64)
        resnet_layers, image_size = (1, 1, 1, 1), 64
        buckets, batch = (32, 64), 8
    else:
        cfg = ICKAConfig()
        resnet_layers, image_size = (3, 8, 36, 3), 256
        # fine buckets beat (32, 64, 128) by ~11% weighted here (less than
        # gate_cl's ~17%: ResNet-152 is a length-independent 37 ms floor)
        buckets, batch = (16, 24, 32, 48, 64, 128), 128
    if buckets_override:
        buckets = tuple(sorted(buckets_override))
    if batch_override:
        batch = batch_override
    # unlike gate_cl, larger short-bucket batches do NOT pay here: every
    # flagship stage (incl. ResNet at ~37 ms/128 images) scales with
    # batch, and 128 already saturates it (L16: 1611 pairs/s @ 256 vs
    # 1675 @ 128, measured r03) — all buckets serve at one batch size.
    # unfused QKV: the serving-layout A/B (batch 128, int8_static+Pallas)
    # measured fused (H,3H) projections at 559.8 pairs/s vs 585.6 unfused
    # for the H=1024 flagship encoders, so the flagship serves unfused.
    rep = dict(use_pallas=jax.default_backend() == "tpu", quant=quant_mode)
    cfg = dataclasses.replace(
        cfg,
        embedding=dataclasses.replace(cfg.embedding, **rep),
        last_encoder=dataclasses.replace(cfg.last_encoder, **rep))

    dtype = jnp.bfloat16
    model = ICKAModel(cfg, dtype=dtype)
    backbone = VisualBackbone(layers=resnet_layers, dtype=dtype,
                              quant=quant_mode)
    offset, mask_positions = 14, (3, 11)
    rng = np.random.default_rng(0)

    init_b = _batch(cfg, 2, offset, rng, image_size)
    init_b.pop("images")
    init_b["visual_mean"] = np.zeros((2, cfg.region_dim), np.float32)
    init_b["visual_grid"] = np.zeros((2, 7, 7, cfg.region_dim), np.float32)
    params = model.init(jax.random.PRNGKey(0), init_b, mask_positions,
                        offset, mode="test")
    crop = min(224, image_size)
    bvars = backbone.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, crop, crop, 3), dtype))

    def infer(params, bvars, batch, prev):
        dep = jnp.where(jnp.sum(prev) > jnp.int32(2 ** 30), 1.0, 0.0)
        idep = dep.astype(jnp.int32)
        pixels = preprocess_images(batch["images"],
                                   jax.random.PRNGKey(0),
                                   crop_size=crop, train=False)
        pooled, mean, att = backbone.apply(bvars,
                                           (pixels + dep).astype(dtype))
        mb = {k: v for k, v in batch.items() if k != "images"}
        mb["ori_input_ids"] = batch["ori_input_ids"] + idep
        mb["input_ids"] = batch["input_ids"] + idep
        mb["visual_mean"] = mean.astype(jnp.float32)
        mb["visual_grid"] = att
        return model.apply(params, mb, mask_positions, offset, mode="test")

    @partial(jax.jit, static_argnames=("n",))
    def infer_loop(params, bvars, batch, prev, n):
        return jax.lax.fori_loop(
            0, n, lambda i, p: infer(params, bvars, batch, p), prev)

    share = _bucket_shares(buckets)

    step_time = {}
    for L in buckets:
        b = jax.device_put(_batch(cfg, batch, offset, rng, image_size,
                                  seq_len=L))
        prev = jnp.zeros((batch, L), jnp.int32)
        out = infer_loop(params, bvars, b, prev, iters)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = infer_loop(params, bvars, b, out, iters)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        step_time[L] = best
        print(f"# icka bucket L={L}: {batch / best:.1f} pairs/s "
              f"({best * 1e3:.1f} ms/step, share {share[L]:.3f})",
              file=sys.stderr)

    weighted = _weighted_throughput(buckets, step_time, lambda b: batch)
    detail = {f"L{b}": round(batch / step_time[b], 1) for b in buckets}
    detail["shares"] = {f"L{b}": round(share[b], 4) for b in buckets}
    detail["sensitivity"] = _sensitivity_rows(buckets, step_time,
                                              lambda b: batch)
    print(f"# icka bucketed weighted: {weighted:.1f} pairs/s "
          f"(buckets {buckets}, batch {batch}, "
          f"sensitivity {detail['sensitivity']})", file=sys.stderr)
    return weighted, detail


def bench_gate_cl(quick: bool, batch_sizes, iters: int,
                  pallas: bool = False, int8: bool = False,
                  quant_mode: str = "int8"):
    """BERT-base gated-fusion family (BASELINE config 4): single encoder +
    txt2img fusion + gate + CRF decode — the high-throughput config."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    import time as _t

    from icka_tpu.core.config import EncoderConfig, GateCLConfig
    from icka_tpu.models.gate_cl import GateCLModel

    if quick:
        enc = EncoderConfig(vocab_size=1024, hidden_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=256, position_offset=0,
                            pad_token_id=0, layer_norm_eps=1e-12)
        cfg = GateCLConfig(encoder=enc, region_dim=64, max_seq_length=32)
    else:
        cfg = GateCLConfig()      # BERT-base dims
    if pallas or int8:
        rep = dict(use_pallas=pallas)
        if int8:
            rep["quant"] = quant_mode
        if int8 and quant_mode == "int8_static":
            rep["fuse_qkv"] = True          # serving layout (see bench_icka)
            rep["softmax_dtype"] = "bfloat16"
        cfg = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, **rep))

    # Device-dispatch overhead through the RPC tunnel measures ~23 ms per
    # jit dispatch (r04 scaling probe: 206 MB copy = 3.04 ms/it at
    # inner=10 vs 1.23 ms/it at inner=40 -> fixed ~23 ms + true ~650 GB/s
    # HBM). Short-step benches must amortize it over enough chained
    # iterations or every step reads ~2.4 ms slow.
    if not quick:
        iters = max(iters, 64)
    dtype = jnp.bfloat16
    model = GateCLModel(cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    L = cfg.max_seq_length

    def make(B):
        return (
            rng.integers(2, cfg.encoder.vocab_size, (B, L))
            .astype(np.int32),
            np.zeros((B, L), np.int32),
            np.ones((B, L), np.int32),
            np.ones((B, cfg.num_regions), np.int32),
            rng.standard_normal((B, cfg.region_dim)).astype(np.float32),
            rng.standard_normal((B, 7, 7, cfg.region_dim))
            .astype(np.float32),
        )

    args0 = make(2)
    params = model.init(jax.random.PRNGKey(0), *args0)

    def infer(p, ids, seg, mask, imask, vmean, vgrid, prev):
        # dep must reach every entry point or XLA hoists the un-chained
        # stage out of the timing loop (see bench_icka)
        dep = jnp.where(jnp.sum(prev) > jnp.int32(2 ** 30), 1.0, 0.0)
        return model.apply(p, ids + dep.astype(jnp.int32), seg, mask,
                           imask, vmean + dep, vgrid + dep)

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("n",))
    def infer_loop(p, ids, seg, mask, imask, vmean, vgrid, prev, n):
        return jax.lax.fori_loop(
            0, n,
            lambda i, pr: infer(p, ids, seg, mask, imask, vmean, vgrid, pr),
            prev)

    best, best_bs = 0.0, 0
    for B in batch_sizes:
        a = jax.device_put(make(B))   # keep inputs in HBM (see bench_icka)
        prev = jnp.zeros((B, L), jnp.int32)
        out = infer_loop(params, *a, prev, iters)
        np.asarray(out)
        step = float("inf")
        for _ in range(3):
            t0 = _t.perf_counter()
            out = infer_loop(params, *a, out, iters)
            np.asarray(out)
            step = min(step, (_t.perf_counter() - t0) / iters)
        pairs = B / step
        print(f"# gate_cl batch={B}: {pairs:.1f} pairs/s "
              f"({step * 1e3:.1f} ms/step, {iters}-step loop)",
              file=sys.stderr)
        if pairs > best:
            best, best_bs = pairs, B
    return best, best_bs


def bench_gate_cl_packed(quick: bool, iters: int,
                         int8: bool = True,
                         quant_mode: str = "int8_static",
                         row_len: int | None = None, max_slots: int = 6,
                         batch: int = 128, median: float = 22.0):
    """Sequence-PACKED gate_cl serving throughput (icka_tpu.serving.packing).

    Bucketed serving pays bucket-granularity padding (~75% token fill)
    and one request per row; packing concatenates several tweets per row
    with exact isolation (block-diagonal attention, per-slot visual keys,
    reset-cut Viterbi). Requests route through the server's TIERS
    (default (48, 2) + (128, 6) — short rows win because attention cost
    scales with the ROW length; the 128 tier serves the >48-token tail
    exactly instead of truncating it). For each tier the bench packs one
    full device batch from that tier's slice of the documented
    tweet-length distribution, times the compiled program in a chained
    fori_loop, and weights tiers by their pair shares:
    throughput = 1 / Σ share_t · (step_t / pairs_per_batch_t). A
    ±20%-median sensitivity band re-samples, re-packs and re-weights
    (same compiled programs — packing is shape-independent).
    `row_len`/`max_slots` switch to a single-tier layout for sweeps."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from icka_tpu.core.config import EncoderConfig, GateCLConfig
    from icka_tpu.models.gate_cl import GateCLModel
    from icka_tpu.serving.bucketed import sample_tweet_lengths
    from icka_tpu.serving.packing import PackedGateCLServer, pack_first_fit

    if quick:
        enc = EncoderConfig(vocab_size=1024, hidden_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=256, position_offset=0,
                            pad_token_id=0, layer_norm_eps=1e-12)
        cfg = GateCLConfig(encoder=enc, region_dim=64, max_seq_length=32)
        row_len, max_slots = 32, 3
        batch = 8
    else:
        cfg = GateCLConfig()
    if int8:
        rep = {"quant": quant_mode}
        if quant_mode == "int8_static":
            rep["fuse_qkv"] = True
            rep["softmax_dtype"] = "bfloat16"
        cfg = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, **rep))

    # Device-dispatch overhead through the RPC tunnel measures ~23 ms per
    # jit dispatch (r04 scaling probe) — amortize over chained iterations.
    if not quick:
        iters = max(iters, 48)
    model = GateCLModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    L = cfg.max_seq_length
    params = model.init(
        jax.random.PRNGKey(0),
        rng.integers(2, cfg.encoder.vocab_size, (2, L)).astype(np.int32),
        np.zeros((2, L), np.int32), np.ones((2, L), np.int32),
        np.ones((2, cfg.num_regions), np.int32),
        np.zeros((2, cfg.region_dim), np.float32),
        np.zeros((2, 7, 7, cfg.region_dim), np.float32))

    srv = PackedGateCLServer(model, params, max_batch=batch,
                             row_len=row_len, max_slots=max_slots)

    def tier_batch(t, med):
        """Pack one full device batch from tier t's slice of the length
        distribution; returns (arrays, pairs in the batch)."""
        Lt, St = srv.tiers[t]
        # draw until this tier's slice fills the batch (a tail tier sees
        # only a few % of requests, so a fixed draw would leave most rows
        # empty and time a mostly-padding program)
        lens, draws = [], 0
        gen = np.random.default_rng(11 + t)
        while draws < 50 and len(lens) < batch * St * 2:
            draws += 1
            cand = sample_tweet_lengths(batch * St * 4, gen,
                                        max_len=srv.tiers[-1][0],
                                        median=med)
            lens += [int(x) for x in cand if srv._tier_of(int(x)) == t]
        rows = pack_first_fit(lens, Lt, St)[:batch]
        exs, rows2 = [], []
        for row in rows:
            r2 = []
            for i in row:
                r2.append(len(exs))
                exs.append({
                    "input_ids": rng.integers(
                        2, cfg.encoder.vocab_size, lens[i])
                    .astype(np.int32),
                    "visual_grid": rng.standard_normal(
                        (7, 7, cfg.region_dim)).astype(np.float32),
                })
            rows2.append(r2)
        lengths = [len(ex["input_ids"]) for ex in exs]
        b, _, toks = srv.build_batch(exs, lengths, rows2, Lt, St)
        return b, len(exs), toks / (batch * Lt)

    def tier_shares(med):
        lens = sample_tweet_lengths(100_000, np.random.default_rng(3),
                                    max_len=srv.tiers[-1][0], median=med)
        share = [0.0] * len(srv.tiers)
        for ln in lens:
            share[srv._tier_of(int(ln))] += 1.0 / len(lens)
        return share

    fn_model = model

    def infer(p, b, prev):
        dep = jnp.where(jnp.sum(prev) > jnp.int32(2 ** 30), 1, 0) \
            .astype(jnp.int32)
        return fn_model.apply(p, b["ids"] + dep, b["pos"], b["types"],
                              b["slot"], b["valid"], b["seg_start"],
                              b["img_mask"], b["visual_grid"] + dep,
                              b["seg_gather"],
                              method=fn_model.forward_packed)

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("n",))
    def infer_loop(p, b, prev, n):
        return jax.lax.fori_loop(0, n, lambda i, pr: infer(p, b, pr), prev)

    def measure_tier(t, med):
        b, pairs, fill = tier_batch(t, med)
        Lt = srv.tiers[t][0]
        db = jax.device_put(b)
        prev = jnp.zeros((batch, Lt), jnp.int32)
        out = infer_loop(params, db, prev, iters)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = infer_loop(params, db, out, iters)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, pairs, fill

    def weighted(med, per_tier):
        shares = tier_shares(med)
        return 1.0 / sum(
            shares[t] * per_tier[t][0] / per_tier[t][1]
            for t in range(len(srv.tiers)) if shares[t] > 0)

    per_tier = {}
    detail = {"tiers": {}, "batch": batch}
    for t, (Lt, St) in enumerate(srv.tiers):
        step, pairs, fill = measure_tier(t, median)
        per_tier[t] = (step, pairs)
        detail["tiers"][f"L{Lt}xS{St}"] = {
            "pairs_per_batch": pairs, "step_ms": round(step * 1e3, 2),
            "token_fill": round(fill, 3),
            "pairs_per_sec": round(pairs / step, 1)}
        print(f"# gate_cl packed tier L={Lt} S={St}: "
              f"{pairs / step:.1f} pairs/s ({step * 1e3:.2f} ms/step, "
              f"{pairs} pairs/batch, fill {fill:.2f})", file=sys.stderr)

    pps = weighted(median, per_tier)
    # sensitivity: re-pack + re-weight under median shifts (compiled
    # programs are shape-identical, so re-measure is re-timing only)
    sens = {}
    for tag, med in (("median_x0.8", median * 0.8),
                     ("median_x1.2", median * 1.2)):
        pt = {}
        for t in range(len(srv.tiers)):
            step, pairs, _ = measure_tier(t, med)
            pt[t] = (step, pairs)
        sens[tag] = round(weighted(med, pt), 1)
    detail["sensitivity"] = sens
    print(f"# gate_cl packed weighted: {pps:.1f} pairs/s "
          f"(tiers {srv.tiers}, sensitivity {sens})", file=sys.stderr)
    return pps, detail


def bench_gate_cl_bucketed(quick: bool, iters: int,
                           int8: bool = True,
                           quant_mode: str = "int8_static",
                           batch_override: int | None = None,
                           buckets_override: tuple | None = None,
                           with_backbone: bool = False):
    """Length-bucketed gate_cl serving throughput (icka_tpu.serving).

    The reference pads every tweet to max_seq_length=128
    (`My_cross_attention.py:375-427`); real tweets average ~17 tokens. The
    bucketed engine compiles one program per length bucket and routes each
    request to the smallest bucket that fits. This measures per-bucket
    device step time at the serving batch, then weights by the bucket
    shares of the documented synthetic tweet-length distribution
    (`sample_tweet_lengths`: clipped lognormal, p50≈24 subtokens) —
    throughput = batch / Σ share_b · t_b. The fixed-128 number stays the
    reference-layout headline; this is the serving-engine number.

    `with_backbone=False` measures the encoder-only path — the number a
    precomputed-visual-feature deployment gets, NOT comparable to the
    image+sentence north star. `with_backbone=True` runs uint8 images →
    device preprocess → ResNet-152 → gate_cl inside the same jitted loop,
    exactly as the reference encodes every image per batch
    (`My_cross_attention.py:804-805`) — the north-star-comparable number
    (VERDICT r03 next #2). Backbone runs serve a uniform batch: ResNet is
    a length-independent per-pair floor, so the short-bucket batch
    escalation that pays encoder-only has nothing left to recover."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from icka_tpu.core.config import EncoderConfig, GateCLConfig
    from icka_tpu.models.gate_cl import GateCLModel

    if quick:
        enc = EncoderConfig(vocab_size=1024, hidden_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=256, position_offset=0,
                            pad_token_id=0, layer_norm_eps=1e-12)
        cfg = GateCLConfig(encoder=enc, region_dim=64, max_seq_length=32)
        buckets, batch = (16, 32), 8
    else:
        cfg = GateCLConfig()
        # fine buckets beat (32, 64, 128) by ~17% weighted: 54% of the
        # length distribution fits in <=24 tokens (measured r03)
        buckets, batch = (16, 24, 32, 48, 64, 128), 128
    if batch_override:
        batch = batch_override
    if buckets_override:
        buckets = tuple(sorted(buckets_override))
    # measured per-bucket serving batches (r03 sweep): short buckets need
    # larger batches to saturate the MXU — L16: 512 is +28% over 128,
    # L24/L32: 256 is +13/+11%; L48 is flat and L64/L128 regress at 256.
    # A uniform batch_override (e.g. a --batch_sizes sweep) disables this,
    # as does with_backbone (see docstring).
    per_bucket = {} if (quick or batch_override or with_backbone) \
        else {16: 512, 24: 256, 32: 256}

    def batch_of(L):
        return per_bucket.get(L, batch)
    rep = {}
    if int8:
        rep = dict(quant=quant_mode)
        if quant_mode == "int8_static":
            rep["fuse_qkv"] = True          # serving layout (see bench_icka)
            rep["softmax_dtype"] = "bfloat16"
    if rep:
        cfg = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, **rep))

    if with_backbone and cfg.region_dim != 2048:
        cfg = dataclasses.replace(cfg, region_dim=2048)
    # Device-dispatch overhead through the RPC tunnel measures ~23 ms per
    # jit dispatch (r04 scaling probe: 206 MB copy = 3.04 ms/it at
    # inner=10 vs 1.23 ms/it at inner=40 -> fixed ~23 ms + true ~650 GB/s
    # HBM). Short-step benches must amortize it over enough chained
    # iterations or every step reads ~2.4 ms slow.
    if not quick:
        iters = max(iters, 24 if with_backbone else 64)
    model = GateCLModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    backbone = bvars = None
    image_size = 64 if quick else 256
    crop = min(224, image_size)
    if with_backbone:
        from icka_tpu.data.images import preprocess_images
        from icka_tpu.models.resnet import VisualBackbone

        backbone = VisualBackbone(
            layers=(1, 1, 1, 1) if quick else (3, 8, 36, 3),
            dtype=jnp.bfloat16, quant=quant_mode if int8 else "none")
        bvars = backbone.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, crop, crop, 3), jnp.bfloat16))

    def make(B, L):
        a = [rng.integers(2, cfg.encoder.vocab_size, (B, L))
             .astype(np.int32),
             np.zeros((B, L), np.int32),
             np.ones((B, L), np.int32),
             np.ones((B, cfg.num_regions), np.int32)]
        if with_backbone:
            # visual features come from the in-loop ResNet; ship images
            a += [None, None,
                  rng.integers(0, 255, (B, image_size, image_size, 3))
                  .astype(np.uint8)]
        else:
            a += [rng.standard_normal((B, cfg.region_dim))
                  .astype(np.float32),
                  rng.standard_normal((B, 7, 7, cfg.region_dim))
                  .astype(np.float32), None]
        return tuple(a)

    # params are init'd ONCE at the largest bucket (= max_seq_length) and
    # reused for every bucket: GateCLModel keeps parameter shapes
    # independent of the padded length (crs input padded to max_seq_length)
    Lmax = buckets[-1]
    params = model.init(
        jax.random.PRNGKey(0),
        rng.integers(2, cfg.encoder.vocab_size, (2, Lmax)).astype(np.int32),
        np.zeros((2, Lmax), np.int32), np.ones((2, Lmax), np.int32),
        np.ones((2, cfg.num_regions), np.int32),
        np.zeros((2, cfg.region_dim), np.float32),
        np.zeros((2, 7, 7, cfg.region_dim), np.float32))

    def infer(p, bv, ids, seg, mask, imask, vmean, vgrid, images, prev):
        dep = jnp.where(jnp.sum(prev) > jnp.int32(2 ** 30), 1.0, 0.0)
        if with_backbone:
            # the reference encodes EVERY image through ResNet-152 per
            # batch (`My_cross_attention.py:804-805`); same here, inside
            # the jitted loop, chained through `dep`.
            pixels = preprocess_images(images, jax.random.PRNGKey(0),
                                       crop_size=crop, train=False)
            _, vm, vg = backbone.apply(
                bv, (pixels + dep).astype(jnp.bfloat16))
            vmean, vgrid = vm.astype(jnp.float32), vg
        else:
            vmean, vgrid = vmean + dep, vgrid + dep
        return model.apply(p, ids + dep.astype(jnp.int32), seg, mask,
                           imask, vmean, vgrid)

    @partial(jax.jit, static_argnames=("n",))
    def infer_loop(p, bv, ids, seg, mask, imask, vmean, vgrid, images,
                   prev, n):
        return jax.lax.fori_loop(
            0, n,
            lambda i, pr: infer(p, bv, ids, seg, mask, imask, vmean,
                                vgrid, images, pr),
            prev)

    share = _bucket_shares(buckets)
    tag = "gate_cl+resnet" if with_backbone else "gate_cl"

    step_time = {}
    for L in buckets:
        B = batch_of(L)
        a = jax.device_put(make(B, L))
        prev = jnp.zeros((B, L), jnp.int32)
        out = infer_loop(params, bvars, *a, prev, iters)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = infer_loop(params, bvars, *a, out, iters)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        step_time[L] = best
        print(f"# {tag} bucket L={L}: {B / best:.1f} pairs/s "
              f"({best * 1e3:.2f} ms/step, batch {B}, share {share[L]:.3f})",
              file=sys.stderr)

    # seconds per pair in bucket b is t_b / batch_b; weight by shares
    weighted = _weighted_throughput(buckets, step_time, batch_of)
    detail = {f"L{b}": round(batch_of(b) / step_time[b], 1) for b in buckets}
    detail["shares"] = {f"L{b}": round(share[b], 4) for b in buckets}
    detail["sensitivity"] = _sensitivity_rows(buckets, step_time, batch_of)
    if per_bucket:
        detail["batches"] = {f"L{b}": batch_of(b) for b in buckets}
    print(f"# {tag} bucketed weighted: {weighted:.1f} pairs/s "
          f"(buckets {buckets}, sensitivity {detail['sensitivity']})",
          file=sys.stderr)
    return weighted, detail


def _ensure_jpeg_dir(path: str, n_imgs: int, size: int) -> None:
    """Materialize a deterministic on-disk JPEG dataset once (reused across
    runs). Smooth low-frequency noise upsampled to `size`² — realistic
    decode complexity, unlike raw white noise."""
    import numpy as np
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(n_imgs):
        p = os.path.join(path, f"{i:05d}.jpg")
        if os.path.exists(p):
            rng.integers(0, 255, (8, 8, 3))  # keep the stream aligned
            continue
        base = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        im = Image.fromarray(base).resize((size, size), Image.BILINEAR)
        im.save(p, quality=90)


def bench_e2e(quick: bool, batch: int, steps: int, pallas: bool = False,
              int8: bool = False):
    """HOST-INCLUSIVE serving throughput (VERDICT r02 next #3): on-disk
    JPEGs → native libjpeg decode (pthread pool) → host→device transfer →
    the full jitted flagship pipeline, with the loader's prefetch thread
    overlapping decode and device compute. No tensors are pre-staged in
    HBM. Also times the loader alone (decode + batch assembly, no device)
    so the artifact records where the end-to-end ceiling sits on this
    host. NOTE: this host has os.cpu_count() CPU(s); the native decoder
    scales with the thread pool on a production host.
    """
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from icka_tpu.core.config import EncoderConfig, ICKAConfig
    from icka_tpu.data.features import NUM_REGIONS, MMFeatures, PromptSpec
    from icka_tpu.data.images import preprocess_images
    from icka_tpu.data.loader import MNERLoader
    from icka_tpu.models.icka import ICKAModel
    from icka_tpu.models.resnet import VisualBackbone

    if quick:
        enc = EncoderConfig(vocab_size=1024, hidden_size=256,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=512)
        cfg = ICKAConfig(embedding=enc, last_encoder=enc, layer_num1=2,
                         clip_dim=128, prompt_hidden=128, last_hidden=256,
                         max_seq_length=64)
        resnet_layers = (1, 1, 1, 1)
        decode_size, jpeg_size = 64, 128
    else:
        cfg = ICKAConfig()
        resnet_layers = (3, 8, 36, 3)
        decode_size, jpeg_size = 256, 512
    if pallas or int8:
        rep = dict(use_pallas=pallas)
        if int8:
            rep["quant"] = "int8"
        cfg = dataclasses.replace(
            cfg,
            embedding=dataclasses.replace(cfg.embedding, **rep),
            last_encoder=dataclasses.replace(cfg.last_encoder, **rep))

    offset, mask_positions = 14, (3, 11)
    L = cfg.max_seq_length
    Lp = offset + L
    n = batch * steps
    img_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_data", f"jpeg{jpeg_size}")
    _ensure_jpeg_dir(img_dir, n, jpeg_size)

    rng = np.random.default_rng(0)
    feats = MMFeatures(
        input_ids=rng.integers(2, cfg.embedding.vocab_size,
                               (n, Lp)).astype(np.int32),
        input_mask=np.ones((n, Lp), np.int32),
        segment_ids=np.concatenate(
            [np.zeros((n, offset), np.int32),
             np.ones((n, L), np.int32)], 1),
        ori_input_ids=rng.integers(2, cfg.embedding.vocab_size,
                                   (n, L)).astype(np.int32),
        ori_input_mask=np.ones((n, L), np.int32),
        ori_segment_ids=np.zeros((n, L), np.int32),
        label_ids=np.zeros((n, L), np.int32),
        aux_label_ids=np.zeros((n, L), np.int32),
        output_mask=np.ones((n, L), np.int32),
        added_input_mask=np.ones((n, L + NUM_REGIONS), np.int32),
        clip_features=rng.standard_normal((n, 1, cfg.clip_dim))
        .astype(np.float32),
        img_ids=[f"{i:05d}.jpg" for i in range(n)],
        spec=PromptSpec(offset, mask_positions, Lp, L),
    )

    def make_loader(threads: int = 4):
        # cache OFF: serving decodes every request; a cache would turn the
        # measurement into a numpy memcpy benchmark after epoch one
        return MNERLoader(feats, img_dir, batch, train=False,
                          decode_size=decode_size, cache_images=False,
                          prefetch=4, decode_threads=threads)

    # ---- loader alone (host decode + batch assembly, no device), swept
    # over the native decoder's pthread-pool size (VERDICT r04 weak #8:
    # the pool's scaling was claimed, never measured — on this
    # single-core host extra threads can still overlap file I/O with
    # decode, and the sweep records whatever this host actually does) ----
    thread_sweep = {}
    for nt in (1, 2, 4):
        t0 = time.perf_counter()
        seen = 0
        for b in make_loader(nt):
            seen += int(b["row_valid"].sum())
            if seen >= n // 2:
                # half the dataset bounds each sweep pass (threads are a
                # rate measurement, not a coverage one) so three passes
                # don't cost more wall clock than the old single pass
                break
        thread_sweep[nt] = round(seen / (time.perf_counter() - t0), 1)
        print(f"# loader-only ({nt} decode threads): {thread_sweep[nt]} "
              f"pairs/s ({seen} images, {os.cpu_count()} host cpu)",
              file=sys.stderr)
    loader_pairs = max(thread_sweep.values())

    # ---- full pipeline ----
    dtype = jnp.bfloat16
    model = ICKAModel(cfg, dtype=dtype)
    backbone = VisualBackbone(layers=resnet_layers, dtype=dtype,
                              quant="int8" if int8 else "none")
    crop = min(224, decode_size)
    init_b = _batch(cfg, 2, offset, rng, decode_size)
    init_b.pop("images")
    init_b["visual_mean"] = np.zeros((2, cfg.region_dim), np.float32)
    init_b["visual_grid"] = np.zeros((2, 7, 7, cfg.region_dim), np.float32)
    params = model.init(jax.random.PRNGKey(0), init_b, mask_positions,
                        offset, mode="test")
    bvars = backbone.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, crop, crop, 3), dtype))

    keys = ("input_ids", "segment_ids", "input_mask", "ori_input_ids",
            "ori_input_mask", "ori_segment_ids", "img_mask",
            "clip_features", "output_mask", "images")

    @jax.jit
    def infer(params, bvars, b):
        pixels = preprocess_images(b["images"], jax.random.PRNGKey(0),
                                   crop_size=crop, train=False)
        pooled, mean, att = backbone.apply(bvars, pixels.astype(dtype))
        mb = {k: v for k, v in b.items() if k != "images"}
        mb["visual_mean"] = mean.astype(jnp.float32)
        mb["visual_grid"] = att
        return model.apply(params, mb, mask_positions, offset, mode="test")

    def run_epoch():
        last = None
        for b in make_loader():
            db = jax.device_put({k: b[k] for k in keys})
            last = infer(params, bvars, db)   # async dispatch → overlap
        np.asarray(last)

    run_epoch()  # warmup (compile + decode)
    t0 = time.perf_counter()
    run_epoch()
    e2e_pairs = n / (time.perf_counter() - t0)
    print(f"# e2e (jpeg→decode→transfer→device): {e2e_pairs:.1f} pairs/s "
          f"(batch {batch}, {steps} steps)", file=sys.stderr)

    # ---- stage breakdown (VERDICT r03 next #6): one extra epoch with
    # explicit syncs isolating decode-wait / host→device transfer / device
    # compute. The serialized sum bounds the overlapped e2e from above;
    # if e2e ≈ the serialized sum, the stages are NOT overlapping and the
    # per-stage shares say which one owns the ceiling on this host. ----
    decode_s = h2d_s = device_s = 0.0
    it = iter(make_loader())
    while True:
        t0 = time.perf_counter()
        b = next(it, None)
        if b is None:
            break
        t1 = time.perf_counter()
        db = jax.device_put({k: b[k] for k in keys})
        jax.block_until_ready(db)
        t2 = time.perf_counter()
        out = infer(params, bvars, db)
        np.asarray(out)
        t3 = time.perf_counter()
        decode_s += t1 - t0
        h2d_s += t2 - t1
        device_s += t3 - t2
    total = decode_s + h2d_s + device_s
    breakdown = {
        "decode_wait_s": round(decode_s, 3),
        "h2d_transfer_s": round(h2d_s, 3),
        "device_compute_s": round(device_s, 3),
        "serialized_pairs_per_sec": round(n / total, 1) if total else 0.0,
        "overlap_efficiency": round(
            (total / (n / e2e_pairs)) if e2e_pairs else 0.0, 3),
    }
    print(f"# e2e breakdown over {steps} steps: decode-wait {decode_s:.2f}s"
          f" | h2d {h2d_s:.2f}s | device {device_s:.2f}s "
          f"(serialized {breakdown['serialized_pairs_per_sec']} pairs/s, "
          f"overlap efficiency {breakdown['overlap_efficiency']})",
          file=sys.stderr)
    breakdown["loader_thread_sweep"] = {
        f"threads_{k}": v for k, v in thread_sweep.items()}
    return e2e_pairs, loader_pairs, breakdown


def bench_train(quick: bool, batch: int, iters: int,
                remat_policy: str = "full", mu_dtype: str = "float32"):
    """Flagship training-step throughput (fwd+bwd+AdamW in ONE program)."""
    import numpy as np
    import jax

    from icka_tpu.core.config import EncoderConfig, ICKAConfig, TrainConfig
    from icka_tpu.core.mesh import shard_accum_batch
    from icka_tpu.data.features import PromptSpec

    from icka_tpu.train.trainer import ICKATrainer

    import dataclasses

    if quick:
        enc = EncoderConfig(vocab_size=1024, hidden_size=256,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=512)
        cfg = ICKAConfig(embedding=enc, last_encoder=enc, layer_num1=2,
                         clip_dim=128, prompt_hidden=128, last_hidden=256,
                         max_seq_length=64)
        resnet_layers = (1, 1, 1, 1)
        image_size = 64
    else:
        cfg = ICKAConfig()
        # per-layer remat: fwd+bwd of two 24L encoders at batch 32 blows
        # the 16 GB HBM without it (round-2 OOM). remat_policy selects the
        # memory/recompute trade-off (VERDICT r02 next #6 experiment).
        rep = dict(remat=True, remat_policy=remat_policy)
        cfg = dataclasses.replace(
            cfg,
            embedding=dataclasses.replace(cfg.embedding, **rep),
            last_encoder=dataclasses.replace(cfg.last_encoder, **rep))
        resnet_layers = (3, 8, 36, 3)
        image_size = 256

    tcfg = TrainConfig(train_batch_size=batch,
                       gradient_accumulation_steps=1,
                       compute_dtype="float32" if quick else "bfloat16",
                       mu_dtype=mu_dtype)
    offset, mask_positions = 14, (3, 11)
    spec = PromptSpec(offset, mask_positions, offset + cfg.max_seq_length,
                      cfg.max_seq_length)
    trainer = ICKATrainer(cfg, tcfg, spec, resnet_layers=resnet_layers)
    rng = np.random.default_rng(0)

    init_b = _batch(cfg, 2, offset, rng, image_size)
    init_b.pop("images")
    init_b["visual_mean"] = np.zeros((2, cfg.region_dim), np.float32)
    init_b["visual_grid"] = np.zeros((2, 7, 7, cfg.region_dim), np.float32)
    state = trainer.init_state(jax.random.PRNGKey(0), init_b,
                               total_steps=1000)

    batch_np = _batch(cfg, batch, offset, rng, image_size)
    batch_np["label_ids"] = rng.integers(
        0, cfg.num_labels, (batch, cfg.max_seq_length)).astype(np.int32)
    batch_np = {k: v[None] for k, v in batch_np.items()}   # accum axis = 1
    batch_dev = shard_accum_batch(trainer.mesh, batch_np)

    step = trainer.make_train_step()
    key = jax.random.PRNGKey(1)

    # chained steps run inside ONE jitted loop: python-dispatching the
    # ~8 GB donated train state through the RPC tunnel per step measured
    # 84 s/step — the tunnel, not the chip (same trap as inference).
    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def train_loop(state, batch, key, n):
        def body(i, carry):
            st, _ = carry
            return step(st, batch, jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, n, body, (state, jnp_zero()))

    import jax.numpy as _jnp

    def jnp_zero():
        return _jnp.zeros((), _jnp.float32)

    state, loss = train_loop(state, batch_dev, key, iters)
    float(loss)  # warmup incl. compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        state, loss = train_loop(state, batch_dev, key, iters)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / iters)
    pairs = batch / best
    print(f"# train batch={batch}: {pairs:.1f} pairs/s "
          f"({best * 1e3:.1f} ms/step, {iters}-step loop)", file=sys.stderr)
    return pairs


def bench_icka_packed(quick: bool, iters: int,
                      quant_mode: str = "int8_static",
                      batch: int = 32, median: float = 22.0):
    """Sequence-PACKED flagship serving (VERDICT r04 next #4): the
    latency-bound serving mode for ICKAModel. Same tiered layout and
    exact-isolation contract as bench_gate_cl_packed, but every row
    carries the flagship's spliced prompt+sentence pair per segment
    (PromptSpliceEncoder packed path) plus per-slot visual keys for the
    5-layer txt2img stack, the BiLSTM reset-scan, and the Viterbi
    lattice cut. Weighted over tiers exactly like the gate_cl bench."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from icka_tpu.core.config import EncoderConfig, ICKAConfig
    from icka_tpu.models.icka import ICKAModel
    from icka_tpu.serving.bucketed import sample_tweet_lengths
    from icka_tpu.serving.packing import PackedICKAServer, pack_first_fit

    if quick:
        enc = EncoderConfig(vocab_size=1024, hidden_size=256,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=512)
        cfg = ICKAConfig(embedding=enc, last_encoder=enc, layer_num1=2,
                         clip_dim=128, prompt_hidden=128, last_hidden=256,
                         max_seq_length=64)
        batch = 4
    else:
        cfg = ICKAConfig()
        rep = dict(use_pallas=jax.default_backend() == "tpu",
                   quant=quant_mode)
        cfg = dataclasses.replace(
            cfg,
            embedding=dataclasses.replace(cfg.embedding, **rep),
            last_encoder=dataclasses.replace(cfg.last_encoder, **rep))
        iters = max(iters, 24)

    offset, mask_positions = 14, (3, 11)
    model = ICKAModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    init_b = _batch(cfg, 2, offset, rng, 64)
    init_b.pop("images")
    init_b["visual_mean"] = np.zeros((2, cfg.region_dim), np.float32)
    init_b["visual_grid"] = np.zeros((2, 7, 7, cfg.region_dim), np.float32)
    params = model.init(jax.random.PRNGKey(0), init_b, mask_positions,
                        offset, mode="test")

    srv = PackedICKAServer(model, params, mask_positions, offset,
                           max_batch=batch,
                           row_len=32 if quick else None, max_slots=3)

    def tier_batch(t, med):
        Lt, St = srv.tiers[t]
        lens, draws = [], 0
        gen = np.random.default_rng(11 + t)
        while draws < 50 and len(lens) < batch * St * 2:
            draws += 1
            cand = sample_tweet_lengths(batch * St * 4, gen,
                                        max_len=srv.tiers[-1][0],
                                        median=med)
            lens += [int(x) for x in cand if srv._tier_of(int(x)) == t]
        rows = pack_first_fit(lens, Lt, St)[:batch]
        exs, rows2 = [], []
        for row in rows:
            r2 = []
            for i in row:
                r2.append(len(exs))
                exs.append({
                    "ori_input_ids": rng.integers(
                        2, cfg.embedding.vocab_size, lens[i])
                    .astype(np.int32),
                    "input_ids": rng.integers(
                        2, cfg.embedding.vocab_size, offset + lens[i])
                    .astype(np.int32),
                    "clip_features": rng.standard_normal(
                        (1, cfg.clip_dim)).astype(np.float32),
                    "visual_mean": rng.standard_normal(
                        (cfg.region_dim,)).astype(np.float32),
                    "visual_grid": rng.standard_normal(
                        (7, 7, cfg.region_dim)).astype(np.float32),
                })
            rows2.append(r2)
        lengths = [len(ex["ori_input_ids"]) for ex in exs]
        b, _, toks = srv.build_batch(exs, lengths, rows2, Lt, St)
        return b, len(exs), toks / (batch * Lt)

    def tier_shares(med):
        lens = sample_tweet_lengths(100_000, np.random.default_rng(3),
                                    max_len=srv.tiers[-1][0], median=med)
        share = [0.0] * len(srv.tiers)
        for ln in lens:
            share[srv._tier_of(int(ln))] += 1.0 / len(lens)
        return share

    def infer(p, b, prev):
        dep = jnp.where(jnp.sum(prev) > jnp.int32(2 ** 30), 1, 0) \
            .astype(jnp.int32)
        b2 = dict(b, ids_a=b["ids_a"] + dep, ids_b=b["ids_b"] + dep)
        return srv.apply_packed(p, b2)

    @partial(jax.jit, static_argnames=("n",))
    def infer_loop(p, b, prev, n):
        return jax.lax.fori_loop(0, n, lambda i, pr: infer(p, b, pr), prev)

    def measure_tier(t, med):
        b, pairs, fill = tier_batch(t, med)
        Lt = srv.tiers[t][0]
        db = jax.device_put(b)
        prev = jnp.zeros((batch, Lt), jnp.int32)
        out = infer_loop(params, db, prev, iters)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = infer_loop(params, db, out, iters)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, pairs, fill

    def weighted(med, per_tier):
        shares = tier_shares(med)
        return 1.0 / sum(
            shares[t] * per_tier[t][0] / per_tier[t][1]
            for t in range(len(srv.tiers)) if shares[t] > 0)

    per_tier = {}
    detail = {"tiers": {}, "batch": batch}
    for t, (Lt, St) in enumerate(srv.tiers):
        step, pairs, fill = measure_tier(t, median)
        per_tier[t] = (step, pairs)
        detail["tiers"][f"L{Lt}xS{St}"] = {
            "pairs_per_batch": pairs, "step_ms": round(step * 1e3, 2),
            "token_fill": round(fill, 3),
            "pairs_per_sec": round(pairs / step, 1)}
        print(f"# icka packed tier L={Lt} S={St}: "
              f"{pairs / step:.1f} pairs/s ({step * 1e3:.2f} ms/step, "
              f"{pairs} pairs/batch, fill {fill:.2f})", file=sys.stderr)

    pps = weighted(median, per_tier)
    print(f"# icka packed weighted: {pps:.1f} pairs/s "
          f"(tiers {srv.tiers})", file=sys.stderr)
    return pps, detail


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--model", default="icka",
                   choices=["icka", "icka_bucketed", "icka_packed",
                            "gate_cl", "gate_cl_bucketed", "gate_cl_packed",
                            "train", "e2e", "all"])
    p.add_argument("--batch_sizes", default=None,
                   help="comma-separated batch sizes to sweep")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--pallas", action="store_true",
                   help="route self-attention through the fused Pallas "
                        "kernel (default ON for non-quick runs: measured "
                        "+5%% end to end, tools/bench_pallas.py)")
    p.add_argument("--no_pallas", action="store_true",
                   help="disable the fused self-attention kernel")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 quantized encoder projections (serving mode)")
    p.add_argument("--int8_static", action="store_true",
                   help="W8A8 with calibrated static activation scales "
                        "(no per-call abs-max passes; the serving layout)")
    p.add_argument("--fuse_qkv", action="store_true",
                   help="fused (H,3H) QKV projections in the flagship "
                        "encoders (A/B: measured slower at H=1024)")
    p.add_argument("--softmax_bf16", action="store_true",
                   help="bf16 attention softmax in the flagship encoders")
    p.add_argument("--e2e_steps", type=int, default=8,
                   help="number of batches in the host-inclusive e2e run")
    p.add_argument("--remat_policy", default="dots",
                   choices=["full", "alternate", "dots", "dots_nb"],
                   help="train-mode remat selectivity (see EncoderConfig). "
                        "Default by r03 sweep at batch 16: dots 76.4 "
                        "pairs/s > alternate 71.5 > full 69.5")
    p.add_argument("--mu_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="Adam first-moment storage dtype (train mode); "
                        "bfloat16 frees ~0.8 GB for activations")
    p.add_argument("--skip_extras", action="store_true",
                   help="headline icka number only, no gate_cl/train")
    p.add_argument("--buckets", default=None,
                   help="comma-separated bucket lengths for the bucketed "
                        "serving benches (default 16,24,32,48,64,128)")
    p.add_argument("--row_len", type=int, default=None,
                   help="gate_cl_packed: single-tier packed row length "
                        "(default: the tiered (48,2)+(128,6) layout)")
    p.add_argument("--max_slots", type=int, default=6,
                   help="gate_cl_packed: max segments per packed row")
    p.add_argument("--with_backbone", action="store_true",
                   help="gate_cl_bucketed only: run ResNet-152 on uint8 "
                        "images inside the jitted loop — the image+sentence "
                        "number comparable to the north star")
    p.add_argument("--budget_s", type=float,
                   default=float(os.environ.get("BENCH_BUDGET_S", 5400)),
                   help="wall-clock budget for the full suite: sub-benches "
                        "whose START would exceed it are skipped and "
                        "recorded in skipped_over_budget (VERDICT r04 "
                        "next #1 — one timeout must not destroy the "
                        "round's artifact). An outer kill past the budget "
                        "is also harmless: the cumulative line re-printed "
                        "after every sub-bench IS the artifact")
    args = p.parse_args(argv)
    t_start = time.perf_counter()

    if args.quick:
        # force CPU for smoke runs — jax may be pre-imported with a TPU
        # platform pinned, so env vars don't work; config does (pre-init)
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    _enable_compile_cache()
    if args.batch_sizes:
        batch_sizes = [int(b) for b in args.batch_sizes.split(",")]
    elif args.quick:
        batch_sizes = [8]
    else:
        # best-known batch sizes per model on v5e (r02 sweep: icka 128 >
        # 96/64; train is HBM-capped at 16). Keep ONE size per model:
        # every extra size is a fresh ~25-min remote compile, and the loop
        # trip count is baked into the program — defaults here must match
        # the warmed cache.
        if args.model == "train":
            batch_sizes = [16]
        else:
            batch_sizes = [128]
    iters = args.iters or (3 if args.quick else 10)

    # serving default set by measurement: Pallas self-attention is +5%
    # end-to-end on TPU; quick/CPU runs use the einsum path (the kernel's
    # interpret mode is orders slower than XLA on CPU)
    use_pallas = (args.pallas or not args.quick) and not args.no_pallas

    int8_on = args.int8 or args.int8_static
    quant_mode = "int8_static" if args.int8_static else "int8"

    extra = {}
    if args.model in ("icka", "all"):
        # The full suite (VERDICT r04 next #1 redesign): sub-benches run
        # in PRIORITY order — the six must-record keys first (flagship
        # bucketed, gate_cl bucketed, gate_cl+backbone, packed, train,
        # e2e), long-tail extras last — and the full cumulative JSON line
        # is re-printed after EVERY completed sub-bench. The driver parses
        # the LAST line, so each re-print supersedes the previous one and
        # a timeout mid-suite still leaves every completed number in the
        # artifact. --budget_s additionally skips sub-benches whose start
        # would exceed the wall-clock budget so the suite finalizes
        # cleanly instead of being killed.
        headline_fixed = bool(int8_on or args.batch_sizes or args.no_pallas
                              or args.quick or args.skip_extras)
        headline_mode = quant_mode if int8_on else "int8_static"
        headline_int8 = int8_on or not args.quick
        if not headline_fixed:
            metric0 = "icka_bucketed_serving_pairs_per_sec_per_chip"
        elif headline_int8:
            metric0 = (f"icka_{headline_mode}"
                       "_inference_pairs_per_sec_per_chip")
        else:
            metric0 = "icka_inference_pairs_per_sec_per_chip"
        out = {"metric": metric0, "value": 0.0, "unit": "pairs/s",
               "vs_baseline": 0.0}

        def emit():
            out["vs_baseline"] = round(
                (out["value"] or 0.0) / BASELINE_PAIRS_PER_SEC, 4)
            print(json.dumps(out), flush=True)

        def run_task(name, fn):
            spent = time.perf_counter() - t_start
            if spent > args.budget_s:
                out.setdefault("skipped_over_budget", []).append(name)
                print(f"# SKIP {name}: {spent:.0f}s spent > "
                      f"--budget_s {args.budget_s:.0f}", file=sys.stderr)
                emit()
                return
            try:
                fn()
            except Exception as e:      # pragma: no cover
                print(f"# {name} bench failed: {e}", file=sys.stderr)
                out.setdefault("failed", []).append(name)
            emit()

        def t_icka_fixed():
            v, bs = bench_icka(args.quick, batch_sizes, iters,
                               pallas=use_pallas, int8=headline_int8,
                               quant_mode=headline_mode,
                               fuse_qkv=args.fuse_qkv,
                               softmax_bf16=args.softmax_bf16)
            out["icka_batch"] = bs
            if headline_fixed:
                out["value"] = round(v, 2)
            else:
                out[f"icka_{headline_mode}"
                    "_inference_pairs_per_sec_per_chip"] = round(v, 2)

        def t_icka_bucketed():
            ib, idetail = bench_icka_bucketed(args.quick, iters)
            out["icka_bucketed_pairs_per_sec"] = round(ib, 2)
            out["icka_bucket_detail"] = idetail
            if not headline_fixed:
                # headline = the best honest serving configuration for
                # the flagship: the bucketed engine on the documented
                # tweet-length distribution (VERDICT r02 next #7)
                out["value"] = round(ib, 2)

        def t_gate_cl_bucketed():
            gb, gdetail = bench_gate_cl_bucketed(args.quick, iters)
            out["gate_cl_bucketed_pairs_per_sec"] = round(gb, 2)
            out["gate_cl_bucket_detail"] = gdetail

        def t_gate_cl_backbone():
            # the north-star-comparable gate_cl number: image+sentence
            # pairs with ResNet-152 inside the loop (VERDICT r03 #2)
            gbb, gbbd = bench_gate_cl_bucketed(args.quick, iters,
                                               with_backbone=True)
            out["gate_cl_bucketed_with_backbone_pairs_per_sec"] = \
                round(gbb, 2)
            out["gate_cl_with_backbone_detail"] = gbbd

        def t_gate_cl_packed():
            gp, gpdetail = bench_gate_cl_packed(args.quick, iters)
            out["gate_cl_packed_pairs_per_sec"] = round(gp, 2)
            out["gate_cl_packed_detail"] = gpdetail

        def t_icka_packed():
            ip, ipdetail = bench_icka_packed(args.quick, iters)
            out["icka_packed_pairs_per_sec"] = round(ip, 2)
            out["icka_packed_detail"] = ipdetail

        def t_train():
            t = bench_train(args.quick, 16, max(5, iters // 4),
                            remat_policy=args.remat_policy)
            out["train_pairs_per_sec"] = round(t, 2)
            out["train_batch"] = 16

        def t_e2e():
            e2e, loader, ebrk = bench_e2e(args.quick, 128, args.e2e_steps,
                                          pallas=use_pallas, int8=False)
            out["e2e_pairs_per_sec"] = round(e2e, 2)
            out["loader_pairs_per_sec"] = round(loader, 2)
            out["e2e_breakdown"] = ebrk
            out["host_cpus"] = os.cpu_count()

        def t_icka_bf16():
            v16, _ = bench_icka(args.quick, [128], iters,
                                pallas=use_pallas, int8=False)
            out["icka_bf16_pairs_per_sec"] = round(v16, 2)

        def t_gate_cl_int8():
            # pallas measured SLOWER for gate_cl (3778 vs 3995 pairs/s at
            # batch 128: BERT-base 12-head/64-dim shapes) — einsum path
            # stays the gate_cl default; int8_static is the serving mode.
            g8, gbs = bench_gate_cl(args.quick, [128], iters, int8=True,
                                    quant_mode="int8_static")
            out["gate_cl_int8_pairs_per_sec"] = round(g8, 2)
            out["gate_cl_batch"] = gbs

        def t_gate_cl_bf16():
            g, _ = bench_gate_cl(args.quick, [128], iters)
            out["gate_cl_bf16_pairs_per_sec"] = round(g, 2)

        tasks = [("icka_bucketed", t_icka_bucketed),
                 ("gate_cl_bucketed", t_gate_cl_bucketed),
                 ("gate_cl_backbone", t_gate_cl_backbone),
                 ("gate_cl_packed", t_gate_cl_packed),
                 ("train", t_train),
                 ("e2e", t_e2e),
                 ("icka_fixed", t_icka_fixed),
                 ("icka_packed", t_icka_packed),
                 ("icka_bf16", t_icka_bf16),
                 ("gate_cl_int8", t_gate_cl_int8),
                 ("gate_cl_bf16", t_gate_cl_bf16)]
        if headline_fixed or args.quick or args.skip_extras:
            # A/B or smoke invocation: the fixed-shape flagship bench IS
            # the headline and runs first; extras follow only on a full
            # run ("all" semantics are unchanged for --quick/A/B flags).
            tasks = [("icka_fixed", t_icka_fixed)] + \
                [t for t in tasks if t[0] != "icka_fixed"]
        if args.quick or args.skip_extras:
            tasks = tasks[:1]
        for name, fn in tasks:
            run_task(name, fn)
        return
    elif args.model == "gate_cl":
        value, best_bs = bench_gate_cl(args.quick, batch_sizes, iters,
                                       pallas=args.pallas, int8=int8_on,
                                       quant_mode=quant_mode)
        metric = "gate_cl_inference_pairs_per_sec_per_chip"
        if int8_on:
            metric = (f"gate_cl_{quant_mode}"
                      "_inference_pairs_per_sec_per_chip")
    elif args.model == "icka_bucketed":
        value, detail = bench_icka_bucketed(
            args.quick, iters,
            quant_mode=quant_mode if int8_on else "int8_static",
            buckets_override=tuple(int(b) for b in args.buckets.split(","))
            if args.buckets else None,
            batch_override=batch_sizes[0] if args.batch_sizes else None)
        metric = "icka_bucketed_serving_pairs_per_sec_per_chip"
        extra["bucket_detail"] = detail
    elif args.model == "gate_cl_bucketed":
        value, detail = bench_gate_cl_bucketed(
            args.quick, iters,
            int8=int8_on or not args.quick,
            quant_mode=quant_mode if int8_on else "int8_static",
            batch_override=batch_sizes[0] if args.batch_sizes else None,
            buckets_override=tuple(int(b) for b in args.buckets.split(","))
            if args.buckets else None,
            with_backbone=args.with_backbone)
        metric = "gate_cl_bucketed_serving_pairs_per_sec_per_chip"
        if args.with_backbone:
            metric = ("gate_cl_bucketed_with_backbone"
                      "_pairs_per_sec_per_chip")
        extra["bucket_detail"] = detail
    elif args.model == "gate_cl_packed":
        value, detail = bench_gate_cl_packed(
            args.quick, iters,
            int8=int8_on or not args.quick,
            quant_mode=quant_mode if int8_on else "int8_static",
            row_len=args.row_len, max_slots=args.max_slots,
            batch=batch_sizes[0] if args.batch_sizes else 128)
        metric = "gate_cl_packed_serving_pairs_per_sec_per_chip"
        extra["packed_detail"] = detail
    elif args.model == "icka_packed":
        value, detail = bench_icka_packed(
            args.quick, iters,
            quant_mode=quant_mode if int8_on else "int8_static",
            batch=batch_sizes[0] if args.batch_sizes else 32)
        metric = "icka_packed_serving_pairs_per_sec_per_chip"
        extra["packed_detail"] = detail
    elif args.model == "e2e":
        value, loader, ebrk = bench_e2e(args.quick, batch_sizes[0],
                                        args.e2e_steps, pallas=use_pallas,
                                        int8=int8_on)
        metric = "icka_e2e_pairs_per_sec_per_chip"
        extra["loader_pairs_per_sec"] = round(loader, 2)
        extra["e2e_breakdown"] = ebrk
        extra["host_cpus"] = os.cpu_count()
    else:
        value = bench_train(args.quick, batch_sizes[0], iters,
                            remat_policy=args.remat_policy,
                            mu_dtype=args.mu_dtype)
        metric = "icka_train_pairs_per_sec_per_chip"
        extra["remat_policy"] = args.remat_policy
        extra["train_batch"] = batch_sizes[0]
        if args.mu_dtype != "float32":
            extra["mu_dtype"] = args.mu_dtype

    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": "pairs/s",
        "vs_baseline": round(value / BASELINE_PAIRS_PER_SEC, 4),
        **extra,
    }))


if __name__ == "__main__":
    main()
