"""Train-step stage profile for the flagship (VERDICT r03 next #10).

The serving path has per-stage fori_loop profiles (profile_stages.py /
profile_resnet.py); this gives the TRAIN step the same treatment by timing
three nested program variants at the production batch (16, the measured
single-chip HBM knee) and differencing:

    backbone   — ResNet-152 encode alone (train=False aug path)
    fwd        — trainer._loss (backbone + model fwd + CRF NLL)
    fwd+bwd    — value_and_grad of the same (adds bwd + remat recompute)
    full step  — trainer.make_train_step() (adds AdamW + state update)

so  bwd+remat = (fwd+bwd) − fwd,  optimizer = full − (fwd+bwd).

Each variant runs as ONE jitted `lax.fori_loop` chain with a runtime data
dependency threaded through the batch (see bench.py); inner=10 keeps the
~23 ms per-dispatch tunnel overhead at ~1% of these 150-250 ms steps.

Run:  python tools/profile_train.py [--batch 16] [--remat dots]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _enable_cache():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def loop_time(run, carry, inner, args=(), outer=3):
    """`run` must take every device array as an ARGUMENT — closed-over
    arrays serialize into the remote compile request and 413 it."""
    c, s = run(carry, *args)
    float(s)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        c, s = run(c, *args)
        float(s)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--remat", default="dots")
    p.add_argument("--stages", default="all",
                   help="comma list from backbone,fwd,grad,step")
    args = p.parse_args()
    _enable_cache()

    import dataclasses

    from bench import _batch
    from icka_tpu.core.config import EncoderConfig, ICKAConfig, TrainConfig
    from icka_tpu.core.mesh import shard_accum_batch
    from icka_tpu.data.features import PromptSpec
    from icka_tpu.train.trainer import ICKATrainer

    cfg = ICKAConfig()
    rep = dict(remat=True, remat_policy=args.remat)
    cfg = dataclasses.replace(
        cfg,
        embedding=dataclasses.replace(cfg.embedding, **rep),
        last_encoder=dataclasses.replace(cfg.last_encoder, **rep))
    tcfg = TrainConfig(train_batch_size=args.batch,
                       gradient_accumulation_steps=1,
                       compute_dtype="bfloat16")
    offset, mask_positions = 14, (3, 11)
    spec = PromptSpec(offset, mask_positions, offset + cfg.max_seq_length,
                      cfg.max_seq_length)
    trainer = ICKATrainer(cfg, tcfg, spec, resnet_layers=(3, 8, 36, 3))
    rng = np.random.default_rng(0)
    B = args.batch

    init_b = _batch(cfg, 2, offset, rng, 256)
    init_b.pop("images")
    init_b["visual_mean"] = np.zeros((2, cfg.region_dim), np.float32)
    init_b["visual_grid"] = np.zeros((2, 7, 7, cfg.region_dim), np.float32)
    state = trainer.init_state(jax.random.PRNGKey(0), init_b,
                               total_steps=1000)

    bnp = _batch(cfg, B, offset, rng, 256)
    bnp["label_ids"] = rng.integers(
        0, cfg.num_labels, (B, cfg.max_seq_length)).astype(np.int32)
    bdev = jax.device_put(bnp)
    key = jax.random.PRNGKey(1)
    inner = args.inner
    want = set(args.stages.split(",")) if args.stages != "all" else {
        "backbone", "fwd", "grad", "step"}
    results = {}

    params, bvars = state.params, state.backbone_variables
    if "step" not in want:
        # batch 16 is the single-chip HBM knee for the FULL step; the
        # grad-only program cannot donate params AND the Adam moments
        # stay resident while `state` is alive, so grad-profiling OOMs
        # unless the moments are released.  Profile `step` in its own
        # process: python tools/profile_train.py --stages step
        state = None

    def report(name, secs):
        results[name] = secs
        print(f"{name:10s}: {secs * 1e3:7.1f} ms/step "
              f"({B / secs:6.1f} pairs/s alone)", flush=True)

    def chained(b, dep):
        out = dict(b)
        out["images"] = b["images"] + dep.astype(jnp.uint8)
        out["ori_input_ids"] = b["ori_input_ids"] + dep.astype(jnp.int32)
        out["input_ids"] = b["input_ids"] + dep.astype(jnp.int32)
        return out

    if "backbone" in want:
        from icka_tpu.data.images import preprocess_images

        @jax.jit
        def run_bb(carry, bv, b):
            def body(i, c):
                dep = jnp.where(c > 1e30, 1.0, 0.0)
                px = preprocess_images(
                    b["images"] + dep.astype(jnp.uint8),
                    jax.random.PRNGKey(0), train=True)
                _, mean, _ = trainer.backbone.apply(bv, px)
                return jnp.sum(mean.astype(jnp.float32))
            out = jax.lax.fori_loop(0, inner, body, carry)
            return out, out
        report("backbone", loop_time(
            run_bb, jnp.zeros(()), inner,
            args=(bvars, bdev)))

    if "fwd" in want:
        @jax.jit
        def run_fwd(carry, params, bv, b):
            def body(i, c):
                dep = jnp.where(c > 1e30, 1.0, 0.0)
                loss = trainer._loss(params, bv, chained(b, dep), key,
                                     train=True)
                return loss.astype(jnp.float32)
            out = jax.lax.fori_loop(0, inner, body, carry)
            return out, out
        report("fwd", loop_time(
            run_fwd, jnp.zeros(()), inner,
            args=(params, bvars, bdev)))

    if "grad" in want:
        @jax.jit
        def run_grad(carry, params, bv, b):
            def body(i, c):
                dep = jnp.where(c > 1e30, 1.0, 0.0)
                loss, grads = jax.value_and_grad(trainer._loss)(
                    params, bv, chained(b, dep), key, train=True)
                leaf = jax.tree.leaves(grads)[0]
                # 1e-30 (not 0.0): a *0.0 use constant-folds and XLA
                # would DCE the entire backward pass out of the timing
                return loss.astype(jnp.float32) \
                    + 1e-30 * jnp.sum(leaf.astype(jnp.float32))
            out = jax.lax.fori_loop(0, inner, body, carry)
            return out, out
        report("grad", loop_time(
            run_grad, jnp.zeros(()), inner,
            args=(params, bvars, bdev)))

    if "step" in want:
        step_fn = trainer.make_train_step()
        bacc = {k: v[None] for k, v in bnp.items()}
        bacc = shard_accum_batch(trainer.mesh, bacc)

        @jax.jit
        def run_jit(carry, b):
            st, s = carry

            # the state threads the dependency naturally: params update
            # every iteration, so nothing hoists
            def body(i, c):
                st, _ = c
                st, loss = step_fn(st, b, key)
                return st, loss

            st, loss = jax.lax.fori_loop(0, inner, body, (st, s))
            return (st, loss), loss

        report("step", loop_time(run_jit, (state, jnp.zeros(())), inner,
                                 args=(bacc,)))

    if {"fwd", "grad", "step"} <= results.keys():
        print(f"\nderived: bwd+remat = {1e3 * (results['grad'] - results['fwd']):.1f} ms, "
              f"optimizer+state = {1e3 * (results['step'] - results['grad']):.1f} ms")
    if {"backbone", "fwd"} <= results.keys():
        print(f"derived: model fwd (sans backbone) = "
              f"{1e3 * (results['fwd'] - results['backbone']):.1f} ms")


if __name__ == "__main__":
    main()
