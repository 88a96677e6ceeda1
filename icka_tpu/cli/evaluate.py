"""Inference/test CLI: the reference `test(output_dir)` path
(`My_cross_attention.py:948-1089`) — rehydrate config + best checkpoint from
an output directory, run the test split, print the seqeval-style report and
chunk-exact P/R/F1.

    python -m icka_tpu.cli.evaluate --output_dir out/ --data_dir ... \
        --path_image ... --tokenizer_dir ...
    python -m icka_tpu.cli.evaluate --synthetic /tmp/ds --tiny --output_dir out/
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--path_image", default=None)
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--split", default="test", choices=["valid", "test"])
    p.add_argument("--eval_batch_size", type=int, default=4)
    p.add_argument("--synthetic", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--cpu_devices", type=int, default=8)
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    from icka_tpu.core.checkpoint import Checkpointer
    from icka_tpu.core.config import ICKAConfig, TrainConfig, load_config
    from icka_tpu.data.clip_store import ClipFeatureStore
    from icka_tpu.data.conll import read_mm_conll
    from icka_tpu.data.features import convert_examples
    from icka_tpu.data.loader import MNERLoader
    from icka_tpu.train.trainer import ICKATrainer

    if args.synthetic:
        from icka_tpu.data.synthetic import tiny_tokenizer
        args.data_dir = args.synthetic
        args.path_image = os.path.join(args.synthetic, "images")
        tokenizer = tiny_tokenizer(os.path.join(args.synthetic, "tokenizer"))
    else:
        from icka_tpu.data.tokenization import ByteLevelBPETokenizer
        tokenizer = ByteLevelBPETokenizer(
            os.path.join(args.tokenizer_dir, "vocab.json"),
            os.path.join(args.tokenizer_dir, "merges.txt"))

    model_cfg = load_config(
        ICKAConfig, os.path.join(args.output_dir, "config.json"))
    train_cfg = TrainConfig(eval_batch_size=args.eval_batch_size,
                            compute_dtype="float32" if args.tiny
                            else "bfloat16")

    examples = read_mm_conll(
        os.path.join(args.data_dir, f"{args.split}.txt"))
    clip = ClipFeatureStore.from_split(args.data_dir, args.split)
    feats = convert_examples(examples, tokenizer,
                             model_cfg.max_seq_length, clip,
                             model_cfg.clip_dim)

    resnet_layers = (1, 1, 1, 1) if args.tiny else (3, 8, 36, 3)
    trainer = ICKATrainer(model_cfg, train_cfg, feats.spec,
                          resnet_layers=resnet_layers)
    loader = MNERLoader(feats, args.path_image, args.eval_batch_size,
                        train=False,
                        decode_size=64 if args.tiny else 256)

    import jax
    import numpy as np

    sample = feats.batch_dict(np.arange(min(len(feats),
                                            args.eval_batch_size)))
    sample["visual_mean"] = np.zeros(
        (sample["ori_input_ids"].shape[0], model_cfg.region_dim), np.float32)
    sample["visual_grid"] = np.zeros(
        (sample["ori_input_ids"].shape[0], 7, 7, model_cfg.region_dim),
        np.float32)
    state = trainer.init_state(jax.random.PRNGKey(0), sample, total_steps=1)
    ckpt = Checkpointer(args.output_dir)
    state = ckpt.restore_best(state)

    result = trainer.evaluate(state, loader)
    print(result.report)
    for cls, (f1, p, r) in (result.per_class or {}).items():
        print(f"{cls}: p = {p:.4f}, r = {r:.4f}, f1 = {f1:.4f}")
    print(f"Overall: p = {result.precision:.4f}, r = {result.recall:.4f}, "
          f"f1 = {result.f1:.4f} (acc {result.acc:.4f}, "
          f"loss {result.loss:.4f})")
    return result


if __name__ == "__main__":
    main()
