"""Training CLI: the `python My_cross_attention.py` equivalent.

    python -m icka_tpu.cli.train --data_dir ... --path_image ... \
        --output_dir out/
    python -m icka_tpu.cli.train --synthetic /tmp/ds --tiny   # smoke run

Flags mirror the reference's argparse surface (`get_args`,
`My_cross_attention.py:475-622`) where they still apply; model/encoder
hyperparameters come from config JSON (see `icka_tpu.core.config`) instead
of hard-coded paths.
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train ICKA-TPU on MNER data")
    p.add_argument("--data_dir", default=None,
                   help="dir with train/valid/test.txt + Clip/*.pkl")
    p.add_argument("--path_image", default=None, help="image directory")
    p.add_argument("--output_dir", default="out")
    p.add_argument("--task_name", default="twitter2015",
                   choices=["twitter2015", "twitter2017"])
    p.add_argument("--tokenizer_dir", default=None,
                   help="dir with vocab.json + merges.txt (RoBERTa BPE)")
    p.add_argument("--model", default="icka",
                   choices=["icka", "gate_cl", "cl", "ip"],
                   help="flagship ICKA or the my_bert gate_cl family")
    p.add_argument("--model_config", default=None,
                   help="ICKAConfig JSON; default = roberta-large flagship")
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--eval_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=5)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--num_train_epochs", type=int, default=25)
    p.add_argument("--seed", type=int, default=19260817)
    p.add_argument("--fine_tune_cnn", action="store_true")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--data_axis", type=int, default=-1,
                   help="mesh size along the data axis (-1: all devices)")
    p.add_argument("--model_axis", type=int, default=1,
                   help="tensor-parallel mesh size")
    # smoke-run conveniences
    p.add_argument("--synthetic", default=None,
                   help="generate a synthetic dataset at this path and "
                        "train on it")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (tests/smoke)")
    p.add_argument("--epochs_override", type=int, default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX platform (jax may be pre-imported "
                        "with a TPU platform pinned; env vars won't work)")
    p.add_argument("--cpu_devices", type=int, default=8,
                   help="virtual device count when --platform cpu")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (the "
                        "torch.distributed.launch equivalent; coordinator "
                        "address etc. from the standard JAX env vars)")
    return p


def _force_platform(platform, cpu_devices):
    if platform is None:
        return
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices)


def main(argv=None):
    args = build_parser().parse_args(argv)
    _force_platform(args.platform, args.cpu_devices)
    if args.multihost:
        import jax
        jax.distributed.initialize()

    from icka_tpu.core.config import ICKAConfig, TrainConfig, load_config, \
        to_json
    from icka_tpu.core.checkpoint import Checkpointer
    from icka_tpu.data.clip_store import ClipFeatureStore
    from icka_tpu.data.conll import read_mm_conll
    from icka_tpu.data.features import convert_examples
    from icka_tpu.data.loader import MNERLoader
    from icka_tpu.data.tokenization import ByteLevelBPETokenizer
    from icka_tpu.train.trainer import ICKATrainer

    if args.synthetic:
        from icka_tpu.data.synthetic import generate_dataset, tiny_tokenizer
        root = generate_dataset(args.synthetic, n_train=32, n_valid=8,
                                n_test=8, image_size=64,
                                clip_dim=16 if args.tiny else 512)
        args.data_dir = root
        args.path_image = os.path.join(root, "images")
        tokenizer = tiny_tokenizer(os.path.join(root, "tokenizer"))
    else:
        if not (args.data_dir and args.path_image and args.tokenizer_dir):
            raise SystemExit(
                "--data_dir, --path_image and --tokenizer_dir are required "
                "(or use --synthetic)")
        tokenizer = ByteLevelBPETokenizer(
            os.path.join(args.tokenizer_dir, "vocab.json"),
            os.path.join(args.tokenizer_dir, "merges.txt"))

    if args.model_config:
        model_cfg = load_config(ICKAConfig, args.model_config)
    elif args.tiny:
        # region_dim stays 2048 — the (shrunken-depth) ResNet still ends at
        # 2048 channels; clip_dim must match the dataset's stored features
        model_cfg = dataclasses.replace(
            ICKAConfig.tiny(vocab_size=len(tokenizer.vocab) + 8),
            max_seq_length=min(args.max_seq_length, 48),
            region_dim=2048, clip_dim=16 if args.synthetic else 512)
    else:
        model_cfg = ICKAConfig()

    train_cfg = TrainConfig(
        learning_rate=args.learning_rate,
        warmup_proportion=args.warmup_proportion,
        num_train_epochs=args.num_train_epochs,
        train_batch_size=args.train_batch_size,
        eval_batch_size=args.eval_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        seed=args.seed,
        fine_tune_cnn=args.fine_tune_cnn,
        compute_dtype=args.compute_dtype,
        data_axis=args.data_axis,
        model_axis=args.model_axis,
    )

    train_ex = read_mm_conll(os.path.join(args.data_dir, "train.txt"))
    dev_ex = read_mm_conll(os.path.join(args.data_dir, "valid.txt"))
    clip_tr = ClipFeatureStore.from_split(args.data_dir, "train")
    clip_dv = ClipFeatureStore.from_split(args.data_dir, "valid")
    msl = model_cfg.max_seq_length
    f_tr = convert_examples(train_ex, tokenizer, msl, clip_tr,
                            model_cfg.clip_dim)
    f_dv = convert_examples(dev_ex, tokenizer, msl, clip_dv,
                            model_cfg.clip_dim)

    resnet_layers = (1, 1, 1, 1) if args.tiny else (3, 8, 36, 3)
    if args.model != "icka":
        import dataclasses as _dc

        from icka_tpu.core.config import GateCLConfig
        from icka_tpu.train.gate_cl_trainer import GateCLTrainer

        if args.tiny:
            gcfg = _dc.replace(
                GateCLConfig.tiny(vocab_size=len(tokenizer.vocab) + 8,
                                  variant=args.model),
                region_dim=2048, max_seq_length=model_cfg.max_seq_length)
        else:
            gcfg = GateCLConfig(variant=args.model,
                                max_seq_length=model_cfg.max_seq_length)
        trainer = GateCLTrainer(gcfg, train_cfg,
                                resnet_layers=resnet_layers)
    else:
        trainer = ICKATrainer(model_cfg, train_cfg, f_tr.spec,
                              resnet_layers=resnet_layers)
    import jax
    train_loader = MNERLoader(
        f_tr, args.path_image, train_cfg.train_batch_size,
        train_cfg.gradient_accumulation_steps, train=True,
        decode_size=256 if not args.tiny else 64, seed=train_cfg.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count())
    dev_loader = MNERLoader(
        f_dv, args.path_image, train_cfg.eval_batch_size, train=False,
        decode_size=256 if not args.tiny else 64)

    ckpt = Checkpointer(args.output_dir)
    ckpt.save_config(to_json(model_cfg))
    epochs = args.epochs_override or train_cfg.num_train_epochs
    from icka_tpu.core.checkpoint import PreemptionGuard

    # SIGTERM/SIGINT during training snapshots the last completed step
    # (atomic write) and exits cleanly; rerunning the same command resumes
    with PreemptionGuard() as guard:
        state, history = trainer.fit(train_loader, dev_loader,
                                     epochs=epochs, checkpointer=ckpt,
                                     preemption_guard=guard)
    print(f"done; best dev F1 = {ckpt.manifest['best_metric']}")
    return state


if __name__ == "__main__":
    main()
