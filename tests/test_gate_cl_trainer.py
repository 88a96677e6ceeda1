"""End-to-end training of the gate_cl family on the synthetic dataset."""

import dataclasses
import os

import numpy as np
import pytest

from icka_tpu.core.config import GateCLConfig, TrainConfig
from icka_tpu.data.clip_store import ClipFeatureStore
from icka_tpu.data.conll import read_mm_conll
from icka_tpu.data.features import convert_examples
from icka_tpu.data.loader import MNERLoader
from icka_tpu.data.synthetic import generate_dataset, tiny_tokenizer
from icka_tpu.train.gate_cl_trainer import GateCLTrainer


@pytest.mark.parametrize("variant", ["gate_cl", "ip"])
def test_gate_cl_trainer_loss_decreases(tmp_path, variant):
    root = generate_dataset(str(tmp_path / "ds"), n_train=16, n_valid=8,
                            n_test=4, image_size=40, clip_dim=16)
    tok = tiny_tokenizer(str(tmp_path / "tok"))
    msl = 24
    cfg = dataclasses.replace(
        GateCLConfig.tiny(vocab_size=len(tok.vocab) + 8, variant=variant),
        region_dim=2048, max_seq_length=msl, negative_rate=2)
    tcfg = TrainConfig(train_batch_size=4, eval_batch_size=4,
                       gradient_accumulation_steps=2,
                       compute_dtype="float32", learning_rate=5e-3,
                       data_axis=1, model_axis=1)
    examples = read_mm_conll(os.path.join(root, "train.txt"))
    clip = ClipFeatureStore.from_split(root, "train")
    feats = convert_examples(examples, tok, msl, clip, 16)

    trainer = GateCLTrainer(cfg, tcfg, resnet_layers=(1, 1, 1, 1))
    loader = MNERLoader(feats, os.path.join(root, "images"), 4, 2,
                        train=True, decode_size=40, prefetch=0)
    state, history = trainer.fit(loader, dev_loader=loader.eval_view(),
                                 epochs=3, log=lambda *_: None)
    assert history[-1] < history[0]
    res = trainer.evaluate(state, loader.eval_view())
    assert 0.0 <= res.f1 <= 1.0
