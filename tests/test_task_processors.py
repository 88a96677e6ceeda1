"""VL task processor tests (VQA/GQA/NLVR/VCR JSON → features)."""

import json

import numpy as np

from icka_tpu.data.synthetic import tiny_tokenizer
from icka_tpu.data.task_processors import (
    NLVRProcessor,
    VCRQAProcessor,
    VQATextProcessor,
    convert_vl_examples,
)


def test_vqa_processor(tmp_path):
    data = [
        {"q": "what color is the dog", "o": "dog;ball", "an": ["brown"],
         "s": [1.0], "img_id": "img1", "q_id": 7},
        {"q": "empty answers skipped", "o": "x", "an": [], "s": [],
         "img_id": "img2", "q_id": 8},
    ]
    (tmp_path / "train2014_qla.json").write_text(json.dumps(data))
    proc = VQATextProcessor()
    ex = proc.get_train_examples(str(tmp_path))
    assert len(ex) == 1
    assert ex[0].text_a == "what color is the dog"
    assert ex[0].text_b == "dog ball"
    assert ex[0].label == ["brown"]


def test_vcr_processor(tmp_path):
    data = [{"q": "why is he smiling", "choices": ["a", "b", "c", "d"],
             "label": 2, "img_id": "vcr1", "annot_id": "train-42",
             "objects": ["person", "dog"]}]
    (tmp_path / "vcr_train.json").write_text(json.dumps(data))
    ex = VCRQAProcessor().get_train_examples(str(tmp_path))
    assert ex[0].q_id == 42
    assert ex[0].text_b == ["a", "b", "c", "d"]
    assert ex[0].label == 2


def test_convert_vl_examples(tmp_path, rng):
    tok = tiny_tokenizer(str(tmp_path / "tok"))
    data = [{"q": "the game", "o": "", "label": 1, "img_id": "k1"},
            {"q": "a photo", "o": "", "label": 0, "img_id": "missing"}]
    (tmp_path / "nlvr2_train.json").write_text(json.dumps(data))
    ex = NLVRProcessor().get_train_examples(str(tmp_path))
    img_feats = {"k1": rng.standard_normal((3, 8)).astype(np.float32)}
    f = convert_vl_examples(ex, img_feats, [0, 1], max_img_seq_length=5,
                            max_seq_length=16, tokenizer=tok)
    assert f.input_ids.shape == (2, 16)
    assert f.input_mask.shape == (2, 21)
    # example 0 has 3 real regions → mask on, padded rows off
    assert f.input_mask[0, 16:19].sum() == 3
    assert f.input_mask[0, 19:].sum() == 0
    # example 1 image missing → all region slots masked off
    assert f.input_mask[1, 16:].sum() == 0
    assert f.label.tolist() == [1, 0]
    # CLS first, text tokens masked correctly
    assert f.input_ids[0, 0] == tok.vocab[tok.bos_token]
