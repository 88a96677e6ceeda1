"""Data pipeline tests: readers, tokenizers, feature geometry, loader."""

import os

import numpy as np
import pytest

from icka_tpu.data.clip_store import ClipFeatureStore
from icka_tpu.data.conll import read_conll, read_mm_conll
from icka_tpu.data.features import (
    PROMPT_TEXT,
    build_prompt,
    convert_examples,
)
from icka_tpu.data.labels import MNER_LABELS, label_map, num_labels
from icka_tpu.data.loader import MNERLoader
from icka_tpu.data.synthetic import generate_dataset, tiny_tokenizer
from icka_tpu.data.tokenization import (
    BasicTokenizer,
    BertTokenizer,
    ByteLevelBPETokenizer,
    WordpieceTokenizer,
    tiny_bpe_files,
)


def test_read_mm_conll(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text(
        "IMGID:123\n"
        "RT\tO\n"
        "@user\tB-PER\n"
        "likes\tO\n"
        "x\tB-OTHER\n"
        "y\tI-OTHER\n"
        "\n"
        "IMGID:456\n"
        "hello\tO\n"
        "\n")
    exs = read_mm_conll(str(p))
    assert len(exs) == 2
    assert exs[0].img_id == "123.jpg"
    assert exs[0].labels == ["O", "B-PER", "O", "B-MISC", "I-MISC"]
    assert exs[0].aux_labels == ["O", "B", "O", "B", "I"]
    assert exs[1].tokens == ["hello"]


def test_read_conll(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("-DOCSTART- -X- O O\n\nEU NNP I-NP B-ORG\n. . O O\n\n")
    data = read_conll(str(p))
    assert data == [(["EU", "."], ["B-ORG", "O"])]


def test_wordpiece_tokenizer(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "show", "##s", "un", "##happy", "hello", ","]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n")
    tok = BertTokenizer(str(vf))
    assert tok.tokenize("shows") == ["show", "##s"]
    assert tok.tokenize("unhappy") == ["un", "##happy"]
    assert tok.tokenize("Hello, shows") == ["hello", ",", "show", "##s"]
    assert tok.tokenize("zzz") == ["[UNK]"]
    ids = tok.convert_tokens_to_ids(["show", "##s"])
    assert tok.convert_ids_to_tokens(ids) == ["show", "##s"]


def test_basic_tokenizer_cjk_and_accents():
    bt = BasicTokenizer(do_lower_case=True)
    assert bt.tokenize("héllo") == ["hello"]
    assert bt.tokenize("ab漢字cd") == ["ab", "漢", "字", "cd"]


def test_bpe_tokenizer_roundtrip(tmp_path):
    vf, mf = tiny_bpe_files(str(tmp_path), ["hello", "world"])
    tok = ByteLevelBPETokenizer(vf, mf)
    toks = tok.tokenize("hello world")
    ids = tok.convert_tokens_to_ids(toks)
    assert tok.decode(ids) == "hello world"
    # learned words should be single tokens
    assert tok.tokenize("hello") == ["hello"]
    assert tok.tokenize(" world") == ["Ġworld"]


def test_bpe_matches_hf_on_real_text(tmp_path):
    """Our BPE against HF GPT2/Roberta algorithm on the same tiny vocab."""
    try:
        from transformers import RobertaTokenizer
    except ImportError:
        pytest.skip("transformers missing")
    vf, mf = tiny_bpe_files(str(tmp_path), ["bridge", "image", "text"])
    hf = RobertaTokenizer(vocab_file=vf, merges_file=mf)
    ours = ByteLevelBPETokenizer(vf, mf)
    for text in ["image bridge", "the text is", "a!b c123"]:
        assert ours.tokenize(text) == hf.tokenize(text), text


def test_prompt_geometry(tmp_path):
    tok = tiny_tokenizer(str(tmp_path))
    ids, (m1, m2) = build_prompt(tok)
    toks = tok.convert_ids_to_tokens(ids)
    assert toks[0] == "<s>"
    assert toks[m1] == "<mask>" and toks[m2] == "<mask>"
    assert toks.count("<mask>") == 2
    assert "</s>" in toks


def test_convert_examples_geometry(tmp_path):
    root = generate_dataset(str(tmp_path / "ds"), n_train=8, n_valid=2,
                            n_test=2, write_images=False, clip_dim=16)
    tok = tiny_tokenizer(str(tmp_path / "tok"))
    examples = read_mm_conll(os.path.join(root, "train.txt"))
    clip = ClipFeatureStore.from_split(root, "train")
    feats = convert_examples(examples, tok, max_seq_length=64,
                             clip_store=clip, clip_dim=16)
    spec = feats.spec
    n = len(examples)
    assert feats.input_ids.shape == (n, spec.max_input_length)
    assert spec.max_input_length == 64 + len(PROMPT_TEXT.split(" ")) + 30
    assert feats.ori_input_ids.shape == (n, 64)
    lm = label_map()
    for row in range(n):
        L = int(feats.ori_input_mask[row].sum())
        # first/last real token labels are <s>/</s>
        assert feats.label_ids[row, 0] == lm["<s>"]
        assert feats.label_ids[row, L - 1] == lm["</s>"]
        # output_mask matches token count; padding labels are 0
        assert int(feats.output_mask[row].sum()) == L
        assert (feats.label_ids[row, L:] == 0).all()
        # prompted input = prompt ++ (padded) sentence, mask covers both
        np.testing.assert_array_equal(
            feats.input_ids[row, spec.offset:spec.offset + 64],
            feats.ori_input_ids[row])
        assert int(feats.input_mask[row].sum()) == spec.offset + 64
        # segments: 0 on prompt, 1 after
        assert (feats.segment_ids[row, :spec.offset] == 0).all()
        assert (feats.segment_ids[row, spec.offset:] == 1).all()
        # image region mask all-on
        assert (feats.added_input_mask[row, :49] == 1).all()
    assert num_labels() == len(MNER_LABELS) + 1


def test_label_alignment_first_piece_only(tmp_path):
    """Multi-piece words: first piece keeps the BIO label, rest get X."""
    from icka_tpu.data.conll import MMExample
    from icka_tpu.data.tokenization import ByteLevelBPETokenizer

    vf, mf = tiny_bpe_files(str(tmp_path), ["hel"])  # 'hello' → multi-piece
    tok = ByteLevelBPETokenizer(vf, mf)
    ex = MMExample(tokens=["hello"], labels=["B-PER"], img_id="0.jpg",
                   aux_labels=["B"])
    feats = convert_examples([ex], tok, max_seq_length=32, clip_dim=8)
    lm = label_map()
    pieces = tok.tokenize("hello")
    assert len(pieces) > 1
    row_labels = feats.label_ids[0, 1:1 + len(pieces)]
    assert row_labels[0] == lm["B-PER"]
    assert (row_labels[1:] == lm["X"]).all()


def test_loader_shapes_and_accum(tmp_path):
    root = generate_dataset(str(tmp_path / "ds"), n_train=24, n_valid=4,
                            n_test=4, write_images=True, image_size=40,
                            clip_dim=8)
    tok = tiny_tokenizer(str(tmp_path / "tok"))
    examples = read_mm_conll(os.path.join(root, "train.txt"))
    clip = ClipFeatureStore.from_split(root, "train")
    feats = convert_examples(examples, tok, max_seq_length=32,
                             clip_store=clip, clip_dim=8)
    loader = MNERLoader(feats, os.path.join(root, "images"), batch_size=4,
                        accum_steps=2, train=True, decode_size=48)
    assert len(loader) == 3  # 24 / (4*2)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["ori_input_ids"].shape == (2, 4, 32)
    assert b["images"].shape == (2, 4, 48, 48, 3)
    assert b["images"].dtype == np.uint8
    ev = loader.eval_view()
    eb = next(iter(ev))
    assert eb["ori_input_ids"].shape == (4, 32)


def test_loader_process_sharding(tmp_path):
    root = generate_dataset(str(tmp_path / "ds"), n_train=16, n_valid=2,
                            n_test=2, write_images=False, clip_dim=8)
    tok = tiny_tokenizer(str(tmp_path / "tok"))
    examples = read_mm_conll(os.path.join(root, "train.txt"))
    feats = convert_examples(examples, tok, max_seq_length=32, clip_dim=8)
    l0 = MNERLoader(feats, "", 2, train=False, process_index=0,
                    process_count=2, prefetch=0)
    l1 = MNERLoader(feats, "", 2, train=False, process_index=1,
                    process_count=2, prefetch=0)
    assert len(l0.indices) + len(l1.indices) == 16
    assert set(l0.indices).isdisjoint(l1.indices)


def test_clip_store_pickle(tmp_path):
    import pickle
    data = {"7": {"text_features": np.ones(8, np.float32)}}
    p = tmp_path / "f.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    store = ClipFeatureStore.from_pickle(str(p))
    assert store.dim == 8
    np.testing.assert_array_equal(store["7"], np.ones(8))
