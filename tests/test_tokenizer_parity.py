"""WordPiece parity against HF BertTokenizer on a shared vocab file."""

import pytest

from icka_tpu.data.tokenization import BertTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
         "over", "lazy", "dog", ",", ".", "!", "un", "##believ", "##able",
         "漢", "12", "##3"]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_wordpiece_matches_hf(vocab_file):
    try:
        from transformers import BertTokenizer as HFBert
    except ImportError:
        pytest.skip("transformers missing")
    hf = HFBert(vocab_file, do_lower_case=True)
    ours = BertTokenizer(vocab_file, do_lower_case=True)
    cases = [
        "The quick brown fox jumps!",
        "unbelievable, JUMPED over the lazy dog.",
        "fox漢dog",
        "123 foxes",          # 'foxes' OOV → [UNK]
        "jumping... jumps",
    ]
    for text in cases:
        assert ours.tokenize(text) == hf.tokenize(text), text
        ids = ours.convert_tokens_to_ids(ours.tokenize(text))
        assert ids == hf.convert_tokens_to_ids(hf.tokenize(text)), text
