"""Evaluator parity.

Fixtures include the reference's own micro-fixture (`ner_evaluate.py:151-185`
— the only test-like artifact in the entire reference repo) plus edge cases
for the chunk transition rules.
"""

import numpy as np

from icka_tpu.evaluation import (
    classification_report,
    evaluate_chunk_f1,
    evaluate_class_f1,
    extract_chunks,
)
from icka_tpu.evaluation.report import get_entities, precision_recall_f1

TAGS = {
    "0": 0,
    "B-PER": 1, "I-PER": 2,
    "B-LOC": 3, "I-LOC": 4,
    "B-ORG": 5, "I-ORG": 6,
    "B-OTHER": 7, "I-OTHER": 8,
    "O": 9,
}


def test_get_chunks_docstring_example():
    tags = {"B-PER": 4, "I-PER": 5, "B-LOC": 3, "O": 0}
    assert extract_chunks([4, 5, 0, 3], tags) == [("PER", 0, 2), ("LOC", 3, 4)]


def test_reference_micro_fixture():
    """Replicates `ner_evaluate.py.__main__` (:151-185): acc printed there
    is the token accuracy of the two 10-token rows."""
    labels_pred = [
        [9, 9, 9, 1, 3, 1, 2, 2, 0, 0],
        [9, 9, 9, 1, 3, 1, 2, 0, 0, 0],
    ]
    labels = [
        [9, 9, 9, 9, 3, 1, 2, 2, 0, 0],
        [9, 9, 9, 9, 3, 1, 2, 2, 0, 0],
    ]
    m = evaluate_chunk_f1(labels_pred, labels, TAGS)
    # token accuracy: row1 has 9/10 match, row2 8/10 → 17/20
    np.testing.assert_allclose(m.acc, 17 / 20)
    # gold chunks per row: LOC(4,5), PER(5,8)... compute explicitly:
    gold = extract_chunks(labels[0], TAGS)
    assert gold == [("LOC", 4, 5), ("PER", 5, 8), ("0", 8, 10)]


def test_i_after_o_opens_chunk():
    # reference quirk: I-PER after O starts a PER chunk
    assert extract_chunks([9, 2, 2, 9], TAGS) == [("PER", 1, 3)]


def test_b_restarts_chunk():
    assert extract_chunks([1, 1, 2], TAGS) == [("PER", 0, 1), ("PER", 1, 3)]


def test_type_change_splits_chunk():
    assert extract_chunks([1, 4, 9], TAGS) == [("PER", 0, 1), ("LOC", 1, 2)]


def test_perfect_prediction_scores_one():
    seqs = [[9, 1, 2, 9, 3], [5, 6, 9, 9, 9]]
    m = evaluate_chunk_f1(seqs, seqs, TAGS)
    assert (m.acc, m.f1, m.precision, m.recall) == (1.0, 1.0, 1.0, 1.0)


def test_no_correct_predictions_all_zero():
    m = evaluate_chunk_f1([[9, 9]], [[1, 2]], TAGS)
    assert (m.f1, m.precision, m.recall) == (0.0, 0.0, 0.0)


def test_class_f1():
    pred = [[1, 2, 9, 3, 9]]
    gold = [[1, 2, 9, 3, 9]]
    f1, p, r = evaluate_class_f1(pred, gold, TAGS, "PER")
    assert (f1, p, r) == (1.0, 1.0, 1.0)
    f1, p, r = evaluate_class_f1(pred, [[9, 9, 9, 3, 9]], TAGS, "PER")
    assert (f1, p, r) == (0.0, 0.0, 0.0)


def test_seqeval_entities_bio():
    tags = ["B-PER", "I-PER", "O", "B-LOC"]
    assert get_entities(tags) == [("PER", 0, 1), ("LOC", 3, 3)]


def test_seqeval_nested_and_report():
    y_true = [["B-PER", "I-PER", "O"], ["B-LOC", "O", "O"]]
    y_pred = [["B-PER", "I-PER", "O"], ["B-ORG", "O", "O"]]
    p, r, f1 = precision_recall_f1(y_true, y_pred)
    assert p == 0.5 and r == 0.5 and f1 == 0.5
    rep = classification_report(y_true, y_pred)
    assert "PER" in rep and "micro avg" in rep and "weighted avg" in rep
    # PER row should be perfect
    per_line = [l for l in rep.splitlines() if l.strip().startswith("PER")][0]
    assert "1.0000" in per_line


def test_seqeval_matches_library_if_available():
    try:
        from seqeval.metrics import f1_score
    except ImportError:
        return
    y_true = [["B-PER", "I-PER", "O", "B-LOC"]]
    y_pred = [["B-PER", "I-PER", "O", "O"]]
    _, _, f1 = precision_recall_f1(y_true, y_pred)
    np.testing.assert_allclose(f1, f1_score(y_true, y_pred))
