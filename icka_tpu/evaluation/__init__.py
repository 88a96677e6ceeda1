from icka_tpu.evaluation.chunk_f1 import (
    extract_chunks,
    evaluate_chunk_f1,
    evaluate_class_f1,
)
from icka_tpu.evaluation.report import classification_report

__all__ = [
    "extract_chunks",
    "evaluate_chunk_f1",
    "evaluate_class_f1",
    "classification_report",
]
