from icka_tpu.data.conll import read_conll, read_mm_conll
from icka_tpu.data.labels import (
    MNER_LABELS,
    MNER_AUX_LABELS,
    label_map,
    aux_label_map,
)

__all__ = [
    "read_conll",
    "read_mm_conll",
    "MNER_LABELS",
    "MNER_AUX_LABELS",
    "label_map",
    "aux_label_map",
]
