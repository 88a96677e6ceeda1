"""icka_tpu — a TPU-native multimodal NER framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of buctcurry/ICKA
(ESWA 2024, "Instruction Construction and Knowledge Alignment framework for
Multimodal Named Entity Recognition"): text+image BIO entity tagging over
Twitter-2015/2017 with cross-modal attention fusion, CLIP knowledge
alignment, prompt-based instruction construction and CRF decoding —
re-designed for TPU (SPMD meshes, fused XLA programs, Pallas kernels)
rather than translated from the reference's PyTorch/CUDA implementation.

Public surface (lazily imported to keep `import icka_tpu` light):

    icka_tpu.ICKAConfig / GateCLConfig / TrainConfig / EncoderConfig
    icka_tpu.ICKAModel / GateCLModel / VisualBackbone
    icka_tpu.ICKATrainer / GateCLTrainer
    icka_tpu.CRF
"""

__version__ = "0.1.0"

_LAZY = {
    "ICKAConfig": "icka_tpu.core.config",
    "GateCLConfig": "icka_tpu.core.config",
    "TrainConfig": "icka_tpu.core.config",
    "EncoderConfig": "icka_tpu.core.config",
    "DataConfig": "icka_tpu.core.config",
    "ICKAModel": "icka_tpu.models.icka",
    "GateCLModel": "icka_tpu.models.gate_cl",
    "VisualBackbone": "icka_tpu.models.resnet",
    "ICKATrainer": "icka_tpu.train.trainer",
    "GateCLTrainer": "icka_tpu.train.gate_cl_trainer",
    "CRF": "icka_tpu.nn.crf",
    # VCR/captioning subsystem
    "ChunkAlignConfig": "icka_tpu.models.chunkalign",
    "ChunkAlignCLS": "icka_tpu.models.chunkalign",
    "ChunkAlignRationale": "icka_tpu.models.chunkalign",
    "generate_rationale": "icka_tpu.models.chunkalign",
    "rationale_bonus_mask": "icka_tpu.models.chunkalign",
    "BaselineCLS": "icka_tpu.models.chunkalign_baselines",
    "BaselineRationale": "icka_tpu.models.chunkalign_baselines",
    "EnsembleRefiner": "icka_tpu.models.chunkalign_baselines",
    "ImageBertSequenceClassifier": "icka_tpu.models.oscar",
    "OscarMultipleChoice": "icka_tpu.models.oscar",
    "ImageBertPreTraining": "icka_tpu.models.oscar",
    # serving engines (no reference equivalent; see MIGRATION.md)
    "BucketedGateCLServer": "icka_tpu.serving.bucketed",
    "BucketedICKAServer": "icka_tpu.serving.bucketed",
    "PackedGateCLServer": "icka_tpu.serving.packing",
    # local pretrained-weights resolution
    "load_text_encoder": "icka_tpu.models.pretrained",
    "load_backbone": "icka_tpu.models.pretrained",
    "load_chunker": "icka_tpu.models.pretrained",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(f"module 'icka_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
