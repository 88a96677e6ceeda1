"""icka_tpu — a TPU-native multimodal NER framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of buctcurry/ICKA
(ESWA 2024, "Instruction Construction and Knowledge Alignment framework for
Multimodal Named Entity Recognition"): text+image BIO entity tagging over
Twitter-2015/2017 with cross-modal attention fusion, CLIP knowledge
alignment, prompt-based instruction construction and CRF decoding —
re-designed for TPU (SPMD meshes, fused XLA programs, Pallas kernels)
rather than translated from the reference's PyTorch/CUDA implementation.
"""

__version__ = "0.1.0"
