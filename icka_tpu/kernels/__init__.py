from icka_tpu.kernels.attention import fused_attention

__all__ = ["fused_attention"]
