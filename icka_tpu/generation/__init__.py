from icka_tpu.generation.decoding import (
    DecodeState,
    beam_search,
    greedy_decode,
    sample_decode,
    top_k_top_p_filter,
)

__all__ = [
    "DecodeState",
    "beam_search",
    "greedy_decode",
    "sample_decode",
    "top_k_top_p_filter",
]
