"""Chunk preparation for the ChunkAlign models.

Capability rebuild of `utils/GetChunk_v4_vcr.py` (reference component #27):
the reference runs an adapter-based CoNLL-2000 chunker offline over VCR
sentences to produce per-sentence chunk spans; the models then consume the
spans as `offsets`/`gather_index` plus a chunk-internal attention mask.

Here the span→tensor conversion (`chunk_arrays`) is the first-class piece
(static shapes, dead-chunk padding); the chunker itself is pluggable —
`heuristic_chunks` gives a dependency-free approximation (punctuation/
stopword boundaries), and any model-based chunker can supply spans in the
same format.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

Span = Tuple[int, int]          # [start, end) token indices

_BOUNDARY_WORDS = {
    "a", "an", "the", "is", "are", "was", "were", "be", "been", "being",
    "and", "or", "but", "of", "in", "on", "at", "to", "with", "for",
    "that", "this", "these", "those", "he", "she", "it", "they", "we",
}
_PUNCT = set(".,!?;:()[]\"'")


def heuristic_chunks(tokens: Sequence[str]) -> List[Span]:
    """Greedy NP-ish chunking: function words and punctuation are chunk
    boundaries (each its own chunk); consecutive content words group."""
    spans: List[Span] = []
    start = None
    for i, tok in enumerate(tokens):
        low = tok.lower()
        if low in _BOUNDARY_WORDS or low in _PUNCT or all(
                c in _PUNCT for c in low):
            if start is not None:
                spans.append((start, i))
                start = None
            spans.append((i, i + 1))
        elif start is None:
            start = i
    if start is not None:
        spans.append((start, len(tokens)))
    return spans


def chunk_arrays(spans: Sequence[Span], hypo_len: int,
                 max_chunks: int, cls_offset: int = 1):
    """Spans over sentence tokens → model inputs:

      gather_index (hypo_len,) int32 — chunk id per hypothesis position
        (CLS and positions past the sentence map to a dead chunk);
      chunk_mask   (hypo_len, hypo_len) 0/1 — block-diagonal chunk-internal
        visibility (CLS sees everything; everything sees CLS);
      num_chunks used (incl. dead chunk) — pad the static `max_chunks` to
        at least this.
    """
    dead = max_chunks - 1
    gather = np.full((hypo_len,), dead, np.int32)
    for cid, (s, e) in enumerate(spans):
        if cid >= dead:
            break
        for t in range(s, e):
            pos = t + cls_offset
            if pos < hypo_len:
                gather[pos] = cid

    mask = np.zeros((hypo_len, hypo_len), np.int32)
    same = gather[:, None] == gather[None, :]
    mask[same] = 1
    # CLS row/col fully visible
    mask[0, :] = 1
    mask[:, 0] = 1
    return gather, mask


def batch_chunk_arrays(token_lists: Sequence[Sequence[str]],
                       hypo_len: int, max_chunks: int,
                       chunker=heuristic_chunks):
    """Batched convenience: tokens → (B, hypo_len) gather ids and
    (B, hypo_len, hypo_len) chunk masks."""
    B = len(token_lists)
    gathers = np.zeros((B, hypo_len), np.int32)
    masks = np.zeros((B, hypo_len, hypo_len), np.int32)
    for b, toks in enumerate(token_lists):
        spans = chunker(toks)
        gathers[b], masks[b] = chunk_arrays(spans, hypo_len, max_chunks)
    return gathers, masks
