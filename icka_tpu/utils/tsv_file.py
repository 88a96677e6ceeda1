"""Seekable TSV dataset files with sidecar line index.

Rebuild of `utils/tsv_file.py:20-85` / `utils/tsv_file_ops.py`: random access
into large TSV datasets via a `.lineidx` file of byte offsets. Used by the
VCR/captioning data path; kept dependency-free."""

from __future__ import annotations

import os
from typing import List, Optional


def _lineidx_path(tsv_path: str) -> str:
    return os.path.splitext(tsv_path)[0] + ".lineidx"


def build_lineidx(tsv_path: str, idx_path: Optional[str] = None) -> str:
    idx_path = idx_path or _lineidx_path(tsv_path)
    offsets = []
    with open(tsv_path, "rb") as f:
        pos = 0
        for line in f:
            offsets.append(pos)
            pos += len(line)
    with open(idx_path, "w") as f:
        for off in offsets:
            f.write(f"{off}\n")
    return idx_path


class TSVFile:
    """Random-access rows of a TSV file; builds the line index on demand."""

    def __init__(self, tsv_path: str, generate_lineidx: bool = True):
        self.tsv_path = tsv_path
        self.lineidx_path = _lineidx_path(tsv_path)
        self._fp = None
        self._lineidx: Optional[List[int]] = None
        if not os.path.isfile(self.lineidx_path) and generate_lineidx:
            build_lineidx(tsv_path, self.lineidx_path)

    def _ensure(self):
        if self._lineidx is None:
            with open(self.lineidx_path) as f:
                self._lineidx = [int(l) for l in f if l.strip()]
        if self._fp is None:
            self._fp = open(self.tsv_path, "r")

    def num_rows(self) -> int:
        self._ensure()
        return len(self._lineidx)

    def __len__(self):
        return self.num_rows()

    def seek(self, idx: int) -> List[str]:
        self._ensure()
        self._fp.seek(self._lineidx[idx])
        return [s.strip() for s in self._fp.readline().split("\t")]

    def __getitem__(self, idx: int) -> List[str]:
        return self.seek(idx)

    def close(self):
        if self._fp is not None:
            self._fp.close()
            self._fp = None


def tsv_writer(rows, tsv_path: str):
    """Write rows (iterables of str) + line index in one pass
    (`utils/tsv_file_ops.py` equivalent)."""
    idx_path = _lineidx_path(tsv_path)
    with open(tsv_path, "w") as f, open(idx_path, "w") as fidx:
        pos = 0
        for row in rows:
            line = "\t".join(str(c) for c in row) + "\n"
            f.write(line)
            fidx.write(f"{pos}\n")
            pos += len(line.encode("utf-8"))
