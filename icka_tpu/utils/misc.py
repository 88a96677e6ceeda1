"""Small host-side helpers (reference `utils/misc.py` + `utils/logger.py`).

Rank utilities answer from `jax.process_index()` instead of
`torch.distributed` (:49-66); `setup_logger` keeps the reference's
flush-per-emit file handler behavior for blob filesystems (:13-76) and
writes only on rank 0 (:87-88)."""

from __future__ import annotations

import errno
import logging
import os
import random
import sys

import numpy as np


def mkdir(path: str):
    try:
        os.makedirs(path)
    except OSError as e:
        if e.errno != errno.EEXIST:
            raise


def set_seed(seed: int, n_gpu: int = 0):
    """Seed host RNGs (the reference also seeds CUDA, :24-30; device-side
    randomness in JAX flows from explicit PRNG keys instead)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass


def get_rank() -> int:
    import jax
    return jax.process_index()


def get_world_size() -> int:
    import jax
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


class _FlushingFileHandler(logging.FileHandler):
    """Flush after every emit so logs survive preemption (reference
    `utils/logger.py:13-76` reopens per write for blob FS; flushing gives
    the same durability on POSIX)."""

    def emit(self, record):
        super().emit(record)
        self.flush()


def setup_logger(name: str, save_dir: str = "", distributed_rank: int = 0,
                 filename: str = "log.txt") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if distributed_rank > 0:
        return logger
    if not logger.handlers:
        ch = logging.StreamHandler(stream=sys.stdout)
        fmt = logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s")
        ch.setFormatter(fmt)
        logger.addHandler(ch)
        if save_dir:
            mkdir(save_dir)
            fh = _FlushingFileHandler(os.path.join(save_dir, filename))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger
