"""Host-level collective helpers.

TPU-native replacement for the reference's Horovod object collectives
(`utils/distributed.py:151-209` — pickled `all_gather_list` /
`any_broadcast` over `hvd.allgather`) and its bucketed gradient all-reduce
(:16-148). Gradient reduction needs NO equivalent here — it is an implicit
`psum` emitted by jit over sharded batches; these helpers cover the
remaining host-side uses (gathering eval predictions across processes,
broadcasting config):
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np

import jax


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process (the
    `all_gather_list` use case, e.g. eval predictions)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max length across processes, prefix with the true length
    n = np.array([payload.size], np.int32)
    max_n = int(multihost_utils.process_allgather(n).max())
    padded = np.zeros(max_n, np.uint8)
    padded[: payload.size] = payload
    lens = multihost_utils.process_allgather(n).reshape(-1)
    blobs = multihost_utils.process_allgather(padded)
    return [pickle.loads(blobs[i, : int(lens[i])].tobytes())
            for i in range(jax.process_count())]


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a picklable object from `root` (the `any_broadcast` use
    case)."""
    if jax.process_count() == 1:
        return obj
    gathered = all_gather_objects(obj if jax.process_index() == root
                                  else None)
    return gathered[root]


def psum_across_hosts(x) -> np.ndarray:
    """Sum a small host array across processes (eval counters)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(x))).sum(axis=0)
