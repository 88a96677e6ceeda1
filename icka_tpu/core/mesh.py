"""Device mesh and sharding plumbing.

Replaces the reference's three overlapping distribution mechanisms — NCCL DDP
(`My_cross_attention.py:649-657,768-776`), `torch.nn.DataParallel` (:777-779)
and Horovod bucketed collectives (`utils/distributed.py`) — with ONE
abstraction: a `jax.sharding.Mesh` with named axes.

  - "data":  batch sharding (the reference's only strategy — DP)
  - "model": tensor parallelism over attention heads / MLP columns of the
             big RoBERTa encoders (a config change here, not a rewrite)

Gradient all-reduce is implicit: `jit` over sharded params/batch emits `psum`
over ICI. The reference's 10 MB bucket fusion machinery
(`utils/distributed.py:16-148`) has no equivalent because XLA fuses
collectives itself.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1     # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int | None = None) -> tuple[int, int]:
        n = n_devices if n_devices is not None else jax.device_count()
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n // model)
        return data, model


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    spec = spec or MeshSpec()
    devices = list(devices) if devices is not None else jax.devices()
    data, model = spec.resolve(len(devices))
    if data * model > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(mesh: Mesh, x, batch_dim: int):
    """Shard `batch_dim` over the data axis, replicating instead when the
    dimension doesn't divide the axis (e.g. a batch-1 debug eval)."""
    n = mesh.shape[DATA_AXIS]
    spec = [None] * x.ndim
    if x.ndim > batch_dim and x.shape[batch_dim] % n == 0:
        spec[batch_dim] = DATA_AXIS
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_batch(mesh: Mesh, batch):
    """Place every leaf of a host batch with its leading dim sharded on
    the data axis (the TPU equivalent of DistributedSampler + `.to(device)`,
    `My_cross_attention.py:707,798`)."""
    return jax.tree.map(lambda x: _put(mesh, x, 0), batch)


def shard_accum_batch(mesh: Mesh, batch):
    """Train batches are (accum, micro_batch, ...): shard the micro-batch
    axis over the data axis, keep the accumulation axis replicated (it is
    consumed sequentially by lax.scan inside the step)."""
    return jax.tree.map(lambda x: _put(mesh, x, 1), batch)


def logical_to_sharding(mesh: Mesh, axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
