"""Parameter partitioning: rule-based PartitionSpecs for tensor parallelism.

The reference has data parallelism only (SURVEY.md §2.4); the mesh here is
designed so TP of the big RoBERTa encoders is a config change. Rules are
applied by parameter *path* (t5x-style), keeping the param pytree plain
arrays (no flax metadata boxing):

  - attention q/k/v kernels  (d, d)        → shard output dim over "model"
    (head-parallel: the reshape to (B,S,N,H) then splits heads across
    devices; XLA propagates the sharding through the einsums)
  - attention output kernel  (d, d)        → shard input dim  over "model"
  - MLP wi kernel            (d, 4d)       → shard output dim
  - MLP wo kernel            (4d, d)       → shard input dim
  - embeddings               (V, d)        → shard vocab dim ("model") —
    gathers are cheap relative to the table's memory footprint
  - everything else (biases, LayerNorms, CRF, small heads) → replicated

Gradient reduction across "data" and the TP collectives are inserted by
XLA from these shardings — there is no hand-written collective code.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icka_tpu.core.mesh import MODEL_AXIS


def _path_names(path) -> list[str]:
    return [str(getattr(k, "key", k)) for k in path]


def _spec_for(path, leaf, model_axis_size: int) -> P:
    names = _path_names(path)
    last = names[-1]
    joined = "/".join(names)
    if leaf.ndim < 2 or model_axis_size <= 1:
        return P()
    rows, cols = leaf.shape[-2], leaf.shape[-1]
    if last == "kernel":
        if any(f"attn/{proj}" in joined
               for proj in ("query", "key", "value")) \
                or last_two(names) == ("wi", "kernel"):
            if cols % model_axis_size == 0:
                return P(None, MODEL_AXIS)
        if "attn_out/dense" in joined or last_two(names) == ("wo", "kernel"):
            if rows % model_axis_size == 0:
                return P(MODEL_AXIS, None)
        # generic large kernels: prefer output sharding
        if cols % model_axis_size == 0 and cols >= 1024:
            return P(None, MODEL_AXIS)
        return P()
    if last == "word_embeddings" and rows % model_axis_size == 0:
        return P(MODEL_AXIS, None)
    return P()


def last_two(names):
    return tuple(names[-2:]) if len(names) >= 2 else tuple(names)


def param_partition_specs(params: Any, mesh: Mesh) -> Any:
    size = mesh.shape.get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _spec_for(p, x, size), params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    specs = param_partition_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P))


def zero1_moment_specs(params: Any, mesh: Mesh) -> Any:
    """ZeRO-1 PartitionSpecs for Adam moments: each moment leaf keeps its
    parameter's TP sharding and additionally shards its largest remaining
    dimension over the DATA axis.

    Params and grads stay replicated across "data" (plain DP); only the
    optimizer state is partitioned. XLA then materializes the classic
    ZeRO-1 schedule from the sharding alone: the moment update runs on
    each device's 1/N shard and the parameter delta is all-gathered —
    moment HBM residency drops by the data-axis size with no hand-written
    collectives. Leaves with no dimension divisible by the axis stay as
    their TP spec (biases, LayerNorms — noise next to the big kernels)."""
    from icka_tpu.core.mesh import DATA_AXIS

    data = mesh.shape.get(DATA_AXIS, 1)
    tp = param_partition_specs(params, mesh)

    def add_data(leaf, spec: P) -> P:
        if data <= 1 or leaf.ndim == 0:
            return spec
        entries = list(spec) + [None] * (leaf.ndim - len(spec))
        free = [(leaf.shape[i], i) for i in range(leaf.ndim)
                if entries[i] is None and leaf.shape[i] % data == 0]
        if not free:
            return spec
        _, axis = max(free)
        entries[axis] = DATA_AXIS
        return P(*entries)

    return jax.tree.map(add_data, params, tp,
                        is_leaf=lambda x: isinstance(x, P))


def _map_moments(opt_state: Any, fn) -> Any:
    """Apply `fn` to the mu/nu trees of every Adam-like node."""

    def visit(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):
            return node._replace(mu=fn(node.mu), nu=fn(node.nu))
        return node

    return jax.tree.map(visit, opt_state,
                        is_leaf=lambda n: hasattr(n, "mu"))


def shard_train_state(state: Any, mesh: Mesh, zero1: bool = False) -> Any:
    """Shard params and matching optimizer moments; everything else
    (scalars, schedules) replicated. With `zero1`, moments additionally
    shard over the data axis (see `zero1_moment_specs`)."""
    specs = param_partition_specs(state.params, mesh)
    mspecs = zero1_moment_specs(state.params, mesh) if zero1 else specs

    def put(tree, spec_tree):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, spec_tree, is_leaf=lambda x: isinstance(x, P))

    new_params = put(state.params, specs)
    new_opt = _map_moments(state.opt_state, lambda t: put(t, mspecs))
    repl = NamedSharding(mesh, P())
    replaced = state.replace(params=new_params, opt_state=new_opt)
    if getattr(state, "backbone_variables", None) is not None:
        replaced = replaced.replace(
            backbone_variables=jax.tree.map(
                lambda x: jax.device_put(x, repl),
                state.backbone_variables))
    return replaced
