"""ZeRO-1 optimizer-state sharding + low-precision first moment.

The reference's only distribution strategy is DDP with fully replicated
optimizer state (`My_cross_attention.py:649-657,768-776`). The TPU-native
trainer adds ZeRO-1: Adam moments shard over the data axis as a pure
sharding annotation (`parallel/partitioning.py::zero1_moment_specs`), with
XLA deriving the reduce-scatter/all-gather schedule. Semantics must be
unchanged — same losses as the replicated layout — and the moments must
actually live sharded."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from icka_tpu.core.config import TrainConfig
from icka_tpu.core.mesh import MeshSpec, make_mesh, shard_accum_batch
from icka_tpu.data.features import PromptSpec
from icka_tpu.parallel import shard_train_state, zero1_moment_specs
from icka_tpu.train.optimizer import make_optimizer
from icka_tpu.train.trainer import ICKATrainer

from tests.test_multichip_grid import (
    ACCUM,
    GLOBAL_BATCH,
    MASKS,
    OFFSET,
    SEQ,
    _global_batch,
    _tiny_cfg,
)


def _run_steps(zero1: bool, n_steps: int = 2):
    cfg = _tiny_cfg()
    tcfg = TrainConfig(train_batch_size=GLOBAL_BATCH,
                       gradient_accumulation_steps=ACCUM,
                       compute_dtype="float32",
                       data_axis=4, model_axis=2, zero1=zero1)
    mesh = make_mesh(MeshSpec(data=4, model=2))
    spec = PromptSpec(OFFSET, MASKS, OFFSET + SEQ, SEQ)
    trainer = ICKATrainer(cfg, tcfg, spec, mesh=mesh,
                          resnet_layers=(1, 1, 1, 1))

    rng = np.random.default_rng(0)
    batch = _global_batch(cfg, rng)
    sample = {k: v[0] for k, v in batch.items()
              if k not in ("images", "label_ids")}
    sample["visual_mean"] = np.zeros((GLOBAL_BATCH, cfg.region_dim),
                                     np.float32)
    sample["visual_grid"] = np.zeros((GLOBAL_BATCH, 7, 7, cfg.region_dim),
                                     np.float32)
    import jax.numpy as jnp
    bvars = trainer.backbone.init(jax.random.PRNGKey(2),
                                  jnp.zeros((1, 24, 24, 3), jnp.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), sample, total_steps=4,
                               backbone_variables=bvars)
    state = shard_train_state(state, mesh, zero1=zero1)
    step = trainer.make_train_step()
    sharded = shard_accum_batch(mesh, batch)
    losses = []
    for i in range(n_steps):
        state, loss = step(state, sharded, jax.random.PRNGKey(1))
        losses.append(float(loss))
    return state, losses


@pytest.mark.slow  # two full-graph 8-device mesh compiles (~min each cold)
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_zero1_matches_replicated_and_shards_moments():
    state_z, losses_z = _run_steps(zero1=True)
    state_r, losses_r = _run_steps(zero1=False)
    np.testing.assert_allclose(losses_z, losses_r, rtol=2e-5)

    # params identical after 2 steps (the update math is placement-free)
    for pz, pr in zip(jax.tree.leaves(state_z.params),
                      jax.tree.leaves(state_r.params)):
        np.testing.assert_allclose(np.asarray(pz), np.asarray(pr),
                                   rtol=1e-5, atol=1e-7)

    # the big-kernel moments actually live sharded over "data"
    def adam_nodes(opt_state):
        return [n for n in jax.tree.leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "mu"))
            if hasattr(n, "mu")]

    nodes = adam_nodes(state_z.opt_state)
    assert nodes, "no Adam state found"
    sharded_leaves = [
        leaf for leaf in jax.tree.leaves(nodes[0].mu)
        if leaf.ndim >= 2
        and "data" in str(getattr(leaf.sharding, "spec", ""))]
    assert sharded_leaves, "no moment leaf is sharded over the data axis"
    # and the replicated run's moments are NOT data-sharded (guards the
    # assertion above against vacuous string matching)
    nodes_r = adam_nodes(state_r.opt_state)
    assert not any(
        "data" in str(getattr(leaf.sharding, "spec", ""))
        for leaf in jax.tree.leaves(nodes_r[0].mu))


def test_zero1_moment_specs_add_data_axis():
    mesh = make_mesh(MeshSpec(data=4, model=2))
    params = {
        "kernel": np.zeros((8, 16), np.float32),      # divisible → sharded
        "bias": np.zeros((3,), np.float32),           # indivisible → as-is
        "attn": {"query": {"kernel": np.zeros((16, 16), np.float32)}},
    }
    specs = zero1_moment_specs(params, mesh)
    assert "data" in str(specs["kernel"])
    assert specs["bias"] == P()
    q = specs["attn"]["query"]["kernel"]
    # TP shards the output dim over "model"; ZeRO adds "data" on the other
    assert "model" in str(q) and "data" in str(q)


def test_mu_dtype_bfloat16_moments():
    """bf16 first moment: mu leaves store bf16, update stays close to
    fp32-mu Adam on the same stream of gradients."""
    import jax.numpy as jnp

    params = {"w": jnp.asarray(np.random.default_rng(0)
                               .standard_normal((8, 8)), jnp.float32)}
    grads = {"w": jnp.asarray(np.random.default_rng(1)
                              .standard_normal((8, 8)) * 0.1, jnp.float32)}

    def steps(mu_dtype):
        tx = make_optimizer(
            TrainConfig(mu_dtype=mu_dtype), total_steps=100, params=params)
        st = tx.init(params)
        p = params
        for _ in range(5):
            upd, st = tx.update(grads, st, p)
            p = jax.tree.map(lambda a, b: a + b, p, upd)
        return p, st

    p16, st16 = steps("bfloat16")
    p32, _ = steps("float32")
    mus = [leaf for leaf in jax.tree.leaves(st16)
           if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment stored"
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               rtol=0.02, atol=2e-4)
