"""Data-parallel serving over a device mesh (icka_tpu.serving.bucketed
``mesh=``): the sharded servers must decode IDENTICAL tags to the
single-device servers — DP serving is a placement change, never a math
change. This is the executable form of the scaling claim (each replica
runs the whole per-bucket program; no collectives in the forward graph,
so throughput is linear in mesh size).

The reference has no serving engine at all, and its only multi-GPU story
is NCCL DDP training (`My_cross_attention.py:649-657`); DP serving here
is a sharding annotation on the same jitted program.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tests.test_serving import (
    MAXL,
    _examples,
    _icka_batch,
    _icka_examples,
    _model,
)

from icka_tpu.serving.bucketed import BucketedGateCLServer, BucketedICKAServer


def _mesh():
    return Mesh(np.array(jax.devices()), ("data",))


def test_gate_cl_dp_serving_matches_single_device(rng):
    model, params = _model("ip")
    exs = _examples(20, rng)
    solo = BucketedGateCLServer(model, params, buckets=(8, MAXL),
                                max_batch=8)
    tags0, _ = solo.predict(exs)
    dp = BucketedGateCLServer(model, params, buckets=(8, MAXL),
                              max_batch=8, mesh=_mesh())
    tags1, stats = dp.predict(exs)
    assert stats.total_pairs == len(exs)
    for a, b in zip(tags0, tags1):
        np.testing.assert_array_equal(a, b)


def test_gate_cl_dp_rejects_indivisible_batch():
    model, params = _model("ip")
    with pytest.raises(ValueError):
        BucketedGateCLServer(model, params, buckets=(8, MAXL),
                             max_batch=6, mesh=_mesh())


def test_icka_dp_serving_matches_single_device():
    from icka_tpu.core.config import ICKAConfig
    from icka_tpu.models.icka import ICKAModel

    cfg = ICKAConfig.tiny()  # max_seq_length = 32
    model = ICKAModel(cfg)
    offset, mp = 14, (3, 11)
    rng = np.random.default_rng(3)
    init_b = _icka_batch(cfg, 2, offset, 32, rng)
    params = model.init(jax.random.PRNGKey(0), init_b, mp, offset,
                        mode="test")
    exs = _icka_examples(12, cfg, offset, rng)

    solo = BucketedICKAServer(model, params, buckets=(16, 32), max_batch=8,
                              offset=offset, mask_positions=mp)
    tags0, _ = solo.predict(exs)
    dp = BucketedICKAServer(model, params, buckets=(16, 32), max_batch=8,
                            offset=offset, mask_positions=mp, mesh=_mesh())
    tags1, stats = dp.predict(exs)
    assert stats.total_pairs == len(exs)
    for a, b in zip(tags0, tags1):
        np.testing.assert_array_equal(a, b)
